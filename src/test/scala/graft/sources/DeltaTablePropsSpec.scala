package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Table-property surface: `delta.appendOnly=true` forbids every
  * row-removing mutation (the protocol's writer contract — no
  * dataChange=true remove actions) while append/merge/optimize stay
  * available; and `readAsOfTimestamp` resolves delta's timestampAsOf
  * rule (newest commit whose commit-file mtime is <= the ask).
  */
class DeltaTablePropsSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/tblprops/$name"
    val pp = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(pp))
      java.nio.file.Files.walk(pp)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    p
  }

  test("delta.appendOnly forbids row-removing mutations, allows adds") {
    val sp = spark; import sp.implicits._
    val p = freshDir("appendonly")
    DeltaLog.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), "overwrite", p,
      tableProperties = Map("delta.appendOnly" -> "true"))
    def refused(body: => Any): String =
      intercept[graft.GraftError.InvalidOperation](body).getMessage
    assert(refused(DeltaLog.deleteWhere(spark, p, "id = 1"))
      .contains("appendOnly"))
    assert(refused(DeltaLog.upsert(Seq((1L, "z")).toDF("id", "s"),
      Seq("id"), p)).contains("appendOnly"))
    assert(refused(DeltaLog.deleteWhereViaDv(spark, p, "id = 1"))
      .contains("delta_dv"), "DV delete refuses (feature undeclared here)")
    // append and merge only ADD files — allowed
    DeltaLog.write(Seq((3L, "c")).toDF("id", "s"), "append", p)
    DeltaLog.write(Seq((4L, "d", 1.5)).toDF("id", "s", "x"), "merge", p)
    val back = DeltaLog.read(spark, p)
    assert(back.count() == 4L)
    // the property survives the append/merge metaData refresh
    assert(refused(DeltaLog.deleteWhere(spark, p, "id = 1"))
      .contains("appendOnly"))
    assert(refused(DeltaLog.restore(spark, p, 0L)).contains("appendOnly"))
    // OPTIMIZE restages at dataChange=false — allowed
    assert(DeltaLog.optimize(spark, p) >= 2)
    assert(DeltaLog.read(spark, p).count() == 4L)
    // OVERWRITE is the biggest row-removing mutation of all — refused
    // (delta-spark's assertRemovable), so the appendOnly marker can
    // never be wiped by restarting the log
    assert(refused(DeltaLog.write(Seq((9L, "z")).toDF("id", "s"),
      "overwrite", p)).contains("appendOnly"))
    assert(DeltaLog.read(spark, p).count() == 4L)
  }

  test("tableProperties on an existing table refuse typed") {
    val sp = spark; import sp.implicits._
    val p = freshDir("lateprops")
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p)
    // appending with properties would silently ignore them — refused
    val e = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.write(Seq((2L, "b")).toDF("id", "s"), "append", p,
        tableProperties = Map("delta.appendOnly" -> "true"))
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
    // nothing committed, no property set
    assert(DeltaLog.read(spark, p).count() == 1L)
    // overwrite (a fresh log) takes the properties as creation-time conf
    DeltaLog.write(Seq((3L, "c")).toDF("id", "s"), "overwrite", p,
      tableProperties = Map("delta.appendOnly" -> "true"))
    assert(intercept[graft.GraftError.InvalidOperation](
      DeltaLog.deleteWhere(spark, p, "id = 3")).getMessage
      .contains("appendOnly"))
  }

  test("readAsOfTimestamp resolves the newest commit at or before the ask") {
    val sp = spark; import sp.implicits._
    val p = freshDir("tsasof")
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p) // v0
    DeltaLog.write(Seq((2L, "b")).toDF("id", "s"), "append", p)    // v1
    DeltaLog.write(Seq((3L, "c")).toDF("id", "s"), "append", p)    // v2
    // pin deterministic commit mtimes: v0=1000s, v1=2000s, v2=3000s
    val log = java.nio.file.Paths.get(p, "_delta_log")
    Seq(0L, 1L, 2L).foreach { v =>
      java.nio.file.Files.setLastModifiedTime(
        log.resolve(f"$v%020d.json"),
        java.nio.file.attribute.FileTime.fromMillis((v + 1) * 1000000L))
    }
    assert(DeltaLog.readAsOfTimestamp(spark, p, 1000000L).count() == 1L)
    assert(DeltaLog.readAsOfTimestamp(spark, p, 2500000L).count() == 2L)
    // exactly at the newest commit: resolves it
    assert(DeltaLog.readAsOfTimestamp(spark, p, 3000000L).count() == 3L)
    // between v0 and v1: still v0
    assert(DeltaLog.readAsOfTimestamp(spark, p, 1999999L).count() == 1L)
    // before the earliest visible commit: typed
    val e = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.readAsOfTimestamp(spark, p, 999999L) }
    assert(e.getMessage.contains("no commit at or before"), e.getMessage)
    // AFTER the newest commit: typed (delta-spark's
    // timestampGreaterThanLatestCommit), never silently clamped — a
    // "latest" pin would change meaning on the next append
    val late = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.readAsOfTimestamp(spark, p, 9999999999L) }
    assert(late.getMessage.contains("no commit as late as"), late.getMessage)
  }

  test("readAsOfTimestamp monotonizes out-of-order commit mtimes") {
    val sp = spark; import sp.implicits._
    val p = freshDir("tsmono")
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p) // v0
    DeltaLog.write(Seq((2L, "b")).toDF("id", "s"), "append", p)    // v1
    DeltaLog.write(Seq((3L, "c")).toDF("id", "s"), "append", p)    // v2
    // v1's mtime lands AFTER v2's (clock skew / object-store races):
    // v0=1000s, v1=5000s, v2=3000s → monotonized v2 becomes 5000s
    val log = java.nio.file.Paths.get(p, "_delta_log")
    Seq(0L -> 1000000L, 1L -> 5000000L, 2L -> 3000000L).foreach {
      case (v, ts) => java.nio.file.Files.setLastModifiedTime(
        log.resolve(f"$v%020d.json"),
        java.nio.file.attribute.FileTime.fromMillis(ts))
    }
    // at 4000s: raw mtimes would resolve v2 (3000s <= 4000s) even though
    // v1 "happened later" — the running-max adjustment resolves v0
    // (the newest version whose ADJUSTED stamp is <= the ask: v1 and v2
    // both adjust to 5000s, above the ask)
    assert(DeltaLog.readAsOfTimestamp(spark, p, 4000000L).count() == 1L)
    // at 5000s: v2 (adjusted 5000s) is visible, and being the newest
    // version at that stamp it wins
    assert(DeltaLog.readAsOfTimestamp(spark, p, 5000000L).count() == 3L)
  }
}
