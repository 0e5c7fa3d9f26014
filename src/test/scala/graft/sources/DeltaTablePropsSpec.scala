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
    assert(DeltaLog.readAsOfTimestamp(spark, p, 9999999999L).count() == 3L)
    // between v0 and v1: still v0
    assert(DeltaLog.readAsOfTimestamp(spark, p, 1999999L).count() == 1L)
    // before the earliest visible commit: typed
    val e = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.readAsOfTimestamp(spark, p, 999999L) }
    assert(e.getMessage.contains("no commit at or before"), e.getMessage)
  }
}
