package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.scalatest.BeforeAndAfterEach

/** Rewrite-commit conflict detection + rebase (delta-spark's
  * ConflictChecker, distilled): a rewrite (upsert / deleteWhere /
  * optimize / DV delete) that loses its commit slot REBASES when every
  * commit that landed since is logically disjoint — no protocol or
  * metaData action, no overlap with the rewrite's removes, no added
  * file whose stats may satisfy the rewrite's read predicate — and
  * refuses typed (ConcurrentModification) otherwise. The races are
  * DETERMINISTIC: a test hook steals the exact slot the rewrite is
  * about to take by writing a foreign commit there.
  */
class DeltaConflictSpec extends SparkSpec with BeforeAndAfterEach {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/conflict/$name"
    val pp = Paths.get(p)
    if (Files.exists(pp))
      Files.walk(pp).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    p
  }

  override def afterEach(): Unit = {
    DeltaLog.commitSlotTestHook = None
    super.afterEach()
  }

  /** Plant a REAL parquet file (ids lo..hi inclusive, schema id/s) in
    * the table dir under `name` — foreign adds must reference real
    * files whose CONTENT matches their stats, or later snapshot reads
    * lie.
    */
  private def foreignFile(p: String, name: String, lo: Long,
      hi: Long): (String, Long) = {
    val sp = spark; import sp.implicits._
    val tmp = s"$p/.foreign_stage"
    (lo to hi).map(i => (i, s"f$i")).toDF("id", "s").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.toString.endsWith(".parquet")).get
    Files.move(part, Paths.get(p, name))
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.delete(f))
    (name, Files.size(Paths.get(p, name)))
  }

  /** Install a hook that writes `lines` into the slot the next rewrite
    * targets (making its acquire LOSE), then uninstalls itself.
    */
  private def stealNextSlot(p: String)(lines: => Seq[String]): Unit =
    DeltaLog.commitSlotTestHook = Some { (_, v) =>
      DeltaLog.commitSlotTestHook = None
      Files.writeString(Paths.get(p, "_delta_log", f"$v%020d.json"),
        lines.mkString("", "\n", "\n"))
    }

  private def addLine(rel: String, size: Long, stats: Option[String]) =
    s"""{"add":{"path":"$rel","partitionValues":{},"size":$size,""" +
      s""""modificationTime":0,"dataChange":true""" +
      stats.map(s => s""","stats":"${s.replace("\"", "\\\"")}"""")
        .getOrElse("") + "}}"

  private def statsJson(lo: Long, hi: Long, n: Long) =
    s"""{"numRecords":$n,"minValues":{"id":$lo},"maxValues":{"id":$hi},"nullCount":{"id":0}}"""

  test("optimize rebases past a concurrent append") {
    val sp = spark; import sp.implicits._
    val p = freshDir("optimize")
    DeltaLog.write((0L until 8L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(4), "overwrite", p)
    val (rel, size) = foreignFile(p, "foreign-append.parquet", 100L, 101L)
    stealNextSlot(p)(Seq(
      """{"commitInfo":{"operation":"APPEND","txnId":"someone-else"}}""",
      addLine(rel, size, Some(statsJson(100L, 101L, 2L)))))
    // dataChange=false restage: the winner's adds never conflict
    assert(DeltaLog.optimize(spark, p, targetBytes = 1L << 30) >= 1)
    val versions = Files.list(Paths.get(p, "_delta_log")).toArray
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .filter(_.matches("\\d{20}\\.json")).sorted
    assert(versions.length == 3,
      s"append at v1, optimize rebased to v2: ${versions.toSeq}")
    assert(Files.readString(Paths.get(p, "_delta_log", versions(1)))
      .contains("someone-else"))
    assert(Files.readString(Paths.get(p, "_delta_log", versions(2)))
      .contains("OPTIMIZE"))
    assert(DeltaLog.read(spark, p).count() == 10L) // 8 + 2 foreign rows
  }

  test("deleteWhere rebases past a predicate-disjoint append, refuses an overlapping one") {
    val sp = spark; import sp.implicits._
    val p = freshDir("delete")
    DeltaLog.write((0L until 8L).map(i => (i, s"v$i")).toDF("id", "s"),
      "overwrite", p)
    // winner's add provably cannot hold id=7 (stats id ∈ [100, 103]) →
    // logically disjoint → the delete rebases past it
    val (rel, size) = foreignFile(p, "foreign-high.parquet", 100L, 103L)
    stealNextSlot(p)(Seq(
      """{"commitInfo":{"operation":"APPEND","txnId":"high-keys"}}""",
      addLine(rel, size, Some(statsJson(100L, 103L, 4L)))))
    assert(DeltaLog.deleteWhere(spark, p, "id = 7") >= 1)
    assert(DeltaLog.read(spark, p).where("id = 7").count() == 0L)
    assert(DeltaLog.read(spark, p).count() == 11L) // 8 - 1 + 4 foreign
    // an OVERLAPPING winner (stats straddle the predicate) refuses typed
    val (rel2, size2) = foreignFile(p, "foreign-wide.parquet", 0L, 7L)
    stealNextSlot(p)(Seq(
      """{"commitInfo":{"operation":"APPEND","txnId":"overlap"}}""",
      addLine(rel2, size2, Some(statsJson(0L, 7L, 8L)))))
    val e = intercept[graft.GraftError.ConcurrentModification] {
      DeltaLog.deleteWhere(spark, p, "id = 5")
    }
    assert(e.getMessage.contains("may match"))
  }

  test("upsert rebases past a key-disjoint append, refuses removes and metaData") {
    val sp = spark; import sp.implicits._
    val p = freshDir("upsert")
    DeltaLog.write((0L until 6L).map(i => (i, s"v$i")).toDF("id", "s"),
      "overwrite", p)
    val (rel, size) = foreignFile(p, "foreign-high.parquet", 1000L, 1005L)
    stealNextSlot(p)(Seq(
      """{"commitInfo":{"operation":"APPEND","txnId":"high-keys"}}""",
      addLine(rel, size, Some(statsJson(1000L, 1005L, 6L)))))
    DeltaLog.upsert(Seq((2L, "B")).toDF("id", "s"), Seq("id"), p)
    assert(DeltaLog.read(spark, p).where("id = 2 AND s = 'B'").count() == 1L,
      "rebased upsert landed")
    // winner REMOVING the files the upsert rewrites → typed refusal
    val touched = DeltaLog.activeFiles(spark, p)
      .map(f => Paths.get(f).getFileName.toString)
    stealNextSlot(p)(Seq(
      """{"commitInfo":{"operation":"DELETE","txnId":"remover"}}""") ++
      touched.map(t =>
        s"""{"remove":{"path":"$t","deletionTimestamp":0,"dataChange":true}}"""))
    val e = intercept[graft.GraftError.ConcurrentModification] {
      DeltaLog.upsert(Seq((3L, "C")).toDF("id", "s"), Seq("id"), p)
    }
    assert(e.getMessage.contains("already removed"))
    // a winner carrying a metaData action refuses too
    val p2 = freshDir("upsert_meta")
    DeltaLog.write((100L until 106L).map(i => (i, s"v$i")).toDF("id", "s"),
      "overwrite", p2)
    stealNextSlot(p2)(Seq(
      """{"commitInfo":{"operation":"SOMETHING","txnId":"reshaper"}}""",
      """{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":"{}","partitionColumns":[],"configuration":{}}}"""))
    val e2 = intercept[graft.GraftError.ConcurrentModification] {
      DeltaLog.upsert(Seq((101L, "Z")).toDF("id", "s"), Seq("id"), p2)
    }
    assert(e2.getMessage.contains("metadata"))
  }

  test("DV-delete rebase re-stamps ICT past a slot-stealing future winner") {
    val sp = spark; import sp.implicits._
    val p = freshDir("ict_rebase")
    DeltaLog.write((0L until 8L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(2), "overwrite", p,
      tableProperties = Map(
        "delta.enableDeletionVectors" -> "true",
        "delta.enableInCommitTimestamps" -> "true"))
    // the winner carries an ICT an HOUR in the future (clock skew) —
    // the rebased commit must still exceed it, or the table's in-log
    // clock goes backwards
    val future = System.currentTimeMillis() + 3600000L
    val (rel, size) = foreignFile(p, "foreign-ict.parquet", 500L, 507L)
    stealNextSlot(p)(Seq(
      s"""{"commitInfo":{"inCommitTimestamp":$future,"operation":"APPEND","txnId":"ict-race"}}""",
      addLine(rel, size, Some(statsJson(500L, 507L, 8L)))))
    assert(DeltaLog.deleteWhereViaDv(spark, p, "id = 3") == 1L)
    // the rebased DELETE landed at v2 with ICT strictly past the winner
    val v2 = Files.readString(Paths.get(p, "_delta_log", "0" * 19 + "2.json"))
    val ict = """"inCommitTimestamp":(\d+)""".r
      .findFirstMatchIn(v2).get.group(1).toLong
    assert(ict > future, s"rebase must exceed the winner's ICT: $ict")
    assert(DeltaLog.read(spark, p).count() == 15L)
  }

  test("DV delete rebases past a disjoint append") {
    val sp = spark; import sp.implicits._
    val p = freshDir("dvdelete")
    DeltaLog.write((0L until 8L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(2), "overwrite", p,
      tableProperties = Map("delta.enableDeletionVectors" -> "true"))
    val (rel, size) = foreignFile(p, "foreign-dv.parquet", 500L, 507L)
    stealNextSlot(p)(Seq(
      """{"commitInfo":{"operation":"APPEND","txnId":"dv-race"}}""",
      addLine(rel, size, Some(statsJson(500L, 507L, 8L)))))
    assert(DeltaLog.deleteWhereViaDv(spark, p, "id = 3") == 1L)
    assert(DeltaLog.read(spark, p).where("id = 3").count() == 0L)
    assert(DeltaLog.read(spark, p).count() == 15L) // 8 - 1 + 8 foreign
  }
}
