package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Copy-on-write mutations on deletion-vector-bearing tables: upsert,
  * deleteWhere and optimize rewrite ONLY touched files, compute their
  * survivors from LIVE rows (the DV bitmap anti-join the snapshot read
  * uses — deleted rows can never resurrect), echo each touched file's
  * superseded descriptor on its remove action (protocol shape — vacuum
  * associates the orphaned bin), and stage replacements with no DV.
  * Untouched files keep their descriptors, and time travel inside the
  * retention window still applies every version's own DVs.
  */
class DeltaCowDvSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/cowdv/$name"
    val pp = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(pp))
      java.nio.file.Files.walk(pp)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    p
  }

  /** (rel → DV cardinality) of the active snapshot's DV-bearing adds. */
  private def dvCards(p: String): Map[String, Long] =
    DeltaLog.activeAddsAsOf(spark, p)
      .collect { case a if a.dv.exists(_.cardinality > 0) =>
        a.rel -> a.dv.get.cardinality }.toMap

  // 200 ids in 4 files; fixture DV deletes id%3==0 → 133 live
  private def fixture(name: String): String = {
    val p = freshDir(name)
    val src = spark.range(200).select(col("id"),
      (col("id") % 7).as("grp"), (col("id") * 1.5).as("v"))
      .repartition(4)
    DeltaLog.writeWithDeletionVectors(src, p, "id % 3 = 0", inlineFirst = true)
    p
  }

  test("upsert on a DV table: no resurrection, descriptors echoed, untouched DVs kept") {
    val sp = spark; import sp.implicits._
    val p = fixture("upsert")
    val dvBefore = dvCards(p)
    assert(dvBefore.nonEmpty, "fixture must carry DVs")
    // update one LIVE key (id=1) and insert a fresh one (id=1000)
    val upd = Seq((1L, 99L, 0.5), (1000L, 99L, 0.5)).toDF("id", "grp", "v")
    DeltaLog.upsert(upd, Seq("id"), p)
    val back = DeltaLog.read(spark, p)
    assert(back.count() == 134L, s"got ${back.count()}")
    // DV-deleted rows must NOT resurrect through the rewrite
    assert(back.where($"id" % 3 === 0 && $"id" =!= 1000L).count() == 0L)
    assert(back.where($"id" === 1L).select("grp").head.getLong(0) == 99L)
    // only the touched file lost its DV; the others keep theirs
    val dvAfter = dvCards(p)
    val kept = dvBefore.keySet.intersect(dvAfter.keySet)
    assert(kept.size == dvBefore.size - 1,
      s"exactly one file rewritten: before=$dvBefore after=$dvAfter")
    kept.foreach(r => assert(dvAfter(r) == dvBefore(r)))
    // the remove action echoes the superseded descriptor (protocol shape)
    val v1 = java.nio.file.Files.readString(java.nio.file.Paths.get(
      s"$p/_delta_log/${"0" * 19}1.json"))
    assert(v1.contains(""""remove""""))
    assert(v1.split('\n').exists(l =>
      l.contains(""""remove"""") && l.contains(""""deletionVector"""")),
      "remove must echo the superseded DV descriptor")
    // upserting a DV-DELETED key: MERGE sees only live rows, so it lands
    // as an INSERT (one row), not an update of the hidden tombstone
    DeltaLog.upsert(Seq((3L, 77L, 7.7)).toDF("id", "grp", "v"), Seq("id"), p)
    val again = DeltaLog.read(spark, p)
    assert(again.where($"id" === 3L).count() == 1L)
    assert(again.where($"id" === 3L).select("grp").head.getLong(0) == 77L)
    // time travel: v0 still reads with the fixture's DVs applied
    assert(DeltaLog.read(spark, p, Some(0L)).count() == 133L)
  }

  test("deleteWhere on a DV table rewrites only touched files from live rows") {
    val sp = spark; import sp.implicits._
    val p = fixture("delete")
    val dvBefore = dvCards(p)
    // live = %3!=0 (133); of those %5==0 matches 26, spread over all files
    val rewritten = DeltaLog.deleteWhere(spark, p, "id % 5 = 0")
    assert(rewritten == 4, s"got $rewritten")
    val back = DeltaLog.read(spark, p)
    assert(back.count() == 107L, s"got ${back.count()}")
    assert(back.where($"id" % 3 === 0 || $"id" % 5 === 0).count() == 0L)
    // every file was rewritten → no DVs remain anywhere
    assert(dvCards(p).isEmpty, s"before=$dvBefore after=${dvCards(p)}")
    // a predicate matching only already-DV-deleted rows touches nothing
    assert(DeltaLog.deleteWhere(spark, p, "id = 3") == 0)
    // the swap is atomic history: v0 readable with its own DVs
    assert(DeltaLog.read(spark, p, Some(0L)).count() == 133L)
    // change feed across the rewrite window: remove expands to the rows
    // LIVE at removal (old DV applied) — deletes = 133, inserts = 107
    val cdf = DeltaLog.readChanges(spark, p, 0L, 1L)
    assert(cdf.where($"_change_type" === "delete").count() == 133L)
    assert(cdf.where($"_change_type" === "insert").count() == 107L)
    assert(cdf.where($"_change_type" === "delete" && $"id" % 3 === 0)
      .count() == 0L, "CDF deletes must not include already-DV-deleted rows")
  }

  test("optimize on a DV table materializes victim DVs, dataChange=false") {
    val sp = spark; import sp.implicits._
    val p = fixture("optimize")
    // add a DV generation on top of the fixture's
    DeltaLog.deleteWhereViaDv(spark, p, "id % 5 = 0") // v1: live 107
    val compacted = DeltaLog.optimize(spark, p) // all 4 files are small
    assert(compacted == 4, s"got $compacted")
    val back = DeltaLog.read(spark, p)
    assert(back.count() == 107L, s"got ${back.count()}")
    assert(back.where($"id" % 3 === 0 || $"id" % 5 === 0).count() == 0L)
    assert(dvCards(p).isEmpty, "materialized: no DVs left on the snapshot")
    // dataChange=false: the compaction window is invisible to the feed
    val cdf = DeltaLog.readChanges(spark, p, 1L, 2L)
    assert(cdf.where($"_change_type".isNotNull).count() == 0L)
    // zorder variant over a fresh DV fixture: same live rows, clustered
    val pz = fixture("zorder")
    assert(DeltaLog.optimize(spark, pz, zorderBy = Seq("grp")) == 4)
    assert(DeltaLog.read(spark, pz).count() == 133L)
    assert(DeltaLog.read(spark, pz).where($"id" % 3 === 0).count() == 0L)
  }

  test("deleteWhere keeps NULL-condition rows (SQL DELETE semantics)") {
    val sp = spark; import sp.implicits._
    val p = freshDir("nullpred")
    // x is nullable: rows 2 and 4 evaluate `x > 15` to NULL, not FALSE
    val src = Seq((1L, Some(10)), (2L, None), (3L, Some(30)), (4L, None))
      .toDF("id", "x")
    DeltaLog.write(src, "overwrite", p)
    // only id=3 is provably TRUE; the NULL-condition rows must SURVIVE
    assert(DeltaLog.deleteWhere(spark, p, "x > 15") == 1)
    val back = DeltaLog.read(spark, p)
    assert(back.count() == 3L, s"got ${back.count()}")
    assert(back.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 4L), "NULL-condition rows were deleted")
    // the DV fast path agrees: matching is TRUE-only there too
    val pdv = freshDir("nullpreddv")
    Seq((1L, Some(10)), (2L, None), (3L, Some(30)), (4L, None))
      .toDF("id", "x").write.mode("overwrite").parquet(pdv)
    DeltaLog.writeWithDeletionVectors(
      Seq((1L, Some(10)), (2L, None), (3L, Some(30)), (4L, None))
        .toDF("id", "x"), pdv, "id < 0") // no row deleted; feature declared
    assert(DeltaLog.deleteWhereViaDv(spark, pdv, "x > 15") == 1L)
    val backDv = DeltaLog.read(spark, pdv)
    assert(backDv.select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 4L), "DV delete removed NULL-condition rows")
  }

  test("DV delete refuses typed above the touched-file budget") {
    val sp = spark; import sp.implicits._
    val p = fixture("budget")
    // the fixture spreads ids over 4 files; a broad predicate touches
    // them all — with a budget of 1 the smallness contract refuses
    // BEFORE any payload collect, and the table is untouched
    val before = DeltaLog.read(spark, p).count()
    val e = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.deleteWhereViaDv(spark, p, "id % 2 = 1", maxTouchedFiles = 1)
    }
    assert(e.getMessage.contains("budget"))
    assert(e.getMessage.contains("deleteWhere"))
    assert(DeltaLog.read(spark, p).count() == before, "refusal mutates nothing")
    // within budget the same delete lands
    val n = DeltaLog.deleteWhereViaDv(spark, p, "id = 1", maxTouchedFiles = 1)
    assert(n == 1L)
    assert(DeltaLog.read(spark, p).count() == before - 1)
  }

  test("vacuum associates the bins orphaned by a copy-on-write rewrite") {
    val sp = spark; import sp.implicits._
    val p = fixture("vacuum")
    assert(DeltaLog.deleteWhere(spark, p, "id % 5 = 0") == 4)
    // all DVs were materialized by the rewrite → the fixture bin is an
    // orphan; retention 0 sweeps it together with the replaced data files
    val swept = DeltaLog.vacuum(spark, p, retentionMs = 0L)
    assert(swept.exists(s => s.startsWith("deletion_vector_") &&
      s.endsWith(".bin")), s"got $swept")
    assert(DeltaLog.read(spark, p).count() == 107L)
  }
}
