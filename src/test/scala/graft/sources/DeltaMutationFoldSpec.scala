package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Every MUTATION and MAINTENANCE path must route its snapshot fold (and
  * its stats/size/DV pruning) through the distributed kernel above
  * [[DeltaLog.SnapshotDriverMaxBytes]] — mirroring what
  * [[DeltaSnapshotDfSpec]] pins for read/readWhere. `snapshotDriverMaxBytes
  * = 0` forces every op onto the distributed route; outcomes must be
  * IDENTICAL to the driver route on a twin table: at 10⁷ active files the
  * driver must hold only the CANDIDATE/TOUCHED entries (or bare path
  * strings for vacuum), never the full snapshot's add metadata.
  */
class DeltaMutationFoldSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/mutfold/$name"
    val pp = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(pp))
      java.nio.file.Files.walk(pp)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    p
  }

  /** Two identical multi-file tables (disjoint id ranges per file so
    * stats pruning has teeth), one per route.
    */
  private def twins(name: String): (String, String) = {
    val sp = spark; import sp.implicits._
    val mk = (p: String) => {
      (0 until 4).foreach { b =>
        DeltaLog.write((b * 100L until b * 100L + 50L).map(i => (i, i * 2.0))
          .toDF("id", "v").coalesce(1), if (b == 0) "overwrite" else "append",
          p, checkpointInterval = 0)
      }
      p
    }
    (mk(freshDir(s"$name-driver")), mk(freshDir(s"$name-dist")))
  }

  private def rows(p: String): Set[Seq[Any]] =
    DeltaLog.read(spark, p).collect().map(_.toSeq.toVector: Seq[Any]).toSet

  test("deleteWhere: distributed route matches the driver route") {
    val (a, b) = twins("delete")
    val na = DeltaLog.deleteWhere(spark, a, "id >= 210 AND id < 240")
    val nb = DeltaLog.deleteWhere(spark, b, "id >= 210 AND id < 240",
      snapshotDriverMaxBytes = 0L)
    assert(na == nb && nb == 1, s"rewrote $na vs $nb files")
    assert(rows(a) == rows(b) && rows(b).size == 170)
  }

  test("upsert: distributed route matches the driver route") {
    val sp = spark; import sp.implicits._
    val (a, b) = twins("upsert")
    val upd = Seq((120L, -1.0), (121L, -2.0), (999L, -3.0)).toDF("id", "v")
    DeltaLog.upsert(upd, Seq("id"), a)
    DeltaLog.upsert(upd, Seq("id"), b, snapshotDriverMaxBytes = 0L)
    assert(rows(a) == rows(b) && rows(b).size == 201)
    assert(DeltaLog.read(spark, b).where(col("v") < 0).count() == 3L)
  }

  test("deleteWhereViaDv + purge: distributed routes match driver routes") {
    val sp = spark; import sp.implicits._
    def dvTable(name: String): String = {
      val p = freshDir(name)
      val src = sp.range(120).select(col("id"), (col("id") * 1.5).as("v"))
        .repartition(3)
      DeltaLog.writeWithDeletionVectors(src, p, "id % 4 = 0")
      p
    }
    val a = dvTable("dvdel-driver"); val b = dvTable("dvdel-dist")
    val na = DeltaLog.deleteWhereViaDv(spark, a, "id % 10 = 1")
    val nb = DeltaLog.deleteWhereViaDv(spark, b, "id % 10 = 1",
      snapshotDriverMaxBytes = 0L)
    assert(na == nb && nb == 12L, s"deleted $na vs $nb rows")
    assert(rows(a) == rows(b) && rows(b).size == 78)
    def cards(p: String): Map[String, Long] =
      DeltaLog.activeAddsAsOf(spark, p)
        .collect { case e if e.dv.exists(_.cardinality > 0) =>
          e.rel.split('/').last.take(5) -> e.dv.get.cardinality }.toMap
    assert(cards(a).values.toSeq.sorted == cards(b).values.toSeq.sorted)
    // purge both, one per route — identical final states, no DVs left
    assert(DeltaLog.purgeDeletionVectors(spark, a) ==
      DeltaLog.purgeDeletionVectors(spark, b, snapshotDriverMaxBytes = 0L))
    assert(rows(a) == rows(b) && rows(b).size == 78)
    assert(DeltaLog.activeAddsAsOf(spark, b).forall(_.dv.isEmpty))
  }

  test("optimize: distributed route compacts the same victims") {
    val (a, b) = twins("optimize")
    val na = DeltaLog.optimize(spark, a)
    val nb = DeltaLog.optimize(spark, b, snapshotDriverMaxBytes = 0L)
    assert(na == nb && nb == 4, s"compacted $na vs $nb files")
    assert(rows(a) == rows(b) && rows(b).size == 200)
    // size filter ships to executors: a target below every file size
    // finds nothing on either route
    assert(DeltaLog.optimize(spark, b, targetBytes = 1L,
      snapshotDriverMaxBytes = 0L) == 0)
    // z-order variant on the distributed route
    assert(DeltaLog.optimize(spark, a, zorderBy = Seq("id"),
      snapshotDriverMaxBytes = 0L) >= 1)
    assert(rows(a) == rows(b))
  }

  test("restore: distributed diff matches, vacuumed target refuses typed") {
    val sp = spark; import sp.implicits._
    val (a, b) = twins("restore")
    Seq(a, b).foreach { p =>
      assert(DeltaLog.deleteWhere(spark, p, "id < 20") == 1) // v4
      DeltaLog.write(Seq((999L, 9.0)).toDF("id", "v"), "append", p) // v5
    }
    DeltaLog.restore(spark, a, 3L)
    DeltaLog.restore(spark, b, 3L, snapshotDriverMaxBytes = 0L)
    assert(rows(a) == rows(b) && rows(b).size == 200)
    // time travel to the interim versions is preserved on both
    assert(DeltaLog.read(spark, b, Some(5L)).count() == 181L)
    // a vacuumed-away target file refuses typed on the distributed route
    val c = freshDir("restore-vac")
    DeltaLog.write((1L to 50L).map(i => (i, i * 2.0)).toDF("id", "v"),
      "overwrite", c, checkpointInterval = 0)
    assert(DeltaLog.deleteWhere(spark, c, "id <= 10") == 1)
    DeltaLog.vacuum(spark, c, retentionMs = 0L)
    val e = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.restore(spark, c, 0L, snapshotDriverMaxBytes = 0L) }
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
  }

  test("skippingStats: distributed counts equal driver counts") {
    val (a, _) = twins("skip")
    val driver = DeltaLog.skippingStats(spark, a, "id >= 210 AND id < 240")
    val dist = DeltaLog.skippingStats(spark, a, "id >= 210 AND id < 240",
      snapshotDriverMaxBytes = 0L)
    assert(driver == dist && dist == ((1, 4)), s"$driver vs $dist")
    val all = DeltaLog.skippingStats(spark, a, "v >= 0.0",
      snapshotDriverMaxBytes = 0L)
    assert(all == ((4, 4)), s"$all")
  }

  test("vacuum: distributed active-set build sweeps the same orphans") {
    val (a, b) = twins("vacuum")
    Seq(a, b).foreach(p => assert(DeltaLog.deleteWhere(spark, p, "id < 50") == 1))
    val sweptA = DeltaLog.vacuum(spark, a, retentionMs = 0L).toSet
    val sweptB = DeltaLog.vacuum(spark, b, retentionMs = 0L,
      snapshotDriverMaxBytes = 0L).toSet
    // same COUNT of swept orphans (file names are uuid-distinct per twin)
    assert(sweptA.size == sweptB.size && sweptB.nonEmpty,
      s"${sweptA.size} vs ${sweptB.size}")
    assert(rows(a) == rows(b) && rows(b).size == 150)
    // the sweep never touches live files on the distributed route
    assert(DeltaLog.read(spark, b).count() == 150L)
  }
}
