package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, max, min}

/** The copy-on-write mutation scans are file-skipping: DISCOVERY reads
  * only the files whose footer stats may match (deleteWhere: the user
  * predicate; upsert: the update keys' integral bounds), and SURVIVORS
  * read only the touched files. Proven behaviorally: a file whose stats
  * range is DISJOINT from the mutation is physically deleted from disk —
  * any scan that still touched it would throw FileNotFoundException, so
  * the mutations succeeding at all is the no-scan proof.
  */
class DeltaCowPruneSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/cowprune/$name"
    val pp = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(pp))
      java.nio.file.Files.walk(pp)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    p
  }

  /** Range-partitioned fixture (4 files, disjoint id ranges) plus the
    * (rel, minId, maxId) layout read back BEFORE any poisoning.
    */
  private def fixture(name: String): (String, Seq[(String, Long, Long)]) = {
    val p = freshDir(name)
    val src = spark.range(400).select(col("id"), (col("id") * 2).as("v"))
      .repartitionByRange(4, col("id"))
    DeltaLog.write(src, "overwrite", p)
    val ranges = DeltaLog.activeAddsAsOf(spark, p).map { a =>
      val r = spark.read.parquet(s"$p/${a.rel}")
        .agg(min(col("id")), max(col("id"))).head()
      (a.rel, r.getLong(0), r.getLong(1))
    }
    (p, ranges)
  }

  test("deleteWhere never reads files whose stats exclude the predicate") {
    val (p, ranges) = fixture("del")
    // poison the TOP range file: reading it now throws
    val poison = ranges.maxBy(_._2)
    assert(poison._2 > 100, s"top file should start high, got $poison")
    java.nio.file.Files.delete(java.nio.file.Paths.get(p, poison._1))
    // a low-range delete must prune the poisoned file in BOTH phases
    val lowTarget = ranges.minBy(_._2)
    assert(DeltaLog.deleteWhere(spark, p, "id = 5") == 1)
    // and the rewrite really happened: the low file was swapped
    val after = DeltaLog.activeAddsAsOf(spark, p)
    assert(!after.exists(_.rel == lowTarget._1), "touched file not swapped")
    assert(after.exists(_.rel == poison._1), "untouched file must stay referenced")
    // stats-pruned read confirms the surviving low range (still no
    // poison scan)
    assert(DeltaLog.readWhere(spark, p, "id = 5").count() == 0L)
    assert(DeltaLog.readWhere(spark, p, "id = 6").count() == 1L)
  }

  test("upsert bounds-prunes discovery to the update keys' range") {
    val (p, ranges) = fixture("ups")
    val poison = ranges.maxBy(_._2)
    java.nio.file.Files.delete(java.nio.file.Paths.get(p, poison._1))
    val sp = spark; import sp.implicits._
    // integral key bounds 6..6 → only the low file is scanned
    DeltaLog.upsert(Seq((6L, 999L)).toDF("id", "v"), Seq("id"), p)
    assert(DeltaLog.readWhere(spark, p, "id = 6")
      .select("v").head.getLong(0) == 999L)
    // a pure insert outside every file's range still lands (no-match
    // MERGE = insert; discovery scans at most the bounds-surviving files)
    DeltaLog.upsert(Seq((100000L, 1L)).toDF("id", "v"), Seq("id"), p)
    assert(DeltaLog.readWhere(spark, p, "id = 100000")
      .select("v").head.getLong(0) == 1L)
  }

  test("deleteWhereViaDv discovery prunes by stats too") {
    val p = freshDir("dvdel")
    val src = spark.range(400).select(col("id"), (col("id") * 2).as("v"))
      .repartitionByRange(4, col("id"))
    DeltaLog.writeWithDeletionVectors(src, p, "id = 0")
    val ranges = DeltaLog.activeAddsAsOf(spark, p).map { a =>
      val r = spark.read.parquet(s"$p/${a.rel}")
        .agg(min(col("id")), max(col("id"))).head()
      (a.rel, r.getLong(0), r.getLong(1))
    }
    val poison = ranges.maxBy(_._2)
    java.nio.file.Files.delete(java.nio.file.Paths.get(p, poison._1))
    // low-range DV delete: neither the matched-row scan nor the
    // existing-descriptor merge may touch the poisoned file
    assert(DeltaLog.deleteWhereViaDv(spark, p, "id = 5") == 1L)
    assert(DeltaLog.readWhere(spark, p, "id = 5").count() == 0L)
    assert(DeltaLog.readWhere(spark, p, "id = 6").count() == 1L)
    // a predicate provably matching nothing commits nothing
    assert(DeltaLog.deleteWhereViaDv(spark, p, "id = -1") == 0L)
  }
}
