package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths, StandardOpenOption}

/** 100×-scale design floor for the delta snapshot state (round-20
  * verdict item 1): with ≥50k add actions in the log, the four
  * metadata consumers — stats-pruned reads, OPTIMIZE victim selection,
  * the checkpoint survivor filter and the overwrite remove-set — must
  * run off the DISTRIBUTED fold ([[DeltaLog.activeAddsDfAsOf]]),
  * collecting on the driver only the final path list the DataSource
  * scan API forces (plus, for the overwrite, the (path, dv) pairs its
  * commit JSON must spell out anyway). In particular: no plan may embed
  * the add set as a driver-built LocalRelation, and no route may
  * materialize every add's stats/partitionValues metadata
  * (`Seq[DeltaStats.AddEntry]`, GBs of driver heap at a real 100 TB
  * table's ~10⁶ files).
  */
class DeltaSnapshotScaleSpec extends SparkSpec {

  private val N = 50000

  private def freshDir(name: String): String = {
    val p = s"target/tmp/snapscale/$name"
    val pp = Paths.get(p)
    if (Files.exists(pp))
      Files.walk(pp).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    p
  }

  /** A table whose log carries N synthetic adds with disjoint id-range
    * stats at v1, on top of a small REAL v0. Only the one "survivor"
    * add (ids 123450..123459) points at a real parquet file — stats
    * pruning must never open (or even list) the other 49,999.
    * Returns (path, v0AddCount).
    */
  private def manyAddFixture(name: String): (String, Int) = {
    val sp = spark; import sp.implicits._
    val p = freshDir(name)
    DeltaLog.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .repartition(1), "overwrite", p, checkpointInterval = 0)
    val v0Adds = Files.readAllLines(
      Paths.get(p, "_delta_log", "0" * 20 + ".json")).toArray.toSeq
      .map(_.toString).count(_.contains("\"add\""))
    // the one real file behind the survivor add
    val stage = freshDir(s"${name}_stage")
    (123450L to 123459L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1).write.parquet(stage)
    val part = Files.list(Paths.get(stage)).toArray.map(_.toString)
      .filter(f => f.endsWith(".parquet") && f.contains("part-")).head
    Files.copy(Paths.get(part), Paths.get(p, "survivor.parquet"))
    val sb = new StringBuilder
    def statsJson(lo: Long, hi: Long): String =
      s"""{\\"numRecords\\":10,\\"minValues\\":{\\"id\\":$lo,\\"s\\":\\"a\\"},\\"maxValues\\":{\\"id\\":$hi,\\"s\\":\\"z\\"},\\"nullCount\\":{\\"id\\":0,\\"s\\":0}}"""
    (0 until N).foreach { i =>
      val rel = if (i == 12345) "survivor.parquet" else f"synthetic-$i%05d.parquet"
      val lo = i.toLong * 10; val hi = lo + 9
      sb.append(s"""{"add":{"path":"$rel","partitionValues":{},""" +
        s""""size":700,"modificationTime":0,"dataChange":true,""" +
        s""""stats":"${statsJson(lo, hi)}"}}""").append('\n')
    }
    Files.write(Paths.get(p, "_delta_log", "0" * 19 + "1.json"),
      sb.toString.getBytes("UTF-8"), StandardOpenOption.CREATE_NEW)
    (p, v0Adds)
  }

  test("distributed prune: plan has no LocalRelation, scan lists only survivors") {
    val (p, _) = manyAddFixture("prune")
    val df = DeltaLog.readWhere(spark, p, "id = 123451",
      snapshotDriverMaxBytes = 0L)
    // the add set never becomes a driver-built LocalRelation anywhere in
    // the plan — the only per-file state is the scan's own file index
    val locals = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(locals.isEmpty, s"prune plan must not embed a LocalRelation: $locals")
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val listed = scans.map(_.relation.location.inputFiles.length).sum
    assert(listed == 1,
      s"stats pruning must leave exactly the survivor file, listed $listed")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(123451L))
  }

  test("overwrite on a 50k-add log: remove set covers every active file " +
      "via the distributed fold") {
    val sp = spark; import sp.implicits._
    val (p, v0Adds) = manyAddFixture("overwrite")
    DeltaLog.write(Seq((777L, "new")).toDF("id", "s"), "overwrite", p,
      checkpointInterval = 0, snapshotDriverMaxBytes = 0L)
    val lines = Files.readAllLines(
      Paths.get(p, "_delta_log", "0" * 19 + "2.json")).toArray.toSeq
      .map(_.toString)
    val removes = lines.count(_.contains("\"remove\""))
    assert(removes == N + v0Adds,
      s"overwrite must remove all $N synthetic + $v0Adds real adds, got $removes")
    assert(DeltaLog.read(spark, p).collect().map(_.getLong(0)).toSeq ==
      Seq(777L))
  }

  test("declared-schema path listing folds the 50k-add snapshot distributedly") {
    val (p, v0Adds) = manyAddFixture("pathlist")
    // the Loaders declared-schema delta load lists through this: above
    // the threshold the driver collects ONLY path strings (never a
    // Seq[AddEntry] of all 50k adds' stats/partition metadata)
    val paths = DeltaLog.activeFilePathsScalable(spark, p,
      snapshotDriverMaxBytes = 0L)
    assert(paths.length == N + v0Adds)
    assert(paths.count(_.endsWith("survivor.parquet")) == 1)
    // parity with the driver-fold listing
    assert(paths.toSet ==
      DeltaLog.activeFilePathsScalable(spark, p,
        snapshotDriverMaxBytes = Long.MaxValue).toSet)
  }

  test("checkpoint survivor filter folds the 50k-add snapshot distributedly") {
    val (p, v0Adds) = manyAddFixture("checkpoint")
    DeltaLog.writeCheckpoint(spark, p, 1L, snapshotDriverMaxBytes = 0L)
    val cpFiles = Files.list(Paths.get(p, "_delta_log")).toArray
      .map(_.toString).filter(f =>
        f.contains(".checkpoint") && f.endsWith(".parquet"))
    assert(cpFiles.nonEmpty)
    val cp = spark.read.parquet(cpFiles: _*)
    val addCount = cp.where(org.apache.spark.sql.functions
      .col("add").isNotNull).count()
    assert(addCount == (N + v0Adds).toLong,
      s"checkpoint must fold all active adds, got $addCount")
  }
}
