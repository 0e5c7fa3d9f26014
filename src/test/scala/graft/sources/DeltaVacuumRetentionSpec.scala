package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Vacuum honors a data-file retention window (default 7 days, like real
  * delta's deletedFileRetentionDuration): a file removed from the
  * snapshot stays on disk until its remove-action deletionTimestamp is
  * older than the window, so concurrent readers on the previous version
  * and time-travel reads inside the window never race the sweep.
  * Immediate sweep only behind an explicit `retentionMs = 0`.
  */
class DeltaVacuumRetentionSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/vacret/$name"
    val pp = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(pp))
      java.nio.file.Files.walk(pp)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    p
  }

  import scala.jdk.CollectionConverters._

  private def parquetFiles(p: String): Set[String] =
    java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
      .filterNot(_.toString.contains("_delta_log"))
      .map(_.getFileName.toString)
      .filter(_.endsWith(".parquet"))
      .toSet

  test("just-removed file survives default vacuum; swept at retentionMs = 0") {
    val sp = spark
    import sp.implicits._
    val p = freshDir("window")
    DeltaLog.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      "overwrite", p, checkpointInterval = 0)
    val before = parquetFiles(p)
    // copy-on-write delete: v1 removes the v0 file (deletionTimestamp =
    // now) and adds the rewritten one — the old file is an orphan
    assert(DeltaLog.deleteWhere(spark, p, "id = 1") == 1)
    assert(parquetFiles(p).intersect(before) == before,
      "rewrite must not delete the old file itself")
    // default vacuum: the orphan was removed seconds ago — inside the
    // 7-day window, it must survive
    val sweptDefault = DeltaLog.vacuum(spark, p)
    assert(sweptDefault.isEmpty, s"default vacuum swept inside the window: $sweptDefault")
    assert(parquetFiles(p).intersect(before) == before)
    // time-travel read inside the window is still green
    val v0 = DeltaLog.read(spark, p, versionAsOf = Some(0L))
    assert(v0.count() == 2L)
    assert(DeltaLog.read(spark, p).count() == 1L)
    // explicit retentionMs = 0: immediate sweep of exactly the orphaned
    // rewrite victim (the delete's untouched co-files stay active)
    val swept = DeltaLog.vacuum(spark, p, retentionMs = 0L)
    assert(swept.nonEmpty && swept.toSet.subsetOf(before),
      s"retentionMs=0 must sweep the orphan, swept=$swept")
    assert(parquetFiles(p).intersect(swept.toSet).isEmpty)
    assert(DeltaLog.read(spark, p).count() == 1L) // live data untouched
  }

  test("retention keys on the remove action's deletionTimestamp, not file age") {
    val sp = spark
    import sp.implicits._
    val p = freshDir("remove_ts")
    DeltaLog.write(Seq((1L, "x")).toDF("id", "s"), "overwrite", p,
      checkpointInterval = 0)
    // age the data file on disk WAY past any window: only the remove
    // timestamp (still "now") may decide, so it must survive
    val dataFile = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      .iterator().asScala
      .find(f => f.getFileName.toString.endsWith(".parquet") &&
        !f.toString.contains("_delta_log")).get
    java.nio.file.Files.setLastModifiedTime(dataFile,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 30L * 24 * 3600 * 1000))
    assert(DeltaLog.deleteWhere(spark, p, "id = 1") == 1)
    assert(DeltaLog.vacuum(spark, p).isEmpty,
      "an old file removed a second ago is inside the window")
    assert(java.nio.file.Files.exists(dataFile))
    // a remove older than the window IS sweepable: shrink the window
    // under the remove's age instead of faking timestamps
    Thread.sleep(5)
    assert(DeltaLog.vacuum(spark, p, retentionMs = 1L).nonEmpty)
    assert(!java.nio.file.Files.exists(dataFile))
  }

  test("untracked young debris survives default vacuum (in-flight writer safety)") {
    val sp = spark
    import sp.implicits._
    val p = freshDir("debris")
    DeltaLog.write(Seq((1L, "x")).toDF("id", "s"), "overwrite", p,
      checkpointInterval = 0)
    // a file moved into the table by a writer that hasn't committed yet
    val debris = java.nio.file.Paths.get(p, "part-inflight.parquet")
    val donor = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      .iterator().asScala
      .find(f => f.getFileName.toString.endsWith(".parquet") &&
        !f.toString.contains("_delta_log")).get
    java.nio.file.Files.copy(donor, debris)
    assert(DeltaLog.vacuum(spark, p).isEmpty,
      "young untracked debris must survive the default window")
    assert(java.nio.file.Files.exists(debris))
    assert(DeltaLog.vacuum(spark, p, retentionMs = 0L)
      .contains("part-inflight.parquet"))
    assert(!java.nio.file.Files.exists(debris))
  }
}
