package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Row-level change feed over deletion-vector tables: a DV-native delete
  * re-adds the same file under a fresh descriptor, so the change is the
  * BITMAP DIFFERENCE per generation — rows in the new DV but not the
  * old were deleted at that version; rows only in the old (a DV-aware
  * RESTORE) were re-inserted. Before round 16 readChanges refused DV
  * windows outright.
  */
class DeltaDvChangesSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/dvcdf/$name"
    val pp = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(pp))
      java.nio.file.Files.walk(pp)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    p
  }

  private def changeIds(df: org.apache.spark.sql.DataFrame,
      v: Long, ct: String): Set[Long] =
    df.where(col("_commit_version") === v && col("_change_type") === ct)
      .select("id").collect().map(_.getLong(0)).toSet

  test("multi-generation DV deletes surface as per-version row deltas; restore re-inserts") {
    val sp = spark
    import sp.implicits._
    val p = freshDir("generations")
    val src = sp.range(60).select(col("id"), (col("id") * 1.5).as("v"))
      .repartition(3)
    val ids = (0L until 60L).toSet
    // v0: fixture deletes id%4==0 at birth (adds born WITH descriptors)
    DeltaLog.writeWithDeletionVectors(src, p, "id % 4 = 0", inlineFirst = true)
    val live0 = ids.filterNot(_ % 4 == 0)
    // v1, v2: two DV-native delete generations (descriptor swaps)
    assert(DeltaLog.deleteWhereViaDv(spark, p, "id % 5 = 0") == live0.count(_ % 5 == 0))
    val live1 = live0.filterNot(_ % 5 == 0)
    assert(DeltaLog.deleteWhereViaDv(spark, p, "id % 7 = 0") == live1.count(_ % 7 == 0))
    val live2 = live1.filterNot(_ % 7 == 0)

    // the full window: v0 inserts are the rows its own bitmaps KEEP
    val all = DeltaLog.readChanges(spark, p, -1L, 2L)
    assert(changeIds(all, 0L, "insert") == live0,
      "an add born with a DV inserts only its live rows")
    assert(changeIds(all, 1L, "delete") == live0.filter(_ % 5 == 0))
    assert(changeIds(all, 2L, "delete") == live1.filter(_ % 7 == 0))
    assert(changeIds(all, 1L, "insert").isEmpty)
    assert(changeIds(all, 2L, "insert").isEmpty)

    // v3: DV-aware RESTORE to v1 — the v2-deleted rows come back as
    // inserts (old bitmap ⊃ new bitmap ⇒ restoredNow = the difference)
    DeltaLog.restore(spark, p, 1L)
    val restoreWindow = DeltaLog.readChanges(spark, p, 2L, 3L)
    assert(changeIds(restoreWindow, 3L, "insert") == live1.filter(_ % 7 == 0),
      "restore must re-insert exactly the rows the undone generation deleted")
    assert(changeIds(restoreWindow, 3L, "delete").isEmpty)
    assert(DeltaLog.read(spark, p).count() == live1.size.toLong)

    // narrow windows see only their own generation
    val w1 = DeltaLog.readChanges(spark, p, 0L, 1L)
    assert(changeIds(w1, 1L, "delete") == live0.filter(_ % 5 == 0))
    assert(live2.nonEmpty) // the fixture exercised all three predicates
  }

  test("non-DV windows keep the file-level fast path semantics") {
    val sp = spark
    import sp.implicits._
    val p = freshDir("plain")
    DeltaLog.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      "overwrite", p, checkpointInterval = 0)
    DeltaLog.write(Seq((3L, "c")).toDF("id", "s"), "append", p,
      checkpointInterval = 0)
    val ch = DeltaLog.readChanges(spark, p, 0L, 1L)
    assert(ch.where(col("_change_type") === "insert").count() == 1L)
    assert(ch.select("id").collect().map(_.getLong(0)).toSet == Set(3L))
  }
}
