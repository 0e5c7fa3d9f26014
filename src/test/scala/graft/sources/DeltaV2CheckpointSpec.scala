package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions.col

/** V2 (UUID-named) checkpoints — the modern delta-spark/kernel layout:
  * a `%020d.checkpoint.<uuid>.{parquet|json}` MANIFEST carrying the
  * non-file actions (checkpointMetadata, protocol, metaData, txn) plus
  * `sidecar` actions, and the file actions (add/remove) living in
  * sidecar parquets under `_delta_log/_sidecars/`. The reader folds
  * manifest ∪ sidecars into the same frame classic checkpoints feed:
  * adds survive, remove tombstones never resurrect, DV descriptors on
  * sidecar adds filter rows at scan, and post-checkpoint commits replay
  * on top. Foreign fixtures are synthesized BY HAND here (action JSON →
  * parquet), never written by this engine — exactly what a table
  * checkpointed by delta-spark looks like on disk.
  */
class DeltaV2CheckpointSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/v2cp/$name"
    val pp = Paths.get(p)
    if (Files.exists(pp))
      Files.walk(pp).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    p
  }

  /** Action JSON lines → a single parquet file at `out` (how foreign
    * engines lay out v2 manifests and sidecars).
    */
  private def jsonToParquet(lines: Seq[String], out: String): Unit = {
    val sp = spark
    import sp.implicits._
    val tmp = s"$out.tmpdir"
    sp.read.json(lines.toDS()).coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.toString.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(out).getParent)
    Files.move(part, Paths.get(out))
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.delete(f))
  }

  private def metaDataLine(p: String, version: Long): String =
    Files.readString(Paths.get(p, "_delta_log", f"$version%020d.json"))
      .linesIterator.find(_.contains("\"metaData\"")).get

  /** Two-commit table (v0: ids 0..9 sorted in one file; v1: ids 10..14),
    * then a HAND-SYNTHESIZED v2 checkpoint at version 1: sidecar1 holds
    * file A's add with an inline DV deleting row positions 0 and 3
    * (ids 0 and 3 — A is written sorted, position == id) plus a remove
    * tombstone, sidecar2 holds file B's add; the manifest carries
    * checkpointMetadata/protocol/metaData and the two sidecar actions.
    * Commit 0 is deleted so the fold MUST seed from the checkpoint.
    */
  private def synthesize(name: String, manifestJson: Boolean): String = {
    val sp = spark
    import sp.implicits._
    val p = freshDir(name)
    DeltaLog.write(
      sp.range(10).toDF("id").repartition(1).sortWithinPartitions("id"),
      "overwrite", p)
    DeltaLog.write(
      sp.range(10, 15).toDF("id").repartition(1).sortWithinPartitions("id"),
      "append", p)
    val adds = DeltaLog.activeAddsAsOf(spark, p)
    assert(adds.size == 2)
    // file A carries ids 0..9 (the larger file), B ids 10..14
    val Seq(a, b) = adds.sortBy(-_.size)
    def addJson(rel: String, size: Long, dv: Option[String]) =
      s"""{"add":{"path":"$rel","partitionValues":{},"size":$size,""" +
        s""""modificationTime":0,"dataChange":true""" +
        dv.map(d => s""","deletionVector":$d""").getOrElse("") + "}}"
    val dvA = DeltaLog.inlineDvJson(Array(0L, 3L))
    val sidecarDir = Paths.get(p, "_delta_log", "_sidecars")
    val sc1 = "sc-1111.parquet"
    val sc2 = "sc-2222.parquet"
    jsonToParquet(Seq(
      addJson(a.rel, a.size, Some(dvA)),
      """{"remove":{"path":"long-gone.parquet","deletionTimestamp":0,"dataChange":false}}"""),
      sidecarDir.resolve(sc1).toString)
    jsonToParquet(Seq(addJson(b.rel, b.size, None)),
      sidecarDir.resolve(sc2).toString)
    def sidecarAction(n: String) = {
      val sz = Files.size(sidecarDir.resolve(n))
      s"""{"sidecar":{"path":"$n","sizeInBytes":$sz,"modificationTime":0}}"""
    }
    val manifestLines = Seq(
      """{"checkpointMetadata":{"version":1}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint","deletionVectors"],""" +
        """"writerFeatures":["v2Checkpoint","deletionVectors"]}}""",
      metaDataLine(p, 0L),
      sidecarAction(sc1), sidecarAction(sc2))
    val manifest = Paths.get(p, "_delta_log",
      "0" * 19 + "1.checkpoint.1f0e2d3c-aaaa-bbbb-cccc-000000000001." +
        (if (manifestJson) "json" else "parquet"))
    if (manifestJson)
      Files.writeString(manifest, manifestLines.mkString("", "\n", "\n"))
    else jsonToParquet(manifestLines, manifest.toString)
    Files.writeString(Paths.get(p, "_delta_log", "_last_checkpoint"),
      """{"version":1}""")
    // commit 0 deleted: replay can only seed from the checkpoint
    Files.delete(Paths.get(p, "_delta_log", "0" * 20 + ".json"))
    p
  }

  private def ids(p: String): Seq[Long] =
    DeltaLog.read(spark, p).collect().map(_.getLong(0)).toSeq.sorted

  test("parquet manifest + sidecars: adds, tombstones and DVs survive the fold") {
    val p = synthesize("parquet_manifest", manifestJson = false)
    // ids 0 and 3 DV-deleted via the SIDECAR add's descriptor; the
    // tombstone resurrects nothing; both sidecars' adds are present
    assert(ids(p) == ((1L to 9L).filterNot(_ == 3L) ++ (10L to 14L)))
    // post-checkpoint commits replay on top (and the writer-capability
    // gate accepts the v2Checkpoint writer feature)
    val sp = spark; import sp.implicits._
    DeltaLog.write(Seq(15L, 16L).toDF("id"), "append", p)
    assert(ids(p) == ((1L to 9L).filterNot(_ == 3L) ++ (10L to 16L)))
  }

  test("json manifest variant folds identically") {
    val p = synthesize("json_manifest", manifestJson = true)
    assert(ids(p) == ((1L to 9L).filterNot(_ == 3L) ++ (10L to 14L)))
  }

  test("our checkpoint of a v2 table writes manifest + sidecars; cleanup sweeps the old generation") {
    val sp = spark; import sp.implicits._
    val p = synthesize("recheckpoint", manifestJson = false)
    DeltaLog.write(Seq(15L).toDF("id"), "append", p) // version 2
    // rowsPerPart=1 forces one sidecar per active file — the layout's
    // scale path (file actions fan out, never one serializing task)
    DeltaLog.writeCheckpoint(spark, p, 2L, rowsPerPart = 1)
    val logDirP = Paths.get(p, "_delta_log")
    val v2Manifests = Files.list(logDirP).toArray
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .filter(_.matches("0{19}2\\.checkpoint\\.[^.]+\\.parquet"))
    assert(v2Manifests.length == 1,
      s"a v2 table checkpoints as a UUID manifest: ${v2Manifests.toSeq}")
    // no classic multi-part or single file of that version
    assert(!Files.exists(logDirP.resolve("0" * 19 + "2.checkpoint.parquet")))
    val sidecarsAfter = Files.list(logDirP.resolve("_sidecars")).count()
    assert(sidecarsAfter >= 3 + 2, // 3 fresh (1/file) + the 2 foreign
      s"one sidecar per active file: $sidecarsAfter")
    // fold away every commit: the NEW manifest+sidecars alone must
    // reproduce the snapshot, the synthesized generation's DVs included
    // grace = 0: the synthesized foreign sidecars are brand-new, and the
    // default grace window would (correctly) protect them as possibly
    // mid-checkpoint — this test exercises the orphan logic itself
    val swept = DeltaLog.cleanupLog(spark, p, sidecarGraceMs = 0L)
    assert(!Files.exists(logDirP.resolve("0" * 19 + "1.json")))
    // the superseded v1 manifest and its now-unreferenced foreign
    // sidecars are swept; the fresh generation survives
    assert(swept.exists(_.contains("1.checkpoint.")), s"swept: $swept")
    assert(swept.count(_.startsWith("_sidecars/")) == 2, s"swept: $swept")
    assert(Files.list(logDirP.resolve("_sidecars")).count() ==
      sidecarsAfter - 2)
    assert(ids(p) == ((1L to 9L).filterNot(_ == 3L) ++ (10L to 15L)))
    // and the table keeps evolving on top of its own v2 checkpoint
    DeltaLog.write(Seq(16L).toDF("id"), "append", p)
    assert(ids(p) == ((1L to 9L).filterNot(_ == 3L) ++ (10L to 16L)))
  }

  test("delta.checkpointPolicy=v2 creates a native v2-checkpointing table") {
    val sp = spark; import sp.implicits._
    val p = freshDir("policy")
    DeltaLog.write((0L until 6L).map(i => (i, s"v$i")).toDF("id", "s"),
      "overwrite", p,
      tableProperties = Map("delta.checkpointPolicy" -> "v2"),
      checkpointInterval = 0)
    val v0 = Files.readString(Paths.get(p, "_delta_log", "0" * 20 + ".json"))
    assert(v0.contains(""""minReaderVersion":3"""))
    assert(v0.contains(""""v2Checkpoint""""))
    DeltaLog.write(Seq((10L, "x")).toDF("id", "s"), "append", p,
      checkpointInterval = 0)
    DeltaLog.writeCheckpoint(spark, p, 1L)
    // the checkpoint is the v2 layout: UUID manifest + sidecars
    val names = Files.list(Paths.get(p, "_delta_log")).toArray
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
    assert(names.exists(_.matches("0{19}1\\.checkpoint\\.[^.]+\\.parquet")),
      s"v2 manifest expected: ${names.toSeq.sorted}")
    assert(!names.contains("0" * 19 + "1.checkpoint.parquet"))
    assert(Files.list(Paths.get(p, "_delta_log", "_sidecars")).count() >= 1)
    // cleanup + read round-trip from the v2 generation alone
    DeltaLog.cleanupLog(spark, p)
    assert(!Files.exists(Paths.get(p, "_delta_log", "0" * 20 + ".json")))
    assert(DeltaLog.read(spark, p).count() == 7L)
  }

  test("fresh unreferenced sidecars survive the default-grace sweep") {
    val sp = spark; import sp.implicits._
    val p = synthesize("sidecar_grace", manifestJson = false)
    DeltaLog.write(Seq(15L).toDF("id"), "append", p) // version 2
    DeltaLog.writeCheckpoint(spark, p, 2L)
    // simulate a concurrent writeCheckpoint mid-flight: a sidecar renamed
    // into _sidecars/ whose manifest has NOT landed yet — referenced by
    // nothing, but brand-new. The default grace must skip it (sweeping it
    // would strand the about-to-land manifest on missing files).
    val orphan = Paths.get(p, "_delta_log", "_sidecars",
      "00000000-0000-4000-8000-00000000fee1.parquet")
    Files.write(orphan, Array[Byte](1, 2, 3))
    val swept = DeltaLog.cleanupLog(spark, p)
    assert(!swept.exists(_.contains("fee1")), s"swept: $swept")
    assert(Files.exists(orphan))
    // aged past the grace window, the same orphan IS swept
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 7200000L))
    val swept2 = DeltaLog.cleanupLog(spark, p)
    assert(swept2.exists(_.contains("fee1")), s"swept: $swept2")
    assert(!Files.exists(orphan))
  }

  test("manifest referencing a missing sidecar refuses typed") {
    val p = synthesize("missing_sidecar", manifestJson = false)
    Files.delete(Paths.get(p, "_delta_log", "_sidecars", "sc-2222.parquet"))
    val e = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.read(spark, p).count()
    }
    assert(e.getMessage.contains("sidecar"))
  }

  test("the distributed fold route reads v2 checkpoints too") {
    val p = synthesize("dist_fold", manifestJson = false)
    // force the distributed snapshot fold (threshold 0): same rows
    val df = DeltaLog.activeAddsDfAsOf(spark, p)
    assert(df.isDefined)
    val rels = df.get.select("graft_path").collect()
      .map(_.getString(0)).toSet
    assert(rels == DeltaLog.activeAddsAsOf(spark, p).map(_.rel).toSet)
  }
}
