package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Version-preserving OVERWRITE (delta-spark `mode=overwrite` semantics,
  * reference terminal `write_to_delta_table` with overwrite — cf.
  * /root/reference/src/elusion.rs:6607): overwriting an EXISTING table
  * commits ONE version that removes every active file and adds the new
  * data. metaData.id, configuration and the whole commit history survive
  * — time travel to pre-overwrite versions, CDF across the boundary and
  * RESTORE all keep working; old files stay on disk until vacuum's
  * retention expires them. Only an overwrite of a NON-delta directory
  * wipes and creates version 0.
  */
class DeltaOverwriteHistorySpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/ovrhist/$name"
    val pp = Paths.get(p)
    if (Files.exists(pp))
      Files.walk(pp).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    p
  }

  private def commitLines(p: String, v: Long): Seq[String] =
    Files.readAllLines(
      Paths.get(p, "_delta_log", f"$v%020d.json")).toArray.toSeq
      .map(_.toString)

  private def metaIdOf(p: String, v: Long): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    commitLines(p, v).flatMap { l =>
      val n = mapper.readTree(l)
      if (n.has("metaData")) Some(n.get("metaData").get("id").asText)
      else None
    }.head
  }

  test("overwrite commits at the next version: removes + adds, id preserved") {
    val sp = spark; import sp.implicits._
    val p = freshDir("basic")
    DeltaLog.write((1L to 4L).map(i => (i, s"v$i")).toDF("id", "s"),
      "overwrite", p)
    DeltaLog.write(Seq((2L, "b2")).toDF("id", "s"), "append", p)
    DeltaLog.write(Seq((100L, "x")).toDF("id", "s"), "overwrite", p)
    // log did not restart: v0, v1 survive, overwrite landed at v2
    assert(Files.exists(Paths.get(p, "_delta_log", "0" * 20 + ".json")))
    assert(Files.exists(Paths.get(p, "_delta_log", "0" * 19 + "1.json")))
    assert(Files.exists(Paths.get(p, "_delta_log", "0" * 19 + "2.json")))
    // the overwrite commit removes EVERY pre-commit active file and
    // adds the replacement
    val lines = commitLines(p, 2L)
    val removes = lines.count(_.contains("\"remove\""))
    val adds = lines.count(_.contains("\"add\""))
    assert(removes >= 2, s"both prior commits' files removed: $removes")
    assert(adds >= 1)
    // metaData.id is the table's STABLE identity — preserved
    assert(metaIdOf(p, 0L) == metaIdOf(p, 2L))
    // snapshot = the new data only
    assert(DeltaLog.read(spark, p).collect().map(_.getLong(0)).toSeq ==
      Seq(100L))
    // time travel to both pre-overwrite versions
    assert(DeltaLog.read(spark, p, Some(0L)).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(DeltaLog.read(spark, p, Some(1L)).count() == 5L)
    // history shows the overwrite as one operation
    val hist = DeltaLog.history(spark, p)
    assert(hist.exists { case (v, op, _) => v == 2L && op == "OVERWRITE" })
    // and the table keeps evolving on top
    DeltaLog.write(Seq((101L, "y")).toDF("id", "s"), "append", p)
    assert(DeltaLog.read(spark, p).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(100L, 101L))
  }

  test("overwrite may change schema and partitioning; old versions keep theirs") {
    val sp = spark; import sp.implicits._
    val p = freshDir("schema")
    DeltaLog.write((1L to 6L).map(i => (i, i % 2)).toDF("id", "part"),
      "overwrite", p, partitionBy = Seq("part"))
    // overwrite: different columns, NO partitioning
    DeltaLog.write(Seq(("a", 1.5), ("b", 2.5)).toDF("name", "score"),
      "overwrite", p)
    val now = DeltaLog.read(spark, p)
    assert(now.columns.toSeq == Seq("name", "score"))
    assert(now.count() == 2L)
    // the declared partitioning is gone — an append without partitionBy
    // succeeds (it would refuse on a still-partitioned table)
    DeltaLog.write(Seq(("c", 3.5)).toDF("name", "score"), "append", p)
    assert(DeltaLog.read(spark, p).count() == 3L)
    // time travel reads the OLD schema and partition column
    val old = DeltaLog.read(spark, p, Some(0L))
    assert(old.columns.toSeq == Seq("id", "part"))
    assert(old.count() == 6L)
  }

  test("configuration is preserved; tableProperties on overwrite apply") {
    val sp = spark; import sp.implicits._
    val p = freshDir("conf")
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p,
      tableProperties = Map("custom.marker" -> "kept"))
    DeltaLog.write(Seq((2L, "b")).toDF("id", "s"), "overwrite", p,
      tableProperties = Map("other.prop" -> "new"))
    val lines = commitLines(p, 1L)
    val meta = lines.find(_.contains("\"metaData\"")).get
    assert(meta.contains(""""custom.marker":"kept""""))
    assert(meta.contains(""""other.prop":"new""""))
  }

  test("overwrite upgrading features emits a UNION protocol; covered needs emit none") {
    val sp = spark; import sp.implicits._
    val p = freshDir("proto")
    // plain table: legacy protocol (minWriter 2)
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p)
    // overwrite WITHOUT new features: no protocol action in the commit
    DeltaLog.write(Seq((2L, "b")).toDF("id", "s"), "overwrite", p)
    assert(!commitLines(p, 1L).exists(_.contains("\"protocol\"")),
      "covered overwrite must not re-emit the protocol")
    // overwrite enabling deletion vectors: v7 upgrade, UNION carries the
    // legacy-implied writer features too
    DeltaLog.write(Seq((3L, "c")).toDF("id", "s"), "overwrite", p,
      tableProperties = Map("delta.enableDeletionVectors" -> "true"))
    val proto = commitLines(p, 2L).find(_.contains("\"protocol\"")).get
    assert(proto.contains(""""minWriterVersion":7"""))
    assert(proto.contains(""""deletionVectors""""))
    assert(proto.contains(""""appendOnly"""") &&
      proto.contains(""""invariants""""),
      s"legacy-implied features must ride the upgrade: $proto")
    assert(proto.contains(""""minReaderVersion":3"""))
    // the DV feature WORKS on the upgraded table
    DeltaLog.deleteWhereViaDv(spark, p, "id = 3")
    assert(DeltaLog.read(spark, p).count() == 0L)
    // time travel across the upgrade still works
    assert(DeltaLog.read(spark, p, Some(0L)).collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("appendOnly still refuses overwrite") {
    val sp = spark; import sp.implicits._
    val p = freshDir("appendonly")
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p,
      tableProperties = Map("delta.appendOnly" -> "true"))
    val e = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.write(Seq((2L, "b")).toDF("id", "s"), "overwrite", p)
    }
    assert(e.getMessage.contains("appendOnly"))
  }

  test("restore to a pre-overwrite version brings the old rows back") {
    val sp = spark; import sp.implicits._
    val p = freshDir("restore")
    DeltaLog.write((1L to 3L).map(i => (i, s"v$i")).toDF("id", "s"),
      "overwrite", p)
    DeltaLog.write(Seq((9L, "z")).toDF("id", "s"), "overwrite", p)
    assert(DeltaLog.read(spark, p).count() == 1L)
    DeltaLog.restore(spark, p, 0L)
    assert(DeltaLog.read(spark, p).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("vacuum honors retention for overwrite tombstones") {
    val sp = spark; import sp.implicits._
    val p = freshDir("vacuum")
    DeltaLog.write((1L to 3L).map(i => (i, s"v$i")).toDF("id", "s"),
      "overwrite", p)
    DeltaLog.write(Seq((9L, "z")).toDF("id", "s"), "overwrite", p)
    // within retention: the removed files survive (a reader mid-query on
    // v0, or any time travel inside the window, must not race the sweep)
    val sweptEarly = DeltaLog.vacuum(spark, p)
    assert(sweptEarly.isEmpty, s"$sweptEarly")
    assert(DeltaLog.read(spark, p, Some(0L)).count() == 3L)
    // past retention: swept, and the CURRENT snapshot is intact
    val swept = DeltaLog.vacuum(spark, p, retentionMs = 0L)
    assert(swept.nonEmpty, "overwritten files must sweep past retention")
    assert(DeltaLog.read(spark, p).collect().map(_.getLong(0)).toSeq ==
      Seq(9L))
  }

  test("row-tracked table: overwrite continues the row-id high-water mark") {
    val sp = spark; import sp.implicits._
    val p = freshDir("rowtrack")
    DeltaLog.write((1L to 5L).map(i => (i, s"v$i")).toDF("id", "s"),
      "overwrite", p,
      tableProperties = Map("delta.enableRowTracking" -> "true"))
    val ids0 = DeltaLog.readWithRowIds(spark, p)
      .select("_row_id").collect().map(_.getLong(0)).toSet
    DeltaLog.write((10L to 12L).map(i => (i, s"w$i")).toDF("id", "s"),
      "overwrite", p)
    val ids1 = DeltaLog.readWithRowIds(spark, p)
      .select("_row_id").collect().map(_.getLong(0)).toSet
    // fresh rows mint PAST the old mark — ids are never reused
    assert(ids0.intersect(ids1).isEmpty,
      s"row ids must not recycle across overwrite: ${ids0.intersect(ids1)}")
    assert(ids1.min > ids0.max)
  }

  test("overwrite of a NON-delta directory still wipes and creates version 0") {
    val sp = spark; import sp.implicits._
    val p = freshDir("nondelta")
    Seq((1L, "old")).toDF("id", "s").write.parquet(p)
    DeltaLog.write(Seq((2L, "new")).toDF("id", "s"), "overwrite", p)
    assert(Files.exists(Paths.get(p, "_delta_log", "0" * 20 + ".json")))
    assert(!Files.exists(Paths.get(p, "_delta_log", "0" * 19 + "1.json")))
    assert(DeltaLog.read(spark, p).collect().map(_.getLong(0)).toSeq ==
      Seq(2L))
  }

  test("mapped table: time travel and CDF across the overwrite boundary " +
      "resolve the mapping AS-OF each version") {
    val sp = spark; import sp.implicits._
    val p = freshDir("mapped")
    // name-mapped table: physical column names are minted uuids
    DeltaLog.write((1L to 3L).map(i => (i, s"v$i")).toDF("id", "s"),
      "overwrite", p, columnMapping = Some("name"))
    DeltaLog.write(Seq((4L, "v4")).toDF("id", "s"), "append", p)
    // overwrite RE-MINTS the physical names (fresh id window) — the
    // pre-overwrite files exist only under the OLD physical names
    DeltaLog.write(Seq((9L, "z9"), (10L, "z10")).toDF("id", "s"),
      "overwrite", p)
    // snapshot = new data under the new mapping
    assert(DeltaLog.read(spark, p).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((9L, "z9"), (10L, "z10")))
    // time travel to BOTH pre-overwrite versions must resolve the OLD
    // mapping: under the new one every data column would be silently NULL
    val v0 = DeltaLog.read(spark, p, Some(0L)).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(v0 == Seq((1L, "v1"), (2L, "v2"), (3L, "v3")),
      s"pre-overwrite time travel must read the old physical names: $v0")
    val v1 = DeltaLog.read(spark, p, Some(1L)).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(v1.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(v1.forall(_._2 != null), s"no nulled column values: $v1")
    // CDF across the boundary: the overwrite's DELETE leg reads the old
    // files under the PRE-commit mapping, its insert leg under the new
    val feed = DeltaLog.readChanges(spark, p, 0L, 2L).collect()
    val dels = feed.filter(_.getAs[String]("_change_type") == "delete")
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("s"))).sorted.toSeq
    assert(dels == Seq((1L, "v1"), (2L, "v2"), (3L, "v3"), (4L, "v4")),
      s"delete leg must carry the pre-overwrite values: $dels")
    val ins = feed.filter(r =>
        r.getAs[String]("_change_type") == "insert" &&
          r.getAs[Long]("_commit_version") == 2L)
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("s"))).sorted.toSeq
    assert(ins == Seq((9L, "z9"), (10L, "z10")))
  }

  test("unmapped schema-changing overwrite: CDF delete leg reads the " +
      "pre-commit schema, not the new one") {
    val sp = spark; import sp.implicits._
    val p = freshDir("cdfschema")
    DeltaLog.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      "overwrite", p)
    // overwrite with RENAMED/different columns
    DeltaLog.write(Seq(("x", 1.5)).toDF("name", "score"), "overwrite", p)
    val feed = DeltaLog.readChanges(spark, p, 0L, 1L).collect()
    val dels = feed.filter(_.getAs[String]("_change_type") == "delete")
    // old rows come back with their OWN columns populated (the new
    // schema's columns are null-filled by the union, never the reverse)
    assert(dels.map(r => (r.getAs[Long]("id"), r.getAs[String]("s")))
      .sorted.toSeq == Seq((1L, "a"), (2L, "b")),
      "delete-leg rows must carry pre-overwrite values")
    val ins = feed.filter(_.getAs[String]("_change_type") == "insert")
    assert(ins.map(r => (r.getAs[String]("name"), r.getAs[Double]("score")))
      .toSeq == Seq(("x", 1.5)))
  }

  test("checkpointed overwrite folds correctly: snapshot excludes removed files") {
    val sp = spark; import sp.implicits._
    val p = freshDir("cp")
    DeltaLog.write((1L to 4L).map(i => (i, s"v$i")).toDF("id", "s"),
      "overwrite", p)
    DeltaLog.write(Seq((9L, "z")).toDF("id", "s"), "overwrite", p)
    DeltaLog.writeCheckpoint(spark, p, 1L)
    DeltaLog.cleanupLog(spark, p)
    // replay seeds from the checkpoint alone: only the overwrite's adds
    assert(DeltaLog.read(spark, p).collect().map(_.getLong(0)).toSeq ==
      Seq(9L))
    DeltaLog.write(Seq((10L, "y")).toDF("id", "s"), "append", p)
    assert(DeltaLog.read(spark, p).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(9L, 10L))
  }
}
