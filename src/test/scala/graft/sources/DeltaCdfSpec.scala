package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Change-data-feed WRITE support: deleteWhere/upsert on a table with
  * `delta.enableChangeDataFeed=true` stage the exact row-level changes
  * under `_change_data/` and commit them as `cdc` actions — the protocol
  * shape delta-spark emits — and [[DeltaLog.readChanges]] serves commits
  * FROM their cdc actions (never double-counting rewritten-but-unchanged
  * rows), falling back to file-granularity add/remove for commits
  * without them. Vacuum sweeps cdc files only once their commit is gone
  * from the log AND they age past retention.
  */
class DeltaCdfSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/cdf/$name"
    val pp = Paths.get(p)
    if (Files.exists(pp))
      Files.walk(pp).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    p
  }

  private def changes(p: String, from: Long, to: Long): Map[(String, Long), Seq[(Long, String)]] =
    DeltaLog.readChanges(spark, p, from, to)
      .select("_change_type", "_commit_version", "id", "s")
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .map { case (k, rows) =>
        k -> rows.map(r => (r.getLong(2), r.getString(3))).toSeq.sorted }

  test("deleteWhere on a CDF table emits exact cdc deletes") {
    val sp = spark; import sp.implicits._
    val p = freshDir("del")
    DeltaLog.write((1L to 6L).map(i => (i, s"v$i")).toDF("id", "s"),
      "overwrite", p,
      tableProperties = Map("delta.enableChangeDataFeed" -> "true"))
    // the creating protocol declares the v4 writer floor
    val v0 = Files.readString(
      Paths.get(p, "_delta_log", "0" * 20 + ".json"))
    assert(v0.contains(""""minWriterVersion":4"""))
    assert(DeltaLog.deleteWhere(spark, p, "id % 2 = 0") >= 1)
    // the delete commit carries cdc actions and the _change_data file
    val v1 = Files.readString(
      Paths.get(p, "_delta_log", "0" * 19 + "1.json"))
    assert(v1.contains(""""cdc":{"""), "delete commit must carry cdc actions")
    assert(Files.list(Paths.get(p, "_change_data")).count() >= 1)
    // the feed serves EXACTLY the deleted rows — not the full rewritten
    // file as delete+insert (the file-granularity fallback would)
    val ch = changes(p, 0L, 1L)
    assert(ch.keySet == Set(("delete", 1L)))
    assert(ch(("delete", 1L)) == Seq((2L, "v2"), (4L, "v4"), (6L, "v6")))
    // the table itself reads correctly
    assert(DeltaLog.read(spark, p).count() == 3L)
  }

  test("upsert on a CDF table emits update pre/post images and inserts") {
    val sp = spark; import sp.implicits._
    val p = freshDir("ups")
    DeltaLog.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"),
      "overwrite", p,
      tableProperties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaLog.upsert(Seq((2L, "B"), (9L, "Z")).toDF("id", "s"), Seq("id"), p)
    val ch = changes(p, 0L, 1L)
    assert(ch(("update_preimage", 1L)) == Seq((2L, "b")))
    assert(ch(("update_postimage", 1L)) == Seq((2L, "B")))
    assert(ch(("insert", 1L)) == Seq((9L, "Z")))
    assert(ch.size == 3, s"no spurious change rows: ${ch.keySet}")
    // appends still serve from add actions (no cdc needed)
    DeltaLog.write(Seq((10L, "t")).toDF("id", "s"), "append", p)
    val ch2 = changes(p, 1L, 2L)
    assert(ch2(("insert", 2L)) == Seq((10L, "t")))
  }

  test("pure-insert upsert (no touched files) emits cdc inserts only") {
    val sp = spark; import sp.implicits._
    val p = freshDir("pureins")
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p,
      tableProperties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaLog.upsert(Seq((7L, "x"), (8L, "y")).toDF("id", "s"), Seq("id"), p)
    val ch = changes(p, 0L, 1L)
    assert(ch.keySet == Set(("insert", 1L)))
    assert(ch(("insert", 1L)) == Seq((7L, "x"), (8L, "y")))
  }

  test("foreign cdc actions supersede add/remove (no double count)") {
    val sp = spark; import sp.implicits._
    val p = freshDir("foreign")
    // v0: our writer, plain table
    DeltaLog.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      "overwrite", p)
    // v1: handcrafted foreign-style rewrite commit — remove+add pair
    // PLUS a cdc action describing the single real change
    Seq((1L, "a2")).toDF("id", "s").coalesce(1)
      .write.mode("overwrite").parquet(s"$p/_stage_new")
    val newData = {
      var f: String = null
      Files.list(Paths.get(p, "_stage_new")).forEach { x =>
        val n = x.getFileName.toString
        if (n.startsWith("part-") && n.endsWith(".parquet")) f = n
      }
      Files.move(Paths.get(p, "_stage_new", f), Paths.get(p, s"rw-$f"))
      s"rw-$f"
    }
    Seq((1L, "a", "update_preimage"), (1L, "a2", "update_postimage"))
      .toDF("id", "s", "_change_type").coalesce(1)
      .write.mode("overwrite").parquet(s"$p/_stage_cdc")
    Files.createDirectories(Paths.get(p, "_change_data"))
    val cdcFile = {
      var f: String = null
      Files.list(Paths.get(p, "_stage_cdc")).forEach { x =>
        val n = x.getFileName.toString
        if (n.startsWith("part-") && n.endsWith(".parquet")) f = n
      }
      Files.move(Paths.get(p, "_stage_cdc", f),
        Paths.get(p, "_change_data", s"cdc-$f"))
      s"_change_data/cdc-$f"
    }
    val oldRel = {
      var f: String = null
      Files.list(Paths.get(p)).forEach { x =>
        val n = x.getFileName.toString
        if (n.startsWith("part-") && n.endsWith(".parquet")) f = n
      }
      f
    }
    val sz = Files.size(Paths.get(p, newData))
    val cdcSz = Files.size(Paths.get(p, cdcFile))
    Files.writeString(Paths.get(p, "_delta_log", "0" * 19 + "1.json"),
      Seq(
        s"""{"commitInfo":{"operation":"MERGE"}}""",
        s"""{"cdc":{"path":"$cdcFile","partitionValues":{},"size":$cdcSz,"dataChange":false}}""",
        s"""{"remove":{"path":"$oldRel","deletionTimestamp":1,"dataChange":true}}""",
        s"""{"add":{"path":"$newData","partitionValues":{},"size":$sz,"modificationTime":1,"dataChange":true}}"""
      ).mkString("", "\n", "\n"))
    val ch = changes(p, 0L, 1L)
    // file granularity would report (1,a),(2,b) deleted + (1,a2) added;
    // the cdc action says the real change is one update pair
    assert(ch.keySet == Set(("update_preimage", 1L), ("update_postimage", 1L)))
    assert(ch(("update_preimage", 1L)) == Seq((1L, "a")))
    assert(ch(("update_postimage", 1L)) == Seq((1L, "a2")))
  }

  test("DV-native delete on a CDF table serves row-level deletes from descriptors") {
    val sp = spark; import sp.implicits._
    val p = freshDir("dvcdf")
    DeltaLog.write((1L to 6L).map(i => (i, s"v$i")).toDF("id", "s"),
      "overwrite", p,
      tableProperties = Map(
        "delta.enableChangeDataFeed" -> "true",
        "delta.enableDeletionVectors" -> "true"))
    // no cdc files needed: the descriptor swap is self-describing and
    // the feed's bitmap difference yields the exact deleted rows
    assert(DeltaLog.deleteWhereViaDv(spark, p, "id % 3 = 0") > 0)
    val ch = changes(p, 0L, 1L)
    assert(ch.keySet == Set(("delete", 1L)))
    assert(ch(("delete", 1L)) == Seq((3L, "v3"), (6L, "v6")))
    assert(DeltaLog.read(spark, p).count() == 4L)
  }

  test("cdc emission stays exact on the forced-distributed fold route") {
    val sp = spark; import sp.implicits._
    val p = freshDir("dist")
    DeltaLog.write((1L to 8L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(4), "overwrite", p,
      tableProperties = Map("delta.enableChangeDataFeed" -> "true"))
    // snapshotDriverMaxBytes = 0 forces the executor-side snapshot fold
    // (the 100 TB route); the cdc rows must be byte-identical to the
    // small-log driver path's
    assert(DeltaLog.deleteWhere(spark, p, "id >= 7",
      snapshotDriverMaxBytes = 0L) >= 1)
    val ch = changes(p, 0L, 1L)
    assert(ch.keySet == Set(("delete", 1L)))
    assert(ch(("delete", 1L)) == Seq((7L, "v7"), (8L, "v8")))
    DeltaLog.upsert(Seq((1L, "V1"), (99L, "new")).toDF("id", "s"),
      Seq("id"), p, snapshotDriverMaxBytes = 0L)
    val ch2 = changes(p, 1L, 2L)
    assert(ch2(("update_preimage", 2L)) == Seq((1L, "v1")))
    assert(ch2(("update_postimage", 2L)) == Seq((1L, "V1")))
    assert(ch2(("insert", 2L)) == Seq((99L, "new")))
  }

  test("foreign partitioned cdc layout recovers partition values via basePath") {
    val sp = spark; import sp.implicits._
    val p = freshDir("partcdc")
    DeltaLog.write(Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("id", "s", "part"),
      "overwrite", p)
    // delta-spark lays a partitioned table's cdc under
    // _change_data/<pcol>=<val>/...; the files carry NO partition column
    Seq((2L, "b", "delete")).toDF("id", "s", "_change_type").coalesce(1)
      .write.mode("overwrite").parquet(s"$p/_stage_cdc")
    val cdcFile = {
      var f: String = null
      Files.list(Paths.get(p, "_stage_cdc")).forEach { x =>
        val n = x.getFileName.toString
        if (n.startsWith("part-") && n.endsWith(".parquet")) f = n
      }
      Files.createDirectories(Paths.get(p, "_change_data", "part=2"))
      Files.move(Paths.get(p, "_stage_cdc", f),
        Paths.get(p, "_change_data", "part=2", s"cdc-$f"))
      s"_change_data/part=2/cdc-$f"
    }
    val sz = Files.size(Paths.get(p, cdcFile))
    Files.writeString(Paths.get(p, "_delta_log", "0" * 19 + "1.json"),
      s"""{"commitInfo":{"operation":"DELETE"}}\n""" +
        s"""{"cdc":{"path":"$cdcFile","partitionValues":{"part":"2"},"size":$sz,"dataChange":false}}\n""")
    val rows = DeltaLog.readChanges(spark, p, 0L, 1L)
      .select("_change_type", "id", "part").collect()
      .map(r => (r.getString(0), r.getLong(1), r.get(2).toString)).toSeq
    assert(rows == Seq(("delete", 2L, "2")),
      s"partition value recovered from the directory layout: $rows")
  }

  test("partitioned CDF table: cdc files stage partitioned, actions carry partitionValues") {
    val sp = spark; import sp.implicits._
    val p = freshDir("partwrite")
    DeltaLog.write(
      Seq((1L, "a", 1L), (2L, "b", 2L), (3L, "c", 1L), (4L, "d", 2L))
        .toDF("id", "s", "part"),
      "overwrite", p, partitionBy = Seq("part"),
      tableProperties = Map("delta.enableChangeDataFeed" -> "true"))
    assert(DeltaLog.deleteWhere(spark, p, "id IN (2, 3)") >= 1)
    // the cdc ACTIONS carry the partition values (the AddCDCFile
    // contract — delta-spark's CDF reader resolves partition columns
    // from the action/dir layout; {} would read back NULLs there)
    val v1 = Files.readString(Paths.get(p, "_delta_log", "0" * 19 + "1.json"))
    val cdcLines = v1.linesIterator.filter(_.contains(""""cdc":{""")).toSeq
    assert(cdcLines.nonEmpty, "delete commit must carry cdc actions")
    assert(cdcLines.forall(l => l.contains(""""partitionValues":{"part":""")),
      s"cdc actions must carry partitionValues: $cdcLines")
    // and the FILES are laid out under _change_data/part=<val>/
    assert(cdcLines.forall(_.contains("_change_data/part=")),
      s"cdc files must stage under partition dirs: $cdcLines")
    // the feed returns the partition column values, never NULL
    val del = DeltaLog.readChanges(spark, p, 0L, 1L)
      .select("_change_type", "id", "part").collect()
      .map(r => (r.getString(0), r.getLong(1), r.get(2).toString))
      .toSeq.sortBy(_._2)
    assert(del == Seq(("delete", 2L, "2"), ("delete", 3L, "1")), s"$del")
    // upsert on the partitioned CDF table: pre/post images carry the
    // partition value too
    DeltaLog.upsert(Seq((4L, "D", 2L)).toDF("id", "s", "part"),
      Seq("id"), p)
    val ups = DeltaLog.readChanges(spark, p, 1L, 2L)
      .select("_change_type", "id", "part").collect()
      .map(r => (r.getString(0), r.getLong(1), r.get(2).toString)).toSet
    assert(ups == Set(("update_preimage", 4L, "2"),
      ("update_postimage", 4L, "2")), s"$ups")
  }

  test("overwrite of a CDF table preserves history; the feed serves across the boundary") {
    val sp = spark; import sp.implicits._
    val p = freshDir("ovr")
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p,
      tableProperties = Map("delta.enableChangeDataFeed" -> "true"))
    // version-preserving overwrite: no opt-in needed — the commit's
    // whole-file removes/adds serve the feed exactly (delta-spark's
    // overwrite emits no cdc files either)
    DeltaLog.write(Seq((2L, "b")).toDF("id", "s"), "overwrite", p)
    assert(DeltaLog.read(spark, p).collect().map(_.getLong(0)).toSeq == Seq(2L))
    // the log did NOT restart: version 1 exists, version 0 survives
    assert(Files.exists(Paths.get(p, "_delta_log", "0" * 20 + ".json")))
    assert(Files.exists(Paths.get(p, "_delta_log", "0" * 19 + "1.json")))
    // CDF across the overwrite: old row deleted, new row inserted, at v1
    val w = DeltaLog.readChanges(spark, p, 0L, 1L)
      .select("_change_type", "id", "_commit_version").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(w == Set(("delete", 1L, 1L), ("insert", 2L, 1L)), s"$w")
    // time travel to the pre-overwrite version still reads the old rows
    assert(DeltaLog.read(spark, p, Some(0L)).collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("column-mapped CDF tables: cdc files stage under PHYSICAL names, feed reads logical") {
    val sp = spark; import sp.implicits._
    for (mode <- Seq("name", "id")) {
      val p = freshDir(s"mapped_$mode")
      DeltaLog.write((1L to 6L).map(i => (i, s"v$i")).toDF("id", "s"),
        "overwrite", p, columnMapping = Some(mode),
        tableProperties = Map("delta.enableChangeDataFeed" -> "true"))
      DeltaLog.deleteWhere(spark, p, "id <= 2")                  // v1 cdc
      DeltaLog.upsert(Seq((3L, "up")).toDF("id", "s"), Seq("id"), p) // v2 cdc
      // the cdc parquet files carry PHYSICAL column names, like data
      // files (delta-spark's CDF reader resolves them through the
      // mapping annotations)
      val cdcFiles = Files.walk(Paths.get(p, "_change_data")).toArray
        .map(_.asInstanceOf[java.nio.file.Path].toString)
        .filter(_.endsWith(".parquet"))
      assert(cdcFiles.nonEmpty)
      val cdcCols = spark.read.parquet(cdcFiles: _*).columns.toSet
      assert(!cdcCols.contains("id") && !cdcCols.contains("s"),
        s"cdc files must carry physical names: $cdcCols")
      assert(cdcCols.contains("_change_type"))
      // the FEED surfaces logical names and the exact row-level changes
      val ch = DeltaLog.readChanges(spark, p, 0L, 2L)
        .select("_change_type", "id", "s", "_commit_version").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.getLong(3))).toSet
      assert(ch == Set(
        ("delete", 1L, "v1", 1L), ("delete", 2L, "v2", 1L),
        ("update_preimage", 3L, "v3", 2L),
        ("update_postimage", 3L, "up", 2L)), s"$mode: $ch")
    }
  }

  test("readChangesByTimestamp resolves windows by monotonized mtime; out-of-range refuses") {
    val sp = spark; import sp.implicits._
    val p = freshDir("byts")
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p,
      tableProperties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaLog.write(Seq((2L, "b")).toDF("id", "s"), "append", p)
    DeltaLog.deleteWhere(spark, p, "id = 1")
    val base = 1700000000000L
    (0L to 2L).foreach { v =>
      Files.setLastModifiedTime(
        Paths.get(p, "_delta_log", f"$v%020d.json"),
        java.nio.file.attribute.FileTime.fromMillis(base + v * 60000L))
    }
    // window [t(v1), t(v2)]: the append's insert and the delete
    val w = DeltaLog.readChangesByTimestamp(spark, p,
      base + 60000L, Some(base + 120000L))
      .select("_change_type", "id", "_commit_version").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(w == Set(("insert", 2L, 1L), ("delete", 1L, 2L)), s"$w")
    // open-ended start mid-log: everything from v2 on
    val tail = DeltaLog.readChangesByTimestamp(spark, p, base + 120000L)
      .select("_change_type").collect().map(_.getString(0)).toSeq
    assert(tail == Seq("delete"))
    // start past the newest commit: typed refusal, not a silent empty
    val late = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.readChangesByTimestamp(spark, p, base + 999999L)
    }
    assert(late.getMessage.contains("at or after"))
    // a window between two commits that contains neither: typed refusal
    val gap = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.readChangesByTimestamp(spark, p,
        base + 61000L, Some(base + 119000L))
    }
    assert(gap.getMessage.contains("falls inside"))
    // end before start: typed refusal
    intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.readChangesByTimestamp(spark, p, base + 120000L, Some(base))
    }
    // a start resolving to version 0 serves the INITIAL commit's adds as
    // inserts (delta-spark's startingTimestamp CDF does too) — the old
    // max(startV-1, 0) floor silently dropped them
    val fromCreation = DeltaLog.readChangesByTimestamp(spark, p, base)
      .select("_change_type", "id", "_commit_version").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromCreation == Set(("insert", 1L, 0L), ("insert", 2L, 1L),
      ("delete", 1L, 2L)), s"$fromCreation")
    // a window pinned to version 0 ONLY still refuses typed
    val only0 = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.readChangesByTimestamp(spark, p, base, Some(base + 1000L))
    }
    assert(only0.getMessage.contains("version 0"))
  }

  test("vacuum keeps referenced cdc files, sweeps aged unreferenced ones") {
    val sp = spark; import sp.implicits._
    val p = freshDir("vac")
    DeltaLog.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      "overwrite", p,
      tableProperties = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaLog.deleteWhere(spark, p, "id = 2")
    val cdcDir = Paths.get(p, "_change_data")
    val nCdc = Files.list(cdcDir).count()
    assert(nCdc >= 1, "delete must stage change-data files")
    // referenced by a live commit: survives even at zero retention
    DeltaLog.vacuum(spark, p, stageRetentionMs = 0L, retentionMs = 1L)
    assert(Files.list(cdcDir).count() == nCdc)
    // an unreferenced stray (no commit names it) aged past retention
    // is swept; a YOUNG stray survives the window
    Files.writeString(cdcDir.resolve("cdc-stray.parquet"), "x")
    DeltaLog.vacuum(spark, p, stageRetentionMs = 0L,
      retentionMs = 60L * 60 * 1000)
    assert(Files.exists(cdcDir.resolve("cdc-stray.parquet")),
      "young stray survives the retention window")
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 8L * 24 * 3600 * 1000)
    Files.setLastModifiedTime(cdcDir.resolve("cdc-stray.parquet"), old)
    val swept = DeltaLog.vacuum(spark, p, stageRetentionMs = 0L,
      retentionMs = 60L * 60 * 1000)
    assert(!Files.exists(cdcDir.resolve("cdc-stray.parquet")))
    assert(swept.contains("_change_data/cdc-stray.parquet"))
  }
}
