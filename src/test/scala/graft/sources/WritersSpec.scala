package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class WritersSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val dir = Paths.get("target/tmp/writers")
    Files.createDirectories(dir)
    dir.resolve(name).toString
  }

  /** `tmp` wiped first — for delta tests whose assertions count versions
    * or files: overwrite is VERSION-PRESERVING now, so a leftover table
    * from a previous run keeps its history instead of restarting at v0.
    */
  private def fresh(name: String): String = {
    val p = tmp(name)
    val pp = Paths.get(p)
    if (Files.exists(pp))
      Files.walk(pp).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    p
  }

  private lazy val df = {
    val sp = spark; import sp.implicits._
    Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
  }

  test("single-file csv roundtrip: ONE file at the exact path") {
    val p = tmp("out.csv")
    Writers.writeCsvSingle(df, "overwrite", p)
    assert(Files.isRegularFile(Paths.get(p)))
    val back = CsvSmartCaster.load(spark, p)
    assert(back.count() == 2)
    assert(back.schema("id").dataType.typeName == "long")
  }

  test("csv append rewrites with union of old and new rows") {
    val sp = spark; import sp.implicits._
    val p = tmp("app.csv")
    Writers.writeCsvSingle(df, "overwrite", p)
    Writers.writeCsvSingle(Seq((3L, "c", 3.5)).toDF("id", "name", "v"), "append", p)
    val back = spark.read.option("header", "true").csv(p)
    assert(back.count() == 3)
  }

  test("csv append refuses mismatched columns") {
    val sp = spark; import sp.implicits._
    val p = tmp("bad.csv")
    Writers.writeCsvSingle(df, "overwrite", p)
    val e = intercept[graft.GraftError.WriteError] {
      Writers.writeCsvSingle(Seq((1L, "x")).toDF("id", "other"), "append", p)
    }
    assert(e.getMessage.contains("column mismatch"))
  }

  test("single-file parquet roundtrip and append") {
    val p = tmp("out.parquet")
    Writers.writeParquetSingle(df, "overwrite", p)
    assert(spark.read.parquet(p).count() == 2)
    Writers.writeParquetSingle(df, "append", p)
    assert(spark.read.parquet(p).count() == 4)
  }

  test("json single file roundtrip") {
    val p = tmp("out.json")
    Writers.writeJsonSingle(df, p)
    assert(Loaders.loadJson(spark, p, "rt").df.count() == 2)
    // external contract: a JSON ARRAY file, not JSON-lines
    val text = Files.readString(Paths.get(p)).trim
    assert(text.startsWith("[") && text.endsWith("]"))
  }

  test("json pretty writer indents one object per line") {
    val p = tmp("pretty.json")
    Writers.writeJsonSingle(df, p, pretty = true)
    val lines = Files.readAllLines(Paths.get(p))
    assert(lines.get(0) == "[")
    assert(lines.get(1).startsWith("  {"))
    assert(Loaders.loadJson(spark, p, "rt2").df.count() == 2)
  }

  test("nano-ts normalization keys on the parquet footer annotation, not names") {
    val sp = spark; import sp.implicits._
    // positive: the fixture's ts column IS annotated TIMESTAMP(NANOS) in
    // the footer → arrives as long (nanosAsLong) and converts to micros
    val ev = Loaders.loadParquet(spark, "/root/testdata/sf0.001/events.parquet", "ev").df
    assert(ev.schema("ts").dataType.typeName == "timestamp")
    // negative: a ts-NAMED plain long column (no annotation) must stay
    // long — the round-2 name heuristic silently corrupted these
    val p = tmp("named_ts")
    Seq((1L, 123456789L)).toDF("id", "event_ts").write.mode("overwrite").parquet(p)
    val back = Loaders.loadParquet(spark, p, "nts").df
    assert(back.schema("event_ts").dataType.typeName == "long")
    assert(back.first().getAs[Long]("event_ts") == 123456789L)
  }

  test("NTZ parquet columns normalize to TIMESTAMP with micros preserved (dotted names too)") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.TimestampNTZType
    val sp = spark; import sp.implicits._
    val p = tmp("ntz")
    // a dotted top-level name is valid parquet and must not parse as a
    // struct access in the normalizer (ADVICE r9: backtick escaping)
    Seq("2024-03-10 12:34:56.123456").toDF("s")
      .select(col("s").cast(TimestampNTZType).as("event.time"))
      .write.mode("overwrite").parquet(p)
    val back = Loaders.loadParquet(spark, p, "ntz").df
    assert(back.schema("event.time").dataType.typeName == "timestamp")
    val micros = back.select(unix_micros(col("`event.time`"))).first().getLong(0)
    val want = java.time.LocalDateTime.of(2024, 3, 10, 12, 34, 56, 123456000)
      .toInstant(java.time.ZoneOffset.UTC)
    assert(micros == want.getEpochSecond * 1000000L + 123456L)
  }

  test("NTZ normalization lands on the as-if-UTC instant under a non-UTC session") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    import org.apache.spark.sql.types.TimestampNTZType
    val sp = spark; import sp.implicits._
    val p = tmp("ntz_tz")
    Seq("2024-03-10 12:34:56").toDF("s")
      .select(col("s").cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(p)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val back = Loaders.loadParquet(spark, p, "ntz_tz").df
      assert(back.schema("ts").dataType.typeName == "timestamp")
      val micros = back.select(unix_micros(col("ts"))).first().getLong(0)
      val want = java.time.LocalDateTime.of(2024, 3, 10, 12, 34, 56)
        .toInstant(java.time.ZoneOffset.UTC)
      assert(micros == want.getEpochSecond * 1000000L)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("NTZ normalization applies on the delta-less loadDelta fallback and append re-read") {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types.TimestampNTZType
    val sp = spark; import sp.implicits._
    val p = tmp("ntz_paths")
    Seq("2024-01-01 00:00:00").toDF("s")
      .select(col("s").cast(TimestampNTZType).as("ts"), lit(1L).as("id"))
      .write.mode("overwrite").parquet(p)
    assert(Loaders.loadDelta(spark, p, "d").df.schema("ts").dataType.typeName
      == "timestamp")
    // append a normalized frame onto the raw-NTZ file: the re-read must
    // normalize too or the unionByName throws on TS vs NTZ
    val single = tmp("ntz_single.parquet")
    Writers.writeParquetSingle(
      Loaders.loadParquet(spark, p, "a").df, "overwrite", single)
    Writers.writeParquetSingle(
      Loaders.loadParquet(spark, p, "b").df, "append", single)
    val back = Loaders.loadParquet(spark, single, "rt").df
    assert(back.count() == 2 && back.schema("ts").dataType.typeName == "timestamp")
  }

  test("folder loader accepts an explicit file: URI (scheme preserved per file)") {
    val sp = spark; import sp.implicits._
    val dir = tmp("folder_uri")
    Writers.writeCsvSingle(Seq((1L, "a")).toDF("id", "v"), "overwrite", s"$dir/one.csv")
    Writers.writeCsvSingle(Seq((2L, "b")).toDF("id", "v"), "overwrite", s"$dir/two.csv")
    val uri = "file:" + Paths.get(dir).toAbsolutePath
    assert(Loaders.loadFolder(spark, uri, "furi").df.count() == 2)
  }

  test("json loader array-sniff works through an explicit file: URI") {
    val p = tmp("uri.json")
    Writers.writeJsonSingle(df, p)
    val uri = "file:" + Paths.get(p).toAbsolutePath
    assert(Loaders.loadJson(spark, uri, "juri").df.count() == 2)
  }

  test("folder loader unions every dispatchable format (csv + xlsx + xml)") {
    val sp = spark; import sp.implicits._
    val dir = tmp("folder_mixed")
    // string columns everywhere so the per-loader smart-cast votes agree
    Writers.writeCsvSingle(Seq(("ada", "paris")).toDF("name", "city"),
      "overwrite", s"$dir/a.csv")
    ExcelLoader.write(Seq(("kay", "lyon")).toDF("name", "city"), s"$dir/b.xlsx")
    Files.writeString(Paths.get(s"$dir/c.xml"),
      "<root><row><name>iva</name><city>nice</city></row>" +
        "<row><name>udo</name><city>bonn</city></row></root>")
    Writers.writeOrcSingle(Seq(("eve", "oslo")).toDF("name", "city"),
      "overwrite", s"$dir/d.orc")
    val out = Loaders.loadFolder(spark, dir, "mixed").df
    assert(out.count() == 5)
    assert(out.select("name").collect().map(_.getString(0)).toSet ==
      Set("ada", "kay", "iva", "udo", "eve"))
  }

  test("folder loader with filename column prepends source file name") {
    val sp = spark; import sp.implicits._
    val dir = tmp("folder_fn")
    Writers.writeCsvSingle(Seq((1L, "a")).toDF("id", "v"), "overwrite", s"$dir/one.csv")
    Writers.writeCsvSingle(Seq((2L, "b")).toDF("id", "v"), "overwrite", s"$dir/two.csv")
    val f = Loaders.loadFolderWithFilenameColumn(spark, dir, "fns")
    assert(f.df.columns.head == "filename_added")
    val names = f.df.collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("filename_added")).toMap
    assert(names == Map(1L -> "one.csv", 2L -> "two.csv"))
  }

  test("bucketed tables join with zero exchanges (co-located join)") {
    val sp = spark; import sp.implicits._
    val facts = (1 to 1000).map(i => (i.toLong % 50, i.toDouble)).toDF("k", "v")
    val dims = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    for (t <- Seq("bkt_facts", "bkt_dims")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(loc)) {
        java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    Writers.writeBucketedTable(facts, "bkt_facts", Seq("k"), 8, sortCols = Seq("k"))
    Writers.writeBucketedTable(dims, "bkt_dims", Seq("k"), 8, sortCols = Seq("k"))
    // force the sort-merge path: broadcast would (correctly) win on this
    // tiny dim, but the point is the bucket-aligned no-shuffle join
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_facts").join(spark.table("bkt_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free join, got:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE bkt_facts")
      spark.sql("DROP TABLE bkt_dims")
    }
  }

  test("delta writer produces a real _delta_log and load() dispatches on it") {
    val sp = spark; import sp.implicits._
    val p = tmp("delta_tbl")
    Writers.writeDeltaTable(df, "overwrite", p, partitionBy = Seq("name"))
    assert(Files.isDirectory(Paths.get(p, "name=a")))
    val v0 = Paths.get(p, "_delta_log", "0" * 20 + ".json")
    assert(Files.isRegularFile(v0), "version-0 commit must exist")
    val lines0 = Files.readAllLines(v0)
    assert(lines0.get(0).contains("\"commitInfo\""))
    assert(lines0.get(1).contains("\"protocol\""))
    assert(lines0.get(2).contains("\"schemaString\""))
    assert(lines0.get(2).contains("\"partitionColumns\":[\"name\"]"))
    // append commits version 1 with add actions for the NEW files only
    Writers.writeDeltaTable(Seq((3L, "c", 3.5)).toDF("id", "name", "v"), "append", p,
      partitionBy = Seq("name"))
    val v1 = Paths.get(p, "_delta_log", "0" * 19 + "1.json")
    assert(Files.isRegularFile(v1), "append must commit the next version")
    assert(!Files.readString(v1).contains("\"protocol\""))
    // extension dispatch hits the _delta_log branch; snapshot = 3 rows
    val back = Loaders.load(spark, p, "dback").df
    assert(back.count() == 3)
    assert(back.columns.contains("name")) // partition col re-inferred
    assert(back.where(org.apache.spark.sql.functions.col("name") === "c").count() == 1)
  }

  test("delta time travel reads earlier snapshots; vacuum drops orphans") {
    val sp = spark; import sp.implicits._
    val p = fresh("delta_tt")
    Writers.writeDeltaTable(df, "overwrite", p) // v0: 2 rows
    Writers.writeDeltaTable(Seq((3L, "c", 3.5)).toDF("id", "name", "v"),
      "append", p) // v1: 3 rows
    Writers.writeDeltaTable(Seq((4L, "d", 4.5)).toDF("id", "name", "v"),
      "append", p) // v2: 4 rows
    assert(DeltaLog.read(spark, p).count() == 4)
    assert(DeltaLog.read(spark, p, versionAsOf = Some(1L)).count() == 3)
    assert(DeltaLog.read(spark, p, versionAsOf = Some(0L)).count() == 2)
    val e = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.read(spark, p, versionAsOf = Some(9L))
    }
    assert(e.getMessage.contains("version 9"))
    // plant an orphan data file (e.g. debris of a failed write): invisible
    // to the snapshot, removed by vacuum; live files stay
    val orphan = Paths.get(p, "part-junk.parquet")
    Seq((99L, "junk", 0.0)).toDF("id", "name", "v")
      .coalesce(1).write.mode("overwrite").parquet(tmp("delta_tt_junk"))
    val junkPart = Files.list(Paths.get(tmp("delta_tt_junk"))).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.toString.endsWith(".parquet")).get
    Files.copy(junkPart, orphan)
    assert(DeltaLog.read(spark, p).count() == 4) // orphan invisible
    val removed = DeltaLog.vacuum(spark, p, retentionMs = 0L)
    assert(removed == Seq("part-junk.parquet"), s"got $removed")
    assert(!Files.exists(orphan))
    assert(DeltaLog.read(spark, p).count() == 4) // live data untouched
  }

  test("reader refuses tables needing unsupported protocol capabilities") {
    val sp = spark; import sp.implicits._
    def freshTable(name: String): String = {
      val p = tmp(name)
      if (Files.exists(Paths.get(p))) {
        Files.walk(Paths.get(p)).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.delete(f))
      }
      Writers.writeDeltaTable(df, "overwrite", p)
      p
    }
    def appendCommit(p: String, line: String): Unit =
      Files.writeString(Paths.get(p, "_delta_log", "0" * 19 + "1.json"), line + "\n")
    // minReaderVersion 3 with an UNKNOWN feature: typed refusal, never
    // adds-minus-removes misreading (deletionVectors/columnMapping are
    // supported read features now — see the DV spec below)
    val p1 = freshTable("delta_proto_v3")
    appendCommit(p1,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors","futureReaderX"]}}""")
    val e1 = intercept[graft.GraftError.InvalidOperation] { DeltaLog.read(spark, p1) }
    assert(e1.getMessage.contains("minReaderVersion 3") &&
      e1.getMessage.contains("futureReaderX"))
    // an add whose DV uses a storage type we can't load: typed refusal
    // at read assembly, before any row is returned
    val p2 = freshTable("delta_proto_dv")
    val rel2 = Files.list(Paths.get(p2)).iterator().asScala
      .map(_.getFileName.toString)
      .find(n => n.startsWith("part-") && n.endsWith(".parquet")).get
    appendCommit(p2,
      s"""{"add":{"path":"$rel2","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true,"deletionVector":{"storageType":"x","pathOrInlineDv":"a","offset":1,"sizeInBytes":2,"cardinality":3}}}""")
    val e2 = intercept[graft.GraftError.InvalidOperation] { DeltaLog.read(spark, p2) }
    assert(e2.getMessage.contains("storageType"))
    // ID-mode column mapping (read-by-parquet-field-id): refuse instead
    // of returning scrambled columns — only name mode is readable
    val p3 = freshTable("delta_proto_cm")
    appendCommit(p3,
      """{"metaData":{"id":"m","format":{"provider":"parquet","options":{}},"schemaString":"{}","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id"}}}""")
    val e3 = intercept[graft.GraftError.InvalidOperation] { DeltaLog.read(spark, p3) }
    assert(e3.getMessage.contains("column mapping"))
    // NAME-mode with a missing/unparseable schemaString: refuse (cannot
    // derive the rename), never fall back to raw physical names
    val p4 = freshTable("delta_proto_cm_noschema")
    appendCommit(p4,
      """{"metaData":{"id":"m","format":{"provider":"parquet","options":{}},"schemaString":"{}","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name"}}}""")
    val e4 = intercept[graft.GraftError.InvalidOperation] { DeltaLog.read(spark, p4) }
    assert(e4.getMessage.contains("schemaString"))
    // reader v3 with ONLY the columnMapping feature is fine to replay;
    // the same version with an unknown feature still refuses (e1 above)
    val p5 = freshTable("delta_proto_v3_cm")
    appendCommit(p5,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["columnMapping"]}}""")
    assert(DeltaLog.read(spark, p5).count() == 2)
    // timestampNtz is a supported reader feature (Loaders normalizes
    // NTZ on load): a foreign minReaderVersion-3 table declaring it —
    // and actually carrying a TIMESTAMP_NTZ column — reads, matching
    // the writer whitelist, which always carried it
    val p6 = tmp("delta_proto_v3_ntz")
    if (Files.exists(Paths.get(p6))) {
      Files.walk(Paths.get(p6)).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    Writers.writeDeltaTable(
      Seq((1L, "2024-03-01 10:00:00"), (2L, "2024-03-02 11:30:00"))
        .toDF("id", "ts_s")
        .select($"id", org.apache.spark.sql.functions
          .to_timestamp_ntz($"ts_s").as("ts")),
      "overwrite", p6)
    appendCommit(p6,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["timestampNtz"]}}""")
    val ntzBack = DeltaLog.read(spark, p6)
    assert(ntzBack.count() == 2)
    assert(ntzBack.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    // our own tables keep reading
    assert(DeltaLog.read(spark, freshTable("delta_proto_ok")).count() == 2)
  }

  test("name-mode column-mapped table reads back logical names and values") {
    val sp = spark; import sp.implicits._
    val p = tmp("delta_colmap")
    val src = Seq((1L, "a", 1.5, ("x", 10L)), (2L, "b", 2.5, ("y", 20L)),
      (3L, "c", 3.5, ("z", 30L)))
      .toDF("id", "name", "v", "meta")
    DeltaLog.writeNameMapped(src, p)
    // physical parquet column names really differ from logical ones
    val rawCols = spark.read.parquet(p).columns.toSeq
    assert(rawCols.forall(_.startsWith("col-")), s"physical cols: $rawCols")
    // the delta read maps them back — names, nested names, and values
    val back = DeltaLog.read(spark, p)
    assert(back.columns.toSeq == Seq("id", "name", "v", "meta"))
    assert(back.select("meta._1").where($"id" === 2L).head().getString(0) == "y")
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq == Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))
    // predicate-pruned read speaks logical names too (stats keys remapped)
    val filtered = DeltaLog.readWhere(spark, p, "id >= 2 AND name <> 'c'")
    assert(filtered.collect().map(_.getLong(0)).toSeq == Seq(2L))
    // the logical predicate pushes THROUGH the rename projection to the
    // physical scan (same-type casts fold away, leaving pure aliases)
    val planStr = filtered.queryExecution.executedPlan.toString
    assert(planStr.contains("PushedFilters: [IsNotNull(`col-"),
      s"predicate not pushed to the physical scan:\n$planStr")
    // the change feed surfaces logical names as well
    val feed = DeltaLog.readChanges(spark, p, -1L, 0L)
    assert(feed.columns.toSeq ==
      Seq("id", "name", "v", "meta", "_change_type", "_commit_version"))
    assert(feed.where($"_change_type" === "insert").count() == 3L)
    // APPEND into the mapped table: the frame arrives with LOGICAL names
    // and is staged under the table's physical names — read-back is the
    // logical union, and the raw parquet stays uniformly physical
    val upd = Seq((9L, "z", 9.9, ("q", 90L))).toDF("id", "name", "v", "meta")
    DeltaLog.write(upd, "append", p)
    val after = DeltaLog.read(spark, p)
    assert(after.count() == 4L)
    assert(after.where($"id" === 9L).select("meta._1").head().getString(0) == "q")
    assert(spark.read.parquet(p).columns.forall(_.startsWith("col-")),
      "append must stage physical-named files")
    // schema-stable MERGE works: staged physical, the table's metaData
    // (the mapping annotations) preserved — NOT re-minted from the frame
    val mrg = Seq((11L, "m", 11.0, ("mm", 110L))).toDF("id", "name", "v", "meta")
    DeltaLog.write(mrg, "merge", p)
    val afterM = DeltaLog.read(spark, p)
    assert(afterM.count() == 5L)
    assert(afterM.columns.toSeq == Seq("id", "name", "v", "meta"))
    assert(afterM.where($"id" === 11L).select("meta._1").head().getString(0) == "mm")
    assert(spark.read.parquet(p).columns.forall(_.startsWith("col-")),
      "merge must stage physical-named files")
    // the merge commit carried NO metaData action (it would clobber the
    // mapping): the newest metaData still declares name-mode mapping
    val mergeCommit = Files.readString(Paths.get(p, "_delta_log",
      "0" * 19 + "2.json"))
    assert(mergeCommit.contains("\"MERGE\"") && !mergeCommit.contains("metaData"),
      s"mapped merge must not refresh metaData:\n$mergeCommit")
    // copy-on-write upsert/delete stage PHYSICAL-named rewrites on mapped
    // tables (the same logical->physical rename the append path applies)
    val upd2 = Seq((2L, "B2", 22.5, ("y2", 22L))).toDF("id", "name", "v", "meta")
    DeltaLog.upsert(upd2, Seq("id"), p)
    val afterU = DeltaLog.read(spark, p)
    assert(afterU.count() == 5L)
    assert(afterU.where($"id" === 2L).select("name").head().getString(0) == "B2")
    assert(spark.read.parquet(p).columns.forall(_.startsWith("col-")),
      "upsert must stage physical-named files")
    assert(DeltaLog.deleteWhere(spark, p, "id = 1") >= 1)
    assert(DeltaLog.read(spark, p).count() == 4L)
    // predicate-pruned read still speaks logical names post-rewrite
    assert(DeltaLog.readWhere(spark, p, "id >= 2 AND name = 'B2'").count() == 1L)
    // schema-EVOLVING append mints mapping annotations (round 16 —
    // positive cases and the metaData contract in DeltaColmapEvolveSpec):
    // the new column reads back on its row, null everywhere else, and
    // the staged file stays physical-named
    val evolved = Seq((10L, "w", 1.0, ("r", 1L), "NEW"))
      .toDF("id", "name", "v", "meta", "extra_col")
    DeltaLog.write(evolved, "append", p)
    val afterE = DeltaLog.read(spark, p)
    assert(afterE.columns.toSeq == Seq("id", "name", "v", "meta", "extra_col"))
    assert(afterE.where($"id" === 10L).select("extra_col").head().getString(0) == "NEW")
    assert(afterE.where($"id" === 2L).select("extra_col").head().isNullAt(0))
    assert(spark.read.parquet(p).columns.forall(_.startsWith("col-")),
      "evolving append must stage physical-named files")
    // overwrite replaces the table wholesale -> plain mode=none again
    DeltaLog.write(upd, "overwrite", p)
    assert(DeltaLog.read(spark, p).columns.toSeq == Seq("id", "name", "v", "meta"))
    assert(DeltaLog.read(spark, p).count() == 1L)
  }

  test("id-mode column-mapped table: reads by parquet field id; writes stage with field ids") {
    val sp = spark; import sp.implicits._
    val p = tmp("delta_colmap_id")
    val src = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "name", "v")
    DeltaLog.writeIdMapped(src, p)
    // files carry physical names; resolution happens by parquet field id
    assert(spark.read.parquet(p).columns.forall(_.startsWith("col-")))
    val back = DeltaLog.read(spark, p)
    assert(back.columns.toSeq == Seq("id", "name", "v"))
    assert(back.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))
    assert(DeltaLog.readWhere(spark, p, "id >= 2 AND name <> 'c'")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // APPEND: staged physical-named WITH parquet field ids — the table's
    // own by-id reader must resolve the new file's values (a file missing
    // its ids would surface as nulls/errors here, so this read IS the
    // field-id proof)
    val upd = Seq((9L, "z", 9.9)).toDF("id", "name", "v")
    DeltaLog.write(upd, "append", p)
    val afterAppend = DeltaLog.read(spark, p)
    assert(afterAppend.count() == 4L)
    assert(afterAppend.where($"id" === 9L).collect()
      .map(r => (r.getString(1), r.getDouble(2))).toSeq == Seq(("z", 9.9)))
    assert(spark.read.parquet(p).columns.forall(_.startsWith("col-")),
      "appended file must carry physical column names")
    // copy-on-write UPSERT and DELETE restage with field ids too
    DeltaLog.upsert(Seq((2L, "B", 20.5)).toDF("id", "name", "v"), Seq("id"), p)
    val afterUpsert = DeltaLog.read(spark, p)
    assert(afterUpsert.count() == 4L)
    assert(afterUpsert.where($"id" === 2L).collect()
      .map(r => (r.getString(1), r.getDouble(2))).toSeq == Seq(("B", 20.5)))
    assert(DeltaLog.deleteWhere(spark, p, "id = 1") >= 1)
    val afterDelete = DeltaLog.read(spark, p)
    assert(afterDelete.count() == 3L)
    assert(afterDelete.where($"id" === 1L).count() == 0L)
    // compaction restages by-id-readable files as well
    assert(DeltaLog.optimize(spark, p) >= 2)
    val afterOptimize = DeltaLog.read(spark, p)
    assert(afterOptimize.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((2L, "B", 20.5), (3L, "c", 3.5), (9L, "z", 9.9)))
    // time travel: v0 pre-mutation snapshot intact
    assert(DeltaLog.read(spark, p, Some(0L)).count() == 3L)
    // nested new columns EVOLVE: the mint annotates every level and the
    // staged file carries nested parquet field ids, so the by-id read
    // resolves the subfield while pre-existing rows read it back null
    val nestedUpd = Seq((5L, "n", 0.1)).toDF("id", "name", "v")
      .withColumn("extra", org.apache.spark.sql.functions.struct($"id"))
    DeltaLog.write(nestedUpd, "append", p)
    val evolved = DeltaLog.read(spark, p)
    assert(evolved.where($"id" === 5L).select("extra.id")
      .head.getLong(0) == 5L, "nested subfield must resolve by field id")
    assert(evolved.where($"id" === 2L).select("extra").head.isNullAt(0),
      "pre-evolution rows read the new nested column as null")
  }

  test("partitioned id-mode table: physical dirs resolve back to logical columns") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions.col
    val p = tmp("delta_colmap_id_part")
    val src = sp.range(40).select(col("id"),
      (col("id") % 4).as("bucket"), (col("id") * 1.5).as("v"))
    DeltaLog.writeIdMapped(src, p, partitionBy = Seq("bucket"))
    // directory layout carries the PHYSICAL partition column name
    val dirs = Files.list(Paths.get(p)).toArray.map(_.toString)
      .filter(d => Files.isDirectory(Paths.get(d)))
      .map(_.split("/").last).filterNot(_.startsWith("_"))
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("col-")), dirs.toSeq.toString)
    val back = DeltaLog.read(spark, p)
    assert(back.columns.toSeq == Seq("id", "bucket", "v"))
    assert(back.count() == 40L)
    assert(back.groupBy("bucket").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((0L, 10L), (1L, 10L), (2L, 10L), (3L, 10L)))
    // data columns still resolve by field id, partition values by dir
    assert(back.where($"bucket" === 2L && $"id" === 2L)
      .select("v").head().getDouble(0) == 3.0)
    // predicate-pruned read composes (partition values prune whole dirs)
    assert(DeltaLog.readWhere(spark, p, "bucket = 1 AND id < 10")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 5L, 9L))
    // PARTITIONED mapped rewrites stage physical-named partition dirs:
    // compaction keeps the layout and every value readable by id
    assert(DeltaLog.optimize(spark, p) >= 2)
    val afterOpt = DeltaLog.read(spark, p)
    assert(afterOpt.count() == 40L)
    assert(afterOpt.groupBy("bucket").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((0L, 10L), (1L, 10L), (2L, 10L), (3L, 10L)))
    val optDirs = Files.list(Paths.get(p)).toArray.map(_.toString)
      .filter(d => Files.isDirectory(Paths.get(d)))
      .map(_.split("/").last).filterNot(_.startsWith("_"))
    assert(optDirs.nonEmpty && optDirs.forall(_.startsWith("col-")),
      optDirs.toSeq.toString)
    // partitioned mapped APPEND lands in the physical dirs too
    DeltaLog.write(sp.range(40, 44).select(col("id"),
      (col("id") % 4).as("bucket"), (col("id") * 1.5).as("v")),
      "append", p, partitionBy = Seq("bucket"))
    val appended = DeltaLog.read(spark, p)
    assert(appended.count() == 44L)
    assert(appended.where($"id" === 42L).select("bucket").head.getLong(0) == 2L)
    // copy-on-write delete rewrites only the touched partitions' files
    assert(DeltaLog.deleteWhere(spark, p, "id >= 40") >= 1)
    assert(DeltaLog.read(spark, p).count() == 40L)
  }

  test("partitioned name-mapped table: physical dirs, append/upsert/delete/optimize") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions.col
    val p = tmp("delta_colmap_name_part")
    val src = sp.range(40).select(col("id"),
      (col("id") % 4).as("bucket"), (col("id") * 1.5).as("v"))
    DeltaLog.writeNameMapped(src, p, partitionBy = Seq("bucket"))
    // directory layout carries the PHYSICAL partition column name
    val dirs = Files.list(Paths.get(p)).toArray.map(_.toString)
      .filter(d => Files.isDirectory(Paths.get(d)))
      .map(_.split("/").last).filterNot(_.startsWith("_"))
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("col-")),
      dirs.toSeq.toString)
    val back = DeltaLog.read(spark, p)
    assert(back.columns.toSeq == Seq("id", "bucket", "v"))
    assert(back.count() == 40L)
    assert(back.groupBy("bucket").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      Seq((0L, 10L), (1L, 10L), (2L, 10L), (3L, 10L)))
    // predicate pruning composes through the physical partitionValues keys
    assert(DeltaLog.readWhere(spark, p, "bucket = 1 AND id < 10")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 5L, 9L))
    // APPEND speaks logical partitionBy, lands in physical dirs
    DeltaLog.write(sp.range(40, 44).select(col("id"),
      (col("id") % 4).as("bucket"), (col("id") * 1.5).as("v")),
      "append", p, partitionBy = Seq("bucket"))
    assert(DeltaLog.read(spark, p).count() == 44L)
    assert(DeltaLog.read(spark, p).where($"id" === 42L)
      .select("bucket").head.getLong(0) == 2L)
    // copy-on-write upsert replaces one key inside its partition
    DeltaLog.upsert(Seq((42L, 2L, 0.25)).toDF("id", "bucket", "v"),
      Seq("id"), p)
    assert(DeltaLog.read(spark, p).where($"id" === 42L)
      .select("v").head.getDouble(0) == 0.25)
    // copy-on-write delete + compaction keep the partitioned layout
    assert(DeltaLog.deleteWhere(spark, p, "id >= 40") >= 1)
    assert(DeltaLog.read(spark, p).count() == 40L)
    assert(DeltaLog.optimize(spark, p) >= 2)
    val after = DeltaLog.read(spark, p)
    assert(after.count() == 40L)
    assert(after.agg(org.apache.spark.sql.functions.sum($"id"))
      .head.getLong(0) == 780L)
    val optDirs = Files.list(Paths.get(p)).toArray.map(_.toString)
      .filter(d => Files.isDirectory(Paths.get(d)))
      .map(_.split("/").last).filterNot(_.startsWith("_"))
    assert(optDirs.nonEmpty && optDirs.forall(_.startsWith("col-")),
      optDirs.toSeq.toString)
  }

  test("deletion-vector table: reads filter deleted rows; DV-native delete unions bitmaps") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions.col
    val p = tmp("delta_dv")
    val src = sp.range(200).select(col("id"),
      (col("id") % 7).as("grp"), (col("id") * 1.5).as("v"))
      .repartition(4) // several files, several DVs
    DeltaLog.writeWithDeletionVectors(src, p, "id % 3 = 0", inlineFirst = true)
    // raw parquet still holds every row; the delta read hides id%3==0
    // (glob the part files — a naive directory read trips over the
    // non-parquet deletion_vector bin, exactly like on a real DV table)
    assert(spark.read.parquet(s"$p/part-*.parquet").count() == 200L)
    val back = DeltaLog.read(spark, p)
    assert(back.count() == 133L, s"got ${back.count()}")
    assert(back.where($"id" % 3 === 0).count() == 0L)
    assert(back.columns.toSeq == Seq("id", "grp", "v"),
      "DV bookkeeping columns must not leak")
    // sum over survivors matches a direct computation
    val expect = (0L until 200L).filter(_ % 3 != 0).sum
    assert(back.agg(org.apache.spark.sql.functions.sum($"id")).head.getLong(0) == expect)
    // predicate-pruned read composes with the DV filter (stats recorded
    // pre-delete stay sound upper bounds)
    val filtered = DeltaLog.readWhere(spark, p, "id >= 100 AND id % 3 <> 0")
    assert(filtered.count() == (100L until 200L).count(_ % 3 != 0))
    val none = DeltaLog.readWhere(spark, p, "id % 3 = 0")
    assert(none.count() == 0L)
    // DV-native delete: the ONE mutation a DV table supports — attaches
    // and UNIONS deletion vectors, never rewrites a data file. ids 0..199
    // live = %3!=0 (133); of those, %5==0 matches 26; both gone after.
    assert(DeltaLog.deleteWhereViaDv(spark, p, "id % 5 = 0") == 26L)
    val afterDv = DeltaLog.read(spark, p)
    assert(afterDv.count() == 107L, s"got ${afterDv.count()}")
    assert(afterDv.where($"id" % 5 === 0 || $"id" % 3 === 0).count() == 0L)
    // nothing live matches on a re-run (already-deleted rows don't recount)
    assert(DeltaLog.deleteWhereViaDv(spark, p, "id % 5 = 0") == 0L)
    // the data files are untouched — all 200 physical rows remain
    assert(spark.read.parquet(s"$p/part-*.parquet").count() == 200L)
    // time travel applies each version's OWN DVs: v0 = fixture deletes
    // only (%3), v1 = after the DV-native %5 delete
    assert(DeltaLog.read(spark, p, Some(0L)).count() == 133L)
    assert(DeltaLog.read(spark, p, Some(1L)).count() == 107L)
    // DV-aware RESTORE across DV generations: files live at both
    // endpoints swap to the TARGET version's descriptors
    DeltaLog.restore(spark, p, 0L)                       // v2 = v0's row set
    assert(DeltaLog.read(spark, p).count() == 133L)
    DeltaLog.restore(spark, p, 1L)                       // v3 = v1's row set
    assert(DeltaLog.read(spark, p).count() == 107L)
    // DV-aware vacuum: the gen-1 bin (superseded by the delete's fresh
    // bin at v1, which v3 re-references) is an orphan and is swept;
    // current reads stay exact
    val swept = DeltaLog.vacuum(spark, p, retentionMs = 0L)
    assert(swept.exists(s => s.startsWith("deletion_vector_") &&
      s.endsWith(".bin")), s"got $swept")
    assert(DeltaLog.read(spark, p).count() == 107L)
    // restoring to a version whose DV bin was swept fails typed
    val eRestore = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.restore(spark, p, 0L) }
    assert(eRestore.getMessage.contains("vacuumed"), eRestore.getMessage)
    // a table NOT declaring the feature refuses the DV delete typed
    val plain = tmp("delta_dv_plain")
    Writers.writeDeltaTable(df, "overwrite", plain)
    val ePlain = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.deleteWhereViaDv(spark, plain, "id = 1") }
    assert(ePlain.getMessage.contains("enableDeletionVectors"))
    // copy-on-write upsert/deleteWhere/optimize work ON DV tables too —
    // survivors come from live rows, removes echo descriptors (positive
    // coverage in DeltaCowDvSpec); no refusal to assert here anymore
    val upd = Seq((1L, 9L, 9.9)).toDF("id", "grp", "v")
    def refused(body: => Any): String =
      intercept[graft.GraftError.InvalidOperation](body).getMessage
    // the change feed over DV tables is ROW-LEVEL (bitmap differences per
    // generation — positive cases in DeltaDvChangesSpec); here the
    // retention-0 vacuum above swept the superseded v0 bin, so every
    // window whose descriptors need it errors typed (past retention),
    // never a raw executor FileNotFoundException mid-bitmap-decode
    assert(refused(DeltaLog.readChanges(spark, p, -1L, 0L)).contains("vacuum"))
    assert(refused(DeltaLog.readChanges(spark, p, 0L, 1L)).contains("vacuum"))
    // APPEND is allowed: it only adds files, never touches the DV'd ones
    DeltaLog.write(upd.withColumn("grp", upd("grp")), "append", p)
    val appended = DeltaLog.read(spark, p)
    assert(appended.count() == 108L, s"got ${appended.count()}")
    // deleted rows stay hidden; the appended id=1 row IS visible (new
    // file, no DV) alongside the surviving original id=1 row
    assert(appended.where($"id" % 3 === 0 && $"grp" =!= 9L).count() == 0L)
    assert(appended.where($"id" === 1L).count() == 2L)
    // MERGE is allowed too — schema evolution is pure metadata (declared
    // schema ⊕ frame, no raw-dir read that would trip over the DV bins)
    DeltaLog.write(Seq((500L, 2L, 0.25, "tagged"))
      .toDF("id", "grp", "v", "note"), "merge", p)
    val merged = DeltaLog.read(spark, p)
    assert(merged.count() == 109L)
    assert(merged.columns.toSeq == Seq("id", "grp", "v", "note"))
    assert(merged.where($"id" === 500L).select("note").head.getString(0)
      == "tagged")
    assert(merged.where($"id" % 3 === 0 && $"grp" =!= 9L).count() == 0L,
      "merge must not resurrect DV-deleted rows")
    // overwrite is allowed: it replaces the table wholesale
    DeltaLog.write(upd, "overwrite", p)
    assert(DeltaLog.read(spark, p).count() == 1L)
  }

  test("DV tables checkpoint: descriptors survive the fold, replay stays bounded") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions.col
    val p = tmp("delta_dv_cp")
    val src = sp.range(200).select(col("id"),
      (col("id") % 7).as("grp"), (col("id") * 1.5).as("v"))
      .repartition(4)
    DeltaLog.writeWithDeletionVectors(src, p, "id % 3 = 0", inlineFirst = true)
    DeltaLog.deleteWhereViaDv(spark, p, "id % 5 = 0")      // v1
    Writers.writeDeltaTable(Seq((1000L, 0L, 0.0))
      .toDF("id", "grp", "v"), "append", p)                // v2
    // checkpoint the DV-bearing snapshot, then drop the folded commits —
    // the read must come back identical THROUGH the checkpoint alone
    DeltaLog.writeCheckpoint(spark, p, 2L)
    val dropped = DeltaLog.cleanupLog(spark, p)
    assert(dropped.size == 3, s"got $dropped")
    val back = DeltaLog.read(spark, p)
    assert(back.count() == 108L, s"got ${back.count()}")
    assert(back.where(($"id" % 3 === 0 || $"id" % 5 === 0) &&
      $"id" =!= 1000L).count() == 0L)
    // the checkpoint parquet itself carries the DV descriptor struct
    val cp = spark.read.parquet(s"$p/_delta_log/" + "0" * 19 + "2.checkpoint.parquet")
    assert(cp.columns.contains("add"))
    val addType = cp.schema("add").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(addType.fieldNames.contains("deletionVector"),
      "checkpoint add struct dropped the DV descriptors")
    // and per re-added path only the NEWEST descriptor survived: the
    // second delete's union (%3 ∪ %5 = 93 deleted rows) is what replays
    val cards = cp.where(col("add").isNotNull)
      .select(col("add.deletionVector.cardinality"))
      .collect().flatMap(r => Option(r.get(0)).map(_.toString.toLong))
    assert(cards.sum == 93L, s"got ${cards.toSeq}")
    // a further DV delete on the cleaned log still works and re-checkpoints
    assert(DeltaLog.deleteWhereViaDv(spark, p, "id = 1") == 1L)
    assert(DeltaLog.read(spark, p).count() == 107L)
  }

  test("checkpoint keeps a path removed then RE-ADDED (restore), newest add wins") {
    val sp = spark; import sp.implicits._
    val p = tmp("delta_cp_readd")
    if (Files.exists(Paths.get(p))) {
      Files.walk(Paths.get(p)).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    Writers.writeDeltaTable(df, "overwrite", p)            // v0: ids 1,2
    Writers.writeDeltaTable(Seq((3L, "c", 3.5)).toDF("id", "name", "v"),
      "append", p)                                         // v1: +3
    DeltaLog.restore(spark, p, 0L)                         // v2: removes v1's file
    DeltaLog.restore(spark, p, 1L)                         // v3: RE-ADDS it
    DeltaLog.writeCheckpoint(spark, p, 3L)
    DeltaLog.cleanupLog(spark, p)
    // the re-added file must survive the checkpoint fold — a global
    // adds-minus-removes would have dropped it (silent data loss)
    assert(DeltaLog.read(spark, p).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L))
    // the log now holds ONLY the checkpoint (every commit was cleaned):
    // the next append must land at checkpoint+1, not restart at 0 —
    // a version-0 commit would sit invisibly BEHIND the checkpoint
    assert(!Files.list(Paths.get(p, "_delta_log")).toArray.map(_.toString)
      .exists(_.endsWith(".json")))
    Writers.writeDeltaTable(Seq((4L, "d", 4.5)).toDF("id", "name", "v"),
      "append", p)
    assert(Files.exists(Paths.get(p, "_delta_log", "0" * 19 + "4.json")),
      "append after full log cleanup must continue AFTER the checkpoint")
    assert(DeltaLog.read(spark, p).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L, 4L))
  }

  test("purgeDeletionVectors materializes DV deletes; full maintenance returns") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions.col
    val p = tmp("delta_dv_purge")
    val src = sp.range(200).select(col("id"),
      (col("id") % 7).as("grp"), (col("id") * 1.5).as("v"))
      .repartition(4)
    DeltaLog.writeWithDeletionVectors(src, p, "id % 3 = 0", inlineFirst = true)
    DeltaLog.deleteWhereViaDv(spark, p, "id % 5 = 0")
    // purge rewrites exactly the DV'd files; row set unchanged
    val purged = DeltaLog.purgeDeletionVectors(spark, p)
    assert(purged == 4, s"got $purged")
    val back = DeltaLog.read(spark, p)
    assert(back.count() == 107L, s"got ${back.count()}")
    assert(back.where($"id" % 3 === 0 || $"id" % 5 === 0).count() == 0L)
    // copy-on-write: the restaged files hold ONLY live rows, while the
    // superseded originals remain on disk (200 rows) until vacuum —
    // raw glob sees both generations
    assert(spark.read.parquet(s"$p/part-*.parquet").count() == 307L)
    // the snapshot carries no DVs; a second purge is a no-commit no-op
    assert(DeltaLog.purgeDeletionVectors(spark, p) == 0)
    // the purge commit's removes echoed the superseded descriptors
    val purgeCommit = Files.readString(Paths.get(p, "_delta_log",
      "0" * 19 + "2.json"))
    assert(purgeCommit.contains("\"PURGE\"") &&
      purgeCommit.contains("\"deletionVector\""), purgeCommit.take(300))
    // full copy-on-write maintenance applies again
    assert(DeltaLog.deleteWhere(spark, p, "id = 1") == 1)
    DeltaLog.upsert(Seq((2L, 0L, 99.0)).toDF("id", "grp", "v"), Seq("id"), p)
    assert(DeltaLog.optimize(spark, p, targetBytes = 1L << 30) > 0)
    val afterMaint = DeltaLog.read(spark, p)
    assert(afterMaint.count() == 106L)
    assert(afterMaint.where($"id" === 2L).select("v").head.getDouble(0) == 99.0)
    // vacuum sweeps the orphaned bin files AND the rewritten originals
    val swept = DeltaLog.vacuum(spark, p, retentionMs = 0L)
    assert(swept.count(s => s.startsWith("deletion_vector_")) >= 1, s"$swept")
    assert(DeltaLog.read(spark, p).count() == 106L)
  }

  test("mergeSchemas: table-first union, nested recursion, typed incompatibility") {
    import org.apache.spark.sql.types._
    val table = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("a", StringType), StructField("b", IntegerType)))),
      StructField("only_table", DoubleType)))
    val frame = StructType(Seq(
      StructField("meta", StructType(Seq(
        StructField("b", IntegerType), StructField("c", BooleanType)))),
      StructField("id", LongType),
      StructField("only_frame", StringType)))
    val merged = DeltaLog.mergeSchemas(table, frame, "t")
    // table fields keep their positions; new frame fields append; nested
    // structs merge recursively; everything nullable
    assert(merged.fieldNames.toSeq ==
      Seq("id", "meta", "only_table", "only_frame"))
    assert(merged.fields.forall(_.nullable))
    assert(merged("meta").dataType.asInstanceOf[StructType].fieldNames.toSeq
      == Seq("a", "b", "c"))
    // same-name incompatible types refuse typed with the column path
    val bad = StructType(Seq(StructField("meta", StructType(Seq(
      StructField("b", StringType))))))
    val e = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.mergeSchemas(table, bad, "t") }
    assert(e.getMessage.contains("meta.b"), e.getMessage)
    // a merge commit uses it end-to-end: schema evolution without a
    // raw-dir footer scan
    val sp = spark; import sp.implicits._
    val p = tmp("delta_merge_meta")
    Writers.writeDeltaTable(df, "overwrite", p)
    DeltaLog.write(Seq((7L, "g", 0.5, "extra")).toDF("id", "name", "v", "tag"),
      "merge", p)
    val back = DeltaLog.read(spark, p)
    assert(back.columns.toSeq == Seq("id", "name", "v", "tag"))
    assert(back.count() == 3L)
    assert(back.where($"id" === 1L).select("tag").head.isNullAt(0))
  }

  test("optimize compacts id-mode tables by-id-readably; DV remove actions echo the old descriptor") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.functions.col
    val pid = tmp("delta_opt_id")
    DeltaLog.writeIdMapped(sp.range(20)
      .select(col("id"), (col("id") % 3).as("g")).repartition(4), pid)
    // compaction restages via the by-id logical read; the replacement
    // files carry fresh field ids so the table's own reader resolves them
    assert(DeltaLog.optimize(spark, pid) == 4)
    val back = DeltaLog.read(spark, pid)
    assert(back.columns.toSeq == Seq("id", "g"))
    assert(back.count() == 20L)
    assert(back.agg(org.apache.spark.sql.functions.sum($"id"))
      .head.getLong(0) == 190L)
    assert(DeltaLog.optimize(spark, pid, zorderBy = Seq("id")) >= 1)
    assert(DeltaLog.read(spark, pid).count() == 20L)
    // a second DV delete supersedes a file that already carried a DV:
    // the remove action must echo the OLD descriptor so an external
    // vacuum can associate the superseded bin file
    val pdv = tmp("delta_dv_echo")
    val src = sp.range(100).select(col("id"), (col("id") * 2).as("v"))
      .coalesce(1)
    DeltaLog.writeWithDeletionVectors(src, pdv, "id % 4 = 0")
    DeltaLog.deleteWhereViaDv(spark, pdv, "id % 9 = 0")
    val v1 = Files.readString(Paths.get(pdv, "_delta_log", "0" * 19 + "1.json"))
    val removeLine = v1.linesIterator.find(_.startsWith("""{"remove"""")).get
    assert(removeLine.contains("\"deletionVector\""),
      s"remove action lost the superseded DV descriptor: $removeLine")
    // and it echoes the ORIGINAL descriptor's cardinality (25 = %4 rows)
    assert(removeLine.contains("\"cardinality\":25"), removeLine)
  }

  test("z85 and the DV payload round-trip byte-exactly") {
    val bytes = Array.tabulate(32)(i => (i * 37 % 251).toByte)
    assert(DeltaLog.z85Decode(DeltaLog.z85Encode(bytes)).toSeq == bytes.toSeq)
    // row indexes straddling the 32-bit bitmap boundary survive decode
    val idxs = Array(0L, 5L, 4294967295L, 4294967296L, 8589934592L + 17L)
    val byHigh = idxs.groupBy(i => (i >> 32).toInt)
    val maxHigh = (idxs.max >> 32).toInt
    val bitmaps = (0 to maxHigh).map { h =>
      val rb = new org.roaringbitmap.RoaringBitmap()
      byHigh.getOrElse(h, Array.empty[Long]).foreach(i => rb.add((i & 0xffffffffL).toInt))
      rb
    }
    val bb = java.nio.ByteBuffer.allocate(
      4 + 8 + bitmaps.map(_.serializedSizeInBytes()).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1681511377)
    bb.putLong(bitmaps.length.toLong)
    bitmaps.foreach(_.serialize(bb))
    assert(DeltaLog.decodeDvPayload(bb.array()).toSeq == idxs.toSeq.sorted)
  }

  test("readChanges: file-level change feed between versions") {
    val sp = spark; import sp.implicits._
    val p = tmp("delta_cdf")
    if (Files.exists(Paths.get(p))) {
      Files.walk(Paths.get(p)).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    Writers.writeDeltaTable(df, "overwrite", p)                       // v0: ids 1,2
    Writers.writeDeltaTable(Seq((3L, "c", 3.5)).toDF("id", "name", "v"),
      "append", p)                                                    // v1: +3
    Writers.upsertDeltaTable(Seq((2L, "B2", 20.0), (10L, "j", 10.0))
      .toDF("id", "name", "v"), Seq("id"), p)                         // v2: cow rewrite
    // append-only window: exact row-level inserts
    val w1 = DeltaLog.readChanges(spark, p, 0L, 1L).collect()
    assert(w1.map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type"),
      r.getAs[Long]("_commit_version"))).toSet == Set((3L, "insert", 1L)))
    // upsert window: the rewritten file surfaces delete(old)+insert(new);
    // untouched files (id=3's) do not appear
    val w2 = DeltaLog.readChanges(spark, p, 1L, 2L).collect()
      .map(r => (r.getAs[String]("_change_type"), r.getAs[Long]("id"),
        r.getAs[String]("name"))).toSet
    // copy-on-write minimality: only id=2's physical file was rewritten
    // (id=1 lives in a different part file and never appears)
    assert(w2.collect { case ("delete", id, _) => id } == Set(2L), s"$w2")
    assert(w2.collect { case ("insert", id, _) => id } == Set(2L, 10L), s"$w2")
    assert(w2.contains(("insert", 2L, "B2")) && w2.contains(("delete", 2L, "b")))
    // the builder-API loader wraps the same feed (and NTZ-normalizes)
    assert(Loaders.loadDeltaChanges(spark, p, "cdf", 0L, 1L).df.count() == 1)
    intercept[graft.GraftError.InvalidOperation] {
      Loaders.loadDeltaChanges(spark, tmp("not_a_delta"), "x", 0L, 1L)
    }
    // empty window: shape-stable empty frame
    val empty = DeltaLog.readChanges(spark, p, 2L, 2L)
    assert(empty.count() == 0 && empty.columns.contains("_change_type"))
    // past vacuum retention: typed error, not silent wrong answers
    DeltaLog.vacuum(spark, p, retentionMs = 0L)
    val e = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.readChanges(spark, p, 1L, 2L)
    }
    assert(e.getMessage.contains("vacuum"))
    // the still-live window keeps working after vacuum
    assert(DeltaLog.readChanges(spark, p, 0L, 1L).count() == 1)
  }

  test("readChangesSince: cursor replays until committed, then advances") {
    val sp = spark; import sp.implicits._
    val p = tmp("delta_cursor")
    val cur = tmp("delta_cursor.ver")
    Seq(p, cur).foreach { f =>
      if (Files.exists(Paths.get(f))) {
        Files.walk(Paths.get(f)).sorted(java.util.Comparator.reverseOrder())
          .forEach(x => Files.delete(x))
      }
    }
    Writers.writeDeltaTable(df, "overwrite", p)
    // fresh cursor: the whole table arrives as inserts (bootstrap sync)
    val Some((b0, v0, commit0)) = DeltaLog.readChangesSince(spark, p, cur)
    assert(v0 == 0L && b0.count() == 2)
    // crash-before-commit: the SAME window replays
    val Some((b0again, _, _)) = DeltaLog.readChangesSince(spark, p, cur)
    assert(b0again.count() == 2)
    commit0()
    // nothing new => None
    assert(DeltaLog.readChangesSince(spark, p, cur).isEmpty)
    // a new commit arrives: only ITS window is served
    Writers.writeDeltaTable(Seq((3L, "c", 3.5)).toDF("id", "name", "v"),
      "append", p)
    val Some((b1, v1, commit1)) = DeltaLog.readChangesSince(spark, p, cur)
    assert(v1 == 1L)
    assert(b1.collect().map(_.getAs[Long]("id")).toSeq == Seq(3L))
    commit1()
    assert(DeltaLog.readChangesSince(spark, p, cur).isEmpty)
  }

  test("end-to-end exactly-once: change-feed sync + txn sink survive a crash") {
    val sp = spark; import sp.implicits._
    val src = tmp("delta_e2e_src"); val dst = tmp("delta_e2e_dst")
    val cur = tmp("delta_e2e.cursor")
    Seq(src, dst, cur).foreach { f =>
      if (Files.exists(Paths.get(f))) {
        Files.walk(Paths.get(f)).sorted(java.util.Comparator.reverseOrder())
          .forEach(x => Files.delete(x))
      }
    }
    Writers.writeDeltaTable(df, "overwrite", src)
    def syncOnce(crashBeforeCursorCommit: Boolean): Unit =
      DeltaLog.readChangesSince(spark, src, cur).foreach {
        case (changes, upTo, commitCursor) =>
          import org.apache.spark.sql.functions.col
          val batch = changes.where(col("_change_type") === "insert")
            .drop("_change_type", "_commit_version")
          val mode = if (Files.exists(Paths.get(dst, "_delta_log"))) "append"
                     else "overwrite"
          Writers.writeDeltaTable(batch, mode, dst,
            txn = Some(("e2e-sync", upTo)))
          if (!crashBeforeCursorCommit) commitCursor()
      }
    // first pass CRASHES after the sink write, before the cursor commit
    syncOnce(crashBeforeCursorCommit = true)
    assert(DeltaLog.read(spark, dst).count() == 2)
    // recovery replays the same window — the txn watermark dedups the
    // sink write, the cursor then advances: exactly-once end to end
    syncOnce(crashBeforeCursorCommit = false)
    assert(DeltaLog.read(spark, dst).count() == 2,
      "replayed window double-applied at the sink")
    assert(DeltaLog.readChangesSince(spark, src, cur).isEmpty)
    // steady state keeps flowing
    Writers.writeDeltaTable(Seq((3L, "c", 3.5)).toDF("id", "name", "v"),
      "append", src)
    syncOnce(crashBeforeCursorCommit = false)
    assert(DeltaLog.read(spark, dst).collect().map(_.getAs[Long]("id")).sorted
      .toSeq == Seq(1L, 2L, 3L))
  }

  test("SetTransaction makes replayed appends idempotent, surviving checkpoints") {
    val sp = spark; import sp.implicits._
    val p = tmp("delta_txn")
    if (Files.exists(Paths.get(p))) {
      Files.walk(Paths.get(p)).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    Writers.writeDeltaTable(df, "overwrite", p)
    val b1 = Seq((10L, "s0", 0.5)).toDF("id", "name", "v")
    Writers.writeDeltaTable(b1, "append", p, txn = Some(("appX", 0L)))
    // the commit file carries the protocol's txn action
    val v1 = Paths.get(p, "_delta_log", "0" * 19 + "1.json")
    assert(Files.readString(v1).contains("\"txn\":{\"appId\":\"appX\",\"version\":0"))
    // exact replay (the post-crash foreachBatch rerun): skipped, no
    // double append, no new version
    Writers.writeDeltaTable(b1, "append", p, txn = Some(("appX", 0L)))
    assert(DeltaLog.read(spark, p).count() == 3)
    assert(!Files.exists(Paths.get(p, "_delta_log", "0" * 19 + "2.json")))
    // a NEWER txn version commits; an OLDER one from the same app skips
    Writers.writeDeltaTable(Seq((11L, "s1", 1.5)).toDF("id", "name", "v"),
      "append", p, txn = Some(("appX", 1L)))
    Writers.writeDeltaTable(Seq((99L, "stale", 9.9)).toDF("id", "name", "v"),
      "append", p, txn = Some(("appX", 0L)))
    assert(DeltaLog.read(spark, p).count() == 4)
    // a different app's version counter is independent
    Writers.writeDeltaTable(Seq((12L, "other", 2.5)).toDF("id", "name", "v"),
      "append", p, txn = Some(("appY", 0L)))
    assert(DeltaLog.read(spark, p).count() == 5)
    // the watermark survives checkpoint + log cleanup: fold a checkpoint
    // at the newest version, drop the old commits, replay appX v1 again
    val newest = Files.list(Paths.get(p, "_delta_log")).toArray.map(_.toString)
      .filter(_.endsWith(".json")).map(f =>
        f.split("/").last.stripSuffix(".json").toLong).max
    DeltaLog.writeCheckpoint(spark, p, newest)
    DeltaLog.cleanupLog(spark, p)
    Writers.writeDeltaTable(Seq((98L, "replay", 8.8)).toDF("id", "name", "v"),
      "append", p, txn = Some(("appX", 1L)))
    assert(DeltaLog.read(spark, p).count() == 5,
      "txn watermark lost across checkpoint/cleanup — batch double-applied")
  }

  test("crashed staging debris: never absorbed, swept by vacuum after retention") {
    val sp = spark; import sp.implicits._
    val p = tmp("delta_stage_debris")
    if (Files.exists(Paths.get(p))) {
      Files.walk(Paths.get(p)).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    // simulate a hard-killed append: a stage dir with a parquet inside
    // the (pre-delta) table dir
    val stale = Paths.get(p, ".graft_stage_deadbeef")
    Files.createDirectories(stale)
    Seq((99L, "junk", 0.0)).toDF("id", "name", "v")
      .coalesce(1).write.mode("overwrite").parquet(stale.resolve("j").toString)
    // fresh bootstrap append must NOT absorb the hidden debris as data
    Writers.writeDeltaTable(df, "append", p)
    assert(DeltaLog.read(spark, p).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L), "hidden staging debris leaked into the snapshot")
    // sibling overwrite-stage debris of THIS table
    val sibling = Paths.get(p).getParent
      .resolve(s".graft_stage_${Paths.get(p).getFileName}_cafe")
    Files.createDirectories(sibling)
    Files.writeString(sibling.resolve("x.parquet"), "not really parquet")
    // young stages survive vacuum (a live writer may own them)...
    assert(DeltaLog.vacuum(spark, p).isEmpty)
    assert(Files.exists(stale) && Files.exists(sibling))
    // ...stale ones are swept once past the retention window
    val removed = DeltaLog.vacuum(spark, p, stageRetentionMs = -1L)
    assert(removed.toSet == Set(".graft_stage_deadbeef", sibling.getFileName.toString),
      s"got $removed")
    assert(!Files.exists(stale) && !Files.exists(sibling))
    assert(DeltaLog.read(spark, p).count() == 2)
  }

  test("delta append rebases past a commit slot taken by a concurrent writer") {
    val sp = spark; import sp.implicits._
    val p = tmp("delta_race")
    Writers.writeDeltaTable(df, "overwrite", p)
    // simulate a concurrent writer winning version 1 between our version
    // computation and our rename: pre-place a foreign commit in the slot
    val foreign = Paths.get(p, "_delta_log", "0" * 19 + "1.json")
    Files.writeString(foreign,
      """{"commitInfo":{"operation":"APPEND","txnId":"someone-else"}}""" + "\n")
    Writers.writeDeltaTable(Seq((3L, "c", 3.5)).toDF("id", "name", "v"), "append", p)
    // our commit must have rebased to version 2, not clobbered version 1
    assert(Files.readString(foreign).contains("someone-else"))
    val v2 = Paths.get(p, "_delta_log", "0" * 19 + "2.json")
    assert(Files.isRegularFile(v2), "losing writer must rebase to the next version")
    assert(Files.readString(v2).contains("\"add\""))
    assert(Loaders.load(spark, p, "race").df.count() == 3) // nothing lost
  }

  test("delta upsert rewrites only touched files; history stays time-travelable") {
    val sp = spark; import sp.implicits._
    val p = tmp("delta_upsert")
    Writers.writeDeltaTable(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "v"),
      "overwrite", p)
    Writers.writeDeltaTable(Seq((3L, "c", 3.0)).toDF("id", "name", "v"), "append", p)
    val filesBefore = DeltaLog.activeFiles(spark, p).toSet
    // update id=2, insert id=10
    Writers.upsertDeltaTable(Seq((2L, "B2", 20.0), (10L, "j", 10.0)).toDF("id", "name", "v"),
      Seq("id"), p)
    val out = DeltaLog.read(spark, p).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out == Map(1L -> ("a", 1.0), 2L -> ("B2", 20.0),
      3L -> ("c", 3.0), 10L -> ("j", 10.0)))
    // copy-on-write minimality: the append file (id=3, no matched key) is
    // still the SAME physical file in the new snapshot
    val filesAfter = DeltaLog.activeFiles(spark, p).toSet
    val v1File = filesBefore.filter(f => filesAfter.contains(f))
    assert(v1File.nonEmpty, "untouched file must survive the rewrite unrewritten")
    // the commit carries remove actions and the old version still reads
    val v2 = java.nio.file.Paths.get(p, "_delta_log", "0" * 19 + "2.json")
    assert(Files.readString(v2).contains("\"remove\""))
    assert(DeltaLog.read(spark, p, versionAsOf = Some(1L)).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("delta history lists operations; restore reinstates an old snapshot additively") {
    val sp = spark; import sp.implicits._
    val p = fresh("delta_restore")
    Writers.writeDeltaTable(Seq((1L, "a", 1.0)).toDF("id", "name", "v"), "overwrite", p)
    Writers.writeDeltaTable(Seq((2L, "b", 2.0)).toDF("id", "name", "v"), "append", p)
    Writers.deleteFromDeltaTable(spark, p, "id = 1")
    assert(DeltaLog.read(spark, p).collect().map(_.getLong(0)).toSeq == Seq(2L))
    val ops = DeltaLog.history(spark, p).map { case (v, op, _) => v -> op }
    assert(ops == Seq(2L -> "DELETE", 1L -> "APPEND", 0L -> "OVERWRITE"))
    // restore to version 1 (both rows) — a NEW version, history intact
    DeltaLog.restore(spark, p, 1L)
    assert(DeltaLog.read(spark, p).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(DeltaLog.history(spark, p).head._2 == "RESTORE")
    // the interim delete state is still time-travelable
    assert(DeltaLog.read(spark, p, versionAsOf = Some(2L)).collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("delta deleteWhere removes matching rows; no-match is a no-commit no-op") {
    val sp = spark; import sp.implicits._
    val p = tmp("delta_delete")
    Writers.writeDeltaTable(
      Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("id", "name", "v"),
      "overwrite", p)
    assert(Writers.deleteFromDeltaTable(spark, p, "id = 2") > 0)
    assert(DeltaLog.read(spark, p).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val versions = Files.list(Paths.get(p, "_delta_log")).toArray.map(_.toString)
      .count(_.endsWith(".json"))
    assert(Writers.deleteFromDeltaTable(spark, p, "id = 999") == 0)
    val versionsAfter = Files.list(Paths.get(p, "_delta_log")).toArray.map(_.toString)
      .count(_.endsWith(".json"))
    assert(versionsAfter == versions, "no-match delete must not commit a version")
  }

  test("acquireCommitSlot wins a free slot, loses a taken one without clobbering") {
    val p = tmp("delta_slot")
    // self-clean: slot files from a previous run would shadow the free-slot case
    if (Files.exists(Paths.get(p))) {
      Files.walk(Paths.get(p)).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    Files.createDirectories(Paths.get(p, "_delta_log"))
    val log = new org.apache.hadoop.fs.Path(p, "_delta_log")
    val fs = log.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val slotFile = Paths.get(p, "_delta_log", "0" * 19 + "7.json")
    assert(DeltaLog.acquireCommitSlot(fs, log, 7L, "txn-a", "winner-bytes\n"))
    assert(Files.readString(slotFile) == "winner-bytes\n")
    // second writer targeting the same slot must lose AND must not replace
    // the winner's bytes (rename-replace is exactly the local-FS hazard)
    assert(!DeltaLog.acquireCommitSlot(fs, log, 7L, "txn-b", "loser-bytes\n"))
    assert(Files.readString(slotFile) == "winner-bytes\n")
    // no tmp debris left behind by either attempt
    val debris = Files.list(Paths.get(p, "_delta_log")).toArray.map(_.toString)
      .filter(_.contains(".tmp"))
    assert(debris.isEmpty, s"tmp debris: ${debris.toSeq}")
  }

  test("two concurrent delta appends both land, on distinct versions") {
    val sp = spark; import sp.implicits._
    val p = fresh("delta_race2")
    Writers.writeDeltaTable(df, "overwrite", p)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futures = (0 until 2).map { i =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = Writers.writeDeltaTable(
            Seq((10L + i, s"t$i", i.toDouble)).toDF("id", "name", "v"), "append", p)
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    val versions = Files.list(Paths.get(p, "_delta_log")).toArray.map(_.toString)
      .filter(_.endsWith(".json")).sorted
    assert(versions.length == 3, s"expected 3 commits, got ${versions.toSeq}")
    assert(Loaders.load(spark, p, "race2").df.count() == 4) // 2 base + 2 appends
  }

  test("8-way append race: every writer lands once, versions are gapless") {
    val sp = spark; import sp.implicits._
    val p = fresh("delta_race8")
    Writers.writeDeltaTable(df, "overwrite", p)
    // all 8 writers start from the SAME observed version, so every slot
    // is contested: 1 winner + 7 rebases, then 1 + 6, ... — the
    // worst-case optimistic-concurrency storm on one table
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            gate.await()
            Writers.writeDeltaTable(
              Seq((100L + i, s"w$i", i.toDouble)).toDF("id", "name", "v"),
              "append", p)
          }
        })
      }
      gate.countDown()
      futures.foreach(_.get())
    } finally pool.shutdown()
    val versions = Files.list(Paths.get(p, "_delta_log")).toArray.map(_.toString)
      .filter(_.endsWith(".json")).map(f =>
        f.split("/").last.stripSuffix(".json").toLong).sorted
    assert(versions.sameElements(0L to 8L),
      s"expected gapless versions 0..8, got ${versions.toSeq}")
    // no commit lost, no commit doubled: 2 base rows + exactly one row
    // per writer, and snapshot reads stay consistent after the storm
    val ids = Loaders.load(spark, p, "race8").df.collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids == (Seq(1L, 2L) ++ (100L until 108L)),
      s"row set diverged after race: $ids")
  }

  test("two racing overwrites never mix state: one table wins whole") {
    val sp = spark; import sp.implicits._
    val p = fresh("delta_ow_race")
    Writers.writeDeltaTable(df, "overwrite", p)
    // Version-preserving overwrites must NOT rebase past each other: a
    // loser either throws typed (its remove set was computed from a
    // snapshot the winner superseded) or the writers serialized — same-
    // driver overwrites do, on the swap lock — and the later one
    // replaced the earlier wholesale. Either way the invariant is
    // atomicity: the final table is EXACTLY one writer's rows, never a
    // blend, and every commit version is a complete consistent snapshot.
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      val futures = (0 until 2).map { i =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            gate.await()
            try Writers.writeDeltaTable(
              Seq((200L + i, s"ow$i", i.toDouble)).toDF("id", "name", "v"),
              "overwrite", p)
            catch { case e: Throwable => errors.add(e) }
          }
        })
      }
      gate.countDown()
      futures.foreach(_.get())
    } finally pool.shutdown()
    errors.forEach { e =>
      assert(e.isInstanceOf[graft.GraftError.WriteError] &&
        e.getMessage.contains("concurrent"),
        s"overwrite loser must fail typed, got: $e")
    }
    val ids = Loaders.load(spark, p, "owrace").df.collect()
      .map(_.getLong(0)).toSeq
    assert(ids == Seq(200L) || ids == Seq(201L),
      s"final table must be exactly one writer's rows, got $ids")
    // version-preserving: the create plus one commit per SUCCEEDED
    // overwrite — history intact, each version a whole table
    val versions = Files.list(Paths.get(p, "_delta_log")).toArray.map(_.toString)
      .filter(_.endsWith(".json"))
    assert(versions.length == 3 - errors.size,
      s"one commit per landed overwrite: ${versions.toSeq}")
    // time travel to the pre-race version still reads the ORIGINAL rows
    assert(DeltaLog.read(spark, p, versionAsOf = Some(0L)).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // and every intermediate version is a complete single-writer state
    (1L until (3 - errors.size).toLong).foreach { v =>
      val rows = DeltaLog.read(spark, p, versionAsOf = Some(v)).collect()
        .map(_.getLong(0)).toSeq
      assert(rows == Seq(200L) || rows == Seq(201L), s"v$v: $rows")
    }
  }

  test("delta append with a different partition spec is a PartitionError") {
    val sp = spark; import sp.implicits._
    val p = tmp("delta_part_guard")
    Writers.writeDeltaTable(df, "overwrite", p, partitionBy = Seq("name"))
    val e = intercept[graft.GraftError.PartitionError] {
      Writers.writeDeltaTable(Seq((9L, "z", 9.9)).toDF("id", "name", "v"),
        "append", p) // no partitionBy — would silently mix layouts
    }
    assert(e.getMessage.contains("name"))
    // matching spec still appends fine
    Writers.writeDeltaTable(Seq((9L, "z", 9.9)).toDF("id", "name", "v"),
      "append", p, partitionBy = Seq("name"))
    assert(Loaders.load(spark, p, "pg").df.count() == 3)
  }

  test("delta checkpoint bounds log replay: reads survive cleaned-up commits") {
    val sp = spark; import sp.implicits._
    val p = fresh("delta_checkpoint")
    def row(i: Long) = Seq((i, s"n$i", i * 1.0)).toDF("id", "name", "v")
    Writers.writeDeltaTable(row(0), "overwrite", p) // v0
    DeltaLog.write(row(1), "append", p, checkpointInterval = 2) // v1
    DeltaLog.write(row(2), "append", p, checkpointInterval = 2) // v2 → checkpoint
    val cp = Paths.get(p, "_delta_log", "0" * 19 + "2.checkpoint.parquet")
    assert(Files.isRegularFile(cp), "checkpoint parquet must exist at v2")
    assert(Files.readString(Paths.get(p, "_delta_log", "_last_checkpoint"))
      .contains("\"version\":2"))
    DeltaLog.write(row(3), "append", p, checkpointInterval = 2) // v3 after cp
    // clean up everything the checkpoint supersedes — per the protocol,
    // readers must reconstruct state from checkpoint + later commits only
    for (v <- 0 to 2)
      Files.delete(Paths.get(p, "_delta_log", ("0" * 19 + v.toString) + ".json"))
    val back = Loaders.load(spark, p, "cp_back").df
    assert(back.count() == 4, "snapshot must include checkpointed + later adds")
    assert(back.select("id").collect().map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L))
    // partition guard still works when only the checkpoint holds metaData
    DeltaLog.write(row(4), "append", p, checkpointInterval = 2) // v4 → checkpoint
    assert(Loaders.load(spark, p, "cp_back2").df.count() == 5)
  }

  test("delta append to a pre-delta parquet dir bootstraps instead of wiping") {
    val sp = spark; import sp.implicits._
    val p = tmp("delta_bootstrap")
    // legacy data written without any _delta_log
    df.write.mode("overwrite").parquet(p)
    Writers.writeDeltaTable(Seq((3L, "c", 3.5)).toDF("id", "name", "v"), "append", p)
    // the version-0 commit must cover BOTH the pre-existing and new files
    val back = Loaders.load(spark, p, "boot").df
    assert(back.count() == 3, "append must preserve pre-delta rows")
    assert(back.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // bootstrapping WITH partitioning over existing flat files would mix
    // layouts — rejected
    val p2 = tmp("delta_bootstrap_part")
    df.write.mode("overwrite").parquet(p2)
    intercept[graft.GraftError.PartitionError] {
      Writers.writeDeltaTable(Seq((3L, "c", 3.5)).toDF("id", "name", "v"),
        "append", p2, partitionBy = Seq("name"))
    }
  }

  test("delta snapshot reader ignores files not referenced by the log") {
    val sp = spark; import sp.implicits._
    val p = fresh("delta_orphan")
    Writers.writeDeltaTable(df, "overwrite", p)
    // an orphan parquet dropped into the dir (failed job debris) must be
    // invisible to the snapshot — this is what distinguishes a delta read
    // from a plain directory read
    Seq((99L, "zz", 9.9)).toDF("id", "name", "v")
      .write.mode("append").parquet(p)
    assert(spark.read.parquet(p).count() == 3)          // dir read sees it
    assert(Loaders.load(spark, p, "dsnap").df.count() == 2) // snapshot doesn't
  }
}
