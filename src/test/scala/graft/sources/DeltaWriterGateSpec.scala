package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Writer-protocol fidelity gate: mutating a table whose declared writer
  * features this engine cannot maintain would CORRUPT it for the table's
  * other readers/writers — rewriting files on a row-tracking table
  * without preserving row ids, removing rows on a change-data-feed table
  * without emitting cdc actions, appending to generated/identity columns
  * without evaluating their expressions, or committing under an unknown
  * future writer version. All of those refuse typed, mirroring the read
  * path's reader-capability guard; listed-but-INACTIVE conditional
  * features impose no obligation (delta-spark's rule) and stay writable.
  */
class DeltaWriterGateSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/writergate/$name"
    val pp = Paths.get(p)
    if (Files.exists(pp))
      Files.walk(pp).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    p
  }

  /** Foreign single-commit table: one parquet file staged by Spark, a
    * handcrafted version-0 commit with the given protocol line,
    * configuration map, and optional per-field schema metadata.
    */
  private def foreign(name: String, protocol: String,
      configuration: Map[String, String] = Map.empty,
      idFieldMetadata: Map[String, String] = Map.empty): String = {
    val sp = spark; import sp.implicits._
    val p = freshDir(name)
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1)
      .write.mode("overwrite").parquet(p)
    val dataFile = {
      var found: String = null
      Files.list(Paths.get(p)).forEach { f =>
        val n = f.getFileName.toString
        if (n.startsWith("part-") && n.endsWith(".parquet")) found = n
      }
      require(found != null, "no staged parquet"); found
    }
    val size = Files.size(Paths.get(p, dataFile))
    val meta = idFieldMetadata.map { case (k, v) =>
      s""""$k":"$v"""" }.mkString("{", ",", "}")
    val schemaJson = (s"""{"type":"struct","fields":[""" +
      s"""{"name":"id","type":"long","nullable":true,"metadata":$meta},""" +
      s"""{"name":"s","type":"string","nullable":true,"metadata":{}}]}""")
      .replace("\\", "\\\\").replace("\"", "\\\"")
    val conf = configuration.map { case (k, v) =>
      s""""$k":"$v"""" }.mkString("{", ",", "}")
    val log = Paths.get(p, "_delta_log")
    Files.createDirectories(log)
    val actions = Seq(
      protocol,
      s"""{"metaData":{"id":"gate-$name","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":$conf}}""",
      s"""{"add":{"path":"$dataFile","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":true}}""")
    Files.writeString(log.resolve("0" * 20 + ".json"),
      actions.mkString("", "\n", "\n"))
    p
  }

  private def append(p: String): Unit = {
    val sp = spark; import sp.implicits._
    DeltaLog.write(Seq((9L, "z")).toDF("id", "s"), "append", p)
  }

  private def refused(body: => Any): String =
    intercept[graft.GraftError.InvalidOperation](body).getMessage

  test("unknown future writer version refuses every mutation") {
    val p = foreign("v8",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":8}}""")
    assert(refused(append(p)).contains("minWriterVersion 8"))
    assert(refused(DeltaLog.deleteWhere(spark, p, "id = 1"))
      .contains("minWriterVersion 8"))
    assert(refused(DeltaLog.optimize(spark, p))
      .contains("minWriterVersion 8"))
    assert(refused(DeltaLog.vacuum(spark, p))
      .contains("minWriterVersion 8"))
    assert(DeltaLog.read(spark, p).count() == 2L, "reads stay available")
  }

  test("v7 unknown writerFeatures refuse; supported subset writes fine") {
    val bad = foreign("v7unknown",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["futureFeatureX","appendOnly"]}}""")
    assert(refused(append(bad)).contains("futureFeatureX"))
    val ok = foreign("v7supported",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["appendOnly","invariants","checkConstraints","deletionVectors"]}}""")
    append(ok)
    assert(DeltaLog.read(spark, ok).count() == 3L)
  }

  test("rowTracking: appends mint ids; rewrites without materialized names refuse") {
    val inactive = foreign("rtInactive",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["rowTracking"]}}""")
    append(inactive)
    assert(DeltaLog.read(spark, inactive).count() == 3L)
    // ACTIVE row tracking declared WITHOUT domainMetadata is malformed
    // (the protocol makes rowTracking depend on it — our high-water
    // mark emission would be protocol-violating): typed refusal
    val malformed = foreign("rtNoDomain",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["rowTracking"]}}""",
      configuration = Map("delta.enableRowTracking" -> "true"))
    assert(refused(append(malformed)).contains("domainMetadata"))
    // ACTIVE row tracking with the dependency declared: appends are
    // handled (fresh base row ids + the domainMetadata high-water mark
    // ride the commit)
    val active = foreign("rtActive",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["rowTracking","domainMetadata"]}}""",
      configuration = Map("delta.enableRowTracking" -> "true"))
    append(active)
    val v1 = Files.readString(
      Paths.get(active, "_delta_log", "0" * 19 + "1.json"))
    assert(v1.contains(""""baseRowId":"""), "append must mint base row ids")
    assert(v1.contains("rowIdHighWaterMark"), "append must advance the hwm")
    // rewrites need the materialized columns to preserve ids — this
    // foreign enablement never declared their names, so refuse typed
    // (DeltaRowTrackingSpec covers the preserving path on our tables)
    val sp = spark; import sp.implicits._
    assert(refused(DeltaLog.upsert(Seq((1L, "A")).toDF("id", "s"),
      Seq("id"), active)).contains("materialized"))
    assert(refused(DeltaLog.optimize(spark, active)).contains("materialized"))
  }

  test("change data feed: appends, cdc-emitting mutations and overwrite all honor the feed") {
    val sp = spark; import sp.implicits._
    val p = foreign("cdf",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    // CDF derives appends from add actions alone — allowed
    append(p)
    assert(DeltaLog.read(spark, p).count() == 3L)
    // deletes/upserts EMIT _change_data + cdc actions (DeltaCdfSpec pins
    // the feed contents) — allowed and correct
    assert(DeltaLog.deleteWhere(spark, p, "id = 1") == 1)
    DeltaLog.upsert(Seq((2L, "y")).toDF("id", "s"), Seq("id"), p)
    assert(DeltaLog.read(spark, p).count() == 2L)
    // overwrite is version-preserving: whole-file removes + adds serve
    // the feed exactly (delta-spark's overwrite emits no cdc either) —
    // allowed, and the boundary reads back as delete-all + insert
    val preV = DeltaLog.history(spark, p).head._1
    DeltaLog.write(Seq((5L, "w")).toDF("id", "s"), "overwrite", p)
    val ow = DeltaLog.readChanges(spark, p, preV, preV + 1)
      .select("_change_type", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ow == Set(("delete", 2L), ("delete", 9L), ("insert", 5L)),
      s"$ow")
    // dataChange=false restage carries no row delta — allowed
    DeltaLog.optimize(spark, p)
    assert(DeltaLog.read(spark, p).count() == 1L)
  }

  test("generated columns compute when absent, validate when supplied") {
    val sp = spark; import sp.implicits._
    // id GENERATED ALWAYS AS (length(s) + 1)
    val gen = foreign("generated",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
      idFieldMetadata = Map("delta.generationExpression" -> "length(s) + 1"))
    // supplied value 9 != length("z")+1 = 2 → rejected row-exactly
    val err = intercept[graft.GraftError.ConstraintViolation](append(gen))
    assert(err.getMessage.contains("GENERATED column id"))
    assert(DeltaLog.read(spark, gen).count() == 2L)
    // a frame WITHOUT the generated column gets it computed on write
    DeltaLog.write(Seq("zz").toDF("s"), "append", gen)
    val computed = DeltaLog.read(spark, gen).where("s = 'zz'")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(computed == Seq(3L), s"computed generated value: $computed")
    // supplied-and-CORRECT passes
    DeltaLog.write(Seq((4L, "abc")).toDF("id", "s"), "append", gen)
    assert(DeltaLog.read(spark, gen).count() == 4L)
    // upsert changesets compute absent generated columns too
    DeltaLog.upsert(Seq("wxyz").toDF("s"), Seq("s"), gen)
    assert(DeltaLog.read(spark, gen).where("s = 'wxyz'")
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(5L))
    // ...and validate supplied ones
    intercept[graft.GraftError.ConstraintViolation] {
      DeltaLog.upsert(Seq((99L, "wxyz")).toDF("id", "s"), Seq("s"), gen)
    }
  }

  test("liquid-clustered + vacuumProtocolCheck tables mutate; clustering domain survives checkpoints") {
    val sp = spark; import sp.implicits._
    val p = freshDir("clustered")
    // synthesize a foreign liquid-clustered table: v7/r3 with clustering,
    // vacuumProtocolCheck and domainMetadata, plus the delta.clustering
    // domain carrying the clustering columns — the shape delta-spark
    // 3.x+ writes by default recommendation
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1)
      .write.mode("overwrite").parquet(p)
    val dataFile = Files.list(Paths.get(p)).toArray
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .find(n => n.startsWith("part-") && n.endsWith(".parquet")).get
    val size = Files.size(Paths.get(p, dataFile))
    val log = Paths.get(p, "_delta_log")
    Files.createDirectories(log)
    Files.writeString(log.resolve("0" * 20 + ".json"), Seq(
      """{"commitInfo":{"operation":"WRITE"}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["vacuumProtocolCheck"],"writerFeatures":["clustering","domainMetadata","vacuumProtocolCheck"]}}""",
      """{"metaData":{"id":"clustered-x","format":{"provider":"parquet","options":{}},"schemaString":"{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"s\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}","partitionColumns":[],"configuration":{}}}""",
      """{"domainMetadata":{"domain":"delta.clustering","configuration":"{\"clusteringColumns\":[[\"id\"]]}","removed":false}}""",
      s"""{"add":{"path":"$dataFile","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":true}}""")
      .mkString("", "\n", "\n"))
    // clustering is BEST-EFFORT per the protocol: unclustered adds are
    // legal, so append/upsert/delete must all work — not refuse
    DeltaLog.write(Seq((9L, "z")).toDF("id", "s"), "append", p)
    DeltaLog.upsert(Seq((2L, "up")).toDF("id", "s"), Seq("id"), p)
    assert(DeltaLog.deleteWhere(spark, p, "id = 1") == 1)
    assert(DeltaLog.read(spark, p).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 9L))
    // the clustering domain SURVIVES checkpoint + cleanup (fold keeps the
    // newest live action per domain)
    DeltaLog.writeCheckpoint(spark, p, 3L)
    DeltaLog.cleanupLog(spark, p)
    val cp = spark.read.parquet(
      Paths.get(p, "_delta_log", "0" * 19 + "3.checkpoint.parquet").toString)
    val domains = cp.where(org.apache.spark.sql.functions.col(
        "domainMetadata").isNotNull)
      .select("domainMetadata.domain").collect().map(_.getString(0)).toSet
    assert(domains.contains("delta.clustering"),
      s"clustering domain must survive the fold: $domains")
    assert(DeltaLog.read(spark, p).count() == 2L)
    // vacuumProtocolCheck: vacuum runs (the capability gate IS the check)
    assert(DeltaLog.vacuum(spark, p).isEmpty) // within retention
    assert(DeltaLog.vacuum(spark, p, retentionMs = 0L).nonEmpty)
    assert(DeltaLog.read(spark, p).count() == 2L)
    // OPTIMIZE with no explicit columns CLUSTERS on the table's declared
    // clustering columns (delta-spark's clustered-OPTIMIZE): shuffled
    // appends make per-file id stats useless, the re-cluster makes them
    // selective again
    DeltaLog.write(
      (100L until 4100L).map(i => (i, s"name-$i-" + "x" * 40))
        .toDF("id", "s").repartition(4), "append", p)
    // the 4 shuffled append files all span ~the full 100..4100 range, so
    // every one of them survives an id probe pre-optimize
    val (keptBefore, totalBefore) =
      DeltaLog.skippingStats(spark, p, "id = 2000")
    assert(keptBefore >= 4,
      s"shuffled append files cannot prune: $keptBefore/$totalBefore")
    assert(DeltaLog.optimize(spark, p, targetBytes = 16L * 1024) > 0)
    val (kept, total) = DeltaLog.skippingStats(spark, p, "id = 2000")
    assert(total > 1 && kept == 1,
      s"auto-clustered optimize must make id stats selective: $kept/$total")
    assert(DeltaLog.read(spark, p).count() == 4002L)
  }

  test("gate resolves the protocol from a foreign checkpoint-only log") {
    val sp = spark; import sp.implicits._
    // the capability walk is bounded to POST-checkpoint commits; a
    // restrictive protocol visible ONLY through a checkpoint (foreign
    // writer checkpointed, then cleaned its commits) must still gate.
    // Built foreign-shaped by hand — our own writeCheckpoint refuses
    // on such tables (see below), exactly because its fold drops the
    // actions the feature depends on.
    val p = freshDir("cpgate")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1)
      .write.mode("overwrite").parquet(p)
    val dataFile = {
      var f: String = null
      Files.list(Paths.get(p)).forEach { x =>
        val n = x.getFileName.toString
        if (n.startsWith("part-") && n.endsWith(".parquet")) f = n
      }
      f
    }
    val size = Files.size(Paths.get(p, dataFile))
    val log = Paths.get(p, "_delta_log")
    Files.createDirectories(log)
    val cpRows = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["futureFeatureX"]}}""",
      s"""{"metaData":{"id":"cpgate","format":{"provider":"parquet","options":{}},"schemaString":"{\\"type\\":\\"struct\\",\\"fields\\":[{\\"name\\":\\"id\\",\\"type\\":\\"long\\",\\"nullable\\":true,\\"metadata\\":{}},{\\"name\\":\\"s\\",\\"type\\":\\"string\\",\\"nullable\\":true,\\"metadata\\":{}}]}","partitionColumns":[],"configuration":{}}}""",
      s"""{"add":{"path":"$dataFile","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":true}}""")
    val cpStage = s"$p/_cp_stage"
    sp.read.json(sp.createDataset(cpRows)).coalesce(1)
      .write.mode("overwrite").parquet(cpStage)
    val cpPart = {
      var f: String = null
      Files.list(Paths.get(cpStage)).forEach { x =>
        val n = x.getFileName.toString
        if (n.startsWith("part-") && n.endsWith(".parquet")) f = n
      }
      f
    }
    Files.move(Paths.get(cpStage, cpPart),
      log.resolve("0" * 20 + ".checkpoint.parquet"))
    Files.writeString(log.resolve("_last_checkpoint"), """{"version":0}""")
    assert(!Files.exists(log.resolve("0" * 20 + ".json")),
      "fixture is checkpoint-only — no commit json carries the protocol")
    assert(refused(append(p)).contains("futureFeatureX"))
    assert(DeltaLog.read(spark, p).count() == 2L)
  }

  test("checkpoint and log cleanup refuse on unmaintainable writer features") {
    // the checkpoint fold keeps add/metaData/protocol/txn/domainMetadata
    // rows — an UNKNOWN v7 feature may hang state off action kinds the
    // fold doesn't carry, and cleanupLog would delete the commits
    // holding it (row-tracked tables checkpoint fine since the fold
    // carries domainMetadata — DeltaRowTrackingSpec pins that)
    val p = foreign("cpRefuse",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["futureFeatureX"]}}""")
    assert(refused(DeltaLog.writeCheckpoint(spark, p, 0L))
      .contains("futureFeatureX"))
    assert(refused(DeltaLog.cleanupLog(spark, p)).contains("futureFeatureX"))
    assert(DeltaLog.read(spark, p).count() == 2L)
  }

  test("generated columns validate the CREATING write too") {
    val sp = spark; import sp.implicits._
    val p = freshDir("gencreate")
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("delta.generationExpression", "id * 2").build()
    // garbage initial values: the created table would declare an
    // invariant (and minWriterVersion 4) that never held
    val err = intercept[graft.GraftError.ConstraintViolation] {
      DeltaLog.write(
        Seq((1L, 99L)).toDF("id", "k2")
          .select(org.apache.spark.sql.functions.col("id"),
            org.apache.spark.sql.functions.col("k2").as("k2", meta)),
        "overwrite", p)
    }
    assert(err.getMessage.contains("GENERATED column k2"))
    assert(!Files.exists(Paths.get(p, "_delta_log")), "no table committed")
    DeltaLog.write(
      Seq((1L, 2L)).toDF("id", "k2")
        .select(org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("k2").as("k2", meta)),
      "overwrite", p)
    assert(DeltaLog.read(spark, p).count() == 1L)
  }

  test("identity columns: ALWAYS refuses supplied values, omitted get assigned") {
    val sp = spark; import sp.implicits._
    val ident = foreign("identity",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":6}}""",
      idFieldMetadata = Map("delta.identity.start" -> "100"))
    // the frame SUPPLIES id but the column is GENERATED ALWAYS (no
    // allowExplicitInsert) → typed refusal
    assert(refused(append(ident)).contains("GENERATED ALWAYS"))
    // omitted → the writer assigns from start (no high-water mark yet)
    // and records the new mark; the next append continues the sequence
    DeltaLog.write(Seq("q").toDF("s"), "append", ident)
    DeltaLog.write(Seq("r").toDF("s"), "append", ident)
    val got = DeltaLog.read(spark, ident).where("s IN ('q','r')")
      .select("s", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("q" -> 100L, "r" -> 101L), s"$got")
    // row-removing paths stay available
    assert(DeltaLog.deleteWhere(spark, ident, "id = 1") == 1)
    assert(DeltaLog.read(spark, ident).count() == 3L)
  }
}
