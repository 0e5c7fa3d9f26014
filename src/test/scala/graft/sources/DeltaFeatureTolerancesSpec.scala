package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Round-20 delta-ecosystem tolerances: checkpointProtection (never
  * sweep/rewrite checkpoints below the protection boundary), collations
  * (annotations survive; predicate ops over collated columns refuse
  * typed), variantType (Spark 4 native VariantType round-trips through
  * our writer and reader), and icebergCompatV1/V2 (tolerated, DV
  * creation refused).
  */
class DeltaFeatureTolerancesSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/feat/$name"
    val pp = Paths.get(p)
    if (Files.exists(pp))
      Files.walk(pp).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    p
  }

  test("checkpointProtection: cleanup keeps everything below the boundary, " +
      "rewrite of a protected checkpoint refuses") {
    val sp = spark; import sp.implicits._
    val p = freshDir("cpprot")
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p,
      checkpointInterval = 0,
      tableProperties = Map(
        "delta.requireCheckpointProtectionBeforeVersion" -> "2"))   // v0
    DeltaLog.write(Seq((2L, "b")).toDF("id", "s"), "append", p,
      checkpointInterval = 0)                                       // v1
    DeltaLog.writeCheckpoint(spark, p, 1L) // protected (1 < 2)
    DeltaLog.write(Seq((3L, "c")).toDF("id", "s"), "append", p,
      checkpointInterval = 0)                                       // v2
    DeltaLog.writeCheckpoint(spark, p, 2L) // unprotected
    // rewriting the unprotected checkpoint is fine (while its commit
    // still exists); the protected one refuses below
    DeltaLog.writeCheckpoint(spark, p, 2L)
    // cleanup: v0/v1 commits and the v1 checkpoint are BELOW the
    // boundary — all must survive; the v2 commit folds normally
    DeltaLog.cleanupLog(spark, p)
    assert(Files.exists(Paths.get(p, "_delta_log", "0" * 20 + ".json")),
      "protected commit v0 must survive cleanup")
    assert(Files.exists(Paths.get(p, "_delta_log", "0" * 19 + "1.json")))
    assert(Files.exists(Paths.get(p, "_delta_log",
      "0" * 19 + "1.checkpoint.parquet")),
      "protected checkpoint must survive cleanup")
    assert(!Files.exists(Paths.get(p, "_delta_log", "0" * 19 + "2.json")),
      "the unprotected folded commit sweeps normally")
    // rewriting the protected checkpoint refuses typed
    val e = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.writeCheckpoint(spark, p, 1L)
    }
    assert(e.getMessage.contains("protect"), e.getMessage)
    // reads stay green through the protected log
    assert(DeltaLog.read(spark, p).count() == 3L)
    // a foreign table DECLARING the writer feature is tolerated
    val lines = Files.readAllLines(
      Paths.get(p, "_delta_log", "0" * 20 + ".json")).toArray.toSeq
      .map(_.toString)
    assert(lines.nonEmpty)
  }

  private def craftCollated(name: String): String = {
    val sp = spark; import sp.implicits._
    val p = freshDir(name)
    Seq((1L, "Alpha", "x"), (2L, "beta", "y")).toDF("id", "name", "tag")
      .coalesce(1).write.mode("overwrite").parquet(p)
    val file = Files.list(Paths.get(p)).toArray
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .find(n => n.startsWith("part-") && n.endsWith(".parquet")).get
    val size = Files.size(Paths.get(p, file))
    // `name` carries a non-default (case-insensitive ICU) collation
    val schema = """{\"type\":\"struct\",\"fields\":[""" +
      """{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},""" +
      """{\"name\":\"name\",\"type\":\"string\",\"nullable\":true,\"metadata\":{\"__COLLATIONS\":{\"name\":\"icu.UNICODE_CI\"}}},""" +
      """{\"name\":\"tag\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
    val log = Paths.get(p, "_delta_log")
    Files.createDirectories(log)
    Files.writeString(log.resolve("0" * 20 + ".json"), Seq(
      """{"commitInfo":{"operation":"WRITE"}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["collations-preview"],"writerFeatures":["collations-preview"]}}""",
      s"""{"metaData":{"id":"coll-x","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":[],"configuration":{}}}""",
      s"""{"add":{"path":"$file","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":true}}""")
      .mkString("", "\n", "\n"))
    p
  }

  test("collations: reads and appends work, annotations survive, " +
      "predicates over the collated column refuse") {
    val sp = spark; import sp.implicits._
    val p = craftCollated("collated")
    assert(DeltaLog.read(spark, p).count() == 2L)
    // append: no metaData refresh, annotations survive
    DeltaLog.write(Seq((3L, "Gamma", "z")).toDF("id", "name", "tag"),
      "append", p, checkpointInterval = 0)
    assert(DeltaLog.read(spark, p).count() == 3L)
    val meta = Files.readString(
      Paths.get(p, "_delta_log", "0" * 20 + ".json"))
    assert(meta.contains("__COLLATIONS"))
    // sanity: Spark's DataType.fromJson CONSUMES __COLLATIONS into a
    // collated StringType — that parsed TYPE is what the gate keys on
    // (a parse change here would silently disable the gate)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val ss = mapper.readTree(meta.linesIterator
      .find(_.contains("schemaString")).get)
      .get("metaData").get("schemaString").asText
    val parsed = org.apache.spark.sql.types.DataType.fromJson(ss)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(parsed("name").dataType != org.apache.spark.sql.types.StringType,
      s"expected a collated StringType, got ${parsed("name").dataType}")
    // and the ENGINE's read serves it as plain binary strings (bytes
    // verbatim, deterministic joins)
    assert(DeltaLog.read(spark, p).schema("name").dataType ==
      org.apache.spark.sql.types.StringType)
    // predicate over the COLLATED column: binary evaluation would be
    // wrong under UNICODE_CI — refuse typed
    val e = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.deleteWhere(spark, p, "name = 'alpha'")
    }
    assert(e.getMessage.contains("collation"), e.getMessage)
    intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.readWhere(spark, p, "name = 'alpha'")
    }
    intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.upsert(Seq((1L, "Alpha", "q")).toDF("id", "name", "tag"),
        Seq("name"), p)
    }
    // predicates that avoid it stay fully functional
    assert(DeltaLog.readWhere(spark, p, "tag = 'x'").count() == 1L)
    assert(DeltaLog.deleteWhere(spark, p, "id = 3") == 1)
    assert(DeltaLog.read(spark, p).count() == 2L)
  }

  test("variantType: our writer declares the feature, variant columns " +
      "round-trip, foreign variant tables read") {
    val sp = spark; import sp.implicits._
    val p = freshDir("variant")
    val df = Seq((1L, """{"a": 1, "b": "x"}"""),
        (2L, """{"a": 2, "b": "y"}"""))
      .toDF("id", "js")
      .select(col("id"), parse_json(col("js")).as("v"))
    DeltaLog.write(df, "overwrite", p, checkpointInterval = 0)
    val v0 = Files.readString(Paths.get(p, "_delta_log", "0" * 20 + ".json"))
    assert(v0.contains(""""variantType""""), v0)
    assert(v0.contains(""""minReaderVersion":3"""), v0)
    // append more variants
    DeltaLog.write(Seq((3L, """{"a": 3, "b": "z"}""")).toDF("id", "js")
      .select(col("id"), parse_json(col("js")).as("v")), "append", p,
      checkpointInterval = 0)
    val back = DeltaLog.read(spark, p)
    assert(back.schema("v").dataType ==
      org.apache.spark.sql.types.VariantType)
    val got = back.select(col("id"),
        expr("variant_get(v, '$.a', 'bigint')").as("a"),
        expr("variant_get(v, '$.b', 'string')").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted.toSeq
    assert(got == Seq((1L, 1L, "x"), (2L, 2L, "y"), (3L, 3L, "z")), got)
    // checkpoint + cleanup keep the variant table readable
    DeltaLog.writeCheckpoint(spark, p, 1L)
    DeltaLog.cleanupLog(spark, p)
    assert(DeltaLog.read(spark, p).count() == 3L)
    // deletes work (variant is just data to copy-on-write)
    assert(DeltaLog.deleteWhere(spark, p, "id = 2") == 1)
    assert(DeltaLog.read(spark, p).count() == 2L)
  }

  test("icebergCompat: tolerated for reads/appends, DV creation refuses") {
    val sp = spark; import sp.implicits._
    val p = freshDir("iceberg")
    DeltaLog.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      "overwrite", p, checkpointInterval = 0,
      tableProperties = Map(
        "delta.enableIcebergCompatV2" -> "true",
        "delta.enableDeletionVectors" -> "true"))
    DeltaLog.write(Seq((3L, "c")).toDF("id", "s"), "append", p,
      checkpointInterval = 0)
    assert(DeltaLog.read(spark, p).count() == 3L)
    val e = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.deleteWhereViaDv(spark, p, "id = 1")
    }
    assert(e.getMessage.contains("icebergCompat"), e.getMessage)
    // the copy-on-write route stays open
    assert(DeltaLog.deleteWhere(spark, p, "id = 1") == 1)
    assert(DeltaLog.read(spark, p).count() == 2L)
    // a foreign table DECLARING icebergCompatV1 as a writer feature is
    // tolerated by the capability gate (appends proceed)
    val pf = freshDir("iceberg_foreign")
    Seq((9L, "f")).toDF("id", "s").coalesce(1).write
      .mode("overwrite").parquet(pf)
    val file = Files.list(Paths.get(pf)).toArray
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .find(n => n.startsWith("part-") && n.endsWith(".parquet")).get
    val size = Files.size(Paths.get(pf, file))
    val schema = """{\"type\":\"struct\",\"fields\":[""" +
      """{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},""" +
      """{\"name\":\"s\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
    val log = Paths.get(pf, "_delta_log")
    Files.createDirectories(log)
    Files.writeString(log.resolve("0" * 20 + ".json"), Seq(
      """{"commitInfo":{"operation":"WRITE"}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["icebergCompatV1"]}}""",
      s"""{"metaData":{"id":"ice-x","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":[],"configuration":{"delta.enableIcebergCompatV1":"true"}}}""",
      s"""{"add":{"path":"$file","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":true}}""")
      .mkString("", "\n", "\n"))
    DeltaLog.write(Seq((10L, "g")).toDF("id", "s"), "append", pf,
      checkpointInterval = 0)
    assert(DeltaLog.read(spark, pf).count() == 2L)
  }
}
