package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions.col

/** typeWidening reader feature (delta 4.x): a foreign table may declare
  * a WIDENED schema type (int→long, float→double, decimal growth) while
  * files written before the widening keep the narrower physical type.
  * The declared-schema scan must upcast those files — Spark 4's
  * vectorized parquet reader supports the protocol's legal widenings
  * natively, so whitelisting the feature suffices; this spec pins that
  * assumption against the actual reader.
  */
class DeltaTypeWideningSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/typewiden/$name"
    val pp = Paths.get(p)
    if (Files.exists(pp))
      Files.walk(pp).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    p
  }

  test("foreign table with widened int->long and float->double reads green") {
    val sp = spark; import sp.implicits._
    val p = freshDir("widened")
    // the OLD file: written before the widening — int32 / float physical
    Seq((1, 1.5f), (2, 2.5f)).toDF("i", "f").coalesce(1)
      .write.mode("overwrite").parquet(p)
    val oldFile = Files.list(Paths.get(p)).toArray
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .find(n => n.startsWith("part-") && n.endsWith(".parquet")).get
    val oldSize = Files.size(Paths.get(p, oldFile))
    // the NEW file: written after — long / double physical
    val post = freshDir("widened_post")
    Seq((3L, 3.5d)).toDF("i", "f").coalesce(1)
      .write.mode("overwrite").parquet(post)
    val newName = Files.list(Paths.get(post)).toArray
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .find(n => n.startsWith("part-") && n.endsWith(".parquet")).get
    Files.copy(Paths.get(post, newName), Paths.get(p, newName))
    val newSize = Files.size(Paths.get(p, newName))
    // schemaString declares the WIDE types + the typeChanges metadata
    // delta-spark records on widened fields
    val schema = """{\"type\":\"struct\",\"fields\":[""" +
      """{\"name\":\"i\",\"type\":\"long\",\"nullable\":true,\"metadata\":{\"delta.typeChanges\":[{\"fromType\":\"integer\",\"toType\":\"long\"}]}},""" +
      """{\"name\":\"f\",\"type\":\"double\",\"nullable\":true,\"metadata\":{\"delta.typeChanges\":[{\"fromType\":\"float\",\"toType\":\"double\"}]}}]}"""
    val log = Paths.get(p, "_delta_log")
    Files.createDirectories(log)
    Files.writeString(log.resolve("0" * 20 + ".json"), Seq(
      """{"commitInfo":{"operation":"WRITE"}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["typeWidening"],"writerFeatures":["typeWidening"]}}""",
      s"""{"metaData":{"id":"tw-x","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":[],"configuration":{}}}""",
      s"""{"add":{"path":"$oldFile","partitionValues":{},"size":$oldSize,"modificationTime":0,"dataChange":true}}""",
      s"""{"add":{"path":"$newName","partitionValues":{},"size":$newSize,"modificationTime":0,"dataChange":true}}""")
      .mkString("", "\n", "\n"))
    val df = DeltaLog.read(spark, p)
    assert(df.schema("i").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(df.schema("f").dataType ==
      org.apache.spark.sql.types.DoubleType)
    val rows = df.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(rows.toSeq == Seq((1L, 1.5d), (2L, 2.5d), (3L, 3.5d)),
      s"${rows.toSeq}")
    // predicate reads work across the physical-type boundary too
    assert(DeltaLog.readWhere(spark, p, "i >= 2").count() == 2L)
  }

  test("appends and rewrites on a typeWidening table work (writer has no obligation)") {
    val sp = spark; import sp.implicits._
    val p = freshDir("writes")
    Seq((1, 9.5f)).toDF("i", "f").coalesce(1)
      .write.mode("overwrite").parquet(p)
    val f = Files.list(Paths.get(p)).toArray
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .find(n => n.startsWith("part-") && n.endsWith(".parquet")).get
    val size = Files.size(Paths.get(p, f))
    val schema = """{\"type\":\"struct\",\"fields\":[""" +
      """{\"name\":\"i\",\"type\":\"long\",\"nullable\":true,\"metadata\":{\"delta.typeChanges\":[{\"fromType\":\"integer\",\"toType\":\"long\"}]}},""" +
      """{\"name\":\"f\",\"type\":\"double\",\"nullable\":true,\"metadata\":{\"delta.typeChanges\":[{\"fromType\":\"float\",\"toType\":\"double\"}]}}]}"""
    val log = Paths.get(p, "_delta_log")
    Files.createDirectories(log)
    Files.writeString(log.resolve("0" * 20 + ".json"), Seq(
      """{"commitInfo":{"operation":"WRITE"}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["typeWidening"],"writerFeatures":["typeWidening"]}}""",
      s"""{"metaData":{"id":"tw-w","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":[],"configuration":{}}}""",
      s"""{"add":{"path":"$f","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":true}}""")
      .mkString("", "\n", "\n"))
    // writer obligation = record typeChanges WHEN CHANGING a type; this
    // writer never changes types, so mutations must not refuse
    DeltaLog.write(Seq((2L, 2.5d)).toDF("i", "f"), "append", p)
    assert(DeltaLog.deleteWhere(spark, p, "i = 1") == 1)
    val rows = DeltaLog.read(spark, p).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((2L, 2.5d)), s"$rows")
  }

  test("we WIDEN: an enableTypeWidening table accepts wider appends, " +
      "records delta.typeChanges, old files upcast") {
    val sp = spark; import sp.implicits._
    val p = freshDir("wewiden")
    // created int/float with the property: protocol declares the
    // feature on BOTH sides (files may go narrow-physical at any point)
    DeltaLog.write(Seq((1, 1.5f), (2, 2.5f)).toDF("i", "f"),
      "overwrite", p, checkpointInterval = 0,
      tableProperties = Map("delta.enableTypeWidening" -> "true"))
    val v0 = Files.readString(Paths.get(p, "_delta_log", "0" * 20 + ".json"))
    assert(v0.contains(""""typeWidening"""") &&
      v0.contains(""""minReaderVersion":3"""), v0.linesIterator
        .find(_.contains("protocol")).getOrElse(""))
    // the widening append: long / double frame
    DeltaLog.write(Seq((3L, 3.5d)).toDF("i", "f"), "append", p,
      checkpointInterval = 0)
    // the append commit refreshed metaData with the WIDENED schema and
    // the protocol's delta.typeChanges record on each widened field
    val v1 = Files.readString(Paths.get(p, "_delta_log", "0" * 19 + "1.json"))
    assert(v1.contains("delta.typeChanges"), v1)
    def hasChange(from: String, to: String): Boolean =
      v1.contains(s"""\\"fromType\\":\\"$from\\"""") &&
        v1.contains(s"""\\"toType\\":\\"$to\\"""")
    assert(hasChange("integer", "long"), v1)
    assert(hasChange("float", "double"), v1)
    // reads: wide declared schema, old narrow-physical file upcast
    val df = DeltaLog.read(spark, p)
    assert(df.schema("i").dataType == org.apache.spark.sql.types.LongType)
    assert(df.schema("f").dataType == org.apache.spark.sql.types.DoubleType)
    assert(df.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
      .toSeq == Seq((1L, 1.5d), (2L, 2.5d), (3L, 3.5d)))
    // a SECOND widening of another kind on the same table: decimal growth
    val pd = freshDir("wewiden_dec")
    DeltaLog.write(Seq((1, java.math.BigDecimal.valueOf(12.34)),
        (2, java.math.BigDecimal.valueOf(56.78)))
      .toDF("k", "amt")
      .select(col("k"), col("amt").cast("decimal(6,2)").as("amt")),
      "overwrite", pd, checkpointInterval = 0,
      tableProperties = Map("delta.enableTypeWidening" -> "true"))
    DeltaLog.write(Seq((3, java.math.BigDecimal.valueOf(90.12)))
      .toDF("k", "amt")
      .select(col("k"), col("amt").cast("decimal(12,4)").as("amt")),
      "append", pd, checkpointInterval = 0)
    val dd = DeltaLog.read(spark, pd)
    assert(dd.schema("amt").dataType ==
      org.apache.spark.sql.types.DecimalType(12, 4))
    assert(dd.count() == 3L)
    // date → timestampNtz
    val pt = freshDir("wewiden_ts")
    DeltaLog.write(Seq((1, java.sql.Date.valueOf("2024-03-01")))
      .toDF("k", "d"), "overwrite", pt, checkpointInterval = 0,
      tableProperties = Map("delta.enableTypeWidening" -> "true"))
    DeltaLog.write(
      Seq((2, java.time.LocalDateTime.of(2024, 3, 2, 10, 30)))
        .toDF("k", "d"), "append", pt, checkpointInterval = 0)
    val dt = DeltaLog.read(spark, pt)
    assert(dt.schema("d").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    assert(dt.count() == 2L)
    // WITHOUT the property the same append still refuses typed
    val pn = freshDir("nowiden")
    DeltaLog.write(Seq((1, 1.5f)).toDF("i", "f"), "overwrite", pn,
      checkpointInterval = 0)
    val e = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.write(Seq((2L, 2.5d)).toDF("i", "f"), "append", pn)
    }
    assert(e.getMessage.contains("enableTypeWidening"), e.getMessage)
    // a NARROWER frame is a legal write with or without the property —
    // its file upcasts at scan exactly like a pre-widening file
    val px = freshDir("narrow")
    DeltaLog.write(Seq((1L, 1.5d)).toDF("i", "f"), "overwrite", px,
      checkpointInterval = 0,
      tableProperties = Map("delta.enableTypeWidening" -> "true"))
    DeltaLog.write(Seq((2, 2.5f)).toDF("i", "f"), "append", px)
    assert(DeltaLog.read(spark, px).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq ==
      Seq((1L, 1.5d), (2L, 2.5d)))
    // a genuinely INCOMPATIBLE type refuses even WITH the property
    val pi = freshDir("incompat")
    DeltaLog.write(Seq((1L, "a")).toDF("i", "s"), "overwrite", pi,
      checkpointInterval = 0,
      tableProperties = Map("delta.enableTypeWidening" -> "true"))
    val ei = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.write(Seq((2L, 9.9d)).toDF("i", "s"), "append", pi)
    }
    assert(ei.getMessage.contains("'s'"), ei.getMessage)
  }

  test("typeWidening-preview spelling is accepted too") {
    val sp = spark; import sp.implicits._
    val p = freshDir("preview")
    Seq((7, "x")).toDF("i", "s").coalesce(1)
      .write.mode("overwrite").parquet(p)
    val f = Files.list(Paths.get(p)).toArray
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .find(n => n.startsWith("part-") && n.endsWith(".parquet")).get
    val size = Files.size(Paths.get(p, f))
    val schema = """{\"type\":\"struct\",\"fields\":[""" +
      """{\"name\":\"i\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},""" +
      """{\"name\":\"s\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
    val log = Paths.get(p, "_delta_log")
    Files.createDirectories(log)
    Files.writeString(log.resolve("0" * 20 + ".json"), Seq(
      """{"commitInfo":{"operation":"WRITE"}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["typeWidening-preview"],"writerFeatures":["typeWidening-preview"]}}""",
      s"""{"metaData":{"id":"tw-p","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":[],"configuration":{}}}""",
      s"""{"add":{"path":"$f","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":true}}""")
      .mkString("", "\n", "\n"))
    assert(DeltaLog.read(spark, p).collect().map(_.getLong(0)).toSeq ==
      Seq(7L))
  }
}
