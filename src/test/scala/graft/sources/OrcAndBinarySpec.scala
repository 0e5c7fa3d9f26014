package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class OrcAndBinarySpec extends SparkSpec {

  private def tmp(name: String): String = {
    val dir = Paths.get("target/tmp/orcbin")
    Files.createDirectories(dir)
    dir.resolve(name).toString
  }

  private lazy val df = {
    val sp = spark; import sp.implicits._
    Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
  }

  test("single-file orc roundtrip: ONE file at the exact path, values intact") {
    val p = tmp("out.orc")
    Writers.writeOrcSingle(df, "overwrite", p)
    assert(Files.isRegularFile(Paths.get(p)))
    val back = Loaders.loadOrc(spark, p, "rt").df
    assert(back.count() == 2)
    assert(back.schema("id").dataType.typeName == "long")
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
  }

  test("orc append rewrites with union; refuses mismatched columns") {
    val sp = spark; import sp.implicits._
    val p = tmp("app.orc")
    Writers.writeOrcSingle(df, "overwrite", p)
    Writers.writeOrcSingle(Seq((3L, "c", 3.5)).toDF("id", "name", "v"), "append", p)
    assert(spark.read.orc(p).count() == 3)
    val e = intercept[graft.GraftError.WriteError] {
      Writers.writeOrcSingle(Seq((1L, "x")).toDF("id", "other"), "append", p)
    }
    assert(e.getMessage.contains("column mismatch"))
  }

  test("orc timestamp columns round-trip to TimestampType with exact micros") {
    val sp = spark; import sp.implicits._
    val ts = Timestamp.valueOf("2024-03-01 12:34:56.123456")
    val p = tmp("ts.orc")
    Writers.writeOrcSingle(Seq((1L, ts)).toDF("id", "ts"), "overwrite", p)
    val back = Loaders.loadOrc(spark, p, "rt").df
    assert(back.schema("ts").dataType.typeName == "timestamp")
    val micros = back.select(unix_micros(col("ts"))).collect()(0).getLong(0)
    assert(micros == ts.getTime / 1000 * 1000000L + ts.getNanos / 1000)
  }

  test("extension dispatch routes .orc through load()") {
    val p = tmp("disp.orc")
    Writers.writeOrcSingle(df, "overwrite", p)
    assert(Loaders.load(spark, p, "disp").df.count() == 2)
  }

  test("orc scan gets predicate pushdown and column pruning") {
    val p = tmp("push.orc")
    Writers.writeOrcSingle(df, "overwrite", p)
    val q = Loaders.loadOrc(spark, p, "rt").df.where(col("id") === 1L).select("name")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,1)]"),
      s"no pushdown in:\n$plan")
    assert(!plan.contains("ReadSchema: struct<id:bigint,name:string,v:double>"),
      "projection not pruned to the selected columns")
  }

  test("binary folder load: distributed listing, glob pruning, real bytes") {
    val dir = Paths.get(tmp("blobs"))
    Files.createDirectories(dir)
    val payload = Array[Byte](1, 2, 3, 4, 5)
    Files.write(dir.resolve("a_1.bin"), payload)
    Files.write(dir.resolve("a_2.bin"), Array[Byte](9))
    Files.write(dir.resolve("skip.txt"), Array[Byte](0, 0))
    val all = Loaders.loadBinaryFolder(spark, dir.toString, "m").df
    assert(all.count() == 3)
    assert(all.columns.toSeq == Seq("file_name", "path", "length", "content"))
    val bins = Loaders.loadBinaryFolder(spark, dir.toString, "m", "*.bin").df
    assert(bins.count() == 2)
    val row = bins.where(col("file_name") === "a_1.bin").collect()(0)
    assert(row.getAs[Long]("length") == 5L)
    assert(row.getAs[Array[Byte]]("content").toSeq == payload.toSeq)
  }

  test("text lines loader reads plain and gzip'd shards transparently") {
    val dir = Paths.get(tmp("txt"))
    Files.createDirectories(dir)
    Files.write(dir.resolve("a.txt"), "one\ntwo\n".getBytes("UTF-8"))
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("b.txt.gz")))
    gz.write("three\nfour\nfive\n".getBytes("UTF-8")); gz.close()
    val lines = Loaders.loadTextLines(spark, dir.toString, "t").df
    assert(lines.count() == 5)
    assert(lines.columns.toSeq == Seq("file_name", "line"))
    assert(lines.where(col("file_name") === "b.txt.gz").count() == 3)
    assert(lines.select("line").collect().map(_.getString(0)).toSet ==
      Set("one", "two", "three", "four", "five"))
  }

  test("whole-file text docs arrive byte-exact including unicode") {
    val dir = Paths.get(tmp("docs"))
    Files.createDirectories(dir)
    val body = "héllo — №42\nsecond líne\n"
    Files.write(dir.resolve("d1.txt"), body.getBytes("UTF-8"))
    Files.write(dir.resolve("skip.csv"), "x\n".getBytes("UTF-8"))
    val docs = Loaders.loadTextDocs(spark, dir.toString, "t", "*.txt").df
    assert(docs.count() == 1)
    val row = docs.collect()(0)
    assert(row.getString(0) == "d1.txt")
    assert(row.getString(1) == body)
  }

  test("sharded jsonl.gz roundtrips through the text-lines loader") {
    val sp = spark; import sp.implicits._
    val p = tmp("jsonl_out")
    val corpus = (1 to 100).map(i => (i.toLong, s"doc $i")).toDF("id", "text")
    Writers.writeJsonlDir(corpus, "overwrite", p, numShards = 4)
    val shards = Files.list(Paths.get(p)).filter(_.getFileName.toString
      .matches("part-.*\\.json\\.gz")).count()
    assert(shards == 4, s"expected 4 gz shards, got $shards")
    // gz shards re-ingest transparently, one JSON record per line
    val lines = Loaders.loadTextLines(spark, p, "t").df
      .where(col("line").startsWith("{"))
    assert(lines.count() == 100)
    assert(spark.read.json(p).count() == 100)
  }

  test("text export writes one value per line and re-ingests") {
    val sp = spark; import sp.implicits._
    val p = tmp("txt_out")
    val corpus = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
    Writers.writeTextDir(corpus, "text", "overwrite", p)
    val back = Loaders.loadTextLines(spark, p, "t").df
      .select("line").collect().map(_.getString(0)).toSet
    assert(back == Set("alpha", "beta"))
  }

  test("binary folder feeds the real audio decode end-to-end") {
    val dir = Paths.get(tmp("wavs"))
    Files.createDirectories(dir)
    Files.write(dir.resolve("clip_3.wav"),
      graft.operators.Multimodal.constWavBytes(2, 16000, 40, -77))
    val bin = Loaders.loadBinaryFolder(spark, dir.toString, "m", "*.wav").df
      .select(lit(3L).as("media_id"), col("content").as("payload"))
    val out = graft.operators.Multimodal.decodeAudioStats(bin).collect()(0)
    assert(out.getAs[String]("format") == "wav")
    assert(out.getAs[Int]("channels") == 2)
    assert(out.getAs[Int]("sample_rate") == 16000)
    assert(out.getAs[Long]("n_frames") == 40L)
    assert(out.getAs[Double]("mean_amp") == -77.0)
  }

  test("binary folder feeds the real pixel decode end-to-end") {
    val dir = Paths.get(tmp("imgs"))
    Files.createDirectories(dir)
    Files.write(dir.resolve("img_7.png"),
      graft.operators.Multimodal.solidImageBytes("png", 4, 3, 10, 20, 30))
    val bin = Loaders.loadBinaryFolder(spark, dir.toString, "m", "*.png").df
      .select(lit(7L).as("media_id"), col("content").as("payload"))
    val out = graft.operators.Multimodal.decodePixelStats(bin).collect()(0)
    assert(out.getAs[String]("format") == "png")
    assert(out.getAs[Int]("width") == 4 && out.getAs[Int]("height") == 3)
    assert(out.getAs[Double]("mean_r") == 10.0)
    assert(out.getAs[Double]("mean_g") == 20.0)
    assert(out.getAs[Double]("mean_b") == 30.0)
  }
}
