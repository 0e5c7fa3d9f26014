package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class WritersSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val dir = Paths.get("target/tmp/writers")
    Files.createDirectories(dir)
    dir.resolve(name).toString
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
    intercept[IllegalArgumentException] {
      Writers.writeCsvSingle(Seq((1L, "x")).toDF("id", "other"), "append", p)
    }
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
    assert(spark.read.json(p).count() == 2)
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

  test("delta-layout writer partitions by column") {
    val p = tmp("delta_tbl")
    Writers.writeDeltaTable(df, "overwrite", p, partitionBy = Seq("name"))
    assert(Files.isDirectory(Paths.get(p, "name=a")))
    assert(spark.read.parquet(p).count() == 2)
  }
}
