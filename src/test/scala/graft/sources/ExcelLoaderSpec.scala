package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class ExcelLoaderSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val dir = Paths.get("target/tmp/excel")
    Files.createDirectories(dir)
    dir.resolve(name).toString
  }

  private lazy val df = {
    val sp = spark; import sp.implicits._
    Seq(("John", 25L, 50000.5, true), ("Jane", 30L, 75000.0, false),
      ("O<dd> & \"Co\"", 35L, 60000.25, true))
      .toDF("Name", "Age", "Salary", "Active")
  }

  test("xlsx roundtrip: typed cells come back with smart-cast types") {
    val p = tmp("people.xlsx")
    ExcelLoader.write(df, p)
    val back = ExcelLoader.load(spark, p, "people")
    val types = back.df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types == Map("name" -> "string", "age" -> "long",
      "salary" -> "double", "active" -> "boolean"))
    val rows = back.df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
    assert(rows == Set(("John", 25L, 50000.5, true), ("Jane", 30L, 75000.0, false),
      ("O<dd> & \"Co\"", 35L, 60000.25, true))) // XML escaping survives
  }

  test("extension dispatch routes .xlsx") {
    val p = tmp("dispatch.xlsx")
    ExcelLoader.write(df, p)
    assert(Loaders.load(spark, p, "xd").df.count() == 3)
  }

  test("builder chain over an excel-loaded frame") {
    val p = tmp("chain.xlsx")
    ExcelLoader.write(df, p)
    val out = ExcelLoader.load(spark, p, "ppl")
      .filter("age > 26")
      .agg("COUNT(*) AS n").toDF.first()
    assert(out.getAs[Long]("n") == 2)
  }

  test("file:-URI xlsx roundtrip goes through the Hadoop FS API") {
    val p = tmp("uri.xlsx")
    ExcelLoader.write(df, p)
    val uri = Paths.get(p).toAbsolutePath.toUri.toString // file:///…
    assert(uri.startsWith("file:"))
    assert(ExcelLoader.load(spark, uri, "u").df.count() == 3)
  }

  test("corrupt OLE2 .xls is rejected with a typed error, not a crash") {
    // real BIFF8 decoding is covered by BiffReaderSpec; here a file with
    // the OLE2 signature but a zeroed header must fail typed
    val p = tmp("legacy.xls")
    val ole2 = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
    Files.write(Paths.get(p), ole2 ++ Array.fill[Byte](512)(0))
    val e = intercept[graft.GraftError.InvalidOperation] {
      Loaders.load(spark, p, "x")
    }
    assert(e.getMessage.contains("OLE2"))
  }

  test("mislabeled xlsx named .xls still loads (content sniff, not extension)") {
    val p = tmp("mislabeled.xls")
    ExcelLoader.write(df, p)
    assert(Loaders.load(spark, p, "m").df.count() == 3)
  }

  test("non-excel bytes give a typed missing-signature error") {
    val p = tmp("garbage.xlsx")
    Files.write(Paths.get(p), "this is not a zip".getBytes)
    val e = intercept[graft.GraftError.InvalidOperation] {
      ExcelLoader.load(spark, p, "g")
    }
    assert(e.getMessage.contains("neither zip nor OLE2"))
  }

  test("nulls render as empty cells and load back as null") {
    val sp = spark; import sp.implicits._
    val withNull = Seq(("a", java.lang.Double.valueOf(1.5)),
      ("b", null.asInstanceOf[java.lang.Double])).toDF("k", "v")
    val p = tmp("nulls.xlsx")
    ExcelLoader.write(withNull, p)
    val back = ExcelLoader.load(spark, p, "nx").df
    assert(back.where("v IS NULL").count() == 1)
  }
}
