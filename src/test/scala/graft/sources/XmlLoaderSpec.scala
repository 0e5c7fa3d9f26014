package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

class XmlLoaderSpec extends SparkSpec {

  private def writeTemp(name: String, content: String): String = {
    val dir = Paths.get("target/tmp/xmlspec")
    Files.createDirectories(dir)
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  private val catalog =
    """<catalog>
      |  <book id="1"><title>Spark Basics</title><price>30</price></book>
      |  <book id="2"><title>Scala Deep</title><price>45</price></book>
      |  <book id="3"><title>SQL Engines</title></book>
      |</catalog>""".stripMargin

  test("standard mode: explicit record tag flattens children + attributes") {
    val path = writeTemp("books.xml", catalog)
    val f = XmlLoader.load(spark, path, "books", recordTag = Some("book"))
    assert(f.df.columns.toSet == Set("id", "title", "price"))
    assert(f.df.count() == 3)
    val r = f.df.where("id = '2'").first()
    assert(r.getAs[String]("title") == "Scala Deep")
    assert(f.df.where("id = '3'").first().getAs[String]("price") == null)
  }

  test("auto mode detects the repeating record element") {
    val path = writeTemp("auto.xml", catalog)
    val f = XmlLoader.load(spark, path, "books_auto")
    assert(f.df.count() == 3)
    assert(f.df.columns.contains("title"))
  }

  test("extension dispatch routes .xml") {
    val path = writeTemp("dispatch.xml", catalog)
    val f = Loaders.load(spark, path, "bx")
    assert(f.df.count() == 3)
  }

  test("builder chain over an XML-loaded frame") {
    val path = writeTemp("chain.xml", catalog)
    val out = XmlLoader.load(spark, path, "bk")
      .select("title", "price::DOUBLE AS p")
      .dropNull(Seq("p"))
      .orderByMany(("p", "DESC"))
      .toDF.collect()
    assert(out.map(_.getAs[Double]("p")).toSeq == Seq(45.0, 30.0))
  }
}
