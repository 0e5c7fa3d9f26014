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

  test("cartesian mode: multi-relationship record crosses its repeated groups") {
    // one customer with 2 orders × 2 addresses ⇒ 4 combination rows,
    // scalar fields repeated onto each (reference xml.rs Cartesian mode);
    // auto detection routes here because ≥2 child types repeat
    val xml =
      """<root>
        |  <customer>
        |    <name>ada</name>
        |    <order><oid>1</oid><amt>10</amt></order>
        |    <order><oid>2</oid><amt>20</amt></order>
        |    <address>home</address>
        |    <address>work</address>
        |  </customer>
        |  <customer>
        |    <name>kay</name>
        |    <order><oid>3</oid><amt>30</amt></order>
        |    <address>hq</address>
        |  </customer>
        |</root>""".stripMargin
    val p = writeTemp("cart.xml", xml)
    val df = XmlLoader.load(spark, p, "cart", Some("customer")).df
    assert(df.columns.toSet ==
      Set("name", "order_oid", "order_amt", "address"))
    val rows = df.collect().map(r => (r.getAs[String]("name"),
      r.getAs[String]("order_oid"), r.getAs[String]("address"))).toSet
    assert(rows == Set(
      ("ada", "1", "home"), ("ada", "1", "work"),
      ("ada", "2", "home"), ("ada", "2", "work"),
      ("kay", "3", "hq")))
    // explicit Standard on the same file must NOT cross-product
    val std = XmlLoader.load(spark, p, "cart_std", Some("customer"),
      mode = XmlLoader.Standard).df
    assert(std.count() == 2)
  }

  test("auto mode keeps header-detail (single repeated type) in standard") {
    val xml =
      """<root>
        |  <item><sku>a</sku></item>
        |  <item><sku>b</sku></item>
        |</root>""".stripMargin
    val p = writeTemp("hd.xml", xml)
    val df = XmlLoader.load(spark, p, "hd").df
    assert(df.count() == 2)
    assert(df.columns.toSeq == Seq("sku"))
  }
}
