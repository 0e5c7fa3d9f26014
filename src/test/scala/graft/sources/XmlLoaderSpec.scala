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

  test("auto mode picks the multi-entity parent, not the most frequent child") {
    // two sibling repeating entities inside customer: the old heuristic
    // (globally most frequent repeating element) would pick order (4 > 2
    // customers) and silently drop names and addresses — the analyzer's
    // relationship/cardinality pass must pick customer and cross its groups
    val xml =
      """<root>
        |  <customer>
        |    <name>ada</name>
        |    <order><oid>1</oid></order>
        |    <order><oid>2</oid></order>
        |    <address><city>x</city></address>
        |    <address><city>y</city></address>
        |  </customer>
        |  <customer>
        |    <name>kay</name>
        |    <order><oid>3</oid></order>
        |    <order><oid>4</oid></order>
        |    <address><city>z</city></address>
        |  </customer>
        |</root>""".stripMargin
    val p = writeTemp("multi.xml", xml)
    assert(XmlLoader.detectRecordTag(scala.xml.XML.loadString(xml)) == "customer")
    val df = XmlLoader.load(spark, p, "me").df
    assert(df.columns.toSet == Set("name", "order_oid", "address_city"))
    // ada: 2 orders × 2 addresses = 4 rows; kay: 2 × 1 = 2
    assert(df.count() == 6)
    assert(df.where("name = 'ada'").count() == 4)
  }

  test("wrapper elements are transparent to detection and flattening") {
    // same entities but list-wrapped (<orders><order/>…</orders>): the
    // analyzer must see customer → order through the wrapper, and the
    // Cartesian flatten must cross the spliced groups
    val xml =
      """<root>
        |  <customer>
        |    <name>ada</name>
        |    <orders>
        |      <order><oid>1</oid></order>
        |      <order><oid>2</oid></order>
        |    </orders>
        |    <addresses>
        |      <address><city>x</city></address>
        |      <address><city>y</city></address>
        |    </addresses>
        |  </customer>
        |</root>""".stripMargin
    val p = writeTemp("wrapped.xml", xml)
    assert(XmlLoader.detectRecordTag(scala.xml.XML.loadString(xml)) == "customer")
    val df = XmlLoader.load(spark, p, "wr").df
    assert(df.columns.toSet == Set("name", "order_oid", "address_city"))
    assert(df.count() == 4)
    // a field holder with one scalar child is NOT a wrapper
    val holder = "<root><rec><address><city>x</city></address><v>1</v></rec>" +
      "<rec><address><city>y</city></address><v>2</v></rec></root>"
    val hp = writeTemp("holder.xml", holder)
    val hdf = XmlLoader.load(spark, hp, "hold", Some("rec")).df
    assert(hdf.count() == 2 && hdf.columns.contains("v"))
  }

  test("distributed XML folder load: executor-side parse, first-file schema") {
    val dir = Paths.get("target/tmp/xmlspec/folder")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("a.xml"),
      "<catalog><book id=\"1\"><title>A</title><price>10</price></book>" +
        "<book id=\"2\"><title>B</title><price>20</price></book></catalog>")
    Files.writeString(dir.resolve("b.xml"),
      // price missing, extra column ignored (first-file schema wins)
      "<catalog><book id=\"3\"><title>C</title><extra>x</extra></book></catalog>")
    val df = XmlLoader.loadFolderDistributed(spark, dir.toString, "dist").df
    assert(df.columns.toSet == Set("id", "title", "price"))
    assert(df.count() == 3)
    assert(df.where("id = '3'").first().getAs[String]("price") == null)
    assert(!df.columns.contains("extra"))
    // the parse is distributed: the plan scans an RDD, not a local relation
    assert(df.rdd.getNumPartitions >= 1)
  }

  test("xml load works through an explicit file: URI (Hadoop FS open)") {
    val p = writeTemp("uri.xml", catalog)
    val uri = Paths.get(p).toAbsolutePath.toUri.toString
    assert(uri.startsWith("file:"))
    assert(XmlLoader.load(spark, uri, "xuri").df.count() == 3)
  }

  test("three or more repeating groups zip as parallel arrays, not a cross product") {
    // reference determine_combination_strategy (xml.rs:507-518): ≥3 groups
    // → ParallelArrays. A cross product would be 3×2×2 = 12 rows; the
    // parallel zip yields max-length rows with shorter groups null-padded
    val xml =
      """<root>
        |  <rec>
        |    <id>1</id>
        |    <a>a1</a><a>a2</a><a>a3</a>
        |    <b>b1</b><b>b2</b>
        |    <c>c1</c><c>c2</c>
        |  </rec>
        |</root>""".stripMargin
    val p = writeTemp("parallel.xml", xml)
    val df = XmlLoader.load(spark, p, "par").df
    assert(df.count() == 3) // longest group length, not 3×2×2 = 12
    val rows = df.collect().map(r => (r.getAs[String]("a"),
      r.getAs[String]("b"), r.getAs[String]("c"))).toSet
    assert(rows == Set(("a1", "b1", "c1"), ("a2", "b2", "c2"), ("a3", null, null)))
    assert(df.select("id").distinct().count() == 1) // base repeats onto each row
  }

  test("one large repeating group with a small sibling flattens header-detail") {
    // max instance count 4 > 3 with two groups → HeaderDetail: one row per
    // instance of the LARGEST group; the small group's fields are dropped
    // (the reference keeps only its chosen group too, xml.rs:730-741)
    val xml =
      """<root>
        |  <order>
        |    <oid>9</oid>
        |    <line><sku>s1</sku></line>
        |    <line><sku>s2</sku></line>
        |    <line><sku>s3</sku></line>
        |    <line><sku>s4</sku></line>
        |    <note>rush</note><note>gift</note>
        |  </order>
        |</root>""".stripMargin
    val p = writeTemp("hd2.xml", xml)
    val df = XmlLoader.load(spark, p, "hd2", Some("order")).df
    assert(df.count() == 4) // one per line, not 4×2 combinations
    assert(df.select("line_sku").collect().map(_.getString(0)).toSet ==
      Set("s1", "s2", "s3", "s4"))
    assert(df.select("oid").distinct().collect().map(_.getString(0)).toSeq == Seq("9"))
    // explicit Cartesian overrides the auto strategy: full 4×2 cross
    assert(XmlLoader.load(spark, p, "hd2c", Some("order"),
      mode = XmlLoader.Cartesian).df.count() == 8)
  }

  test("distributed single-file load parses records, first-record schema, null fill") {
    val xml =
      """<?xml version="1.0"?>
        |<dump>
        |  <page id="1"><title>Alpha</title><views>10</views></page>
        |  <page id="2"><title>Beta</title><views>20</views><extra>zz</extra></page>
        |  <page id="3"><title>Gamma</title></page>
        |</dump>""".stripMargin
    val p = writeTemp("dump.xml", xml)
    val df = XmlLoader.loadSingleFileDistributed(spark, p, "dump", "page").df
    assert(df.columns.toSeq == Seq("id", "title", "views")) // first-record schema; extra dropped
    val rows = df.collect().map(r => (r.getString(0), r.getString(1),
      Option(r.getString(2)))).sortBy(_._1)
    assert(rows.toSeq == Seq(("1", "Alpha", Some("10")),
      ("2", "Beta", Some("20")), ("3", "Gamma", None)))
  }

  test("distributed single-file load survives byte-range splits mid-record") {
    val n = 500
    val recs = (1 to n).map(i =>
      s"""<page id="$i"><title>t$i</title><views>${i * 7}</views></page>""")
    val p = writeTemp("bigdump.xml",
      recs.mkString("<?xml version=\"1.0\"?>\n<dump>\n", "\n", "\n</dump>"))
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      // ~2 KB ranges over an ~20 KB file: records straddle every boundary
      spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
      val ds = XmlLoader.loadSingleFileDistributed(spark, p, "bigdump", "page").df
      assert(ds.rdd.getNumPartitions > 1, "file must actually split")
      assert(ds.count() == n)
      val sum = ds.select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("views").cast("long"))).first().getLong(0)
      assert(sum == (1 to n).map(_ * 7L).sum)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("distributed single-file load rejects a file without the record tag") {
    val p = writeTemp("norec.xml", "<root><other>x</other></root>")
    intercept[graft.GraftError.InvalidOperation] {
      XmlLoader.loadSingleFileDistributed(spark, p, "norec", "page")
    }
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
