package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Builder-DSL spec: the relational surface of SURVEY §2 on tiny frames. */
class GraftFrameSpec extends SparkSpec {

  private lazy val sales: GraftFrame = {
    val sp = spark; import sp.implicits._
    GraftFrame(Seq(
      (1, "a", 10.0, "x"), (2, "a", 20.0, "y"), (3, "b", 30.0, "x"),
      (4, "b", 40.0, "y"), (5, "c", 50.0, "x")
    ).toDF("ID", "Grp", "Amount", "Tag"), "sales")
  }

  private lazy val dims: GraftFrame = {
    val sp = spark; import sp.implicits._
    GraftFrame(Seq(("a", "alpha"), ("b", "beta")).toDF("Grp", "Name"), "dims")
  }

  test("load lowercases column names") {
    assert(sales.df.columns.toSeq == Seq("id", "grp", "amount", "tag"))
  }

  test("select + filter + orderBy + limit via generated SQL") {
    val out = sales.select("id", "amount").filter("amount > 15")
      .orderByMany(("id", "DESC")).limit(2).toDF.collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(5, 4))
  }

  test("agg gate drops non-aggregates silently (reference parity)") {
    val f = sales.select("grp")
      .agg("SUM(amount) AS total", "UPPER(tag) AS nope", "COUNT(*) AS n")
      .groupBy("grp")
    assert(!f.sqlText.contains("nope"))
    val out = f.toDF.collect().map(r => (r.getString(r.fieldIndex("grp")),
      r.getDouble(r.fieldIndex("total")))).toMap
    assert(out == Map("a" -> 30.0, "b" -> 70.0, "c" -> 50.0))
  }

  test("groupByAll groups by every non-aggregate selected column") {
    val out = sales.select("grp", "tag").agg("SUM(amount) AS total").groupByAll()
      .toDF.collect()
    assert(out.length == 5) // (a,x),(a,y),(b,x),(b,y),(c,x)
  }

  test("groupByAll + window referencing an unselected column fails fast with the taxonomy error") {
    val err = intercept[GraftError.GroupByAllWindowError] {
      sales.select("grp").agg("SUM(amount) AS total")
        .window("ROW_NUMBER() OVER (PARTITION BY tag ORDER BY grp) AS rn")
        .groupByAll().toDF.collect()
    }
    assert(err.getMessage.contains("tag"))
    assert(err.suggestion.contains(".select"))
    assert(err.suggestion.contains("group_by"))
  }

  test("groupByAll + aggregate expression depending on an unselected column") {
    // y sits OUTSIDE the aggregate call, so GROUP BY ALL would need it
    // grouped — but it is not selected
    val err = intercept[GraftError.GroupByAllDependencyError] {
      sales.select("grp").agg("ROUND(SUM(amount) + id, 2) AS weird")
        .groupByAll().toDF.collect()
    }
    assert(err.getMessage.contains("id"))
  }

  test("groupByAll with several missing columns reports the compatibility error") {
    val err = intercept[GraftError.GroupByAllCompatibilityError] {
      sales.select("grp").agg("SUM(amount) AS total")
        .window("ROW_NUMBER() OVER (PARTITION BY tag) AS rn")
        .window("RANK() OVER (ORDER BY id) AS rk")
        .groupByAll().toDF.collect()
    }
    assert(err.missingColumns.toSet == Set("tag", "id"))
    assert(err.windowDependencies.nonEmpty)
  }

  test("groupByAll window deps satisfied by select list / agg alias still run") {
    val out = sales.select("grp", "tag").agg("SUM(amount) AS total")
      .window("RANK() OVER (PARTITION BY grp ORDER BY tag) AS rk")
      .groupByAll().toDF.collect()
    assert(out.length == 5)
  }

  test("groupByCube emits every grouping combination with GROUPING flags") {
    val out = sales.select("grp", "tag")
      .agg("COUNT(*) AS n", "CAST(GROUPING(grp) AS BIGINT) AS g_grp",
        "CAST(GROUPING(tag) AS BIGINT) AS g_tag")
      .groupByCube("grp", "tag").toDF.collect()
    // 5 (grp,tag) pairs + 3 grp margins + 2 tag margins + 1 grand total
    assert(out.length == 11)
    val grand = out.filter(r => r.getLong(r.fieldIndex("g_grp")) == 1 &&
      r.getLong(r.fieldIndex("g_tag")) == 1)
    assert(grand.map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("groupByRollup emits only hierarchical prefixes") {
    val out = sales.select("grp", "tag").agg("COUNT(*) AS n")
      .groupByRollup("grp", "tag").toDF.collect()
    assert(out.length == 9) // 5 pairs + 3 grp subtotals + 1 grand total
  }

  test("groupByGroupingSets honors explicit sets including the grand total") {
    val out = sales.select("grp").agg("COUNT(*) AS n")
      .groupByGroupingSets(Seq("grp"), Seq()).toDF.collect()
    assert(out.length == 4) // 3 grp groups + grand total
  }

  test("group_by_all combined with cube/rollup is rejected") {
    val err = intercept[GraftError.GroupByError] {
      sales.select("grp").agg("COUNT(*) AS n")
        .groupByCube("grp").groupByAll().toDF.collect()
    }
    assert(err.getMessage.contains("cube"))
  }

  test("head/limit of zero raise LimitError, not a silent empty frame") {
    intercept[GraftError.LimitError] { sales.head(0) }
    intercept[GraftError.LimitError] { sales.limit(0) }
    intercept[GraftError.LimitError] { sales.limit(-3) }
  }

  test("nested aggregate surfaces as AggregationError") {
    val err = intercept[GraftError.AggregationError] {
      sales.select("grp").agg("SUM(AVG(amount)) AS bad").groupBy("grp")
        .toDF.collect()
    }
    assert(err.suggestion.toLowerCase.contains("aggregate"))
  }

  test("having filters on aggregate alias") {
    val out = sales.select("grp").agg("SUM(amount) AS total").groupBy("grp")
      .having("total > 40").toDF.collect()
    assert(out.map(_.getAs[String]("grp")).toSet == Set("b", "c"))
  }

  test("groupBy resolves select alias back to expression") {
    val out = sales.select("UPPER(grp) AS g").agg("COUNT(*) AS n").groupBy("g")
      .toDF.collect().map(r => r.getAs[String]("g") -> r.getAs[Long]("n")).toMap
    assert(out == Map("A" -> 2L, "B" -> 2L, "C" -> 1L))
  }

  test("star select expands and dedupes by base name, first wins") {
    val f = sales.join(dims, "sales.grp = dims.grp", "INNER").select("*")
    val cols = f.toDF.columns.toSeq
    assert(cols == Seq("id", "grp", "amount", "tag", "name")) // grp deduped
  }

  test("inner/left/semi/anti/mark joins") {
    val inner = sales.join(dims, "sales.grp = dims.grp", "INNER").toDF
    assert(inner.count() == 4)
    val left = sales.join(dims, "sales.grp = dims.grp", "LEFT").toDF
    assert(left.count() == 5)
    val semi = sales.join(dims, "sales.grp = dims.grp", "LEFT SEMI").toDF
    assert(semi.count() == 4)
    val anti = sales.join(dims, "sales.grp = dims.grp", "LEFT ANTI").toDF
    assert(anti.collect().map(_.getAs[Int]("id")).toSeq == Seq(5))
    val mark = sales.markJoin(dims, "grp", "grp", "has_dim").toDF
    assert(mark.where("has_dim").count() == 4)
    assert(mark.where("NOT has_dim").count() == 1)
  }

  test("right semi swaps sides") {
    val rs = sales.join(dims, "sales.grp = dims.grp", "RIGHT_SEMI")
      .select("name").toDF
    assert(rs.collect().map(_.getString(0)).toSet == Set("alpha", "beta"))
  }

  test("RIGHT SEMI/ANTI fail fast when combined with another join") {
    val e1 = intercept[GraftError.JoinError] {
      sales.join(dims, "sales.grp = dims.grp", "INNER")
        .join(dims, "sales.grp = dims.grp", "RIGHT_SEMI")
    }
    assert(e1.getMessage.contains("sole join"))
    val e2 = intercept[GraftError.JoinError] {
      sales.join(dims, "sales.grp = dims.grp", "RIGHT_ANTI")
        .join(dims, "sales.grp = dims.grp", "INNER")
    }
    assert(e2.getMessage.contains("sole join"))
  }

  test("LEFT MARK through the SQL join path is rejected with a markJoin pointer") {
    val e = intercept[GraftError.JoinError] {
      sales.join(dims, "sales.grp = dims.grp", "LEFT MARK")
    }
    assert(e.getMessage.contains("markJoin"))
  }

  test("window expression appended to select") {
    val out = sales.select("id", "grp")
      .window("ROW_NUMBER() OVER (PARTITION BY grp ORDER BY amount DESC) AS rn")
      .toDF.where("rn = 1").collect().map(_.getAs[Int]("id")).toSet
    assert(out == Set(2, 4, 5))
  }

  test("union dedups, unionAll keeps, except/intersect distinct") {
    val a = sales.select("grp").filter("amount <= 30")  // a,a,b
    val b = sales.select("grp").filter("amount >= 30")  // b,b,c
    assert(a.union(b).toDF.count() == 3)       // a,b,c
    assert(a.unionAll(b).toDF.count() == 6)
    assert(a.except(b).toDF.collect().map(_.getString(0)).toSeq == Seq("a"))
    assert(a.intersect(b).toDF.collect().map(_.getString(0)).toSeq == Seq("b"))
  }

  test("pivot matches manual coalesce-sum-case with zero default") {
    val p = sales.pivot(Seq("grp"), "tag", "amount", "sum").toDF
    val row = p.where("grp = 'c'").first()
    assert(row.getAs[Double]("x") == 50.0)
    assert(row.getAs[Double]("y") == 0.0) // COALESCE(...,0) parity
  }

  test("unpivot melts value columns") {
    val u = sales.unpivot(Seq("id"), Seq("amount"), "metric", "value").toDF
    assert(u.count() == 5)
    assert(u.columns.toSeq == Seq("id", "metric", "value"))
  }

  test("fillNull handles string sentinels, dropNull drops them") {
    val sp = spark; import sp.implicits._
    val dirty = GraftFrame(Seq(("1", "Berlin"), ("2", ""), ("3", "N/A"),
      ("4", "-"), ("5", "Paris")).toDF("id", "city"), "dirty")
    val filled = dirty.fillNull(Seq("city"), "UNKNOWN").toDF
    assert(filled.where("city = 'UNKNOWN'").count() == 3)
    val dropped = dirty.dropNull(Seq("city")).toDF
    assert(dropped.collect().map(_.getString(1)).toSet == Set("Berlin", "Paris"))
  }

  test("fillDown carries last non-null forward in given order (A5)") {
    val sp = spark; import sp.implicits._
    val d = GraftFrame(Seq((1, "Berlin"), (2, null), (3, "null"), (4, "N/A"),
      (5, "Paris"), (6, "-")).toDF("id", "city"), "fd")
    val out = d.fillDown(Seq("city"), Seq("id")).toDF
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(out == Seq("Berlin", "Berlin", "Berlin", "Berlin", "Paris", "Paris"))
  }

  test("skipRows drops first n under explicit order") {
    val out = sales.skipRows(2, Seq("id")).toDF.collect().map(_.getAs[Int]("id")).toSet
    assert(out == Set(3, 4, 5))
  }

  test("dropDuplicatesByColumn keeps deterministic survivor") {
    val out = sales.dropDuplicatesByColumn(Seq("tag"), Seq("id")).toDF
      .collect().map(_.getAs[Int]("id")).toSet
    assert(out == Set(1, 2)) // first id per tag
  }

  test("elusion registers a reusable view and chains") {
    val stage1 = sales.select("grp", "amount").filter("amount > 10")
      .elusion("stage1")
    val out = stage1.select("grp").agg("SUM(amount) AS t").groupBy("grp")
      .toDF.collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Double]("t")).toMap
    assert(out == Map("a" -> 20.0, "b" -> 70.0, "c" -> 50.0))
    assert(spark.catalog.tableExists("stage1"))
  }

  test("elusionCached pins results against later source mutation") {
    val sp = spark; import sp.implicits._
    val src = Seq((1, 10.0)).toDF("id", "v")
    src.createOrReplaceTempView("mut_src")
    val f = GraftFrame(spark.table("mut_src"), "m").elusionCached("pinned")
    Seq((1, 99.0)).toDF("id", "v").createOrReplaceTempView("mut_src")
    assert(f.toDF.first().getDouble(1) == 10.0) // still the old value
    f.df.unpersist()
  }

  test("stats / nullAnalysis / correlationMatrix shapes") {
    val st = sales.stats(Seq("amount"))
    val r = st.first()
    assert(r.getAs[Long]("total_count") == 5 && r.getAs[Double]("mean") == 30.0)
    val na = sales.nullAnalysis(Seq("amount")).first()
    assert(na.getAs[Long]("null_count") == 0)
    val cm = sales.correlationMatrix(Seq("id", "amount")).collect()
    assert(cm.length == 4)
    assert(math.abs(cm.find(r => r.getString(0) == "id" && r.getString(1) == "amount")
      .get.getDouble(2) - 1.0) < 1e-9)
  }

  test("head and tail slice rows") {
    assert(sales.head(2).toDF.count() == 2)
    assert(sales.tail(2).toDF.count() == 2)
  }

  test("extractValue / extractRow") {
    val one = sales.select("id", "grp").orderByMany(("id", "ASC")).limit(1)
      .elusion("one_row")
    assert(one.extractValue("id") == "1")
    assert(one.extractRow()("grp") == "a")
  }

  test("json extraction via get_json_object") {
    val sp = spark; import sp.implicits._
    val j = GraftFrame(Seq((1, """{"Key2":"2022-09-15"}"""))
      .toDF("id", "col"), "j")
    val out = j.json("col.'$Key2' AS reg_date").select("id").toDF.first()
    assert(out.getAs[String]("reg_date") == "2022-09-15")
  }

  test("jsonArray extraction finds object by id key (A6)") {
    val sp = spark; import sp.implicits._
    val arr = """[{"Id":"Date","Value":"2022-09-15"},{"Id":"MadeBy","Value":"Bor"}]"""
    val j = GraftFrame(Seq((1, arr)).toDF("id", "col"), "ja")
    val out = j.jsonArray("col.'$Value:Id=Date' AS d", "col.'$Value:Id=MadeBy' AS m")
      .select("id").toDF.first()
    assert(out.getAs[String]("d") == "2022-09-15")
    assert(out.getAs[String]("m") == "Bor")
  }

  test("empty() yields the single-row dummy frame") {
    val e = GraftFrame.empty(spark)
    assert(e.toDF.collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(e.toDF.columns.toSeq == Seq("dummy"))
  }

  test("stream() pulls rows without materializing; streamProcess visits partitions") {
    val n = sales.select("id").stream().size
    assert(n == 5)
    val acc = spark.sparkContext.longAccumulator("rows")
    sales.streamProcess(it => acc.add(it.size))
    assert(acc.value == 5)
  }

  test("elusionStreaming counts rows with progress") {
    assert(sales.select("id").elusionStreaming("probe") == 5)
  }

  test("orderBy rejects bad direction") {
    val e = intercept[graft.GraftError.OrderByError] {
      sales.orderBy(Seq("id"), Seq("SIDEWAYS"))
    }
    assert(e.getMessage.contains("SIDEWAYS") && e.getMessage.contains("id"))
  }

  test("calendar golden rows (A8): leap day, quarter, weekend, month start") {
    val cal = graft.sources.Loaders
      .dateRangeTable(spark, "2024-02-27", "2024-03-02", "cal").toDF
    assert(cal.count() == 5) // leap day present
    assert(cal.where("date = DATE '2024-02-29'").count() == 1)
    val r = cal.where("date = DATE '2024-03-02'").first()
    assert(r.getAs[Int]("quarter") == 1)
    assert(r.getAs[Boolean]("is_weekend"))
    assert(r.getAs[java.sql.Date]("month_start").toString == "2024-03-01")
  }

  test("all 15 named calendar formats render") {
    val fmts = graft.sources.Loaders.DateFormats.keys.toSeq
    val cal = graft.sources.Loaders
      .formattedDateRangeTable(spark, "2024-06-15", "2024-06-15", "cal", fmts).toDF
    val row = cal.first()
    assert(fmts.forall(f => row.getAs[String](s"date_$f") != null))
    assert(row.getAs[String]("date_compact_date") == "20240615")
    assert(row.getAs[String]("date_eu_date") == "15.06.2024")
    assert(row.getAs[String]("date_us_date") == "06/15/2024")
    assert(row.getAs[String]("date_year_month") == "2024-06")
  }

  test("raw sql entry registers frames under their aliases") {
    val out = graft.sources.Loaders.sql(spark,
      "SELECT s.grp, SUM(s.amount) AS t FROM sales s JOIN dims ON s.grp = dims.grp GROUP BY s.grp",
      "rawr", sales, dims).toDF.collect()
    assert(out.length == 2)
  }

  test("withCtes: chained CTEs see the frame and joined frames by plain alias") {
    // CTE over the base frame, second CTE over the first, subquery filter
    val out = sales
      .withCtes(
        "big AS (SELECT grp FROM sales WHERE amount > 5)",
        "big2 AS (SELECT grp FROM big)")
      .filter("grp IN (SELECT grp FROM big2)")
      .select("grp")
      .agg("COUNT(*) AS n")
      .groupBy("grp")
      .toDF.collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("n")).toMap
    val expect = sales.toDF.collect()
      .filter(_.getAs[Double]("amount") > 5).map(_.getAs[String]("grp")).toSet
    assert(out.keySet == expect)
    // CTE referencing a JOINED frame's alias
    // the CTE filter is a tautology over the inner join, so the count must
    // equal the plain join's — proving dims resolved inside the CTE body
    val plain = sales.join(dims, "sales.grp = dims.grp", "INNER")
      .select("sales.amount").toDF.count()
    val joined = sales
      .join(dims, "sales.grp = dims.grp", "INNER")
      .withCteSingle("dnames AS (SELECT grp FROM dims)")
      .filter("sales.grp IN (SELECT grp FROM dnames)")
      .select("sales.amount")
      .toDF
    assert(joined.count() == plain && plain > 0)
  }

  test("pipeline hooks on the builder: dedup, cap, bloom joins chain with SQL ops") {
    val sp = spark; import sp.implicits._
    val docs = GraftFrame(Seq(
      (1L, "alpha text", "en"), (2L, "alpha text", "en"), (3L, "beta text", "en"),
      (4L, "gamma text", "de"), (5L, "delta text", "de"), (6L, "epsilon text", "de")
    ).toDF("doc_id", "text", "lang"), "bdocs")
    // exact dedup drops the duplicate of doc 1, keeps min id
    val deduped = docs.dedupExact("text", "doc_id", "bdocs_dedup")
    assert(deduped.toDF.count() == 5)
    assert(deduped.toDF.where(col("doc_id") === 2L).count() == 0)
    // cap per language at 2, then the result chains into builder SQL
    val capped = deduped.capPerGroup("lang", "doc_id", 2, "bdocs_cap")
      .select("lang").agg("COUNT(*) AS n").groupBy("lang")
    val byLang = capped.toDF.collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n")).toMap
    assert(byLang.values.forall(_ <= 2))
    // containment: doc 3's text pasted into a longer doc 6 is flagged
    val wrapped = GraftFrame(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "padding words one two three four five six seven eight nine ten " +
        "the quick brown fox jumps over the lazy dog and more filler here")
    ).toDF("doc_id", "text"), "bwrap")
    val cont = wrapped.containmentPairs("text", "doc_id", "bwrap_cont")
    assert(cont.toDF.select("contained_id").as[Long].collect().toSeq == Seq(1L))
    // bloom semi/anti joins against a keep-list frame
    val keep = GraftFrame(Seq(1L, 4L).toDF("keep_id"), "bkeep")
    val semi = docs.semiJoinBloom(keep, "doc_id", "keep_id", "bdocs_semi",
      expectedKeys = 10L)
    assert(semi.toDF.select("doc_id").as[Long].collect().toSet == Set(1L, 4L))
    val anti = docs.antiJoinBloom(keep, "doc_id", "keep_id", "bdocs_anti",
      expectedKeys = 10L)
    assert(anti.toDF.select("doc_id").as[Long].collect().toSet ==
      Set(2L, 3L, 5L, 6L))
  }

  test("classification and graph hooks on the builder") {
    val sp = spark; import sp.implicits._
    val train = GraftFrame(Seq(
      (1L, "cat dog bird", "animals"), (2L, "dog bird cat barn", "animals"),
      (3L, "price revenue market", "finance"), (4L, "market price forecast", "finance")
    ).toDF("doc_id", "text", "lang"), "btrain")
    val unlabeled = GraftFrame(Seq(
      (10L, "cat dog"), (11L, "revenue market")).toDF("doc_id", "text"), "bunl")
    val pred = unlabeled.classifyNb(train, "text", "doc_id", "lang", "bpred")
      .toDF.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred")).toMap
    assert(pred == Map(10L -> "animals", 11L -> "finance"))
    // DSIR selection toward the finance slice, chained into builder SQL
    val target = GraftFrame(Seq((3L, "price revenue market"))
      .toDF("doc_id", "text"), "btgt")
    val sel = unlabeled.selectByImportance(target, "text", "doc_id", 1, "bsel")
      .select("doc_id").toDF.as[Long].collect().toSeq
    assert(sel == Seq(11L))
    // pageRank over a pair frame registers the alias and ranks the hub first
    val pairsF = GraftFrame(Seq((1L, 2L), (1L, 3L), (1L, 4L))
      .toDF("id_a", "id_b"), "bpairs")
    val pr = pairsF.pageRank("bpr")
      .toDF.collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pagerank")).toMap
    assert(pr(1L) > pr(2L) && pr(2L) == pr(3L))
  }

  test("corpus-curation hooks on the builder chain and register aliases") {
    val sp = spark; import sp.implicits._
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = GraftFrame(Seq(
      (1L, s"first document body with $run inside it", "s1"),
      (2L, s"second unrelated copy carrying $run too now", "s2"),
      (3L, "third standalone text with nothing shared here at all", "s1")
    ).toDF("doc_id", "text", "source"), "cdocs")
    val wp = docs.winnowPairs("text", "doc_id", "cwp", minShared = 1L)
      .toDF.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(wp.contains((1L, 2L)))
    val ov = docs.groupOverlap("text", "source", "cov").toDF.collect()
    assert(ov.length == 1 && ov.head.getAs[Long]("common") > 0)
    val ref = GraftFrame(Seq((9L, s"reference holding $run verbatim"))
      .toDF("doc_id", "text"), "cref")
    val nv = docs.noveltyAgainst(ref, "text", "doc_id", "cnv")
      .toDF.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("novelty")).toMap
    assert(nv(3L) == 1.0 && nv(1L) < 1.0)
    val bins = docs.curriculumBins("text", "doc_id", 3, "cbins").toDF
    assert(bins.count() == 3 &&
      bins.select("bin").as[Long].collect().toSet == Set(1L, 2L, 3L))
    val mixed = docs.mixByTokenBudget("text", "source", "doc_id",
      budgets = Seq("s1" -> 1000000L), resultAlias = "cmix")
    assert(mixed.toDF.count() == 3) // budgets >= totals keep everything
  }

  test("media decode and indexed kNN-edge hooks on the builder chain") {
    val sp = spark; import sp.implicits._
    val media = GraftFrame(Seq(
      (1L, graft.operators.Multimodal.pngHeaderBytes(320, 200)),
      (2L, "not an image".getBytes)).toDF("media_id", "payload"), "bmedia")
    val dec = media.decodeMedia("bdec").toDF.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(dec == Map(1L -> "png", 2L -> null))
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = "target/tmp/ivf_knn_builder"
    graft.operators.Similarity.buildIvfIndex(emb, "embedding", "vec_id", idx, nlist = 4)
    val edges = GraftFrame(emb, "bemb")
      .knnEdgesIndexed(idx, "embedding", "vec_id", "bknn", k = 3, nprobe = 2)
    val pr = edges.toDF.select(col("query_id").as("id_a"), col("corpus_id").as("id_b"))
    assert(edges.toDF.count() > 0 &&
      graft.operators.GraphOps.pageRank(pr, iterations = 2).count() > 0)
  }
}
