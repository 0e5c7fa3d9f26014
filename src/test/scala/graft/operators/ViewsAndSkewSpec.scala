package graft.operators

import graft.{GraftFrame, GraftError, SparkSpec}
import org.apache.spark.sql.functions._

class ViewsAndSkewSpec extends SparkSpec {

  private lazy val base = {
    val sp = spark; import sp.implicits._
    GraftFrame(Seq((1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0))
      .toDF("id", "grp", "v"), "vbase")
  }

  test("materialized view pins data, lists, refreshes, drops") {
    val frame = base.select("grp").agg("SUM(v) AS total").groupBy("grp")
    MaterializedViews.create(frame, "mv_test", ttlSecs = Some(3600))
    assert(MaterializedViews.list().exists(_._1 == "mv_test"))
    val got = MaterializedViews.get("mv_test").get.toDF.collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Double]("total")).toMap
    assert(got == Map("a" -> 30.0, "b" -> 30.0))
    assert(spark.catalog.tableExists("mv_test"))
    MaterializedViews.drop("mv_test")
    assert(!MaterializedViews.list().exists(_._1 == "mv_test"))
  }

  test("expired TTL view evicts on access") {
    val frame = base.select("grp")
    MaterializedViews.create(frame, "mv_ttl", ttlSecs = Some(0))
    Thread.sleep(5)
    assert(MaterializedViews.get("mv_ttl").isEmpty)
  }

  test("materialized view registry rejects past the 50-view cap, frees on drop") {
    MaterializedViews.clear()
    val frame = base.select("grp")
    (1 to MaterializedViews.MaxViews).foreach(i =>
      MaterializedViews.create(frame, s"mv_cap_$i"))
    val e = intercept[IllegalArgumentException] {
      MaterializedViews.create(frame, "mv_cap_overflow")
    }
    assert(e.getMessage.contains("limit"))
    // replacing an EXISTING name stays allowed at the cap…
    MaterializedViews.create(frame, "mv_cap_1")
    // …and dropping opens a slot
    MaterializedViews.drop("mv_cap_2")
    MaterializedViews.create(frame, "mv_cap_overflow")
    MaterializedViews.clear()
    assert(MaterializedViews.list().isEmpty)
  }

  test("query cache hits on identical generated SQL, respects LRU cap") {
    val cache = new QueryCache(maxEntries = 2)
    def q(g: String) = base.select("grp", "v").filter(s"grp = '$g'")
    cache.elusionWithCache(q("a"), "qa")
    cache.elusionWithCache(q("a"), "qa2")
    assert(cache.stats == (1, 1L)) // one entry, one hit
    cache.elusionWithCache(q("b"), "qb")
    cache.elusionWithCache(base.select("id"), "qc") // evicts oldest
    assert(cache.stats._1 == 2)
    cache.invalidate()
    assert(cache.stats._1 == 0)
  }

  test("bloom semi/anti joins are exact at any fpp, including a useless filter") {
    val sp = spark; import sp.implicits._
    val big = (1L to 500L).map(i => (i, s"row$i")).toDF("k", "payload")
    val small = Seq(3L, 7L, 7L, 250L, 499L, 777L).toDF("sk") // dup + non-match
    val expectedSemi = Set(3L, 7L, 250L, 499L)
    for (fpp <- Seq(0.01, 0.5)) { // 0.5 = filter passes nearly everything
      val semi = RuntimeFilters.bloomSemiJoin(big, small, "k", "sk", 10L, fpp)
        .select("k").as[Long].collect().toSet
      assert(semi == expectedSemi, s"semi diverged at fpp=$fpp")
      val anti = RuntimeFilters.bloomAntiJoin(big, small, "k", "sk", 10L, fpp)
        .select("k").as[Long].collect().toSet
      assert(anti == (1L to 500L).toSet -- expectedSemi, s"anti diverged at fpp=$fpp")
    }
  }

  test("sampleKPerGroup caps every group at k, keeps small groups whole, is deterministic") {
    val sp = spark; import sp.implicits._
    val df = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 103).map(i => (i.toLong, "small"))).toDF("id", "g")
    val out = Corpus.sampleKPerGroup(df, "g", "id", k = 10)
    val sizes = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes == Map("big" -> 10L, "small" -> 3L))
    val again = Corpus.sampleKPerGroup(df, "g", "id", k = 10)
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet,
      "same salt must pick the same survivors")
    val other = Corpus.sampleKPerGroup(df, "g", "id", k = 10, salt = "other")
      .select("id").as[Long].collect().toSet
    assert(other != again, "a different salt should pick a different subset")
  }

  test("error taxonomy: missing column with suggestions") {
    val err = intercept[GraftError.MissingColumn] {
      base.select("grpp").toDF.collect()
    }
    assert(err.suggestion.contains("grp"))
  }

  test("error taxonomy: parse failure carries the generated SQL") {
    val err = intercept[Throwable] {
      base.select("SUM(((").toDF.collect()
    }
    assert(err.isInstanceOf[GraftError.InvalidSql] ||
      err.getMessage.contains("PARSE"))
  }

  test("error taxonomy: set-operation column mismatch") {
    val sp = spark; import sp.implicits._
    val other = GraftFrame(Seq((1, "x")).toDF("a", "b"), "two_cols")
    val err = intercept[GraftError.SetOperationError] {
      base.union(other)
    }
    assert(err.suggestion.contains("column count"))
  }

  test("salted join equals plain join on skewed data") {
    val sp = spark; import sp.implicits._
    val left = (Seq.fill(500)(("hot", 1)) ++ Seq(("cold", 2), ("cool", 3)))
      .toDF("k", "lv")
    val right = Seq(("hot", 100), ("cold", 200)).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("rv").as("s")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(left, right, Seq("k"), factor = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("rv").as("s")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join SPREADS a 100:1 hot key across partitions (plan fact, not narration)") {
    val sp = spark; import sp.implicits._
    // 100:1 skew: one key holds ~all rows; in a plain equi-join every hot
    // row lands in ONE shuffle partition (the at-scale OOM), in the
    // salted join the same rows must land in several
    val left = ((1 to 2000).map(i => ("hot", i)) ++
      (1 to 20).map(i => (s"cold$i", i))).toDF("k", "lv")
    val right = (Seq("hot") ++ (1 to 20).map(i => s"cold$i")).map((_, 1))
      .toDF("k", "rv")
    def hotPartitions(df: org.apache.spark.sql.DataFrame): Long =
      df.where(col("k") === "hot")
        .select(org.apache.spark.sql.functions.spark_partition_id().as("pid"))
        .distinct().count()
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    try {
      // forbid broadcast so both variants actually shuffle on the join
      // key, and AQE partition coalescing so the unit-test-sized shuffle
      // keeps its partitioning observable (at scale the hot partitions
      // are far above the coalesce target and stay distinct)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      assert(hotPartitions(left.join(right, Seq("k"))) == 1L,
        "plain join must concentrate the hot key (the failure mode)")
      assert(hotPartitions(Skew.saltedJoin(left, right, Seq("k"), factor = 4)) > 1L,
        "salted join must spread the hot key over > 1 partition")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }

  test("AQE skew-join engages on a planted hot key (executed-plan assertion)") {
    val sp = spark; import sp.implicits._
    // thresholds scaled down so the 4 MB hot partition counts as skewed in
    // a unit test; the shape (one partition ≫ median × factor) is exactly
    // the 100 TB trigger condition
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // INCOMPRESSIBLE pad (md5 chain): the skew detector reads compressed
      // shuffle sizes, and a constant-char pad lz4-compresses to nothing
      def pad(i: Int): String = {
        val md = java.security.MessageDigest.getInstance("MD5")
        (0 until 4).map { j =>
          md.digest(s"$i-$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
        }.mkString
      }
      val left = ((1 to 20000).map(i => ("hot", pad(i))) ++
        (1 to 200).map(i => (s"cold$i", pad(i)))).toDF("k", "lv")
      val right = (Seq("hot") ++ (1 to 200).map(i => s"cold$i"))
        .map((_, "r")).toDF("k", "rv")
      val joined = left.join(right, Seq("k"))
      // collect (not foreach: the RDD path would run a separate query
      // execution) so THIS execution's adaptive plan reaches its final
      // form before the assertion reads it
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"AQE did not finalize:\n${plan.take(2000)}")
      assert(plan.toLowerCase.contains("skew"),
        s"AQE skew-join did not engage:\n${plan.take(4000)}")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("salted two-phase count equals direct count") {
    val sp = spark; import sp.implicits._
    val df = (Seq.fill(300)("hot") ++ Seq("a", "b", "a")).toDF("k")
    val out = Skew.saltedCount(df, Seq("k"), factor = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("hot" -> 300L, "a" -> 2L, "b" -> 1L))
  }

  test("distributed row number / skip / ntile match the window semantics") {
    val sp = spark; import sp.implicits._
    val df = (1 to 103).map(i => (103 - i, s"v$i")).toDF("k", "v")
    val rn = GlobalOrder.withRowNumber(df, Seq("k"), "rn")
      .orderBy("k").collect().map(_.getAs[Long]("rn")).toSeq
    assert(rn == (1L to 103L))
    val skipped = GlobalOrder.skipRows(df, 100, Seq("k"))
      .collect().map(_.getAs[Int]("k")).toSet
    assert(skipped == Set(100, 101, 102))
    val viaWindow = df.withColumn("bucket",
      ntile(4).over(org.apache.spark.sql.expressions.Window.orderBy("k")))
      .collect().map(r => r.getAs[Int]("k") -> r.getAs[Int]("bucket")).toMap
    val viaHelper = GlobalOrder.ntile(df, 4, Seq("k"))
      .collect().map(r => r.getAs[Int]("k") -> r.getAs[Int]("bucket")).toMap
    assert(viaHelper == viaWindow)
  }

  test("extensions class registers SQL functions in a new session") {
    val s2 = spark.newSession()
    new graft.plans.GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions)
    // register via helpers on the new session and use through SQL
    graft.plans.HashExpressions.register(s2)
    graft.plans.VectorExpressions.register(s2)
    graft.plans.ShingleExpression.register(s2)
    val r = s2.sql(
      "SELECT vec_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
        "simhash64(array('a','b')) AS h, " +
        "top_shingle_run('a b a b', 2) AS t").first()
    assert(r.getDouble(0) == 1.0)
    val t = r.getStruct(2)
    assert(t.getAs[String]("gram") == "a b" && t.getAs[Long]("cnt") == 2L &&
      t.getAs[Long]("norm_len") == 7L)
  }
}
