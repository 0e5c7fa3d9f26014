package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 curation additions: C4 paragraph dedup, ES weighted sampling,
  * temperature mixing, Gopher top-n-gram fraction, ANN recall eval.
  */
class CurationOpsSpec extends SparkSpec {

  private def sixDp(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("dedupParagraphs keeps each line only at its global first occurrence") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "alpha\nshared line\nbeta"),
      (2L, "shared line\ngamma\ngamma"), // cross-doc dup + in-doc repeat
      (3L, "shared line")                // fully deduped → empty string
    ).toDF("doc_id", "text")
    val out = Corpus.dedupParagraphs(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "alpha\nshared line\nbeta")
    assert(out(2L) == "gamma") // shared line lost to doc 1, repeat collapsed
    assert(out(3L) == "")
  }

  test("dedupParagraphs first occurrence is by (doc, position), not text order") {
    val sp = spark; import sp.implicits._
    // the dup line sits EARLIER in doc 2 than in doc 1, but doc 1 wins on id
    val docs = Seq((1L, "x\ndup"), (2L, "dup\ny")).toDF("doc_id", "text")
    val out = Corpus.dedupParagraphs(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "x\ndup" && out(2L) == "y")
  }

  test("weightedSample is a deterministic size-k draw that honors weights") {
    val sp = spark; import sp.implicits._
    val rows = (1L to 200L).map(i => (i, 10.0)) :+ (201L, 1e12)
    val df = rows.toDF("id", "w")
    val s1 = Corpus.weightedSample(df, "id", "w", k = 20).collect()
    val s2 = Corpus.weightedSample(df, "id", "w", k = 20).collect()
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq) // reproducible
    assert(s1.length == 20)
    assert(s1.map(_.getAs[Int]("sample_rank")).toSeq == (1 to 20))
    // -ln(u)/1e12 is smaller than any 10-weight key → the heavy row is in
    assert(s1.exists(_.getAs[Long]("id") == 201L))
    // keys are sorted ascending with the rank
    val keys = s1.sortBy(_.getAs[Int]("sample_rank")).map(_.getAs[Double]("sample_key"))
    assert(keys.zip(keys.tail).forall { case (a, b) => a <= b })
  }

  test("weightedSample drops non-positive weights") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, 5.0), (2L, 0.0), (3L, -1.0)).toDF("id", "w")
    val out = Corpus.weightedSample(df, "id", "w", k = 10).collect()
    assert(out.map(_.getAs[Long]("id")).toSet == Set(1L))
  }

  test("negativeSampling favors frequent terms and is deterministic") {
    val sp = spark; import sp.implicits._
    // 'hot' appears 50x, the cold terms once each — at k=3 the hot term
    // should essentially always be drawn (freq^0.75 weight dominance)
    val docs = (Seq.fill(50)("hot") ++ (1 to 20).map(i => s"cold$i"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val s1 = Corpus.negativeSampling(docs, "text", k = 3).collect()
    val s2 = Corpus.negativeSampling(docs, "text", k = 3).collect()
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq)
    assert(s1.length == 3)
    assert(s1.exists(_.getAs[String]("term") == "hot"))
    assert(s1.map(_.getAs[Int]("sample_rank")).toSeq == (1 to 3))
  }

  test("temperatureMixture: α=1 proportional, α=0 uniform, budget floors") {
    val sp = spark; import sp.implicits._
    val df = (Seq.fill(30)("big") ++ Seq.fill(10)("small")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "source")
    def shares(alpha: Double) =
      Corpus.temperatureMixture(df, "source", alpha, budget = 100L)
        .collect().map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_docs"), r.getAs[Double]("share"),
            r.getAs[Long]("docs_at_budget"))).toMap
    val prop = shares(1.0)
    assert(prop("big") == ((30L, 0.75, 75L)) && prop("small") == ((10L, 0.25, 25L)))
    val flat = shares(0.0)
    assert(flat("big")._2 == 0.5 && flat("small")._2 == 0.5)
    val t = shares(0.7) // between uniform and proportional
    assert(t("big")._2 < 0.75 && t("big")._2 > 0.5)
  }

  test("topNgramFraction finds the most frequent gram with a binary tie-break") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "a b a b c"),   // "a b"×2, "b a"×1, "b c"×1 → 2·3/9
      (2L, "z z z z"),     // "z z"×3 overlapping → 3·3/7 = 9/7
      (3L, "x y")          // single gram
    ).toDF("doc_id", "text")
    val out = Corpus.topNgramFraction(docs, "text", "doc_id", n = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[String]("top_gram"), r.getAs[Long]("gram_count"),
          r.getAs[Double]("char_fraction"))).toMap
    assert(out(1L) == (("a b", 2L, sixDp(6.0 / 9.0))))
    assert(out(2L) == (("z z", 3L, sixDp(9.0 / 7.0)))) // overlaps can pass 1
    assert(out(3L) == (("x y", 1L, 1.0)))
  }

  test("topNgramFraction tie between grams resolves to the binary-smallest") {
    val sp = spark; import sp.implicits._
    // "b a" and "a b" both appear once → "a b" wins the tie
    val out = Corpus.topNgramFraction(Seq((1L, "b a b")).toDF("doc_id", "text"),
      "text", "doc_id", n = 2).collect().head
    assert(out.getAs[String]("top_gram") == "a b")
  }

  test("annRecall is exactly 1.0 when every list is probed") {
    val sp = spark; import sp.implicits._
    val vecs = (0L until 24L).map(i =>
      (i, Array(math.cos(i * 0.26).toFloat, math.sin(i * 0.26).toFloat,
        (i % 5).toFloat / 5f, 1f)))
      .toDF("vec_id", "embedding")
    val full = Similarity.annRecall(vecs, "embedding", "vec_id", k = 3,
      nlist = 4, nprobe = 4)
    assert(full.count() == 24)
    assert(full.where(col("recall") =!= 1.0).count() == 0)
    // fewer probes can only lose candidates: recall ≤ 1, hits ≤ k
    val part = Similarity.annRecall(vecs, "embedding", "vec_id", k = 3,
      nlist = 4, nprobe = 1).collect()
    assert(part.forall(r => r.getAs[Long]("hits") <= 3L))
    assert(part.forall(r => r.getAs[Double]("recall") <= 1.0))
  }

  test("hardNegatives never returns same-label or self matches") {
    val sp = spark; import sp.implicits._
    val vecs = (0L until 30L).map(i =>
      (i, Array(math.cos(i * 0.21).toFloat, math.sin(i * 0.21).toFloat,
        (i % 4).toFloat / 4f, 1f), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(vecs, "embedding", "vec_id", "label",
      k = 3, nlist = 4, nprobe = 4).collect()
    val labels = (0L until 30L).map(i => i -> (i % 3).toInt).toMap
    out.foreach { r =>
      val q = r.getAs[Long]("query_id"); val c = r.getAs[Long]("corpus_id")
      assert(q != c, s"self match: $q")
      assert(labels(q) != labels(c), s"same-label negative: $q -> $c")
    }
    assert(out.groupBy(_.getAs[Long]("query_id")).values.forall(_.length <= 3))
    assert(out.nonEmpty)
  }

  test("prototypeScores: singleton label scores 1.0; prototype is the exact mean") {
    val sp = spark; import sp.implicits._
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f, 0f), 0),
      (3L, Array(5f, 5f, 0f, 0f), 1) // singleton: proto = itself → cos 1
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.prototypeScores(vecs, "embedding", "vec_id", "label",
        dim = 4)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Double]("proto_cosine")).toMap
    assert(out(3L) == 1.0)
    // label-0 proto = (0.5, 0.5, 0, 0); cos to either axis vector = 1/√2
    val expected = sixDp(1.0 / math.sqrt(2.0))
    assert(out(1L) == expected && out(2L) == expected)
  }

  test("prototypeOutliers returns the k least prototypical per label, ascending") {
    val sp = spark; import sp.implicits._
    val vecs = ((0L until 12L).map(i =>
      (i, Array(1f, (i % 2).toFloat * 0.1f, 0f, 0f), 0)) :+
      (99L, Array(0f, 0f, 1f, 0f), 0)) // far from the label-0 prototype
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.prototypeOutliers(vecs, "embedding", "vec_id", "label",
        k = 3, dim = 4)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(out.length == 3)
    assert(out.head.getAs[Long]("vec_id") == 99L) // worst first
    val cos = out.map(_.getAs[Double]("proto_cosine"))
    assert(cos.zip(cos.tail).forall { case (a, b) => a <= b })
  }

  test("kmeansAssign covers every row with a DENSE cluster in [0, k) deterministically") {
    val sp = spark; import sp.implicits._
    // ids start at 1000 on purpose: labels must be dense 0..k-1, not
    // raw seed corpus ids
    val vecs = (1000L until 1040L).map(i =>
      (i, Array(math.cos(i * 0.17).toFloat, math.sin(i * 0.17).toFloat,
        (i % 5).toFloat, 1f)))
      .toDF("vec_id", "embedding")
    val a1 = Similarity.kmeansAssign(vecs, "embedding", "vec_id", k = 4)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("cluster")).toMap
    val a2 = Similarity.kmeansAssign(vecs, "embedding", "vec_id", k = 4)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("cluster")).toMap
    assert(a1 == a2)               // deterministic under re-run
    assert(a1.size == 40)          // every row assigned exactly once
    assert(a1.values.forall(c => c >= 0 && c < 4))
  }

  test("kmeansAssign trainFraction: sampled training still assigns every row; empty sample raises") {
    val sp = spark; import sp.implicits._
    val vecs = (1000L until 1040L).map(i =>
      (i, Array((i % 7).toFloat, (i % 3).toFloat, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssign(vecs, "embedding", "vec_id", k = 4,
      trainFraction = 0.5).collect()
    assert(out.length == 40) // assignment covers the FULL corpus
    assert(out.map(_.getAs[Int]("cluster")).forall(c => c >= 0 && c < 4))
    // a sample that selects nothing must fail fast, not assign zero rows
    val ex = intercept[IllegalArgumentException] {
      Similarity.kmeansAssign(vecs, "embedding", "vec_id", k = 4,
        trainFraction = 1e-6).collect()
    }
    assert(ex.getMessage.contains("selected no"))
  }

  test("clusterProfile with an assignment's params describes that clustering") {
    val sp = spark; import sp.implicits._
    val vecs = (1000L until 1040L).map(i =>
      (i, Array(math.cos(i * 0.3).toFloat, math.sin(i * 0.3).toFloat, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val assign = Similarity.kmeansAssign(vecs, "embedding", "vec_id", k = 3)
      .collect().groupBy(_.getAs[Int]("cluster")).view.mapValues(_.length.toLong)
    val profile = Similarity.clusterProfile(vecs, "embedding", "vec_id", k = 3)
      .collect().map(r => r.getAs[Int]("cluster") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Double]("avg_cosine"))).toMap
    assert(profile.view.mapValues(_._1).toMap == assign.toMap) // same sizes per label
    assert(profile.values.forall { case (_, cos) => cos >= -1.0 && cos <= 1.0 })
  }

  test("bm25Search ranks rare-term matches above common-term matches") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "rare word here"),            // the only 'rare' doc
      (2L, "common common common word"),  // high tf of a low-idf term
      (3L, "common word"),
      (4L, "nothing relevant at all")
    ).toDF("doc_id", "text")
    val out = Corpus.bm25Search(docs, "text", "doc_id",
        Seq("rare", "common"), k = 10)
      .collect().sortBy(_.getAs[Int]("rank"))
    // doc 4 matches nothing → absent; doc 1's rare term dominates
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 3L))
    assert(out.head.getAs[Long]("doc_id") == 1L)
    // tf saturation: doc 2 (tf=3) beats doc 3 (tf=1) on the same term
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(byId(2L) > byId(3L))
    assert(out.map(_.getAs[Int]("rank")).toSeq == (1 to 3))
  }

  test("bm25Search length normalization: shorter doc wins at equal tf") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "term"),                       // dl 1
      (2L, "term plus lots of other padding words everywhere")
    ).toDF("doc_id", "text")
    val out = Corpus.bm25Search(docs, "text", "doc_id", Seq("term"), k = 5)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(out.head.getAs[Long]("doc_id") == 1L)
  }

  test("rrfFuse: agreement across lists beats a single first place") {
    val sp = spark; import sp.implicits._
    val l1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val l2 = Seq((40L, 1), (20L, 2), (30L, 4)).toDF("id", "rank")
    val out = Similarity.rrfFuse(Seq(l1, l2), "id", k = 10)
      .collect().sortBy(_.getAs[Int]("rank"))
    // 20 appears at rank 2 in BOTH lists: 2/62 > 1/61 (any single #1)
    assert(out.head.getAs[Long]("id") == 20L)
    assert(out.head.getAs[Long]("n_lists") == 2L)
    // singles carry n_lists = 1 and sort by their one reciprocal rank
    val byId = out.map(r => r.getAs[Long]("id") ->
      r.getAs[Long]("n_lists")).toMap
    assert(byId(10L) == 1L && byId(40L) == 1L)
    assert(out.map(_.getAs[Int]("rank")).toSeq == (1 to 4))
  }

  test("rrfFuse tie between equal fused scores breaks on id") {
    val sp = spark; import sp.implicits._
    val l1 = Seq((7L, 1), (3L, 2)).toDF("id", "rank")
    val l2 = Seq((3L, 1), (7L, 2)).toDF("id", "rank")
    val out = Similarity.rrfFuse(Seq(l1, l2), "id", k = 5)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(3L, 7L))
  }

  test("iqrOutliers flags exactly the out-of-fence rows per group") {
    val sp = spark; import sp.implicits._
    // group a: tight cluster + one far point; group b: all tight
    val df = (Seq.tabulate(20)(i => (i.toLong, "a", 10.0 + (i % 5))) ++
      Seq((100L, "a", 1000.0)) ++
      Seq.tabulate(10)(i => (200L + i, "b", 5.0))).toDF("id", "grp", "v")
    val out = Features.iqrOutliers(df, "v", Seq("grp")).collect()
    assert(out.map(_.getAs[Long]("id")).toSet == Set(100L))
    val r = out.head
    assert(r.getAs[Double]("v") > r.getAs[Double]("fence_hi"))
  }

  test("iqrOutliers: zero factor flags everything outside the interquartile box") {
    val sp = spark; import sp.implicits._
    val df = (1L to 8L).map(i => (i, "g", i.toDouble)).toDF("id", "grp", "v")
    val out = Features.iqrOutliers(df, "v", Seq("grp"), factor = 0.0)
      .collect().map(_.getAs[Long]("id")).toSet
    // q1=2.75, q3=6.25 → values 1,2 and 7,8 fall outside
    assert(out == Set(1L, 2L, 7L, 8L))
  }

  test("annRecall query sampling evaluates a strict deterministic subset") {
    val sp = spark; import sp.implicits._
    val vecs = (0L until 40L).map(i =>
      (i, Array((i % 7).toFloat, (i % 3).toFloat, 1f, (i % 2).toFloat)))
      .toDF("vec_id", "embedding")
    val sampled = Similarity.annRecall(vecs, "embedding", "vec_id", k = 3,
      nlist = 4, nprobe = 4, queryFraction = 0.3)
    val n = sampled.count()
    assert(n > 0 && n < 40)
    val again = Similarity.annRecall(vecs, "embedding", "vec_id", k = 3,
      nlist = 4, nprobe = 4, queryFraction = 0.3).count()
    assert(again == n)
  }

  test("zipfSlope: hand-checked two-point slope; zipfian text lands near -1") {
    val sp = spark; import sp.implicits._
    // one source, freq 4 for 'a', freq 2 for 'b': slope through
    // (log2 1, log2 4)=(0,2) and (log2 2, log2 2)=(1,1) is exactly -1
    val tiny = Seq((1L, "s", "a a a a b b")).toDF("id", "source", "text")
    val one = Corpus.zipfSlope(tiny, "text", "source").first()
    assert(one.getAs[Long]("n_terms_used") == 2L)
    assert(one.getAs[Double]("zipf_slope") == -1.0)
    // synthetic zipf corpus: term t_r appears ~N/r times
    val zipf = (1 to 50).flatMap(r => Seq.fill(600 / r)(s"t$r")).mkString(" ")
    val s2 = Corpus.zipfSlope(Seq((1L, "z", zipf)).toDF("id", "source", "text"),
      "text", "source").first().getAs[Double]("zipf_slope")
    assert(s2 < -0.85 && s2 > -1.15, s"expected near -1, got $s2")
  }

  test("calibrateQuality: percent ranks per source, ties share, singleton is 0") {
    val sp = spark; import sp.implicits._
    // quality is monotone in length below 500 chars — engineer distinct
    // scores via distinct lengths, plus an exact tie via identical text
    val docs = Seq(
      (1L, "a", "short text"),
      (2L, "a", "short text"),                       // tie with doc 1
      (3L, "a", "a much longer piece of text " * 4),
      (4L, "b", "only document in its source")
    ).toDF("doc_id", "source", "text")
    val out = Corpus.calibrateQuality(docs, "text", "doc_id", "source")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L)._2 == 0.0 && out(2L)._2 == 0.0) // tied lowest share rank 0
    assert(out(1L)._1 == out(2L)._1)
    assert(out(3L)._2 == 1.0) // top of a 3-doc source: (3-1)/(3-1)
    assert(out(4L)._2 == 0.0) // singleton source pins to 0, not NaN
  }

  test("sourceDivergence: identical sources at 0, disjoint pairs absent, asymmetric mass") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "s1", "alpha beta gamma alpha"),
      (2L, "s2", "alpha beta gamma alpha"),   // identical distribution
      (3L, "s3", "delta epsilon zeta"),        // disjoint from s1/s2
      (4L, "s4", "alpha beta something else")  // partial overlap
    ).toDF("id", "source", "text")
    val out = Corpus.sourceDivergence(docs, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_shared_terms"), r.getAs[Double]("jsd")))).toMap
    assert(out(("s1", "s2")) == ((3L, 0.0))) // same distribution → 0 bits
    assert(!out.contains(("s1", "s3"))) // zero shared terms → row absent (JSD 1)
    val partial = out(("s1", "s4"))._2
    assert(partial > 0.0 && partial < 1.0)
    // JSD is symmetric even though the pair is ordered
    assert(out(("s2", "s4"))._2 == out(("s1", "s4"))._2)
  }
}
