package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {

  private lazy val docs = {
    val sp = spark; import sp.implicits._
    (1 to 200).map(i => (i.toLong, s"the quick document number $i with several words", "en"))
      .toDF("doc_id", "text", "lang")
  }

  test("profile aggregates per language") {
    val p = Corpus.profile(docs, "text", "lang").first()
    assert(p.getAs[Long]("n_docs") == 200)
    assert(p.getAs[Long]("total_tokens") == 200 * 8)
  }

  test("hash split is deterministic, exhaustive, and roughly proportional") {
    val s1 = Corpus.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val s2 = Corpus.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val m1 = s1.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val m2 = s2.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(m1 == m2) // stable across runs
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 200)
    assert(counts("train") > counts.getOrElse("val", 0L))
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
  }

  private lazy val webDocs = {
    val sp = spark; import sp.implicits._
    Seq(
      (1L, "unique story one\nSubscribe now!\nCopyright 2026"),
      (2L, "another body here\nSubscribe now!\nCopyright 2026"),
      (3L, "third article text\n  Subscribe now!  \nsomething else"),
      (4L, "Subscribe now!\nCopyright 2026"), // all boilerplate
      (5L, "free-standing document with no footer at all")
    ).toDF("doc_id", "text")
  }

  test("boilerplateParagraphs finds high-doc-freq lines, trimmed, ignoring blanks") {
    val bp = Corpus.boilerplateParagraphs(webDocs, "text", "doc_id", minDocFreq = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bp == Map("Subscribe now!" -> 4L, "Copyright 2026" -> 3L))
  }

  test("stripBoilerplate removes flagged lines, keeps order, empties all-boilerplate docs") {
    val out = Corpus.stripBoilerplate(webDocs, "text", "doc_id", minDocFreq = 3L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "unique story one")
    assert(out(3L) == "third article text\nsomething else")
    assert(out(4L) == "")
    assert(out(5L) == "free-standing document with no footer at all")
  }

  test("topTerms ranks per group with deterministic term tiebreak") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "b b a a c", "en"), (2L, "b z", "en"),
      (3L, "x y", "de")
    ).toDF("doc_id", "text", "lang")
    val out = Corpus.topTerms(df, "text", "lang", k = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // en: b=3, a=2; de: x=1,y=1 tie → term asc
    assert(out.toSet == Set(("en", "b", 3L, 1L), ("en", "a", 2L, 2L),
      ("de", "x", 1L, 1L), ("de", "y", 1L, 2L)))
  }

  test("different salt produces a different assignment") {
    val a = Corpus.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val b = Corpus.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.5), salt = "other")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(a != b)
  }

  test("stratified sample: per-group rates, deterministic, map-side") {
    val sp = spark; import sp.implicits._
    val mixed = (1 to 400).map(i =>
      (i.toLong, s"doc $i", if (i % 2 == 0) "en" else "de")).toDF("doc_id", "text", "lang")
    val rates = Seq("en" -> 0.5, "de" -> 0.1)
    val s1 = Corpus.stratifiedSample(mixed, "doc_id", "lang", rates)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val s2 = Corpus.stratifiedSample(mixed.repartition(7), "doc_id", "lang", rates)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(s1 == s2, "sample membership must not depend on partitioning")
    val en = s1.count(_ % 2 == 0); val de = s1.count(_ % 2 == 1)
    assert(en > 60 && en < 140, s"~50% of 200 en docs expected, got $en")
    assert(de > 5 && de < 45, s"~10% of 200 de docs expected, got $de")
    // unlisted groups follow defaultRate (here: keep everything)
    val zh = (1 to 100).map(i => (1000L + i, s"z $i", "zh")).toDF("doc_id", "text", "lang")
    assert(Corpus.stratifiedSample(zh, "doc_id", "lang", rates,
      defaultRate = 1.0).count() == 100)
    // no shuffle: the filter is map-side
    val plan = Corpus.stratifiedSample(mixed, "doc_id", "lang", rates)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "stratified sample must not shuffle")
  }

  test("contamination flags eval-overlapping docs; decontaminate drops them") {
    val sp = spark; import sp.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "an entirely different document about spark execution plans"),
      (3L, "someone copied the quick brown fox jumps over the lazy dog verbatim"),
      (4L, "shares nothing with any evaluation prompt at all")).toDF("doc_id", "text")
    val evalSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val flagged = Corpus.contamination(corpus, evalSet, "text", "doc_id",
      shingleWords = 3, minShared = 2L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("eval_id"),
        r.getAs[Long]("shared_shingles")))
    assert(flagged.map(_._1).toSet == Set(1L, 3L), s"got ${flagged.toSeq}")
    assert(flagged.forall(_._2 == 100L))
    assert(flagged.forall(_._3 >= 2L))
    val clean = Corpus.decontaminate(corpus, evalSet, "text", "doc_id",
      shingleWords = 3, minShared = 2L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(clean == Set(2L, 4L))
    // the eval posting list is broadcast — corpus side must not exchange
    // before the flag aggregation
    val plan = Corpus.contamination(corpus, evalSet, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"eval side should broadcast:\n$plan")
  }

  test("quality gate + stratified sample run unchanged on a stream") {
    // both operators are stateless Column predicates, so the SAME code
    // curates a Structured Streaming ingest — no batch/stream divergence
    val sp = spark; import sp.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)]
    val goodText = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet forest for a while longer than expected " +
      "today with friends and a calm steady pace that is natural text " * 2
    mem.addData((1 to 50).map(i =>
      (i.toLong, if (i % 5 == 0) "@@@@ 123 !!!!" else goodText,
        if (i % 2 == 0) "en" else "de")): _*)
    val curated = Corpus.stratifiedSample(
      Corpus.qualityFilter(
        mem.toDF.toDF("doc_id", "text", "lang"), "text", minScore = 0.5),
      "doc_id", "lang", Seq("en" -> 1.0, "de" -> 0.0))
    val q = curated.writeStream.format("memory").queryName("curate_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("curate_stream").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      // survivors: even ids (en, rate 1.0) that pass the gate (not % 5 == 0)
      assert(ids == (2 to 50 by 2).filterNot(_ % 5 == 0).map(_.toLong).toSet)
    } finally q.stop()
  }

  test("shuffle assigns a stable 1..N permutation, independent of input partitioning") {
    val sp = spark; import sp.implicits._
    val docs = (1 to 200).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val a = Corpus.shuffle(docs, "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shuffle_pos")).toMap
    val b = Corpus.shuffle(docs.repartition(7), "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shuffle_pos")).toMap
    assert(a == b) // partitioning-independent
    assert(a.values.toSeq.sorted == (1L to 200L)) // a permutation
    assert(a != (1 to 200).map(i => i.toLong -> i.toLong).toMap) // actually shuffled
    // a different salt gives a different permutation
    val c = Corpus.shuffle(docs, "doc_id", salt = "epoch-2").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shuffle_pos")).toMap
    assert(c != a)
  }

  test("mixture keeps per-source rates deterministically and tags provenance") {
    val sp = spark; import sp.implicits._
    val docs = (1 to 1000).map(i => (i.toLong, "x")).toDF("doc_id", "text")
    val mixed = Corpus.mixture(Seq(
      ("full", docs, 1.0), ("third", docs, 0.3), ("none", docs, 0.0)), "doc_id")
    val bySource = mixed.groupBy("mix_source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource("full") == 1000L)
    assert(!bySource.contains("none"))
    assert(bySource("third") > 230 && bySource("third") < 370) // ~300 ± hash noise
    // deterministic: the same call selects the same rows
    val t1 = mixed.where(col("mix_source") === "third").select("doc_id").collect().toSet
    val t2 = Corpus.mixture(Seq(("third", docs, 0.3)), "doc_id")
      .select("doc_id").collect().toSet
    assert(t1 == t2)
    assertThrows[IllegalArgumentException](
      Corpus.mixture(Seq(("over", docs, 1.5)), "doc_id"))
  }

  test("packSequences: chunk spans follow the running token total exactly") {
    val sp = spark; import sp.implicits._
    val docs = (1 to 100).map(i => (i.toLong, Seq.fill(i % 17 + 1)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val packed = Corpus.packSequences(docs, "doc_id", "text", budgetTokens = 50L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("first_chunk"), r.getAs[Long]("last_chunk")))
    assert(packed.length == 100)
    // reconstruct the stream order independently and verify every span
    val hashed = packed.sortBy { case (id, _, _, _) => id }
    val ordered = Corpus.shuffle(docs, "doc_id", salt = "graft-pack").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shuffle_pos")).toMap
    var cum = 0L
    hashed.map { case (id, n, f, l) => (ordered(id), id, n, f, l) }
      .sortBy(_._1).foreach { case (_, id, n, f, l) =>
        assert(f == cum / 50, s"doc $id first_chunk")
        assert(l == math.max(cum / 50, (cum + n - 1) / 50), s"doc $id last_chunk")
        cum += n
      }
    // chunks tile the stream: no chunk index gaps
    val allChunks = packed.flatMap { case (_, _, f, l) => f to l }.toSet
    assert(allChunks == (0L to allChunks.max).toSet)
  }

  test("duplicateSpanFraction flags the shared span, not the unique text") {
    val sp = spark; import sp.implicits._
    val shared = (1 to 10).map(i => s"s$i").mkString(" ") // 10 shared tokens
    val docs = Seq(
      (1L, shared + " " + (1 to 20).map(i => s"a$i").mkString(" ")),
      (2L, shared + " " + (1 to 20).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 30).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    val out = Corpus.duplicateSpanFraction(docs, "text", "doc_id", shingleWords = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("dup_shingles"))).toMap
    // 30 tokens → 26 distinct 5-shingles per doc; only the 6 fully inside
    // the shared 10-token prefix are duplicated across docs 1 and 2
    assert(out(1L) == (26L, 6L) && out(2L) == (26L, 6L))
    assert(out(3L) == (26L, 0L))
  }

  test("oversample: floor copies + deterministic fractional epoch") {
    val sp = spark; import sp.implicits._
    val docs = (1 to 1000).map(i => (i.toLong, "x")).toDF("doc_id", "text")
    val out = Corpus.oversample(docs, "doc_id", weight = 2.3)
    val byEpoch = out.groupBy("epoch").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byEpoch(0L) == 1000L && byEpoch(1L) == 1000L)
    assert(byEpoch(2L) > 230 && byEpoch(2L) < 370) // ~300 ± hash noise
    // deterministic fractional membership
    val f1 = out.where(col("epoch") === 2).select("doc_id").collect().toSet
    val f2 = Corpus.oversample(docs.repartition(5), "doc_id", 2.3)
      .where(col("epoch") === 2).select("doc_id").collect().toSet
    assert(f1 == f2)
    // weight < 1 degenerates to a pure sample at epoch 0
    val frac = Corpus.oversample(docs, "doc_id", 0.5)
    assert(frac.select("epoch").distinct().collect().map(_.getLong(0)).toSeq == Seq(0L))
    assertThrows[IllegalArgumentException](Corpus.oversample(docs, "doc_id", 0.0))
  }

  test("chunkDocuments: overlapping windows reconstruct the token stream") {
    val sp = spark; import sp.implicits._
    val text40 = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text40), (2L, "only three tokens"), (3L, "")).toDF("doc_id", "text")
    val chunks = Corpus.chunkDocuments(docs, "doc_id", "text",
      chunkTokens = 16, overlapTokens = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    // stride 12: chunks at tokens 1-16, 13-28, 25-40 → ceil((40-4)/12) = 3
    assert(d1.length == 3)
    assert(d1(0) == (1 to 16).map(i => s"w$i").mkString(" "))
    assert(d1(1) == (13 to 28).map(i => s"w$i").mkString(" "))
    assert(d1(2) == (25 to 40).map(i => s"w$i").mkString(" "))
    // consecutive chunks share exactly the 4-token overlap
    assert(d1(0).split(" ").takeRight(4).toSeq == d1(1).split(" ").take(4).toSeq)
    // short and empty docs produce exactly one chunk, text verbatim
    assert(chunks.filter(_._1 == 2L).map(_._3).toSeq == Seq("only three tokens"))
    assert(chunks.filter(_._1 == 3L).map(_._3).toSeq == Seq(""))
    assertThrows[IllegalArgumentException](
      Corpus.chunkDocuments(docs, "doc_id", "text", 8, 8))
  }

  test("unigram model: exact smoothed log-probs on a tiny corpus") {
    val sp = spark; import sp.implicits._
    // tokens: a a a b  ->  T=4, V=2; p(a)=(3+1)/(4+2)=2/3, p(b)=(1+1)/6=1/3
    val c = Seq((1L, "a a A."), (2L, "b")).toDF("doc_id", "text")
    val m = Corpus.unigramModel(c, "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(m("a") - math.log(2.0 / 3.0)) < 1e-12)
    assert(math.abs(m("b") - math.log(1.0 / 3.0)) < 1e-12)
  }

  test("unigram scoring: per-doc mean logp, OOV fallback, empty docs drop") {
    val sp = spark; import sp.implicits._
    val corpus = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val model = Corpus.unigramModel(corpus, "text")
    val oov = Corpus.oovLogProb(totalTokens = 4.0, vocabSize = 2.0)
    assert(math.abs(oov - math.log(1.0 / 6.0)) < 1e-12)
    val cand = Seq((10L, "a b"), (11L, "a zzz"), (12L, "...")).toDF("doc_id", "text")
    val out = Corpus.unigramLogProb(cand, "text", "doc_id", model, oov)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("avg_logp"), r.getAs[Long]("n_tokens"))).toMap
    // doc 12 normalizes to zero tokens and drops
    assert(out.keySet == Set(10L, 11L))
    val exp10 = (math.log(2.0 / 3.0) + math.log(1.0 / 3.0)) / 2.0
    val exp11 = (math.log(2.0 / 3.0) + oov) / 2.0
    assert(math.abs(out(10L)._1 - BigDecimal(exp10).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(out(11L)._1 - BigDecimal(exp11).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(10L)._2 == 2L && out(11L)._2 == 2L)
    // in-vocab docs score above OOV-heavy ones: the gate orders correctly
    assert(out(10L)._1 > out(11L)._1)
  }

  test("decontaminateSpans removes quoted eval lines, keeps the rest in order") {
    val sp = spark; import sp.implicits._
    val evalSet = Seq((0L, "secret benchmark answer key held out")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "clean opening line here\nsecret benchmark answer key held out\nclean closing line here"),
      (2L, "totally unrelated document text"),
      (3L, "secret benchmark answer key held out")).toDF("doc_id", "text")
    val out = Corpus.decontaminateSpans(corpus, evalSet, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "clean opening line here\nclean closing line here")
    assert(out(2L) == "totally unrelated document text")
    assert(out(3L) == "") // fully contaminated -> empty, not dropped
  }

  test("profileSketch: HLL distincts within rsd bounds, percentiles sane") {
    val sp = spark; import sp.implicits._
    val many = (1 to 2000).map(i => (i.toLong, s"doc body $i " + ("x " * (i % 50))))
      .toDF("doc_id", "text")
    val r = Corpus.profileSketch(many, "text", "doc_id", rsd = 0.02).first()
    assert(r.getAs[Long]("n_rows") == 2000L)
    // HLL++ at rsd=0.02: allow 5 sigma-ish slack
    assert(math.abs(r.getAs[Long]("approx_ids") - 2000L) <= 200L)
    assert(math.abs(r.getAs[Long]("approx_texts") - 2000L) <= 200L)
    val p50 = r.getAs[Long]("p50_tokens"); val p99 = r.getAs[Long]("p99_tokens")
    assert(p50 >= 3L && p50 <= 60L && p99 >= p50)
  }

  test("bigram model: exact conditional log-probs; scoring penalizes scrambled order") {
    val sp = spark; import sp.implicits._
    // corpus bigrams: (a,b) ×2, (b,a) ×1 → c1(a)=2, c1(b)=1; vocab {a,b} V=2
    val corpus = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val m = Corpus.bigramModel(corpus, "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(m(("a", "b")) - math.log(3.0 / 4.0)) < 1e-12) // (2+1)/(2+2)
    assert(math.abs(m(("b", "a")) - math.log(2.0 / 3.0)) < 1e-12) // (1+1)/(1+2)
    // in-order candidate scores higher than order-scrambled same bag
    val cand = Seq((10L, "a b a b"), (11L, "b b a a"), (12L, "a")).toDF("doc_id", "text")
    val out = Corpus.bigramLogProb(cand, "text", "doc_id", corpus)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("avg_logp"), r.getAs[Long]("n_bigrams"))).toMap
    assert(out.keySet == Set(10L, 11L)) // single-token doc has no bigram
    assert(out(10L)._2 == 3L && out(11L)._2 == 3L)
    assert(out(10L)._1 > out(11L)._1)
    // unseen history (b,b): ln((0+1)/(1+2)); unseen pair (a,a): ln((0+1)/(2+2))
    val exp11 = (math.log(1.0 / 3.0) + math.log(2.0 / 3.0) + math.log(1.0 / 4.0)) / 3.0
    assert(math.abs(out(11L)._1 - BigDecimal(exp11).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("tfidf keywords: exact scores, integer-key ranking, k cap") {
    val sp = spark; import sp.implicits._
    // corpus of 2 docs; 'rare' appears only in doc 1, 'the' in both
    val c = Seq(
      (1L, "the the rare word"),
      (2L, "the other word")).toDF("doc_id", "text")
    val out = Corpus.tfidfKeywords(c, "text", "doc_id", k = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
        r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Double]("score"),
        r.getAs[Long]("rnk")))
    val d1 = out.filter(_._1 == 1L).sortBy(_._6)
    // doc 1: tf(the)=2 ranks first on tf; then tf=1 terms by df asc →
    // 'rare' (df=1) before 'word' (df=2); k=2 keeps (the, rare)
    assert(d1.map(_._2).toSeq == Seq("the", "rare"))
    // score('the' in doc1) = (2/4)·ln(2/2) = 0; score(rare) = (1/4)·ln(2)
    assert(d1(0)._5 == 0.0)
    assert(math.abs(d1(1)._5 - BigDecimal(math.log(2.0) / 4.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // doc 2: all tf=1 → df asc puts 'other' (df=1) first, then the/word (df=2) by term
    val d2 = out.filter(_._1 == 2L).sortBy(_._6)
    assert(d2.map(_._2).toSeq == Seq("other", "the"))
  }

  test("quality filter keeps high-quality docs only") {
    val sp = spark; import sp.implicits._
    val mixed = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and keeps running through the quiet forest for a while longer than expected today with friends and a calm steady pace that is natural text " * 3),
      (2L, "@@@@ #### $$$$ 123123123 !!!!")).toDF("doc_id", "text")
    val kept = Corpus.qualityFilter(mixed, "text", 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("token-budget mixture keeps roughly the budgeted token volume") {
    val sp = spark; import sp.implicits._
    val mixed = (1 to 400).map { i =>
      val src = if (i <= 200) "big" else "keepall"
      (i.toLong, "word " * 10, src)
    }.toDF("doc_id", "text", "source")
    // big: 200 docs × 10 tokens = 2000 tokens, budget 500 → rate 0.25
    val kept = Corpus.tokenBudgetMixture(mixed, "text", "source", "doc_id",
        budgets = Seq("big" -> 500L))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val bigKept = kept.count(_._2 == "big")
    assert(bigKept > 20 && bigKept < 80, s"expected ~50 of 200, got $bigKept")
    // unlisted source keeps everything
    assert(kept.count(_._2 == "keepall") == 200)
    // deterministic across runs
    val again = Corpus.tokenBudgetMixture(mixed, "text", "source", "doc_id",
        budgets = Seq("big" -> 500L))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    assert(kept.toSet == again.toSet)
    // budget >= total keeps the whole source
    val all = Corpus.tokenBudgetMixture(mixed, "text", "source", "doc_id",
        budgets = Seq("big" -> 10000L)).count()
    assert(all == 400L)
  }

  test("curriculum bins tier by ascending quality with near-equal sizes") {
    val sp = spark; import sp.implicits._
    val mixed = (1 to 23).map { i =>
      // longer docs score higher on the length term → increasing quality
      (i.toLong, ("the quick brown fox jumps over it " * i).trim)
    }.toDF("doc_id", "text")
    val bins = Corpus.curriculumBins(mixed, "text", "doc_id", k = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("quality"),
        r.getAs[Long]("bin")))
    assert(bins.length == 23)
    val sizes = bins.groupBy(_._3).view.mapValues(_.length).toMap
    // 23 over 4 bins → 6,6,6,5 with the large bins first
    assert(sizes == Map(1L -> 6, 2L -> 6, 3L -> 6, 4L -> 5))
    // bins are ordered: every doc in a higher bin has quality >= any lower
    for (b <- 1L to 3L) {
      val maxLower = bins.filter(_._3 == b).map(_._2).max
      val minHigher = bins.filter(_._3 == b + 1).map(_._2).min
      assert(minHigher >= maxLower)
    }
  }

  test("winnowing guarantees a shared fingerprint for long shared runs") {
    val sp = spark; import sp.implicits._
    val run = "alpha beta gamma delta epsilon zeta eta theta" // 8 words = w+k−1
    val docs = Seq(
      (1L, s"unique opening words here then $run and unique tail one"),
      (2L, s"completely different front matter text $run with other ending")
    ).toDF("doc_id", "text")
    val fp = Corpus.winnowFingerprints(docs, "text", "doc_id", k = 5, windowSize = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp_hash"))
    val d1 = fp.filter(_._1 == 1L).map(_._2).toSet
    val d2 = fp.filter(_._1 == 2L).map(_._2).toSet
    // the Schleimer guarantee: a shared run of windowSize + k − 1 words
    // must produce at least one common fingerprint
    assert(d1.intersect(d2).nonEmpty)
    // and unrelated docs share none
    val other = Seq((3L, "entirely disjoint vocabulary covering separate topics now"))
      .toDF("doc_id", "text")
    val fp3 = Corpus.winnowFingerprints(docs.unionAll(other), "text", "doc_id",
        k = 5, windowSize = 4)
      .collect().filter(_.getAs[Long]("doc_id") == 3L).map(_.getAs[Long]("fp_hash")).toSet
    assert(fp3.intersect(d1).isEmpty)
  }

  test("winnowing guarantee holds under randomized shared-run placement") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(11L)
    val vocabA = Vector("red", "blue", "green", "amber", "violet", "teal",
      "coral", "olive", "navy", "plum", "rust", "sage")
    val vocabB = Vector("stone", "river", "cloud", "ember", "frost", "grove",
      "ridge", "vale", "dune", "marsh", "crag", "heath")
    val k = 5; val w = 4; val runLen = w + k - 1 // 8 shared words
    val cases = (0 until 12).map { i =>
      // a shared run placed at a random offset inside two docs built from
      // DISJOINT vocabularies (so only the run can collide)
      val run = (0 until runLen).map(_ => s"shared${rnd.nextInt(40)}").mkString(" ")
      def doc(v: Vector[String]) = {
        val pre = (0 until rnd.nextInt(12)).map(_ => v(rnd.nextInt(v.size)))
        val post = (0 until rnd.nextInt(12)).map(_ => v(rnd.nextInt(v.size)))
        (pre ++ Seq(run) ++ post).mkString(" ")
      }
      (i, doc(vocabA), doc(vocabB))
    }
    val docs = cases.flatMap { case (i, a, b) =>
      Seq((i * 2L, a), (i * 2L + 1, b)) }.toDF("doc_id", "text")
    val fp = Corpus.winnowFingerprints(docs, "text", "doc_id", k, w)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp_hash"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // every pair sharing the full run must share >= 1 fingerprint
    cases.foreach { case (i, _, _) =>
      val shared = fp(i * 2L).intersect(fp(i * 2L + 1))
      assert(shared.nonEmpty, s"case $i: guarantee violated")
    }
  }

  test("winnow pairs flag embedded copies and skip unrelated docs") {
    val sp = spark; import sp.implicits._
    val stolen = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, s"original article starts here $stolen and continues with more"),
      (2L, s"a plagiarised rework text that embeds $stolen inside other words"),
      (3L, "completely unrelated content about different things entirely now ok")
    ).toDF("doc_id", "text")
    val pairs = Corpus.winnowPairs(docs, "text", "doc_id",
        k = 5, windowSize = 4, minShared = 2L)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("maxDocFreq kills the hot-boilerplate fingerprint fan-out") {
    val sp = spark; import sp.implicits._
    // 40 docs all ending in the same footer (the planted hot fingerprint
    // — winnowing selects boilerplate by design) + one genuine copy pair
    // whose shared run is unique to it
    val footer = "copyright acme corp all rights reserved contact us today"
    val stolen = "plutonium osmium iridium rhenium tantalum hafnium lutetium ytterbium"
    val boiler = (1L to 40L).map(i =>
      (i, s"document number $i unique body text item$i widget$i gadget$i $footer"))
    val copies = Seq(
      (100L, s"original piece containing $stolen and only here"),
      (101L, s"rework that lifted $stolen wholesale from the original $footer"))
    val docs = (boiler ++ copies).toDF("doc_id", "text")
    val uncapped = Corpus.winnowPairs(docs, "text", "doc_id", minShared = 1L,
      maxDocFreq = 0L)
    val capped = Corpus.winnowPairs(docs, "text", "doc_id", minShared = 1L,
      maxDocFreq = 10L)
    val cp = capped.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    // uncapped (explicit 0): footer fingerprints pair all 41 footer docs
    // quadratically
    assert(uncapped.count() > 700L)
    // capped: the boilerplate-only pairs vanish; the genuine copy survives
    // because its shared run's fingerprints have df = 2
    assert(cp.toSeq == Seq((100L, 101L)))
    // the DEFAULT is now a protected path: Dedup.autoMaxDocFreq(42) = 32
    // < the footer's full-run df 41, so the hottest (context-independent)
    // footer fingerprints are capped out of the box. Winnowing's window-min
    // selection keeps context-DEPENDENT footer fingerprints at df < 32, so
    // the default prunes strictly (not to the tight explicit cap) and the
    // genuine copy pair always survives
    assert(Dedup.autoMaxDocFreq(42L) == 32L)
    val dflt = Corpus.winnowPairs(docs, "text", "doc_id", minShared = 1L)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(dflt.length < uncapped.count())
    assert(dflt.contains((100L, 101L)))
    // incremental flavor: same cap measured on the corpus index df
    val idx = Corpus.winnowFingerprints(docs, "text", "doc_id")
    val batch = Seq((500L, s"fresh submission with $footer only")).toDF("doc_id", "text")
    val inc = Corpus.incrementalWinnowPairs(batch, idx, "text", "doc_id",
      minShared = 1L, maxDocFreq = 10L)
    assert(inc.count() == 0L)
    val incUncapped = Corpus.incrementalWinnowPairs(batch, idx, "text", "doc_id",
      minShared = 1L, maxDocFreq = 0L)
    assert(incUncapped.count() > 0L)
  }

  test("incremental winnow pairs hit the persisted index without re-fingerprinting") {
    val sp = spark; import sp.implicits._
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, s"corpus document one holding $run in the middle"),
      (2L, "corpus document two with entirely different material here")
    ).toDF("doc_id", "text")
    val index = Corpus.winnowFingerprints(corpus, "text", "doc_id")
    val batch = Seq(
      (100L, s"a brand new submission that copies $run verbatim"),
      (101L, "a genuinely novel submission about something else entirely")
    ).toDF("doc_id", "text")
    val hits = Corpus.incrementalWinnowPairs(batch, index, "text", "doc_id")
      .collect().map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("corpus_id")))
    assert(hits.toSeq == Seq((100L, 1L)))
  }

  test("incremental winnow pairs reject an index without the scheme tag") {
    val sp = spark; import sp.implicits._
    // an index persisted by an older tokenizer/hash carries no (or a
    // stale) graft.fp.scheme tag — joining it would silently match zero
    // pairs, so the consumer must fail typed instead
    val untagged = Seq((1L, 42L, 0L)).toDF("doc_id", "fp_hash", "fp_pos")
    val batch = Seq((100L, "some batch document text here")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Corpus.incrementalWinnowPairs(batch, untagged, "text", "doc_id")
    }
    assert(e.getMessage.contains("scheme tag"))
    // the round-trip through parquet keeps the tag valid
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val p = java.nio.file.Files.createTempDirectory("winnow_idx").toString
    Corpus.winnowFingerprints(corpus, "text", "doc_id")
      .write.mode("overwrite").parquet(p)
    Corpus.incrementalWinnowPairs(batch, sp.read.parquet(p), "text", "doc_id")
      .collect() // no throw
  }

  test("winnowing short docs keep one global-min fingerprint; sub-k docs drop") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "one two three four five six"), // 6 tokens, k=5 → m=2 < w=4
      (2L, "one two three")).toDF("doc_id", "text") // < k tokens
    val fp = Corpus.winnowFingerprints(docs, "text", "doc_id", k = 5, windowSize = 4)
      .collect()
    assert(fp.forall(_.getAs[Long]("doc_id") == 1L))
    assert(fp.length == 1) // one window at pos 0 spanning both grams
  }

  test("novelty score is the exact unseen-shingle fraction") {
    val sp = spark; import sp.implicits._
    val ref = Seq((10L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps"), // all 3 shingles seen → 0.0
      (2L, "entirely novel content words here"), // none seen → 1.0
      (3L, "the quick brown fox sleeps")).toDF("doc_id", "text")
    // doc 3: shingles {the quick brown, quick brown fox, brown fox sleeps}
    // — first two seen, last novel → 1/3
    val nv = Corpus.noveltyScore(batch, ref, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("novelty")).toMap
    assert(nv(1L) == 0.0 && nv(2L) == 1.0)
    assert(nv(3L) == BigDecimal(1.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("group overlap computes exact pairwise shingle jaccard between sources") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      // src a: shingles {x y z, y z w} ∪ {p q r}
      (1L, "x y z w", "a"), (2L, "p q r", "a"),
      // src b: shingles {x y z, y z w} — subset of a
      (3L, "x y z w", "b"),
      // src c: disjoint
      (4L, "m n o", "c")).toDF("doc_id", "text", "source")
    val out = Corpus.groupOverlap(docs, "text", "source", shingleWords = 3)
      .collect().map(r => (r.getAs[String]("group_a"), r.getAs[String]("group_b"),
        r.getAs[Long]("common"), r.getAs[Double]("jaccard"))).toSeq.sortBy(p => (p._1, p._2))
    // only (a, b) intersect: |a|=3, |b|=2, common=2 → J = 2/3
    assert(out == Seq(("a", "b", 2L,
      BigDecimal(2.0 / 3.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // duplicate shingles across docs of one group count once
    val dup = Seq((1L, "x y z", "a"), (2L, "x y z", "a"), (3L, "x y z", "b"))
      .toDF("doc_id", "text", "source")
    val row = Corpus.groupOverlap(dup, "text", "source").collect().head
    assert(row.getAs[Long]("na") == 1L && row.getAs[Double]("jaccard") == 1.0)
  }
}
