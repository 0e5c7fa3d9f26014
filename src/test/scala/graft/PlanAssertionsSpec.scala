package graft

import org.apache.spark.sql.functions._

/** Physical-plan assertions for the scale-critical properties the operators
  * promise: filter/projection pushdown reaching the parquet scan, broadcast
  * joins for small dimensions, no accidental cartesian products in the LSH
  * candidate paths, and single-shuffle window execution. These pin the PLAN
  * (what a 1000-executor cluster would run), not just the result.
  */
class PlanAssertionsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("selected filter reaches the parquet scan as PushedFilters + pruned ReadSchema") {
    val df = SparkEntry.queries("q_select_filter")(spark, sf)
    val p = plan(df)
    assert(p.contains("PushedFilters") &&
      p.replaceAll("\\s", "").contains("PushedFilters:[IsNotNull(l_quantity),GreaterThan(l_quantity"),
      s"filter not pushed to scan:\n$p")
    // projection pruning: the scan must NOT read all 16 lineitem columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipmode"),
      s"scan reads unprojected columns: $readSchema")
  }

  test("3-way join broadcasts the small dimension tables") {
    val df = SparkEntry.queries("q_join_3way")(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("LSH candidate paths never degrade to cartesian/nested-loop joins") {
    for (q <- Seq("q_dedup_minhash", "q_dedup_simhash", "q_dedup_embedding",
        "q_dedup_embedding_tight", "q_sim_lsh")) {
      val p = plan(SparkEntry.queries(q)(spark, sf))
      assert(!p.contains("CartesianProduct"),
        s"$q plan contains a cartesian product:\n$p")
    }
  }

  test("partitioned running window executes with a single exchange") {
    val df = SparkEntry.queries("q_window_running")(spark, sf)
    val p = plan(df)
    val exchanges = p.linesIterator.count(_.contains("Exchange "))
    assert(exchanges <= 1, s"expected at most one shuffle, found $exchanges:\n$p")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      s"no window operator in plan:\n$p")
  }

  test("exact dedup shuffles 16-byte hash keys, not document bodies") {
    val df = SparkEntry.queries("q_dedup_exact")(spark, sf)
    val p = plan(df)
    // partial (map-side) aggregation must run before the exchange so only
    // (hash, min-id, count) rows shuffle — visible as two HashAggregate
    // levels around one Exchange
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"expected partial+final aggregation:\n$p")
    val exchangeLine = p.linesIterator.find(_.contains("Exchange hashpartitioning")).getOrElse("")
    assert(exchangeLine.contains("graft_h"), s"shuffle not keyed on the hash: $exchangeLine")
    assert(!exchangeLine.contains("text"), "document text must not be a shuffle key")
  }

  test("incremental dedup's exact check broadcasts the corpus keys") {
    // the anti-join side is 16-byte keys — at any realistic corpus-key
    // volume per executor it must broadcast, never shuffle the batch
    val df = SparkEntry.queries("q_dedup_incremental")(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected a broadcast anti-join for the exact check:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("cube aggregates through a single Expand + partial/final aggregation") {
    val df = SparkEntry.queries("q_cube")(spark, sf)
    val p = plan(df)
    assert(p.contains("Expand"), s"cube must plan as Expand, not a union of scans:\n$p")
    // one scan only: Expand multiplies rows AFTER the single parquet read
    assert(p.linesIterator.count(_.contains("FileScan parquet")) == 1,
      s"cube must scan the input once:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"expected partial+final aggregation around the shuffle:\n$p")
  }

  test("top-terms counts partial-aggregate before the shuffle") {
    val df = SparkEntry.queries("q_top_terms")(spark, sf)
    val p = plan(df)
    // the token stream must combine map-side: HashAggregate below the
    // exchange keyed on (lang, term)
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"expected partial+final aggregation for term counts:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("mixture and chunking stay shuffle-free (map-side only)") {
    for (q <- Seq("q_corpus_mixture", "q_corpus_chunks")) {
      val p = plan(SparkEntry.queries(q)(spark, sf))
      assert(!p.contains("Exchange"), s"$q should not shuffle:\n$p")
    }
  }

  test("semantic dedup broadcasts centroids, shuffles only on list_id") {
    // SemDeDup eagerly checkpoints the assignment before its self-join,
    // which truncates that stage out of the final plan — assert the
    // centroid broadcast on the same (un-truncated) assignment machinery
    // via ivfTopK, and the no-cartesian property on the full query
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val ivf = plan(operators.Similarity.ivfTopK(emb,
      emb.where(col("vec_id") < 2), "embedding", "vec_id", k = 3, nlist = 4))
    assert(ivf.contains("BroadcastHashJoin") || ivf.contains("BroadcastNestedLoopJoin"),
      s"centroid assignment should broadcast the centroid side:\n$ivf")
    val p = plan(SparkEntry.queries("q_dedup_semantic")(spark, sf))
    assert(!p.contains("CartesianProduct"), s"no cartesian in SemDeDup:\n$p")
  }

  test("indexed kNN edge build joins on list_id — no cartesian, no ScalaUDF") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = "target/tmp/ivf_knn_plan"
    operators.Similarity.buildIvfIndex(emb, "embedding", "vec_id", idx, nlist = 8)
    val p = plan(operators.Similarity.ivfKnnEdges(idx, emb,
      "embedding", "vec_id", k = 3, nprobe = 2))
    assert(!p.contains("CartesianProduct"), s"all-pairs edge build:\n$p")
    assert(!p.contains("ScalaUDF"))
  }

  test("bloom probes are native might_contain expressions, not Scala UDFs") {
    // the probe sits on the BIG side's per-row path — a ScalaUDF there
    // breaks whole-stage codegen exactly where row volume is highest
    for (q <- Seq("q_bloom_semi", "q_bloom_anti", "q_dedup_incremental")) {
      val p = plan(SparkEntry.queries(q)(spark, sf))
      assert(!p.contains("ScalaUDF") && !p.toLowerCase.contains("pythonudf"),
        s"$q probe went through a UDF:\n$p")
      assert(p.contains("might_contain"), s"$q has no native bloom probe:\n$p")
    }
  }

  test("indexed PQ search: the ADC stage's index scan never reads the vector column") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = "target/tmp/pq_index_plan"
    operators.Similarity.buildPqIndex(emb, "embedding", "vec_id", idx)
    val df = operators.Similarity.pqTopKIndexed(idx,
      emb.where(col("vec_id") < 3), "embedding", "vec_id", k = 5, rerank = 20)
    val p = plan(df)
    // the index parquet is scanned twice — codes for ADC, vectors for the
    // re-rank join — and the ADC-side scan must be column-pruned to
    // (corpus_id, codes): if any index scan reads codes AND cv together,
    // the columnar asymmetry (the whole point of PQ at rest) is lost
    val indexScans = p.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("codes"))
    assert(indexScans.nonEmpty, s"no codes scan found in plan:\n$p")
    indexScans.foreach(l =>
      assert(!l.contains("cv"), s"ADC scan reads vector bytes: $l"))
  }

  test("paragraph dedup shuffles line hashes, not line text") {
    val df = SparkEntry.queries("q_dedup_paragraph")(spark, sf)
    val p = plan(df)
    // winner election and keep join both key on the 128-bit line hash —
    // every hashpartitioning exchange over the line stream must carry
    // graft_h* keys and never the line/text bytes
    val exchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.exists(_.contains("graft_h1")),
      s"no hash-keyed exchange found:\n$p")
    exchanges.filter(_.contains("graft_h1")).foreach(l =>
      assert(!l.contains("line#") && !l.contains("text#"),
        s"line text rides a shuffle key: $l"))
  }

  test("funnel shuffles the event stream exactly once (user-keyed)") {
    val df = SparkEntry.queries("q_events_funnel")(spark, sf)
    val p = plan(df)
    // the step rollup shuffles tiny (<= k+1-row) frames; the EVENT
    // stream itself must cross exactly one user-keyed exchange — a
    // second one would be the per-step min-join shape this operator
    // exists to avoid
    val userKeyed = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .count(_.contains("user_id"))
    assert(userKeyed == 1, s"expected 1 user-keyed exchange, got $userKeyed:\n$p")
  }

  test("resample grid joins broadcast — no cartesian product") {
    val df = SparkEntry.queries("q_events_resample")(spark, sf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"),
      s"resample grid fell back to a cartesian:\n$p")
  }

  test("hard negatives: cluster-bounded join, no cartesian, no ScalaUDF") {
    val df = SparkEntry.queries("q_hard_negatives")(spark, sf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"),
      s"hard negatives fell back to all-pairs:\n$p")
    assert(!p.contains("ScalaUDF"), s"opaque UDF in the probe path:\n$p")
  }

  test("entropy, NFC normalize and JL projection are shuffle-free native projections") {
    for (q <- Seq("q_text_entropy", "q_text_normalize", "q_random_projection")) {
      val p = plan(SparkEntry.queries(q)(spark, sf))
      // all three are one native expression per row; an Exchange means a
      // per-char/per-dim explode + groupBy shape crept back in
      assert(!p.contains("Exchange"), s"$q should not shuffle:\n$p")
      assert(!p.contains("ScalaUDF"), s"$q should be a native expression:\n$p")
    }
    assert(plan(SparkEntry.queries("q_text_entropy")(spark, sf))
      .contains("char_entropy"))
    assert(plan(SparkEntry.queries("q_random_projection")(spark, sf))
      .contains("mat_vec"))
  }

  test("top-n-gram fraction is a shuffle-free map-side projection") {
    val df = SparkEntry.queries("q_text_topngram")(spark, sf)
    val p = plan(df)
    // the per-doc argmax is one native TopShingleRun eval per row — an
    // Exchange here means the exploded (doc, gram) groupBy shape came back
    assert(!p.contains("Exchange"),
      s"top-n-gram plan shuffles:\n$p")
    assert(p.contains("top_shingle_run"),
      s"native TopShingleRun expression missing:\n$p")
  }

  test("DV read: row filter is a broadcast ANTI join keyed on (file, row), scan pruned") {
    val p2 = "target/tmp/plan_dv_read"
    import org.apache.spark.sql.functions.col
    val src = spark.range(5000).select(col("id"),
      (col("id") % 7).as("grp"), (col("id") * 1.5).as("v")).repartition(4)
    graft.sources.DeltaLog.writeWithDeletionVectors(src, p2, "id % 3 = 0")
    val df = graft.sources.DeltaLog.read(spark, p2)
      .where(col("grp") === 3).select("id", "v")
    df.collect() // AQE's final plan is what production runs
    val p = plan(df)
    // the deleted-position side is KB-scale by protocol design — it must
    // build a broadcast hash relation, never shuffle the corpus side
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"DV filter not a broadcast anti-join:\n$p")
    // the user predicate pushes BELOW the DV anti-join into the scan —
    // the row-metadata plumbing must not block predicate pushdown
    assert(p.replaceAll("\\s", "").contains("PushedFilters:[IsNotNull(grp),EqualTo(grp,3)]"),
      s"predicate not pushed through the DV plumbing:\n$p")
    assert(!p.contains("ScalaUDF"), s"DV path uses a Scala UDF:\n$p")
  }

  test("weighted sample selects via TakeOrdered, not a global sort") {
    val df = operators.Corpus.weightedSample(
      spark.read.parquet(s"$sf/documents.parquet"),
      "doc_id", "n_chars", k = 10)
    val p = plan(df)
    // the k smallest keys come back as k-per-partition + driver merge —
    // a Sort + Exchange rangepartitioning here would be the full-corpus
    // global sort the operator promises to avoid
    assert(p.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"weighted sample fell back to a global range sort:\n$p")
  }
}
