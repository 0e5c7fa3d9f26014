package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Corpus-level operators for training-data curation: per-stratum
  * profiling and deterministic train/val/test splitting.
  */
object Corpus {

  /** Per-language corpus profile: document counts, char/token volumes,
    * mean quality components — one shuffle (the groupBy), everything else
    * map-side.
    */
  def profile(docs: DataFrame, textCol: String, langCol: String): DataFrame =
    docs.groupBy(col(langCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col(textCol)).cast("long")).as("total_chars"),
        sum(T.tokenCount(col(textCol)).cast("long")).as("total_tokens"),
        round(avg(T.punctRatio(col(textCol))), 6).as("avg_punct_ratio"),
        round(avg(T.meanWordLength(col(textCol))), 6).as("avg_word_len"))

  /** Deterministic hash split: every row lands in exactly one named split
    * with probability proportional to its weight, stable across runs,
    * partitionings and cluster sizes — never `rand()`, which breaks on
    * retry/recompute. Keyed on the first 15 hex chars of
    * md5(salt || id) so the assignment is reproducible in ANY engine with
    * an md5() function (train/val/test membership must survive engine
    * migrations; the DuckDB oracle recomputes the identical assignment).
    */
  /** Per-split [lo, hi) bucket boundaries — one arithmetic shared by
    * hashSplit and the DuckDB oracle builder so they can never drift.
    */
  def splitBounds(splits: Seq[(String, Double)],
      buckets: Long = 1000000L): Seq[(String, Long, Long)] = {
    val total = splits.map(_._2).sum
    var cum = 0.0
    splits.map { case (name, w) =>
      val lo = (cum / total * buckets).toLong
      val hi = ((cum + w) / total * buckets).toLong
      cum += w
      (name, lo, hi)
    }
  }

  /** The deterministic md5 bucket shared by [[hashSplit]] and
    * [[stratifiedSample]] — ONE expression (and one DuckDB twin in
    * OracleSql) so the two assignment paths can never drift.
    */
  private def bucketHash(idCol: String, salt: String, buckets: Long) =
    pmod(
      conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 15), 16, 10)
        .cast("long"),
      lit(buckets))

  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], salt: String = "graft"): DataFrame = {
    val buckets = 1000000L
    val h = bucketHash(idCol, salt, buckets)
    val expr = splitBounds(splits, buckets).foldLeft(lit(null).cast("string")) {
      case (acc, (name, lo, hi)) =>
        when(h >= lo && h < hi, lit(name)).otherwise(acc)
    }
    // rows at the very top boundary (h == buckets-ish rounding) fall into
    // the last split via the final otherwise-null guard
    df.withColumn("split", coalesce(expr, lit(splits.last._1)))
  }

  /** Quality-gated filter: keep documents above a quality-score threshold
    * (the standard pre-training corpus gate).
    */
  def qualityFilter(docs: DataFrame, textCol: String, minScore: Double): DataFrame =
    docs.where(T.qualityScore(col(textCol)) >= minScore)

  /** Deterministic per-stratum sampling — the data-mixing primitive: each
    * group (language, domain, source) keeps rows at its OWN rate, e.g.
    * `Seq("en" -> 0.1, "de" -> 0.5)`, rows of unlisted groups at
    * `defaultRate`. Same md5-bucket trick as [[hashSplit]]: membership is
    * a pure function of (salt, id), so it is stable across runs, retries,
    * partitionings and engines — `rand()`-based sampling resamples on
    * every task retry, silently changing the corpus mid-job. Map-side
    * only: no shuffle, no group-size skew concern at any scale.
    */
  def stratifiedSample(df: DataFrame, idCol: String, groupCol: String,
      rates: Seq[(String, Double)], defaultRate: Double = 1.0,
      salt: String = "graft"): DataFrame = {
    val buckets = 1000000L
    val rateExpr = rates.foldLeft(lit(defaultRate)) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    df.where(bucketHash(idCol, salt, buckets) < (rateExpr * buckets).cast("long"))
  }

  /** TOKEN-budget mixture — mixtures are specified in tokens, not
    * document counts: each listed source keeps documents at rate
    * min(1, budget_tokens / source_tokens) under the same deterministic
    * md5 gate as [[stratifiedSample]] (unlisted sources keep everything).
    * Expected kept tokens per source = its budget; the draw is
    * length-unbiased (rate is per-source, membership per-document), and
    * stable across runs, retries, partitionings, and engines.
    *
    * Scale shape: one map-side token count, a groupBy over the sources
    * (#sources rows), a broadcast join of the totals back, and a map-side
    * filter — no corpus shuffle.
    */
  def tokenBudgetMixture(df: DataFrame, textCol: String, sourceCol: String,
      idCol: String, budgets: Seq[(String, Long)],
      salt: String = "graft"): DataFrame = {
    val buckets = 1000000L
    val tok = df.withColumn("graft_ntok", T.tokenCount(col(textCol)).cast("long"))
    val totals = tok.groupBy(col(sourceCol))
      .agg(sum(col("graft_ntok")).as("graft_tot"))
    val budgetExpr = budgets.foldLeft(lit(null).cast("long")) {
      case (acc, (s, b)) => when(col(sourceCol) === s, lit(b)).otherwise(acc)
    }
    tok.join(broadcast(totals), Seq(sourceCol))
      .withColumn("graft_rate",
        when(budgetExpr.isNull, lit(1.0))
          .otherwise(least(lit(1.0),
            budgetExpr.cast("double") / col("graft_tot"))))
      .where(bucketHash(idCol, salt, buckets) <
        (col("graft_rate") * buckets).cast("long"))
      .select(col(idCol), col(sourceCol), col("graft_ntok").as("n_tokens"))
  }

  /** Deterministic k-per-group cap: exactly min(k, |group|) rows per
    * group, chosen by the seeded md5 order — the balanced-subset
    * primitive ("at most k docs per domain/language") where
    * [[stratifiedSample]]'s rate-based draw cannot bound group size.
    * Engine-stable and retry-stable: same salt ⇒ same survivors.
    *
    * Scale shape: TWO-PHASE. A single window partitioned by a
    * low-cardinality group column would funnel each group into ONE task
    * (a 10⁹-row language = one reducer) — so phase 1 caps locally per
    * (group, input partition), a skew-free key whose cardinality is
    * groups × partitions, and phase 2 computes the exact global cap over
    * the ≤ k·partitions survivors per group. The result is placement-
    * independent: the k globally-hash-smallest rows of a group are
    * always among every partition's k locally-smallest.
    */
  def sampleKPerGroup(df: DataFrame, groupCol: String, idCol: String, k: Int,
      salt: String = "graft-cap"): DataFrame = {
    require(k >= 1, "sampleKPerGroup: k must be >= 1")
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("graft_pid"))
      .orderBy(col("graft_h").asc, col(idCol).asc)
    val w2 = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(col("graft_h").asc, col(idCol).asc)
    df.withColumn("graft_h", orderHash(idCol, salt))
      .withColumn("graft_pid", spark_partition_id())
      .withColumn("graft_rn", row_number().over(w1))
      .where(col("graft_rn") <= k)
      .withColumn("graft_rn2", row_number().over(w2))
      .where(col("graft_rn2") <= k)
      .drop("graft_h", "graft_pid", "graft_rn", "graft_rn2")
  }

  /** Shared 60-bit md5 order key for [[shuffle]] / [[packSequences]] —
    * like [[bucketHash]] but un-modded: a total order, engine-portable
    * (DuckDB: `('0x' || substr(md5(salt || id), 1, 15))::BIGINT`).
    */
  private def orderHash(idCol: String, salt: String) =
    conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Deterministic global shuffle: a 1-based `shuffle_pos` under the
    * md5(salt‖id) order — the training-data ordering primitive. Unlike
    * `ORDER BY rand()` this is stable across runs, retries and engines
    * (same salt ⇒ same permutation, so a resumed job sees the same epoch
    * order), and unlike `ROW_NUMBER() OVER (ORDER BY …)` it never
    * collapses to one reducer: [[GlobalOrder.withRowNumber]] range
    * partitions on the hash and seeds per-partition counters from an
    * O(partitions) driver map. Ties (60-bit hash collisions) break on id.
    */
  def shuffle(df: DataFrame, idCol: String,
      salt: String = "graft-shuffle", posCol: String = "shuffle_pos"): DataFrame =
    GlobalOrder.withRowNumber(
      df.withColumn("graft_h", orderHash(idCol, salt)),
      Seq("graft_h", idCol), posCol).drop("graft_h")

  /** Weighted mixture construction: each source keeps a deterministic
    * hash-sampled `rate` of its rows (per-source salt, so the same id in
    * two sources draws independently), tagged with `mix_source` — the
    * corpus-mixing primitive (e.g. 100 % wiki + 30 % web + 5 % code).
    * Map-side only per source; the union is a plan-level concat, no
    * shuffle at any scale. Rates > 1 are rejected — epoch repetition is a
    * training-loop concern, not row duplication.
    */
  def mixture(sources: Seq[(String, DataFrame, Double)], idCol: String,
      salt: String = "graft-mix"): DataFrame = {
    require(sources.nonEmpty, "mixture: need at least one source")
    val buckets = 1000000L
    sources.map { case (name, df, rate) =>
      require(rate >= 0.0 && rate <= 1.0, s"mixture: rate for '$name' must be in [0,1]")
      df.where(bucketHash(idCol, s"$salt:$name", buckets) < (rate * buckets).toLong)
        .withColumn("mix_source", lit(name))
    }.reduce(_.unionByName(_))
  }

  /** Deterministic oversampling for mixture weights > 1 (the "wiki ×2.3"
    * case [[mixture]] deliberately rejects): every row repeats
    * floor(weight) times tagged `epoch` 0..floor−1, plus one fractional
    * draw (the [[bucketHash]] sample at rate weight−floor) as the final
    * epoch — so expected multiplicity is exactly `weight`, membership is
    * a pure function of (salt, id), and a resumed job regenerates the
    * same epochs. The repeat is a codegen'd sequence-explode, no shuffle;
    * downstream [[shuffle]] (salted per epoch if desired) restores
    * interleaving.
    */
  def oversample(df: DataFrame, idCol: String, weight: Double,
      salt: String = "graft-epoch"): DataFrame = {
    require(weight > 0, "oversample: weight must be positive")
    val full = math.floor(weight).toLong
    val frac = weight - full
    val buckets = 1000000L
    val copies =
      if (full > 0)
        Some(df.withColumn("epoch", explode(sequence(lit(0L), lit(full - 1)))))
      else None
    val fractional =
      if (frac > 0)
        Some(df.where(bucketHash(idCol, salt, buckets) < (frac * buckets).toLong)
          .withColumn("epoch", lit(full)))
      else None
    (copies.toSeq ++ fractional.toSeq).reduce(_.unionByName(_))
  }

  /** Sequence packing (concat-then-chunk): documents are laid out in the
    * deterministic [[shuffle]] order, token counts accumulate, and the
    * stream is cut every `budgetTokens` — each doc reports the training
    * chunks it lands in (`first_chunk`/`last_chunk`; docs straddle cuts,
    * exactly like a real pre-training pipeline's packed sequences). The
    * running total comes from [[GlobalOrder.withRunningTotal]] (range
    * partition + O(partitions) prefix offsets), not a global window — the
    * layout of a 100 TB corpus must not serialize through one reducer.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long, salt: String = "graft-pack"): DataFrame = {
    require(budgetTokens > 0, "packSequences: budgetTokens must be positive")
    val base = docs.select(col(idCol),
        T.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("graft_h", orderHash(idCol, salt))
    val cum = GlobalOrder.withRunningTotal(base, Seq("graft_h", idCol),
      "n_tokens", "graft_cum")
    cum.select(col(idCol), col("n_tokens"),
      floor((col("graft_cum") - col("n_tokens")) / budgetTokens).cast("long")
        .as("first_chunk"),
      greatest(
        floor((col("graft_cum") - col("n_tokens")) / budgetTokens),
        floor((col("graft_cum") - 1) / budgetTokens)).cast("long").as("last_chunk"))
  }

  /** Overlapping token-window chunking — the RAG/embedding-pipeline
    * primitive: each document becomes ceil((n_tokens − overlap) / stride)
    * chunks of `chunkTokens` whitespace tokens, consecutive chunks sharing
    * `overlapTokens` (stride = chunk − overlap; the last chunk may be
    * short). Pure per-row codegen'd array expressions (split → slice →
    * join) + one posexplode — no shuffle, no UDF, embarrassingly parallel
    * at any scale. Tokenization splits on whitespace WITHOUT lowercasing:
    * chunk text must stay verbatim.
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0, "chunkDocuments: chunkTokens must be positive")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      "chunkDocuments: need 0 <= overlapTokens < chunkTokens")
    val stride = chunkTokens - overlapTokens
    docs
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("graft_tk"))
      .withColumn("graft_nc",
        greatest(lit(1L),
          floor((size(col("graft_tk")) - overlapTokens + stride - 1) / stride)
            .cast("long")))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0L), col("graft_nc") - 1),
          i => array_join(
            slice(col("graft_tk"), (i * stride + 1).cast("int"), lit(chunkTokens)),
            " "))).as(Seq("chunk_idx", "chunk_text")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_text"))
  }

  /** Boilerplate paragraph detection: non-empty trimmed lines occurring in
    * ≥ `minDocFreq` DISTINCT documents (nav bars, cookie banners, footers —
    * the classic web-corpus noise). One explode + one groupBy; Spark's
    * partial distinct aggregation keeps the per-(paragraph, doc) pairs
    * map-side combined before the shuffle. At 100 TB the shuffle key is the
    * paragraph string itself — acceptable because boilerplate lines are
    * short by nature, but for pathological corpora group on a 128-bit hash
    * and re-join a representative (same trick as Dedup.exact).
    */
  def boilerplateParagraphs(docs: DataFrame, textCol: String, idCol: String,
      minDocFreq: Long): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), "\n")).as("p0"))
      .select(col(idCol), trim(col("p0")).as("paragraph"))
      .where(length(col("paragraph")) > 0)
      .groupBy("paragraph")
      .agg(countDistinct(col(idCol)).as("doc_freq"))
      .where(col("doc_freq") >= minDocFreq)

  /** Remove boilerplate lines (per [[boilerplateParagraphs]]) from every
    * document, preserving the order of surviving lines. The boilerplate
    * set is at most |corpus| / minDocFreq entries, so it broadcasts; the
    * rebuild is a posexplode → anti-join → sort-by-position reassembly.
    * Documents consisting ENTIRELY of boilerplate come back as empty
    * strings rather than vanishing — dropping them is a quality-gate
    * decision, not a dedup side effect.
    */
  def stripBoilerplate(docs: DataFrame, textCol: String, idCol: String,
      minDocFreq: Long): DataFrame = {
    val bp = boilerplateParagraphs(docs, textCol, idCol, minDocFreq)
      .select(col("paragraph").as("graft_bp"))
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val rebuilt = lines
      .join(broadcast(bp), trim(col("line")) === col("graft_bp"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), "\n").as(textCol))
    docs.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol))
  }

  /** Document-length histogram: rows per `binWidth`-char bucket (bin =
    * inclusive lower bound). Map-side-combined single shuffle; the bin
    * arithmetic is integer, so the profile is bit-identical on any engine.
    */
  def lengthHistogram(docs: DataFrame, textCol: String,
      binWidth: Long = 100L): DataFrame = {
    require(binWidth > 0, "lengthHistogram: binWidth must be positive")
    docs.select(
        (floor(length(col(textCol)).cast("long") / binWidth) * binWidth).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_docs"))
  }

  /** Top-k most frequent whitespace tokens per group (language, source,
    * domain) — the vocabulary profile used for corpus mixing and drift
    * checks. Ties break on the term's binary collation so ranks are
    * deterministic and engine-portable. Shape: explode → map-side-combined
    * groupBy((group, term)) → per-group window top-k; the window partition
    * holds one group's distinct VOCABULARY (not its token stream), which
    * natural-language corpora bound in the low millions per group.
    */
  def topTerms(docs: DataFrame, textCol: String, groupCol: String,
      k: Int, minTermLength: Int = 1): DataFrame = {
    val counts = docs.select(col(groupCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .where(length(col("term")) >= minTermLength)
      .groupBy(col(groupCol), col("term"))
      .agg(count(lit(1)).as("cnt"))
    // bounded-heap top-k (plans.TopTermsAgg): the exchange carries k
    // terms per (group, mapper) instead of the group's whole vocabulary,
    // and term ties order by the UTF8 binary collation — the same rank
    // the previous (cnt desc, term asc) window produced
    counts.groupBy(col(groupCol))
      .agg(graft.plans.TopTermsAgg.topTerms(col("cnt"), col("term"), k)
        .as("graft_tt"))
      .select(col(groupCol),
        posexplode(col("graft_tt")).as(Seq("graft_pos", "graft_e")))
      .select(col(groupCol), col("graft_e.term").as("term"),
        col("graft_e.cnt").as("cnt"),
        (col("graft_pos") + 1).cast("bigint").as("rnk"))
  }

  /** Dataset-level overlap matrix: exact shingle-set Jaccard between
    * every pair of document groups (sources, dumps, snapshots) — the
    * dataset-granularity dedup signal that tells you two CRAWLS overlap
    * before you pay for doc-level dedup between them, and the standard
    * train/eval-set contamination screen. Shingles never cross document
    * boundaries (per-doc shingling, then distinct per group).
    *
    * Scale shape: the posting list is distinct (shingle, group) rows —
    * bounded by corpus shingle volume — and the self-join is on the
    * shingle key with group-count fan-out only (a shingle appearing in g
    * groups contributes g·(g−1)/2 rows, g ≤ #groups, a small constant).
    * Output: one row per unordered group pair with intersection, sizes,
    * and Jaccard.
    */
  def groupOverlap(docs: DataFrame, textCol: String, groupCol: String,
      shingleWords: Int = 3): DataFrame = {
    // ONE pass over the posting volume: fold each shingle's groups into
    // a set (partial-merged map-side; |set| ≤ #groups, a small constant),
    // then sizes and pair counts both read the collapsed per-shingle
    // rows. The eager localCheckpoint pins the collapsed frame because
    // exchange reuse can NOT dedupe it — collect_set is flagged
    // non-deterministic (result order), which disqualifies its subplan
    // from ReuseExchange, so without the pin the shingle explode and
    // set-fold would re-run once per consumer (measured: three full
    // corpus scans at runtime). Pinned size is bounded by distinct
    // corpus shingles — the same order as any posting-list intermediate.
    // The previous shape (distinct posting, then a posting⋈posting
    // self-join on the shingle key) re-shuffled the full posting list
    // three times for the same answer.
    val byShingle = docs.select(col(groupCol).as("g"),
        explode(array_distinct(T.wordShingles(col(textCol), shingleWords))).as("sh"))
      .groupBy(col("sh")).agg(collect_set(col("g")).as("gs"))
      .localCheckpoint(true)
    val sizes = byShingle.select(explode(col("gs")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
    val inter = byShingle.where(size(col("gs")) >= 2)
      .select(explode(col("gs")).as("ga"), col("gs"))
      .select(col("ga"), explode(col("gs")).as("gb"))
      .where(col("ga") < col("gb"))
      .groupBy(col("ga").as("group_a"), col("gb").as("group_b"))
      .agg(count(lit(1)).as("common"))
    inter
      .join(sizes.select(col("g").as("group_a"), col("n").as("na")), Seq("group_a"))
      .join(sizes.select(col("g").as("group_b"), col("n").as("nb")), Seq("group_b"))
      .select(col("group_a"), col("group_b"),
        col("common").cast("bigint").as("common"),
        col("na").cast("bigint").as("na"), col("nb").cast("bigint").as("nb"),
        round(col("common").cast("double") /
          (col("na") + col("nb") - col("common")), 6).as("jaccard"))
  }

  /** Add-k-smoothed unigram language model over a corpus's normalized
    * tokens: (token, logp) with logp = ln((count + k) / (total + k·vocab)).
    * The classic data-quality scorer (a KenLM stand-in with the same
    * contract): train once on a trusted corpus, score candidate documents
    * by mean token log-probability, gate on the score. Two shuffles, both
    * map-side combined: token counts, then a single-row totals frame the
    * counts cross-join against (broadcast by construction).
    */
  def unigramModel(corpus: DataFrame, textCol: String,
      smoothingK: Double = 1.0): DataFrame = {
    val tok = corpus
      .select(explode(split(T.normalizeText(col(textCol)), " ")).as("token"))
      .where(length(col("token")) > 0)
    val counts = tok.groupBy(col("token"))
      .agg(count(lit(1)).cast("double").as("graft_c"))
    val totals = counts.agg(sum(col("graft_c")).as("graft_t"),
      count(lit(1)).cast("double").as("graft_v"))
    counts.crossJoin(broadcast(totals))
      .select(col("token"),
        log((col("graft_c") + lit(smoothingK)) /
          (col("graft_t") + lit(smoothingK) * col("graft_v"))).as("logp"))
  }

  /** Smoothed log-probability an OOV token scores under a model with the
    * given totals — ln(k / (T + k·V)). Callers hold the (T, V) pair from
    * training time; recomputing it from the model frame would scan it.
    */
  def oovLogProb(totalTokens: Double, vocabSize: Double,
      smoothingK: Double = 1.0): Double =
    math.log(smoothingK / (totalTokens + smoothingK * vocabSize))

  /** Mean unigram log-probability per document under `model` — documents
    * with NO tokens drop (nothing to score; gate them on length first).
    * Out-of-vocabulary tokens score `oov` (use [[oovLogProb]]).
    *
    * Scale shape: explode (id, token) rows, join the model on token
    * (broadcast when the vocab is small — Spark's stats decide), then ONE
    * hash shuffle on the doc id with map-side-combined avg. Higher scores
    * = more in-distribution text; exp(-avg_logp) is the perplexity.
    */
  def unigramLogProb(docs: DataFrame, textCol: String, idCol: String,
      model: DataFrame, oov: Double = -20.0): DataFrame =
    docs.select(col(idCol),
        explode(split(T.normalizeText(col(textCol)), " ")).as("token"))
      .where(length(col("token")) > 0)
      .join(model, Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(round(avg(coalesce(col("logp"), lit(oov))), 6).as("avg_logp"),
        count(lit(1)).as("n_tokens"))

  /** Sketch-based corpus profile — the ONE-PASS, bounded-memory profile
    * you run at 100 TB where [[profile]]'s exact COUNT(DISTINCT) would
    * shuffle every distinct value: HyperLogLog++ distinct counts
    * (`approx_count_distinct`, relative error `rsd`) and quantile-sketch
    * token-length percentiles (`approx_percentile`, `accuracy` dial).
    * Both sketches are map-side mergeable, so the whole profile is one
    * scan + one tiny partial-aggregate exchange regardless of corpus
    * size. Results are approximate by contract — the driver grades this
    * query rows-only; the error BOUNDS are spec-asserted against the
    * exact profile on the fixture.
    */
  def profileSketch(docs: DataFrame, textCol: String, idCol: String,
      rsd: Double = 0.05, accuracy: Int = 10000): DataFrame =
    docs.agg(
      count(lit(1)).as("n_rows"),
      approx_count_distinct(col(idCol), rsd).as("approx_ids"),
      // same null-guard as [[profileSketchBy]]: xxhash64(NULL) = seed
      approx_count_distinct(
        when(col(textCol).isNotNull, xxhash64(col(textCol))), rsd)
        .as("approx_texts"),
      percentile_approx(T.tokenCount(col(textCol)), lit(0.5), lit(accuracy))
        .cast("bigint").as("p50_tokens"),
      percentile_approx(T.tokenCount(col(textCol)), lit(0.95), lit(accuracy))
        .cast("bigint").as("p95_tokens"),
      percentile_approx(T.tokenCount(col(textCol)), lit(0.99), lit(accuracy))
        .cast("bigint").as("p99_tokens"))

  /** Per-GROUP sketch profile — the grouped twin of [[profileSketch]]:
    * HLL distinct-text estimates per group. The sketch registers merge
    * map-side, so each group costs one fixed-size buffer per mapper and
    * the exchange carries registers, not values — the shape that
    * replaces a per-group `COUNT(DISTINCT …)` (whose Expand doubles the
    * scan) on a 100 TB profile pass. Approximate by contract; the bound
    * is graded as an oracle-asserted boolean like [[profileSketch]].
    */
  def profileSketchBy(docs: DataFrame, textCol: String, byCol: String,
      rsd: Double = 0.05): DataFrame =
    docs.groupBy(col(byCol)).agg(
      count(lit(1)).as("n_docs"),
      // null-guard BEFORE the hash: xxhash64(NULL) is the (non-null)
      // seed, which would count null texts as one extra distinct value
      // that exact COUNT(DISTINCT) excludes
      approx_count_distinct(
        when(col(textCol).isNotNull, xxhash64(col(textCol))), rsd)
        .as("approx_texts"))

  /** Ordered (w1, w2) bigram rows of a corpus — one map-side explode over
    * the token arrays (no shuffle); docs under two tokens contribute
    * nothing. Shared by [[bigramModel]] and [[bigramLogProb]] so the two
    * can never tokenize differently.
    */
  private def bigramRows(df: DataFrame, textCol: String,
      extra: Seq[String]): DataFrame = {
    val toks = col("graft_toks")
    df.withColumn("graft_toks", split(T.normalizeText(col(textCol)), " "))
      .where(size(toks) >= 2)
      .select(extra.map(col) :+ explode(
        transform(sequence(lit(0), size(toks) - 2),
          i => struct(element_at(toks, i + 1).as("w1"),
            element_at(toks, i + 2).as("w2")))).as("bg"): _*)
      .select(extra.map(col) :+ col("bg.w1") :+ col("bg.w2"): _*)
  }

  /** Add-k-smoothed BIGRAM language model: (w1, w2, logp) with
    * p(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V), where c(w1·) is the
    * HISTORY count (bigrams starting with w1 — so the conditional sums to
    * one over the vocabulary) and V the corpus vocabulary size. The
    * bigram upgrade of [[unigramModel]]: scores local word ORDER, which a
    * bag-of-words unigram gate cannot see (scrambled text passes unigram,
    * fails bigram).
    */
  def bigramModel(corpus: DataFrame, textCol: String,
      smoothingK: Double = 1.0): DataFrame = {
    val c12 = bigramRows(corpus, textCol, Nil)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("double").as("c12"))
    // history counts roll up from the PAIR counts (Σ_w2 c12 = c1) — same
    // numbers as counting the pairs again, minus a full corpus re-explode
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val v = vocabSize(corpus, textCol)
    c12.join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .select(col("w1"), col("w2"),
        log((col("c12") + lit(smoothingK)) /
          (col("c1") + lit(smoothingK) * col("graft_v"))).as("logp"))
  }

  /** Mean bigram log-probability per document, trained on `corpus` with
    * add-k smoothing. Unseen pairs and unseen histories need no special
    * case: logp = ln((c12 + k) / (c1 + k·V)) with missing counts at 0 —
    * in particular an unseen history scores ln(1/V). Documents with
    * fewer than two tokens drop (no bigram to score).
    *
    * Scale shape: the pair explode is map-side; two token-keyed joins
    * (broadcast-able counts), one doc-id shuffle for the avg.
    */
  def bigramLogProb(docs: DataFrame, textCol: String, idCol: String,
      corpus: DataFrame, smoothingK: Double = 1.0): DataFrame = {
    // self-scoring (docs IS corpus — reference equality, the common
    // "score the training corpus" call): the per-doc bigram explode is
    // the expensive pass, and training counts are a pure rollup of it —
    // pin the per-doc rows ONCE and derive the model by grouping them,
    // instead of exploding the same table twice (one fewer source scan
    // + tokenize; counts are identical, the id column just rides along
    // until the rollup drops it)
    val selfScore = docs eq corpus
    // NOT fanned out (Par.fanOut measured r21: wall 2.62 → 2.24 s at
    // sf0.1 but total task CPU 2.2 s → 25.5 s — each of the 32 partial
    // aggregations re-hashes the near-unique bigram vocabulary, the
    // §2.3 partial-agg duplication the r20 tokenize-family reverts
    // documented; a 0.85× wall for 11× CPU loses at any real scale)
    val docRows =
      if (selfScore) bigramRows(docs, textCol, Seq(idCol)).localCheckpoint(true)
      else bigramRows(docs, textCol, Seq(idCol))
    // pinned: the bigram model frame (distinct-bigram counts, the
    // "train once" artifact) feeds both the unigram rollup and the
    // scoring join — without the pin the corpus bigram explode+count
    // runs once per consumer
    val c12 = (if (selfScore) docRows.select(col("w1"), col("w2"))
        else bigramRows(corpus, textCol, Nil))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("double").as("c12"))
      .localCheckpoint(true)
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val v = vocabSize(corpus, textCol)
    docRows
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("graft_lp",
        log((coalesce(col("c12"), lit(0.0)) + lit(smoothingK)) /
          (coalesce(col("c1"), lit(0.0)) + lit(smoothingK) * col("graft_v"))))
      .groupBy(col(idCol))
      .agg(round(avg(col("graft_lp")), 6).as("avg_logp"),
        count(lit(1)).as("n_bigrams"))
  }

  /** One-row corpus vocabulary size (distinct normalized tokens). */
  private def vocabSize(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(explode(split(T.normalizeText(col(textCol)), " ")).as("t"))
      .where(length(col("t")) > 0)
      .agg(countDistinct(col("t")).cast("double").as("graft_v"))

  /** TF-IDF keyword extraction: the `k` most characteristic normalized
    * tokens per document. score = (tf / docLen) · ln(N / df) — classic
    * tf-idf over the corpus itself. The RANKING key is exact integer
    * arithmetic (tf desc, df asc, term asc), not the double score: two
    * engines computing ln() can disagree in the last ulp, and a rank
    * flipped by one ulp would change WHICH rows appear — integers cannot
    * flip. The double score rides along (rounded) as data. The integer
    * key also IS the score's ordering for fixed docLen except where two
    * terms trade higher tf against lower df; those near-ties are exactly
    * where the double ordering is unstable anyway.
    *
    * Scale shape: one explode pass feeds both aggregates — per-(doc, term)
    * tf and per-term df (map-side combined); df joins back on term
    * (broadcast-able vocab), top-k is a per-doc window. No driver data.
    */
  def tfidfKeywords(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 5, minTermLength: Int = 1): DataFrame = {
    val tok = docs.select(col(idCol),
        explode(split(T.normalizeText(col(textCol)), " ")).as("term"))
      .where(length(col("term")) >= minTermLength)
    // pinned: the (doc, term) tf frame feeds docLen, df, AND the final
    // join — three consumers, each of which would re-run the tokenize
    // explode + shuffle without the pin
    val tf = tok.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val docLen = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("graft_len"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.select(countDistinct(col(idCol)).cast("double").as("graft_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df, Seq("term"))
      .join(docLen, Seq(idCol))
      .crossJoin(broadcast(nDocs))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        round((col("tf").cast("double") / col("graft_len")) *
          log(col("graft_n") / col("df")), 6).as("score"),
        col("rnk").cast("bigint").as("rnk"))
  }

  /** Per-document duplicate-span fraction: the share of a doc's distinct
    * `shingleWords`-token shingles that occur in MORE than one document —
    * the fine-grained dedup signal (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better", §4 substring dedup):
    * doc-level near-dup misses boilerplate-heavy or partially-copied
    * texts, but a high dup_fraction flags them for span-level cleaning.
    * One explode + two shuffles (doc-freq groupBy, per-doc rollup), both
    * map-side combined. At 100 TB group the doc-freq on a 128-bit shingle
    * hash instead of the string (same trade as [[boilerplateParagraphs]]).
    */
  def duplicateSpanFraction(docs: DataFrame, textCol: String, idCol: String,
      shingleWords: Int = 8): DataFrame = {
    val sh = docs.select(col(idCol),
      explode(array_distinct(T.wordShingles(col(textCol), shingleWords))).as("g"))
    val freq = sh.groupBy("g").agg(countDistinct(col(idCol)).as("df"))
    sh.join(freq, Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("dup_shingles"))
      .withColumn("dup_fraction",
        col("dup_shingles").cast("double") / col("n_shingles"))
  }

  /** Quality-score drift between two corpus slices as the population
    * stability index: fixed-width bins over [0, 1] quality, per-bin
    * frequencies p (slice A) and q (slice B) with add-half-count
    * smoothing (so empty bins stay finite), and the per-bin PSI term
    * (p − q)·ln(p/q). Σ terms < 0.1 is the classic "no drift" rule —
    * the distributional complement to [[groupOverlap]]'s lexical
    * screen, run between crawl snapshots before retraining filters.
    *
    * One map-side score pass and two #bins-row aggregations per side;
    * the bin join is #bins × #bins-free (merge on bin id).
    */
  def scoreDrift(a: DataFrame, b: DataFrame, textCol: String,
      bins: Int = 10): DataFrame = {
    require(bins > 0, "scoreDrift: bins must be positive")
    // bin on the 6-dp-rounded score — the oracle's replicated formula
    // rounds there, and binning must see the identical double
    def binned(df: DataFrame, cnt: String): DataFrame =
      df.select(least(floor(round(T.qualityScore(col(textCol)), 6) * bins)
          .cast("long"), lit(bins - 1L)).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).cast("double").as(cnt))
    val na = a.count().toDouble
    val nb = b.count().toDouble
    val allBins = a.sparkSession.range(bins).select(col("id").as("bin"))
    allBins
      .join(binned(a, "ca"), Seq("bin"), "left")
      .join(binned(b, "cb"), Seq("bin"), "left")
      .select(col("bin"),
        ((coalesce(col("ca"), lit(0.0)) + lit(0.5)) / lit(na + 0.5 * bins)).as("p"),
        ((coalesce(col("cb"), lit(0.0)) + lit(0.5)) / lit(nb + 0.5 * bins)).as("q"))
      .select(col("bin"), round(col("p"), 6).as("p"), round(col("q"), 6).as("q"),
        round((col("p") - col("q")) * log(col("p") / col("q")), 6).as("psi_term"))
  }

  /** Curriculum bins: every document assigned to one of `k` difficulty
    * tiers by ascending quality score (bin 1 = lowest quality), ties on
    * the rounded score broken by id — the curriculum-learning layout
    * (schedule low→high-quality tiers across training epochs). Built on
    * [[GlobalOrder.ntile]]'s distributed numbering: range partition +
    * per-partition counts, no single-reducer NTILE window.
    */
  def curriculumBins(docs: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    // eager localCheckpoint pins the tiny (id, quality) projection: the
    // range partitioner's boundary-sampling pass and the shuffle map pass
    // would otherwise EACH re-run the regex-heavy quality scorer over the
    // full text corpus — score once, range over ~16-byte rows
    val scored = docs.select(col(idCol),
        round(T.qualityScore(col(textCol)), 6).as("quality"))
      .localCheckpoint(true)
    GlobalOrder.ntile(scored, k, orderCols = Seq("quality", idCol),
        bucketCol = "bin")
      .select(col(idCol), col("quality"), col("bin").cast("bigint").as("bin"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    * MOSS algorithm): per document, hash every k-word gram, slide a
    * window of `windowSize` consecutive gram hashes, and keep the minimum
    * of each window (ties → leftmost position; hash ties are md5
    * collisions, negligible). Guarantees any shared run of
    * windowSize + k − 1 words between two documents shares a fingerprint
    * — position-robust plagiarism/copy detection where a global MinHash
    * can only score whole-document similarity. Documents shorter than one
    * full window keep their single global minimum; docs under k words
    * produce no grams and drop.
    *
    * Gram hashes are the engine-portable 60-bit md5 (DuckDB twin in
    * OracleSql.winnow), computed natively: the gram strings come from the
    * single-pass [[graft.plans.WordShingles]] kernel and hash through
    * [[graft.plans.Md5Hash60Array]] — one digest per gram, none of the
    * per-gram slice/concat/hex-substring allocation of the built-ins
    * route. Scale shape: the gram explode is map-side; the window
    * partitions by document (bounded by document length) — one doc-keyed
    * shuffle, then a distinct on the selected rows.
    */
  /** Fingerprint-scheme tag carried as FIELD METADATA on `fp_hash`
    * (parquet persists it in the footer), mirroring
    * [[Dedup.BandHashScheme]]: bump the version whenever the tokenizer
    * or gram hash changes (round 7 swapped the regex tokenizer for the
    * native WordShingles kernel, changing fp_hash on non-ASCII text) —
    * a pre-change persisted index would otherwise join the new batch to
    * silent false-negative zero pairs.
    */
  private[graft] val WinnowScheme = "wordshingles-md5-60-v1"
  private val fpSchemeMeta = new org.apache.spark.sql.types.MetadataBuilder()
    .putString("graft.fp.scheme", WinnowScheme).build()

  private[graft] def requireWinnowScheme(index: DataFrame): Unit = {
    val ok = index.schema.find(_.name == "fp_hash").exists(f =>
      f.metadata.contains("graft.fp.scheme") &&
        f.metadata.getString("graft.fp.scheme") == WinnowScheme)
    require(ok, "corpus fingerprint index carries no compatible " +
      s"scheme tag; this build fingerprints with '$WinnowScheme'. An index " +
      "persisted under an older tokenizer/hash would silently match zero " +
      "pairs — re-run winnowFingerprints over the corpus and persist that.")
  }

  def winnowFingerprints(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 5, windowSize: Int = 4): DataFrame = {
    require(k >= 1 && windowSize >= 1, "winnow: k and windowSize must be >= 1")
    // token count from the SAME WordShingles kernel that builds the grams
    // (n=1 shingles ARE the tokens): mixing tokenizers here (e.g. the
    // regex normalizeText split) desyncs the >= k filter and the window
    // bound graft_m from the actual gram count on inputs the two
    // tokenizers split differently (Unicode chars whose lowercase maps
    // into ASCII), corrupting which fingerprints get selected. The
    // kernel's token count is needed because the k-gram output alone
    // cannot distinguish "< k tokens" from "exactly k" — both yield one
    // gram.
    val toks = col("graft_toks")
    val grams = docs
      .withColumn("graft_toks", T.wordShingles(col(textCol), 1))
      .where(size(toks) >= k)
      .withColumn("graft_m", (size(toks) - k + 1).cast("long"))
      .select(col(idCol), col("graft_m"), posexplode(
        graft.plans.HashExpressions.md5Hash60Array(
          T.wordShingles(col(textCol), k))).as(Seq("pos", "gh")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(0, windowSize - 1)
    grams
      .withColumn("graft_sel", min(struct(col("gh"), col("pos"))).over(w))
      // full windows only — except short docs (m < windowSize), whose
      // single pos-0 window spans all m grams and yields the global min
      .where(col("pos") <= greatest(col("graft_m") - windowSize, lit(0L)))
      .select(col(idCol), col("graft_sel.gh").as("fp_hash", fpSchemeMeta),
        col("graft_sel.pos").cast("long").as("fp_pos"))
      .distinct()
  }

  /** Copy-detection pairs from winnowing fingerprints: documents sharing
    * at least `minShared` distinct selected hashes — the MOSS pair
    * report. By the winnowing guarantee, any two documents sharing a run
    * of windowSize + k − 1 words appear here at minShared = 1; raising
    * minShared filters incidental hash overlap. Same inverted-index join
    * shape as [[Dedup.ngramJaccardPairs]], but the posting list holds
    * only the ~2/(windowSize+1) of grams winnowing selects.
    *
    * `maxDocFreq > 0` drops fingerprints selected by more than that many
    * documents BEFORE the self-join — the same dial as
    * [[Dedup.ngramJaccardPairs]], and more important here: winnowing
    * selects boilerplate (shared footers/templates survive by design —
    * that is what it detects), so one hot fingerprint in N docs fans out
    * N²/2 pair rows. The trade is recall on exactly those boilerplate-only
    * pairs: a pair whose every shared fingerprint exceeds the cap is
    * missed; pairs sharing any sub-cap fingerprint still appear (with
    * shared_fps counting only sub-cap hashes — raise minShared with care).
    */
  /** Drop posting-list rows whose key's document frequency exceeds the
    * cap — the shared hot-boilerplate guard of [[winnowPairs]] /
    * [[incrementalWinnowPairs]] (and the same idiom as
    * [[Dedup.ngramJaccardPairs]]'s). `postings` must hold one row per
    * (doc, key); 0 disables.
    */
  private def capPostings(postings: DataFrame, keyCol: String,
      maxDocFreq: Long): DataFrame =
    if (maxDocFreq <= 0L) postings
    else {
      val keep = postings.groupBy(col(keyCol))
        .agg(count(lit(1)).as("df"))
        .where(col("df") <= maxDocFreq).select(keyCol)
      postings.join(keep, Seq(keyCol))
    }

  def winnowPairs(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 5, windowSize: Int = 4, minShared: Long = 1L,
      maxDocFreq: Long = Dedup.AdaptiveDocFreq): DataFrame = {
    // adaptive default (Dedup.autoMaxDocFreq): winnowing SELECTS
    // boilerplate by design, so the uncapped default is the one that
    // fans out N²/2 pair rows on a shared footer at 100×; 0 = uncapped
    val cap = Dedup.resolveDocFreqCap(maxDocFreq, docs)
    // pinned: both self-join sides subscribe the fingerprint frame, and
    // its lineage is the full winnow chain (gram hash + window min +
    // distinct) — without the pin the corpus fingerprints twice
    val fp = capPostings(
      winnowFingerprints(docs, textCol, idCol, k, windowSize)
        .select(col(idCol), col("fp_hash")).distinct(),
      "fp_hash", cap)
      .localCheckpoint(true)
    fp.alias("a").join(fp.alias("b"),
        col("a.fp_hash") === col("b.fp_hash") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .where(col("shared_fps") >= minShared)
  }

  /** Copy-detection of a NEW batch against a persisted fingerprint
    * index: [[winnowFingerprints]] of the corpus is the at-rest index
    * (write it once, append per ingest); the batch is fingerprinted with
    * the same (k, windowSize) and joined on the selected hash — the
    * corpus is never re-fingerprinted. Returns (batch_id, corpus_id,
    * shared_fps) for pairs sharing ≥ minShared fingerprints. The winnow
    * counterpart of Dedup.incrementalNearDupPairs.
    *
    * `maxDocFreq > 0` drops fingerprints whose CORPUS document frequency
    * exceeds the cap before the join — the hot-boilerplate guard of
    * [[winnowPairs]], measured on the at-rest index (the batch side is
    * small by construction; the corpus side is where a template
    * fingerprint matches every batch doc against thousands of corpus
    * docs). Same recall trade as winnowPairs, documented there.
    */
  def incrementalWinnowPairs(batch: DataFrame, corpusIndex: DataFrame,
      textCol: String, idCol: String, k: Int = 5, windowSize: Int = 4,
      minShared: Long = 1L, maxDocFreq: Long = Dedup.AdaptiveDocFreq): DataFrame = {
    requireWinnowScheme(corpusIndex) // pre-change indexes match zero pairs
    val bfp = winnowFingerprints(batch, textCol, idCol, k, windowSize)
      .select(col(idCol).as("batch_id"), col("fp_hash")).distinct()
    val cdocs = corpusIndex.select(col(idCol).as("corpus_id"), col("fp_hash")).distinct()
    // adaptive default sized on the at-rest index's document count (one
    // distinct-count job over the index, not the corpus text); 0 = uncapped
    val cap =
      if (maxDocFreq == Dedup.AdaptiveDocFreq)
        Dedup.autoMaxDocFreq(cdocs.select("corpus_id").distinct().count())
      else maxDocFreq
    val cfp = capPostings(cdocs, "fp_hash", cap)
    bfp.join(cfp, Seq("fp_hash"))
      .groupBy(col("batch_id"), col("corpus_id"))
      .agg(count(lit(1)).as("shared_fps"))
      .where(col("shared_fps") >= minShared)
  }

  /** Per-document novelty against a REFERENCE corpus: the fraction of a
    * document's distinct n-word shingles that do NOT occur anywhere in
    * the reference — the incremental-crawl triage signal ("how much of
    * this new dump is actually new text") scored per document, where
    * [[Dedup.incrementalNearDupPairs]] gives a boolean and
    * [[contamination]] targets a small eval set. Documents with novelty
    * near 0 are re-crawls; near 1, fresh content.
    *
    * Scale shape: the reference collapses to its DISTINCT shingle set
    * once (map-side-combined distinct), the batch posting list left-joins
    * it on the shingle key, and one doc-id shuffle aggregates the
    * fraction. Nothing is broadcast — both sides shuffle on the shingle —
    * so reference size is unbounded.
    */
  def noveltyScore(batch: DataFrame, reference: DataFrame, textCol: String,
      idCol: String, shingleWords: Int = 3): DataFrame = {
    val refSet = reference
      .select(explode(array_distinct(T.wordShingles(col(textCol), shingleWords))).as("g"))
      .distinct()
      .withColumn("graft_seen", lit(1))
    batch.select(col(idCol),
        explode(array_distinct(T.wordShingles(col(textCol), shingleWords))).as("g"))
      .join(refSet, Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("graft_seen").isNull, 1L).otherwise(0L)).as("novel_shingles"))
      .select(col(idCol), col("n_shingles"), col("novel_shingles"),
        round(col("novel_shingles").cast("double") / col("n_shingles"), 6)
          .as("novelty"))
  }

  /** Eval-set contamination scan — the decontamination primitive every
    * pre-training pipeline needs: corpus documents sharing ≥ `minShared`
    * distinct word n-gram shingles with any eval document are flagged
    * (training on eval data invalidates the eval). Inverted-index join on
    * the shingle, exactly like Dedup.ngramJaccardPairs, but the eval side
    * is small by definition so Spark broadcasts its posting list — the
    * corpus never shuffles, each corpus partition streams against the
    * broadcast eval shingles. Returns one row per contaminated
    * (corpus doc, eval doc) pair with the shared-shingle count.
    */
  def contamination(corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, shingleWords: Int = 3,
      minShared: Long = 1L, broadcastEval: Boolean = true): DataFrame = {
    def posting(df: DataFrame, as: String) =
      df.select(col(idCol).as(as),
        explode(array_distinct(T.wordShingles(col(textCol), shingleWords))).as("g"))
    // eval benchmarks are small by definition; pass broadcastEval = false
    // for the rare huge-eval case to fall back to a shuffle join instead
    // of forcing an executor-memory-sized broadcast
    val evalPosting = posting(evalSet, "eval_id")
    posting(corpus, "doc_id_c").join(
        if (broadcastEval) broadcast(evalPosting) else evalPosting, Seq("g"))
      .groupBy(col("doc_id_c"), col("eval_id"))
      .agg(count(lit(1)).as("shared_shingles"))
      .where(col("shared_shingles") >= minShared)
      .select(col("doc_id_c").as("doc_id"), col("eval_id"), col("shared_shingles"))
  }

  /** Drop every corpus document contaminated against the eval set — the
    * apply-side of [[contamination]] (left-anti join on the flagged ids).
    */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, shingleWords: Int = 3,
      minShared: Long = 1L): DataFrame =
    corpus.join(
      contamination(corpus, evalSet, textCol, idCol, shingleWords, minShared)
        .select(col("doc_id").as("graft_contaminated_id")).distinct(),
      corpus(idCol) === col("graft_contaminated_id"), "left_anti")

  /** SPAN-level decontamination: remove the contaminated LINES of each
    * document and keep the rest — the surgical alternative to
    * [[decontaminate]] when an eval snippet is quoted inside an otherwise
    * clean document (dropping the whole doc wastes the clean 99 %). A
    * line is contaminated when it shares ≥ `minShared` word shingles with
    * the eval set. Rebuild preserves line order; fully-contaminated docs
    * come back as empty strings (gate on length downstream), mirroring
    * [[stripBoilerplate]]'s contract.
    *
    * Scale shape: line posexplode, shingle explode of the lines, one join
    * against the (broadcast) eval posting list, per-(doc, line) rollup,
    * anti-join + order-preserving reassembly. The eval side is
    * benchmark-sized by definition.
    */
  def decontaminateSpans(corpus: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, shingleWords: Int = 3,
      minShared: Long = 1L): DataFrame = {
    val evalPosting = broadcast(evalSet.select(
      explode(array_distinct(T.wordShingles(col(textCol), shingleWords))).as("g"))
      .distinct())
    val lines = corpus.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val contaminated = lines
      .select(col(idCol), col("pos"),
        explode(array_distinct(T.wordShingles(col("line"), shingleWords))).as("g"))
      .join(evalPosting, Seq("g"))
      .groupBy(col(idCol), col("pos"))
      .agg(count(lit(1)).as("graft_shared"))
      .where(col("graft_shared") >= minShared)
      .select(col(idCol).as("graft_cid"), col("pos").as("graft_cpos"))
    val rebuilt = lines
      .join(contaminated,
        col(idCol) === col("graft_cid") && col("pos") === col("graft_cpos"),
        "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), "\n").as(textCol))
    corpus.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol))
  }

  /** C4-style exact paragraph-level dedup (Raffel et al. 2020 §2.2 keep
    * one occurrence): every distinct line (split on `\n`) survives only
    * at its globally FIRST occurrence — min (doc id, position) — and is
    * removed everywhere else, including repeats inside the same
    * document. Documents reassemble from surviving lines in order; a
    * document whose every line occurred earlier elsewhere comes back as
    * an empty string rather than vanishing (dropping empties is a
    * quality-gate decision, the [[stripBoilerplate]] policy).
    *
    * Scale shape: the winner election groups on a two-word 128-bit line
    * hash instead of the line text (16 B of shuffle key per line,
    * collision-safe at 3×10¹⁰ distinct lines), the keep join reuses the
    * same hash partitioning (one exchange feeds both), and reassembly is
    * the per-doc sort-by-position aggregate. No all-pairs anything.
    */
  def dedupParagraphs(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val lines = docs.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("graft_h1", xxhash64(lit(0L), col("line")))
      .withColumn("graft_h2", xxhash64(lit(1L), col("line")))
    val winners = lines.groupBy(col("graft_h1"), col("graft_h2"))
      .agg(min(struct(col(idCol).as("wid"), col("pos").as("wpos"))).as("w"))
      .select(col("graft_h1"), col("graft_h2"),
        col("w.wid").as("graft_wid"), col("w.wpos").as("graft_wpos"))
    val rebuilt = lines.join(winners, Seq("graft_h1", "graft_h2"))
      .where(col(idCol) === col("graft_wid") && col("pos") === col("graft_wpos"))
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), "\n").as(textCol))
    docs.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol))
  }

  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis 2006): each row draws u ∈ (0, 1] from the 60-bit md5 of
    * (salt, id) and keys on -ln(u)/w — the k SMALLEST keys are a
    * weight-proportional draw without replacement. Keys round to the
    * repo-wide 6-dp grain with id tie-breaks so the selection is
    * engine-portable; the md5 source makes the draw reproducible across
    * runs, partitionings, and engines (never `rand()`).
    *
    * Scale shape: the key is map-side arithmetic and the k smallest
    * rows come back via TakeOrdered (k per partition → driver merge of
    * P·k rows) — no global sort, no shuffle of the corpus. The rank
    * window runs over the k selected rows only.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "graft-wsample"): DataFrame = {
    require(k >= 1, "weightedSample: k must be >= 1")
    val h = conv(substring(
        md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))), 1, 15),
      16, 10).cast("long")
    val u = (h.cast("double") + lit(1.0)) / lit(math.pow(2.0, 60))
    val w = col(weightCol).cast("double")
    val keyed = df.where(w > 0)
      .withColumn("graft_key", round(-log(u) / w, 6))
    keyed.orderBy(col("graft_key").asc, col(idCol).asc).limit(k)
      .withColumn("sample_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("graft_key").asc, col(idCol).asc)))
      .select(col(idCol), col(weightCol),
        col("graft_key").as("sample_key"), col("sample_rank"))
  }

  /** Negative-sampling table (Mikolov et al. 2013's unigram^power
    * distribution, power = 0.75): draw k distinct terms
    * weight-proportionally to freq^power — the noise table contrastive /
    * NCE training samples against. Composes the term-frequency count
    * with [[weightedSample]]'s deterministic Efraimidis–Spirakis draw,
    * so the table is reproducible across runs, partitionings, and
    * engines.
    *
    * Scale shape: one map-side-combined term count (vocabulary-bounded,
    * not corpus-bounded, after the combine) and the TakeOrdered top-k —
    * no global sort, no driver vocabulary.
    */
  def negativeSampling(docs: DataFrame, textCol: String, k: Int,
      power: Double = 0.75,
      salt: String = "graft-negsample"): DataFrame = {
    require(k >= 1, "negativeSampling: k must be >= 1")
    val counts = docs
      .select(explode(T.wordShingles(col(textCol), 1)).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("term_freq"))
      .withColumn("graft_w", pow(col("term_freq").cast("double"), power))
    weightedSample(counts, "term", "graft_w", k, salt)
      .select(col("term"), col("sample_key"), col("sample_rank"))
  }

  /** Temperature-scaled source mixing (the multilingual-LM sampling
    * scheme: p_s ∝ n_s^α): per-source document counts, the α-scaled
    * share, and the integer per-source document budget at `budget`
    * total. α < 1 flattens the mixture toward uniform (upsampling small
    * sources); α = 1 is proportional; α = 0 is uniform. One
    * map-side-combined aggregation; the normalizer is a broadcast 1-row
    * cross join — nothing scales with corpus size past the first count.
    */
  def temperatureMixture(df: DataFrame, sourceCol: String, alpha: Double,
      budget: Long): DataFrame = {
    require(budget >= 0, "temperatureMixture: budget must be >= 0")
    val weighted = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("graft_w", pow(col("n_docs").cast("double"), lit(alpha)))
    val total = weighted.agg(sum(col("graft_w")).as("graft_tot"))
    // budget allocation floors the 6-dp-ROUNDED share: the raw ratio can
    // land exactly on an integer (uniform sources), where a 1-ulp pow()
    // difference across engines flips the floor — the quantized share
    // multiplies to the identical double everywhere. Rounding UP at a
    // 6-dp boundary can push the floored budgets past `budget` by a few
    // docs; the overshoot comes off the shares in (share desc, source
    // asc) order, each floored at 0, spilling to the next until absorbed
    // (deduction_i = clamp(excess − Σ_{j<i} b0_j, 0, b0_i)) — so
    // sum(docs_at_budget) <= budget holds for ANY source count, not just
    // while the largest share can absorb the whole excess. The windows
    // run over the sources frame only (tiny by definition), never over
    // the corpus.
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("share").desc, col(sourceCol).asc)
    weighted.crossJoin(broadcast(total))
      .select(col(sourceCol), col("n_docs"),
        round(col("graft_w") / col("graft_tot"), 6).as("share"))
      .withColumn("graft_b0",
        floor(lit(budget.toDouble) * col("share")).cast("long"))
      .withColumn("graft_excess",
        greatest(sum(col("graft_b0"))
          .over(org.apache.spark.sql.expressions.Window.partitionBy()) -
          budget, lit(0L)))
      .withColumn("graft_prior",
        coalesce(sum(col("graft_b0")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("docs_at_budget",
        col("graft_b0") - least(col("graft_b0"),
          greatest(col("graft_excess") - col("graft_prior"), lit(0L))))
      .select(col(sourceCol), col("n_docs"), col("share"),
        col("docs_at_budget"))
  }

  /** BM25 keyword retrieval (Robertson et al., Okapi BM25, with the
    * Lucene `ln(1 + (N − df + 0.5)/(df + 0.5))` always-positive idf):
    * top-k documents for a bag of query terms, scored
    * Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    * Ranking and ties are on the 6-dp-rounded score with doc-id
    * tie-break, so the hit list is engine-reproducible.
    *
    * Scale shape: doc length and corpus stats are map-side + one 2-value
    * aggregate; the token explode filters to the query terms BEFORE the
    * (doc, term) shuffle, so the posting volume is docs × |terms|, not
    * the corpus token count; per-term df is a |terms|-row broadcast; the
    * final top-k is TakeOrdered (k per partition + driver merge), no
    * global sort.
    */
  def bm25Search(docs: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k: Int = 20, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Search: terms must be non-empty")
    require(terms.distinct.size == terms.size, "bm25Search: terms must be distinct")
    // the tokenizer emits lowercase [a-z0-9]+ only — any other term can
    // never match and would silently return a short hit list (it would
    // also break the oracle's SQL literal); reject typed instead
    require(terms.forall(_.matches("[a-z0-9]+")),
      s"bm25Search: terms must be lowercase [a-z0-9]+ tokens, got " +
        terms.filterNot(_.matches("[a-z0-9]+")).mkString(", "))
    require(k >= 1, "bm25Search: k must be >= 1")
    val dl = size(filter(T.wordShingles(col(textCol), 1), x => x =!= lit("")))
    val stats = docs
      .select(dl.as("graft_dl"))
      .agg(count(lit(1)).as("graft_n"), avg(col("graft_dl")).as("graft_avgdl"))
    // tokenize ONCE into a column; dl and the explode both derive from it
    // (Catalyst does not CSE the kernel across Project/Generate)
    val tf = docs
      .select(col(idCol), T.wordShingles(col(textCol), 1).as("graft_toks"))
      .select(col(idCol),
        size(filter(col("graft_toks"), x => x =!= lit(""))).as("graft_dl"),
        explode(col("graft_toks")).as("graft_w"))
      .where(col("graft_w").isin(terms.map(x => x: Any): _*))
      .groupBy(col(idCol), col("graft_dl"), col("graft_w"))
      .agg(count(lit(1)).as("graft_tf"))
      // pinned: ≤ |terms| rows per matching doc, but both the df rollup
      // and the scoring join subscribe it — without the pin the corpus
      // tokenize+filter runs twice
      .localCheckpoint(true)
    val dfc = tf.groupBy(col("graft_w")).agg(count(lit(1)).as("graft_df"))
    val scored = tf.join(broadcast(dfc), "graft_w")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(sum(
        log((col("graft_n") - col("graft_df") + 0.5) /
          (col("graft_df") + 0.5) + 1.0) *
          col("graft_tf") * (k1 + 1.0) /
          (col("graft_tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("graft_dl") / col("graft_avgdl"))))
        .as("graft_score"))
    Ranking.topK(scored, "graft_score", idCol, k, "score")
  }

  /** Gopher-style repetition signal (Rae et al. 2021 §A1.1): the
    * fraction of a document's normalized characters covered by
    * occurrences of its single most frequent word n-gram
    * (count × gram length / text length; overlapping occurrences can
    * push it past 1 on degenerate all-same-token docs — that's the
    * signal working). Most-frequent ties break on the gram's binary
    * collation so the reported gram is deterministic.
    *
    * Scale shape: ZERO shuffle. A document's grams all live in its own
    * row, so the per-doc argmax is the native
    * [[graft.plans.TopShingleRun]] eval (shingle + sort + run-length
    * scan in one JVM loop) — the whole operator is a map-side projection.
    * The exploded groupBy alternative shuffles every gram occurrence of
    * the corpus twice to pick one winner per doc (13 s vs ~1 s at sf0.1).
    */
  def topNgramFraction(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 2): DataFrame = {
    require(n >= 1, "topNgramFraction: n must be >= 1")
    // numerator AND denominator both come out of the one TopShingleRun
    // eval — same tokenizer for gram, count, and normalized length, so
    // the fraction cannot desync on inputs where a regex normalize and
    // the ASCII kernel disagree (the winnowFingerprints lesson)
    docs.select(col(idCol),
        graft.plans.ShingleExpression.topShingleRun(col(textCol), n).as("top"))
      .where(col("top.norm_len") > 0)
      .select(col(idCol), col("top.gram").as("top_gram"),
        col("top.cnt").as("gram_count"),
        round(col("top.cnt").cast("double") * length(col("top.gram")) /
          col("top.norm_len"), 6).as("char_fraction"))
  }

  /** Per-source vocabulary profile: token count, type (distinct-term)
    * count, type-token ratio (Herdan's lexical-diversity measure) and
    * hapax-legomenon fraction — the crawl-triage numbers that separate
    * templated/machine-generated dumps (low TTR, low hapax: the same
    * words over and over) from natural prose, and the vocabulary-size
    * input to tokenizer training. Same [[graft.plans.WordShingles]]
    * tokenizer as every other text operator.
    *
    * Scale shape: one (source, term) shuffle with map-side combine — the
    * term-frequency table is the only wide stage; the per-source rollup
    * runs on the types table (bounded by vocabulary, not corpus, size)
    * and the doc-count side is a separate tiny aggregate joined
    * null-safely (a null source is a real group, not a dropped one).
    */
  def vocabStats(docs: DataFrame, textCol: String,
      sourceCol: String): DataFrame = {
    val tf = docs
      .select(col(sourceCol), explode(T.wordShingles(col(textCol), 1)).as("graft_t"))
      .groupBy(col(sourceCol), col("graft_t"))
      .agg(count(lit(1)).as("graft_c"))
      .groupBy(col(sourceCol))
      .agg(sum(col("graft_c")).cast("bigint").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("graft_c") === 1L, 1L).otherwise(0L)).cast("bigint")
          .as("n_hapax"))
      .withColumnRenamed(sourceCol, "graft_src")
    docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
      .join(tf, col(sourceCol) <=> col("graft_src"), "left")
      .select(col(sourceCol), col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"),
        round(col("n_types").cast("double") / col("n_tokens"), 6)
          .as("type_token_ratio"),
        round(col("n_hapax").cast("double") / col("n_types"), 6)
          .as("hapax_fraction"))
  }

  /** Per-source Zipf slope: the least-squares slope of log2(freq) on
    * log2(rank) over the top `maxRank` terms — natural language sits
    * near −1 (Zipf's law); templated/machine-generated dumps flatten
    * toward 0 or fall off a cliff, so the slope is a corpus-level
    * authenticity signal the per-doc scores can't see. Rank is the
    * deterministic (freq desc, term asc) row number; the regression runs
    * through the built-in `regr_slope` aggregate (same estimator both
    * engines — the [[GraftFrame.correlationMatrix]] precedent).
    *
    * Scale shape: one (source, term) map-side-combined count shuffle;
    * the rank window and regression run over the vocabulary-bounded
    * frequency table capped at `maxRank` rows per source — corpus size
    * never reaches the window.
    */
  def zipfSlope(docs: DataFrame, textCol: String, sourceCol: String,
      maxRank: Int = 1000): DataFrame = {
    require(maxRank >= 2, "zipfSlope: maxRank must be >= 2 (a slope needs 2 points)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col("graft_c").desc, col("graft_t").asc)
    docs.select(col(sourceCol), explode(T.wordShingles(col(textCol), 1)).as("graft_t"))
      .groupBy(col(sourceCol), col("graft_t"))
      .agg(count(lit(1)).as("graft_c"))
      .withColumn("graft_r", row_number().over(w))
      .where(col("graft_r") <= maxRank)
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).cast("bigint").as("n_terms_used"),
        round(expr("regr_slope(log2(graft_c), log2(graft_r))"), 6)
          .as("zipf_slope"))
  }

  /** Cross-source quality calibration: each document's quality score
    * mapped to its percent rank WITHIN its source — the fix for "source
    * A's 0.6 means something different than source B's 0.6" when a
    * mixture keeps the top X% of every source (FineWeb-style pipelines
    * threshold per source for exactly this reason). Ranks on the
    * 6-dp-rounded score with NO id tie-break: tied scores share a rank,
    * so the calibrated value is a property of the score, deterministic
    * in both engines ((rank−1)/(n−1), single-row groups → 0).
    *
    * Scale shape: one window over source-partitioned rows carrying
    * (id, source, quality) only. A source too large for one partition's
    * sort calibrates with [[curriculumBins]]' distributed ntile instead
    * (percentile grain traded for partition-size independence).
    */
  def calibrateQuality(docs: DataFrame, textCol: String, idCol: String,
      sourceCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col("quality"))
    Par.fanOut(docs.select(col(idCol), col(sourceCol), col(textCol)))
      .select(col(idCol), col(sourceCol),
        round(T.qualityScore(col(textCol)), 6).as("quality"))
      .withColumn("calibrated", round(percent_rank().over(w), 6))
  }

  /** Pairwise Jensen–Shannon divergence between per-source unigram
    * distributions (bits, 0 = identical, 1 = disjoint) — the
    * distributional "which crawls are redundant" matrix, where
    * [[groupOverlap]] answers the set question (shared vocabulary) this
    * answers the usage one (shared vocabulary AT the same frequencies).
    *
    * Zero-frequency terms need no smoothing: a term present in only one
    * side contributes p/2 to the divergence (its mixture m = p/2, so
    * ½·p·log2(2) = p/2), which lets the whole sum come off the INNER
    * join — JSD = ½·Σ_shared[p·log2(2p/(p+q)) + q·log2(2q/(p+q))]
    * + ½(1−P_shared) + ½(1−Q_shared), with P/Q_shared the shared-term
    * probability mass per side. No full-outer join, no vocabulary union
    * frame.
    *
    * Scale shape: one (source, term) count shuffle; the term self-join
    * fans out at most S rows per (term, side) — bounded by the source
    * count, not the corpus; the rollup is S²/2 rows.
    */
  def sourceDivergence(docs: DataFrame, textCol: String,
      sourceCol: String): DataFrame = {
    val p = docs
      .select(col(sourceCol).as("graft_s"),
        explode(T.wordShingles(col(textCol), 1)).as("graft_t"))
      .groupBy(col("graft_s"), col("graft_t"))
      .agg(count(lit(1)).as("graft_c"))
      .withColumn("graft_p",
        col("graft_c").cast("double") /
          sum(col("graft_c")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("graft_s"))))
    val a = p.select(col("graft_s").as("source_a"), col("graft_t"),
      col("graft_p").as("pa"))
    val b = p.select(col("graft_s").as("source_b"), col("graft_t"),
      col("graft_p").as("pb"))
    a.join(b, Seq("graft_t"))
      .where(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).cast("bigint").as("n_shared_terms"),
        sum(col("pa") * log2(lit(2.0) * col("pa") / (col("pa") + col("pb"))) +
          col("pb") * log2(lit(2.0) * col("pb") / (col("pa") + col("pb"))))
          .as("graft_shared"),
        sum(col("pa")).as("graft_pm"), sum(col("pb")).as("graft_qm"))
      .select(col("source_a"), col("source_b"), col("n_shared_terms"),
        round((col("graft_shared") +
          (lit(1.0) - col("graft_pm")) + (lit(1.0) - col("graft_qm"))) *
          lit(0.5), 6).as("jsd"))
  }
}
