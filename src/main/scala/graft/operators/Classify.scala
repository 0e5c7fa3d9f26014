package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Count-based text classification and data-selection operators for
  * training-data curation — the closed-form cousins of the fastText-style
  * quality/language filters every large-scale pipeline runs. Everything
  * here is derived purely from token counts, so results are deterministic,
  * engine-portable, and exactly recomputable by the DuckDB oracle (no
  * SGD, no float-order-dependent training loop).
  *
  * Beyond the reference (it has no classification surface); the methods
  * are public standards: multinomial Naive Bayes (McCallum & Nigam 1998)
  * and hashed-n-gram importance resampling (DSIR — Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling").
  */
object Classify {

  private def toks(df: DataFrame, textCol: String, extra: Column*): DataFrame =
    df.select(extra :+ explode(split(T.normalizeText(col(textCol)), " ")).as("token"): _*)
      .where(length(col("token")) > 0)

  /** Multinomial Naive Bayes scores for every (document, class) pair,
    * trained on `train` (labelCol = class) and applied to `docs`.
    * Add-1 smoothing over the training vocabulary V:
    *
    *   score(d, c) = ln P(c) + Σ_t n(d,t) · ln((cnt(t,c)+1) / (tok_c + V))
    *
    * The per-class sum is computed WITHOUT densifying the V×C model:
    * Σ n·ln(cnt+1) over the (token, class) pairs that exist (missing
    * pairs contribute ln(1) = 0 exactly), minus len(d)·ln(tok_c + V)
    * from the per-class normalizer — so the join stays proportional to
    * corpus token volume, not vocab × classes.
    *
    * Scale shape — the corpus is tokenized EXACTLY ONCE per distinct
    * frame. `docToks` (the per-doc bag-of-words matrix) is pinned with an
    * eager localCheckpoint and every downstream consumer reads the pin:
    * document lengths are a rollup of it (Σ n(d,t) = token count — same
    * value as re-splitting the text, without the second regex pass), and
    * in the common self-training call (`docs eq train`, e.g. scoring a
    * corpus against its own labels) the model counts are too, with the
    * label carried through the groupBy keys (label is functionally
    * dependent on the id, so the extra key changes nothing) — zero
    * tokenize passes over `train`. A distinct `train` costs one more
    * tokenize, also pinned. The pin is linear in corpus token-type volume
    * and lands on executor-local disk — no driver state. Priors come from
    * one C-row aggregation (one scan, no tokenize). The evidence join
    * broadcasts the V×C model when it is small enough (decided from the
    * pinned frame's exact row count, not a stats guess — localCheckpoint
    * erases size stats, which previously forced a sort-merge join that
    * shuffled the whole doc-token matrix on the Zipf-skewed token key);
    * past the broadcast bound it falls back to the shuffle join, which
    * AQE skew-splits. OOV tokens at predict time hit the smoothed floor
    * through the same ln(1)=0 identity.
    */
  def nbScores(docs: DataFrame, train: DataFrame, textCol: String,
      idCol: String, labelCol: String): DataFrame = {
    val shared = docs eq train
    // ln P(c) from document counts — one C-row scan; integers in, exact
    // doubles out
    val classDocs = train.groupBy(col(labelCol).as("graft_cls"))
      .agg(count(lit(1)).cast("double").as("graft_cdocs"))
      .localCheckpoint(true)
    val nDocs = classDocs.agg(sum(col("graft_cdocs"))).collect()
      .headOption.flatMap(r => Option(r.get(0))).map(_.asInstanceOf[Double])
      .getOrElse(0.0)
    require(nDocs > 0, "nbScores: training corpus is empty")
    val priors = classDocs.select(col("graft_cls"),
      log(col("graft_cdocs") / lit(nDocs)).as("graft_prior"))

    // the single tokenize pass over the predict corpus, pinned: three
    // consumers (lengths, evidence, and — when shared — the model)
    val docKeyNames = if (shared) Seq(idCol, "graft_doc_cls") else Seq(idCol)
    val docKeyCols =
      if (shared) Seq(col(idCol), col(labelCol).as("graft_doc_cls"))
      else Seq(col(idCol))
    val docToks = toks(docs, textCol, docKeyCols: _*)
      .groupBy(docKeyNames.map(col) :+ col("token"): _*)
      .agg(count(lit(1)).cast("double").as("graft_n"))
      .localCheckpoint(true)

    val tokenClass = (if (shared)
        docToks.groupBy(col("graft_doc_cls").as("graft_cls"), col("token"))
          .agg(sum(col("graft_n")).as("graft_tc"))
      else
        toks(train, textCol, col(labelCol).as("graft_cls"))
          .groupBy(col("graft_cls"), col("token"))
          .agg(count(lit(1)).cast("double").as("graft_tc"))
      ).localCheckpoint(true)
    val modelRows = tokenClass.count()
    val vocab = tokenClass.select(col("token")).distinct().count().toDouble
    // per-class token totals + the ln(tok_c + V) normalizer
    val classTotals = tokenClass.groupBy(col("graft_cls"))
      .agg(sum(col("graft_tc")).as("graft_tokc"))
      .select(col("graft_cls"),
        log(col("graft_tokc") + lit(vocab)).as("graft_lnz"))

    // document length = Σ_t n(d,t) over the pin; docs with zero tokens
    // have no docToks rows, preserving the drop-empty-docs contract
    val docLens = docToks.groupBy(col(idCol))
      .agg(sum(col("graft_n")).as("graft_len"))
    // Σ n(d,t)·ln(cnt(t,c)+1) — inner join: absent (t,c) pairs are ln(1)=0.
    // ~2M V×C rows ≈ tens of MB serialized: broadcast under that, shuffle
    // (AQE skew-aware) above
    val model =
      if (modelRows <= 2000000L) broadcast(tokenClass) else tokenClass
    val evidence = docToks.select(col(idCol), col("token"), col("graft_n"))
      .join(model, Seq("token"))
      .groupBy(col(idCol), col("graft_cls"))
      .agg(sum(col("graft_n") * log(col("graft_tc") + lit(1.0))).as("graft_s1"))

    docLens.crossJoin(broadcast(priors))
      .join(broadcast(classTotals), Seq("graft_cls"))
      .join(evidence, Seq(idCol, "graft_cls"), "left")
      .select(col(idCol), col("graft_cls").as("cls"),
        (col("graft_prior") + coalesce(col("graft_s1"), lit(0.0)) -
          col("graft_len") * col("graft_lnz")).as("score"))
  }

  /** Argmax-class prediction per document: the winner under the rounded
    * score (6 dp — the engine-portability grain every graded double in
    * this repo uses), ties broken on the class's binary collation so the
    * pick is deterministic on any engine. One window over the C rows per
    * document [[nbScores]] emits.
    */
  def nbPredict(docs: DataFrame, train: DataFrame, textCol: String,
      idCol: String, labelCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(round(col("score"), 6).desc, col("cls").asc)
    nbScores(docs, train, textCol, idCol, labelCol)
      .withColumn("graft_rn", row_number().over(w))
      .where(col("graft_rn") === 1)
      .select(col(idCol), col("cls").as("pred"),
        round(col("score"), 6).as("nb_score"))
  }

  /** k-nearest-neighbor classification over an embedding corpus: each
    * query takes the majority label of its k cosine-nearest corpus
    * vectors (excluding itself when ids collide) — vote-count ties break
    * to the smaller label, so the prediction is deterministic. The lazy
    * evaluation path for labeling data with an embedding model plus a
    * small labeled seed set.
    *
    * Built on [[Similarity.bruteForceTopK]] (exact, broadcast-join
    * shape); swap in `Similarity.ivfTopKIndexed` for the same vote over
    * a persisted ANN index when the corpus is web-scale. One extra
    * shuffle beyond the top-k: the (query, label) vote count.
    */
  def knnClassify(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, labelCol: String, k: Int): DataFrame = {
    require(k > 0, "knnClassify: k must be positive")
    val topk = Similarity.bruteForceTopK(corpus, queries, vecCol, idCol, k)
    val labels = corpus.select(col(idCol).as("corpus_id"),
      col(labelCol).as("graft_lbl"))
    val votes = topk.join(labels, Seq("corpus_id"))
      .groupBy(col("query_id"), col("graft_lbl"))
      .agg(count(lit(1)).as("votes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("graft_lbl").asc)
    votes.withColumn("graft_rn", row_number().over(w))
      .where(col("graft_rn") === 1)
      .select(col("query_id"), col("graft_lbl").as("pred"),
        col("votes").cast("bigint").as("votes"))
  }

  /** The 60-bit md5 feature bucket shared with the DuckDB oracle:
    * `('0x' || substr(md5(token), 1, 15))::BIGINT % buckets` — same trick
    * as Corpus.hashSplit, applied to tokens instead of ids.
    */
  private def tokenBucket(buckets: Int): Column =
    pmod(conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** DSIR-style hashed-unigram importance log-weights: how much more
    * likely each raw document is under the TARGET distribution than under
    * the RAW distribution, estimated over `buckets` hashed token features
    * with add-`smoothing` counts:
    *
    *   λ(b)    = ln((ct(b)+s)/(Tt+s·B)) − ln((cr(b)+s)/(Tr+s·B))
    *   logw(d) = Σ_tokens λ(bucket(token))
    *
    * Select the highest-weight documents to shift a web-scale corpus
    * toward a trusted target domain (the published estimator; hashing
    * bounds the feature space at any corpus size). Scale shape: two
    * map-side-combined bucket-count aggregations (B rows each — B is a
    * constant, e.g. 10⁴), a broadcast full-outer merge into the λ table,
    * then the raw corpus explodes to (id, bucket), joins the broadcast λ,
    * and one hash shuffle on the id sums per-doc. Nothing scales with
    * corpus size except the two count passes and the final per-doc sum.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, buckets: Int = 8192,
      smoothing: Double = 1.0): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    def bucketCounts(df: DataFrame): DataFrame =
      toks(df, textCol).select(tokenBucket(buckets).as("graft_b"))
        .groupBy(col("graft_b")).agg(count(lit(1)).cast("double").as("c"))
    // the bucket histograms partition every token exactly once, so the
    // corpus token totals are their sums — pin the (≤ buckets)-row
    // histograms and read the totals off them instead of re-running the
    // normalize+split+explode pass per corpus just to count (that was
    // two full-corpus scans for two scalars; same defect class as the
    // r12 NB tokenize-once fix)
    val rawC = bucketCounts(raw).localCheckpoint(true)
    val tgtC = bucketCounts(target).withColumnRenamed("c", "ct").localCheckpoint(true)
    def total(df: DataFrame, c: String): Double =
      df.agg(sum(col(c))).collect().headOption
        .map(r => if (r.isNullAt(0)) 0.0 else r.getDouble(0)).getOrElse(0.0)
    val rawTotal = total(rawC, "c")
    val tgtTotal = total(tgtC, "ct")
    val sB = smoothing * buckets
    // raw-side buckets are complete for every token the raw corpus holds,
    // so a full outer join only fills target-side zeros in practice
    val lambda = rawC.join(tgtC, Seq("graft_b"), "full_outer")
      .select(col("graft_b"),
        (log((coalesce(col("ct"), lit(0.0)) + lit(smoothing)) / lit(tgtTotal + sB)) -
         log((coalesce(col("c"), lit(0.0)) + lit(smoothing)) / lit(rawTotal + sB)))
          .as("graft_lam"))
    toks(raw, textCol, col(idCol))
      .select(col(idCol), tokenBucket(buckets).as("graft_b"))
      .join(broadcast(lambda), Seq("graft_b"))
      .groupBy(col(idCol))
      .agg(round(sum(col("graft_lam")), 6).as("logw"),
        count(lit(1)).as("n_tokens"))
  }

  /** Top-k selection under the importance weights — rank on the rounded
    * weight (engine-portable), ties to the smaller id. The deterministic
    * stand-in for DSIR's Gumbel resampling step. Two-phase ranking (the
    * repo-wide pattern): phase 1 takes each partition's local top-k under
    * a per-partition window, phase 2 ranks the ≤ k·partitions survivors —
    * no single-reducer scan of the full weight set. At production scale,
    * prefer a threshold from a weight histogram over an exact global k.
    */
  def importanceSelect(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, k: Int, buckets: Int = 8192,
      smoothing: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Seq(col("logw").desc, col(idCol).asc)
    val w1 = Window.partitionBy(col("graft_tk_pid")).orderBy(order: _*)
    val w2 = Window.orderBy(order: _*)
    importanceWeights(raw, target, textCol, idCol, buckets, smoothing)
      .withColumn("graft_tk_pid", spark_partition_id())
      .withColumn("graft_tk_rn", row_number().over(w1))
      .where(col("graft_tk_rn") <= k)
      .withColumn("rnk", row_number().over(w2))
      .where(col("rnk") <= k)
      .select(col(idCol), col("logw"), col("n_tokens"),
        col("rnk").cast("bigint").as("rnk"))
  }
}
