package graft

import graft.functions.{VectorFunctions => V}
import graft.operators.Corpus

/** DuckDB oracle-SQL builders for the extension queries whose round-1 rows
  * were `no_oracle`. Two strategies:
  *
  *  1. **Exact brute force** (minhash / ngram / simhash): the Spark side
  *     emits *verified* pairs with exact scores, so DuckDB can recompute
  *     the identical pair set by brute force at oracle scale. Scores are
  *     raw doubles from integer division (bit-identical across engines);
  *     hashes are MD5-derived (md5() exists in both engines — the 60-bit
  *     value is the first 15 hex chars, `('0x' || substr(md5(x), 1, 15))
  *     ::BIGINT` in DuckDB, `conv(substring(md5(x), 1, 15), 16, 10)` in
  *     Spark, a high-60-bits-of-digest kernel in native code).
  *
  *  2. **Algorithm replication** (sign-LSH ANN / embedding dedup / IVF):
  *     the hyperplanes are generated driver-side
  *     ([[V.hyperplanes]] — deterministic splitmix64), so the SAME
  *     constants are embedded into the oracle SQL as list literals and
  *     DuckDB replays bucketing → candidates → exact re-rank step for
  *     step. `Double.toString` round-trips, so the embedded literals parse
  *     back to bit-identical doubles.
  */
object OracleSql {

  /** Normalized word tokens of `documents.text` — must match
    * TextFunctions.normalizeText + split(" ") and the native
    * NativeOps.wordShingles tokenizer (lowercase, non-alnum → separator).
    */
  private val tokensExpr =
    "string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"

  /** 60-bit MD5 hash of a string expression. */
  private def md5Hash60(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** Exact n-word-shingle Jaccard pairs ≥ threshold over `documents` —
    * brute force via an inverted shingle index (identical math to
    * Dedup.ngramJaccardPairs; also the ground truth for the minhash-LSH
    * pair set — valid as an EQUALITY check only when the threshold sits
    * above the LSH S-curve knee, where P(miss) = (1-t^r)^b is negligible
    * for every qualifying pair on any corpus, e.g. < 1e-10 at t=0.85,
    * r=4, b=32).
    */
  def jaccardPairs(n: Int, threshold: Double,
      adaptiveDocFreqCap: Boolean = false): String = {
    val shingleCat = (1 to n).map(k => s"t[ii + $k]").mkString(" || ' ' || ")
    s"WITH toks AS (SELECT doc_id, $tokensExpr AS t FROM documents), " +
      s"sh AS (SELECT doc_id, CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')] " +
      s"ELSE list_distinct(list_transform(range(len(t) - ${n - 1}), ii -> $shingleCat)) END AS s FROM toks), " +
      "ex AS (SELECT doc_id, unnest(s) AS g FROM sh), " +
      adaptiveCapCtes(adaptiveDocFreqCap) +
      "inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i " +
      s"FROM ${capSide(adaptiveDocFreqCap)} a JOIN ${capSide(adaptiveDocFreqCap)} b " +
      "ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
      "sizes AS (SELECT doc_id, len(s) AS n FROM sh) " +
      "SELECT ia AS id_a, ib AS id_b, i::DOUBLE / (sa.n + sb.n - i) AS jaccard " +
      "FROM inter JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id " +
      s"WHERE i::DOUBLE / (sa.n + sb.n - i) >= $threshold"
  }

  /** Mirror of Dedup.autoMaxDocFreq + the posting df filter — the CTEs
    * that keep the oracle in lockstep with the engine's corpus-adaptive
    * `maxDocFreq` default (cap = max(32, ceil(4·log2(N))); sizes stay
    * unfiltered, exactly like the engine's jaccard/containment
    * denominators).
    */
  private def adaptiveCapCtes(on: Boolean): String =
    if (!on) ""
    else "freq AS (SELECT g, count(*) AS df FROM ex GROUP BY g), " +
      "cap AS (SELECT greatest(32, CAST(ceil(4 * log2(greatest(2, count(*)))) AS BIGINT)) AS c FROM documents), " +
      "exf AS (SELECT ex.doc_id, ex.g FROM ex JOIN freq USING (g) WHERE freq.df <= (SELECT c FROM cap)), "

  private def capSide(on: Boolean): String = if (on) "exf" else "ex"

  /** Brute-force asymmetric containment pairs (|A∩B| / min(|A|,|B|)):
    * same shingle builder as [[jaccardPairs]], containment normalizer,
    * contained-side tag (smaller shingle set; min id on ties).
    */
  def containmentPairs(n: Int, threshold: Double,
      adaptiveDocFreqCap: Boolean = false): String = {
    val shingleCat = (1 to n).map(k => s"t[ii + $k]").mkString(" || ' ' || ")
    s"WITH toks AS (SELECT doc_id, $tokensExpr AS t FROM documents), " +
      s"sh AS (SELECT doc_id, CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')] " +
      s"ELSE list_distinct(list_transform(range(len(t) - ${n - 1}), ii -> $shingleCat)) END AS s FROM toks), " +
      "ex AS (SELECT doc_id, unnest(s) AS g FROM sh), " +
      adaptiveCapCtes(adaptiveDocFreqCap) +
      "inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i " +
      s"FROM ${capSide(adaptiveDocFreqCap)} a JOIN ${capSide(adaptiveDocFreqCap)} b " +
      "ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
      "sizes AS (SELECT doc_id, len(s) AS n FROM sh) " +
      "SELECT ia AS id_a, ib AS id_b, " +
      "CASE WHEN sa.n < sb.n THEN ia WHEN sb.n < sa.n THEN ib " +
      "ELSE least(ia, ib) END AS contained_id, " +
      "i::DOUBLE / least(sa.n, sb.n) AS containment " +
      "FROM inter JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id " +
      s"WHERE i::DOUBLE / least(sa.n, sb.n) >= $threshold"
  }

  /** Replicated duplicate-span fraction (Corpus.duplicateSpanFraction):
    * same shingle builder, doc-freq over distinct shingles, per-doc
    * rollup; the fraction is a raw double division of two ints —
    * bit-identical across engines.
    */
  def duplicateSpanFraction(n: Int): String = {
    val shingleCat = (1 to n).map(k => s"t[ii + $k]").mkString(" || ' ' || ")
    s"WITH toks AS (SELECT doc_id, $tokensExpr AS t FROM documents), " +
      s"sh AS (SELECT doc_id, CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')] " +
      s"ELSE list_distinct(list_transform(range(len(t) - ${n - 1}), ii -> $shingleCat)) END AS s FROM toks), " +
      "ex AS (SELECT doc_id, unnest(s) AS g FROM sh), " +
      "freq AS (SELECT g, count(DISTINCT doc_id) AS df FROM ex GROUP BY g) " +
      "SELECT ex.doc_id, CAST(count(*) AS BIGINT) AS n_shingles, " +
      "CAST(sum(CASE WHEN freq.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_shingles, " +
      "CAST(sum(CASE WHEN freq.df > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_fraction " +
      "FROM ex JOIN freq ON ex.g = freq.g GROUP BY ex.doc_id"
  }

  /** Brute-force CROSS-set Jaccard pairs: batch (doc_id < batchMaxId) ×
    * corpus (doc_id ≥ batchMaxId) — the ground truth for
    * Dedup.incrementalNearDupPairs, same knee caveat as [[jaccardPairs]].
    */
  def crossJaccardPairs(n: Int, threshold: Double, batchMaxId: Long): String = {
    val shingleCat = (1 to n).map(k => s"t[ii + $k]").mkString(" || ' ' || ")
    s"WITH toks AS (SELECT doc_id, $tokensExpr AS t FROM documents), " +
      s"sh AS (SELECT doc_id, CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')] " +
      s"ELSE list_distinct(list_transform(range(len(t) - ${n - 1}), ii -> $shingleCat)) END AS s FROM toks), " +
      "ex AS (SELECT doc_id, unnest(s) AS g FROM sh), " +
      "inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i " +
      s"FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < $batchMaxId AND b.doc_id >= $batchMaxId GROUP BY 1, 2), " +
      "sizes AS (SELECT doc_id, len(s) AS n FROM sh) " +
      "SELECT ia AS batch_id, ib AS corpus_id, i::DOUBLE / (sa.n + sb.n - i) AS jaccard " +
      "FROM inter JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id " +
      s"WHERE i::DOUBLE / (sa.n + sb.n - i) >= $threshold"
  }

  /** The incremental-pipeline composition oracle: the corpus augmented
    * with the pipeline's planted copies, each doc assigned its sync batch
    * (base docs: doc_id % 3; copies: batch 2), then EVERY cross-batch
    * pair (later batch × any earlier batch) at shingle-Jaccard ≥
    * threshold — brute force, no band/index/feed replication, so a
    * double-appended sink batch, a missed change window, or a stale
    * band index in the Spark pipeline all diverge from it.
    */
  def incrementalPipeline(n: Int, threshold: Double): String = {
    val shingleCat = (1 to n).map(k => s"t[ii + $k]").mkString(" || ' ' || ")
    "WITH aug AS (SELECT doc_id, text, doc_id % 3 AS batch FROM documents " +
      "UNION ALL SELECT doc_id + 100000 AS doc_id, " +
      "text || ' incremental sync copy' AS text, 2 AS batch " +
      "FROM documents WHERE doc_id % 5 = 0), " +
      s"toks AS (SELECT doc_id, batch, $tokensExpr AS t FROM aug), " +
      s"sh AS (SELECT doc_id, batch, CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')] " +
      s"ELSE list_distinct(list_transform(range(len(t) - ${n - 1}), ii -> $shingleCat)) END AS s FROM toks), " +
      "ex AS (SELECT doc_id, batch, unnest(s) AS g FROM sh), " +
      "inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i " +
      "FROM ex a JOIN ex b ON a.g = b.g AND a.batch > b.batch GROUP BY 1, 2), " +
      "sizes AS (SELECT doc_id, len(s) AS n FROM sh) " +
      "SELECT ia AS batch_id, ib AS corpus_id, i::DOUBLE / (sa.n + sb.n - i) AS jaccard " +
      "FROM inter JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id " +
      s"WHERE i::DOUBLE / (sa.n + sb.n - i) >= $threshold"
  }

  /** Connected-component cluster assignment over the brute-force Jaccard
    * pair set: a recursive CTE closes the reachability relation (seeded
    * with every doc reaching itself), then cluster_id = min reachable id —
    * the same component-min contract as Dedup.connectedComponents, computed
    * by a completely different algorithm (transitive closure vs label
    * propagation), so agreement checks the clustering itself.
    */
  def dedupClusters(n: Int, threshold: Double): String =
    "WITH RECURSIVE pr AS (" + jaccardPairs(n, threshold) + "), " +
      "und AS (SELECT id_a AS s, id_b AS t FROM pr " +
      "UNION SELECT id_b, id_a FROM pr), " +
      "reach(v, r) AS (SELECT doc_id, doc_id FROM documents " +
      "UNION SELECT u.t, reach.r FROM reach JOIN und u ON u.s = reach.v) " +
      "SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v"

  /** The quality-score formula shared by the curate and best-survivor
    * oracles — must stay term-identical to TextFunctions.qualityScore.
    */
  private def qualityScoreSql: String = {
    val toks = "string_split_regex(trim(lower(text)), '\\s+')"
    val pr = "CAST(length(regexp_replace(text, '[^.,;:!?''\"()\\[\\]{}]', '', 'g')) AS DOUBLE) / length(text)"
    val dr = "CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text)"
    val sw = s"CAST(len(list_filter($toks, x -> x IN ('the','a','and','of','to','in','is','it','that','for'))) AS DOUBLE) / len($toks)"
    s"round(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4 + " +
      s"greatest(0.0, 1.0 - ($pr) * 5.0) * 0.2 + " +
      s"greatest(0.0, 1.0 - ($dr) * 5.0) * 0.2 + " +
      s"least(($sw) * 4.0, 1.0) * 0.2, 6)"
  }

  /** PSI score drift between `WHERE aWhere` and `WHERE bWhere` slices of
    * `documents` — identical math to Corpus.scoreDrift (same rounded
    * quality formula, fixed [0,1] bins, add-half smoothing).
    */
  def scoreDrift(bins: Int, aWhere: String, bWhere: String): String =
    s"WITH sc AS (SELECT doc_id, $qualityScoreSql AS s, " +
      s"($aWhere) AS ina, ($bWhere) AS inb FROM documents), " +
      s"bn AS (SELECT least(CAST(floor(s * $bins) AS BIGINT), ${bins - 1}) AS bin, " +
      "ina, inb FROM sc), " +
      "ca AS (SELECT bin, count(*)::DOUBLE AS ca FROM bn WHERE ina GROUP BY 1), " +
      "cb AS (SELECT bin, count(*)::DOUBLE AS cb FROM bn WHERE inb GROUP BY 1), " +
      "na AS (SELECT count(*)::DOUBLE AS na FROM bn WHERE ina), " +
      "nb AS (SELECT count(*)::DOUBLE AS nb FROM bn WHERE inb), " +
      s"ab AS (SELECT range AS bin FROM range($bins)), " +
      "pq AS (SELECT ab.bin, " +
      s"(coalesce(ca.ca, 0.0) + 0.5) / (na.na + 0.5 * $bins) AS p, " +
      s"(coalesce(cb.cb, 0.0) + 0.5) / (nb.nb + 0.5 * $bins) AS q " +
      "FROM ab LEFT JOIN ca USING (bin) LEFT JOIN cb USING (bin), na, nb) " +
      "SELECT bin, round(p, 6) AS p, round(q, 6) AS q, " +
      "round((p - q) * ln(p / q), 6) AS psi_term FROM pq"

  /** Curriculum bins — NTILE over (rounded quality, doc_id): standard SQL
    * NTILE puts the larger groups first, exactly GlobalOrder.ntile's
    * boundary rule.
    */
  def curriculumBins(k: Int): String =
    s"SELECT doc_id, $qualityScoreSql AS quality, " +
      s"CAST(ntile($k) OVER (ORDER BY $qualityScoreSql ASC, doc_id ASC) AS BIGINT) AS bin " +
      "FROM documents"

  /** Best-per-cluster survivors (Dedup.clusterSurvivorsBy with
    * qualityScore): transitive-closure clusters (a different algorithm
    * than the Spark side's label propagation, so the clustering itself is
    * cross-checked) + max-quality/min-id pick per cluster.
    */
  def clusterSurvivorsByQuality(n: Int, threshold: Double): String =
    "WITH RECURSIVE pr AS (" + jaccardPairs(n, threshold) + "), " +
      "und AS (SELECT id_a AS s, id_b AS t FROM pr " +
      "UNION SELECT id_b, id_a FROM pr), " +
      "reach(v, r) AS (SELECT doc_id, doc_id FROM documents " +
      "UNION SELECT u.t, reach.r FROM reach JOIN und u ON u.s = reach.v), " +
      "cl AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v) " +
      "SELECT d.doc_id FROM documents d JOIN cl ON d.doc_id = cl.doc_id " +
      s"QUALIFY row_number() OVER (PARTITION BY cl.cluster_id " +
      s"ORDER BY $qualityScoreSql DESC, d.doc_id ASC) = 1"

  /** Brute-force MD5-SimHash pairs with hamming ≤ maxHamming — recomputes
    * the per-token 60-bit digest words (word w = hex chars [15w+1, 15w+15]
    * of md5, matching NativeOps.md5Words), the ±1 bit votes (ties → 1,
    * matching NativeOps.simhashMd5Wide) and the full pairwise hamming
    * matrix summed across fingerprint words.
    */
  def simhashPairs(maxHamming: Int, bits: Int = 120): String = {
    val words = (bits + 59) / 60
    val ws = 0 until words
    def width(w: Int) = math.min(60, bits - 60 * w)
    val hCols = ws.map(w =>
      s"('0x' || substr(md5(t), ${1 + 15 * w}, 15))::BIGINT AS h$w").mkString(", ")
    val bitCols = ws.map(w =>
      s"CASE WHEN b < ${width(w)} AND sum(CASE WHEN (h$w >> b) & 1 = 1 THEN 1 ELSE -1 END) >= 0 " +
        s"THEN (1::BIGINT << b) ELSE 0::BIGINT END AS bit$w").mkString(", ")
    val shCols = ws.map(w => s"sum(bit$w)::BIGINT AS sh$w").mkString(", ")
    val hamming = ws.map(w => s"bit_count(xor(a.sh$w, b.sh$w))").mkString(" + ")
    s"WITH toks AS (SELECT doc_id, unnest($tokensExpr) AS t FROM documents), " +
      s"th AS (SELECT doc_id, $hCols FROM toks), " +
      s"bv AS (SELECT doc_id, b, $bitCols FROM th, range(60) r(b) GROUP BY doc_id, b), " +
      s"sh AS (SELECT doc_id, $shCols FROM bv GROUP BY doc_id) " +
      s"SELECT a.doc_id AS id_a, b.doc_id AS id_b, ($hamming)::BIGINT AS hamming " +
      "FROM sh a JOIN sh b ON a.doc_id < b.doc_id " +
      s"WHERE $hamming <= $maxHamming"
  }

  /** Replicated contamination scan (Corpus.contamination): inverted
    * shingle index joined corpus × eval (eval = doc_id < maxEvalId),
    * shared-distinct-shingle counts ≥ minShared. Same shingle builder as
    * [[jaccardPairs]].
    */
  def contamination(n: Int, maxEvalId: Long, minShared: Long): String = {
    val shingleCat = (1 to n).map(k => s"t[ii + $k]").mkString(" || ' ' || ")
    s"WITH toks AS (SELECT doc_id, $tokensExpr AS t FROM documents), " +
      s"sh AS (SELECT doc_id, CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')] " +
      s"ELSE list_distinct(list_transform(range(len(t) - ${n - 1}), ii -> $shingleCat)) END AS s FROM toks), " +
      "ex AS (SELECT doc_id, unnest(s) AS g FROM sh) " +
      "SELECT c.doc_id AS doc_id, e.doc_id AS eval_id, CAST(count(*) AS BIGINT) AS shared_shingles " +
      s"FROM ex c JOIN (SELECT * FROM ex WHERE doc_id < $maxEvalId) e ON c.g = e.g " +
      s"GROUP BY 1, 2 HAVING count(*) >= $minShared"
  }

  /** Replicated deterministic stratified sample (Corpus.stratifiedSample):
    * identical md5 bucket and FLOOR'd rate threshold (Spark's long cast
    * truncates; DuckDB's rounds — FLOOR aligns them).
    */
  def stratifiedSample(rates: Seq[(String, Double)], defaultRate: Double,
      salt: String = "graft", buckets: Long = 1000000L): String = {
    val rateExpr = rates.foldRight(defaultRate.toString) { case ((g, r), acc) =>
      s"CASE WHEN lang = '$g' THEN $r ELSE $acc END"
    }
    s"SELECT doc_id, lang FROM (SELECT doc_id, lang, " +
      s"${md5Hash60(s"'$salt' || doc_id::VARCHAR")} % $buckets AS h FROM documents) " +
      s"WHERE h < CAST(FLOOR(($rateExpr) * $buckets) AS BIGINT)"
  }

  /** Replicated token-budget mixture (Corpus.tokenBudgetMixture): same
    * md5 gate as [[stratifiedSample]] with the rate derived from the
    * per-source token totals — min(1, budget / total), unlisted sources
    * at 1.0.
    */
  def tokenBudgetMixture(budgets: Seq[(String, Long)],
      salt: String = "graft", buckets: Long = 1000000L): String = {
    val rateExpr = budgets.foldLeft("1.0") { case (acc, (s, b)) =>
      s"CASE WHEN source = '$s' THEN least(1.0, $b / tot) ELSE $acc END"
    }
    "WITH tk AS (SELECT doc_id, source, " +
      "CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tokens, " +
      s"${md5Hash60(s"'$salt' || doc_id::VARCHAR")} % $buckets AS h FROM documents), " +
      "tot AS (SELECT source, sum(n_tokens)::DOUBLE AS tot FROM tk GROUP BY 1) " +
      "SELECT doc_id, source, n_tokens FROM tk JOIN tot USING (source) " +
      s"WHERE h < CAST(FLOOR(($rateExpr) * $buckets) AS BIGINT)"
  }

  /** Replicated deterministic hash split — identical md5-derived bucket and
    * identical boundary arithmetic (shared via Corpus.splitBounds).
    */
  def corpusSplit(splits: Seq[(String, Double)], salt: String = "graft",
      buckets: Long = 1000000L): String = {
    val cases = Corpus.splitBounds(splits, buckets)
      .map { case (nm, lo, hi) => s"WHEN h >= $lo AND h < $hi THEN '$nm'" }
      .mkString(" ")
    s"SELECT split, count(*) AS n FROM (SELECT CASE $cases ELSE '${splits.last._1}' END AS split " +
      s"FROM (SELECT ${md5Hash60(s"'$salt' || doc_id::VARCHAR")} % $buckets AS h FROM documents)) " +
      "GROUP BY split"
  }

  /** Replicated deterministic shuffle (Corpus.shuffle): same 60-bit md5
    * order key, same (hash, id) tiebreak; the window ROW_NUMBER here is
    * fine at oracle scale — the Spark side uses the distributed
    * GlobalOrder equivalent.
    */
  def corpusShuffle(salt: String = "graft-shuffle"): String =
    "SELECT doc_id, CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS shuffle_pos " +
      s"FROM (SELECT doc_id, ${md5Hash60(s"'$salt' || doc_id::VARCHAR")} AS h FROM documents)"

  /** Replicated mixture (Corpus.mixture): per-source WHERE + per-source
    * salted bucket + FLOOR'd threshold (Spark's `.toLong` truncates, so
    * FLOOR aligns the engines), UNION ALL'd like the plan-level concat.
    */
  def corpusMixture(sources: Seq[(String, String, Double)],
      salt: String = "graft-mix", buckets: Long = 1000000L): String =
    sources.map { case (name, whereSql, rate) =>
      s"SELECT doc_id, lang, '$name' AS mix_source FROM (" +
        s"SELECT doc_id, lang, ${md5Hash60(s"'$salt:$name' || doc_id::VARCHAR")} % $buckets AS h " +
        s"FROM documents WHERE $whereSql) " +
        s"WHERE h < CAST(FLOOR($rate * $buckets) AS BIGINT)"
    }.mkString(" UNION ALL ")

  /** End-to-end RAG ingestion replicated (chunk → hash embedding → ANN):
    * the chunking CTE, an 8-dim deterministic embedding (md5-60-bit word
    * per dimension scaled by 2⁶⁰ — int→double conversion is IEEE-identical
    * in both engines), and brute-force cosine top-k with id tie-break.
    */
  def ragPipeline(chunk: Int, overlap: Int, dim: Int, k: Int,
      maxQueryDoc: Long): String = {
    val stride = chunk - overlap
    "WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents), " +
      s"n AS (SELECT doc_id, tk, greatest(1, (len(tk) - $overlap + $stride - 1) // $stride) AS nc FROM t), " +
      "chunked AS (SELECT doc_id, unnest(range(nc)) AS chunk_idx, " +
      s"unnest(list_transform(range(nc), i -> array_to_string(tk[(i * $stride + 1):(i * $stride + $chunk)], ' '))) AS chunk_text FROM n), " +
      "ch AS (SELECT doc_id * 1000 + chunk_idx AS cid, chunk_text FROM chunked), " +
      s"emb AS (SELECT cid, list_transform(range($dim), j -> " +
      "('0x' || substr(md5(chunk_text || '#' || j), 1, 15))::BIGINT::DOUBLE / 1152921504606846976) AS v FROM ch), " +
      s"q AS (SELECT cid AS qid, v AS qv FROM emb WHERE cid % 1000 = 0 AND cid < ${maxQueryDoc * 1000}) " +
      "SELECT query_id, corpus_id, round(cos, 6) AS cosine, CAST(rnk AS BIGINT) AS rnk FROM (" +
      "SELECT q.qid AS query_id, e.cid AS corpus_id, list_cosine_similarity(e.v, q.qv) AS cos, " +
      "row_number() OVER (PARTITION BY q.qid " +
      "ORDER BY list_cosine_similarity(e.v, q.qv) DESC, e.cid ASC) AS rnk " +
      "FROM emb e, q WHERE e.cid <> q.qid) " +
      s"WHERE rnk <= $k"
  }

  /** Replicated oversampling (Corpus.oversample): floor(w) full copies
    * via a range cross join + the fractional hash draw as the last epoch.
    */
  def corpusOversample(weight: Double, salt: String = "graft-epoch",
      buckets: Long = 1000000L): String = {
    val full = math.floor(weight).toLong
    val frac = weight - full
    val parts = Seq(
      if (full > 0)
        Some(s"SELECT doc_id, CAST(e AS BIGINT) AS epoch FROM documents, range($full) r(e)")
      else None,
      if (frac > 0)
        Some(s"SELECT doc_id, CAST($full AS BIGINT) AS epoch FROM (" +
          s"SELECT doc_id, ${md5Hash60(s"'$salt' || doc_id::VARCHAR")} % $buckets AS h " +
          // frac is a full-precision double literal — force DOUBLE math,
          // DuckDB would otherwise parse it as a wide DECIMAL and overflow
          // on the buckets multiply
          s"FROM documents) WHERE h < CAST(FLOOR(CAST($frac AS DOUBLE) * $buckets) AS BIGINT)")
      else None).flatten
    parts.mkString(" UNION ALL ")
  }

  /** Replicated sequence packing (Corpus.packSequences): same token
    * count, same shuffle order, cumulative sum via window (oracle scale),
    * same chunk arithmetic — `//` is DuckDB's integer division, matching
    * Spark's FLOOR over non-negative operands.
    */
  def packSequences(budget: Long, salt: String = "graft-pack"): String =
    "WITH t AS (SELECT doc_id, CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
      "ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END AS BIGINT) AS n_tokens, " +
      s"${md5Hash60(s"'$salt' || doc_id::VARCHAR")} AS h FROM documents), " +
      "c AS (SELECT doc_id, n_tokens, sum(n_tokens) OVER (ORDER BY h, doc_id " +
      "ROWS UNBOUNDED PRECEDING) AS cum FROM t) " +
      s"SELECT doc_id, n_tokens, CAST((cum - n_tokens) // $budget AS BIGINT) AS first_chunk, " +
      s"CAST(greatest((cum - n_tokens) // $budget, (cum - 1) // $budget) AS BIGINT) AS last_chunk FROM c"

  /** Replicated chunking (Corpus.chunkDocuments): same whitespace
    * tokenization (verbatim case), same ceil-div chunk count, same
    * 1-based inclusive slices — DuckDB's parallel unnests zip, giving
    * (chunk_idx, chunk_text) pairs like Spark's posexplode.
    */
  def chunkDocuments(chunk: Int, overlap: Int): String = {
    val stride = chunk - overlap
    "WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents), " +
      s"n AS (SELECT doc_id, tk, greatest(1, (len(tk) - $overlap + $stride - 1) // $stride) AS nc FROM t) " +
      "SELECT doc_id, CAST(unnest(range(nc)) AS BIGINT) AS chunk_idx, " +
      s"unnest(list_transform(range(nc), i -> array_to_string(tk[(i * $stride + 1):(i * $stride + $chunk)], ' '))) AS chunk_text " +
      "FROM n"
  }

  /** End-to-end curation pipeline oracle: replicate qualityScore (same
    * component formulas as the q_text_quality oracle), first-occurrence
    * exact dedup, and the md5 hash split, then roll up per split.
    */
  def corpusCurate(minScore: Double, splits: Seq[(String, Double)],
      salt: String = "graft", buckets: Long = 1000000L): String = {
    val score = qualityScoreSql
    val cases = Corpus.splitBounds(splits, buckets)
      .map { case (nm, lo, hi) => s"WHEN h >= $lo AND h < $hi THEN '$nm'" }
      .mkString(" ")
    s"WITH gated AS (SELECT doc_id, text FROM documents WHERE $score >= $minScore), " +
      "surv AS (SELECT doc_id, text FROM gated QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1), " +
      s"assigned AS (SELECT text, CASE $cases ELSE '${splits.last._1}' END AS split " +
      s"FROM (SELECT text, ${md5Hash60(s"'$salt' || doc_id::VARCHAR")} % $buckets AS h FROM surv)) " +
      "SELECT split, count(*) AS n, CAST(sum(length(text)) AS BIGINT) AS chars FROM assigned GROUP BY split"
  }

  /** Multimodal feature extraction over the documents-as-media wrapper:
    * byte size (strlen = UTF-8 bytes, matching the binary payload) and the
    * 60-bit MD5 content digest of the same payload bytes.
    */
  val multimodal: String =
    "SELECT doc_id AS media_id, 'image' AS modality, strlen(text)::BIGINT AS byte_size, " +
      s"${md5Hash60("text")} AS content_digest FROM documents"

  /** The `embeddings` corpus augmented with perturbed near-dup copies:
    * copy i gets vec_id + idOffset and v'[j] = v[j] + eps * v[(j+1) mod
    * dim] (cosine ≈ 1 − eps²/2 to its source). The fixture's organic max
    * pair cosine is ~0.51, so augmentation is what puts genuine pairs into
    * the near-dup regime a high-threshold dedup query grades. Arithmetic
    * is plain double ops in both engines — bit-identical.
    */
  def augmentedEmbeddingsCte(idOffset: Long, eps: Double, dim: Int): String =
    "aug AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings " +
      s"UNION ALL SELECT vec_id + $idOffset, " +
      s"list_transform(range($dim), i -> embedding[i + 1]::DOUBLE + $eps * " +
      s"embedding[(i + 1) % $dim + 1]::DOUBLE) FROM embeddings)"

  /** Genuine brute-force cosine pairs ≥ threshold over the augmented
    * corpus — does NOT replay the LSH, so it checks the pruning path's
    * recall, not just its determinism.
    */
  def embeddingTightPairs(threshold: Double, idOffset: Long = 100000L,
      eps: Double = 0.02, dim: Int = 64): String =
    s"WITH ${augmentedEmbeddingsCte(idOffset, eps, dim)} " +
      "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
      "round(list_cosine_similarity(a.v, b.v), 6) AS cosine " +
      "FROM aug a JOIN aug b ON a.vec_id < b.vec_id " +
      s"WHERE list_cosine_similarity(a.v, b.v) >= $threshold"

  /** Genuine brute-force ANN top-k over the augmented corpus with the
    * perturbed copies as queries — no LSH replay, so it grades the
    * pruning-regime lshTopK's RECALL: each perturbed query's true nearest
    * neighbor is its source vector (cosine ≈ 1 − eps²/2, far above the
    * fixture's organic 0.51 ceiling), and the fine-bucket LSH must
    * surface exactly it. k stays 1 because ranks ≥ 2 are organic
    * non-near vectors a pruning parameterization rightly never admits.
    */
  def simLshTightTopK(k: Int = 1, idOffset: Long = 100000L,
      eps: Double = 0.02, dim: Int = 64, nQueries: Int = 20): String =
    s"WITH ${augmentedEmbeddingsCte(idOffset, eps, dim)} " +
      "SELECT query_id, corpus_id, round(cos, 6) AS cosine, CAST(rnk AS BIGINT) AS rnk FROM (" +
      "SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, " +
      "list_cosine_similarity(c.v, q.v) AS cos, " +
      "row_number() OVER (PARTITION BY q.vec_id " +
      "ORDER BY list_cosine_similarity(c.v, q.v) DESC, c.vec_id ASC) AS rnk " +
      s"FROM aug c, (SELECT vec_id, v FROM aug WHERE vec_id >= $idOffset AND vec_id < $idOffset + $nQueries) q " +
      "WHERE c.vec_id <> q.vec_id) " +
      s"WHERE rnk <= $k"

  // ── sign-LSH replication ──────────────────────────────────────────────

  /** VALUES rows (tbl, bit, plane) embedding the driver-side hyperplane
    * constants for tables l ∈ [0, tables) seeded 42+l — the exact planes
    * V.signLshBucket uses.
    */
  private def planesValues(bits: Int, tables: Int, dim: Int): String =
    (0 until tables).flatMap { l =>
      V.hyperplanes(bits, dim, seed = 42L + l).zipWithIndex.map { case (p, i) =>
        s"($l, $i, [${p.mkString(", ")}]::DOUBLE[])"
      }
    }.mkString(", ")

  /** CTEs: `planes` (the embedded hyperplanes) and `cb` (every vector's
    * bucket id per table — sign bits of the plane dot products, packed).
    */
  private def bucketsCte(bits: Int, tables: Int, dim: Int): String =
    s"planes(tbl, bit, p) AS (VALUES ${planesValues(bits, tables, dim)}), " +
      "cb AS (SELECT e.vec_id AS id, pl.tbl AS tbl, " +
      "sum(CASE WHEN list_inner_product(e.embedding::DOUBLE[], pl.p) >= 0 " +
      "THEN (1::BIGINT << pl.bit) ELSE 0::BIGINT END)::BIGINT AS bkt " +
      "FROM embeddings e, planes pl GROUP BY e.vec_id, pl.tbl)"

  /** Replicated multi-table sign-LSH near-dup pairs: bucket-collision
    * candidates → exact cosine ≥ threshold (Dedup.embeddingCosinePairs
    * with lshBits > 0, step for step).
    */
  def embeddingLshPairs(threshold: Double, bits: Int, tables: Int,
      dim: Int = 64): String =
    s"WITH ${bucketsCte(bits, tables, dim)}, " +
      "cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM cb a JOIN cb b " +
      "ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.id < b.id) " +
      "SELECT id_a, id_b, round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) AS cosine " +
      "FROM cand JOIN embeddings ea ON id_a = ea.vec_id JOIN embeddings eb ON id_b = eb.vec_id " +
      s"WHERE list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) >= $threshold"

  /** Replicated multi-table sign-LSH ANN top-k (Similarity.lshTopK):
    * queries are corpus vectors with vec_id < maxQueryId.
    */
  def simLshTopK(k: Int, bits: Int, tables: Int, dim: Int = 64,
      maxQueryId: Long = 5L): String =
    s"WITH ${bucketsCte(bits, tables, dim)}, " +
      "cand AS (SELECT DISTINCT q.id AS query_id, c.id AS corpus_id FROM cb c JOIN cb q " +
      s"ON c.tbl = q.tbl AND c.bkt = q.bkt WHERE q.id < $maxQueryId AND c.id <> q.id) " +
      "SELECT query_id, corpus_id, round(cos, 6) AS cosine, CAST(rnk AS BIGINT) AS rnk FROM (" +
      "SELECT cand.query_id, cand.corpus_id, " +
      "list_cosine_similarity(ec.embedding::DOUBLE[], eq.embedding::DOUBLE[]) AS cos, " +
      "row_number() OVER (PARTITION BY cand.query_id " +
      "ORDER BY list_cosine_similarity(ec.embedding::DOUBLE[], eq.embedding::DOUBLE[]) DESC, cand.corpus_id ASC) AS rnk " +
      "FROM cand JOIN embeddings ec ON cand.corpus_id = ec.vec_id " +
      "JOIN embeddings eq ON cand.query_id = eq.vec_id) " +
      s"WHERE rnk <= $k"

  /** Replicated IVF top-k (Similarity.ivfTopK): first-nlist-ids seed
    * centroids refined by `refineIterations` Lloyd steps (per-list
    * element-wise mean, summed as DECIMAL(38,18) so the reduction is
    * exact and order-independent in both engines — a double sum would
    * vary with Spark's partial-aggregation order), nearest-centroid
    * assignment (squared-distance ordering ≡ the Spark side's sqrt
    * ordering — monotonic), nprobe probed lists, exact cosine re-rank.
    */
  /** The seed-and-Lloyd-refine centroid CTE chain over a CTE `c(vec_id,
    * v)` — shared by [[simIvfTopK]] and [[semanticSurvivors]] so the two
    * replications can never drift. Returns (chain, finalCteName).
    */
  private def centroidChain(nlist: Int, refineIterations: Int, dim: Int): (String, String) =
    centroidChainExpr(nlist.toString, refineIterations, dim)

  /** [[centroidChain]] with nlist as an arbitrary SQL scalar expression —
    * lets an oracle derive nlist from the corpus itself (the adaptive
    * nlist ∝ N rule of Similarity.autoNlist), which a LIMIT literal
    * can't express; the seed cut becomes a row_number filter instead.
    */
  private def centroidChainExpr(nlistExpr: String, refineIterations: Int,
      dim: Int): (String, String) =
    (0 until refineIterations)
      .foldLeft(("cent0 AS (SELECT vec_id AS cent_id, v AS centv FROM (" +
        "SELECT vec_id, v, row_number() OVER (ORDER BY vec_id) AS seed_rn FROM c) " +
        s"WHERE seed_rn <= ($nlistExpr))") -> "cent0") {
        case ((cte, prev), it) =>
          val a = s"asg_r$it"; val nxt = s"cent${it + 1}"
          (cte +
            s", $a AS (SELECT vec_id, v, cent_id AS list_id FROM (" +
            s"SELECT c.vec_id, c.v, $prev.cent_id, row_number() OVER (PARTITION BY c.vec_id " +
            s"ORDER BY list_distance(c.v, $prev.centv) ASC, $prev.cent_id ASC) AS rn FROM c, $prev) WHERE rn = 1)" +
            s", $nxt AS (SELECT list_id AS cent_id, list(m ORDER BY i) AS centv FROM (" +
            s"SELECT list_id, i, CAST(sum(CAST(v[i + 1] AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS m " +
            s"FROM $a, range($dim) r(i) GROUP BY list_id, i) GROUP BY list_id)", nxt)
      }

  /** Replicated SemDeDup survivors (Dedup.semanticSurvivors) over the
    * augmented corpus: same Lloyd centroids, same nearest-centroid
    * assignment, same within-cluster dominated-by-lower-id drop rule.
    */
  def semanticSurvivors(threshold: Double, nlist: Int, refineIterations: Int = 1,
      idOffset: Long = 100000L, eps: Double = 0.02, dim: Int = 64): String = {
    val (centChain, cent) = centroidChain(nlist, refineIterations, dim)
    s"WITH ${augmentedEmbeddingsCte(idOffset, eps, dim)}, " +
      "c AS (SELECT vec_id, v FROM aug), " +
      s"$centChain, cent AS (SELECT cent_id, centv FROM $cent), " +
      "asg AS (SELECT vec_id, v, cent_id AS list_id FROM (" +
      "SELECT c.vec_id, c.v, cent.cent_id, row_number() OVER (PARTITION BY c.vec_id " +
      "ORDER BY list_distance(c.v, cent.centv) ASC, cent.cent_id ASC) AS rn FROM c, cent) WHERE rn = 1), " +
      "drp AS (SELECT DISTINCT b.vec_id AS d FROM asg a JOIN asg b " +
      "ON a.list_id = b.list_id AND a.vec_id < b.vec_id " +
      s"WHERE list_cosine_similarity(a.v, b.v) >= $threshold) " +
      "SELECT vec_id FROM c WHERE NOT EXISTS (SELECT 1 FROM drp WHERE d = vec_id)"
  }

  def simIvfTopK(k: Int, nlist: Int, nprobe: Int, maxQueryId: Long = 5L,
      refineIterations: Int = 1, dim: Int = 64): String = {
    val (centChain, cent) = centroidChain(nlist, refineIterations, dim)
    "WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      s"$centChain, cent AS (SELECT cent_id, centv FROM $cent), " +
      "asg AS (SELECT vec_id, v, cent_id AS list_id FROM (" +
      "SELECT c.vec_id, c.v, cent.cent_id, row_number() OVER (PARTITION BY c.vec_id " +
      "ORDER BY list_distance(c.v, cent.centv) ASC, cent.cent_id ASC) AS rn FROM c, cent) WHERE rn = 1), " +
      s"q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < $maxQueryId), " +
      "ql AS (SELECT query_id, qv, cent_id AS list_id FROM (" +
      "SELECT q.query_id, q.qv, cent.cent_id, row_number() OVER (PARTITION BY q.query_id " +
      s"ORDER BY list_distance(q.qv, cent.centv) ASC, cent.cent_id ASC) AS rn FROM q, cent) WHERE rn <= $nprobe) " +
      "SELECT query_id, corpus_id, round(cos, 6) AS cosine, CAST(rnk AS BIGINT) AS rnk FROM (" +
      "SELECT ql.query_id, a.vec_id AS corpus_id, list_cosine_similarity(a.v, ql.qv) AS cos, " +
      "row_number() OVER (PARTITION BY ql.query_id " +
      "ORDER BY list_cosine_similarity(a.v, ql.qv) DESC, a.vec_id ASC) AS rnk " +
      "FROM asg a JOIN ql ON a.list_id = ql.list_id WHERE a.vec_id <> ql.query_id) " +
      s"WHERE rnk <= $k"
  }

  /** Winnowing fingerprints over `documents` — identical math to
    * Corpus.winnowFingerprints: 60-bit md5 k-gram hashes, struct-min
    * (hash, pos) per full sliding window, global min for short docs.
    */
  private def winnowCte(k: Int, windowSize: Int): String = {
    val gram = (1 to k).map(j => s"t[ii + $j]").mkString(" || ' ' || ")
    s"tok AS (SELECT doc_id, $tokensExpr AS t FROM documents), " +
      s"g0 AS (SELECT doc_id, len(t) - $k + 1 AS m, " +
      s"list_transform(range(len(t) - ${k - 1}), ii -> ${md5Hash60(gram)}) AS ghs " +
      s"FROM tok WHERE len(t) >= $k), " +
      "g AS (SELECT doc_id, m, generate_subscripts(ghs, 1) - 1 AS pos, " +
      "unnest(ghs) AS gh FROM g0), " +
      "sel AS (SELECT doc_id, m, pos, min(struct_pack(gh := gh, pos := pos)) " +
      "OVER (PARTITION BY doc_id ORDER BY pos " +
      s"ROWS BETWEEN CURRENT ROW AND ${windowSize - 1} FOLLOWING) AS s FROM g), " +
      "fp AS (SELECT DISTINCT doc_id, s.gh AS fp_hash, CAST(s.pos AS BIGINT) AS fp_pos " +
      s"FROM sel WHERE pos <= greatest(m - $windowSize, 0))"
  }

  def winnow(k: Int, windowSize: Int): String =
    s"WITH ${winnowCte(k, windowSize)} SELECT doc_id, fp_hash, fp_pos FROM fp"

  /** Incremental winnow pairs through the persisted index: the batch is
    * the doc_id < maxBatchId slice re-labeled +idOffset with UNCHANGED
    * text, so its fingerprints equal the corpus rows' — the oracle
    * fingerprints once and relabels, while the Spark side genuinely
    * re-fingerprints the batch and joins the parquet index.
    */
  /** Wrap a (doc, fp_hash) posting CTE body in the maxDocFreq cap —
    * the SQL twin of Corpus.capPostings, shared by both winnow pair
    * oracles so the cap semantics cannot drift between them.
    */
  private def cappedFpCte(outName: String, bodySql: String,
      maxDocFreq: Long): String =
    if (maxDocFreq <= 0L) s"$outName AS ($bodySql)"
    else s"${outName}0 AS ($bodySql), " +
      s"keep AS (SELECT fp_hash FROM ${outName}0 GROUP BY 1 " +
      s"HAVING count(*) <= $maxDocFreq), " +
      s"$outName AS (SELECT ${outName}0.* FROM ${outName}0 JOIN keep USING (fp_hash))"

  def winnowIncremental(k: Int, windowSize: Int, minShared: Long,
      maxBatchId: Long, idOffset: Long, maxDocFreq: Long = 0L): String =
    s"WITH ${winnowCte(k, windowSize)}, " +
      s"bfp AS (SELECT DISTINCT doc_id + $idOffset AS batch_id, fp_hash " +
      s"FROM fp WHERE doc_id < $maxBatchId), " +
      cappedFpCte("cfp",
        "SELECT DISTINCT doc_id AS corpus_id, fp_hash FROM fp", maxDocFreq) + " " +
      "SELECT batch_id, corpus_id, CAST(count(*) AS BIGINT) AS shared_fps " +
      "FROM bfp JOIN cfp USING (fp_hash) GROUP BY 1, 2 " +
      s"HAVING count(*) >= $minShared"

  /** Winnow-fingerprint copy pairs — docs sharing ≥ minShared distinct
    * selected hashes (Corpus.winnowPairs verbatim, including its
    * maxDocFreq posting cap).
    */
  def winnowPairs(k: Int, windowSize: Int, minShared: Long,
      maxDocFreq: Long = 0L): String =
    s"WITH ${winnowCte(k, windowSize)}, " +
      cappedFpCte("fh", "SELECT DISTINCT doc_id, fp_hash FROM fp", maxDocFreq) + " " +
      "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
      "CAST(count(*) AS BIGINT) AS shared_fps " +
      "FROM fh a JOIN fh b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id " +
      s"GROUP BY 1, 2 HAVING count(*) >= $minShared"

  /** Per-document novelty of the sub-corpus `WHERE batchWhere` against
    * the reference `WHERE NOT batchWhere` — identical math to
    * Corpus.noveltyScore (distinct-shingle anti-membership fraction).
    */
  def novelty(n: Int, batchWhere: String): String = {
    val shingleCat = (1 to n).map(j => s"t[ii + $j]").mkString(" || ' ' || ")
    s"WITH toks AS (SELECT doc_id, source, $tokensExpr AS t FROM documents), " +
      s"sh AS (SELECT doc_id, source, CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')] " +
      s"ELSE list_distinct(list_transform(range(len(t) - ${n - 1}), ii -> $shingleCat)) END AS s FROM toks), " +
      "ex AS (SELECT doc_id, source, unnest(s) AS g FROM sh), " +
      s"ref AS (SELECT DISTINCT g FROM ex WHERE NOT ($batchWhere)) " +
      "SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_shingles, " +
      "CAST(sum(CASE WHEN ref.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS novel_shingles, " +
      "round(sum(CASE WHEN ref.g IS NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS novelty " +
      s"FROM ex e LEFT JOIN ref ON e.g = ref.g WHERE $batchWhere GROUP BY 1"
  }

  /** Leave-one-out kNN classification over `embeddings` — brute-force
    * cosine top-k per query (corpus-id tie-break, as every similarity
    * oracle here), majority label with votes-desc / label-asc pick.
    * Identical math to Classify.knnClassify over bruteForceTopK.
    */
  def knnClassify(k: Int): String =
    "WITH topk AS (SELECT q.vec_id AS query_id, c.vec_id AS corpus_id, c.label, " +
      "row_number() OVER (PARTITION BY q.vec_id " +
      "ORDER BY list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC, c.vec_id) AS rnk " +
      s"FROM embeddings c, embeddings q WHERE c.vec_id <> q.vec_id QUALIFY rnk <= $k), " +
      "votes AS (SELECT query_id, label, count(*) AS votes FROM topk GROUP BY 1, 2) " +
      "SELECT query_id, label AS pred, CAST(votes AS BIGINT) AS votes FROM (" +
      "SELECT query_id, label, votes, row_number() OVER (PARTITION BY query_id " +
      "ORDER BY votes DESC, label ASC) AS rn FROM votes) WHERE rn = 1"

  /** Exact shingle-set Jaccard between every pair of document groups —
    * identical math to Corpus.groupOverlap: per-doc n-word shingles
    * (whole text when shorter than n), distinct per group, inverted-index
    * intersection counts.
    */
  def groupOverlap(groupCol: String, n: Int): String = {
    val shingleCat = (1 to n).map(k => s"t[ii + $k]").mkString(" || ' ' || ")
    s"WITH toks AS (SELECT $groupCol AS grp, doc_id, $tokensExpr AS t FROM documents), " +
      s"sh AS (SELECT grp, doc_id, CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')] " +
      s"ELSE list_distinct(list_transform(range(len(t) - ${n - 1}), ii -> $shingleCat)) END AS s FROM toks), " +
      "ex AS (SELECT DISTINCT grp, g FROM (SELECT grp, unnest(s) AS g FROM sh)), " +
      "sizes AS (SELECT grp, count(*) AS n FROM ex GROUP BY 1), " +
      "inter AS (SELECT a.grp AS ga, b.grp AS gb, count(*) AS i " +
      "FROM ex a JOIN ex b ON a.g = b.g AND a.grp < b.grp GROUP BY 1, 2) " +
      "SELECT ga AS group_a, gb AS group_b, CAST(i AS BIGINT) AS common, " +
      "CAST(sa.n AS BIGINT) AS na, CAST(sb.n AS BIGINT) AS nb, " +
      "round(i::DOUBLE / (sa.n + sb.n - i), 6) AS jaccard " +
      "FROM inter JOIN sizes sa ON ga = sa.grp JOIN sizes sb ON gb = sb.grp"
  }

  /** Fixed-iteration PageRank over the exact n-gram-Jaccard similarity
    * graph — pair generation is [[jaccardPairs]] verbatim (a different
    * candidate algorithm than the Spark side's inverted index is NOT
    * needed here: both sides are exact), then `iterations` unrolled
    * rounds of prᵏ⁺¹ = (1−d)/N + d·Σ prᵏ(u)/deg(u), identical math to
    * GraphOps.pageRank, rounded to 6 dp at the end only.
    */
  /** PageRank over an arbitrary pair query producing (id_a, id_b) —
    * pairs are symmetrized with multi-edges preserved, exactly
    * GraphOps.pageRank's edge handling.
    */
  def pageRankOver(pairsSql: String, iterations: Int,
      damping: Double): String = {
    val rounds = (1 to iterations).map { k =>
      val prev = s"p${k - 1}"
      s"c$k AS (SELECT ed.d AS id, sum($prev.pr * ed.w) AS c " +
        s"FROM ed JOIN $prev ON ed.s = $prev.id GROUP BY 1), " +
        s"p$k AS (SELECT $prev.id, (1.0 - $damping) / nn.n + $damping * coalesce(c$k.c, 0.0) AS pr " +
        s"FROM $prev LEFT JOIN c$k USING (id), nn)"
    }.mkString(", ")
    // pairs/e0/ed are each referenced by several downstream CTEs and the
    // unrolled rounds; DuckDB 1.0 INLINES non-materialized CTEs per
    // reference, so an expensive pairs query (the brute kNN cross join)
    // re-executes once per mention — dozens of interleaved copies spilled
    // >80 GB temp at sf0.1. MATERIALIZED pins each to its (tiny) result.
    s"WITH pairs AS MATERIALIZED ($pairsSql), " +
      "e0 AS MATERIALIZED (SELECT id_a AS s, id_b AS d FROM pairs " +
      "UNION ALL SELECT id_b, id_a FROM pairs), " +
      "deg AS MATERIALIZED (SELECT s, count(*)::DOUBLE AS deg FROM e0 GROUP BY 1), " +
      "ed AS MATERIALIZED (SELECT e0.s, e0.d, 1.0 / deg.deg AS w FROM e0 JOIN deg USING (s)), " +
      "nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM deg), " +
      "p0 AS (SELECT s AS id, 1.0 / nn.n AS pr FROM deg, nn), " +
      s"$rounds " +
      s"SELECT id, round(pr, 6) AS pagerank FROM p$iterations"
  }

  def pageRank(n: Int, threshold: Double, iterations: Int,
      damping: Double): String =
    pageRankOver(jaccardPairs(n, threshold), iterations, damping)

  /** PageRank over the directed brute-force kNN edge list of
    * `embeddings` — the kNN-graph centrality signal (well-connected =
    * in-distribution; peripheral = outlier).
    */
  def knnPageRank(k: Int, iterations: Int, damping: Double): String =
    pageRankOver(
      // similarity is computed in the inner projection so the window's
      // sort input is three narrow columns — computing it inside the
      // window ORDER BY drags both 64-dim DOUBLE[] arrays into every
      // buffered row of the N² sort
      "SELECT id_a, id_b FROM (SELECT id_a, id_b, " +
        "row_number() OVER (PARTITION BY id_a ORDER BY sim DESC, id_b) AS rn " +
        "FROM (SELECT q.vec_id AS id_a, c.vec_id AS id_b, " +
        "list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS sim " +
        s"FROM embeddings c, embeddings q WHERE c.vec_id <> q.vec_id) s) z WHERE rn <= $k",
      iterations, damping)

  /** PageRank over the IVF-probed kNN edge list
    * (Similarity.ivfKnnEdges → GraphOps.pageRank): the [[simIvfTopK]]
    * centroid/assignment/probe replication with the WHOLE corpus as the
    * query set, edge top-k per query, then the same unrolled PR rounds.
    */
  def ivfKnnPageRank(k: Int, nprobe: Int, iterations: Int,
      damping: Double, refineIterations: Int = 1, dim: Int = 64,
      targetListSize: Int = 32, minNlist: Int = 16): String = {
    // Similarity.autoNlist in SQL: max(minNlist, ceil(N / targetListSize))
    val nlistExpr = s"greatest($minNlist, CAST(ceil(" +
      s"(SELECT count(*) FROM c) / $targetListSize.0) AS BIGINT))"
    val (centChain, cent) = centroidChainExpr(nlistExpr, refineIterations, dim)
    val pairs =
      "WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        s"$centChain, cent AS (SELECT cent_id, centv FROM $cent), " +
        "asg AS (SELECT vec_id, v, cent_id AS list_id FROM (" +
        "SELECT c.vec_id, c.v, cent.cent_id, row_number() OVER (PARTITION BY c.vec_id " +
        "ORDER BY list_distance(c.v, cent.centv) ASC, cent.cent_id ASC) AS rn FROM c, cent) WHERE rn = 1), " +
        "ql AS (SELECT query_id, qv, cent_id AS list_id FROM (" +
        "SELECT c.vec_id AS query_id, c.v AS qv, cent.cent_id, row_number() OVER (PARTITION BY c.vec_id " +
        s"ORDER BY list_distance(c.v, cent.centv) ASC, cent.cent_id ASC) AS rn FROM c, cent) WHERE rn <= $nprobe) " +
        "SELECT query_id AS id_a, corpus_id AS id_b FROM (" +
        "SELECT ql.query_id, a.vec_id AS corpus_id, " +
        "row_number() OVER (PARTITION BY ql.query_id " +
        "ORDER BY list_cosine_similarity(a.v, ql.qv) DESC, a.vec_id ASC) AS rnk " +
        "FROM asg a JOIN ql ON a.list_id = ql.list_id WHERE a.vec_id <> ql.query_id) " +
        s"WHERE rnk <= $k"
    pageRankOver(pairs, iterations, damping)
  }

  /** Multinomial Naive Bayes resubstitution prediction over `documents`
    * (train = predict corpus, label = lang) — identical math to
    * Classify.nbScores/nbPredict: add-1 smoothing over the training
    * vocabulary, evidence as Σ n·ln(cnt+1) over EXISTING (token, class)
    * pairs (missing pairs are ln(1) = 0) minus len·ln(tok_c + V), argmax
    * on the 6-dp-rounded score with class-ascending tie-break.
    */
  def nbPredict: String =
    s"WITH tok AS (SELECT doc_id, lang, t.token FROM documents, " +
      s"unnest($tokensExpr) AS t(token) WHERE len(t.token) > 0), " +
      "pri AS (SELECT lang AS cls, ln(count(*)::DOUBLE / " +
      "(SELECT count(*)::DOUBLE FROM documents)) AS prior FROM documents GROUP BY 1), " +
      "tc AS (SELECT lang AS cls, token, count(*)::DOUBLE AS tc FROM tok GROUP BY 1, 2), " +
      "vv AS (SELECT count(DISTINCT token)::DOUBLE AS v FROM tc), " +
      "zt AS (SELECT cls, ln(sum(tc) + (SELECT v FROM vv)) AS lnz FROM tc GROUP BY 1), " +
      "dt AS (SELECT doc_id, token, count(*)::DOUBLE AS n FROM tok GROUP BY 1, 2), " +
      "dl AS (SELECT doc_id, sum(n) AS len FROM dt GROUP BY 1), " +
      "ev AS (SELECT dt.doc_id, tc.cls, sum(dt.n * ln(tc.tc + 1.0)) AS s1 " +
      "FROM dt JOIN tc USING (token) GROUP BY 1, 2), " +
      "sc AS (SELECT dl.doc_id, p.cls, p.prior + coalesce(ev.s1, 0.0) - dl.len * zt.lnz AS score " +
      "FROM dl CROSS JOIN pri p JOIN zt ON zt.cls = p.cls " +
      "LEFT JOIN ev ON ev.doc_id = dl.doc_id AND ev.cls = p.cls) " +
      "SELECT doc_id, cls AS pred, round(score, 6) AS nb_score FROM (" +
      "SELECT doc_id, cls, score, row_number() OVER (PARTITION BY doc_id " +
      "ORDER BY round(score, 6) DESC, cls ASC) AS rn FROM sc) WHERE rn = 1"

  /** DSIR hashed-unigram importance log-weights of every document against
    * the target slice `WHERE targetWhere` — identical estimator to
    * Classify.importanceWeights (same md5-60-bit token bucket, add-1
    * smoothed bucket distributions, per-doc Σ λ). The raw-side counts are
    * bucket-complete for every document token, so the Spark full-outer
    * merge reduces to this LEFT JOIN.
    */
  def dsirWeightsCte(buckets: Int, targetWhere: String): String =
    s"tok AS (SELECT doc_id, source, t.token FROM documents, " +
      s"unnest($tokensExpr) AS t(token) WHERE len(t.token) > 0), " +
      s"tb AS (SELECT doc_id, source, ${md5Hash60("token")} % $buckets AS b FROM tok), " +
      "rawc AS (SELECT b, count(*)::DOUBLE AS c FROM tb GROUP BY 1), " +
      s"tgtc AS (SELECT b, count(*)::DOUBLE AS ct FROM tb WHERE $targetWhere GROUP BY 1), " +
      "tot AS (SELECT (SELECT count(*)::DOUBLE FROM tb) AS tr, " +
      s"(SELECT count(*)::DOUBLE FROM tb WHERE $targetWhere) AS tt), " +
      s"lam AS (SELECT rawc.b, ln((coalesce(tgtc.ct, 0.0) + 1.0) / (tot.tt + $buckets.0)) - " +
      s"ln((rawc.c + 1.0) / (tot.tr + $buckets.0)) AS lam " +
      "FROM rawc LEFT JOIN tgtc USING (b), tot), " +
      "w AS (SELECT doc_id, round(sum(lam), 6) AS logw, " +
      "CAST(count(*) AS BIGINT) AS n_tokens FROM tb JOIN lam USING (b) GROUP BY 1)"

  def dsirWeights(buckets: Int, targetWhere: String): String =
    s"WITH ${dsirWeightsCte(buckets, targetWhere)} " +
      "SELECT doc_id, logw, n_tokens FROM w"

  /** Top-k DSIR selection: rank on the already-6-dp-rounded weight,
    * doc-id-ascending tie-break — the two-phase Spark ranking is exact,
    * so a plain global window is its oracle.
    */
  def dsirSelect(k: Int, buckets: Int, targetWhere: String): String =
    s"WITH ${dsirWeightsCte(buckets, targetWhere)} " +
      "SELECT doc_id, logw, n_tokens, CAST(rnk AS BIGINT) AS rnk FROM (" +
      "SELECT doc_id, logw, n_tokens, row_number() OVER (" +
      "ORDER BY logw DESC, doc_id ASC) AS rnk FROM w) " +
      s"WHERE rnk <= $k"

  /** Replicated C4 paragraph dedup (Corpus.dedupParagraphs) over the
    * planted three-line structure the graded query builds: keep each
    * distinct line only at its globally first (doc_id, pos) occurrence,
    * reassemble per doc, empty string for fully-deduped docs.
    */
  def dedupParagraphs: String =
    "WITH d2 AS (SELECT doc_id, text || chr(10) || 'shared boilerplate paragraph' " +
      "|| chr(10) || 'from ' || source AS text FROM documents), " +
      "t AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d2), " +
      "ln AS (SELECT doc_id, CAST(unnest(range(len(ls))) AS BIGINT) AS pos, " +
      "unnest(ls) AS line FROM t), " +
      "keep AS (SELECT doc_id, pos, line FROM ln " +
      "QUALIFY row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) = 1), " +
      "sa AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text " +
      "FROM keep GROUP BY 1) " +
      "SELECT d.doc_id, coalesce(sa.text, '') AS text " +
      "FROM documents d LEFT JOIN sa ON d.doc_id = sa.doc_id"

  /** Replicated Efraimidis–Spirakis weighted sample
    * (Corpus.weightedSample): same md5-60-bit uniform, same
    * 6-dp-rounded -ln(u)/w key, same (key, id) order and top-k.
    */
  def weightedSample(k: Int, weightCol: String,
      salt: String = "graft-wsample"): String =
    s"WITH keyed AS (SELECT doc_id, $weightCol, " +
      s"round(-ln((${md5Hash60(s"'$salt:' || doc_id::VARCHAR")} + 1.0) / " +
      s"1152921504606846976.0) / $weightCol, 6) AS sample_key " +
      s"FROM documents WHERE $weightCol > 0) " +
      "SELECT doc_id, " + weightCol + ", sample_key, CAST(rn AS BIGINT) AS sample_rank " +
      "FROM (SELECT doc_id, " + weightCol + ", sample_key, row_number() OVER (" +
      "ORDER BY sample_key ASC, doc_id ASC) AS rn FROM keyed) " +
      s"WHERE rn <= $k"

  /** Replicated negative-sampling table (Corpus.negativeSampling): term
    * counts on the shared tokenizer, freq^power weights, the same
    * Efraimidis–Spirakis md5 keys as [[weightedSample]].
    */
  def negativeSampling(k: Int, power: Double = 0.75,
      salt: String = "graft-negsample"): String =
    s"WITH t AS (SELECT unnest($tokensExpr) AS term FROM documents), " +
      "c AS (SELECT term, CAST(count(*) AS BIGINT) AS f FROM t WHERE term <> '' GROUP BY 1), " +
      "keyed AS (SELECT term, " +
      s"round(-ln((${md5Hash60(s"'$salt:' || term")} + 1.0) / " +
      s"1152921504606846976.0) / pow(f, $power), 6) AS sample_key FROM c) " +
      "SELECT term, sample_key, CAST(rn AS BIGINT) AS sample_rank FROM (" +
      "SELECT term, sample_key, row_number() OVER (" +
      "ORDER BY sample_key ASC, term ASC) AS rn FROM keyed) " +
      s"WHERE rn <= $k"

  /** Replicated temperature mixture (Corpus.temperatureMixture): per-
    * source counts, α-scaled share, floor'd per-source budget.
    */
  def temperatureMixture(alpha: Double, budget: Long): String =
    "WITH cstat AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs " +
      "FROM documents GROUP BY 1), " +
      s"w AS (SELECT source, n_docs, pow(n_docs, $alpha) AS gw FROM cstat), " +
      "t AS (SELECT sum(gw) AS tot FROM w), " +
      "s AS (SELECT source, n_docs, round(gw / tot, 6) AS share FROM w, t), " +
      s"b AS (SELECT source, n_docs, share, CAST(floor($budget.0 * share) AS BIGINT) AS b0 FROM s), " +
      s"e AS (SELECT greatest(sum(b0) - $budget, 0) AS excess FROM b), " +
      // overshoot spread in (share desc, source asc) order, each share
      // floored at 0, spilling to the next — mirrors the Spark side's
      // cumulative-sum cap so sum(docs_at_budget) <= budget always
      "p AS (SELECT source, n_docs, share, b0, coalesce(sum(b0) OVER (" +
      "ORDER BY share DESC, source ASC ROWS BETWEEN UNBOUNDED PRECEDING " +
      "AND 1 PRECEDING), 0) AS prior FROM b) " +
      "SELECT source, n_docs, share, CAST(b0 - least(b0, " +
      "greatest(excess - prior, 0)) AS BIGINT) AS docs_at_budget FROM p, e"

  /** Replicated Gopher top-n-gram char fraction
    * (Corpus.topNgramFraction): same tokenizer as [[tokensExpr]], NON-
    * distinct shingles (frequencies matter here), (count desc, gram asc)
    * argmax, count × gram chars / normalized chars.
    */
  def topNgramFraction(n: Int): String = {
    val shingleCat = (1 to n).map(k => s"t[ii + $k]").mkString(" || ' ' || ")
    // denominator from the token stream itself (token chars + single
    // separators) — the same formula the native TopShingleRun computes
    s"WITH toks AS (SELECT doc_id, $tokensExpr AS t, " +
      s"length(array_to_string($tokensExpr, ' ')) AS len FROM documents), " +
      s"sh AS (SELECT doc_id, len, CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')] " +
      s"ELSE list_transform(range(len(t) - ${n - 1}), ii -> $shingleCat) END AS s " +
      "FROM toks WHERE len > 0), " +
      "ex AS (SELECT doc_id, len, unnest(s) AS g FROM sh), " +
      "cnt AS (SELECT doc_id, len, g, count(*) AS c FROM ex GROUP BY 1, 2, 3) " +
      "SELECT doc_id, g AS top_gram, CAST(c AS BIGINT) AS gram_count, " +
      "round(CAST(c AS DOUBLE) * length(g) / len, 6) AS char_fraction FROM cnt " +
      "QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) = 1"
  }

  /** Replicated BM25 retrieval (Corpus.bm25Search): same tokenizer,
    * Lucene idf, dl/avgdl normalization, 6-dp-rounded rank keys.
    */
  def bm25Search(terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): String = {
    // mirrors Corpus.bm25Search's typed reject: anything else would break
    // the SQL literal or silently never match the lowercase tokenizer
    require(terms.forall(_.matches("[a-z0-9]+")),
      s"bm25 oracle: terms must be lowercase [a-z0-9]+ tokens")
    val inList = terms.map(t => s"'$t'").mkString(", ")
    s"WITH tok AS (SELECT doc_id, $tokensExpr AS t FROM documents), " +
      "dl AS (SELECT doc_id, CAST(len(list_filter(t, x -> x <> '')) AS BIGINT) AS dl FROM tok), " +
      "st AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl FROM dl), " +
      "tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM (" +
      s"SELECT doc_id, unnest(t) AS w FROM tok) WHERE w IN ($inList) GROUP BY 1, 2), " +
      "dfc AS (SELECT w, CAST(count(*) AS BIGINT) AS dfc FROM tf GROUP BY 1), " +
      "sc AS (SELECT tf.doc_id, sum(ln((st.n - dfc.dfc + 0.5) / (dfc.dfc + 0.5) + 1.0) " +
      s"* tf.tf * ($k1 + 1.0) / (tf.tf + $k1 * (1.0 - $b + $b * dl.dl / st.avgdl))) AS s " +
      "FROM tf JOIN dfc USING (w) JOIN dl USING (doc_id), st GROUP BY 1) " +
      "SELECT doc_id, round(s, 6) AS score, CAST(rn AS INT) AS rank FROM (" +
      "SELECT doc_id, s, row_number() OVER (ORDER BY round(s, 6) DESC, doc_id ASC) AS rn FROM sc) " +
      s"WHERE rn <= $k"
  }

  /** Replicated k-means assignment (Similarity.kmeansAssign): the same
    * centroid chain every IVF oracle replays, assignment rn = 1.
    */
  def kmeansAssign(k: Int, refineIterations: Int = 1,
      dim: Int = 64): String = {
    val (centChain, cent) = centroidChain(k, refineIterations, dim)
    // dense re-index of the seed-id labels, matching kmeansCentroids
    "WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      s"$centChain, cent AS (SELECT CAST(row_number() OVER (ORDER BY cent_id) - 1 AS INT) " +
      s"AS cent_id, centv FROM $cent) " +
      "SELECT vec_id, cent_id AS cluster FROM (" +
      "SELECT c.vec_id, cent.cent_id, row_number() OVER (PARTITION BY c.vec_id " +
      "ORDER BY list_distance(c.v, cent.centv) ASC, cent.cent_id ASC) AS rn " +
      "FROM c, cent) WHERE rn = 1"
  }

  /** Replicated cluster profile (Similarity.clusterProfile): centroid
    * chain + assignment + per-cluster size and mean member-to-centroid
    * cosine.
    */
  def clusterProfile(k: Int, refineIterations: Int = 1,
      dim: Int = 64): String = {
    val (centChain, cent) = centroidChain(k, refineIterations, dim)
    "WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      s"$centChain, cent AS (SELECT CAST(row_number() OVER (ORDER BY cent_id) - 1 AS INT) " +
      s"AS cent_id, centv FROM $cent), " +
      "asg AS (SELECT vec_id, v, cent_id AS cluster, centv FROM (" +
      "SELECT c.vec_id, c.v, cent.cent_id, cent.centv, row_number() OVER (PARTITION BY c.vec_id " +
      "ORDER BY list_distance(c.v, cent.centv) ASC, cent.cent_id ASC) AS rn " +
      "FROM c, cent) WHERE rn = 1) " +
      "SELECT cluster, CAST(count(*) AS BIGINT) AS n_vecs, " +
      "round(CAST(sum(CAST(list_cosine_similarity(v, centv) AS DECIMAL(38,18))) AS DOUBLE) " +
      "/ count(*), 6) AS avg_cosine FROM asg GROUP BY 1"
  }

  /** Replicated hybrid retrieval (Corpus.bm25Search + bruteForceTopK
    * fused by Similarity.rrfFuse): both hit lists recomputed, then
    * Σ 1/(c + rank) with the rounded-score/id rank.
    */
  def hybridSearch(terms: Seq[String], queryVecId: Long, kEach: Int,
      k: Int, c: Int = 60): String =
    s"WITH b AS (SELECT doc_id, rank AS rn FROM (${bm25Search(terms, kEach)})), " +
      "a AS (SELECT cc.vec_id AS doc_id, row_number() OVER (" +
      "ORDER BY list_cosine_similarity(cc.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC, cc.vec_id ASC) AS rn " +
      s"FROM embeddings cc, (SELECT embedding FROM embeddings WHERE vec_id = $queryVecId) q " +
      s"WHERE cc.vec_id <> $queryVecId QUALIFY rn <= $kEach), " +
      s"u AS (SELECT doc_id, 1.0 / ($c + rn) AS s FROM b " +
      s"UNION ALL SELECT doc_id, 1.0 / ($c + rn) AS s FROM a), " +
      "g AS (SELECT doc_id, sum(s) AS sc, CAST(count(*) AS BIGINT) AS n_lists FROM u GROUP BY 1) " +
      "SELECT doc_id, round(sc, 6) AS rrf_score, n_lists, CAST(rn2 AS INT) AS rank FROM (" +
      "SELECT doc_id, sc, n_lists, row_number() OVER (" +
      "ORDER BY round(sc, 6) DESC, doc_id ASC) AS rn2 FROM g) " +
      s"WHERE rn2 <= $k"

  /** Replicated ordered funnel (EventAnalytics.funnel): step-time
    * recurrence t_i = min ts of step-i events at ts >= t_{i-1} — provably
    * identical to the Spark side's sorted in-row fold (equal timestamps
    * progress in step order under both formulations).
    */
  def funnel(steps: Seq[String]): String = {
    val caseIdx = steps.zipWithIndex
      .map { case (s, i) => s"WHEN '$s' THEN $i" }.mkString(" ")
    val inList = steps.map(s => s"'$s'").mkString(", ")
    val stepCtes = steps.indices.map { i =>
      if (i == 0)
        s"s0 AS (SELECT user_id, min(ts) AS t FROM e WHERE idx = 0 GROUP BY 1)"
      else
        s"s$i AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s${i - 1} " +
          s"USING (user_id) WHERE e.idx = $i AND e.ts >= s${i - 1}.t GROUP BY 1)"
    }.mkString(", ")
    val unions = steps.zipWithIndex.map { case (s, i) =>
      s"SELECT ${i + 1} AS step, '$s' AS step_name, " +
        s"(SELECT count(*) FROM s$i) AS n"
    }.mkString(" UNION ALL ")
    s"WITH e AS (SELECT user_id, ts, CASE event_type $caseIdx END AS idx " +
      s"FROM events WHERE ts IS NOT NULL AND event_type IN ($inList)), $stepCtes, " +
      s"f AS ($unions) " +
      "SELECT CAST(step AS BIGINT) AS step, step_name, " +
      "CAST(n AS BIGINT) AS n_users, round(CAST(n AS DOUBLE) / " +
      "greatest((SELECT count(*) FROM s0), 1), 6) AS conversion FROM f"
  }

  /** Replicated cohort retention (EventAnalytics.cohortRetention):
    * Monday-truncated first-activity cohorts, distinct weekly activity,
    * day-diff // 7 offsets (both engines Monday-align date_trunc('week')).
    */
  def cohortRetention: String =
    "WITH weekly AS (SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS w FROM events), " +
      "fw AS (SELECT user_id, min(w) AS cohort FROM weekly GROUP BY 1), " +
      "rolled AS (SELECT cohort, CAST(date_diff('day', cohort, w) // 7 AS BIGINT) AS week_offset, " +
      "CAST(count(*) AS BIGINT) AS n_users FROM weekly JOIN fw USING (user_id) GROUP BY 1, 2) " +
      "SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week, week_offset, n_users, " +
      "round(CAST(n_users AS DOUBLE) / first(n_users) OVER (" +
      "PARTITION BY cohort ORDER BY week_offset), 6) AS retention FROM rolled"

  /** Replicated hard-negative mining (Similarity.hardNegatives): the
    * [[simIvfTopK]] replication with the corpus as its own query set and
    * the label-mismatch predicate applied before the top-k.
    */
  def hardNegatives(k: Int, nlist: Int, nprobe: Int,
      refineIterations: Int = 1, dim: Int = 64): String = {
    val (centChain, cent) = centroidChain(nlist, refineIterations, dim)
    "WITH c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings), " +
      s"$centChain, cent AS (SELECT cent_id, centv FROM $cent), " +
      "asg AS (SELECT vec_id, label, v, cent_id AS list_id FROM (" +
      "SELECT c.vec_id, c.label, c.v, cent.cent_id, row_number() OVER (PARTITION BY c.vec_id " +
      "ORDER BY list_distance(c.v, cent.centv) ASC, cent.cent_id ASC) AS rn FROM c, cent) WHERE rn = 1), " +
      "ql AS (SELECT query_id, qlabel, qv, cent_id AS list_id FROM (" +
      "SELECT c.vec_id AS query_id, c.label AS qlabel, c.v AS qv, cent.cent_id, " +
      "row_number() OVER (PARTITION BY c.vec_id " +
      s"ORDER BY list_distance(c.v, cent.centv) ASC, cent.cent_id ASC) AS rn FROM c, cent) WHERE rn <= $nprobe) " +
      "SELECT query_id, corpus_id, round(cos, 6) AS cosine, CAST(rnk AS INT) AS rank FROM (" +
      "SELECT ql.query_id, a.vec_id AS corpus_id, list_cosine_similarity(a.v, ql.qv) AS cos, " +
      "row_number() OVER (PARTITION BY ql.query_id " +
      "ORDER BY list_cosine_similarity(a.v, ql.qv) DESC, a.vec_id ASC) AS rnk " +
      "FROM asg a JOIN ql ON a.list_id = ql.list_id " +
      "WHERE a.vec_id <> ql.query_id AND a.label <> ql.qlabel) " +
      s"WHERE rnk <= $k"
  }

  /** Per-label prototype CTE shared by the prototype oracles — decimal
    * sums matching the Spark side's deterministic means.
    */
  private def protoCte(dim: Int): String =
    "c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings), " +
      "p AS (SELECT label, list(m ORDER BY i) AS proto FROM (" +
      "SELECT label, i, CAST(sum(CAST(v[i + 1] AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS m " +
      s"FROM c, range($dim) r(i) GROUP BY label, i) GROUP BY label)"

  /** Replicated class-prototype consistency scores
    * (Similarity.prototypeScores).
    */
  def prototypeScores(dim: Int = 64): String =
    s"WITH ${protoCte(dim)} " +
      "SELECT c.vec_id, c.label, round(list_cosine_similarity(c.v, p.proto), 6) AS proto_cosine " +
      "FROM c JOIN p USING (label)"

  /** Replicated per-label bottom-k prototype outliers
    * (Similarity.prototypeOutliers) — raw-cosine rank, id tie-break.
    */
  def prototypeOutliers(k: Int, dim: Int = 64): String =
    s"WITH ${protoCte(dim)} " +
      "SELECT label, vec_id, round(cos, 6) AS proto_cosine, CAST(rnk AS INT) AS rank FROM (" +
      "SELECT c.label, c.vec_id, list_cosine_similarity(c.v, p.proto) AS cos, " +
      "row_number() OVER (PARTITION BY c.label " +
      "ORDER BY list_cosine_similarity(c.v, p.proto) ASC, c.vec_id ASC) AS rnk " +
      "FROM c JOIN p USING (label)) " +
      s"WHERE rnk <= $k"

  /** Replicated ANN recall@k (Similarity.annRecall): the [[simIvfTopK]]
    * centroid/assignment/probe replication with the whole corpus as the
    * query set, the brute-force exact top-k as ground truth, hits
    * counted on the (query, corpus) edge intersection.
    */
  def annRecall(k: Int, nlist: Int, nprobe: Int,
      refineIterations: Int = 1, dim: Int = 64,
      queryFraction: Double = 1.0, salt: String = "graft-recall"): String = {
    val (centChain, cent) = centroidChain(nlist, refineIterations, dim)
    val qCte =
      if (queryFraction >= 1.0) "q0 AS (SELECT vec_id, v FROM c)"
      else "q0 AS (SELECT vec_id, v FROM c WHERE " +
        s"(('0x' || substr(md5('$salt' || vec_id::VARCHAR), 1, 15))::BIGINT " +
        s"% 1000000) < ${(queryFraction * 1000000L).toLong})"
    "WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      s"$qCte, " +
      s"$centChain, cent AS (SELECT cent_id, centv FROM $cent), " +
      "asg AS (SELECT vec_id, v, cent_id AS list_id FROM (" +
      "SELECT c.vec_id, c.v, cent.cent_id, row_number() OVER (PARTITION BY c.vec_id " +
      "ORDER BY list_distance(c.v, cent.centv) ASC, cent.cent_id ASC) AS rn FROM c, cent) WHERE rn = 1), " +
      "ql AS (SELECT query_id, qv, cent_id AS list_id FROM (" +
      "SELECT q0.vec_id AS query_id, q0.v AS qv, cent.cent_id, row_number() OVER (PARTITION BY q0.vec_id " +
      s"ORDER BY list_distance(q0.v, cent.centv) ASC, cent.cent_id ASC) AS rn FROM q0, cent) WHERE rn <= $nprobe), " +
      "iv AS (SELECT query_id, corpus_id FROM (" +
      "SELECT ql.query_id, a.vec_id AS corpus_id, row_number() OVER (PARTITION BY ql.query_id " +
      "ORDER BY list_cosine_similarity(a.v, ql.qv) DESC, a.vec_id ASC) AS rnk " +
      s"FROM asg a JOIN ql ON a.list_id = ql.list_id WHERE a.vec_id <> ql.query_id) WHERE rnk <= $k), " +
      "ex AS (SELECT query_id, corpus_id FROM (" +
      "SELECT q.vec_id AS query_id, cc.vec_id AS corpus_id, row_number() OVER (PARTITION BY q.vec_id " +
      "ORDER BY list_cosine_similarity(cc.v, q.v) DESC, cc.vec_id ASC) AS rnk " +
      s"FROM c cc, q0 q WHERE cc.vec_id <> q.vec_id) WHERE rnk <= $k) " +
      "SELECT ex.query_id, CAST(count(iv.corpus_id) AS BIGINT) AS hits, " +
      s"round(CAST(count(iv.corpus_id) AS DOUBLE) / $k, 6) AS recall " +
      "FROM ex LEFT JOIN iv ON ex.query_id = iv.query_id AND ex.corpus_id = iv.corpus_id " +
      "GROUP BY 1"
  }

  /** Replicated code-point entropy (plans.NativeOps.charEntropy):
    * DuckDB's string_split(s, '') splits per code point exactly like the
    * kernel's codePointAt walk; `0.0 - sum` avoids the −0.0 a bare
    * negated empty/one-symbol sum would print differently.
    */
  def charEntropy: String =
    "WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents), " +
      "cnt AS (SELECT doc_id, c, count(*)::DOUBLE AS n FROM ch GROUP BY 1, 2), " +
      "tot AS (SELECT doc_id, n, sum(n) OVER (PARTITION BY doc_id) AS t FROM cnt), " +
      "h AS (SELECT doc_id, 0.0 - sum((n / t) * log2(n / t)) AS ent FROM tot GROUP BY 1) " +
      "SELECT d.doc_id, round(coalesce(h.ent, 0.0), 6) AS entropy " +
      "FROM documents d LEFT JOIN h USING (doc_id)"

  /** Replicated per-source vocabulary profile (Corpus.vocabStats): same
    * tokenizer as [[tokensExpr]] with the empty-split token filtered
    * (the kernel emits none), null-safe left join so a tokenless source
    * still reports its doc count.
    */
  def vocabStats: String =
    s"WITH tok AS (SELECT source, unnest(list_filter($tokensExpr, x -> x <> '')) AS w " +
      "FROM documents), " +
      "tf AS (SELECT source, w, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2), " +
      "a AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens, " +
      "CAST(count(*) AS BIGINT) AS n_types, " +
      "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax FROM tf GROUP BY 1), " +
      "d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1) " +
      "SELECT d.source, d.n_docs, coalesce(a.n_tokens, 0) AS n_tokens, " +
      "coalesce(a.n_types, 0) AS n_types, coalesce(a.n_hapax, 0) AS n_hapax, " +
      "round(a.n_types::DOUBLE / a.n_tokens, 6) AS type_token_ratio, " +
      "round(a.n_hapax::DOUBLE / a.n_types, 6) AS hapax_fraction " +
      "FROM d LEFT JOIN a ON d.source IS NOT DISTINCT FROM a.source"

  /** Replicated quality calibration (Corpus.calibrateQuality): percent
    * rank of the rounded quality score within source — ties share ranks
    * (no id tie-break), (rank−1)/(n−1) in both engines.
    */
  def calibrateQuality: String =
    s"WITH sc AS (SELECT doc_id, source, $qualityScoreSql AS quality FROM documents) " +
      "SELECT doc_id, source, quality, round(percent_rank() OVER (" +
      "PARTITION BY source ORDER BY quality), 6) AS calibrated FROM sc"

  /** Replicated Zipf slope (Corpus.zipfSlope): same tokenizer,
    * deterministic (freq desc, term asc) rank, regr_slope of log2(freq)
    * on log2(rank) over the top maxRank terms.
    */
  def zipfSlope(maxRank: Int): String =
    s"WITH tok AS (SELECT source, unnest(list_filter($tokensExpr, x -> x <> '')) AS w " +
      "FROM documents), " +
      "tf AS (SELECT source, w, count(*)::DOUBLE AS c FROM tok GROUP BY 1, 2), " +
      "r AS (SELECT source, c, row_number() OVER (PARTITION BY source " +
      "ORDER BY c DESC, w ASC) AS rk FROM tf) " +
      "SELECT source, CAST(count(*) AS BIGINT) AS n_terms_used, " +
      "round(regr_slope(log2(c), log2(rk)), 6) AS zipf_slope " +
      s"FROM r WHERE rk <= $maxRank GROUP BY 1"

  /** Replicated pairwise JSD (Corpus.sourceDivergence): shared-term sum
    * plus the closed-form single-side mass — identical inner-join
    * algebra, left-assoc addition, 6-dp round.
    */
  def sourceDivergence: String =
    s"WITH tok AS (SELECT source, unnest(list_filter($tokensExpr, x -> x <> '')) AS w " +
      "FROM documents), " +
      "tf AS (SELECT source, w, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2), " +
      "p AS (SELECT source, w, c::DOUBLE / sum(c) OVER (PARTITION BY source) AS p FROM tf), " +
      "j AS (SELECT a.source AS source_a, b.source AS source_b, a.p AS pa, b.p AS pb " +
      "FROM p a JOIN p b ON a.w = b.w AND a.source < b.source) " +
      "SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_shared_terms, " +
      "round((sum(pa * log2(2 * pa / (pa + pb)) + pb * log2(2 * pb / (pa + pb))) " +
      "+ (1.0 - sum(pa)) + (1.0 - sum(pb))) * 0.5, 6) AS jsd " +
      "FROM j GROUP BY 1, 2"

  /** Replicated JL sign projection (Features.randomProjection): the ±1
    * matrix derives from the same engine-portable 60-bit md5 of "i_j",
    * the dot product is DuckDB's sequential list_dot_product (the same
    * ascending-i accumulation as the mat_vec kernel), one rounded column
    * per output dimension.
    */
  def randomProjection(outDim: Int, dim: Int): String = {
    val cols = (0 until outDim).map(j =>
      s"round(max(CASE WHEN j = $j THEN pr END), 6) AS p${j + 1}").mkString(", ")
    s"WITH s AS (SELECT j, i, CASE WHEN ('0x' || substr(md5(i || '_' || j), 1, 15))::BIGINT " +
      s"% 2 = 0 THEN 1.0 ELSE -1.0 END AS w FROM range($outDim) t1(j), range($dim) t2(i)), " +
      "m AS (SELECT j, list(w ORDER BY i) AS wv FROM s GROUP BY 1), " +
      "p AS (SELECT e.vec_id, m.j, list_dot_product(e.embedding::DOUBLE[], m.wv) " +
      s"/ sqrt($outDim.0) AS pr FROM embeddings e CROSS JOIN m) " +
      s"SELECT vec_id, $cols FROM p GROUP BY 1"
  }
}
