package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Embedding feature engineering: the normalization passes that precede
  * ANN / clustering / dedup over vector columns. Beyond the reference
  * (its expr surface has no vector ops at all) — these are the
  * `array<float>` companions of the text-side quality gates.
  */
object Features {

  /** Per-dimension corpus statistics of a vector column, as ONE row
    * (`graft_mus`, `graft_sds` — position-ordered arrays). posexplode →
    * per-dimension avg/stddev_pop (map-side combined, one shuffle of
    * dim-sized partials), then the dim rows collapse into arrays via
    * `sort_array(collect_list(struct(pos, …)))` — the struct sort key
    * makes the array order deterministic regardless of partitioning
    * (collect_list alone has no order contract).
    */
  def dimensionStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(V.asDouble(col(vecCol))).as(Seq("graft_pos", "graft_x")))
      .groupBy(col("graft_pos"))
      .agg(avg(col("graft_x")).as("mu"), stddev_pop(col("graft_x")).as("sd"))
      .agg(
        sort_array(collect_list(struct(col("graft_pos"), col("mu")))).as("ms"),
        sort_array(collect_list(struct(col("graft_pos"), col("sd")))).as("ss"))
      .select(
        transform(col("ms"), s => s.getField("mu")).as("graft_mus"),
        transform(col("ss"), s => s.getField("sd")).as("graft_sds"))

  /** Z-score standardization per dimension: out[i] = (v[i] − μᵢ) / σᵢ,
    * with zero-variance dimensions mapped to 0 (a constant dimension
    * carries no signal; emitting ±Inf would poison every downstream
    * distance). The stats row broadcasts — the data pass is map-side only,
    * so standardizing composes with any downstream shuffle for free.
    */
  def standardize(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.crossJoin(broadcast(dimensionStats(df, vecCol)))
      .withColumn(outCol, expr(
        s"transform(cast(`$vecCol` as array<double>), (x, i) -> " +
          "CASE WHEN graft_sds[i] = 0.0D OR graft_sds[i] IS NULL THEN 0.0D " +
          "ELSE (x - graft_mus[i]) / graft_sds[i] END)"))
      .drop("graft_mus", "graft_sds")

  /** L2 (unit-norm) scaling: v / ‖v‖, zero vectors stay zero. Pure
    * per-row arithmetic — no shuffle, codegen-friendly.
    */
  def l2Normalize(df: DataFrame, vecCol: String, outCol: String): DataFrame = {
    val v = V.asDouble(col(vecCol))
    val n = sqrt(aggregate(v, lit(0.0), (acc: Column, x: Column) => acc + x * x))
    df.withColumn(outCol,
      when(n === 0.0, v).otherwise(transform(v, x => x / n)))
  }

  /** Per-dimension affine int8 quantization — the 4× at-rest compression
    * for embedding stores: code[i] = clamp(⌊(v[i] − minᵢ)·255 / (maxᵢ −
    * minᵢ)⌋, 0, 255) with per-dimension corpus min/max (constant
    * dimensions map to 0). FLOOR (not round) keeps the integer codes
    * engine-exact; the max of each dimension lands on 255 via the clamp.
    * Dequantize as minᵢ + code·(maxᵢ − minᵢ)/255 with ≤ half-step error.
    *
    * Scale shape: one posexplode min/max pass collapsing to a single
    * broadcast stats row (same pattern as [[standardize]]); the encode
    * itself is map-side, no shuffle.
    */
  def quantizeInt8(df: DataFrame, vecCol: String, outCol: String): DataFrame = {
    val stats = df
      .select(posexplode(V.asDouble(col(vecCol))).as(Seq("graft_pos", "graft_x")))
      .groupBy(col("graft_pos"))
      .agg(min(col("graft_x")).as("lo"), max(col("graft_x")).as("hi"))
      .agg(
        sort_array(collect_list(struct(col("graft_pos"), col("lo")))).as("ls"),
        sort_array(collect_list(struct(col("graft_pos"), col("hi")))).as("hs"))
      .select(
        transform(col("ls"), s => s.getField("lo")).as("graft_los"),
        transform(col("hs"), s => s.getField("hi")).as("graft_his"))
    df.crossJoin(broadcast(stats))
      .withColumn(outCol, expr(
        s"transform(cast(`$vecCol` as array<double>), (x, i) -> " +
          "CASE WHEN graft_his[i] = graft_los[i] THEN 0 " +
          "ELSE CAST(least(greatest(floor((x - graft_los[i]) * 255.0D / " +
          "(graft_his[i] - graft_los[i])), 0.0D), 255.0D) AS INT) END)"))
      .drop("graft_los", "graft_his")
  }

  /** Per-group Tukey-fence outliers: rows whose value falls outside
    * [q1 − factor·IQR, q3 + factor·IQR] of THEIR group. Fences round to
    * the repo-wide 6-dp grain before the comparison so the flag set is
    * identical across engines (quantile interpolation agrees to 6 dp;
    * the raw doubles may differ in the last ulp).
    *
    * Scale shape: one group-keyed aggregation for the quartiles, then a
    * key-partitioned join back (broadcast when the fence table is small
    * — Catalyst/AQE decides) and a map-side predicate. `exact = true`
    * uses the exact `percentile` aggregate (buffers one count-map per
    * group — right for the oracle and for bounded group value domains);
    * at extreme per-group cardinality pass `exact = false` for
    * `approx_percentile` at 1e-4 relative error, same plan shape.
    */
  def iqrOutliers(df: DataFrame, valueCol: String, byCols: Seq[String],
      factor: Double = 1.5, exact: Boolean = true): DataFrame = {
    require(byCols.nonEmpty, "iqrOutliers: byCols must be non-empty")
    require(factor >= 0, "iqrOutliers: factor must be >= 0")
    val (q1e, q3e) =
      if (exact) (s"percentile($valueCol, 0.25d)", s"percentile($valueCol, 0.75d)")
      else (s"approx_percentile($valueCol, 0.25d, 10000)",
        s"approx_percentile($valueCol, 0.75d, 10000)")
    val fences = df.groupBy(byCols.map(col): _*)
      .agg(expr(q1e).as("graft_q1"), expr(q3e).as("graft_q3"))
      .select(byCols.map(c => col(c).as(s"graft_k_$c")) ++ Seq(
        round(col("graft_q1") - (col("graft_q3") - col("graft_q1")) * factor, 6)
          .as("fence_lo"),
        round(col("graft_q3") + (col("graft_q3") - col("graft_q1")) * factor, 6)
          .as("fence_hi")): _*)
    // null-SAFE key equality: a null group gets its own fences and its
    // outliers are flagged like any other group's (a plain equality join
    // would silently drop every null-keyed row)
    df.join(fences,
        byCols.map(c => col(c) <=> col(s"graft_k_$c")).reduce(_ && _))
      .where(col(valueCol) < col("fence_lo") || col(valueCol) > col("fence_hi"))
      .drop(byCols.map(c => s"graft_k_$c"): _*)
  }

  /** Percentile winsorization: clip `valueCol` into the per-group
    * [pLo, pHi] quantile band — the standard heavy-tail taming for
    * feature columns where [[iqrOutliers]] would DROP the rows instead
    * of capping them. Fences are 6-dp-rounded BEFORE the clip (the
    * engine-parity idiom of iqrOutliers) and null values stay null (both
    * engines' greatest/least IGNORE nulls, which would silently clip a
    * null to the fence — pinned with an explicit null gate instead).
    * Returns every input row with `<valueCol>_w` appended.
    *
    * Scale shape: one grouped percentile pass (exact, or approx via the
    * same dial as iqrOutliers), broadcast-or-shuffle join back on the
    * null-safe key, map-side clip.
    */
  def winsorize(df: DataFrame, valueCol: String, byCols: Seq[String],
      pLo: Double = 0.05, pHi: Double = 0.95,
      exact: Boolean = true): DataFrame = {
    require(byCols.nonEmpty, "winsorize: byCols must be non-empty")
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"winsorize: need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val (loE, hiE) =
      if (exact) (s"percentile($valueCol, ${pLo}d)", s"percentile($valueCol, ${pHi}d)")
      else (s"approx_percentile($valueCol, ${pLo}d, 10000)",
        s"approx_percentile($valueCol, ${pHi}d, 10000)")
    val fences = df.groupBy(byCols.map(col): _*)
      .agg(expr(loE).as("graft_lo"), expr(hiE).as("graft_hi"))
      .select(byCols.map(c => col(c).as(s"graft_k_$c")) ++ Seq(
        round(col("graft_lo"), 6).as("graft_lo"),
        round(col("graft_hi"), 6).as("graft_hi")): _*)
    df.join(fences,
        byCols.map(c => col(c) <=> col(s"graft_k_$c")).reduce(_ && _))
      .withColumn(s"${valueCol}_w",
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(greatest(col(valueCol), col("graft_lo")),
            col("graft_hi"))))
      .drop(byCols.map(c => s"graft_k_$c") ++ Seq("graft_lo", "graft_hi"): _*)
  }

  /** Robust z-score outliers (Iglewicz–Hoaglin): flag rows where
    * |0.6745·(x − median)/MAD| exceeds `threshold` (3.5 is the published
    * default) — the median/MAD analogue of [[iqrOutliers]] that a single
    * extreme value cannot recruit into the fences the way it drags a
    * mean/stddev z-score. Median and MAD are 6-dp-rounded before the
    * score, the score before the compare (engine parity); MAD = 0 groups
    * (over half the values identical) flag nothing — the score is
    * undefined there, and both engines would otherwise emit ±Inf.
    *
    * Scale shape: two grouped percentile passes (the second over
    * |x − median|, joined back on the null-safe key) and a map-side
    * predicate — no window over the data rows.
    */
  def madOutliers(df: DataFrame, valueCol: String, byCols: Seq[String],
      threshold: Double = 3.5, exact: Boolean = true): DataFrame = {
    require(byCols.nonEmpty, "madOutliers: byCols must be non-empty")
    require(threshold > 0, "madOutliers: threshold must be > 0")
    def pct(c: String) =
      if (exact) s"percentile($c, 0.5d)" else s"approx_percentile($c, 0.5d, 10000)"
    val med = df.groupBy(byCols.map(col): _*)
      .agg(expr(pct(valueCol)).as("graft_med0"))
      .select(byCols.map(c => col(c).as(s"graft_mk_$c")) :+
        round(col("graft_med0"), 6).as("graft_med"): _*)
    val withMed = df.join(med,
      byCols.map(c => col(c) <=> col(s"graft_mk_$c")).reduce(_ && _))
    val mad = withMed
      .withColumn("graft_ad", abs(col(valueCol) - col("graft_med")))
      .groupBy(byCols.map(c => col(s"graft_mk_$c")): _*)
      .agg(expr(pct("graft_ad")).as("graft_mad0"))
      .select(byCols.map(c => col(s"graft_mk_$c").as(s"graft_dk_$c")) :+
        round(col("graft_mad0"), 6).as("graft_mad"): _*)
    withMed.join(mad,
        byCols.map(c => col(s"graft_mk_$c") <=> col(s"graft_dk_$c")).reduce(_ && _))
      .where(col("graft_mad") > 0)
      .withColumn("robust_z",
        round(lit(0.6745) * (col(valueCol) - col("graft_med")) / col("graft_mad"), 6))
      .where(abs(col("robust_z")) > threshold)
      .drop(byCols.flatMap(c => Seq(s"graft_mk_$c", s"graft_dk_$c")) ++
        Seq("graft_med", "graft_mad", "graft_ad"): _*)
  }

  /** Matryoshka truncation (Kusupati et al. 2022, "Matryoshka
    * Representation Learning"): keep the first `dims` dimensions and
    * L2-renormalize — the storage/latency dial for MRL-trained embedding
    * columns (a 64→16 truncation quarters every downstream ANN and dedup
    * cost at a small recall trade). Zero-norm slices stay zero (the
    * NaN-poisoning guard of [[l2Normalize]]). Pure per-row arithmetic —
    * the norm is one native [[graft.plans.NativeOps.dot]] pass, no
    * shuffle, and the division order matches the DuckDB oracle's
    * list arithmetic at 6 dp.
    */
  def truncateEmbedding(df: DataFrame, vecCol: String, dims: Int,
      outCol: String): DataFrame = {
    require(dims >= 1, "truncateEmbedding: dims must be >= 1")
    val sl = slice(V.asDouble(col(vecCol)), 1, dims)
    val n = sqrt(V.dot(sl, sl))
    df.withColumn(outCol,
      when(n === 0.0, sl).otherwise(transform(sl, x => x / n)))
  }

  /** Johnson–Lindenstrauss sign random projection (Achlioptas 2003,
    * "Database-friendly random projections"): out = (1/√k)·S·v with S a
    * fixed ±1 matrix — the cheap dimensionality reduction that preserves
    * pairwise distances within (1±ε) at k = O(log n / ε²), used to shrink
    * embeddings before LSH banding or coarse clustering. Signs are
    * deterministic from the engine-portable 60-bit md5 of "i_j" (the
    * repo-wide reproducibility idiom — the DuckDB oracle derives the
    * identical matrix), so the projection is stable across runs, engines
    * and cluster sizes with no RNG state to ship.
    *
    * Scale shape: the k×d matrix rides the plan as a literal (k·d
    * doubles — broadcast with the task binary, not a join), and the
    * multiply is one native [[graft.plans.NativeOps.matVec]] call per
    * row inside whole-stage codegen: map-side only, no shuffle, no
    * driver participation beyond the constant.
    */
  def randomProjection(df: DataFrame, vecCol: String, outDim: Int,
      outCol: String, dim: Int = 64): DataFrame = {
    require(outDim >= 1, "randomProjection: outDim must be >= 1")
    require(dim >= 1, "randomProjection: dim must be >= 1")
    // dim is a declared parameter (no eager first() on plan construction);
    // a mismatch with the actual vector length fails typed inside matVec
    // ("matrix length is not a multiple of vector length") on execution
    val flat = Array.tabulate(outDim * dim) { idx =>
      val j = idx / dim
      val i = idx % dim
      if (graft.plans.NativeOps.md5Hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"${i}_$j")) % 2L == 0L)
        1.0 else -1.0
    }
    val scale = math.sqrt(outDim.toDouble)
    df.withColumn(outCol,
      transform(
        graft.plans.TextStatsExpressions.matVec(col(vecCol), typedLit(flat.toSeq)),
        x => x / scale))
  }
}
