package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns via built-in
  * higher-order functions (`zip_with` / `aggregate`) — codegen-friendly,
  * no UDFs, so the hot path stays inside whole-stage codegen (SURVEY
  * north-star similarity search).
  */
object VectorFunctions {

  /** Cast array<float> → array<double> so accumulation is double-precision
    * (matches an oracle computing in double).
    */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  // Native single-pass expressions (graft.plans.VectorExpressions) — the
  // zip_with/aggregate composition costs ~90 µs per 64-dim pair in lambda
  // interpretation; the native loop is ~100× faster and accumulates in the
  // same index order (oracle-exact).
  def dot(a: Column, b: Column): Column = graft.plans.VectorExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.cosine(a, b)

  def l2Distance(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.l2(a, b)

  /** PQ ADC distance of one code array against a query's flattened
    * subspace-major m×ksub LUT — one native call per (query, candidate)
    * pair (see [[graft.plans.AdcSum]]).
    */
  def adcSum(codes: Column, lut: Column): Column =
    graft.plans.VectorExpressions.adcSum(codes, lut)

  /** Built-ins-only variants (kept for cross-checking the native exprs). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def cosineHof(a: Column, b: Column): Column = {
    val d = dotHof(a, b)
    val n = sqrt(dotHof(a, a)) * sqrt(dotHof(b, b))
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /** Deterministic pseudo-random unit-ish hyperplanes for sign-LSH:
    * component j of plane i is a hash-derived value in [-1, 1]. Generated
    * driver-side as literals (r planes × dim doubles — tiny), broadcast
    * implicitly as part of the plan.
    */
  def hyperplanes(r: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] =
    (0 until r).map { i =>
      Array.tabulate(dim) { j =>
        // splitmix64-style scramble — deterministic, public-domain scheme
        var z = seed + (i.toLong << 32) + j.toLong + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        (z.toDouble / Long.MaxValue.toDouble)
      }
    }

  /** Sign-LSH bucket id: r projection sign bits packed into a long. Near
    * vectors (cosine) collide with high probability — the bucket-join path
    * for ANN at scale.
    */
  def signLshBucket(v: Column, r: Int, dim: Int, seed: Long = 42L): Column = {
    val planes = hyperplanes(r, dim, seed)
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit).toIndexedSeq: _*)
      when(dot(v, plane) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
