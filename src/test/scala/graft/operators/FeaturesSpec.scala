package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  // dim 0: values 1,3 (μ=2, σ=1); dim 1: constant 5 (σ=0); dim 2: 0,4 (μ=2, σ=2)
  private lazy val vecs = Seq(
    (1L, Seq(1.0f, 5.0f, 0.0f)),
    (2L, Seq(3.0f, 5.0f, 4.0f))).toDF("vec_id", "v")

  test("standardize: exact z-scores, zero-variance dims map to 0") {
    val out = Features.standardize(vecs, "v", "std")
      .select(col("vec_id"), col("std")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(1L) == Seq(-1.0, 0.0, -1.0))
    assert(out(2L) == Seq(1.0, 0.0, 1.0))
  }

  test("standardized column has zero mean and unit variance per varying dim") {
    val stats = Features.dimensionStats(
      Features.standardize(vecs, "v", "std").select(col("std")), "std")
      .select(col("graft_mus"), col("graft_sds")).first()
    val mus = stats.getSeq[Double](0); val sds = stats.getSeq[Double](1)
    assert(mus.forall(m => math.abs(m) < 1e-12))
    assert(math.abs(sds(0) - 1.0) < 1e-12 && math.abs(sds(2) - 1.0) < 1e-12)
    assert(sds(1) == 0.0)
  }

  test("l2Normalize: unit norm, zero vectors unchanged") {
    val z = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(0.0f, 0.0f))).toDF("vec_id", "v")
    val out = Features.l2Normalize(z, "v", "u")
      .select(col("vec_id"), col("u")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(1L) == Seq(0.6, 0.8))
    assert(out(2L) == Seq(0.0, 0.0))
  }

  test("standardize is a map-side pass over the data: one broadcast, no data shuffle") {
    val plan = Features.standardize(vecs, "v", "std").queryExecution
      .executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"stats row must broadcast:\n$plan")
  }
}
