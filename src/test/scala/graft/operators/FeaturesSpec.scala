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

  test("quantizeInt8: exact codes, endpoint clamp, constant dims to zero") {
    val z = Seq(
      (1L, Seq(0.0f, 5.0f, 7.0f)),
      (2L, Seq(1.0f, 5.0f, 3.0f)),
      (3L, Seq(0.5f, 5.0f, 5.0f))).toDF("vec_id", "v")
    val out = Features.quantizeInt8(z, "v", "codes")
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // dim 0: lo=0, hi=1 → codes floor(x*255) = 0, 255, 127
    assert(out(1L)(0) == 0 && out(2L)(0) == 255 && out(3L)(0) == 127)
    // dim 1 constant → 0
    assert(out.values.forall(_(1) == 0))
    // dim 2: lo=3, hi=7 → 1.0 → 255 (clamp), 3.0 → 0, 5.0 → 127
    assert(out(1L)(2) == 255 && out(2L)(2) == 0 && out(3L)(2) == 127)
    // dequantization error bounded by one step
    val step = 1.0 / 255.0
    assert(math.abs((0.0 + out(3L)(0) * step) - 0.5) <= step)
  }

  test("scoreDrift: identical slices give near-zero psi, bins sum to one") {
    val sp = spark; import sp.implicits._
    val docs = (1 to 100).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog " * (1 + i % 5)))
      .toDF("doc_id", "text")
    val same = Corpus.scoreDrift(docs, docs, "text", bins = 10).collect()
    assert(same.length == 10)
    assert(same.forall(r => math.abs(r.getAs[Double]("psi_term")) < 1e-9))
    assert(math.abs(same.map(_.getAs[Double]("p")).sum - 1.0) < 1e-3)
    // disjoint quality profiles drift hard
    val low = Seq((1L, "@@@@ #### 1234 !!!!"), (2L, "#### $$$$ 999 !!")).toDF("doc_id", "text")
    val psi = Corpus.scoreDrift(docs, low, "text", bins = 10)
      .collect().map(_.getAs[Double]("psi_term")).sum
    assert(psi > 0.5, s"expected large drift, got $psi")
  }

  test("winsorize clips into the quantile band, keeps nulls null, keeps rows") {
    val sp = spark; import sp.implicits._
    // group g: 1..20 plus an extreme 1000 — p05/p95 fences clip both tails
    val vals = ((1 to 20).map(_.toDouble) :+ 1000.0).map(v => ("g", Some(v))) :+
      (("g", Option.empty[Double]))
    val df = vals.toDF("k", "v")
    val out = Features.winsorize(df, "v", Seq("k"), 0.05, 0.95).collect()
    assert(out.length == 22) // winsorize caps, never drops
    val w = out.filter(!_.isNullAt(1)).map(r => r.getDouble(1) -> r.getDouble(2))
    val lo = w.map(_._2).min
    val hi = w.map(_._2).max
    assert(w.forall { case (_, c) => c >= lo && c <= hi })
    assert(w.count { case (v, c) => c != v } >= 2) // both tails clipped
    assert(w.filter { case (v, _) => v == 10.0 }.forall { case (v, c) => c == v })
    assert(out.filter(_.isNullAt(1)).forall(_.isNullAt(2))) // null stays null
  }

  test("madOutliers flags the planted extreme; a majority-constant group flags nothing") {
    val sp = spark; import sp.implicits._
    val df = ((1 to 30).map(i => ("a", 10.0 + (i % 5))) :+ (("a", 500.0)))
      .++((1 to 20).map(_ => ("b", 7.0)) :+ (("b", 9999.0))) // MAD = 0
      .toDF("k", "v")
    val out = Features.madOutliers(df, "v", Seq("k"), threshold = 3.5)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getAs[Double]("robust_z")))
    assert(out.map(x => (x._1, x._2)).toSeq == Seq(("a", 500.0)))
    assert(out.head._3 > 3.5) // and the score itself is large & positive
  }
}
