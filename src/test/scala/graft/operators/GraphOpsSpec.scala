package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {

  private def pairs(p: (Long, Long)*) = {
    val sp = spark; import sp.implicits._
    p.toDF("id_a", "id_b")
  }

  test("pagerank on a path graph matches the hand-unrolled recurrence") {
    // 1 — 2 — 3: deg = (1, 2, 1), N = 3, d = 0.85
    val got = GraphOps.pageRank(pairs((1L, 2L), (2L, 3L)), iterations = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pagerank")).toMap
    val n = 3.0; val d = 0.85; val base = (1 - d) / n
    // round 1 from pr0 = 1/3
    val p1_1 = base + d * ((1 / n) / 2) // from 2
    val p1_2 = base + d * ((1 / n) + (1 / n)) // from 1 and 3
    // round 2
    val p2_1 = base + d * (p1_2 / 2)
    val p2_2 = base + d * (p1_1 + p1_1) // 1 and 3 are symmetric
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(1L) - r6(p2_1)) < 1e-9)
    assert(math.abs(got(2L) - r6(p2_2)) < 1e-9)
    assert(got(1L) == got(3L)) // symmetry
  }

  test("pagerank mass is conserved and the hub outranks the spokes") {
    // star: 1 is the hub of 2..6
    val star = pairs((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L))
    val pr = GraphOps.pageRank(star, iterations = 5)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pagerank")).toMap
    assert(pr.size == 6)
    assert(math.abs(pr.values.sum - 1.0) < 1e-4) // no dangling leakage
    assert((2L to 6L).forall(i => pr(1L) > pr(i)))
    assert((3L to 6L).forall(i => pr(2L) == pr(i))) // spoke symmetry
  }

  test("in-loop checkpoint cadence leaves pagerank values bit-identical") {
    val star = pairs((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L))
    def run(interval: Int) = GraphOps.pageRank(star, iterations = 5,
        checkpointInterval = interval)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pagerank")).toMap
    // cadence 2 checkpoints after rounds 2 and 4; cadence 10 never fires
    assert(run(2) == run(10))
  }

  test("IVF-indexed kNN edges recall the brute-force graph on the embeddings fixture") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = "target/tmp/ivf_knn_spec"
    Similarity.buildIvfIndex(emb, "embedding", "vec_id", idx, nlist = 8)
    def edgeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    val exact = edgeSet(
      Similarity.bruteForceTopK(emb, emb, "embedding", "vec_id", k = 5))
    val indexed = edgeSet(
      Similarity.ivfKnnEdges(idx, emb, "embedding", "vec_id", k = 5, nprobe = 4))
    assert(indexed.nonEmpty)
    val recall = (indexed intersect exact).size.toDouble / exact.size
    assert(recall > 0.5, s"indexed kNN edge recall too low: $recall")
    // every query emits at most k edges (the bounded-heap contract)
    val perQuery = indexed.groupBy(_._1).values.map(_.size)
    assert(perQuery.max <= 5)
  }

  test("pagerank over disconnected components keeps per-component symmetry") {
    val two = pairs((1L, 2L), (10L, 11L), (11L, 12L), (10L, 12L))
    val pr = GraphOps.pageRank(two, iterations = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pagerank")).toMap
    assert(pr.size == 5)
    assert(pr(1L) == pr(2L)) // pair component
    assert(pr(10L) == pr(11L) && pr(11L) == pr(12L)) // triangle component
  }
}
