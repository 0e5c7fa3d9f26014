package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph operators over pair sets the dedup pipeline already produces —
  * centrality over the document-similarity graph (which documents sit at
  * the center of a near-dup / template family vs. its periphery) is a
  * standard curation signal next to [[Dedup.dedupClusters]]'s component
  * labels. Beyond the reference (it has no graph surface); the
  * computation is the classic fixed-iteration PageRank expressed as
  * join + aggregate per round — no driver-side adjacency, no GraphX.
  */
object GraphOps {

  /** Fixed-iteration PageRank over an undirected pair set (`idA`, `idB`
    * one row per edge): symmetrize, then iterate
    *
    *   pr⁰(v)    = 1/N
    *   prᵏ⁺¹(v) = (1−d)/N + d · Σ_{u→v} prᵏ(u)/deg(u)
    *
    * Nodes are the pair-set members — every one has degree ≥ 1, so there
    * is no dangling mass. A FIXED iteration count (not a convergence
    * test) keeps the result exactly recomputable by the oracle's
    * unrolled SQL; ranks are rounded to the repo-wide 6-dp grain at the
    * end only.
    *
    * Scale shape: the symmetrized (src, dst, 1/deg) edge list persists
    * once and every iteration is ONE shuffle join of the current rank
    * vector (N rows) against it plus a map-side-combined sum — the
    * standard distributed PR data layout. The rank vector eagerly
    * checkpoints every `checkpointInterval` rounds (the
    * connectedComponents policy) so plan depth stays bounded at high
    * iteration counts; values are unaffected.
    */
  def pageRank(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      iterations: Int = 3, damping: Double = 0.85,
      checkpointInterval: Int = 10): DataFrame = {
    require(iterations >= 1, "pageRank: iterations must be >= 1")
    require(checkpointInterval >= 1, "pageRank: checkpointInterval must be >= 1")
    // pin the raw pair list before ANY fan-out: the symmetrizing union
    // subscribes it twice and the degree join a third time, and its
    // lineage is whatever (possibly expensive — LSH, ANN) pair
    // generation the caller handed in; the pin runs that exactly once.
    // Two ids per row — the cheapest frame in the whole operator.
    val fwd = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .localCheckpoint(true)
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).cast("double").as("graft_deg"))
    // (src, dst, 1/deg(src)) — the per-edge contribution weight, reused
    // every iteration
    val contribEdges = edges.join(deg, Seq("src"))
      .select(col("src"), col("dst"), (lit(1.0) / col("graft_deg")).as("graft_w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize the cache FIRST, then count nodes FROM it — counting
    // `deg` directly would evaluate the (possibly expensive) pair
    // generation once for N and again when the cache fills
    contribEdges.count()
    val n = contribEdges.select(col("src")).distinct().count().toDouble
    val base = (1.0 - damping) / n
    // initial ranks derive from the CACHED edges, not `deg` — deg's
    // lineage re-runs the (possibly expensive, e.g. LSH) pair generation
    // once more, which is exactly what the cache exists to prevent
    var pr = contribEdges.select(col("src").as("id")).distinct()
      .select(col("id"), (lit(1.0) / lit(n)).as("pr"))
    for (i <- 1 to iterations) {
      val contrib = contribEdges
        .join(pr, contribEdges("src") === pr("id"))
        .groupBy(col("dst").as("id2"))
        .agg(sum(col("pr") * col("graft_w")).as("graft_c"))
      pr = pr.select(col("id"))
        .join(contrib, col("id") === col("id2"), "left")
        .select(col("id"),
          (lit(base) + lit(damping) * coalesce(col("graft_c"), lit(0.0))).as("pr"))
      // bound lineage on long runs; never on the last round (the final
      // select below checkpoints the rounded result itself)
      if (i % checkpointInterval == 0 && i < iterations)
        pr = pr.localCheckpoint(true)
    }
    // eager localCheckpoint (the connectedComponents policy): the result
    // materializes while contribEdges is still cached and stops
    // referencing it, so the cache can be released immediately
    val out = pr.select(col("id"), round(col("pr"), 6).as("pagerank"))
      .localCheckpoint(true)
    contribEdges.unpersist()
    out
  }
}
