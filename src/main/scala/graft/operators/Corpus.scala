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
    * partitionings and cluster sizes (keyed on xxhash64 of the id column —
    * never `rand()`, which breaks on retry/recompute).
    */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], salt: String = "graft"): DataFrame = {
    val total = splits.map(_._2).sum
    val buckets = 1000000L
    val h = pmod(xxhash64(lit(salt), col(idCol)), lit(buckets))
    val (expr, _) = splits.foldLeft((lit(null).cast("string"), 0.0)) {
      case ((acc, cum), (name, w)) =>
        val hi = ((cum + w) / total * buckets).toLong
        val lo = (cum / total * buckets).toLong
        (when(h >= lo && h < hi, lit(name)).otherwise(acc), cum + w)
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
}
