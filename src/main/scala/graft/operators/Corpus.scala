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

  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], salt: String = "graft"): DataFrame = {
    val buckets = 1000000L
    val h = pmod(
      conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 15), 16, 10)
        .cast("long"),
      lit(buckets))
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
}
