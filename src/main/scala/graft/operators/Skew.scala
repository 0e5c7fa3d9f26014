package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY scale note: "skewed keys → salting or
  * AQE skew-join"). AQE's skew-join split handles sort-merge skew
  * automatically; explicit salting is for the cases AQE can't split — a
  * single hot key whose group must still co-locate, or a shuffled hash
  * join against a mid-size table.
  */
object Skew {

  /** Equi-join with the left side's hot keys spread over `factor` salt
    * buckets; the right side is replicated `factor`×. Produces exactly the
    * same rows as the plain join — the salt only decorrelates partition
    * assignment. Use when one left key dominates (shuffle partition >
    * executor memory) and the right side is too big to broadcast.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 1, "salt factor must be > 1")
    val saltSrc = left.columns.map(col).toSeq
    val salted = left.withColumn("graft_salt",
      pmod(xxhash64(saltSrc: _*), lit(factor.toLong)))
    val replicated = right.withColumn("graft_salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    salted.join(replicated, keys :+ "graft_salt", joinType)
      .drop("graft_salt")
  }

  /** Two-phase aggregation for a skewed group key: partial aggregate on
    * (key, salt), then final merge on key. `aggs` maps output column →
    * (partialExpr, mergeExpr) — e.g. count = (count(*), sum(partial)).
    */
  def saltedCount(df: DataFrame, keys: Seq[String], factor: Int): DataFrame = {
    val salted = df.withColumn("graft_salt",
      pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(factor.toLong)))
    salted.groupBy((keys :+ "graft_salt").map(col): _*)
      .agg(count(lit(1)).as("graft_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("graft_partial").as("n"))
  }
}
