package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global ordering primitives. A `ROW_NUMBER() OVER (ORDER BY
  * …)` with no PARTITION BY collapses to one partition; these helpers keep
  * the same semantics with a range partition + per-partition counts (tiny
  * driver collect) + a locally-seeded running counter — the standard
  * scalable zipWithIndex-under-an-order shape.
  */
object GlobalOrder {

  /** Append a 1-based global row number under the given total order. */
  def withRowNumber(df: DataFrame, orderCols: Seq[String],
      rnCol: String = "graft_rn"): DataFrame =
    withRowNumberAndTotal(df, orderCols, rnCol)._1

  /** [[withRowNumber]] plus the total row count — the count is the sum of
    * the per-partition counts the numbering pass collects anyway, so
    * callers that need both (NTILE) don't pay a second count job.
    */
  private[graft] def withRowNumberAndTotal(df: DataFrame, orderCols: Seq[String],
      rnCol: String = "graft_rn"): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val ranged = df
      .repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    // No persist: Dataset.rdd is a lazy val, so the counts pass and the
    // numbering pass share one lineage and Spark reuses the range-shuffle
    // map outputs across the two jobs — the only recompute is the
    // partition-local sort. A persist here (round 1) pinned the ranged
    // blocks for the session lifetime (block-manager leak under repeated
    // pipeline use).
    val rangedRdd = ranged.rdd
    val counts = rangedRdd.mapPartitionsWithIndex((pid, it) =>
      Iterator.single((pid, it.size.toLong))).collect().toMap
    val maxPid = if (counts.isEmpty) 0 else counts.keys.max
    val offsets = new Array[Long](maxPid + 2)
    for (p <- 0 to maxPid)
      offsets(p + 1) = offsets(p) + counts.getOrElse(p, 0L)
    val schema = StructType(df.schema.fields :+ StructField(rnCol, LongType, nullable = false))
    val rdd = rangedRdd.mapPartitionsWithIndex { (pid, it) =>
      var rn = offsets(math.min(pid, offsets.length - 1))
      it.map { r => rn += 1; Row.fromSeq(r.toSeq :+ rn) }
    }
    (spark.createDataFrame(rdd, schema), offsets(maxPid + 1))
  }

  /** Append the running total of `valueCol` (a LONG column) under the
    * given total order — inclusive of the current row, i.e. the window
    * `SUM(v) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)`, without the
    * single-reducer collapse that window carries: range partition +
    * per-partition sums (O(partitions) driver collect) + a locally-seeded
    * running accumulator, the same shape as [[withRowNumber]].
    */
  def withRunningTotal(df: DataFrame, orderCols: Seq[String], valueCol: String,
      totalCol: String = "graft_running"): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val valueIdx = df.schema.fieldIndex(valueCol)
    require(df.schema(valueIdx).dataType == LongType,
      s"withRunningTotal: $valueCol must be LONG (cast first)")
    val ranged = df
      .repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val rangedRdd = ranged.rdd
    val sums = rangedRdd.mapPartitionsWithIndex((pid, it) =>
      Iterator.single((pid, it.map(r =>
        if (r.isNullAt(valueIdx)) 0L else r.getLong(valueIdx)).sum))).collect().toMap
    val maxPid = if (sums.isEmpty) 0 else sums.keys.max
    val offsets = new Array[Long](maxPid + 2)
    for (p <- 0 to maxPid)
      offsets(p + 1) = offsets(p) + sums.getOrElse(p, 0L)
    val schema = StructType(df.schema.fields :+ StructField(totalCol, LongType, nullable = false))
    val rdd = rangedRdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(math.min(pid, offsets.length - 1))
      it.map { r =>
        acc += (if (r.isNullAt(valueIdx)) 0L else r.getLong(valueIdx))
        Row.fromSeq(r.toSeq :+ acc)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Drop the first n rows under the order (scalable skipRows). */
  def skipRows(df: DataFrame, n: Long, orderCols: Seq[String]): DataFrame =
    withRowNumber(df, orderCols).where(col("graft_rn") > n).drop("graft_rn")

  /** Global NTILE(k) under the order — identical bucket assignment to the
    * SQL window function (first total%k buckets get the extra row), built
    * from the distributed row number + one count.
    */
  def ntile(df: DataFrame, k: Int, orderCols: Seq[String],
      bucketCol: String = "bucket"): DataFrame = {
    require(k > 0)
    val (withRn, total) = withRowNumberAndTotal(df, orderCols)
    val base = total / k
    val extra = total % k
    // rows in bucket b (1-based): first `extra` buckets have base+1 rows
    val boundary = (base + 1) * extra // last rn covered by the big buckets
    withRn.withColumn(bucketCol,
      when(lit(base) === 0, least(col("graft_rn"), lit(k.toLong)))
        .otherwise(when(col("graft_rn") <= boundary,
          ((col("graft_rn") - 1) / (base + 1) + 1))
          .otherwise(((col("graft_rn") - 1 - boundary) / base + extra + 1)))
        .cast("int"))
      .drop("graft_rn")
  }
}
