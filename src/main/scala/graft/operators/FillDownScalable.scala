package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed fill-down (last-observation-carried-forward).
  *
  * The naive implementation is a global window with no PARTITION BY, which
  * Spark executes on a single partition — a non-starter at scale (and it
  * warns loudly). This version:
  *
  *  1. range-partitions + sorts by the explicit order columns (the
  *     operator's ordering contract, SURVEY §7.4.3),
  *  2. pass A: per partition, records the trailing non-null value of each
  *     fill column — numPartitions tiny rows collected to the driver,
  *  3. pass B: per partition, fills nulls with a running value seeded from
  *     the previous partitions' prefix.
  *
  * Pass B is per-partition imperative logic over sorted rows — the one
  * case SURVEY's design notes reserve for the RDD API. Output values
  * depend only on the global order, so partition-boundary placement never
  * changes the result.
  */
object FillDownScalable {

  def fillDown(df: DataFrame, cols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    // Deterministic tiebreak: pass A and pass B each re-sort re-fetched
    // shuffle blocks, and shuffle fetch order is nondeterministic — if
    // orderCols ties, the trailing value pass A records could come from a
    // different tie-ordering than pass B observes. A row hash appended to
    // the sort key makes the order total up to rows identical in the
    // hashed columns — which include every fill column, so interchangeable
    // rows carry identical fill values. Hash input is restricted to
    // hashable types (xxhash64 rejects maps).
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val hashCols = (orderCols ++ cols).distinct
      .filter(c => hashable(df.schema(c).dataType))
      .map(col)
    val tbCol = "graft_fd_tiebreak"
    val keyed = df.withColumn(tbCol,
      if (hashCols.nonEmpty) xxhash64(struct(hashCols: _*)) else lit(0L))
    val keys = (orderCols :+ tbCol).map(col)
    val ranged = keyed
      .repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
    // No persist: pass A and pass B share ranged's lazy-val RDD lineage, so
    // the range shuffle's map outputs are reused across the two jobs and
    // only the partition-local sort re-runs. Persisting (round 1) leaked
    // the cached blocks for the session lifetime.
    val rangedRdd = ranged.rdd
    val schema = ranged.schema
    val idx = cols.map(schema.fieldIndex).toArray

    // pass A: trailing non-null per partition (tiny driver collect)
    val lasts: Array[(Int, Array[Any])] = rangedRdd.mapPartitionsWithIndex {
      (pid, it) =>
        val last = Array.fill[Any](idx.length)(null)
        it.foreach { r =>
          var j = 0
          while (j < idx.length) {
            val v = r.get(idx(j)); if (v != null) last(j) = v; j += 1
          }
        }
        Iterator.single((pid, last))
    }.collect()

    // prefix(p) = last non-null over partitions [0, p)
    val maxPid = if (lasts.isEmpty) 0 else lasts.map(_._1).max
    val byPid = lasts.toMap
    val prefixes = new Array[Array[Any]](maxPid + 2)
    prefixes(0) = Array.fill[Any](idx.length)(null)
    for (p <- 0 to maxPid) {
      val cur = prefixes(p)
      val here = byPid.getOrElse(p, Array.fill[Any](idx.length)(null))
      prefixes(p + 1) = Array.tabulate[Any](idx.length)(j =>
        if (here(j) != null) here(j) else cur(j))
    }

    // pass B: running fill seeded from the prefix
    val rdd = rangedRdd.mapPartitionsWithIndex { (pid, it) =>
      val run = prefixes(math.min(pid, prefixes.length - 1)).clone()
      it.map { r =>
        val arr = r.toSeq.toArray
        var j = 0
        while (j < idx.length) {
          val ci = idx(j)
          if (arr(ci) == null) arr(ci) = run(j) else run(j) = arr(ci)
          j += 1
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    }
    spark.createDataFrame(rdd, schema).drop(tbCol)
  }
}
