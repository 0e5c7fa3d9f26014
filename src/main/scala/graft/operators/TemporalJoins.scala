package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.GraftError

/** Time-series joins Spark has no native SQL surface for: AS-OF (each left
  * row picks the temporally closest right row per key) and RANGE (each left
  * point matches every right interval containing it). Both are beyond the
  * reference's join surface (src/elusion.rs:905-960 stops at the eight SQL
  * join types) but table stakes for event-log / feature-store pipelines.
  *
  * Scale shapes:
  *   - asofJoin is ONE hash shuffle of (left ∪ right) on the by-keys plus a
  *     partition-local sort — the same cost envelope as a sort-merge join.
  *     The naive formulation (`l.ts >= r.ts` + window-max or a non-equi
  *     join) degenerates to BroadcastNestedLoop / per-key quadratic work;
  *     the union-window form never materializes a candidate pair at all.
  *   - rangeJoin buckets time into fixed-width cells: points map to one
  *     cell, intervals explode into the cells they overlap, and the join is
  *     a plain equi-join on (by-keys, cell) with the exact containment
  *     predicate re-applied. An interval of length L costs ⌈L/width⌉ + 1
  *     bucket rows, so width ≈ the typical interval length keeps the
  *     explosion factor ~2 while confining comparisons to same-cell rows.
  */
object TemporalJoins {

  /** AS-OF join: for every left row, the single right row (same `by` keys)
    * whose `rightTs` is closest to `leftTs` in `direction`:
    *   - "backward": greatest rightTs <= leftTs (pandas merge_asof default)
    *   - "forward":  least rightTs >= leftTs
    *   - "nearest":  whichever of the two is closer; ties -> backward
    * `allowExactMatches = false` makes the bounds strict (< / >); nearest
    * requires inclusive bounds. `toleranceSeconds` nulls out a match whose
    * time distance exceeds the bound (rows are kept — LEFT join contract).
    *
    * Output: every left column, plus each non-key right column as
    * `rightPrefix + name` (collision with a left name fails typed).
    *
    * Implementation: union the two sides tagged, window over the by-keys
    * ordered by (ts, side-tag, right-payload): `last(right, ignoreNulls)`
    * over (-inf, current] is the backward match; `first(right, ignoreNulls)`
    * over [current, +inf) the forward one — both frames share ONE sort.
    * The side-tag decides equal-timestamp visibility (right sorts before
    * left => visible to backward's frame, invisible to forward's), and the
    * right payload struct as the final sort key makes the pick among
    * equal-timestamp right duplicates deterministic. One shuffle, no
    * candidate-pair blowup, skew bounded by the by-key row distribution.
    */
  def asofJoin(left: DataFrame, right: DataFrame, leftTs: String,
      rightTs: String, by: Seq[String], direction: String = "backward",
      allowExactMatches: Boolean = true, toleranceSeconds: Option[Double] = None,
      rightPrefix: String = "r_"): DataFrame = {
    val dir = direction.trim.toLowerCase
    if (!Seq("backward", "forward", "nearest").contains(dir))
      throw GraftError.JoinError(
        s"asofJoin direction must be backward|forward|nearest, got '$direction'")
    if (dir == "nearest" && !allowExactMatches)
      throw GraftError.JoinError(
        "asofJoin nearest direction requires allowExactMatches = true " +
          "(strict-nearest is ambiguous at equal timestamps)")
    val rightPayload = right.columns.filterNot(by.contains).toSeq
    val outNames = rightPayload.map(rightPrefix + _)
    outNames.find(left.columns.contains).foreach { c =>
      throw GraftError.JoinError(
        s"asofJoin output column '$c' collides with a left column — pass a " +
          "different rightPrefix")
    }

    // Equal-timestamp visibility via the side tag (left is always 1):
    // a right row sorting BEFORE the left row lands in backward's
    // (-inf, current] frame and outside forward's [current, +inf) frame.
    //   backward: inclusive => right first (0); strict => right last (2)
    //   forward:  inclusive => right last (2);  strict => right first (0)
    //   nearest:  right first (0) — the equal-ts row is distance 0 and
    //             backward wins the tie, so forward missing it is moot.
    val rightTag = dir match {
      case "backward" | "nearest" => if (allowExactMatches) 0 else 2
      case "forward"              => if (allowExactMatches) 2 else 0
    }
    val leftSide = left.select(
      by.map(col) ++ Seq(
        col(leftTs).as("graft_ts"), lit(1).as("graft_tag"),
        struct(left.columns.map(col): _*).as("graft_left"),
        lit(null).cast(structType(right, rightPayload)).as("graft_right")): _*)
    val rightSide = right.select(
      by.map(col) ++ Seq(
        col(rightTs).as("graft_ts"), lit(rightTag).as("graft_tag"),
        lit(null).cast(structType(left, left.columns.toSeq)).as("graft_left"),
        struct(rightPayload.map(col): _*).as("graft_right")): _*)
    val unioned = leftSide.unionByName(rightSide)

    val order = Seq(col("graft_ts"), col("graft_tag"), col("graft_right"))
    val backW = Window.partitionBy(by.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwdW = Window.partitionBy(by.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val withMatches = unioned
      .withColumn("graft_back", last(col("graft_right"), ignoreNulls = true).over(backW))
      .withColumn("graft_fwd", first(col("graft_right"), ignoreNulls = true).over(fwdW))
      .where(col("graft_tag") === 1)

    // |Δt| in MICROSECONDS for timestamps (exact integer arithmetic — the
    // fractional-epoch-seconds double cast rounds at ~2e-7 s and could
    // misorder two sub-microsecond-close distances); plain double delta
    // for numeric time columns. Tolerance scales to match.
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val tsType = left.schema(leftTs).dataType
    val isTimestamp = tsType == TimestampType || tsType == TimestampNTZType
    def dist(m: Column): Column =
      if (isTimestamp)
        abs(unix_micros(col("graft_ts")) - unix_micros(m.getField(rightTs)))
          .cast("double")
      else
        abs(col("graft_ts").cast("double") - m.getField(rightTs).cast("double"))
    val tolScale = if (isTimestamp) 1e6 else 1.0
    val picked = dir match {
      case "backward" => col("graft_back")
      case "forward"  => col("graft_fwd")
      case "nearest" =>
        when(col("graft_back").isNull, col("graft_fwd"))
          .when(col("graft_fwd").isNull, col("graft_back"))
          .when(dist(col("graft_back")) <= dist(col("graft_fwd")), col("graft_back"))
          .otherwise(col("graft_fwd"))
    }
    val bounded = toleranceSeconds match {
      case Some(tol) => when(dist(picked) <= lit(tol * tolScale), picked)
      case None      => picked
    }
    withMatches
      .withColumn("graft_match", bounded)
      .select(
        left.columns.toSeq.map(c => col("graft_left").getField(c).as(c)) ++
          rightPayload.zip(outNames).map { case (c, o) =>
            col("graft_match").getField(c).as(o)
          }: _*)
  }

  /** RANGE (interval-containment) join: every (left point, right interval)
    * pair with the same `by` keys and `startCol <= ts < endCol`
    * (`inclusiveEnd = true` widens to <=). INNER contract — unmatched rows
    * of either side drop.
    *
    * `bucketWidthSeconds` is the scale dial: points land in exactly one
    * bucket, intervals in ⌈length/width⌉ + 1, and only same-bucket rows
    * are ever compared. Width well above the typical interval length
    * wastes nothing but prunes less; width far below it multiplies the
    * interval side's shuffle volume. Null / reversed intervals and
    * intervals spanning more than `maxCellsPerInterval` buckets raise at
    * execution instead of silently dropping rows or exploding sequence() —
    * a reversed interval is corrupt input, not an empty match set.
    */
  def rangeJoin(left: DataFrame, leftTs: String, right: DataFrame,
      startCol: String, endCol: String, by: Seq[String],
      bucketWidthSeconds: Long = 3600L, inclusiveEnd: Boolean = false,
      rightPrefix: String = "r_", maxCellsPerInterval: Long = 100000L): DataFrame = {
    if (bucketWidthSeconds <= 0)
      throw GraftError.JoinError("rangeJoin bucketWidthSeconds must be > 0")
    val rightPayload = right.columns.filterNot(by.contains).toSeq
    val outNames = rightPayload.map(rightPrefix + _)
    outNames.find(left.columns.contains).foreach { c =>
      throw GraftError.JoinError(
        s"rangeJoin output column '$c' collides with a left column — pass a " +
          "different rightPrefix")
    }
    def cell(c: Column): Column =
      floor(c.cast("double") / lit(bucketWidthSeconds.toDouble)).cast("long")
    val l = left.withColumn("graft_cell", cell(col(leftTs)))
    val badInterval =
      col(startCol).isNull || col(endCol).isNull || col(startCol) > col(endCol)
    val tooWide = cell(col(endCol)) - cell(col(startCol)) > lit(maxCellsPerInterval)
    val r = right
      .withColumn("graft_cell", explode(
        when(badInterval, raise_error(concat(
          lit(s"rangeJoin: null or reversed interval [$startCol, $endCol): start="),
          col(startCol).cast("string"), lit(" end="), col(endCol).cast("string"))))
        .when(tooWide, raise_error(concat(
          lit(s"rangeJoin: interval spans more than $maxCellsPerInterval buckets of " +
            s"$bucketWidthSeconds s — raise bucketWidthSeconds or maxCellsPerInterval; start="),
          col(startCol).cast("string"), lit(" end="), col(endCol).cast("string"))))
        .otherwise(sequence(cell(col(startCol)), cell(col(endCol))))))
      .select(by.map(col) ++ Seq(col("graft_cell")) ++
        rightPayload.zip(outNames).map { case (c, o) => col(c).as(o) }: _*)
    val contains =
      if (inclusiveEnd)
        col(leftTs) >= col(rightPrefix + startCol) &&
          col(leftTs) <= col(rightPrefix + endCol)
      else
        col(leftTs) >= col(rightPrefix + startCol) &&
          col(leftTs) < col(rightPrefix + endCol)
    l.join(r, by :+ "graft_cell")
      .where(contains)
      .drop("graft_cell")
  }

  /** Null-valued struct type over `cols` of `df` — the union-side
    * placeholder for the other side's payload.
    */
  private def structType(df: DataFrame, cols: Seq[String]) = {
    import org.apache.spark.sql.types.StructType
    StructType(cols.map(c => df.schema(c)))
  }
}
