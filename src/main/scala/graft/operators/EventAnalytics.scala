package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event analytics: ordered-step conversion funnels and cohort
  * retention — the two queries every product-analytics deployment runs
  * over an events table (the reference's events use cases stop at
  * windowed aggregation; these are the beyond-parity composition,
  * same spirit as the streaming layer in [[graft.streaming.EventStreams]]).
  */
object EventAnalytics {

  /** Ordered conversion funnel, AGGREGATE form: for `steps = [A, B, C]`,
    * a user converts through step i+1 only with an event of that type at
    * `ts >=` their step-i conversion time (equal timestamps progress in
    * step order, so a same-instant A,B pair converts both). Per step: how
    * many users got there, and the conversion rate relative to step 1.
    *
    * Companion of [[graft.streaming.EventStreams.funnel]], which answers
    * the PER-KEY question (each user's step timestamps + conversion
    * horizon, strictly-after semantics, one as-of shuffle per step);
    * this is the k+1-row report built in ONE shuffle — use that one for
    * drill-down, this one for the dashboard number.
    *
    * Scale shape: ONE shuffle. Events filter to the step types map-side,
    * group once by user, and the per-user progression is an in-row fold
    * over the time-sorted (ts, step) structs — the classic alternative
    * (one min-aggregation + join per step) is k shuffles over the full
    * event stream. The fold state is one int; per-user memory is bounded
    * by that user's funnel-event count. The step rollup then runs on
    * ≤ k+1 rows.
    */
  def funnel(events: DataFrame, tsCol: String, userCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: steps must be non-empty")
    require(steps.distinct.size == steps.size, "funnel: steps must be distinct")
    val sp = events.sparkSession
    import sp.implicits._
    val idx = steps.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit(i)).otherwise(acc)
    }
    // null-timestamp events are dropped, not folded: Spark's array_sort
    // places null-ts structs FIRST while SQL engines' min/>= recurrence
    // ignores them (nulls-last default) — filtering pins the semantics
    // instead of leaving them fixture-dependent, and a null event time
    // cannot order within a funnel anyway
    val perUser = events
      .where(col(tsCol).isNotNull)
      .where(col(typeCol).isin(steps.map(x => x: Any): _*))
      .select(col(userCol), col(tsCol).as("graft_ts"), idx.as("graft_idx"))
      .groupBy(col(userCol))
      .agg(aggregate(
        array_sort(collect_list(struct(col("graft_ts"), col("graft_idx")))),
        lit(0),
        (acc, e) => when(e.getField("graft_idx") === acc, acc + 1)
          .otherwise(acc)).as("graft_reached"))
    // ≤ k+1 rows from here down: the driver-sized step table left-joins
    // the reach histogram so a zero-user step still reports 0
    val byReached = perUser.groupBy(col("graft_reached"))
      .agg(count(lit(1)).as("graft_n"))
    val stepDf = steps.zipWithIndex
      .map { case (s, i) => (i.toLong + 1L, s) }.toDF("step", "step_name")
    val counts = stepDf.join(byReached,
        col("graft_reached") >= col("step"), "left")
      .groupBy(col("step"), col("step_name"))
      .agg(coalesce(sum(col("graft_n")), lit(0L)).as("n_users"))
    counts.withColumn("conversion",
      round(col("n_users").cast("double") /
        greatest(max(when(col("step") === 1L, col("n_users")))
          .over(Window.partitionBy()), lit(1L)), 6))
  }

  /** Cohort retention, calendar-week RATIO form: users cohort by the
    * week of their first event; retention at week offset w = the
    * fraction of the cohort active in cohort-week + w (distinct-user
    * weekly activity; offset 0 is 1.0 by construction). Weeks are
    * Monday-truncated dates.
    *
    * Companion of [[graft.streaming.EventStreams.retention]], which
    * reports ABSOLUTE actives over epoch-anchored integer periods (any
    * period length); this one is calendar-aligned (chart-ready date
    * labels) and normalizes to the cohort size.
    *
    * Scale shape: one distinct over (user, week) — the event stream's
    * only full shuffle — then a user-keyed groupBy + join (AQE turns the
    * weekly frame's reuse into a co-partitioned pair) and a rollup on
    * (cohort, offset), a frame of cohorts × offsets rows. The retention
    * denominator is a window over that tiny rollup, never over users.
    */
  def cohortRetention(events: DataFrame, tsCol: String,
      userCol: String): DataFrame = {
    val weekly = events
      .select(col(userCol), to_date(date_trunc("week", col(tsCol))).as("graft_w"))
      .distinct()
    val firstWeek = weekly.groupBy(col(userCol))
      .agg(min(col("graft_w")).as("graft_cohort"))
    val rolled = weekly.join(firstWeek, userCol)
      .groupBy(col("graft_cohort"),
        (datediff(col("graft_w"), col("graft_cohort")) / 7)
          .cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    rolled.select(
        date_format(col("graft_cohort"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"),
        round(col("n_users").cast("double") /
          first(col("n_users")).over(Window.partitionBy(col("graft_cohort"))
            .orderBy(col("week_offset").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)), 6)
          .as("retention"))
  }

  /** Regular-interval resampling with gap filling: every (group, time
    * bucket) cell of the [min, max] span reported, empty cells as
    * zeros — the shape chart layers and downstream window math expect
    * (a missing bucket silently breaks moving averages; an explicit
    * zero doesn't). `unit` ∈ hour/day/week. Null-timestamp rows are
    * dropped explicitly; a null GROUP is a real group — its cells carry
    * their true counts through the null-safe join.
    *
    * Scale shape: the spine is one `sequence()` array on the 1-row
    * bounds aggregate — its length is the bucket count, which is
    * bounded by the OUTPUT size, not the event count; groups come off
    * the aggregated cells (output-bounded), not a second event-stream
    * scan; the cell aggregate is one map-side-combined shuffle and the
    * spine×groups grid left-joins it on (bucket, group).
    */
  def resample(events: DataFrame, tsCol: String, groupCol: String,
      valueCol: String, unit: String): DataFrame = {
    require(Set("hour", "day", "week").contains(unit),
      s"resample: unit must be hour/day/week, got $unit")
    // null timestamps have no bucket: dropped EXPLICITLY here rather than
    // silently zeroing their groups downstream
    val ev = events.where(col(tsCol).isNotNull)
    val bounds = ev.agg(
      date_trunc(unit, min(col(tsCol))).as("graft_lo"),
      date_trunc(unit, max(col(tsCol))).as("graft_hi"))
    val spine = bounds.select(explode(sequence(col("graft_lo"),
      col("graft_hi"), expr(s"interval 1 $unit"))).as("graft_bucket"))
    val cells = ev
      .groupBy(date_trunc(unit, col(tsCol)).as("graft_cb"),
        col(groupCol).as("graft_cg"))
      .agg(count(lit(1)).as("graft_n"), sum(col(valueCol)).as("graft_sum"))
    // groups read off the aggregated cells (output-bounded), not a second
    // full scan of the event stream; the join is null-SAFE on the group
    // key so a null group's cells carry its real counts
    val groups = cells.select(col("graft_cg").as(groupCol)).distinct()
    spine.crossJoin(groups)
      .join(cells, col("graft_bucket") === col("graft_cb") &&
        col(groupCol) <=> col("graft_cg"), "left")
      .select(col(groupCol),
        date_format(col("graft_bucket"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        coalesce(col("graft_n"), lit(0L)).as("n_events"),
        round(coalesce(col("graft_sum"), lit(0.0)), 2).as("sum_value"))
  }
}
