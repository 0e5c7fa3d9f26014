package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel requires ordered progression, not mere presence") {
    val sp = spark; import sp.implicits._
    val events = Seq(
      // user 1 converts all three in order
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 11:00:00"), "b"),
      (1L, ts("2024-01-01 12:00:00"), "c"),
      // user 2 has b BEFORE a and never after → stops at a
      (2L, ts("2024-01-01 09:00:00"), "b"),
      (2L, ts("2024-01-01 10:00:00"), "a"),
      // user 3 skips b: the later c does not count
      (3L, ts("2024-01-01 10:00:00"), "a"),
      (3L, ts("2024-01-01 11:00:00"), "c"),
      // user 4 never enters the funnel
      (4L, ts("2024-01-01 10:00:00"), "x")
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnel(events, "ts", "user_id", "event_type",
        Seq("a", "b", "c"))
      .collect().map(r => r.getAs[Long]("step") ->
        (r.getAs[String]("step_name"), r.getAs[Long]("n_users"),
          r.getAs[Double]("conversion"))).toMap
    assert(out(1L) == (("a", 3L, 1.0)))
    assert(out(2L) == (("b", 1L, BigDecimal(1.0 / 3.0).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(out(3L) == (("c", 1L, out(2L)._3)))
  }

  test("funnel: equal timestamps progress in step order; zero-user steps report 0") {
    val sp = spark; import sp.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 10:00:00"), "b") // same instant as a → still counts
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnel(events, "ts", "user_id", "event_type",
        Seq("a", "b", "c"))
      .collect().map(r => r.getAs[Long]("step") ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("conversion"))).toMap
    assert(out(1L) == ((1L, 1.0)))
    assert(out(2L) == ((1L, 1.0)))
    assert(out(3L) == ((0L, 0.0))) // row present, not absent
  }

  test("funnel: null-timestamp events are dropped, not folded first") {
    val sp = spark; import sp.implicits._
    // Spark's array_sort puts null-ts structs FIRST — an unguarded fold
    // would advance user 1 to step a on the null event; SQL engines'
    // min/>= recurrence ignores nulls. The filter pins one semantics.
    val events = Seq(
      (1L, Option.empty[java.sql.Timestamp], "a"),
      (1L, Some(ts("2024-01-01 10:00:00")), "b"),
      (2L, Some(ts("2024-01-01 09:00:00")), "a")
    ).toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnel(events, "ts", "user_id", "event_type",
        Seq("a", "b"))
      .collect().map(r => r.getAs[Long]("step") ->
        r.getAs[Long]("n_users")).toMap
    assert(out(1L) == 1L) // only user 2's real a-event counts
    assert(out(2L) == 0L) // user 1 never reached a, so b cannot count
  }

  test("cohortRetention: offset 0 is 1.0, churn and return count correctly") {
    val sp = spark; import sp.implicits._
    // weeks of 2024-01: Mon Jan 1, Mon Jan 8, Mon Jan 15
    val events = Seq(
      (1L, ts("2024-01-02 10:00:00")), // cohort w0, active w0, w1
      (1L, ts("2024-01-09 10:00:00")),
      (2L, ts("2024-01-03 10:00:00")), // cohort w0, active w0 only... then w2
      (2L, ts("2024-01-16 10:00:00")),
      (3L, ts("2024-01-10 10:00:00"))  // cohort w1, active w1 only
    ).toDF("user_id", "ts")
    val out = EventAnalytics.cohortRetention(events, "ts", "user_id")
      .collect().map(r => (r.getAs[String]("cohort_week"),
        r.getAs[Long]("week_offset")) ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("retention"))).toMap
    assert(out(("2024-01-01", 0L)) == ((2L, 1.0)))
    assert(out(("2024-01-01", 1L)) == ((1L, 0.5)))
    assert(out(("2024-01-01", 2L)) == ((1L, 0.5)))
    assert(out(("2024-01-08", 0L)) == ((1L, 1.0)))
    assert(!out.contains(("2024-01-08", 1L)))
  }

  test("resample fills gaps with explicit zero cells across the full span") {
    val sp = spark; import sp.implicits._
    // group a active on day 1 and day 4 (days 2, 3 are gaps); group b day 2
    val events = Seq(
      (ts("2024-01-01 10:00:00"), "a", 1.5),
      (ts("2024-01-04 10:00:00"), "a", 2.5),
      (ts("2024-01-02 10:00:00"), "b", 4.0)
    ).toDF("ts", "grp", "value")
    val out = EventAnalytics.resample(events, "ts", "grp", "value", "day")
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[String]("bucket")) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toMap
    assert(out.size == 8) // 4 days x 2 groups, every cell present
    assert(out(("a", "2024-01-01 00:00:00")) == ((1L, 1.5)))
    assert(out(("a", "2024-01-02 00:00:00")) == ((0L, 0.0)))
    assert(out(("a", "2024-01-03 00:00:00")) == ((0L, 0.0)))
    assert(out(("b", "2024-01-02 00:00:00")) == ((1L, 4.0)))
    assert(out(("b", "2024-01-04 00:00:00")) == ((0L, 0.0)))
  }

  test("histogram reports every bin, clamps the max value, handles constants") {
    val sp = spark; import sp.implicits._
    val gf = graft.GraftFrame(
      (Seq(0.0, 1.0, 2.5, 10.0) ++ Seq.fill(4)(5.0)).toDF("v"), "t")
    val out = gf.histogram("v", buckets = 4)
      .collect().map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Double]("bucket_lo"), r.getAs[Double]("bucket_hi"),
          r.getAs[Long]("n"))).toMap
    assert(out.size == 4)
    assert(out(0L) == ((0.0, 2.5, 2L)))  // 0.0, 1.0
    assert(out(1L) == ((2.5, 5.0, 1L)))  // 2.5
    assert(out(2L) == ((5.0, 7.5, 4L)))  // the 5.0s land in their own bin
    assert(out(3L) == ((7.5, 10.0, 1L))) // max clamps into the last bin
    val const = graft.GraftFrame(Seq(3.0, 3.0).toDF("v"), "t2")
      .histogram("v", buckets = 3).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n")).toMap
    assert(const(0L) == 2L && const(1L) == 0L && const(2L) == 0L)
  }

  test("modeBy picks the most frequent value with binary ties, skipping nulls") {
    val sp = spark; import sp.implicits._
    val gf = graft.GraftFrame(Seq(
      ("u1", "b"), ("u1", "b"), ("u1", "a"),        // clear winner b
      ("u2", "z"), ("u2", "a"),                     // tie → binary-smaller a
      ("u3", null), ("u3", null), ("u3", "x")       // nulls never win
    ).toDF("u", "v"), "t")
    val out = gf.modeBy(Seq("u"), "v")
      .collect().map(r => r.getAs[String]("u") ->
        (r.getAs[String]("mode_value"), r.getAs[Long]("mode_count"))).toMap
    assert(out("u1") == (("b", 2L)))
    assert(out("u2") == (("a", 1L)))
    assert(out("u3") == (("x", 1L)))
  }

  test("percentilesBy interpolates exactly per group in long format") {
    val sp = spark; import sp.implicits._
    val gf = graft.GraftFrame(
      (Seq.tabulate(5)(i => ("a", (i + 1).toDouble)) ++
        Seq(("b", 10.0), ("b", 20.0))).toDF("grp", "v"), "t")
    val out = gf.percentilesBy(Seq("grp"), Seq("v"), Seq(0.5, 0.75))
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Double]("p")) ->
        r.getAs[Double]("value")).toMap
    assert(out(("a", 0.5)) == 3.0)  // median of 1..5
    assert(out(("a", 0.75)) == 4.0) // rank 0.75*(5-1)=3 → exact element
    assert(out(("b", 0.5)) == 15.0) // interpolated midpoint
    assert(out(("b", 0.75)) == 17.5)
    assert(out.size == 4)
  }

  test("cohortRetention: multiple events in one week count the user once") {
    val sp = spark; import sp.implicits._
    val events = Seq(
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-04 10:00:00")),
      (1L, ts("2024-01-06 10:00:00"))
    ).toDF("user_id", "ts")
    val out = EventAnalytics.cohortRetention(events, "ts", "user_id").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_users") == 1L)
  }
}
