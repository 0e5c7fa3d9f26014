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
