package graft.operators

import graft.{GraftError, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  // left points: (id, key, t) — t as epoch-second longs for readable cases
  private def L(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("id", "k", "t")
      .select(col("id"), col("k"), timestamp_seconds(col("t")).as("t"))
  // right events: (key, t, v)
  private def R(rows: (String, Long, Double)*): DataFrame =
    rows.toDF("k", "t", "v")
      .select(col("k"), timestamp_seconds(col("t")).as("t"), col("v"))

  private def matches(df: DataFrame): Map[Long, Option[Double]] =
    df.select(col("id"), col("r_v")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap

  test("backward picks the greatest right ts <= left ts, per key") {
    val left = L((1L, "a", 100L), (2L, "a", 205L), (3L, "b", 100L), (4L, "c", 50L))
    val right = R(("a", 90L, 1.0), ("a", 200L, 2.0), ("b", 100L, 3.0), ("b", 300L, 4.0))
    val out = TemporalJoins.asofJoin(left, right, "t", "t", Seq("k"))
    assert(matches(out) === Map(
      1L -> Some(1.0),  // a@100 -> a@90
      2L -> Some(2.0),  // a@205 -> a@200
      3L -> Some(3.0),  // b@100 -> exact match included by default
      4L -> None))      // no c rows on the right: LEFT contract keeps the row
  }

  test("strict backward excludes the equal timestamp") {
    val left = L((1L, "b", 100L))
    val right = R(("b", 100L, 3.0), ("b", 40L, 9.0))
    val out = TemporalJoins.asofJoin(left, right, "t", "t", Seq("k"),
      allowExactMatches = false)
    assert(matches(out) === Map(1L -> Some(9.0)))
  }

  test("forward picks the least right ts >= left ts; strict skips equality") {
    val left = L((1L, "a", 100L), (2L, "a", 300L))
    val right = R(("a", 100L, 1.0), ("a", 250L, 2.0), ("a", 400L, 3.0))
    val incl = TemporalJoins.asofJoin(left, right, "t", "t", Seq("k"), "forward")
    assert(matches(incl) === Map(1L -> Some(1.0), 2L -> Some(3.0)))
    val strict = TemporalJoins.asofJoin(left, right, "t", "t", Seq("k"), "forward",
      allowExactMatches = false)
    assert(matches(strict) === Map(1L -> Some(2.0), 2L -> Some(3.0)))
  }

  test("nearest picks the closer side and breaks ties backward") {
    val left = L((1L, "a", 100L), (2L, "a", 210L), (3L, "a", 149L), (4L, "a", 145L))
    val right = R(("a", 90L, 1.0), ("a", 200L, 2.0))
    val out = TemporalJoins.asofJoin(left, right, "t", "t", Seq("k"), "nearest")
    assert(matches(out) === Map(
      1L -> Some(1.0),  // Δback=10 < Δfwd=100
      2L -> Some(2.0),  // only backward exists
      3L -> Some(2.0),  // Δback=59 > Δfwd=51
      4L -> Some(1.0))) // Δback=Δfwd=55: tie -> backward
  }

  test("tolerance nulls the match but keeps the left row") {
    val left = L((1L, "a", 100L), (2L, "a", 500L))
    val right = R(("a", 90L, 1.0))
    val out = TemporalJoins.asofJoin(left, right, "t", "t", Seq("k"),
      toleranceSeconds = Some(60.0))
    assert(matches(out) === Map(1L -> Some(1.0), 2L -> None))
  }

  test("equal-timestamp right duplicates resolve deterministically") {
    val left = L((1L, "a", 100L))
    val right = R(("a", 100L, 7.0), ("a", 100L, 3.0))
    val out1 = matches(TemporalJoins.asofJoin(left, right, "t", "t", Seq("k")))
    val out2 = matches(TemporalJoins.asofJoin(
      left, right.repartition(7), "t", "t", Seq("k")))
    assert(out1 === out2)
    // struct sort key: last() under ascending struct order takes the max payload
    assert(out1 === Map(1L -> Some(7.0)))
  }

  test("invalid direction, strict nearest and name collisions fail typed") {
    val left = L((1L, "a", 100L)); val right = R(("a", 90L, 1.0))
    intercept[GraftError.JoinError] {
      TemporalJoins.asofJoin(left, right, "t", "t", Seq("k"), "sideways")
    }
    intercept[GraftError.JoinError] {
      TemporalJoins.asofJoin(left, right, "t", "t", Seq("k"), "nearest",
        allowExactMatches = false)
    }
    intercept[GraftError.JoinError] {
      // right column 't' with empty prefix collides with left 't'
      TemporalJoins.asofJoin(left, right, "t", "t", Seq("k"), rightPrefix = "")
    }
  }

  test("asof plan shuffles ONCE on the by-keys (sort-merge cost envelope)") {
    val left = L((1L, "a", 100L)); val right = R(("a", 90L, 1.0))
    val out = TemporalJoins.asofJoin(left, right, "t", "t", Seq("k"))
    val physical = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(physical).length
    assert(exchanges === 1, s"expected exactly one hash exchange:\n$physical")
    assert(!physical.contains("BroadcastNestedLoopJoin"))
  }

  test("builder hooks: asofJoin/rangeJoin evaluate clauses and register the alias") {
    val left = graft.GraftFrame(L((1L, "a", 100L)), "l")
    val right = graft.GraftFrame(R(("a", 90L, 1.0)), "r")
    val out = left.asofJoin(right, "t", "t", Seq("k"), "asof_out")
    assert(out.alias == "asof_out")
    assert(matches(out.df) === Map(1L -> Some(1.0)))
    assert(spark.table("asof_out").count() == 1)
    val ivs = I(("a", 10L, 50L, 200L))
    val rj = left.rangeJoin(graft.GraftFrame(ivs, "iv"), "t", "s", "e",
      Seq("k"), "range_out", bucketWidthSeconds = 60L)
    assert(rj.df.select("id", "r_iid").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet == Set((1L, 10L)))
  }

  // ── rangeJoin ──────────────────────────────────────────────────────────

  private def I(rows: (String, Long, Long, Long)*): DataFrame =
    rows.toDF("k", "iid", "s", "e")
      .select(col("k"), col("iid"),
        timestamp_seconds(col("s")).as("s"), timestamp_seconds(col("e")).as("e"))

  test("rangeJoin matches points to covering intervals, half-open") {
    val pts = L((1L, "a", 100L), (2L, "a", 200L), (3L, "a", 250L), (4L, "b", 100L))
    val ivs = I(("a", 10L, 50L, 200L), ("a", 11L, 150L, 260L), ("b", 12L, 500L, 600L))
    val out = TemporalJoins.rangeJoin(pts, "t", ivs, "s", "e", Seq("k"),
      bucketWidthSeconds = 60L)
    val pairs = out.select("id", "r_iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // point 100 ∈ [50,200) only; 200 ∈ [150,260) only (end-exclusive);
    // 250 ∈ [150,260); b@100 matches nothing
    assert(pairs === Set((1L, 10L), (2L, 11L), (3L, 11L)))
    val incl = TemporalJoins.rangeJoin(pts, "t", ivs, "s", "e", Seq("k"),
      bucketWidthSeconds = 60L, inclusiveEnd = true)
    assert(incl.where(col("id") === 2L).count() === 2) // 200 ∈ [50,200] too
  }

  test("rangeJoin result is bucket-width invariant") {
    val pts = L((1L, "a", 100L), (2L, "a", 200L), (3L, "a", 250L), (4L, "b", 100L))
    val ivs = I(("a", 10L, 50L, 200L), ("a", 11L, 150L, 260L), ("b", 12L, 90L, 101L))
    def run(w: Long) = TemporalJoins.rangeJoin(pts, "t", ivs, "s", "e", Seq("k"),
      bucketWidthSeconds = w).select("id", "r_iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1L) === run(60L) && run(60L) === run(100000L))
  }

  test("randomized: asofJoin all three directions equal in-memory brute force") {
    val rnd = new scala.util.Random(20260812L)
    val keys = Seq("a", "b", "c")
    val leftRows = (1 to 120).map(i =>
      (i.toLong, keys(rnd.nextInt(3)), (rnd.nextInt(1000) + 1).toLong))
    val rightRows = (1 to 150).map(i =>
      (keys(rnd.nextInt(3)), (rnd.nextInt(1000) + 1).toLong, rnd.nextInt(50).toDouble))
      // unique (k, t) so the expected pick is unambiguous
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val left = L(leftRows: _*); val right = R(rightRows: _*)
    def brute(dir: String): Map[Long, Option[Double]] =
      leftRows.map { case (id, k, t) =>
        val cands = rightRows.filter(_._1 == k)
        val pick = dir match {
          case "backward" => cands.filter(_._2 <= t).sortBy(-_._2).headOption
          case "forward"  => cands.filter(_._2 >= t).sortBy(_._2).headOption
          case "nearest"  =>
            val b = cands.filter(_._2 <= t).sortBy(-_._2).headOption
            val f = cands.filter(_._2 > t).sortBy(_._2).headOption
            (b, f) match {
              case (Some(bb), Some(ff)) =>
                if (t - bb._2 <= ff._2 - t) Some(bb) else Some(ff)
              case _ => b.orElse(f)
            }
        }
        id -> pick.map(_._3)
      }.toMap
    for (dir <- Seq("backward", "forward", "nearest")) {
      val got = matches(TemporalJoins.asofJoin(left, right, "t", "t", Seq("k"), dir))
      assert(got === brute(dir), s"direction $dir diverged from brute force")
    }
  }

  test("randomized: rangeJoin equals the brute-force containment pair set") {
    val rnd = new scala.util.Random(42L)
    val keys = Seq("a", "b")
    val pts = (1 to 80).map(i =>
      (i.toLong, keys(rnd.nextInt(2)), (rnd.nextInt(500) + 1).toLong))
    val ivs = (1 to 60).map { i =>
      val s = rnd.nextInt(500).toLong + 1
      (keys(rnd.nextInt(2)), i.toLong, s, s + rnd.nextInt(100).toLong)
    }
    val expected = (for {
      (pid, pk, pt) <- pts
      (ik, iid, s, e) <- ivs
      if pk == ik && pt >= s && pt < e
    } yield (pid, iid)).toSet
    val got = TemporalJoins.rangeJoin(L(pts: _*), "t", I(ivs: _*), "s", "e",
        Seq("k"), bucketWidthSeconds = 37L)
      .select("id", "r_iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("rangeJoin raises on reversed intervals instead of dropping them") {
    val pts = L((1L, "a", 100L))
    val ivs = I(("a", 10L, 300L, 200L))
    val ex = intercept[Exception] {
      TemporalJoins.rangeJoin(pts, "t", ivs, "s", "e", Seq("k")).collect()
    }
    assert(ex.getMessage != null)
  }
}
