package graft.operators

import java.sql.Timestamp

import graft.TestSession
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Random-event invariants for the funnel and cohort operators, checked
  * against independent in-memory reference implementations (a second
  * oracle on a different code path from both Spark and DuckDB).
  */
object EventAnalyticsProps extends Properties("EventAnalytics") {

  private lazy val spark = TestSession.spark

  private val steps = Seq("a", "b", "c")

  // (user, second-offset, type): ties in ts are likely by construction
  private val eventGen: Gen[(Long, Int, String)] = for {
    u <- Gen.chooseNum(1L, 4L)
    t <- Gen.chooseNum(0, 9)
    ty <- Gen.oneOf("a", "b", "c", "x")
  } yield (u, t, ty)

  private val eventsGen: Gen[List[(Long, Int, String)]] =
    Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, eventGen))

  /** The documented fold: walk (ts, stepIdx) ascending, advance on the
    * next expected step (equal timestamps progress in step order).
    */
  private def referenceReached(evts: Seq[(Int, String)]): Int = {
    val idx = steps.zipWithIndex.toMap
    val sorted = evts.collect { case (t, ty) if idx.contains(ty) => (t, idx(ty)) }
      .sorted
    sorted.foldLeft(0) { case (acc, (_, i)) => if (i == acc) acc + 1 else acc }
  }

  property("funnel counts match an in-memory fold on random event sets") =
    forAll(eventsGen) { evts =>
      val sp = spark; import sp.implicits._
      val df = evts.map { case (u, t, ty) =>
        (u, new Timestamp(1700000000000L + t * 1000L), ty)
      }.toDF("user_id", "ts", "event_type")
      val out = EventAnalytics.funnel(df, "ts", "user_id", "event_type", steps)
        .collect().map(r => r.getAs[Long]("step") -> r.getAs[Long]("n_users"))
        .toMap
      val reached = evts.groupBy(_._1).values
        .map(es => referenceReached(es.map(e => (e._2, e._3)))).toSeq
      steps.indices.forall { i =>
        out(i + 1L) == reached.count(_ > i).toLong
      }
    }

  property("cohortRetention matches in-memory cohort math") =
    forAll(Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, for {
      u <- Gen.chooseNum(1L, 4L)
      w <- Gen.chooseNum(0, 3) // week index
    } yield (u, w)))) { activity =>
      val sp = spark; import sp.implicits._
      // Mondays: 2024-01-01 + 7w days, noon (no TZ edge)
      val df = activity.map { case (u, w) =>
        (u, Timestamp.valueOf(s"2024-01-${1 + 7 * w} 12:00:00"))
      }.toDF("user_id", "ts")
      val out = EventAnalytics.cohortRetention(df, "ts", "user_id")
        .collect().map(r => (r.getAs[String]("cohort_week"),
          r.getAs[Long]("week_offset")) ->
          (r.getAs[Long]("n_users"), r.getAs[Double]("retention"))).toMap
      val byUser = activity.groupBy(_._1).view.mapValues(_.map(_._2).distinct)
      val cohortOf = byUser.mapValues(_.min).toMap
      val expected = byUser.toSeq.flatMap { case (u, ws) =>
        ws.map(w => (cohortOf(u), w - cohortOf(u)))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      def key(cw: Int, off: Int) = (f"2024-01-${1 + 7 * cw}%02d", off.toLong)
      // exact row-set equality AND the retention ratio itself, not just
      // a subset check on counts
      out.size == expected.size && expected.forall { case ((cw, off), n) =>
        val denom = expected((cw, 0)).toDouble
        out.get(key(cw, off)).contains((n,
          BigDecimal(n / denom).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }
}
