package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit runtime-filter joins for the "100 TB fact vs small dimension"
  * regime: build a Bloom filter over the filtering side's keys once
  * (driver-merged via treeAggregate, broadcast to every executor) and
  * discard provably-non-matching fact rows MAP-SIDE, so only
  * (match-rate + fpp) of the big side ever shuffles into the exact join.
  *
  * The result is EXACT at any fpp: the Bloom pass only removes rows whose
  * key is provably absent; false-positive survivors still go through the
  * exact semi/anti join. For the anti join the Bloom verdict is even
  * final — `mightContain = false` rows ARE the answer for their slice —
  * so only possible-matches join at all.
  *
  * Spark's own runtime row-group filtering covers equi-joins the planner
  * can see; this operator makes the pattern explicit for multi-step
  * pipelines where the small side is computed far from the big scan
  * (e.g. "ids that failed QA yesterday" against today's full crawl).
  * As in [[Dedup.incrementalSurvivors]], the probe is Spark's own
  * codegen'd `BloomFilterMightContain` expression (via
  * [[graft.plans.SketchProbe]]) — no UDF on the big side's row path, and
  * never on the exactness path.
  */
object RuntimeFilters {

  private def keyed(keyCol: String): Column =
    xxhash64(lit(11L), col(keyCol).cast("string"))

  /** The probe COLUMN over `bigKey`, built once: each call to
    * bloomMightContain re-serializes the filter into a fresh binary
    * literal, and at the sizes this operator targets (~1.2 MB per 10⁶
    * keys) the anti join's two branches must share one copy, not embed
    * two.
    */
  private def bloomProbe(small: DataFrame, smallKey: String, bigKey: String,
      expectedKeys: Long, fpp: Double): Column = {
    val bf = small.select(keyed(smallKey).as("graft_bh"))
      .stat.bloomFilter("graft_bh", math.max(expectedKeys, 1L), fpp)
    graft.plans.SketchProbe.bloomMightContain(bf, keyed(bigKey))
  }

  /** Rows of `big` whose `bigKey` occurs in `small.smallKey` (LEFT SEMI),
    * Bloom-prefiltered. `expectedKeys` sizes the filter (overestimating
    * is cheap: ~1.2 bytes/key at fpp 0.01).
    */
  def bloomSemiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val mightContain = bloomProbe(small, smallKey, bigKey, expectedKeys, fpp)
    big.where(mightContain)
      .join(small.select(col(smallKey).as(bigKey)).distinct(),
        Seq(bigKey), "left_semi")
  }

  /** Rows of `big` whose `bigKey` does NOT occur in `small.smallKey`
    * (LEFT ANTI). `mightContain = false` rows are provably absent and
    * bypass the join entirely; only the (match-rate + fpp) slice joins.
    */
  def bloomAntiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val mightContain = bloomProbe(small, smallKey, bigKey, expectedKeys, fpp)
    val definitelyAbsent = big.where(!mightContain)
    val maybePresent = big.where(mightContain)
      .join(small.select(col(smallKey).as(bigKey)).distinct(),
        Seq(bigKey), "left_anti")
    definitelyAbsent.unionAll(maybePresent)
  }
}
