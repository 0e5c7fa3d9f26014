package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Scan-parallelism guard for compute-heavy map stages (optimization
  * guide §2.5 "input skew" / §1.2 "fix the distributed algorithm
  * first"): a scan of one or two small splits plans one or two tasks,
  * so per-row-expensive work fused into that stage — shingling + 128
  * minhashes, 64-dim cosine distance, PQ/ADC code scans, tokenization,
  * media decode — runs on one core while the rest of the cluster
  * idles. `fanOut` round-robin-repartitions the operator's projected
  * input to the cluster's slot count BEFORE the heavy stage, but ONLY
  * when the source is a pure file scan whose estimated split count is
  * materially below the slot count. On any real multi-split table (a
  * 100-TB table is tens of thousands of splits) the guard is a no-op,
  * so it never inserts an exchange where the scan is already wide; where
  * it fires it moves the operator's (already column-pruned) input
  * exactly once — the standard repartition-after-read treatment for
  * unsplittable or small-file inputs.
  *
  * The estimate deliberately avoids touching `df.rdd` /
  * `queryExecution.toRdd`: under AQE those materialize upstream query
  * stages eagerly, which would EXECUTE part of the query at
  * plan-construction time. The analyzed logical plan's file-relation
  * sizes are available without executing anything.
  *
  * Result invariance: every call site must be partition-order
  * independent — row-wise expressions, exact (decimal/integer) or
  * min/max-style aggregates, bounded-heap top-k with total-order
  * tie-breaks. Callers summing FLOATING-POINT across rows must not fan
  * out (sum order would change in the last ulp); those sites keep their
  * scan partitioning.
  */
private[graft] object Par {

  /** Estimated scan-task count if `df`'s leaves are all file relations:
    * Σ ceil(bytes / maxPartitionBytes) per leaf. This UNDER-estimates
    * a many-small-files scan (the openCostInBytes file-packing charge
    * only ever raises the real split count), so the guard can fire on
    * an input that would have planned a few more tasks than estimated —
    * an extra exchange on a small input, never a lost fan-out on a big
    * one: bytes large enough to matter ⇒ estimate large ⇒ no-op.
    * None when any leaf is not a file scan (checkpointed / in-memory /
    * JDBC inputs are usually post-shuffle already — leave them alone).
    */
  private def estScanTasks(df: DataFrame): Option[Long] = {
    val leaves = df.queryExecution.analyzed.collectLeaves()
    val maxSplit = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    val ests = leaves.map {
      case l: LogicalRelation =>
        l.relation match {
          case fs: HadoopFsRelation =>
            Some(math.max(1L, (fs.sizeInBytes + maxSplit - 1) / maxSplit))
          case _ => None
        }
      case _ => None
    }
    if (ests.nonEmpty && ests.forall(_.isDefined)) Some(ests.flatMap(x => x).sum)
    else None
  }

  /** Fan `df` out to the cluster's slot count when it is a pure file
    * scan planning materially fewer tasks than there are slots; no-op
    * otherwise. Project to the needed columns BEFORE calling (the
    * exchange should carry the operator's input, not the whole row).
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (target <= 2) df
    else {
      import org.apache.spark.sql.catalyst.plans.logical._
      // Two no-op conditions, checked on the analyzed plan:
      //  - idempotence: operators compose (ivfTopK → seedAndRefine → …),
      //    so an input a caller already fanned out (a SHUFFLE round-robin
      //    Repartition) must not be exchanged again. A coalesce()
      //    (Repartition with shuffle=false — it NARROWS partitioning) or
      //    a keyed RepartitionByExpression is not a fan-out;
      //  - narrow-over-scan only: a frame whose plan contains any
      //    shuffle-introducing or row-regrouping node (aggregate, join,
      //    window, sort, distinct, keyed repartition) is already as wide
      //    as its shuffle made it — estScanTasks sees only the LEAVES and
      //    would under-estimate, inserting a redundant exchange (and a
      //    fan-out after a keyed repartition would destroy partitioning a
      //    caller established deliberately). Unknown node types land in
      //    the conservative branch: no exchange inserted.
      sealed trait Verdict
      object Fanned extends Verdict; object Bail extends Verdict
      object Narrow extends Verdict
      def classify(p: LogicalPlan): Verdict = p match {
        case r: Repartition if r.shuffle => Fanned
        case r: Repartition if !r.shuffle => Narrow // coalesce: transparent
        case _: Project | _: Filter | _: SubqueryAlias | _: Union |
             _: Generate | _: LocalLimit | _: GlobalLimit => Narrow
        case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
          Narrow
        case _ => Bail
      }
      val verdicts = df.queryExecution.analyzed.collect {
        case p => classify(p)
      }
      if (verdicts.contains(Fanned) || verdicts.contains(Bail)) df
      else estScanTasks(df) match {
        case Some(est) if est * 2 <= target => df.repartition(target)
        case _ => df
      }
    }
  }
}
