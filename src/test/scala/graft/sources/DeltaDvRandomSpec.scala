package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Randomized hardening for the DV-native delete path: arbitrary
  * sequences of modulo predicates must keep the snapshot identical to an
  * in-memory fold of the same deletes — per-generation new-row counts
  * exact (already-deleted rows never re-count), bitmap unions exact
  * through the executor-side payload build, and the whole state
  * reconstructible from a checkpoint after the commits are cleaned.
  */
class DeltaDvRandomSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/dvrand/$name"
    val pp = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(pp))
      java.nio.file.Files.walk(pp)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    p
  }

  test("random DV delete generations match an in-memory fold") {
    val sp = spark
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      val p = freshDir(s"gen$seed")
      val n = 300L
      val src = sp.range(n).select(col("id"),
        (col("id") % 7).as("grp"), (col("id") * 1.5).as("v"))
        .repartition(4)
      DeltaLog.writeWithDeletionVectors(src, p, "id % 3 = 0",
        inlineFirst = seed % 2 == 0)
      var expected: Set[Long] = (0L until n).filter(_ % 3 != 0).toSet
      var committed = 0L // deletes matching nothing write no commit
      for (_ <- 1 to 4) {
        val m = 4 + rng.nextInt(5) // modulus 4..8
        val r = rng.nextInt(m)
        val newlyExpected = expected.count(id => id % m == r).toLong
        val newly = DeltaLog.deleteWhereViaDv(spark, p, s"id % $m = $r")
        assert(newly == newlyExpected,
          s"seed=$seed id%$m=$r: got $newly, want $newlyExpected")
        if (newly > 0) committed += 1
        expected = expected.filterNot(id => id % m == r)
        val back = DeltaLog.read(spark, p)
        assert(back.count() == expected.size.toLong,
          s"seed=$seed after id%$m=$r")
        // spot-check content, not just counts
        assert(back.agg(org.apache.spark.sql.functions.sum(col("id")))
          .head.getLong(0) == expected.sum, s"seed=$seed sum mismatch")
      }
      // the folded state survives checkpoint + commit cleanup
      DeltaLog.writeCheckpoint(spark, p, committed)
      DeltaLog.cleanupLog(spark, p)
      val replay = DeltaLog.read(spark, p)
      assert(replay.count() == expected.size.toLong, s"seed=$seed replay")
      assert(replay.agg(org.apache.spark.sql.functions.sum(col("id")))
        .head.getLong(0) == expected.sum, s"seed=$seed replay sum")
    }
  }
}
