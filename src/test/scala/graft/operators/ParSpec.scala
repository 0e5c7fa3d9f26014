package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The scan-parallelism guard behind the round-20 fan-out optimization:
  * it must FIRE on an under-parallel file scan (that is the whole
  * point), NO-OP on already-parallel or non-scan inputs (at 100-TB
  * scale it must never insert an exchange), be idempotent under
  * operator composition, and never change results.
  */
class ParSpec extends SparkSpec {

  private def tmpParquet(rows: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_par_spec").toString
    spark.range(rows).select(col("id"),
      concat(lit("doc "), col("id")).as("text"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("fanOut fires on a small single-split scan") {
    val dir = tmpParquet(1000)
    val df = spark.read.parquet(dir)
    val fanned = Par.fanOut(df)
    // 4-core test session: the tiny single-file scan must widen to
    // defaultParallelism partitions
    assert(fanned.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // and the values are exactly the input's
    assert(rowsOf(fanned) == rowsOf(df))
  }

  test("fanOut is idempotent (no second exchange on a fanned plan)") {
    val dir = tmpParquet(1000)
    val df = Par.fanOut(spark.read.parquet(dir))
    val again = Par.fanOut(df.select(col("id"), col("text")))
    import org.apache.spark.sql.catalyst.plans.logical.Repartition
    val reparts = again.queryExecution.analyzed.collect {
      case r: Repartition => r
    }
    assert(reparts.size == 1, s"expected exactly one Repartition, got $reparts")
  }

  test("fanOut no-ops on non-scan inputs (checkpointed / in-memory)") {
    val local = spark.range(10).select(col("id")).localCheckpoint(true)
    assert(Par.fanOut(local) eq local)
    val mem = spark.createDataFrame(Seq((1, "a"), (2, "b"))).toDF("id", "s")
    assert(Par.fanOut(mem) eq mem)
  }

  test("fanOut preserves operator results (brute-force top-k)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_par_vec").toString
    spark.range(200).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => sin(col("id") * (i + 1)).cast("double")).as("embedding"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val emb = spark.read.parquet(dir)
    // the operator path (fans out internally) vs a pre-materialized
    // single-partition input the guard cannot touch (non-scan leaf)
    val fanned = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 3),
      "embedding", "vec_id", k = 5)
    val pinned = Similarity.bruteForceTopK(emb.localCheckpoint(true),
      emb.where(col("vec_id") < 3), "embedding", "vec_id", k = 5)
    assert(rowsOf(fanned) == rowsOf(pinned))
  }
}
