package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class TopKAggSpec extends SparkSpec {

  private def randomFrame(seed: Long, rows: Int, groups: Int, ties: Boolean) = {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until rows).map { i =>
      val s = if (ties) (rnd.nextInt(20) / 10.0) else rnd.nextDouble()
      (rnd.nextInt(groups).toLong, i.toLong, s)
    }.toDF("query_id", "corpus_id", "score").repartition(7)
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int, desc: Boolean) =
    df.groupBy(col("query_id"))
      .agg(TopKAgg.topKPairs(col("score"), col("corpus_id"), k, desc).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("p", "e")))
      .select(col("query_id"), col("e.id").as("corpus_id"),
        col("e.score").as("score"), (col("p") + 1).as("rank"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int, desc: Boolean) = {
    val order = if (desc) Seq(col("score").desc, col("corpus_id").asc)
      else Seq(col("score").asc, col("corpus_id").asc)
    df.withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id")).orderBy(order: _*)))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("score"), col("rank").cast("int"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getAs[Number](3).intValue())).toSet

  test("top-k aggregate equals window ranking on random data, both directions") {
    for (seed <- Seq(1L, 2L, 3L); desc <- Seq(true, false)) {
      val df = randomFrame(seed, rows = 2000, groups = 17, ties = false)
      assert(rows(viaAgg(df, 10, desc)) == rows(viaWindow(df, 10, desc)),
        s"seed=$seed desc=$desc")
    }
  }

  test("top-k aggregate breaks score ties on the smaller id, like the window") {
    val df = randomFrame(5L, rows = 3000, groups = 5, ties = true)
    for (desc <- Seq(true, false))
      assert(rows(viaAgg(df, 25, desc)) == rows(viaWindow(df, 25, desc)))
  }

  test("groups smaller than k return all rows ranked") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (2L, 12L, 0.1))
      .toDF("query_id", "corpus_id", "score")
    val out = viaAgg(df, 10, desc = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](3).intValue()))
    assert(out.toSet == Set((1L, 11L, 1), (1L, 10L, 2), (2L, 12L, 1)))
  }

  test("partial aggregation appears in the plan (map-side combine)") {
    val df = randomFrame(9L, rows = 500, groups = 3, ties = false)
    val plan = viaAgg(df, 5, desc = true).queryExecution.executedPlan.toString
    // ObjectHashAggregate with a partial_ stage means candidates collapse
    // map-side before the exchange
    assert(plan.contains("partial_top_k_pairs"), s"no partial agg stage:\n$plan")
  }
}
