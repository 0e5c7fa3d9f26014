package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted plans for selected queries so the shuffle /
  * pushdown / broadcast shape can be reviewed (SURVEY's "iterate until
  * it's the plan you'd want").
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_select_filter", "q_join_3way", "q_agg_groupby", "q_dedup_minhash")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_EXEC=1: run the query first and print the FINAL
    // adaptive plan — AQE's exchange/stage reuse only materializes at
    // runtime, so the static explain under-reports plan sharing
    val exec = sys.env.get("SPARK_GRAFT_EXEC").contains("1")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      if (exec) {
        df.foreach(_ => ())
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
