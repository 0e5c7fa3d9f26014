package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: row counts of named queries at one or more sf dirs — used to
  * attribute scale-sweep wall-clock ratios to answer growth vs plan
  * growth (a query whose time ratio tracks its output ratio is linear in
  * its output).
  */
object RowCount {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dirs = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names; d <- dirs) {
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, d).count()
      println(f"[rows] $n%-24s $d%-28s rows=$c%-10d ${(System.nanoTime() - t0) / 1e9}%6.1f s")
    }
    spark.stop()
  }
}
