package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone driver for the streaming-throughput drill (dev tool):
  * replays the sf events table through the real transformWithState +
  * RocksDB micro-batch path (see
  * [[graft.streaming.EventStreams.streamThroughput]]) and prints rows/s.
  * Args: sfDir (default sf0.1), numShards (default 8).
  */
object StreamBenchDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shards = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.sources.Loaders
      .loadParquet(spark, s"$sfDir/events.parquet", "events").df
    val (in, out, sec) = graft.streaming.EventStreams.streamThroughput(
      spark, ev, "target/tmp/stream_bench_dbg", numShards = shards)
    println(f"stream_throughput: $in rows in $sec%.2f s = ${in / sec}%.0f rows/s " +
      f"($out update rows, $shards micro-batches)")
    spark.stop()
  }
}
