package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sources.DeltaLog

/** Measures what the distributed mutation fold buys on a BIG log: a
  * synthetic snapshot with >=10^5 add actions (realistic per-file
  * min/max stats), a selective predicate, and the two routes compared —
  *
  *   - driver route (`activeAddsAsOf`): materializes EVERY add's
  *     metadata on the driver before pruning — the O(active files)
  *     heap the r16 verdict flagged for the mutation/maintenance paths;
  *   - distributed route (`activeAddsWhere`, forced via
  *     snapshotDriverMaxBytes=0): fold + stats pruning run in executors,
  *     the driver collects ONLY the surviving candidate entries.
  *
  * Reported: add count, surviving count, retained driver bytes per route
  * (sum of each materialized entry's rel + stats + partitionValues
  * payload), the retained-bytes ratio, and wall times. The synthetic
  * table has no data files on purpose — the fold and the skipping kernel
  * never open one, which is the point being measured.
  *
  * One JSON line on stdout, mirrored to
  * target/mutation_fold_scale_latest.json.
  *
  *   MutationFoldScaleCheck [nFiles]   (default 120000)
  */
object MutationFoldScaleCheck {
  def main(args: Array[String]): Unit = {
    val nFiles = if (args.nonEmpty) args(0).toInt else 120000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val p = "target/tmp/mutfold_scale"
    val pp = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(pp))
      java.nio.file.Files.walk(pp)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    val log = pp.resolve("_delta_log")
    java.nio.file.Files.createDirectories(log)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType)))
    val schemaJson = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val w = java.nio.file.Files.newBufferedWriter(log.resolve("0" * 20 + ".json"))
    try {
      w.write("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""")
      w.write("\n")
      w.write(s"""{"metaData":{"id":"mutfold-scale","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{}}}""")
      w.write("\n")
      var i = 0
      while (i < nFiles) {
        val lo = i * 100L; val hi = lo + 99L
        val stats =
          s"""{\\"numRecords\\":100,\\"minValues\\":{\\"id\\":$lo},\\"maxValues\\":{\\"id\\":$hi},\\"nullCount\\":{\\"id\\":0}}"""
        w.write(s"""{"add":{"path":"part-$i-synthetic.parquet","partitionValues":{},"size":4096,"modificationTime":0,"dataChange":true,"stats":"$stats"}}""")
        w.write("\n")
        i += 1
      }
    } finally w.close()

    // predicate covering exactly 4 of the nFiles disjoint id ranges
    val pred = "id >= 4200 AND id < 4600"
    def entryBytes(es: Seq[graft.sources.DeltaStats.AddEntry]): Long =
      es.iterator.map(e => e.rel.length.toLong +
        e.stats.map(_.length.toLong).getOrElse(0L) +
        e.partitionValues.iterator
          .map(kv => kv._1.length.toLong +
            Option(kv._2).map(_.length.toLong).getOrElse(0L)).sum).sum

    // min-of-2 per route: the first distributed job pays session/codegen
    // warmup that a real workload amortizes
    def minMs(body: => Unit): Double = (1 to 2).map { _ =>
      val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e6
    }.min
    // distributed route: fold + prune in executors, survivors only
    val kept = DeltaLog.activeAddsWhere(spark, p, Some(pred),
      snapshotDriverMaxBytes = 0L)
    val distMs = minMs(DeltaLog.activeAddsWhere(spark, p, Some(pred),
      snapshotDriverMaxBytes = 0L))
    val keptBytes = entryBytes(kept)
    // driver route: the full snapshot materializes before any pruning
    val all = DeltaLog.activeAddsAsOf(spark, p, None)
    val driverMs = minMs(DeltaLog.activeAddsAsOf(spark, p, None))
    val allBytes = entryBytes(all)
    // counts-only diagnostic goes distributed too
    val (skipKept, skipTotal) = DeltaLog.skippingStats(spark, p, pred,
      snapshotDriverMaxBytes = 0L)

    val json =
      s"""{"metric":"mutation_fold_scale","adds":${all.size},""" +
        s""""kept":${kept.size},"skipping":[$skipKept,$skipTotal],""" +
        s""""driver_route_bytes":$allBytes,"dist_route_bytes":$keptBytes,""" +
        s""""retained_ratio":${"%.6f".format(keptBytes.toDouble / math.max(1L, allBytes))},""" +
        s""""driver_route_ms":${"%.1f".format(driverMs)},""" +
        s""""dist_route_ms":${"%.1f".format(distMs)}}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/mutation_fold_scale_latest.json"), json)
    spark.stop()
  }
}
