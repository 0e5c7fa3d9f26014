package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.DeltaLog

/** Measures what a DV-bearing table's checkpoint actually buys: snapshot
  * REPLAY latency (activeFilesAsOf — pure log fold, no data scan) on a
  * table with K DV-delete commits, before the checkpoint (parse K commit
  * files) vs after checkpoint+cleanupLog (read 1 checkpoint parquet).
  * Two K decades pin the asymptote: pre-checkpoint replay grows with the
  * commit count, post-checkpoint replay is flat in it — the
  * bounded-replay claim behind r14's DV-aware checkpointing (before r14,
  * DV tables could not checkpoint at all, so their replay was
  * O(versions) forever). One JSON line on stdout, mirrored to
  * target/checkpoint_scale_latest.json.
  *
  *   CheckpointScaleCheck 60 240
  */
object CheckpointScaleCheck {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(60, 240)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def medianMs(reps: Int)(body: => Unit): Double = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }.sorted
      times(times.length / 2)
    }

    case class Row(k: Int, commits: Long, replayLogMs: Double,
        replayCpMs: Double, rows: Long)
    val out = ks.map { k =>
      val p = s"target/tmp/cp_scale_dv_$k"
      val base = spark.range(4000).select(col("id"),
        (col("id") % 7).as("grp"), (col("id") * 1.5).as("v"))
        .repartition(4)
      DeltaLog.writeWithDeletionVectors(base, p, "id % 997 = 0")
      // K single-row DV deletes, one commit each, auto-checkpoint off
      (1 to k).foreach(i => DeltaLog.deleteWhereViaDv(spark, p,
        s"id = ${i * 13}", checkpointInterval = 0))
      // replay cost with K+1 raw commits (median of 5 — driver-side
      // Jackson parse, no data scan)
      val logMs = medianMs(5)(DeltaLog.activeFilesAsOf(spark, p, None))
      DeltaLog.writeCheckpoint(spark, p, k.toLong)
      DeltaLog.cleanupLog(spark, p)
      val cpMs = medianMs(5)(DeltaLog.activeFilesAsOf(spark, p, None))
      val rows = DeltaLog.read(spark, p).count()
      Row(k, k + 1L, logMs, cpMs, rows)
    }
    val logGrowth = out.last.replayLogMs / out.head.replayLogMs
    val cpGrowth = out.last.replayCpMs / out.head.replayCpMs
    val commitGrowth = out.last.commits.toDouble / out.head.commits
    val rowsJson = out.map { r =>
      f"""{"k":${r.k},"commits":${r.commits},""" +
        f""""replay_log_ms":${r.replayLogMs}%.1f,""" +
        f""""replay_checkpoint_ms":${r.replayCpMs}%.1f,""" +
        f""""rows_after":${r.rows}}"""
    }.mkString("[", ",", "]")
    val line =
      f"""{"metric":"checkpoint_scale","commit_growth":$commitGrowth%.2f,""" +
        f""""replay_log_growth":$logGrowth%.2f,""" +
        f""""replay_checkpoint_growth":$cpGrowth%.2f,"rows":$rowsJson}"""
    println(line)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/checkpoint_scale_latest.json"), line)
    spark.stop()
  }
}
