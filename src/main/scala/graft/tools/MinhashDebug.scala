package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}
import graft.plans.HashExpressions

/** Stage-by-stage timing for the MinHash LSH pipeline (dev tool) — the
  * graded q_dedup_minhash shape (128 hashes / 32 bands / t=0.85) split
  * into sketch, banding, candidate join, and verify costs, with the
  * hot-bucket cap on and off. Median-of-3 per stage, sf via arg 1.
  */
object MinhashDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    df.foreach(_ => ()) // warm the scan
    def time[A](label: String)(f: => A): Unit = {
      val runs = Seq.fill(3) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: ${runs.sorted.apply(1)}%.2f s (runs ${runs.map(r => f"$r%.2f").mkString(", ")})")
    }
    val numHashes = 128; val bands = 32
    time("shingles only") {
      df.select(T.wordShingles(col("text"), 3).as("sh"))
        .select(sum(size(col("sh")))).collect()
    }
    time("sketch 128") {
      df.select(HashExpressions.minhashSketch(
        T.wordShingles(col("text"), 3), numHashes).as("sk"))
        .select(sum(size(col("sk")))).collect()
    }
    val banded = graft.operators.Dedup.minhashBandIndex(
      df, "text", "doc_id", numHashes, bands, 3)
    time("banded count")(banded.count())
    val cand = banded.alias("a").join(banded.alias("b"),
      col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    time("raw candidates")(cand.count())
    time("dedup candidates")(cand.dropDuplicates("id_a", "id_b").count())
    time("full pipeline capped (default)") {
      graft.operators.Dedup.minhashLshPairs(df, "text", "doc_id",
        numHashes, bands, 3, 0.85).count()
    }
    time("full pipeline uncapped") {
      graft.operators.Dedup.minhashLshPairs(df, "text", "doc_id",
        numHashes, bands, 3, 0.85, maxBandFreq = 0L).count()
    }
    spark.stop()
  }
}
