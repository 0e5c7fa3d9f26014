package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}
import graft.plans.HashExpressions

/** Stage-by-stage timing for the MinHash LSH pipeline (dev tool). */
object MinhashDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("shingles only") {
      df.select(T.wordShingles(col("text"), 3).as("sh"))
        .select(sum(size(col("sh")))).collect()
    }
    time("sketch 128") {
      df.select(HashExpressions.minhashSketch(
        T.wordShingles(col("text"), 3), 128).as("sk"))
        .select(sum(size(col("sk")))).collect()
    }
    val numHashes = 128; val bands = 32; val r = numHashes / bands
    val banded = df.select(col("doc_id").as("id"),
      HashExpressions.minhashSketch(T.wordShingles(col("text"), 3), numHashes).as("sketch"))
      .select(col("id"), explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), xxhash64(concat_ws(",",
          transform(slice(col("sketch"), b * r + 1, lit(r)), _.cast("string")))).as("bh"))))
        .as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bh"))
    time("banded count")(println(banded.count()))
    val cand = banded.alias("a").join(banded.alias("b"),
      col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    time("raw candidates")(println(cand.count()))
    time("dedup candidates")(println(cand.dropDuplicates("id_a", "id_b").count()))
    time("full pipeline") {
      println(graft.operators.Dedup.minhashLshPairs(df, "text", "doc_id",
        128, 32, 3, 0.3).count())
    }
    spark.stop()
  }
}
