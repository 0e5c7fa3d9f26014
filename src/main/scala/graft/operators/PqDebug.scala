package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._


/** Throwaway stage-timing probe for the PQ index queries (not part of the
  * verified surface — mirrors q_sim_ivfpq's stages with wall timers).
  */
object PqDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def stage[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pqdebug] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm
    emb.count()
    val idxPath = "/root/repo/target/tmp/pq_debug_idx"
    stage("buildIvfPqIndex") {
      Similarity.buildIvfPqIndex(emb, "embedding", "vec_id", idxPath,
        nlist = 16, trainFraction = 0.5)
    }
    val c = emb.select(col("vec_id").as("corpus_id"), col("embedding").as("cv"))
    stage("seedAndRefine x2 iters") {
      Similarity.seedAndRefine(c, 16, 2)
    }
    stage("pqTrain") {
      Similarity.pqTrain(emb, "embedding", "vec_id", m = 8, ksub = 16,
        refineIterations = 2, dim = 64, trainFraction = 0.5)
    }
    stage("assign+encode+write") {
      val cents = Similarity.seedAndRefine(c, 16, 2)
      val cb = Similarity.pqTrain(emb, "embedding", "vec_id", m = 8, ksub = 16,
        refineIterations = 2, dim = 64, trainFraction = 0.5)
      val t0 = System.nanoTime()
      Similarity.assignToLists(c, cents)
        .join(Similarity.pqEncode(emb, "embedding", "vec_id", cb), Seq("corpus_id"))
        .write.mode("overwrite").partitionBy("list_id")
        .parquet(idxPath + "_w")
      println(f"[pqdebug]   inner write: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val queries = emb.where(col("vec_id") < 5)
    val pq = stage("ivfPqTopK") {
      val r = Similarity.ivfPqTopK(idxPath, queries, "embedding", "vec_id",
        k = 10, nprobe = 8, rerank = 200)
      r.foreach(_ => ()); r
    }
    stage("bruteForceTopK") {
      Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", k = 10)
        .foreach(_ => ())
    }
    stage("secondBuild") {
      Similarity.buildIvfPqIndex(emb, "embedding", "vec_id", idxPath,
        nlist = 16, trainFraction = 0.5)
    }
    spark.stop()
  }
}
