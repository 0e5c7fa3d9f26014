package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Dev tool: stage-by-stage timing of the Naive Bayes scoring pipeline at
  * two scales, to localize the superlinear term the sf1.0 grid flagged
  * (q_classify_nb ratio 6.13 at 10x data — round-11 verdict item 1).
  */
object NbDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def profile(dir: String): Unit = {
      println(s"\n===== $dir =====")
      val docs = graft.sources.Loaders.loadParquet(
        spark, s"$dir/documents.parquet", "documents").df
      def tm[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"  $label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
      }
      val train = docs
      def toks(df: DataFrame, extra: org.apache.spark.sql.Column*): DataFrame =
        df.select(extra :+ explode(split(T.normalizeText(col("text")), " ")).as("token"): _*)
          .where(length(col("token")) > 0)

      tm("train.count")(train.count())
      val trainToks = toks(train, col("lang").as("graft_cls"))
      tm("trainToks count")(trainToks.count())
      val tokenClass = tm("tokenClass build+pin") {
        trainToks.groupBy(col("graft_cls"), col("token"))
          .agg(count(lit(1)).cast("double").as("graft_tc"))
          .localCheckpoint(true)
      }
      println(s"  tokenClass rows: ${tm("tokenClass count")(tokenClass.count())}")
      tm("vocab distinct count")(
        tokenClass.select(col("token")).distinct().count())
      val docToks = toks(docs, col("doc_id"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).cast("double").as("graft_n"))
      println(s"  docToks rows: ${tm("docToks agg count")(docToks.count())}")
      val evidence = docToks.join(tokenClass, Seq("token"))
        .groupBy(col("doc_id"), col("graft_cls"))
        .agg(sum(col("graft_n") * log(col("graft_tc") + lit(1.0))).as("graft_s1"))
      println(s"  evidence rows: ${tm("evidence join+agg count")(evidence.count())}")
      val full = graft.operators.Classify.nbPredict(docs, docs, "text", "doc_id", "lang")
      tm("FULL nbPredict (cold)")(full.foreach(_ => ()))
      tm("FULL nbPredict (warm)") {
        graft.operators.Classify.nbPredict(docs, docs, "text", "doc_id", "lang")
          .foreach(_ => ())
      }
    }
    profile("/root/testdata/sf0.1")
    profile("/root/repo/target/sf1.0")
    spark.stop()
  }
}
