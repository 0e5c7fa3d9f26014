package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Dev tool: stage volumes of the containment bounded-hot-join candidate
  * path at a given sf dir — locates where the opt-in variant's constant
  * goes (explode volume vs join fan-out vs window sort).
  */
object ContainmentDebug {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/target/sf1.0"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  -> $r"); r
    }
    val t = 0.8; val k = 3
    val posting = docs.select(col("doc_id").as("id"),
      explode(array_distinct(T.wordShingles(col("text"), 3))).as("g"))
      .localCheckpoint(true)
    tm("posting rows")(posting.count())
    val sizes = posting.groupBy("id").agg(count(lit(1)).as("n"))
    val nDocs = tm("docs")(sizes.count())
    val hotDf = graft.operators.Dedup.autoMaxDocFreq(nDocs)
    println(s"  hotDf = $hotDf")
    val freq = posting.groupBy("g").agg(count(lit(1)).as("df"))
    tm("hot distinct shingles")(freq.where(col("df") > hotDf).count())
    tm("hot posting rows")(posting.join(freq.where(col("df") > hotDf), Seq("g")).count())
    import org.apache.spark.sql.expressions.Window
    val byId = Window.partitionBy(col("id"))
    val ranked = posting.join(freq, Seq("g"))
      .withColumn("rk", row_number().over(byId.orderBy(col("df"), col("g"))))
      .withColumn("nc", count(lit(1)).over(byId))
      .withColumn("plen", col("nc") - ceil(lit(t) * col("nc") - lit(1e-9)) + lit(k))
    val withN = ranked.join(sizes, Seq("id")).localCheckpoint(true)
    tm("ranked+pin rows")(withN.count())
    val pref = withN.where(col("rk") <= col("plen"))
    tm("pref rows")(pref.count())
    val hotClassed = withN.where(col("df") > hotDf)
      .withColumn("cmax",
        floor(log2((col("nc") + lit(k.toLong) - col("rk")).cast("double") / lit(t))).cast("int"))
      .where(col("cmax") >= 0)
      .select(col("id").as("fid"), col("g"), col("n").as("fn"),
        explode(sequence(lit(0), col("cmax"))).as("cls"))
    tm("hotClassed exploded rows")(hotClassed.count())
    val prefC = pref.select(col("id").as("pid"), col("g"), col("n").as("pn"),
      floor(log2(col("n"))).cast("int").as("cls"))
    val hotGs = broadcast(freq.where(col("df") > hotDf).select(col("g")))
    tm("pref-hot rows")(prefC.join(hotGs, Seq("g")).count())
    tm("hot join output rows")(
      prefC.join(hotGs, Seq("g")).join(hotClassed, Seq("g", "cls")).count())
    val coldFull = withN.where(col("df") <= hotDf)
      .select(col("id").as("fid"), col("g"), col("n").as("fn"))
    tm("cold join output rows")(prefC.join(coldFull, Seq("g")).count())
    spark.stop()
  }
}
