package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Substantiates the bounded-hot-join's "Zipfian text is the good case"
  * claim with a measurement (r12 verdict asked for numbers, not prose):
  * generates a deterministic corpus whose words follow a Zipf law —
  * the shape real text has, unlike the vocab-dense bench fixture whose
  * posting rows are 99.7 % hot — then records the hot-posting fraction
  * and wall-clock of the three containment variants (exact / capped /
  * bounded) at two corpus sizes, mirroring the committed vocab-dense
  * trio (BENCH_SF3_r12.json). One JSON line on stdout, mirrored to
  * target/zipf_containment_latest.json.
  *
  * Generation: doc d's j-th word is drawn from Zipf(s) over a V-word
  * vocabulary by inverse-CDF on a per-(d, j) murmur hash — no RNG state,
  * same corpus every run.
  */
object ZipfContainmentCheck {
  def main(args: Array[String]): Unit = {
    val nDocsSmall = if (args.length > 0) args(0).toInt else 50000
    val growFactor = if (args.length > 1) args(1).toInt else 3
    val vocab = 30000
    val wordsPerDoc = 120
    val zipfS = 1.07
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // inverse-CDF table for Zipf(s) over ranks 1..V (driver-built, ~240 KB,
    // closure-captured into the generator — same broadcast shape as the
    // bench fixture generators)
    val cum: Array[Double] = {
      val w = Array.tabulate(vocab)(r => 1.0 / math.pow(r + 1.0, zipfS))
      val total = w.sum
      val c = new Array[Double](vocab)
      var acc = 0.0
      var i = 0
      while (i < vocab) { acc += w(i) / total; c(i) = acc; i += 1 }
      c(vocab - 1) = 1.0
      c
    }
    val mkText = udf((id: Long) => {
      val sb = new StringBuilder(wordsPerDoc * 6)
      var j = 0
      while (j < wordsPerDoc) {
        val h = scala.util.hashing.MurmurHash3.stringHash(s"zipf_${id}_$j", 77)
        val u = (h & 0x7fffffff).toDouble / Int.MaxValue.toDouble
        var idx = java.util.Arrays.binarySearch(cum, u)
        if (idx < 0) idx = -idx - 1
        if (j > 0) sb.append(' ')
        sb.append('w').append(math.min(idx, vocab - 1))
        j += 1
      }
      sb.toString
    })
    def gen(n: Int, out: String): DataFrame = {
      if (!new java.io.File(out).exists()) {
        spark.range(n).select(col("id").as("doc_id"),
          mkText(col("id")).as("text"), lit("en").as("lang"),
          concat(lit("src"), col("id") % 4).as("source"),
          lit(wordsPerDoc * 6).as("n_chars"))
          .repartition(32).write.mode("overwrite").parquet(out)
      }
      spark.read.parquet(out)
    }
    import graft.functions.{TextFunctions => T}
    def hotStats(docs: DataFrame): (Long, Long, Long) = {
      val posting = docs.select(col("doc_id").as("id"),
        explode(array_distinct(T.wordShingles(col("text"), 3))).as("g"))
        .localCheckpoint(true)
      val total = posting.count()
      val nDocs = docs.count()
      val hotDf = graft.operators.Dedup.autoMaxDocFreq(nDocs)
      val freq = posting.groupBy("g").agg(count(lit(1)).as("df"))
      val hot = posting.join(freq.where(col("df") > hotDf), Seq("g")).count()
      (total, hot, hotDf)
    }
    def trio(docs: DataFrame): Map[String, (Double, Long)] = {
      def tm(f: => DataFrame): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = f.count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      Map(
        "exact" -> tm(graft.operators.Dedup.containmentPairs(
          docs, "text", "doc_id", 3, 0.8)),
        "capped" -> tm(graft.operators.Dedup.containmentPairs(
          docs, "text", "doc_id", 3, 0.8,
          maxDocFreq = graft.operators.Dedup.AdaptiveDocFreq)),
        "bounded" -> tm(graft.operators.Dedup.containmentPairs(
          docs, "text", "doc_id", 3, 0.8, boundedHotJoin = true)))
    }
    // JIT/codegen warmup on a small corpus so the measured trios compare
    // plan cost, not first-run compilation (the unwarmed first run showed
    // exact "speeding up" 0.84x at 3x data)
    trio(gen(5000, "target/zipf_5000/documents.parquet")): Unit
    val results = Seq(nDocsSmall, nDocsSmall * growFactor).map { n =>
      val docs = gen(n, s"target/zipf_$n/documents.parquet")
      val (total, hot, hotDf) = hotStats(docs)
      val t = trio(docs)
      println(f"[zipf] n=$n posting=$total hot=$hot (${100.0 * hot / total}%.2f%%) hotDf=$hotDf " +
        t.map { case (k, (s, r)) => f"$k=$s%.2fs/$r rows" }.mkString(" "))
      (n, total, hot, hotDf, t)
    }
    val rowsJson = results.map { case (n, total, hot, hotDf, t) =>
      f"""{"n_docs":$n,"posting_rows":$total,"hot_posting_rows":$hot,""" +
        f""""hot_fraction":${hot.toDouble / total}%.4f,"hot_df":$hotDf,""" +
        t.map { case (k, (s, r)) =>
          f""""${k}_sec":$s%.2f,"${k}_rows":$r""" }.mkString(",") + "}"
    }.mkString("[", ",", "]")
    def ratio(k: String): Double = {
      val a = results.head._5(k)._1; val b = results.last._5(k)._1
      if (a > 0) b / a else -1
    }
    val line =
      f"""{"metric":"zipf_containment","grow":$growFactor,""" +
        f""""exact_ratio":${ratio("exact")}%.2f,"capped_ratio":${ratio("capped")}%.2f,""" +
        f""""bounded_ratio":${ratio("bounded")}%.2f,"rows":$rowsJson}"""
    println(line)
    val p = java.nio.file.Paths.get("target", "zipf_containment_latest.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
