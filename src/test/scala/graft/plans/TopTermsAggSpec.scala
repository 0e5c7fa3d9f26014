package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class TopTermsAggSpec extends SparkSpec {

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(TopTermsAgg.topTerms(col("cnt"), col("term"), k).as("tt"))
      .select(col("g"), posexplode(col("tt")).as(Seq("p", "e")))
      .select(col("g"), col("e.term"), col("e.cnt"), (col("p") + 1).as("rnk"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rnk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("cnt").desc, col("term").asc)))
      .where(col("rnk") <= k)
      .select(col("g"), col("term"), col("cnt"), col("rnk").cast("int"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getAs[Number](3).intValue())).toSet

  test("top-terms aggregate equals the window on random counted vocab") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(3L)
    val df = (0 until 3000).map { i =>
      (s"g${rnd.nextInt(7)}", s"term${rnd.nextInt(300)}_$i", rnd.nextInt(50).toLong)
    }.toDF("g", "term", "cnt").repartition(5)
    assert(rows(viaAgg(df, 12)) == rows(viaWindow(df, 12)))
  }

  test("count ties order by UTF8 BINARY collation, matching the window sort") {
    val sp = spark; import sp.implicits._
    // "￿" is EF BF BF in UTF-8; "😀" (a surrogate pair) is F0 9F 98 80.
    // Binary order puts ￿ first; Java UTF-16 code-unit order would
    // put the emoji first — the aggregate must agree with Spark's sort.
    val df = Seq(("g", "😀", 5L), ("g", "￿", 5L), ("g", "zz", 5L))
      .toDF("g", "term", "cnt")
    assert(rows(viaAgg(df, 3)) == rows(viaWindow(df, 3)))
    val order = viaAgg(df, 3).orderBy(col("rnk")).collect().map(_.getString(1)).toSeq
    assert(order == Seq("zz", "￿", "😀"))
  }
}
