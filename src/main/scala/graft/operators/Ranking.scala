package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The repo-wide ranked-top-k idiom in one place: order by the
  * 6-dp-rounded score (desc) with an id tie-break — engine-reproducible
  * like every graded ranking — keep k via TakeOrdered (k per partition +
  * driver merge, no global sort), and attach the 1-based rank over the k
  * survivors only.
  */
private[operators] object Ranking {

  def topK(scored: DataFrame, scoreCol: String, idCol: String, k: Int,
      outScoreCol: String, carryCols: Seq[String] = Nil): DataFrame = {
    val ord = Seq(round(col(scoreCol), 6).desc, col(idCol).asc)
    scored.orderBy(ord: _*).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(ord: _*)).cast("int"))
      .select(col(idCol) +: round(col(scoreCol), 6).as(outScoreCol) +:
        carryCols.map(col) :+ col("rank"): _*)
  }
}
