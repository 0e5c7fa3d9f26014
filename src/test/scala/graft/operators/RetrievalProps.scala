package graft.operators

import graft.TestSession
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Random-corpus invariants for BM25 and the histogram, checked against
  * independent in-memory reference implementations.
  */
object RetrievalProps extends Properties("Retrieval") {

  private lazy val spark = TestSession.spark

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "rare")
  private val docGen: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(2, 10).flatMap(n => Gen.listOfN(n, docGen))

  private def sixDp(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Straight-line BM25 (Lucene idf) over tokenized docs. */
  private def referenceBm25(texts: Seq[String], terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val toks = texts.map(_.split(" ").toSeq)
    val n = texts.size.toDouble
    val avgdl = toks.map(_.size).sum.toDouble / n
    val dfc = terms.map(t => t -> toks.count(_.contains(t)).toDouble).toMap
    toks.zipWithIndex.flatMap { case (ts, i) =>
      val score = terms.map { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0 || dfc(t) == 0) 0.0
        else math.log((n - dfc(t) + 0.5) / (dfc(t) + 0.5) + 1.0) *
          tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * ts.size / avgdl))
      }.sum
      if (score > 0) Some(i.toLong -> score) else None
    }.toMap
  }

  property("bm25Search scores match an in-memory reference at 6 dp") =
    forAll(corpusGen) { texts =>
      val sp = spark; import sp.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Corpus.bm25Search(docs, "text", "doc_id",
          Seq("alpha", "rare"), k = texts.size + 1)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Double]("score")).toMap
      val ref = referenceBm25(texts, Seq("alpha", "rare"))
        .view.mapValues(sixDp).toMap
      out == ref
    }

  property("histogram bins partition the rows and cover the range") =
    forAll(
      Gen.chooseNum(1, 30).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-50, 50).map(_.toDouble))),
      Gen.chooseNum(1, 8)) { (vals, buckets) =>
      val sp = spark; import sp.implicits._
      val gf = graft.GraftFrame(vals.toDF("v"), "t")
      val out = gf.histogram("v", buckets).collect()
        .map(r => r.getAs[Long]("bucket") ->
          (r.getAs[Double]("bucket_lo"), r.getAs[Double]("bucket_hi"),
            r.getAs[Long]("n"))).toMap
      val lo = vals.min; val hi = vals.max
      val refCounts = vals.groupBy { x =>
        if (hi == lo) 0L
        else math.min(math.floor((x - lo) * buckets / (hi - lo)), buckets - 1.0).toLong
      }.view.mapValues(_.size.toLong).toMap
      out.size == buckets &&
        out.values.map(_._3).sum == vals.size.toLong &&
        (0L until buckets.toLong).forall { bkt =>
          out(bkt)._3 == refCounts.getOrElse(bkt, 0L)
        } &&
        out(0L)._1 == sixDp(lo) && out(buckets - 1L)._2 == sixDp(hi)
    }
}
