package graft.operators

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Invariants of the round-7 curation operators over generated corpora. */
object CurationProps extends Properties("CurationOps") {

  private lazy val spark = TestSession.spark

  private val lineGen = Gen.oneOf("alpha", "beta", "gamma", "shared", "x y z")
  private val docGen: Gen[String] =
    Gen.chooseNum(0, 4).flatMap(n => Gen.listOfN(n, lineGen)).map(_.mkString("\n"))
  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, docGen))

  property("dedupParagraphs is idempotent") = forAll(corpusGen) { texts =>
    val sp = spark; import sp.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val once = Corpus.dedupParagraphs(docs, "text", "doc_id")
    val twice = Corpus.dedupParagraphs(once, "text", "doc_id")
    val a = once.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val b = twice.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    a.sameElements(b)
  }

  property("dedupParagraphs: every non-empty surviving line is globally unique") =
    forAll(corpusGen) { texts =>
      val sp = spark; import sp.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val lines = Corpus.dedupParagraphs(docs, "text", "doc_id")
        .collect().flatMap(_.getString(1).split("\n", -1)).filter(_.nonEmpty)
      lines.distinct.length == lines.length
    }

  private val weightsGen: Gen[List[Double]] =
    Gen.chooseNum(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(0.5, 1.0, 2.0, 10.0, 100.0)))

  property("weightedSample is a deterministic size-min(k,n) subset of the input") =
    forAll(weightsGen, Gen.chooseNum(1, 10)) { (ws, k) =>
      val sp = spark; import sp.implicits._
      val df = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
      val s1 = Corpus.weightedSample(df, "id", "w", k)
        .collect().map(_.getAs[Long]("id")).toSet
      val s2 = Corpus.weightedSample(df, "id", "w", k)
        .collect().map(_.getAs[Long]("id")).toSet
      s1 == s2 && s1.size == math.min(k, ws.length) &&
        s1.subsetOf(ws.indices.map(_.toLong).toSet)
    }

  property("temperatureMixture: shares sum to ~1 and budgets never exceed it") =
    forAll(
      Gen.chooseNum(1, 5).flatMap(n =>
        Gen.listOfN(n * 7, Gen.oneOf("a", "b", "c", "d"))),
      Gen.oneOf(0.0, 0.5, 0.7, 1.0)) { (sources, alpha) =>
      val sp = spark; import sp.implicits._
      val df = sources.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "source")
      val rows = Corpus.temperatureMixture(df, "source", alpha, budget = 1000L)
        .collect()
      val shareSum = rows.map(_.getAs[Double]("share")).sum
      val budgetSum = rows.map(_.getAs[Long]("docs_at_budget")).sum
      math.abs(shareSum - 1.0) < 1e-4 && budgetSum <= 1000L &&
        rows.forall(_.getAs[Long]("docs_at_budget") >= 0L)
    }

  property("topNgramFraction: count >= 1 and the reported gram occurs in the doc") =
    forAll(Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "ba")))) { words =>
      val sp = spark; import sp.implicits._
      val text = words.mkString(" ")
      val out = Corpus.topNgramFraction(
        Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id", n = 2)
        .collect()
      out.forall { r =>
        val gram = r.getAs[String]("top_gram")
        r.getAs[Long]("gram_count") >= 1L &&
          text.replaceAll("\\s+", " ").contains(gram.split(" ").head)
      }
    }
}
