package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {

  private lazy val docs = {
    val sp = spark; import sp.implicits._
    (1 to 200).map(i => (i.toLong, s"the quick document number $i with several words", "en"))
      .toDF("doc_id", "text", "lang")
  }

  test("profile aggregates per language") {
    val p = Corpus.profile(docs, "text", "lang").first()
    assert(p.getAs[Long]("n_docs") == 200)
    assert(p.getAs[Long]("total_tokens") == 200 * 8)
  }

  test("hash split is deterministic, exhaustive, and roughly proportional") {
    val s1 = Corpus.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val s2 = Corpus.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val m1 = s1.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val m2 = s2.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(m1 == m2) // stable across runs
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 200)
    assert(counts("train") > counts.getOrElse("val", 0L))
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
  }

  test("different salt produces a different assignment") {
    val a = Corpus.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val b = Corpus.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.5), salt = "other")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(a != b)
  }

  test("quality filter keeps high-quality docs only") {
    val sp = spark; import sp.implicits._
    val mixed = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and keeps running through the quiet forest for a while longer than expected today with friends and a calm steady pace that is natural text " * 3),
      (2L, "@@@@ #### $$$$ 123123123 !!!!")).toDF("doc_id", "text")
    val kept = Corpus.qualityFilter(mixed, "text", 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }
}
