package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifySpec extends SparkSpec {

  // two cleanly separable vocabularies plus shared filler words
  private lazy val labeled = {
    val sp = spark; import sp.implicits._
    val animals = (1 to 40).map(i =>
      (i.toLong, s"the cat and dog chased a bird near the $i barn", "animals"))
    val finance = (41 to 80).map(i =>
      (i.toLong, s"the market price and revenue forecast rose $i percent", "finance"))
    (animals ++ finance).toDF("doc_id", "text", "lang")
  }

  test("naive bayes resubstitution recovers the class vocabularies") {
    val pred = Classify.nbPredict(labeled, labeled, "text", "doc_id", "lang")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred")).toMap
    assert(pred.size == 80)
    assert((1 to 40).forall(i => pred(i.toLong) == "animals"))
    assert((41 to 80).forall(i => pred(i.toLong) == "finance"))
  }

  test("naive bayes scores one row per (doc, class) and prefers the true class") {
    val sc = Classify.nbScores(labeled, labeled, "text", "doc_id", "lang")
    assert(sc.count() == 80 * 2)
    val row1 = sc.where(col("doc_id") === 1L).collect()
      .map(r => r.getAs[String]("cls") -> r.getAs[Double]("score")).toMap
    assert(row1("animals") > row1("finance"))
  }

  test("naive bayes handles predict-time OOV tokens through the smoothed floor") {
    val sp = spark; import sp.implicits._
    val unseen = Seq((99L, "zyzzyva gribble cat dog bird")).toDF("doc_id", "text")
    val pred = Classify.nbPredict(unseen, labeled, "text", "doc_id", "lang").collect()
    assert(pred.length == 1 && pred.head.getAs[String]("pred") == "animals")
  }

  test("dsir weights rank target-like documents above the rest") {
    val target = labeled.where(col("lang") === "finance")
      .select(col("doc_id"), col("text"))
    val w = Classify.importanceWeights(labeled, target, "text", "doc_id",
        buckets = 1024)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logw")).toMap
    assert(w.size == 80)
    val financeMin = (41 to 80).map(i => w(i.toLong)).min
    val animalsMax = (1 to 40).map(i => w(i.toLong)).max
    assert(financeMin > animalsMax,
      s"finance docs must outweigh animal docs ($financeMin vs $animalsMax)")
  }

  test("dsir select is deterministic, ranked, and capped at k") {
    val target = labeled.where(col("lang") === "finance")
      .select(col("doc_id"), col("text"))
    def run() = Classify.importanceSelect(labeled, target, "text", "doc_id",
        k = 10, buckets = 1024)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rnk"))).toSeq
    val a = run()
    assert(a == run()) // stable across runs / partitionings
    assert(a.length == 10 && a.map(_._2).sorted == (1L to 10L))
    assert(a.forall { case (id, _) => id >= 41L }) // all from the target class
  }

  test("knn classify takes the majority label with deterministic tie-break") {
    val sp = spark; import sp.implicits._
    // two tight clusters in 2-d: ids 1-3 near (1,0) labeled 0, ids 4-6
    // near (0,1) labeled 1; query 7 sits inside cluster 0
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.99f, 0.1f), 0),
      (3L, Array(0.98f, 0.05f), 0), (4L, Array(0.0f, 1.0f), 1),
      (5L, Array(0.1f, 0.99f), 1), (6L, Array(0.05f, 0.98f), 1))
      .toDF("vec_id", "embedding", "label")
    val query = Seq((7L, Array(1.0f, 0.02f), -1)).toDF("vec_id", "embedding", "label")
    val pred = Classify.knnClassify(corpus, query, "embedding", "vec_id", "label", k = 3)
      .collect()
    assert(pred.length == 1)
    assert(pred.head.getAs[Int]("pred") == 0 && pred.head.getAs[Long]("votes") == 3L)
    // k = 6 → 3 votes each; the tie must fall to the smaller label
    val tied = Classify.knnClassify(corpus, query, "embedding", "vec_id", "label", k = 6)
      .collect().head
    assert(tied.getAs[Int]("pred") == 0 && tied.getAs[Long]("votes") == 3L)
  }

  test("dsir lambda table broadcasts; empty train corpus raises") {
    val target = labeled.where(col("lang") === "finance")
      .select(col("doc_id"), col("text"))
    val plan = Classify.importanceWeights(labeled, target, "text", "doc_id",
      buckets = 256).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"λ table must broadcast, not shuffle the corpus:\n$plan")
    val sp = spark; import sp.implicits._
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    assertThrows[IllegalArgumentException](
      Classify.nbScores(labeled, empty, "text", "doc_id", "lang"))
    assertThrows[IllegalArgumentException](
      Classify.knnClassify(labeled, labeled, "text", "doc_id", "lang", k = 0))
  }

  test("dsir weight of a doc equals the sum of its tokens' bucket log-ratios") {
    // single-token docs make the identity λ(bucket) = logw(doc) exact
    val sp = spark; import sp.implicits._
    val raw = Seq((1L, "alpha"), (2L, "alpha"), (3L, "beta")).toDF("doc_id", "text")
    val target = Seq((10L, "alpha")).toDF("doc_id", "text")
    val w = Classify.importanceWeights(raw, target, "text", "doc_id", buckets = 64)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logw")).toMap
    // λ(alpha) = ln((1+1)/(1+64)) − ln((2+1)/(3+64))
    val lamAlpha = math.log(2.0 / 65.0) - math.log(3.0 / 67.0)
    val lamBeta = math.log(1.0 / 65.0) - math.log(2.0 / 67.0)
    assert(math.abs(w(1L) - BigDecimal(lamAlpha).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(w(3L) - BigDecimal(lamBeta).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }
}
