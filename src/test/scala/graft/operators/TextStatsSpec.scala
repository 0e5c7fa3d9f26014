package graft.operators

import graft.SparkSpec
import graft.plans.{TextStatsExpressions => TS}
import org.apache.spark.sql.functions._

/** Round-8 additions: code-point entropy, NFC normalization, JL sign
  * projection (mat_vec), Matryoshka truncation, per-source vocab stats.
  */
class TextStatsSpec extends SparkSpec {

  private def sixDp(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("charEntropy: known distributions, code points not chars, empty is 0") {
    val sp = spark; import sp.implicits._
    val out = Seq(
      (1L, "aaaa"),          // one symbol → 0 bits
      (2L, "ab"),            // two equiprobable → 1 bit
      (3L, "aabbcc"),        // three equiprobable → log2 3
      (4L, ""),              // empty → 0 by definition
      (5L, "😀😀xy") // emoji = ONE code point (2 chars)
    ).toDF("id", "t").select(col("id"), TS.charEntropy(col("t")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.0)
    assert(out(2L) == 1.0)
    assert(sixDp(out(3L)) == sixDp(math.log(3) / math.log(2)))
    assert(out(4L) == 0.0)
    // {😀:2, x:1, y:1} over 4 code points = 1.5 bits; a UTF-16-char walk
    // would see {surrogates...} and disagree
    assert(out(5L) == 1.5)
  }

  test("nfcNormalize composes combining sequences; ASCII is identity") {
    val sp = spark; import sp.implicits._
    val decomposed = "e\u0301clair" // e + COMBINING ACUTE (7 code points)
    val out = Seq((1L, decomposed), (2L, "plain ascii"))
      .toDF("id", "t")
      .select(col("id"), TS.nfcNormalize(col("t")).as("n"),
        length(TS.nfcNormalize(col("t"))).as("l"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L)._1 == "\u00e9clair" && out(1L)._2 == 6) // composed single code point
    assert(out(2L)._1 == "plain ascii")
  }

  test("matVec: row-major hand check, float input, length-mismatch raises") {
    val sp = spark; import sp.implicits._
    // 2×3 matrix [[1,2,3],[4,5,6]] × [1,1,1] = [6,15]
    val flat = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    val out = Seq(Tuple1(Seq(1.0f, 1.0f, 1.0f))).toDF("v")
      .select(TS.matVec(col("v"), typedlit(flat)).as("p"))
      .first().getSeq[Double](0)
    assert(out == Seq(6.0, 15.0))
    val err = intercept[Exception] {
      Seq(Tuple1(Seq(1.0, 2.0))).toDF("v")
        .select(TS.matVec(col("v"), typedlit(Seq(1.0, 2.0, 3.0)))).collect()
    }
    assert(err.getMessage.contains("not a multiple"))
  }

  test("randomProjection: deterministic, sign-balanced, distance-preserving-ish") {
    val sp = spark; import sp.implicits._
    val vecs = (0 until 20).map(i =>
      (i.toLong, (0 until 64).map(j => math.sin(i * 64 + j).toFloat))).toDF("id", "v")
    val p1 = Features.randomProjection(vecs, "v", 8, "proj")
      .select(col("id"), col("proj")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val p2 = Features.randomProjection(vecs, "v", 8, "proj")
      .select(col("id"), col("proj")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p1 == p2) // no RNG state — the md5 matrix is a constant
    assert(p1(0L).length == 8)
    // JL with k=8 is loose, but norms must land within a broad band of
    // the original (E[‖Sv‖²/k] = ‖v‖²) — catches sign/scale bugs
    val v0norm = math.sqrt((0 until 64).map(j => math.pow(math.sin(0 * 64 + j), 2)).sum)
    val p0norm = math.sqrt(p1(0L).map(x => x * x).sum)
    assert(p0norm > v0norm * 0.3 && p0norm < v0norm * 3.0)
  }

  test("truncateEmbedding: unit norm, first-dims proportionality, zero stays zero") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, Seq(3.0f, 4.0f, 100.0f, 100.0f)), // slice [3,4] → [0.6, 0.8]
      (2L, Seq(0.0f, 0.0f, 5.0f, 5.0f))      // zero-norm slice stays zero
    ).toDF("vec_id", "embedding")
    val out = Features.truncateEmbedding(df, "embedding", 2, "tr")
      .select(col("vec_id"), col("tr")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(1L).map(sixDp) == Seq(0.6, 0.8))
    assert(out(2L) == Seq(0.0, 0.0)) // not NaN
  }

  test("vocabStats: exact counts, hapax fraction, null source is a real group") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, Some("srcA"), "the cat sat on the mat"),   // the×2 cat sat on mat
      (2L, Some("srcA"), "the dog"),                  // the dog
      (3L, Option.empty[String], "solo words here")
    ).toDF("doc_id", "source", "text")
    val out = Corpus.vocabStats(docs, "text", "source")
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    // srcA: 8 tokens, types {the,cat,sat,on,mat,dog}=6, hapax=5 (the×3)
    assert(out(Some("srcA")) == ((2L, 8L, 6L, 5L, sixDp(6.0 / 8), sixDp(5.0 / 6))))
    assert(out(None) == ((1L, 3L, 3L, 3L, 1.0, 1.0)))
  }

  test("new expressions register on the SQL path") {
    val s2 = spark.newSession()
    graft.plans.TextStatsExpressions.register(s2)
    val r = s2.sql(
      "SELECT char_entropy('ab') AS h, nfc_normalize('é') AS n, " +
        "mat_vec(array(1.0d, 1.0d), array(2.0d, 3.0d)) AS p").first()
    assert(r.getDouble(0) == 1.0)
    assert(r.getString(1) == "\u00e9")
    assert(r.getSeq[Double](2) == Seq(5.0))
  }
}
