package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import TextFunctions._

  private def one(c: org.apache.spark.sql.Column, text: String): Any = {
    val sp = spark; import sp.implicits._
    Seq(text).toDF("text").select(c.as("v")).first().get(0)
  }

  test("tokenCount: whitespace tokens, zero for empty") {
    assert(one(tokenCount(col("text")), "a b  c") == 3)
    assert(one(tokenCount(col("text")), "   ") == 0)
    assert(one(tokenCount(col("text")), "") == 0)
  }

  test("bpeTokenCount: alpha runs + digit runs + punctuation marks") {
    assert(one(bpeTokenCount(col("text")), "Ab, 12c") == 4) // ab , 12 c
  }

  test("punct and digit ratios") {
    assert(one(punctRatio(col("text")), "ab,.").asInstanceOf[Double] == 0.5)
    assert(one(digitRatio(col("text")), "a1b2").asInstanceOf[Double] == 0.5)
  }

  test("langId picks dominant stopword language, und when none") {
    assert(one(langId(col("text")), "the cat is in the house and it is warm") == "en")
    assert(one(langId(col("text")), "der hund ist nicht mit der katze und das haus") == "de")
    assert(one(langId(col("text")), "xyzzy qwerty plugh") == "und")
  }

  test("fingerprintKey: sorted distinct tokens") {
    assert(one(fingerprintKey(col("text")), "b a  a C") == "a b c")
    assert(one(fingerprint64(col("text")), "b a a") ==
      one(fingerprint64(col("text")), "a b"))
  }

  test("normalizeText strips punctuation and collapses whitespace") {
    assert(one(normalizeText(col("text")), " Hello,  World!! ") == "hello world")
  }

  test("wordShingles produce n-grams; short text yields single shingle") {
    val sh = one(wordShingles(col("text"), 3), "a b c d")
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(sh == Seq("a b c", "b c d"))
    val short = one(wordShingles(col("text"), 3), "a b")
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(short == Seq("a b"))
  }

  test("native wordShingles matches the built-ins composition") {
    val sp = spark; import sp.implicits._
    val samples = Seq("the Quick, brown FOX!", "a b", "", "  spaced   out  ",
      "punct.only...", "x1 2y z3 w4 v5", "Üñïçôdé mix abc def ghi")
    val df = samples.toDF("text")
    val both = df.select(
      wordShingles(col("text"), 3).as("native"),
      wordShinglesHof(col("text"), 3).as("hof")).collect()
    both.zip(samples).foreach { case (r, s) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"mismatch on '$s'")
    }
  }

  test("charShingles distinct character n-grams") {
    val sh = one(charShingles(col("text"), 3), "abcd")
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(sh == Seq("abc", "bcd"))
  }

  test("redactPii masks emails, IPv4s and phone numbers, leaves prose") {
    val in = "mail a.b-c@foo.io, call (555) 123-4567 or +1 555.123.4567, " +
      "host 10.0.0.1, price 50000.25 stays, year 2024 stays"
    val out = one(redactPii(col("text")), in).asInstanceOf[String]
    assert(!out.contains("foo.io") && !out.contains("123-4567") &&
      !out.contains("10.0.0.1"))
    assert(out.contains("price 50000.25 stays"))
    assert(out.contains("year 2024 stays"))
    assert(out.contains("[REDACTED]"))
  }

  test("dup ratios: boilerplate scores high, prose scores zero") {
    val boiler = "nav home\nnav home\nnav home\nunique line"
    val dl = one(dupLineRatio(col("text")), boiler).asInstanceOf[Double]
    assert(math.abs(dl - 0.5) < 1e-9) // 4 lines, 2 distinct
    assert(one(dupLineRatio(col("text")), "one line only").asInstanceOf[Double] == 0.0)
    val dw = one(dupWordRatio(col("text")), "spam spam spam ham").asInstanceOf[Double]
    assert(math.abs(dw - 0.5) < 1e-9) // 4 tokens, 2 distinct
    assert(one(dupWordRatio(col("text")), "all words differ here").asInstanceOf[Double] == 0.0)
  }

  test("qualityScore in [0,1], higher for natural text") {
    val natural = one(qualityScore(col("text")),
      "the quick brown fox jumps over the lazy dog and runs to the forest with a friend " * 5)
      .asInstanceOf[Double]
    val noisy = one(qualityScore(col("text")), "@@@ ### 1234 !!!! %%%")
      .asInstanceOf[Double]
    assert(natural > noisy)
    assert(natural <= 1.0 && noisy >= 0.0)
  }
}
