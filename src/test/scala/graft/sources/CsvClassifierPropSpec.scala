package graft.sources

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the CSV value classifier (SURVEY §5 suggestion:
  * format a number with EU/US separators → classify → the class admits a
  * lossless cast back). Plain ScalaCheck Properties — sbt runs these
  * alongside the ScalaTest suites.
  */
object CsvClassifierProps extends Properties("CsvClassifier") {
  import CsvSmartCaster._

  property("plain integers classify Integer") =
    forAll(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)) { n =>
      classify(n.toString) == VInteger
    }

  property("US-formatted decimals classify Float") =
    forAll(Gen.chooseNum(1000L, 999999999L), Gen.chooseNum(1, 99)) { (n, frac) =>
      val s = f"$n%,d.$frac%02d" // e.g. 1,234,567.42
      classify(s) == VFloat
    }

  property("EU-formatted decimals classify Float") =
    forAll(Gen.chooseNum(1000L, 999999999L), Gen.chooseNum(1, 99)) { (n, frac) =>
      val s = f"$n%,d".replace(',', '.') + s",$frac"
      classify(s) == VFloat
    }

  property("EU grouping WITHOUT decimal comma stays String") =
    forAll(Gen.chooseNum(1000000L, 999999999L)) { n =>
      val s = f"$n%,d".replace(',', '.') // 999.999.999 shape
      classify(s) == VString
    }

  property("percent values classify Float") =
    forAll(Gen.chooseNum(0, 100000)) { n => classify(s"$n%") == VFloat }

  property("currency values classify Float") =
    forAll(Gen.chooseNum(0, 100000), Gen.oneOf("$", "€", "£", "¥", "₹")) {
      (n, cur) => classify(s"$cur$n.50") == VFloat
    }

  property("alphabetic strings never classify numeric") =
    forAll(Gen.alphaStr.suchThat(_.nonEmpty)) { s =>
      val c = classify(s)
      c == VString || c == VBoolean || c == VNull
    }

  property("normalizeExpression is idempotent") = {
    import graft.normalize.Normalize
    val exprGen = Gen.oneOf(
      "SUM(x) AS total", "UPPER(Name)", "a::TEXT", "CASE WHEN x = 'Y' THEN 1 END",
      "ROUND(AVG(price), 2) AS p", "CONCAT(a, ' - ', b) AS label")
    forAll(exprGen) { e =>
      val once = Normalize.normalizeExpression(e)
      Normalize.normalizeExpression(once) == once
    }
  }

  property("vote honors the >80% majority rule") =
    forAll(Gen.listOfN(20, Gen.oneOf("12", "x"))) { vs =>
      val expectInt = vs.count(_ == "12").toDouble / vs.size > 0.8
      (vote(vs) == VInteger) == expectInt
    }
}
