package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim.GraftSqlShim

/** Single-pass word-shingle expression: normalize (lowercase, non-[a-z0-9]
  * → separator, collapse runs) + tokenize + n-gram join in ONE eval.
  *
  * Semantics match the built-ins composition in TextFunctions
  * (normalizeText → split → transform/slice/concat_ws), which costs ~60 µs
  * per shingle in lambda interpretation — 15 s just to shingle 5 000 docs
  * at sf0.1, recomputed on both sides of the LSH self-join. This loop does
  * a document in single-digit microseconds.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // tokenize: ascii-lowercased [a-z0-9]+ runs (all else is separator —
    // identical to regexp_replace("[^a-z0-9\\s]", " ") + split("\\s+"))
    val tokens = new scala.collection.mutable.ArrayBuffer[String](64)
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    while (i < s.length) {
      val c0 = s.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) { tokens += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) tokens += sb.toString

    val out: Array[AnyRef] =
      if (tokens.length < n) {
        Array(UTF8String.fromString(tokens.mkString(" ")))
      } else {
        val m = tokens.length - n + 1
        val arr = new Array[AnyRef](m)
        val b = new java.lang.StringBuilder(32)
        var j = 0
        while (j < m) {
          b.setLength(0)
          var k = 0
          while (k < n) {
            if (k > 0) b.append(' ')
            b.append(tokens(j + k))
            k += 1
          }
          arr(j) = UTF8String.fromString(b.toString)
          j += 1
        }
        arr
      }
    new GenericArrayData(out)
  }

  override def prettyName: String = "word_shingles"
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object ShingleExpression {
  def wordShingles(text: Column, n: Int): Column =
    GraftSqlShim.column(WordShingles(GraftSqlShim.expression(text), n))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftSqlShim.functionRegistry(spark).createOrReplaceTempFunction(
      "word_shingles",
      e => WordShingles(e.head, e(1).eval(null).asInstanceOf[Number].intValue()),
      "built-in")
}
