package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // tokenize: ascii-lowercased [a-z0-9]+ runs (all else is separator —
  // identical to regexp_replace("[^a-z0-9\\s]", " ") + split("\\s+"));
  // kernel shared with codegen lives in NativeOps.wordShingles
  override def nullSafeEval(input: Any): Any =
    NativeOps.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NativeOps.wordShingles($c, $n)")

  override def prettyName: String = "word_shingles"
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Per-document most-frequent-n-gram argmax: shingle + sort + run-length
  * scan in one eval, returning struct(gram, cnt). Exists so the Gopher
  * repetition signal ([[graft.operators.Corpus.topNgramFraction]]) stays
  * entirely map-side — the exploded alternative shuffles every gram
  * occurrence of the corpus twice just to pick one winner per doc.
  */
case class TopShingleRun(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("gram", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("norm_len", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    NativeOps.topShingleRun(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NativeOps.topShingleRun($c, $n)")

  override def prettyName: String = "top_shingle_run"
  override protected def withNewChildInternal(newChild: Expression): TopShingleRun =
    copy(child = newChild)
}

object ShingleExpression {

  /** Validated literal-int second argument for the SQL-path builders —
    * a clear analysis-time error instead of IndexOutOfBounds on wrong
    * arity or an internal Catalyst crash on a non-literal n.
    */
  private[plans] def literalIntArg(e: Seq[Expression], name: String): Int = {
    require(e.length == 2,
      s"$name(text, n) takes exactly 2 arguments, got ${e.length}")
    require(e(1).foldable, s"$name: n must be a literal integer")
    e(1).eval(null) match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$name: n must be a literal integer, got $other")
    }
  }

  def wordShingles(text: Column, n: Int): Column =
    GraftSqlShim.column(WordShingles(GraftSqlShim.expression(text), n))

  def topShingleRun(text: Column, n: Int): Column =
    GraftSqlShim.column(TopShingleRun(GraftSqlShim.expression(text), n))

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = GraftSqlShim.functionRegistry(spark)
    reg.createOrReplaceTempFunction(
      "word_shingles",
      e => WordShingles(e.head, literalIntArg(e, "word_shingles")),
      "built-in")
    reg.createOrReplaceTempFunction(
      "top_shingle_run",
      e => TopShingleRun(e.head, literalIntArg(e, "top_shingle_run")),
      "built-in")
  }
}
