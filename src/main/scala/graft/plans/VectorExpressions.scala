package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftshim.GraftSqlShim

/** Native vector-math expressions over `array<float>` / `array<double>`.
  *
  * The built-in route (`zip_with` + `aggregate`) allocates a lambda frame
  * per element — ~90 µs per 64-dim pair measured at sf0.1, which made the
  * all-pairs cosine dedup the bench bottleneck (183 s). One tight loop per
  * row (NativeOps kernels) brings it to microseconds, and `doGenCode`
  * emits a single static call so surrounding operators stay in one
  * whole-stage-codegen span. Accumulation is sequential double (index
  * order), matching the DuckDB oracle's list_cosine_similarity
  * bit-for-bit.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"$prettyName expects array<float|double>, got $other")
  }

  protected lazy val lf: Boolean = elemIsFloat(left)
  protected lazy val rf: Boolean = elemIsFloat(right)

  /** NativeOps kernel name — shared by eval and codegen. */
  protected def kernel: String

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    java.lang.Double.valueOf(kernel match {
      case "dot" => NativeOps.dot(a, b, lf, rf)
      case "cosine" => NativeOps.cosine(a, b, lf, rf)
      case "l2" => NativeOps.l2(a, b, lf, rf)
    })
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.NativeOps.$kernel($a, $b, $lf, $rf)")
}

case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override protected def kernel: String = "dot"
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Cosine similarity in one pass (dot + both norms); 0.0 on zero norm. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override protected def kernel: String = "cosine"
  override def prettyName: String = "vec_cosine"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class L2Distance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override protected def kernel: String = "l2"
  override def prettyName: String = "vec_l2"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** PQ asymmetric-distance computation done map-side: left = the m-code
  * array of a corpus row, right = one query's flattened m×ksub LUT of
  * squared subspace distances (subspace-major). Replaces the
  * posexplode + LUT-join + re-group shape, which shuffled m rows per
  * (query, candidate) pair just to add m lookups — this is one
  * codegen'd call per pair, zero pre-shuffle amplification.
  */
case class AdcSum(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private lazy val codesLong: Boolean = left.dataType match {
    case ArrayType(IntegerType, _) => false
    case ArrayType(LongType, _) => true
    case other => throw new IllegalArgumentException(
      s"adc_sum expects array<int|bigint> codes, got $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(NativeOps.adcSum(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], codesLong))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.NativeOps.adcSum($a, $b, $codesLong)")

  override def prettyName: String = "adc_sum"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** One-pass L2 normalization (array<float|double> → array<double>):
  * the aggregate+transform built-ins composition allocates a lambda
  * frame per element twice per row — on the PQ encode/train path that
  * is every corpus vector.
  */
case class L2Normalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vec_l2normalize expects array<float|double>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    NativeOps.l2normalize(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NativeOps.l2normalize($c, $isFloat)")

  override def prettyName: String = "vec_l2normalize"
  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}

object VectorExpressions {
  def l2normalize(v: Column): Column =
    GraftSqlShim.column(L2Normalize(GraftSqlShim.expression(v)))

  def adcSum(codes: Column, lut: Column): Column =
    GraftSqlShim.column(AdcSum(GraftSqlShim.expression(codes), GraftSqlShim.expression(lut)))
  def dot(a: Column, b: Column): Column =
    GraftSqlShim.column(DotProduct(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
  def cosine(a: Column, b: Column): Column =
    GraftSqlShim.column(CosineSimilarity(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
  def l2(a: Column, b: Column): Column =
    GraftSqlShim.column(L2Distance(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = GraftSqlShim.functionRegistry(spark)
    reg.createOrReplaceTempFunction("vec_dot",
      e => DotProduct(e.head, e(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_cosine",
      e => CosineSimilarity(e.head, e(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_l2",
      e => L2Distance(e.head, e(1)), "built-in")
  }
}
