package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftshim.GraftSqlShim

/** Native vector-math expressions over `array<float>` / `array<double>`.
  *
  * The built-in route (`zip_with` + `aggregate`) allocates a lambda frame
  * per element — ~90 µs per 64-dim pair measured at sf0.1, which made the
  * all-pairs cosine dedup the bench bottleneck (183 s). One tight loop per
  * row brings it to microseconds. Accumulation is sequential double
  * (index order), matching the DuckDB oracle's list_cosine_similarity
  * bit-for-bit.
  */
abstract class VectorBinaryExpression extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType

  protected def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"$prettyName expects array<float|double>, got $other")
  }

  @inline protected final def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  private lazy val lf = elemIsFloat(left)
  private lazy val rf = elemIsFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(a, i, lf) * get(b, i, rf); i += 1 }
    java.lang.Double.valueOf(acc)
  }

  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Cosine similarity in one pass (dot + both norms); 0.0 on zero norm. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  private lazy val lf = elemIsFloat(left)
  private lazy val rf = elemIsFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, lf); val y = get(b, i, rf)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    java.lang.Double.valueOf(if (denom == 0.0) 0.0 else dot / denom)
  }

  override def prettyName: String = "vec_cosine"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class L2Distance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  private lazy val lf = elemIsFloat(left)
  private lazy val rf = elemIsFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { val d = get(a, i, lf) - get(b, i, rf); acc += d * d; i += 1 }
    java.lang.Double.valueOf(math.sqrt(acc))
  }

  override def prettyName: String = "vec_l2"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorExpressions {
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
