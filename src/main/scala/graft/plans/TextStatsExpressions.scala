package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim.GraftSqlShim

/** Shannon entropy (bits) of a string's code-point distribution in one
  * eval — the compression-proxy text-quality signal (see
  * [[NativeOps.charEntropy]]). The built-ins alternative explodes every
  * character of the corpus through a (doc, char) shuffle; this is one
  * map-side pass that stays inside whole-stage codegen.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes() = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_entropy expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(
      NativeOps.charEntropy(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NativeOps.charEntropy($c)")

  override def prettyName: String = "char_entropy"
  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** Unicode NFC canonical composition (see [[NativeOps.nfcNormalize]]) —
  * DuckDB `nfc_normalize` twin, codegen'd.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes() = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    NativeOps.nfcNormalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NativeOps.nfcNormalize($c)")

  override def prettyName: String = "nfc_normalize"
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Dense row-major matrix × vector (see [[NativeOps.matVec]]): `right` is
  * the flattened matrix (a plan literal for fixed projections — Catalyst
  * broadcasts it inside the serialized plan), output dim = matrix length /
  * vector length. Powers [[graft.operators.Features.randomProjection]];
  * summation order matches DuckDB's list_dot_product.
  */
case class MatVec(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val vecFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes() = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(DoubleType, _)) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"mat_vec expects (array<float|double>, array<double>), got ($l, $r)")
  }

  override def nullSafeEval(v: Any, m: Any): Any =
    NativeOps.matVec(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      m.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], vecFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, m) =>
      s"graft.plans.NativeOps.matVec($v, $m, $vecFloat)")

  override def prettyName: String = "mat_vec"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MatVec =
    copy(left = l, right = r)
}

object TextStatsExpressions {
  def charEntropy(text: Column): Column =
    GraftSqlShim.column(CharEntropy(GraftSqlShim.expression(text)))

  def nfcNormalize(text: Column): Column =
    GraftSqlShim.column(NfcNormalize(GraftSqlShim.expression(text)))

  def matVec(vec: Column, flatMatrix: Column): Column =
    GraftSqlShim.column(MatVec(GraftSqlShim.expression(vec),
      GraftSqlShim.expression(flatMatrix)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = GraftSqlShim.functionRegistry(spark)
    reg.createOrReplaceTempFunction("char_entropy", { exprs =>
      require(exprs.length == 1, "char_entropy(text) takes exactly 1 argument")
      CharEntropy(exprs.head)
    }, "built-in")
    reg.createOrReplaceTempFunction("nfc_normalize", { exprs =>
      require(exprs.length == 1, "nfc_normalize(text) takes exactly 1 argument")
      NfcNormalize(exprs.head)
    }, "built-in")
    reg.createOrReplaceTempFunction("mat_vec", { exprs =>
      require(exprs.length == 2, "mat_vec(vec, flat_matrix) takes exactly 2 arguments")
      MatVec(exprs.head, exprs(1))
    }, "built-in")
  }
}
