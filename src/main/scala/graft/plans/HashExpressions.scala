package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftshim.GraftSqlShim

/** Native Catalyst expressions for the dedup extensions — the one place
  * parity genuinely needs custom Catalyst code (SURVEY §4.3): a MinHash
  * sketch and a SimHash, each computed in a single pass over the shingle /
  * token array per row. The naive built-in composition would be k separate
  * `transform`+`array_min` passes (k× the hashing work); this is one pass
  * with k running minima.
  *
  * Hashing uses Spark's own XXH64 (stable across versions, partitions and
  * executors — safe to persist sketches and join across jobs).
  */
case class MinHashSketch(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sketch expects array<string>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any =
    NativeOps.minhash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NativeOps.minhash($c, $k)")

  override def prettyName: String = "minhash_sketch"
  override protected def withNewChildInternal(newChild: Expression): MinHashSketch =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array: per-token XXH64, bit votes summed,
  * sign of each vote becomes the output bit. Hamming-near SimHashes ⇒
  * near-duplicate documents.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(NativeOps.simhash(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NativeOps.simhash($c)")

  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Oracle-replicable SimHash: `bits`-wide (≤ 60) sketch over MD5-derived
  * token hashes — slower per token than the XXH64 variant but computable
  * bit-for-bit by any engine with md5() (the DuckDB correctness oracle
  * brute-forces the same sketch). Use SimHash64 when cross-engine
  * reproducibility is not needed.
  */
case class SimHashMd5(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 60, "simhash_md5: bits must be in (0, 60]")

  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_md5 expects array<string>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(NativeOps.simhashMd5(input.asInstanceOf[ArrayData], bits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NativeOps.simhashMd5($c, $bits)")

  override def prettyName: String = "simhash_md5"
  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}

/** Wide (≤ 120-bit) oracle-replicable SimHash: fingerprint emitted as
  * ceil(bits/60) 60-bit words in an array<bigint>. Word w of each token
  * hash is hex chars [15w+1, 15w+15] of md5 — still brute-forceable by any
  * engine with md5(). See [[NativeOps.simhashMd5Wide]] for why width
  * matters at scale.
  */
case class SimHashMd5Wide(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 120, "simhash_md5_wide: bits must be in (0, 120]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_md5_wide expects array<string>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any =
    NativeOps.simhashMd5Wide(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NativeOps.simhashMd5Wide($c, $bits)")

  override def prettyName: String = "simhash_md5_wide"
  override protected def withNewChildInternal(newChild: Expression): SimHashMd5Wide =
    copy(child = newChild)
}

/** Element-wise 60-bit md5 over an array<string> → array<bigint>: each
  * element hashes to the high 60 bits of its MD5 ([[NativeOps.md5Hash60]]
  * — `('0x' || substr(md5(s), 1, 15))::BIGINT` in the DuckDB twin). One
  * native pass per row; the built-ins route (per-element
  * conv(substring(md5(...)))) allocates hex strings and substring copies
  * per gram and dominated the winnow fingerprint pass.
  */
case class Md5Hash60Array(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_hash60_array expects array<string>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any =
    NativeOps.md5Hash60Array(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NativeOps.md5Hash60Array($c)")

  override def prettyName: String = "md5_hash60_array"
  override protected def withNewChildInternal(newChild: Expression): Md5Hash60Array =
    copy(child = newChild)
}

object HashExpressions {
  /** Column-level API. */
  def minhashSketch(shingles: Column, k: Int): Column =
    GraftSqlShim.column(MinHashSketch(GraftSqlShim.expression(shingles), k))

  def md5Hash60Array(strings: Column): Column =
    GraftSqlShim.column(Md5Hash60Array(GraftSqlShim.expression(strings)))

  def simhash64(tokens: Column): Column =
    GraftSqlShim.column(SimHash64(GraftSqlShim.expression(tokens)))

  def simhashMd5(tokens: Column, bits: Int = 60): Column =
    GraftSqlShim.column(SimHashMd5(GraftSqlShim.expression(tokens), bits))

  def simhashMd5Wide(tokens: Column, bits: Int = 120): Column =
    GraftSqlShim.column(SimHashMd5Wide(GraftSqlShim.expression(tokens), bits))

  /** Register `minhash_sketch(arr, k)` / `simhash64(arr)` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = GraftSqlShim.functionRegistry(spark)
    registry.createOrReplaceTempFunction("minhash_sketch",
      exprs => MinHashSketch(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue()), "built-in")
    registry.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "built-in")
  }
}
