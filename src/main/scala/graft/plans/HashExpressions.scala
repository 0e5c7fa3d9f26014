package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
    extends UnaryExpression with CodegenFallback {

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

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def prettyName: String = "minhash_sketch"
  override protected def withNewChildInternal(newChild: Expression): MinHashSketch =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array: per-token XXH64, bit votes summed,
  * sign of each vote becomes the output bit. Hamming-near SimHashes ⇒
  * near-duplicate documents.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

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

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object HashExpressions {
  /** Column-level API. */
  def minhashSketch(shingles: Column, k: Int): Column =
    GraftSqlShim.column(MinHashSketch(GraftSqlShim.expression(shingles), k))

  def simhash64(tokens: Column): Column =
    GraftSqlShim.column(SimHash64(GraftSqlShim.expression(tokens)))

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
