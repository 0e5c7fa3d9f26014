package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k buffer over (count, term) pairs under
  * (count desc, term asc BINARY) — the same worst-at-root heap as
  * [[TopKBuf]], with terms held as UTF8String so ties order by the byte
  * collation Spark's sort (and the DuckDB oracle) use, not Java's
  * UTF-16 code units.
  */
final class TopTermsBuf(val k: Int) {
  var size = 0
  val counts = new Array[Long](k)
  val terms = new Array[UTF8String](k)

  private def better(ca: Long, ta: UTF8String, cb: Long, tb: UTF8String): Boolean =
    if (ca != cb) ca > cb else ta.binaryCompare(tb) < 0

  private def swap(i: Int, j: Int): Unit = {
    val c = counts(i); counts(i) = counts(j); counts(j) = c
    val t = terms(i); terms(i) = terms(j); terms(j) = t
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (better(counts(p), terms(p), counts(i), terms(i))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var worst = i
      if (l < size && better(counts(worst), terms(worst), counts(l), terms(l))) worst = l
      if (r < size && better(counts(worst), terms(worst), counts(r), terms(r))) worst = r
      if (worst == i) return
      swap(i, worst); i = worst
    }
  }

  def insert(c: Long, t: UTF8String): Unit =
    if (size < k) {
      counts(size) = c; terms(size) = t; size += 1; siftUp(size - 1)
    } else if (better(c, t, counts(0), terms(0))) {
      counts(0) = c; terms(0) = t; siftDown()
    }

  def mergeFrom(o: TopTermsBuf): Unit = {
    var i = 0
    while (i < o.size) { insert(o.counts(i), o.terms(i)); i += 1 }
  }

  def sorted: Array[(Long, UTF8String)] = {
    val out = Array.tabulate(size)(i => (counts(i), terms(i)))
    out.sortWith { case ((ca, ta), (cb, tb)) => better(ca, ta, cb, tb) }
  }
}

/** Per-group top-k (count, term) pairs as one map-side-combinable
  * aggregation — the exchange carries k terms per (group, mapper)
  * instead of the group's whole vocabulary (the window form shuffles
  * every distinct term to rank it).
  */
case class TopTerms(left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopTermsBuf] with BinaryLike[Expression] {

  require(k > 0, "topTerms: k must be positive")

  override def prettyName: String = "top_terms"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("term", StringType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopTermsBuf = new TopTermsBuf(k)

  override def update(buf: TopTermsBuf, input: InternalRow): TopTermsBuf = {
    val c = left.eval(input)
    val t = right.eval(input)
    if (c != null && t != null)
      // clone: the UTF8String may point into a reused input buffer
      buf.insert(c.asInstanceOf[Number].longValue(),
        t.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(buf: TopTermsBuf, other: TopTermsBuf): TopTermsBuf = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopTermsBuf): Any =
    new GenericArrayData(buf.sorted.map { case (c, t) =>
      InternalRow(c, t)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopTermsBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeLong(buf.counts(i))
      val b = buf.terms(i).getBytes
      out.writeInt(b.length); out.write(b)
      i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopTermsBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopTermsBuf(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val c = in.readLong()
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.insert(c, UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopTerms =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopTerms =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopTerms = copy(left = newLeft, right = newRight)
}

object TopTermsAgg {
  /** `top_terms(cnt, term, k)` as a Column aggregate — array of
    * (cnt, term) structs in (cnt desc, term asc-binary) rank order.
    */
  def topTerms(cnt: Column, term: Column, k: Int): Column =
    GraftSqlShim.column(TopTerms(GraftSqlShim.expression(cnt),
      GraftSqlShim.expression(term), k).toAggregateExpression())
}
