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

/** Bounded top-k buffer over (score, id) pairs: a binary heap whose ROOT
  * is the worst kept element, so the common case (candidate worse than
  * everything kept) is one comparison and no allocation. "Better" is
  * (score desc|asc, id asc) — `java.lang.Double.compare` semantics,
  * matching Spark's SortOrder for doubles (scores here are similarity /
  * distance values, never NaN).
  */
final class TopKBuf(val k: Int, val desc: Boolean) {
  var size = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)

  /** a strictly better than b under (score dir, id asc)? */
  private def better(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    if (c != 0) { if (desc) c > 0 else c < 0 } else ia < ib
  }

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      // heap orders WORST toward the root
      if (better(scores(p), ids(p), scores(i), ids(i))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var worst = i
      if (l < size && better(scores(worst), ids(worst), scores(l), ids(l))) worst = l
      if (r < size && better(scores(worst), ids(worst), scores(r), ids(r))) worst = r
      if (worst == i) return
      swap(i, worst); i = worst
    }
  }

  def insert(s: Double, id: Long): Unit =
    if (size < k) {
      scores(size) = s; ids(size) = id; size += 1; siftUp(size - 1)
    } else if (better(s, id, scores(0), ids(0))) {
      scores(0) = s; ids(0) = id; siftDown()
    }

  def mergeFrom(o: TopKBuf): Unit = {
    var i = 0
    while (i < o.size) { insert(o.scores(i), o.ids(i)); i += 1 }
  }

  /** Kept pairs best-first (the rank order). */
  def sorted: Array[(Double, Long)] = {
    val out = Array.tabulate(size)(i => (scores(i), ids(i)))
    out.sortWith { case ((sa, ia), (sb, ib)) => better(sa, ia, sb, ib) }
  }
}

/** Per-group top-k as ONE aggregation instead of a two-phase window:
  * returns the k best (score, id) structs in rank order under
  * (score desc|asc, id asc). Because it is map-side combinable, each
  * mapper shuffles at most k rows per group — the full candidate set
  * (queries × corpus in a brute-force scan) never reaches the exchange,
  * where the window form first shuffles every candidate row to rank it.
  */
case class TopKPairs(left: Expression, right: Expression, k: Int,
    scoreDesc: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] with BinaryLike[Expression] {

  require(k > 0, "topKPairs: k must be positive")

  override def prettyName: String = "top_k_pairs"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k, scoreDesc)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Number].doubleValue(),
        i.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuf): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuf(k, scoreDesc)
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.insert(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKPairs = copy(left = newLeft, right = newRight)
}

object TopKAgg {
  /** `top_k_pairs(score, id, k, desc)` as a Column aggregate — array of
    * (score, id) structs in rank order.
    */
  def topKPairs(score: Column, id: Column, k: Int,
      scoreDesc: Boolean): Column =
    GraftSqlShim.column(TopKPairs(GraftSqlShim.expression(score),
      GraftSqlShim.expression(id), k, scoreDesc).toAggregateExpression())
}
