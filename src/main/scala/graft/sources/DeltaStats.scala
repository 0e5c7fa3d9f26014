package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Per-file column statistics for the delta log, and the conservative
  * file-skipping evaluator that consumes them.
  *
  * Real delta writes a `stats` JSON string on every `add` action
  * (numRecords / minValues / maxValues / nullCount) and prunes files whose
  * bounds cannot satisfy the query predicate — the mechanism that lets a
  * 100 TB table answer a selective query by opening a handful of files.
  * The reference reads delta with pruning explicitly DISABLED
  * (src/elusion.rs:6656-6660); this module goes the other way.
  *
  * Stats are harvested from the parquet FOOTERS of the just-written files
  * (row-group column min/max/nullCount aggregated per file) — an O(new
  * files) driver-side metadata read, no data scan, the same source
  * delta-rs uses. Pruning is CONSERVATIVE: a file is skipped only when a
  * conjunct is provably false for every row of the file; any unknown —
  * missing stats, unsupported type, non-ASCII string bounds, unsupported
  * predicate shape — keeps the file. The full predicate is always
  * re-applied to the surviving rows, so pruning can never change results.
  */
object DeltaStats {

  /** One replayed `add` action: relative path, `col=val` partition values
    * (None = null partition), the raw stats JSON if the writer recorded
    * one, and the file size in bytes.
    */
  /** `deletionVector` descriptor on an add action (delta protocol,
    * PROTOCOL.md "Deletion Vectors"): where the roaring-bitmap row filter
    * for the file lives (u = UUID-named file under the table, i = inline
    * z85 payload, p = absolute path), plus its size and how many rows it
    * deletes. `offset` points at the DV's length-prefixed record inside
    * the file for u/p storage.
    */
  case class DvDescriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Long], sizeInBytes: Int, cardinality: Long)

  case class AddEntry(rel: String, partitionValues: Map[String, String],
      stats: Option[String], size: Long,
      dv: Option[DvDescriptor] = None,
      baseRowId: Option[Long] = None,
      defaultRowCommitVersion: Option[Long] = None)

  // ───────────────────────── harvest (write side) ────────────────────────

  /** Stats JSON for one parquet file, from its footer. Columns beyond the
    * first `maxCols` top-level primitives are left out (delta's
    * dataSkippingNumIndexedCols has the same dial); columns whose type we
    * can't compare safely are left out of min/max but keep nullCount.
    * Returns None only if the footer can't be read at all.
    */
  /** Row count of one parquet file from its footer — the O(1)-metadata
    * read row-tracking base-row-id assignment needs when an add carries
    * no stats JSON.
    */
  def rowCount(conf: Configuration, file: HPath): Long = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    finally reader.close()
  }

  def harvest(conf: Configuration, file: HPath, maxCols: Int = 32): Option[String] = {
    val reader =
      try ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      catch { case _: Exception => return None }
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val numRecords = blocks.map(_.getRowCount).sum
      // per-column aggregation across row groups, schema order
      val mins = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val maxs = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val nulls = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      val colNames: Seq[String] = blocks.headOption.toSeq.flatMap(
        _.getColumns.asScala.filter(_.getPath.size == 1)
          .map(_.getPath.toDotString)).take(maxCols)
      colNames.foreach { name =>
        var primType: PrimitiveType = null
        var minV: AnyRef = null
        var maxV: AnyRef = null
        var nullCnt = 0L
        var boundsKnown = true
        var nullsKnown = true
        blocks.foreach { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == name) match {
            case Some(c) =>
              primType = c.getPrimitiveType
              val st = c.getStatistics
              if (st == null) { boundsKnown = false; nullsKnown = false }
              else {
                if (st.isNumNullsSet) nullCnt += st.getNumNulls else nullsKnown = false
                if (st.hasNonNullValue) {
                  val cmp = primType.comparator.asInstanceOf[java.util.Comparator[AnyRef]]
                  val lo = st.genericGetMin.asInstanceOf[AnyRef]
                  val hi = st.genericGetMax.asInstanceOf[AnyRef]
                  if (minV == null || cmp.compare(lo, minV) < 0) minV = lo
                  if (maxV == null || cmp.compare(hi, maxV) > 0) maxV = hi
                } else if (st.isEmpty && b.getRowCount > 0) boundsKnown = false
              }
            case None => boundsKnown = false; nullsKnown = false
          }
        }
        if (nullsKnown) nulls(name) = nullCnt
        if (boundsKnown && minV != null)
          renderValue(primType, minV).zip(renderValue(primType, maxV)).foreach {
            case (lo, hi) => mins(name) = lo; maxs(name) = hi
          }
      }
      def obj(m: collection.Map[String, String]): String =
        m.map { case (k, v) => s""""${jsonEsc(k)}":$v""" }.mkString("{", ",", "}")
      Some(s"""{"numRecords":$numRecords,"minValues":${obj(mins)},""" +
        s""""maxValues":${obj(maxs)},"nullCount":${obj(nulls.map {
          case (k, v) => k -> v.toString })}}""")
    } catch { case _: Exception => None }
    finally reader.close()
  }

  private def jsonEsc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Render a raw footer min/max as a JSON value, or None when the type
    * can't round-trip safely: timestamps (nano/µs normalization), INT96,
    * decimals (scale lives in the annotation), non-UTF8 binary, non-finite
    * doubles (NaN has no JSON form and no total order).
    */
  private def renderValue(t: PrimitiveType, v: AnyRef): Option[String] = {
    val ann = t.getLogicalTypeAnnotation
    t.getPrimitiveTypeName match {
      case _ if ann.isInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation] => None
      case INT32 if ann.isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation] =>
        Some("\"" + java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[java.lang.Integer].longValue).toString + "\"")
      case INT32 => Some(v.toString)
      case INT64 if ann.isInstanceOf[LogicalTypeAnnotation.TimestampLogicalTypeAnnotation] => None
      case INT64 => Some(v.toString)
      case FLOAT =>
        // Spark evaluates float-vs-literal comparisons after widening the
        // float to double, so bounds must be rendered in the DOUBLE domain:
        // Float.toString(0.1f) = "0.1", but (double)0.1f = 0.10000000149…,
        // and `col > 0.1` matches rows of a file whose float max is 0.1f —
        // the "0.1" rendering would prune that file and change results.
        val f = v.asInstanceOf[java.lang.Float].floatValue
        if (java.lang.Float.isFinite(f)) Some(f.toDouble.toString) else None
      case DOUBLE =>
        val d = v.asInstanceOf[java.lang.Double].doubleValue
        if (java.lang.Double.isFinite(d)) Some(d.toString) else None
      case BOOLEAN => Some(v.toString)
      case BINARY if ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        Some("\"" + jsonEsc(v.asInstanceOf[Binary].toStringUsingUTF8) + "\"")
      case _ => None
    }
  }

  // ───────────────────────── prune (read side) ───────────────────────────

  /** Bounds of one column within one file: inclusive [min,max] in a
    * comparable domain, plus null/record counts. Any field may be unknown.
    */
  private case class Bounds(min: Option[Any], max: Option[Any],
      nullCount: Option[Long], numRecords: Option[Long], isNullPartition: Boolean = false)

  private val HiveNullPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Files of `adds` that MAY contain rows matching `predicate` (SQL text
    * over `schema`'s columns). Conservative: unknown ⇒ kept.
    */
  def prune(spark: org.apache.spark.sql.SparkSession, predicate: String,
      schema: StructType, partitionCols: Seq[String],
      adds: Seq[AddEntry]): Seq[AddEntry] =
    parseConjuncts(spark, predicate) match {
      case None => adds
      case Some(conjuncts) =>
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        adds.filter(entryMayMatch(conjuncts, schema, partitionCols, _, mapper))
    }

  /** The predicate parsed to its AND-conjuncts; None when unparseable
    * (callers must keep every file — conservative, like [[prune]]).
    */
  def parseConjuncts(spark: org.apache.spark.sql.SparkSession,
      predicate: String): Option[Seq[Expression]] =
    try Some(splitAnd(spark.sessionState.sqlParser.parseExpression(predicate)))
    catch { case _: Exception => None }

  /** Per-entry kernel of [[prune]]: session-free and serializable, so a
    * DISTRIBUTED prune over a 10⁷-file snapshot can ship it to executors
    * (parsed conjuncts and the schema ride the closure) — bit-identical
    * keep/skip decisions to the driver-side [[prune]].
    */
  def entryMayMatch(conjuncts: Seq[Expression], schema: StructType,
      partitionCols: Seq[String], add: AddEntry,
      mapper: com.fasterxml.jackson.databind.ObjectMapper): Boolean = {
    val statsNode =
      add.stats.flatMap(s => try Option(mapper.readTree(s)) catch { case _: Exception => None })
    conjuncts.forall(c => mayMatch(c, schema, partitionCols, add, statsNode))
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  private def attrName(e: Expression): Option[String] = e match {
    case u: UnresolvedAttribute => Some(u.nameParts.last)
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  /** Literal → comparable-domain value for `fieldType`; None = can't
    * compare safely (type mismatch, NaN, unsupported type).
    */
  private def literalValue(lit: Literal, fieldType: DataType): Option[Any] =
    (fieldType, lit.dataType) match {
      case (_: NumericType, _: NumericType) =>
        val s = lit.value.toString
        if (s == "NaN" || s.endsWith("Infinity")) None
        else try Some(BigDecimal(s)) catch { case _: Exception => None }
      case (StringType, StringType) =>
        val s = lit.value.toString
        if (s.forall(_ < 128)) Some(s) else None // parquet orders unsigned bytes; ASCII ⊆ both orders
      case (DateType, DateType) => Some(lit.value.asInstanceOf[Int].toLong)
      case (DateType, StringType) =>
        try Some(java.time.LocalDate.parse(lit.value.toString).toEpochDay)
        catch { case _: Exception => None }
      case (BooleanType, BooleanType) => Some(if (lit.value.asInstanceOf[Boolean]) 1L else 0L)
      case _ => None
    }

  /** Stats-JSON min/max node → the same comparable domain as
    * [[literalValue]].
    */
  private def statsValue(node: com.fasterxml.jackson.databind.JsonNode,
      fieldType: DataType): Option[Any] = fieldType match {
    case FloatType =>
      // Widen through float before comparing: external writers (and this
      // framework pre-r5) render float bounds in shortest-float form
      // ("0.1"), but Spark compares floats against literals in the double
      // domain where 0.1f = 0.10000000149… — comparing the exact decimal
      // 0.1 would wrongly prune `f > 0.1`. Idempotent for bounds already
      // rendered in the double domain.
      if (!node.isNumber) None
      else try Some(BigDecimal(node.asText.toFloat.toDouble))
      catch { case _: Exception => None }
    case _: NumericType =>
      if (!node.isNumber) None
      else try Some(BigDecimal(node.asText)) catch { case _: Exception => None }
    case StringType =>
      val s = node.asText
      if (node.isTextual && s.forall(_ < 128)) Some(s) else None
    case DateType =>
      try Some(java.time.LocalDate.parse(node.asText).toEpochDay)
      catch { case _: Exception => None }
    case BooleanType => Some(if (node.asBoolean) 1L else 0L)
    case _ => None
  }

  /** Partition-value string → min=max bounds in the comparable domain. */
  private def partitionBounds(raw: String, fieldType: DataType,
      numRecords: Option[Long]): Bounds = {
    if (raw == null || raw == HiveNullPartition)
      return Bounds(None, None, nullCount = numRecords, numRecords = numRecords,
        isNullPartition = true)
    val v: Option[Any] = fieldType match {
      case FloatType =>
        // Partition path segments render floats in shortest form ("f=0.1");
        // widen to the double domain Spark compares in (see statsValue).
        try Some(BigDecimal(raw.toFloat.toDouble)) catch { case _: Exception => None }
      case _: NumericType => try Some(BigDecimal(raw)) catch { case _: Exception => None }
      case StringType => if (raw.forall(_ < 128)) Some(raw) else None
      case DateType =>
        try Some(java.time.LocalDate.parse(raw).toEpochDay) catch { case _: Exception => None }
      case BooleanType =>
        try Some(if (raw.toBoolean) 1L else 0L) catch { case _: Exception => None }
      case _ => None
    }
    Bounds(v, v, nullCount = Some(0L), numRecords = numRecords)
  }

  private def boundsFor(name: String, schema: StructType, partitionCols: Seq[String],
      add: AddEntry, stats: Option[com.fasterxml.jackson.databind.JsonNode]): Bounds = {
    val field = schema.find(_.name.equalsIgnoreCase(name))
    val fieldType = field.map(_.dataType).getOrElse(return Bounds(None, None, None, None))
    val numRecords = stats.flatMap(s => Option(s.get("numRecords"))).map(_.asLong)
    if (partitionCols.exists(_.equalsIgnoreCase(name))) {
      val raw = add.partitionValues.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v }.orNull
      if (raw == null && !add.partitionValues.keys.exists(_.equalsIgnoreCase(name)))
        Bounds(None, None, None, numRecords) // value not recorded: unknown
      else partitionBounds(raw, fieldType, numRecords)
    } else {
      def node(section: String) = stats.flatMap(s => Option(s.get(section)))
        .flatMap(s => Option(s.get(field.get.name)))
      Bounds(
        node("minValues").flatMap(statsValue(_, fieldType)),
        node("maxValues").flatMap(statsValue(_, fieldType)),
        node("nullCount").map(_.asLong), numRecords)
    }
  }

  @inline private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => x.compare(y)
    case (x: String, y: String) => x.compareTo(y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case _ => 0
  }

  /** Can any row of `add` match `conjunct`? Unknown ⇒ true. */
  private def mayMatch(conjunct: Expression, schema: StructType,
      partitionCols: Seq[String], add: AddEntry,
      stats: Option[com.fasterxml.jackson.databind.JsonNode]): Boolean = {

    def bounds(name: String) = boundsFor(name, schema, partitionCols, add, stats)
    def fieldType(name: String): Option[DataType] =
      schema.find(_.name.equalsIgnoreCase(name)).map(_.dataType)
    def allNull(b: Bounds): Boolean =
      b.isNullPartition ||
        (b.nullCount.isDefined && b.numRecords.isDefined &&
          b.numRecords.get > 0 && b.nullCount.get == b.numRecords.get)

    // comparison of column `name` against literal `lit`, op given as the
    // test the FILE RANGE must pass to possibly contain a matching row
    def compare(name: String, lit: Literal, test: (Bounds, Any) => Boolean): Boolean = {
      val b = bounds(name)
      if (allNull(b)) return false // comparisons never match null
      fieldType(name).flatMap(literalValue(lit, _)) match {
        case Some(v) => test(b, v)
        case None => true
      }
    }

    conjunct match {
      case EqualTo(a, l: Literal) if attrName(a).isDefined =>
        compare(attrName(a).get, l, (b, v) =>
          b.min.forall(cmp(_, v) <= 0) && b.max.forall(cmp(v, _) <= 0))
      case EqualTo(l: Literal, a) if attrName(a).isDefined =>
        mayMatch(EqualTo(a, l), schema, partitionCols, add, stats)
      case LessThan(a, l: Literal) if attrName(a).isDefined =>
        compare(attrName(a).get, l, (b, v) => b.min.forall(cmp(_, v) < 0))
      case LessThanOrEqual(a, l: Literal) if attrName(a).isDefined =>
        compare(attrName(a).get, l, (b, v) => b.min.forall(cmp(_, v) <= 0))
      case GreaterThan(a, l: Literal) if attrName(a).isDefined =>
        compare(attrName(a).get, l, (b, v) => b.max.forall(cmp(v, _) < 0))
      case GreaterThanOrEqual(a, l: Literal) if attrName(a).isDefined =>
        compare(attrName(a).get, l, (b, v) => b.max.forall(cmp(v, _) <= 0))
      // flipped literal-first comparisons: rewrite to column-first
      case LessThan(l: Literal, a) if attrName(a).isDefined =>
        mayMatch(GreaterThan(a, l), schema, partitionCols, add, stats)
      case LessThanOrEqual(l: Literal, a) if attrName(a).isDefined =>
        mayMatch(GreaterThanOrEqual(a, l), schema, partitionCols, add, stats)
      case GreaterThan(l: Literal, a) if attrName(a).isDefined =>
        mayMatch(LessThan(a, l), schema, partitionCols, add, stats)
      case GreaterThanOrEqual(l: Literal, a) if attrName(a).isDefined =>
        mayMatch(LessThanOrEqual(a, l), schema, partitionCols, add, stats)
      case In(a, elems) if attrName(a).isDefined && elems.forall(_.isInstanceOf[Literal]) =>
        elems.exists(l => mayMatch(EqualTo(a, l.asInstanceOf[Literal]),
          schema, partitionCols, add, stats))
      case IsNull(a) if attrName(a).isDefined =>
        val b = bounds(attrName(a).get)
        b.isNullPartition || b.nullCount.forall(_ > 0)
      case IsNotNull(a) if attrName(a).isDefined =>
        val b = bounds(attrName(a).get)
        !allNull(b)
      case _ => true // OR trees, functions, column-to-column — no pruning
    }
  }
}
