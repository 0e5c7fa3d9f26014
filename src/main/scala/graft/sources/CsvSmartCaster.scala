package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's flagship CSV loader re-expressed Spark-side
  * (reference: src/features/csv.rs — delimiter detection 41-90, sampling
  * 168-205, value classification 319-447, majority vote 340-391, cast
  * projection 755-823; SURVEY §1.2).
  *
  * Pipeline: detect delimiter on 10 head lines → read ALL columns as
  * string → sample 100 rows (driver-side limit().collect(), the only
  * driver touch, bounded at 100 rows regardless of file size — the
  * reference collects the whole file to sample, an anti-optimization
  * SURVEY §4.1 flags) → per-column majority vote (>80 % over ≤50 non-null
  * samples) into {Integer, Float, Boolean, Date, String} → one generated
  * CASE WHEN rlike THEN CAST projection per column (codegen-friendly
  * Column expressions, no UDFs).
  */
object CsvSmartCaster {

  sealed trait VClass
  case object VInteger extends VClass
  case object VFloat extends VClass
  case object VBoolean extends VClass
  case object VDate extends VClass
  case object VString extends VClass
  case object VNull extends VClass

  /** Null sentinels (csv.rs:35-37). */
  val NullSentinels: Set[String] = Set("", "NULL", "null", "N/A", "n/a", "-")

  private val IntRe = """^[+-]?\d+$""".r
  // US 1,234.56 / EU 1.234,56 / plain 12.34 or 12,34 / currency / percent
  private val FloatRe =
    ("""^[+-]?[$€£¥₹]?\s?(""" +
      """\d{1,3}(,\d{3})+(\.\d+)?""" + "|" + // US thousands
      """\d{1,3}(\.\d{3})+(,\d+)""" + "|" +  // EU thousands (decimal comma
                                             // REQUIRED — '999.999.999' is
                                             // String, csv.rs:868-917)
      """\d+[.,]\d+""" + "|" +               // plain decimal (either mark)
      """\d+""" +                            // int-with-symbol
      """)%?$""").r
  private val BoolRe = """^(?i)(true|false|yes|no|da|ne)$""".r
  private val DateRes = Seq(
    """^\d{4}-\d{2}-\d{2}$""".r,           // ISO
    """^\d{1,2}\.\d{1,2}\.\d{4}\.?$""".r,  // EU dotted
    """^\d{1,2}/\d{1,2}/\d{4}$""".r,       // US slash
    """^\d{1,2}:\d{2}(:\d{2})?$""".r)      // time

  /** Classify one raw string value (csv.rs:319-447). */
  def classify(v: String): VClass = {
    val t = v.trim
    if (NullSentinels.contains(t)) VNull
    else if (BoolRe.matches(t)) VBoolean
    else if (IntRe.matches(t)) VInteger
    else if (DateRes.exists(_.matches(t))) VDate
    else if (FloatRe.matches(t) && t.exists(c => c == '.' || c == ',' || c == '%' || "$€£¥₹".contains(c)))
      VFloat
    else VString
  }

  /** >80 % majority over ≤50 non-null samples → column class
    * (csv.rs:340-391); defaults to String.
    */
  def vote(samples: Seq[String]): VClass = {
    val classes = samples.iterator.map(classify).filter(_ != VNull).take(50).toSeq
    if (classes.isEmpty) VString
    else {
      val (winner, n) = classes.groupBy(identity).view.mapValues(_.size).maxBy(_._2)
      // Integer values inside a float column are fine: merge if mixed int/float
      val effective =
        if (winner == VInteger && classes.contains(VFloat)) VFloat
        else if (winner == VFloat && classes.forall(c => c == VFloat || c == VInteger)) VFloat
        else winner
      val nEff =
        if (effective == VFloat) classes.count(c => c == VFloat || c == VInteger)
        else n
      if (nEff.toDouble / classes.size > 0.8) effective else VString
    }
  }

  /** Delimiter auto-detect over `,;\t|` by count-consistency on 10 lines
    * (csv.rs:41-90).
    */
  def detectDelimiter(lines: Seq[String]): String = {
    val candidates = Seq(",", ";", "\t", "|")
    val scored = candidates.map { d =>
      val counts = lines.filter(_.nonEmpty).map(_.count(_ == d.charAt(0)))
      val consistent = counts.nonEmpty && counts.distinct.size == 1 && counts.head > 0
      (d, if (consistent) counts.head else 0)
    }
    val best = scored.maxBy(_._2)
    if (best._2 > 0) best._1 else ","
  }

  private def nullGuard(c: Column): Column =
    c.isNull || trim(c).isin(NullSentinels.toSeq: _*)

  /** The generated smart-cast expression per column class
    * (create_casting_expression, csv.rs:755-823). Integer→BIGINT,
    * Float→DOUBLE (currency stripped, % → /100, EU separators fixed),
    * Boolean→BOOLEAN (da/yes→true), Date stays STRING (csv.rs:818-821).
    */
  def castExpr(c: Column, cls: VClass): Column = cls match {
    case VInteger =>
      when(nullGuard(c), lit(null).cast(LongType))
        .otherwise(trim(c).cast(LongType))
    case VFloat =>
      val t = trim(regexp_replace(trim(c), """[$€£¥₹\s]""", ""))
      val isPct = t.endsWith(lit("%"))
      val noPct = regexp_replace(t, "%$", "")
      // EU style: dots as thousands, comma as decimal mark. The decimal
      // comma is REQUIRED (matches the classifier above and csv.rs branch
      // order): '0.123' / '12.345' are plain decimals, NOT EU thousands —
      // an optional comma here silently inflated them 1000×.
      val isEu = noPct.rlike("""^[+-]?(\d{1,3}(\.\d{3})+(,\d+)|\d+,\d+)$""")
      val normalized = when(isEu,
        regexp_replace(regexp_replace(noPct, """\.""", ""), ",", "."))
        .otherwise(regexp_replace(noPct, ",", ""))
      val asNum = normalized.cast(DoubleType)
      when(nullGuard(c), lit(null).cast(DoubleType))
        .otherwise(when(isPct, asNum / 100.0).otherwise(asNum))
    case VBoolean =>
      when(nullGuard(c), lit(null).cast(BooleanType))
        .otherwise(lower(trim(c)).isin("true", "yes", "da"))
    case VDate | VString =>
      when(nullGuard(c), lit(null).cast(StringType)).otherwise(c)
    case VNull => lit(null).cast(StringType)
  }

  /** Full smart load (csv.rs:41-317 composed). */
  def load(spark: SparkSession, path: String): DataFrame = {
    val headLines = spark.read.textFile(path).limit(10).collect().toSeq
    val delim = detectDelimiter(headLines)
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .option("sep", delim)
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)
    val normNames = graft.normalize.Normalize.sanitizeHeaders(raw.columns.toSeq)
    val named = raw.toDF(normNames: _*)
    val sample = named.limit(100).collect()
    val classes = normNames.zipWithIndex.map { case (n, i) =>
      val values = sample.toSeq.flatMap(r => Option(r.getString(i)))
      n -> vote(values)
    }.toMap
    named.select(normNames.map(n => castExpr(col(n), classes(n)).as(n)): _*)
  }
}
