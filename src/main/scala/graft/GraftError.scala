package graft

import org.apache.spark.sql.AnalysisException

/** Rich error taxonomy mirroring the reference's 18-variant ElusionError
  * (reference src/custom_error/cust_error.rs:14-108 + the
  * AnalysisException→variant mapping at src/elusion.rs:3702-3842):
  * Spark `AnalysisException`s are pattern-matched into targeted variants
  * with a suggestion line.
  */
sealed abstract class GraftError(message: String, val suggestion: String)
    extends RuntimeException(s"$message\nSuggestion: $suggestion")

object GraftError {
  final case class MissingColumn(column: String, available: Seq[String])
      extends GraftError(
        s"Column '$column' not found",
        if (available.nonEmpty)
          s"Did you mean one of: ${closest(column, available).mkString(", ")}?"
        else "Check the column list with dfSchema()")

  final case class GroupByError(detail: String) extends GraftError(
    s"GROUP BY error: $detail",
    "Every non-aggregate selected column must appear in groupBy(); use groupByAll() to add them automatically")

  final case class JoinError(detail: String) extends GraftError(
    s"Join error: $detail",
    "Qualify columns as alias.column and check both frames' aliases")

  final case class WindowFunctionError(detail: String) extends GraftError(
    s"Window function error: $detail",
    "PARTITION BY / ORDER BY columns must exist in the underlying frame")

  final case class DuplicateColumn(column: String) extends GraftError(
    s"Duplicate column '$column' in result",
    "Alias one side (SELECT t.col AS other_name) or drop the duplicate")

  final case class InvalidSql(detail: String, sql: String) extends GraftError(
    s"Generated SQL failed to parse: $detail\nSQL: $sql",
    "Inspect the builder chain with displayQuery()")

  final case class SetOperationError(detail: String) extends GraftError(
    s"Set operation error: $detail",
    "UNION/EXCEPT/INTERSECT require the same column count and compatible types")

  final case class InvalidDataType(detail: String) extends GraftError(
    s"Type error: $detail",
    "Add an explicit cast (col::TYPE or CAST(col AS TYPE))")

  final case class LimitExceeded(detail: String) extends GraftError(
    s"Limit exceeded: $detail", "Reduce the configured resource limit usage")

  final case class OrderByError(detail: String, columns: Seq[String])
      extends GraftError(
        s"ORDER BY error: $detail" +
          (if (columns.nonEmpty) s" (columns: ${columns.mkString(", ")})" else ""),
        "Direction must be ASC or DESC (case-insensitive)")

  final case class SchemaError(detail: String) extends GraftError(
    s"Schema error: $detail",
    """Schema spec shape: {"fields":[{"name":…,"type":…,"nullable":…}]} with supported type names (i8…i64, u8…u64, f32/f64, string, bool, date, timestamp, binary)""")

  final case class WriteError(path: String, operation: String, reason: String)
      extends GraftError(
        s"Write error during $operation at '$path': $reason",
        "Check the write mode (overwrite/append/merge) and that appended columns match the existing data")

  final case class PartitionError(detail: String, partitionColumns: Seq[String])
      extends GraftError(
        s"Partition error: $detail" +
          (if (partitionColumns.nonEmpty) s" (partition columns: ${partitionColumns.mkString(", ")})" else ""),
        "Appends must declare the table's existing partition columns; use overwrite to change partitioning")

  final case class InvalidOperation(operation: String, reason: String)
      extends GraftError(
        s"Invalid operation '$operation': $reason",
        "See the loader/writer surface in README.md for supported formats, modes and arguments")

  /** Simple edit-distance suggestion, like the reference's
    * find_similar_columns helper.
    */
  private[graft] def closest(target: String, candidates: Seq[String], k: Int = 3): Seq[String] = {
    def dist(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    candidates.sortBy(c => dist(target.toLowerCase, c.toLowerCase)).take(k)
  }

  private val UnresolvedColumn =
    """(?s).*UNRESOLVED_COLUMN[^`]*`([^`]+)`.*""".r
  private val UnresolvedWithSuggestion =
    """(?s).*A column, variable, or function parameter with name `?([^`\s]+)`?.*""".r
  private val MissingAgg = """(?s).*MISSING_AGGREGATION.*""".r
  private val MissingGroupBy = """(?s).*MISSING_GROUP_BY.*""".r
  private val Ambiguous = """(?s).*AMBIGUOUS_REFERENCE[^`]*`([^`]+)`.*""".r
  private val ParseError = """(?s).*PARSE_SYNTAX_ERROR(.*)""".r
  private val NumColumns = """(?s).*NUM_COLUMNS_MISMATCH.*""".r
  private val CastError = """(?s).*(CANNOT_CAST|CAST_INVALID_INPUT|DATATYPE_MISMATCH)(.*)""".r

  /** Map a Spark failure into the taxonomy (best effort — unknown shapes
    * re-throw unchanged, never swallowing the original).
    */
  def translate(e: Throwable, sql: => String = "", available: Seq[String] = Nil): Throwable =
    e match {
      case ae: AnalysisException =>
        ae.getMessage match {
          case MissingAgg() | MissingGroupBy() => GroupByError(firstLine(ae))
          case Ambiguous(c) => DuplicateColumn(c)
          case UnresolvedColumn(c) => MissingColumn(c, available)
          case ParseError(_) => InvalidSql(firstLine(ae), sql)
          case NumColumns() => SetOperationError(firstLine(ae))
          case CastError(_, _) => InvalidDataType(firstLine(ae))
          case m if m.contains("window") || m.contains("OVER") =>
            WindowFunctionError(firstLine(ae))
          case UnresolvedWithSuggestion(c) => MissingColumn(c, available)
          case _ => ae
        }
      case other => other
    }

  private def firstLine(e: Throwable): String =
    e.getMessage.linesIterator.take(2).mkString(" ").take(300)
}
