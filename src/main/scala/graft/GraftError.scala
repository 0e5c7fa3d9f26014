package graft

import org.apache.spark.sql.AnalysisException

/** Rich error taxonomy mirroring the reference's ElusionError
  * (reference src/custom_error/cust_error.rs:14-108 + the
  * AnalysisException→variant mapping at src/elusion.rs:3702-3842):
  * Spark `AnalysisException`s are pattern-matched into targeted variants
  * with a suggestion line. Every reference variant is covered except the
  * engine/connector passthroughs (DataFusion → we re-throw the original
  * AnalysisException when no variant matches; Io → loader errors surface
  * as typed InvalidOperation/WriteError; OneLakeError → connector
  * non-goal per SURVEY §7.5; Custom → typed variants instead).
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

  final case class ConstraintViolation(path: String, operation: String,
      violations: Seq[(String, Long)])
      extends GraftError(
        s"$operation on '$path' rejected — the incoming rows violate the " +
          "table's declared constraints: " +
          violations.map { case (label, n) => s"$label [$n row(s)]" }
            .mkString("; "),
        "CHECK constraints reject rows where the expression is not TRUE (a NULL result rejects too — delta-spark's CheckDeltaInvariant rule, stricter than SQL CHECK); NOT NULL invariants reject NULL values, nested struct fields included. Fix the offending rows, or recreate the table without the constraint")

  final case class ConcurrentModification(path: String, operation: String,
      detail: String)
      extends GraftError(
        s"$operation on '$path' lost to a concurrent writer whose commit " +
          s"logically conflicts: $detail",
        "The operation's file sets were computed against a snapshot the concurrent commit invalidated; re-run it against the fresh snapshot (logically DISJOINT concurrent commits rebase automatically and never raise this)")

  final case class MissingColumnWithContext(column: String,
      available: Seq[String], context: String, location: String)
      extends GraftError(
        s"Column '$column' not found — $context (in $location)",
        if (available.nonEmpty)
          s"Did you mean one of: ${closest(column, available).mkString(", ")}?"
        else "Check the column list with dfSchema()")

  final case class AggregationError(function: String, column: String,
      detail: String) extends GraftError(
    s"Aggregation error in $function($column): $detail",
    "Check .agg([...]) syntax: aggregate calls cannot nest, and argument columns must exist in the source tables")

  final case class LimitError(value: Long, detail: String) extends GraftError(
    s"Limit error: $detail (got $value)",
    "Use a positive row count")

  final case class GroupByAllWindowError(missingColumn: String,
      windowContext: String) extends GraftError(
    s"group_by_all() + window function issue: the window function needs column '$missingColumn' but it is not in .select() — $windowContext",
    s"Add '$missingColumn' to .select([...]), or use manual .group_by([...]) listing only the columns you want grouped")

  final case class GroupByAllDependencyError(missingColumn: String,
      dependencyContext: String) extends GraftError(
    s"group_by_all() dependency issue: column '$missingColumn' is referenced but not selected — $dependencyContext",
    s"group_by_all() groups by ALL selected columns, so it needs '$missingColumn' selected first. Either add it to .select([...]), switch to manual .group_by([...]), or remove the reference to '$missingColumn'")

  final case class GroupByAllCompatibilityError(missingColumns: Seq[String],
      windowDependencies: Seq[(String, String)]) extends GraftError(
    s"group_by_all() incompatibility: columns ${missingColumns.mkString("'", "', '", "'")} are referenced by window/aggregate expressions but not selected" +
      (if (windowDependencies.nonEmpty)
        s"; window dependencies: ${windowDependencies.map { case (w, c) => s"$c (in $w)" }.mkString("; ")}"
      else ""),
    "Add the missing columns to .select([...]) or use manual .group_by([...])")

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
  private val NestedAgg =
    """(?s).*(NESTED_AGGREGATE_FUNCTION|GROUP_BY_AGGREGATE).*""".r
  private val AggCall = """([a-z_]+)\s*\(\s*([a-z_][a-z0-9_.]*)?""".r
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
          case NestedAgg(_) =>
            // nested aggregates / aggregate in GROUP BY — reference
            // AggregationError (cust_error.rs:69-74, elusion.rs:3806-3817)
            val (fn, c) = AggCall.findFirstMatchIn(ae.getMessage.toLowerCase)
              .map(m => (m.group(1), Option(m.group(2)).getOrElse("?")))
              .getOrElse(("aggregate", "?"))
            AggregationError(fn, c, firstLine(ae))
          case MissingAgg() | MissingGroupBy() => GroupByError(firstLine(ae))
          case Ambiguous(c) => DuplicateColumn(c)
          case UnresolvedColumn(c) => MissingColumn(c, available)
          case ParseError(_) => InvalidSql(firstLine(ae), sql)
          case NumColumns() => SetOperationError(firstLine(ae))
          case CastError(_, _) => InvalidDataType(firstLine(ae))
          case m if m.contains("window") || m.contains("OVER") =>
            WindowFunctionError(firstLine(ae))
          case UnresolvedWithSuggestion(c) =>
            // looser unresolved-reference shape: we know the SQL that
            // failed, so attach it (reference MissingColumnWithContext,
            // cust_error.rs:16-22 / elusion.rs:3723-3729)
            if (sql.nonEmpty)
              MissingColumnWithContext(c, available, "reference could not be resolved",
                sql.take(120))
            else MissingColumn(c, available)
          case _ => ae
        }
      case other => other
    }

  private def firstLine(e: Throwable): String =
    e.getMessage.linesIterator.take(2).mkString(" ").take(300)
}
