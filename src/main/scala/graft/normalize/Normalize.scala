package graft.normalize

/** Expression normalization layer — the Spark-side equivalent of the
  * reference's regex normalizer (reference: src/normalizers/normalize.rs).
  *
  * The reference is a SQL-string-building DSL: every builder argument is a
  * SQL text fragment that gets lowercased, alias-split, `::cast`-rewritten
  * and routed by head function (normalize.rs:190-304). We keep the same
  * contract but emit Spark SQL: identifiers are lowercased outside string
  * literals (all columns are lowercased at load), Postgres `::TYPE` casts
  * become `CAST(expr AS type)`, and the aggregate-function gate
  * (normalize.rs:43-53, 930-939) is preserved verbatim — including the
  * deliberate inclusion of scalar math heads so `ROUND(SUM(x),2)` passes.
  */
object Normalize {

  /** Aggregate gate — reference normalize.rs:43-53. Deliberately also
    * contains scalar math names so nested `ROUND(SUM(x),2)` style
    * expressions pass the `.agg()` filter (normalize.rs:48-51).
    */
  val AggregateFunctions: Set[String] = Set(
    "sum", "avg", "mean", "median", "min", "max", "count",
    "last_value", "first_value", "grouping", "string_agg", "array_agg",
    "var", "var_pop", "var_population", "var_samp", "var_sample",
    "bit_and", "bit_or", "bit_xor", "bool_and", "bool_or",
    "stddev", "stddev_pop", "stddev_samp", "corr",
    "approx_count_distinct", "count_distinct", "percentile_approx",
    // scalar math heads intentionally allowed (reference parity):
    "abs", "floor", "ceil", "sqrt", "isnan", "iszero", "pi", "pow",
    "power", "radians", "random", "round", "factorial", "acos", "acosh",
    "asin", "asinh", "atan", "atanh", "atan2", "cos", "cosh", "cot",
    "sin", "sinh", "tan", "tanh", "degrees", "exp", "trunc", "cbrt",
    "gcd", "lcm", "ln", "log", "log10", "log2", "nanvl", "signum",
    "coalesce", "nullif", "cast"
  )

  /** Inner aggregate heads — used to decide whether an expression *contains*
    * an aggregation anywhere (for group_by_all groupability,
    * normalize.rs:1138-1158).
    */
  val TrueAggregates: Set[String] = Set(
    "sum", "avg", "mean", "median", "min", "max", "count", "last_value",
    "first_value", "grouping", "string_agg", "array_agg", "var", "var_pop",
    "var_population", "var_samp", "var_sample", "bit_and", "bit_or",
    "bit_xor", "bool_and", "bool_or", "stddev", "stddev_pop", "stddev_samp",
    "corr", "approx_count_distinct", "count_distinct", "percentile_approx",
    "collect_list", "collect_set"
  )

  val WindowFunctions: Set[String] = Set(
    "row_number", "rank", "dense_rank", "percent_rank", "cume_dist",
    "ntile", "lag", "lead", "first_value", "last_value", "nth_value"
  )

  /** Postgres-style cast target → Spark SQL type (reference
    * normalize.rs:38-41 + with_schema.rs:367-386).
    */
  val CastTypes: Map[String, String] = Map(
    "text" -> "STRING", "varchar" -> "STRING", "string" -> "STRING",
    "int" -> "INT", "integer" -> "INT", "int4" -> "INT",
    "bigint" -> "BIGINT", "int8" -> "BIGINT", "smallint" -> "SMALLINT",
    "float" -> "FLOAT", "float4" -> "FLOAT", "real" -> "FLOAT",
    "double" -> "DOUBLE", "float8" -> "DOUBLE",
    "boolean" -> "BOOLEAN", "bool" -> "BOOLEAN",
    "date" -> "DATE", "date32" -> "DATE",
    "timestamp" -> "TIMESTAMP", "binary" -> "BINARY",
    "decimal" -> "DECIMAL(38,9)"
  )

  /** Lowercase everything outside single-quoted string literals. Spark SQL
    * keywords/functions are case-insensitive, so this only affects
    * identifiers — matching the reference's lowercase-all-identifiers rule
    * (normalize.rs:692-721) given columns are lowercased at load.
    */
  def lowerOutsideQuotes(s: String): String = {
    val out = new StringBuilder(s.length)
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') {
        // '' inside a literal is an escaped quote, stay in-string
        if (inStr && i + 1 < s.length && s.charAt(i + 1) == '\'') {
          out.append("''"); i += 1
        } else { inStr = !inStr; out.append(c) }
      } else {
        out.append(if (inStr) c else Character.toLowerCase(c))
      }
      i += 1
    }
    out.toString
  }

  private val CastRe =
    ("""([A-Za-z_][A-Za-z0-9_.]*\([^()]*(?:\([^()]*\)[^()]*)*\)""" + // f(...) incl. one nesting
      """|\([^()]*\)|'[^']*'|[A-Za-z_][A-Za-z0-9_.]*|[0-9]+(?:\.[0-9]+)?)::([A-Za-z0-9_]+)""").r

  /** Rewrite `expr::TYPE` → `CAST(expr AS type)` (normalize.rs:175-188).
    * Applied repeatedly so chained casts resolve.
    */
  def rewriteCasts(s: String): String = {
    var cur = s
    var prev = ""
    while (cur != prev) {
      prev = cur
      cur = CastRe.replaceAllIn(cur, m => {
        val tgt = CastTypes.getOrElse(m.group(2).toLowerCase, m.group(2).toUpperCase)
        java.util.regex.Matcher.quoteReplacement(s"CAST(${m.group(1)} AS $tgt)")
      })
    }
    cur
  }

  /** Full expression normalization: cast rewrite then lowercase-outside-
    * quotes. Returns Spark-SQL-ready text.
    */
  def normalizeExpression(e: String): String =
    lowerOutsideQuotes(rewriteCasts(e.trim))

  /** Split a trailing top-level ` AS alias` off an expression. Quote- and
    * paren-aware (normalize.rs alias handling).
    */
  def splitAlias(e: String): (String, Option[String]) = {
    val s = e.trim
    var depth = 0
    var inStr = false
    var i = 0
    var lastAs = -1
    while (i < s.length - 3) {
      val c = s.charAt(i)
      if (c == '\'') inStr = !inStr
      else if (!inStr) {
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (depth == 0 && (c == ' ' || c == '\t') &&
          (s.charAt(i + 1) == 'a' || s.charAt(i + 1) == 'A') &&
          (s.charAt(i + 2) == 's' || s.charAt(i + 2) == 'S') &&
          (i + 3 < s.length && s.charAt(i + 3).isWhitespace)) {
          lastAs = i
        }
      }
      i += 1
    }
    if (lastAs >= 0) {
      val expr = s.substring(0, lastAs).trim
      val alias = s.substring(lastAs + 4).trim
        .stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("`").stripSuffix("`")
      if (alias.nonEmpty && alias.matches("[A-Za-z_][A-Za-z0-9_]*"))
        (expr, Some(alias.toLowerCase))
      else (s, None)
    } else (s, None)
  }

  /** Head (outermost) function name of an expression, lowercased. */
  def headFunction(e: String): Option[String] = {
    val m = """^\s*([A-Za-z_][A-Za-z0-9_]*)\s*\(""".r.findFirstMatchIn(e)
    m.map(_.group(1).toLowerCase)
  }

  /** The `.agg()` gate: expression kept only if its head function is in
    * AggregateFunctions (reference normalize.rs:930-939 — silently dropped
    * otherwise).
    */
  def passesAggregateGate(e: String): Boolean = {
    val (expr, _) = splitAlias(e)
    headFunction(expr).exists(AggregateFunctions.contains)
  }

  /** Does the expression contain a true aggregate call anywhere? Used for
    * group_by_all groupability (normalize.rs:1138-1158).
    */
  def containsAggregate(e: String): Boolean = {
    val lower = lowerOutsideQuotes(e)
    TrueAggregates.exists(f => s"""\\b$f\\s*\\(""".r.findFirstIn(lower).isDefined)
  }

  /** Does the expression contain an OVER (...) window clause? */
  def containsWindow(e: String): Boolean =
    """\bover\s*\(""".r.findFirstIn(lowerOutsideQuotes(e)).isDefined

  /** Groupable in group_by_all terms: selected, not an aggregate, not a
    * window expression (reference normalize.rs:1138-1158).
    */
  def isGroupable(e: String): Boolean =
    !containsAggregate(e) && !containsWindow(e)

  /** Normalize one window expression `FUNC(args) OVER (...) [AS a]`
    * (normalize.rs:546-584). Spark executes the text directly.
    */
  def normalizeWindowExpression(e: String): String = normalizeExpression(e)

  /** Tokens that are never column references in dependency extraction:
    * SQL keywords, window-frame words, interval units, cast type names.
    */
  private val DependencyStopWords: Set[String] =
    Set("over", "partition", "by", "order", "rows", "range", "between",
      "and", "or", "not", "unbounded", "preceding", "following", "current",
      "row", "asc", "desc", "as", "case", "when", "then", "else", "end",
      "null", "true", "false", "distinct", "interval", "is", "in", "like",
      "rlike", "exists", "from", "nulls", "first", "last", "ignore",
      "respect", "filter", "within", "group", "escape", "day", "days",
      "month", "months", "year", "years", "hour", "hours", "minute",
      "minutes", "second", "seconds", "week", "weeks") ++
      CastTypes.keySet ++ CastTypes.values.map(_.toLowerCase)

  /** The column identifiers an expression DEPENDS on for grouping
    * purposes: bare or dot-qualified identifiers that are not function
    * calls, not keywords/type names, and not inside a true-aggregate call
    * body (columns inside `SUM(...)` are aggregated, not grouped — so
    * `SUM(x) OVER (PARTITION BY b)` depends only on `b`, while
    * `LAG(price) OVER (...)` depends on `price`). Heuristic tokenizer,
    * not a parser — the reference extracts dependencies with regexes
    * (src/elusion.rs:4041-4071); this version tracks paren depth so
    * nested calls resolve correctly.
    */
  def columnDependencies(expr: String): Seq[String] = {
    val s = lowerOutsideQuotes(expr)
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    var depth = 0
    var skipDepth = -1 // ≥ 0 ⇒ inside an aggregate call entered at that depth
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      // inside a literal, honor backslash escapes (Spark's default string
      // parsing): `'o\'brien'` must not toggle out of the string, or the
      // tail would be tokenized as column identifiers and the group_by_all
      // validation would reject a query Spark executes fine
      if (inStr && c == '\\') i += 2
      else if (c == '\'') { inStr = !inStr; i += 1 }
      else if (inStr) i += 1
      else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') {
        depth -= 1
        if (skipDepth >= 0 && depth <= skipDepth) skipDepth = -1
        i += 1
      } else if ((c.isLetter || c == '_') &&
          (i == 0 || !(s.charAt(i - 1).isLetterOrDigit || s.charAt(i - 1) == '.'))) {
        val start = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit ||
            s.charAt(i) == '_' || s.charAt(i) == '.')) i += 1
        val tok = s.substring(start, i)
        var j = i
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        val isFn = j < s.length && s.charAt(j) == '('
        if (skipDepth < 0) {
          if (isFn) { if (TrueAggregates.contains(tok)) skipDepth = depth }
          else if (!DependencyStopWords.contains(tok)) out += tok
        }
      } else i += 1
    }
    out.toSeq
  }

  /** Filter/HAVING condition normalization with string-literal protection
    * (normalize.rs:805-897).
    */
  def normalizeCondition(c: String): String = normalizeExpression(c)

  /** Column-name normalization applied at load: lowercase, trim,
    * spaces→underscores (normalize.rs:692-721, README.md:277-281).
    */
  def normalizeColumnName(name: String): String =
    name.trim.toLowerCase.replaceAll("\\s+", "_")

  /** Excel-style header sanitation: non-alphanumerics → underscore, dedupe
    * with _2, _3 … suffixes (reference src/features/excel.rs:448-470).
    */
  def sanitizeHeaders(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    names.map { n =>
      val base0 = n.trim.toLowerCase.replaceAll("[^a-z0-9_]+", "_")
        .replaceAll("_+", "_").stripPrefix("_").stripSuffix("_")
      val base = if (base0.isEmpty) "col" else base0
      val k = seen.getOrElse(base, 0)
      seen(base) = k + 1
      if (k == 0) base else s"${base}_${k + 1}"
    }
  }
}
