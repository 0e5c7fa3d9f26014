package graft.normalize

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference normalizer's golden-string tests
  * (reference src/normalizers/normalize.rs:1162-1643 — the SURVEY §5 spec).
  */
class NormalizeSpec extends AnyFunSuite {
  import Normalize._

  test("postgres casts rewrite to CAST(... AS ...)") {
    assert(rewriteCasts("godina::TEXT") == "CAST(godina AS STRING)")
    assert(rewriteCasts("x::INTEGER + 1") == "CAST(x AS INT) + 1")
    assert(rewriteCasts("(a + b)::DOUBLE") == "CAST((a + b) AS DOUBLE)")
    assert(rewriteCasts("'12'::BIGINT") == "CAST('12' AS BIGINT)")
    assert(rewriteCasts("t.col::VARCHAR") == "CAST(t.col AS STRING)")
  }

  test("chained casts resolve") {
    assert(rewriteCasts("x::INT::TEXT") == "CAST(CAST(x AS INT) AS STRING)")
  }

  test("lowercasing preserves string literals") {
    assert(lowerOutsideQuotes("UPPER(Name) AS N") == "upper(name) as n")
    assert(lowerOutsideQuotes("CASE WHEN x = 'TOP_5' THEN 'A' END") ==
      "case when x = 'TOP_5' then 'A' end")
    assert(lowerOutsideQuotes("CONCAT(Region, ' - Rank ')") ==
      "concat(region, ' - Rank ')")
  }

  test("escaped quotes stay inside literals") {
    assert(lowerOutsideQuotes("X = 'O''Brien AND Y'") == "x = 'O''Brien AND Y'")
  }

  test("alias splitting is paren- and quote-aware") {
    assert(splitAlias("SUM(x) AS total") == ("SUM(x)", Some("total")))
    assert(splitAlias("CAST(a AS INT)") == ("CAST(a AS INT)", None))
    assert(splitAlias("CONCAT(a, ' AS ', b) AS label") ==
      ("CONCAT(a, ' AS ', b)", Some("label")))
    assert(splitAlias("x") == ("x", None))
  }

  test("aggregate gate admits aggregate heads and scalar-math wrappers") {
    assert(passesAggregateGate("SUM(x) AS s"))
    assert(passesAggregateGate("ROUND(SUM(x), 2) AS s")) // reference parity
    assert(passesAggregateGate("COUNT(*) AS n"))
    assert(!passesAggregateGate("UPPER(name) AS u"))
    assert(!passesAggregateGate("x + 1 AS y"))
  }

  test("containsAggregate sees nested aggregates; groupable excludes them") {
    assert(containsAggregate("ROUND(SUM(x), 2)"))
    assert(!containsAggregate("ROUND(x, 2)"))
    assert(isGroupable("UPPER(name)"))
    assert(!isGroupable("SUM(x)"))
    assert(!isGroupable("ROW_NUMBER() OVER (ORDER BY x)"))
  }

  test("columnDependencies: window deps exclude aggregate bodies and keywords") {
    // aggregate args are aggregated, not grouped — only b is a dependency
    assert(columnDependencies("SUM(x) OVER (PARTITION BY b)") == Seq("b"))
    // non-aggregate function args ARE dependencies
    assert(columnDependencies("LAG(price) OVER (PARTITION BY dept ORDER BY ts)") ==
      Seq("price", "dept", "ts"))
    // frame keywords, cast targets, literals and numbers are not columns
    assert(columnDependencies(
      "AVG(v) OVER (ORDER BY d ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)") == Seq("d"))
    assert(columnDependencies("CAST(x AS BIGINT) + y") == Seq("x", "y"))
    assert(columnDependencies("ROUND(SUM(amount) + id, 2)") == Seq("id"))
    assert(columnDependencies("CASE WHEN a > 1 THEN 'x' ELSE b::TEXT END") ==
      Seq("a", "b"))
    // qualified identifiers survive as-is; scientific literals don't leak
    assert(columnDependencies("t.col + 1e5") == Seq("t.col"))
    // backslash-escaped quotes stay inside the literal (Spark default
    // parsing) — 'brien' must not surface as a phantom column dependency
    assert(columnDependencies(
      "lag(x) over (order by case when name = 'o\\'brien' then 0 else 1 end)") ==
      Seq("x", "name"))
  }

  test("column name normalization: lowercase, trim, spaces to underscores") {
    assert(normalizeColumnName("  First Name ") == "first_name")
    assert(normalizeColumnName("AGE") == "age")
  }

  test("header sanitation dedupes with numeric suffixes") {
    assert(sanitizeHeaders(Seq("Name", "name", "Total $", "")) ==
      Seq("name", "name_2", "total", "col"))
  }
}
