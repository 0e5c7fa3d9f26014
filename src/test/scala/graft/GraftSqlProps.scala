package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Generative builder robustness: any combination of clauses must yield
  * SQL the Spark parser accepts (parse only — execution correctness is
  * covered by the oracle suite).
  */
object GraftSqlProps extends Properties("GraftSql") {

  private lazy val spark = TestSession.spark
  private lazy val base: GraftFrame = {
    val sp = spark; import sp.implicits._
    GraftFrame(Seq((1, "a", 1.5, "x")).toDF("id", "grp", "amount", "tag"), "t")
  }

  private val cols = Gen.oneOf("id", "grp", "amount", "tag")
  private val selectExpr = Gen.oneOf(
    cols,
    cols.map(c => s"UPPER($c) AS u_$c".replace("u_id", "uid")),
    cols.map(c => s"$c::TEXT AS s_$c"),
    Gen.const("CASE WHEN amount > 1 THEN 'hi' ELSE 'lo' END AS band"))
  private val aggExpr = Gen.oneOf(
    "SUM(amount) AS total", "COUNT(*) AS n", "ROUND(AVG(amount), 2) AS avg_a",
    "MIN(id) AS min_id", "COUNT(DISTINCT grp) AS n_grp")
  private val filterExpr = Gen.oneOf(
    "amount > 1", "grp = 'a'", "id IN (1, 2, 3)", "tag LIKE 'x%'")

  private val frameGen: Gen[GraftFrame] = for {
    selects <- Gen.listOfN(2, selectExpr).map(_.distinct)
    nAggs <- Gen.chooseNum(0, 2)
    aggs <- Gen.listOfN(nAggs, aggExpr).map(_.distinct)
    nFilters <- Gen.chooseNum(0, 2)
    filters <- Gen.listOfN(nFilters, filterExpr).map(_.distinct)
    grouped <- Gen.oneOf(true, false)
    limited <- Gen.option(Gen.chooseNum(1, 100))
  } yield {
    var f = base.select(selects: _*)
    if (aggs.nonEmpty) f = f.agg(aggs: _*)
    filters.foreach(c => f = f.filter(c))
    if (aggs.nonEmpty && grouped) f = f.groupByAll()
    limited.foreach(n => f = f.limit(n))
    f
  }

  property("generated SQL always parses") = forAll(frameGen) { f =>
    org.apache.spark.sql.graftshim.GraftSqlShim.parses(spark, f.sqlText)
  }

  property("sqlText is stable (canonical view names)") = forAll(frameGen) { f =>
    f.sqlText == f.sqlText
  }
}
