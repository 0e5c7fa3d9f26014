package graft.sources

import graft.SparkSpec
import java.sql.{Date, DriverManager}

/** Exercises the JDBC source end-to-end against embedded Derby (already on
  * the Spark classpath) — the same `spark.read.jdbc` path a from_postgres /
  * from_mysql call takes (reference src/features/postgres.rs:105-499,
  * mysql.rs:93-397: run query, convert rows faithfully incl. NULLs, wrap
  * as a frame). Only the URL differs per backend.
  */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:target/tmp/derby_graft;create=true"

  private def seed(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE people") catch { case _: java.sql.SQLException => () }
      st.execute(
        "CREATE TABLE people (id BIGINT NOT NULL, name VARCHAR(32), " +
          "score DOUBLE, born DATE)")
      val ps = conn.prepareStatement("INSERT INTO people VALUES (?, ?, ?, ?)")
      def row(id: Long, name: String, score: java.lang.Double, born: String): Unit = {
        ps.setLong(1, id)
        if (name == null) ps.setNull(2, java.sql.Types.VARCHAR) else ps.setString(2, name)
        if (score == null) ps.setNull(3, java.sql.Types.DOUBLE) else ps.setDouble(3, score)
        ps.setDate(4, Date.valueOf(born))
        ps.executeUpdate()
      }
      row(1L, "ada", 9.5, "1815-12-10")
      row(2L, null, 7.25, "1912-06-23") // NULL string must survive
      row(3L, "kay", null, "1935-01-07") // NULL double must survive
      st.close(); ps.close()
    } finally conn.close()
  }

  test("fromJdbc runs a pushed-down query with faithful types and NULLs") {
    seed()
    val gf = Loaders.fromJdbc(spark, url,
      "SELECT id, name, score, born FROM people", "pp")
    val df = gf.df
    assert(df.schema("id").dataType.typeName == "long")
    assert(df.schema("name").dataType.typeName == "string")
    assert(df.schema("score").dataType.typeName == "double")
    assert(df.schema("born").dataType.typeName == "date")
    val rows = df.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(rows.size == 3)
    assert(rows(1L).getAs[String]("name") == "ada")
    assert(rows(2L).getAs[String]("name") == null)
    assert(rows(3L).get(rows(3L).fieldIndex("score")) == null)
    assert(rows(1L).getAs[Date]("born").toString == "1815-12-10")
  }

  test("fromJdbc pushes filters and column pruning into the JDBC scan") {
    seed()
    // at cluster scale the difference between shipping a predicate to the
    // database and filtering in Spark is the whole game: assert the
    // catalyst filter lands in the scan's PushedFilters, not a Spark
    // Filter over a full-table read
    import org.apache.spark.sql.functions.col
    val df = Loaders.fromJdbc(spark, url,
      "SELECT id, name, score, born FROM people", "pp")
      .df.filter(col("id") > 1L).select("id", "name")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThan(ID,1)"),
      s"filter did not reach the JDBC scan:\n$plan")
    // column pruning: the scan must request only the projected columns
    assert(plan.contains("ReadSchema: struct<ID:bigint,NAME:string>") ||
      (!plan.contains("SCORE") && !plan.contains("BORN")),
      s"scan reads unprojected columns:\n$plan")
    assert(df.collect().map(_.getLong(0)).sorted.sameElements(Array(2L, 3L)))
  }

  test("fromJdbcPartitioned slices the read into parallel range queries") {
    seed()
    val gf = Loaders.fromJdbcPartitioned(spark, url,
      "SELECT id, name, score FROM people", "pp_part",
      partitionColumn = "id", lowerBound = 1L, upperBound = 4L,
      numPartitions = 3)
    // genuinely partitioned: one JDBC cursor per slice
    assert(gf.df.rdd.getNumPartitions == 3)
    // and exact: out-of-range rows clamp into edge partitions, nothing
    // lost or doubled
    assert(gf.df.collect().map(_.getAs[Long]("id")).sorted.toSeq
      == Seq(1L, 2L, 3L))
    // pushdown still reaches each slice's scan
    import org.apache.spark.sql.functions.col
    val plan = gf.df.filter(col("id") > 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThan(ID,1)"),
      s"filter did not reach the partitioned JDBC scan:\n$plan")
  }

  test("fromJdbc result chains into the builder DSL") {
    seed()
    val out = Loaders.fromJdbc(spark, url,
      "SELECT id, score FROM people WHERE score IS NOT NULL", "scored")
      .agg("COUNT(*) AS n", "ROUND(SUM(score), 2) AS total")
      .toDF.collect()
    assert(out.head.getAs[Long]("n") == 2L)
    assert(out.head.getAs[Double]("total") == 16.75)
  }
}
