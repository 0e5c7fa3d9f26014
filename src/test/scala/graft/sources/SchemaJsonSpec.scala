package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

/** JSON schema-spec document form + delta-with-schema (reference
  * with_schema.rs:299-392).
  */
class SchemaJsonSpec extends SparkSpec {

  test("fromJsonSpec parses fields with aliases and nullable defaulting") {
    val st = SchemaSpec.fromJsonSpec(
      """{"fields":[
        |  {"name":"id","type":"i64","nullable":false},
        |  {"name":"name","type":"varchar"},
        |  {"name":"score","type":"f64","nullable":true},
        |  {"name":"flag","type":"bool"},
        |  {"name":"born","type":"date32"}
        |]}""".stripMargin)
    assert(st.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq == Seq(
      ("id", LongType, false), ("name", StringType, true),
      ("score", DoubleType, true), ("flag", BooleanType, true),
      ("born", DateType, true)))
  }

  test("fromJsonSpec rejects malformed specs with reference-matching errors") {
    def msg(spec: String): String =
      intercept[graft.GraftError.SchemaError](SchemaSpec.fromJsonSpec(spec)).getMessage
    assert(msg("""{"columns":[]}""").contains("must contain 'fields' array"))
    assert(msg("""not json""").contains("Invalid JSON schema specification"))
    assert(msg("""{"fields":[{"type":"i64"}]}""").contains("Field must have 'name'"))
    assert(msg("""{"fields":[{"name":"x"}]}""").contains("Field must have 'type'"))
    assert(msg("""{"fields":[{"name":"x","type":"quux"}]}""")
      .contains("Unsupported data type"))
  }

  test("loadWithSchemaJson applies the declared schema to a csv") {
    val sp = spark; import sp.implicits._
    val p = "target/tmp/schema_json.csv"
    Writers.writeCsvSingle(Seq((1L, "a", 1.5), (2L, "b", 2.5))
      .toDF("id", "name", "v"), "overwrite", p)
    val df = Loaders.loadWithSchemaJson(spark, p, "sj",
      """{"fields":[{"name":"id","type":"i64"},{"name":"name","type":"string"},
        |{"name":"v","type":"f32"}]}""".stripMargin).df
    assert(df.schema("v").dataType == FloatType)
    assert(df.count() == 2)
  }

  test("declared schema over a delta table reads the log snapshot") {
    val sp = spark; import sp.implicits._
    val p = "target/tmp/schema_delta"
    Writers.writeDeltaTable(Seq((1L, 1.5), (2L, 2.5)).toDF("id", "v"),
      "overwrite", p)
    // orphan file outside the log must stay invisible through this path too
    Seq((99L, 9.9)).toDF("id", "v").write.mode("append").parquet(p)
    val df = Loaders.loadWithSchemaJson(spark, p, "sd",
      """{"fields":[{"name":"id","type":"i32"},{"name":"v","type":"f64"}]}""").df
    assert(df.schema("id").dataType == IntegerType) // declared narrowing applied
    assert(df.count() == 2)
  }
}
