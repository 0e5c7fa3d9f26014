package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Paths}

/** Column mapping across OVERWRITE, and the first-class `columnMapping`
  * write option. An overwrite of a mapped table must not silently demote
  * it to mode=none (a by-name/by-id reader would lose its resolution
  * annotations): the new schema re-mints under the SAME mode with ids
  * continuing past the old maxColumnId. `columnMapping = Some(mode)`
  * creates a mapped table through the ordinary writer (name mode is the
  * modern delta-spark default shape), and `Some("none")` is the explicit
  * demotion escape hatch.
  */
class DeltaColmapOverwriteSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/cmow/$name"
    val pp = Paths.get(p)
    if (Files.exists(pp))
      Files.walk(pp).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    p
  }

  /** Newest metaData JSON line in the log (raw — the protocol surface). */
  private def lastMetaData(p: String): String = {
    val log = Paths.get(p, "_delta_log")
    val versions = Files.list(log).toArray.map(_.toString)
      .filter(_.endsWith(".json")).sorted
    versions.reverse.iterator.flatMap(v =>
      Files.readAllLines(Paths.get(v)).toArray.map(_.toString)
        .filter(_.contains("\"metaData\""))).nextOption()
      .getOrElse(fail(s"no metaData in $p"))
  }

  test("overwrite preserves name-mode: re-minted annotations, ids continue") {
    val sp = spark; import sp.implicits._
    val p = freshDir("name")
    DeltaLog.writeNameMapped(
      Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v"), p)
    val before = lastMetaData(p)
    assert(before.contains("\"delta.columnMapping.mode\":\"name\""))
    // overwrite with a DIFFERENT schema: mode survives, annotations mint
    DeltaLog.write(Seq((10L, "x", true), (20L, "y", false))
      .toDF("id", "label", "flag"), "overwrite", p)
    val after = lastMetaData(p)
    assert(after.contains("\"delta.columnMapping.mode\":\"name\""),
      "overwrite demoted the table to mode=none")
    assert(after.contains("delta.columnMapping.physicalName"),
      "overwritten schema lost its mapping annotations")
    // ids continue past the previous generation's maxColumnId (3)
    assert(after.contains("\"delta.columnMapping.maxColumnId\":\"6\""),
      after)
    val back = DeltaLog.read(spark, p)
    assert(back.columns.toSeq == Seq("id", "label", "flag"))
    assert(back.count() == 2L)
    assert(back.where(col("flag")).select("label").head.getString(0) == "x")
    // the data files on disk carry PHYSICAL uuid names, not logical ones
    val parts = Files.list(Paths.get(p)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
    assert(parts.nonEmpty)
    val footerCols = sp.read.parquet(parts.head).columns
    assert(footerCols.forall(_.startsWith("col-")), footerCols.toSeq.toString)
    // the mapped table keeps working end-to-end: append + predicate read
    DeltaLog.write(Seq((30L, "z", true)).toDF("id", "label", "flag"),
      "append", p)
    assert(DeltaLog.read(spark, p).count() == 3L)
    assert(DeltaLog.readWhere(spark, p, "id >= 20")
      .select("id").as[Long].collect().sorted.toSeq == Seq(20L, 30L))
    // copy-on-write delete still routes through the mapping
    assert(DeltaLog.deleteWhere(spark, p, "id = 20") == 1)
    assert(DeltaLog.read(spark, p).count() == 2L)
  }

  test("overwrite preserves id-mode: field-id files, by-id read-back") {
    val sp = spark; import sp.implicits._
    val p = freshDir("id")
    DeltaLog.writeIdMapped(
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), p)
    DeltaLog.write(Seq((5L, 1.5, "p"), (6L, 2.5, "q"))
      .toDF("id", "v", "s"), "overwrite", p)
    val after = lastMetaData(p)
    assert(after.contains("\"delta.columnMapping.mode\":\"id\""),
      "overwrite demoted the id-mode table")
    assert(after.contains("\"delta.columnMapping.maxColumnId\":\"5\""), after)
    val back = DeltaLog.read(spark, p)
    assert(back.columns.toSeq == Seq("id", "v", "s"))
    assert(back.where(col("id") === 5L).select("s").head.getString(0) == "p")
    // appends to the overwritten generation keep resolving by field id
    DeltaLog.write(Seq((7L, 3.5, "r")).toDF("id", "v", "s"), "append", p)
    assert(DeltaLog.read(spark, p).count() == 3L)
    // id-mode overwrite with NESTED columns: the mint annotates every
    // level and staging emits nested parquet field ids — read-back
    // resolves the subfields by id (logical names match nothing on file)
    DeltaLog.write(sp.range(3).select(col("id"),
      org.apache.spark.sql.functions.struct((col("id") * 10).as("x"),
        (col("id") + 100).as("y")).as("inner")),
      "overwrite", p)
    val nestedBack = DeltaLog.read(spark, p).orderBy("id")
    assert(nestedBack.columns.toSeq == Seq("id", "inner"))
    assert(nestedBack.select("inner.x").as[Long].collect().toSeq ==
      Seq(0L, 10L, 20L), "nested subfields must resolve by field id")
    assert(nestedBack.select("inner.y").as[Long].collect().toSeq ==
      Seq(100L, 101L, 102L))
  }

  test("columnMapping option: first-class name-mode creation and demotion") {
    val sp = spark; import sp.implicits._
    val p = freshDir("option")
    Writers.writeDeltaTable(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      "overwrite", p, columnMapping = Some("name"))
    assert(lastMetaData(p).contains("\"delta.columnMapping.mode\":\"name\""))
    assert(DeltaLog.read(spark, p).columns.toSeq == Seq("id", "s"))
    // nested columns mint nested annotations in name mode
    val pn = freshDir("option_nested")
    Writers.writeDeltaTable(sp.range(2).select(col("id"),
      org.apache.spark.sql.functions.struct(col("id").as("x"),
        (col("id") * 2).as("y")).as("inner")),
      "overwrite", pn, columnMapping = Some("name"))
    val metaN = lastMetaData(pn)
    assert(metaN.contains("\"delta.columnMapping.mode\":\"name\""))
    // parent + 2 subfields + id column = 4 minted ids
    assert(metaN.contains("\"delta.columnMapping.maxColumnId\":\"4\""), metaN)
    val backN = DeltaLog.read(spark, pn)
    assert(backN.select("inner.y").as[Long].collect().sorted.toSeq ==
      Seq(0L, 2L))
    // explicit demotion: Some("none") strips the mapping on overwrite
    DeltaLog.write(Seq((9L, "z")).toDF("id", "s"), "overwrite", p,
      columnMapping = Some("none"))
    val demoted = lastMetaData(p)
    assert(!demoted.contains("delta.columnMapping.mode"), demoted)
    assert(DeltaLog.read(spark, p).count() == 1L)
  }

  test("columnMapping option conflicts refuse typed") {
    val sp = spark; import sp.implicits._
    val p = freshDir("conflict")
    Writers.writeDeltaTable(Seq((1L, "a")).toDF("id", "s"), "overwrite", p)
    // append forcing a mode the table doesn't use
    val e1 = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.write(Seq((2L, "b")).toDF("id", "s"), "append", p,
        columnMapping = Some("name"))
    }
    assert(e1.getMessage.contains("inherit"), e1.getMessage)
    // append-creating a mapped table is not a thing
    val e2 = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "append",
        freshDir("conflict2"), columnMapping = Some("name"))
    }
    assert(e2.getMessage.contains("overwrite"), e2.getMessage)
    // garbage mode
    val e3 = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p,
        columnMapping = Some("wat"))
    }
    assert(e3.getMessage.contains("none, name or id"), e3.getMessage)
    // appends matching the table's mode pass the gate
    DeltaLog.write(Seq((2L, "b")).toDF("id", "s"), "append", p,
      columnMapping = Some("none"))
    assert(DeltaLog.read(spark, p).count() == 2L)
  }

  test("overwrite preserves non-mapping configuration too") {
    val sp = spark; import sp.implicits._
    val p = freshDir("conf")
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p,
      tableProperties = Map("delta.enableDeletionVectors" -> "true"))
    DeltaLog.write(Seq((2L, "b")).toDF("id", "s"), "overwrite", p)
    assert(lastMetaData(p)
      .contains("\"delta.enableDeletionVectors\":\"true\""),
      "overwrite dropped the table's configuration")
    // the preserved feature is live: DV deletes work on the new data
    assert(DeltaLog.deleteWhereViaDv(spark, p, "id = 2") == 1L)
    assert(DeltaLog.read(spark, p).count() == 0L)
  }
}
