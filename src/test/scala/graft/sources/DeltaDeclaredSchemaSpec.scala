package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit}

/** Delta reads resolve columns against the LOG's metaData.schemaString,
  * never against parquet file footers (delta PROTOCOL.md: the schema is
  * log state). Before round 16 the non-mapped read path launched a
  * distributed `mergeSchema` footer job over every active file on every
  * read — O(files) wasted I/O per query at scale, and footer content
  * could leak columns the table never declared.
  */
class DeltaDeclaredSchemaSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/declschema/$name"
    val pp = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(pp))
      java.nio.file.Files.walk(pp)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    p
  }

  /** Stage a single-file parquet of `df` and move its part file into the
    * table dir under `rel`; returns the file's size in bytes.
    */
  private def plantParquet(df: org.apache.spark.sql.DataFrame,
      table: String, rel: String): Long = {
    val stage = freshDir(s"stage_${rel.replace('/', '_')}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .head
    val target = java.nio.file.Paths.get(table, rel)
    java.nio.file.Files.createDirectories(target.getParent)
    java.nio.file.Files.move(part.toPath, target)
    java.nio.file.Files.size(target)
  }

  /** Hand-append a commit that ADDS `rel` without touching metaData —
    * what a foreign writer that fails to update the schema would do.
    */
  private def commitForeignAdd(table: String, version: Long, rel: String,
      size: Long): Unit = {
    val name = f"$version%020d.json"
    val lines =
      s"""{"commitInfo":{"operation":"FOREIGN","txnId":"${java.util.UUID.randomUUID()}"}}""" + "\n" +
      s"""{"add":{"path":"$rel","partitionValues":{},"size":$size,""" +
      s""""modificationTime":${System.currentTimeMillis()},"dataChange":true}}""" + "\n"
    val target = java.nio.file.Paths.get(table, "_delta_log", name)
    java.nio.file.Files.write(target, lines.getBytes("UTF-8"))
  }

  test("footer columns the log never declared do not surface, and the scan schema is the log's") {
    val sp = spark
    import sp.implicits._
    val p = freshDir("extra_footer")
    DeltaLog.write(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "v"),
      "overwrite", p, checkpointInterval = 0)
    // a foreign file carrying an EXTRA column the metaData never declared
    val size = plantParquet(
      sp.range(1).select(lit(999L).as("id"), lit("foreign").as("name"),
        lit(9.9).as("v"), lit("SHOULD_NOT_SURFACE").as("extra")),
      p, "foreign-extra.parquet")
    commitForeignAdd(p, 1L, "foreign-extra.parquet", size)

    val df = DeltaLog.read(spark, p)
    assert(df.columns.toSeq == Seq("id", "name", "v"),
      s"read must surface exactly the declared schema, got ${df.columns.mkString(",")}")
    // the foreign file's DECLARED columns are read normally
    val foreignRow = df.where(col("id") === 999L).collect()
    assert(foreignRow.length == 1 && foreignRow.head.getString(1) == "foreign")
    assert(df.count() == 3L)
    // the physical scan itself reads under the log's schema — no footer
    // merge decided the read schema (ReadSchema in the scan node carries
    // the declared columns and nothing else)
    val planText = df.where(col("id") === 999L)
      .queryExecution.executedPlan.toString
    assert(planText.contains("ReadSchema: struct<id:bigint,name:string,v:double>"),
      s"scan schema must be exactly the log-declared one:\n$planText")
  }

  test("append with new columns refreshes metaData; time travel resolves the old schema") {
    val sp = spark
    import sp.implicits._
    val p = freshDir("evolving_append")
    DeltaLog.write(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"),
      "overwrite", p, checkpointInterval = 0)
    DeltaLog.write(Seq((3L, 3.0, "n3")).toDF("id", "v", "note"),
      "append", p, checkpointInterval = 0)
    // the widened schema is LOG state now (readers never consult footers)
    val logDir = new java.io.File(p, "_delta_log")
    val v1 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p, "_delta_log", f"${1L}%020d.json")), "UTF-8")
    assert(v1.contains("metaData") && v1.contains("note"),
      s"evolving append must refresh metaData:\n$v1")
    val latest = DeltaLog.read(spark, p)
    assert(latest.columns.toSeq == Seq("id", "v", "note"))
    assert(latest.where(col("id") === 1L).select("note").collect().head.isNullAt(0))
    assert(latest.where(col("id") === 3L).select("note").collect().head.getString(0) == "n3")
    // time travel to v0: the schema as of that version, not the newest
    val v0 = DeltaLog.read(spark, p, versionAsOf = Some(0L))
    assert(v0.columns.toSeq == Seq("id", "v"),
      s"time-travel read must resolve the as-of schema, got ${v0.columns.mkString(",")}")
    assert(v0.count() == 2L)
    // appends that DON'T widen the schema stay metaData-free
    DeltaLog.write(Seq((4L, 4.0, "n4")).toDF("id", "v", "note"),
      "append", p, checkpointInterval = 0)
    val v2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p, "_delta_log", f"${2L}%020d.json")), "UTF-8")
    assert(!v2.contains("metaData"),
      s"non-evolving append must not re-mint metaData:\n$v2")
    assert(DeltaLog.read(spark, p).count() == 4L)
  }

  test("schema memo never serves a stale schema across a same-path table rebuild") {
    val sp = spark
    import sp.implicits._
    val p = freshDir("cache_rebuild")
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p,
      checkpointInterval = 0)
    assert(DeltaLog.read(spark, p).columns.toSeq == Seq("id", "s")) // warm the memo
    // recreate the table at the SAME path with a DIFFERENT schema — the
    // memo keys on the newest commit's (version, len, mtime, CRC)
    // identity, so the rebuilt log must read back its own schema
    DeltaLog.write(Seq((1L, 2.5, true)).toDF("id", "score", "flag"),
      "overwrite", p, checkpointInterval = 0)
    val back = DeltaLog.read(spark, p)
    assert(back.columns.toSeq == Seq("id", "score", "flag"),
      s"stale schema served after rebuild: ${back.columns.mkString(",")}")
    assert(back.head.getDouble(1) == 2.5)
  }

  test("files older than a schema evolution read back with nulls for the new columns") {
    val sp = spark
    import sp.implicits._
    val p = freshDir("old_files_null")
    DeltaLog.write(Seq((1L, "x")).toDF("id", "s"), "overwrite", p,
      checkpointInterval = 0)
    DeltaLog.write(Seq((2L, "y", 42L)).toDF("id", "s", "extra_num"),
      "append", p, checkpointInterval = 0)
    val out = DeltaLog.read(spark, p).orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).isNullAt(2), "pre-evolution file must read null for the new column")
    assert(out(1).getLong(2) == 42L)
  }
}
