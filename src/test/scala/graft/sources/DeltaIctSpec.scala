package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** inCommitTimestamp writer feature (delta PROTOCOL.md "In-Commit
  * Timestamps"): tables with `delta.enableInCommitTimestamps=true` carry
  * their clock IN the log — every commit's commitInfo stamps a strictly
  * monotonic `inCommitTimestamp`, and timestamp time travel / the
  * timestamp-bounded change feed resolve via ICT instead of file mtimes
  * (which lie on exactly such tables: copies, restores and object-store
  * rewrites all reset them). delta-spark 3.3+/4.x enables ICT on new
  * tables increasingly often, so refusing the feature would refuse a
  * growing share of real foreign tables.
  */
class DeltaIctSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/ict/$name"
    val pp = Paths.get(p)
    if (Files.exists(pp))
      Files.walk(pp).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    p
  }

  private def ictOf(p: String, v: Long): Option[Long] = {
    val txt = Files.readString(Paths.get(p, "_delta_log", f"$v%020d.json"))
    """"inCommitTimestamp":(\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toLong)
  }

  test("ICT table: every mutation kind stamps a strictly monotonic ICT") {
    val sp = spark; import sp.implicits._
    val p = freshDir("stamps")
    DeltaLog.write((1L to 8L).map(i => (i, s"v$i")).toDF("id", "s"),
      "overwrite", p,
      tableProperties = Map("delta.enableInCommitTimestamps" -> "true"))
    // creation declares the v7 feature
    val v0 = Files.readString(Paths.get(p, "_delta_log", "0" * 20 + ".json"))
    assert(v0.contains(""""inCommitTimestamp""""))
    assert(v0.contains(""""minWriterVersion":7"""))
    DeltaLog.write(Seq((10L, "a")).toDF("id", "s"), "append", p)   // v1 write
    DeltaLog.deleteWhere(spark, p, "id = 1")                       // v2 rewrite
    DeltaLog.upsert(Seq((2L, "up")).toDF("id", "s"), Seq("id"), p) // v3
    DeltaLog.restore(spark, p, 1L)                                 // v4
    DeltaLog.write(Seq((11L, "b")).toDF("id", "s"), "overwrite", p) // v5
    val icts = (0L to 5L).map(v => ictOf(p, v))
    assert(icts.forall(_.isDefined), s"every commit stamps ICT: $icts")
    val vals = icts.flatten
    assert(vals == vals.sorted && vals.distinct == vals,
      s"ICTs must be strictly monotonic: $vals")
  }

  test("timestamp travel and CDF-by-timestamp resolve via ICT, not mtimes") {
    val sp = spark; import sp.implicits._
    val p = freshDir("travel")
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p,
      tableProperties = Map(
        "delta.enableInCommitTimestamps" -> "true",
        "delta.enableChangeDataFeed" -> "true"))
    DeltaLog.write(Seq((2L, "b")).toDF("id", "s"), "append", p)
    DeltaLog.write(Seq((3L, "c")).toDF("id", "s"), "append", p)
    // sabotage: mtimes REVERSED and years in the past — an mtime-based
    // resolution would pick the wrong version for every ask below
    (0L to 2L).foreach { v =>
      Files.setLastModifiedTime(
        Paths.get(p, "_delta_log", f"$v%020d.json"),
        java.nio.file.attribute.FileTime.fromMillis(
          1600000000000L - v * 86400000L))
    }
    val t1 = ictOf(p, 1L).get
    val got = DeltaLog.readAsOfTimestamp(spark, p, t1)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L), s"ICT must resolve version 1: $got")
    // change feed bounded by the ICT clock: [t1, ∞) serves v1+v2 inserts
    val ch = DeltaLog.readChangesByTimestamp(spark, p, t1)
      .select("_change_type", "id", "_commit_version").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(ch == Set(("insert", 2L, 1L), ("insert", 3L, 2L)), s"$ch")
  }

  test("foreign ICT table mutates (no refusal); our ICT exceeds a future foreign one") {
    val sp = spark; import sp.implicits._
    val p = freshDir("foreign")
    // synthesize a foreign v7 ICT table whose last ICT is IN THE FUTURE
    // (clock skew between writers) — monotonicity must still hold
    Seq((1L, "a")).toDF("id", "s").coalesce(1)
      .write.mode("overwrite").parquet(p)
    val dataFile = Files.list(Paths.get(p)).toArray
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .find(n => n.startsWith("part-") && n.endsWith(".parquet")).get
    val size = Files.size(Paths.get(p, dataFile))
    val future = System.currentTimeMillis() + 3600000L
    val log = Paths.get(p, "_delta_log")
    Files.createDirectories(log)
    Files.writeString(log.resolve("0" * 20 + ".json"), Seq(
      s"""{"commitInfo":{"inCommitTimestamp":$future,"operation":"WRITE"}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["inCommitTimestamp"]}}""",
      """{"metaData":{"id":"ict-foreign","format":{"provider":"parquet","options":{}},"schemaString":"{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"s\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}","partitionColumns":[],"configuration":{"delta.enableInCommitTimestamps":"true"}}}""",
      s"""{"add":{"path":"$dataFile","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":true}}""")
      .mkString("", "\n", "\n"))
    // the feature is supported now — the append must NOT refuse
    DeltaLog.write(Seq((9L, "z")).toDF("id", "s"), "append", p)
    assert(DeltaLog.read(spark, p).count() == 2L)
    val ict1 = ictOf(p, 1L).get
    assert(ict1 > future, s"monotonic past the foreign future ICT: $ict1")
  }

  test("enabling ICT via overwrite records the enablement properties") {
    val sp = spark; import sp.implicits._
    val p = freshDir("enable")
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p)
    assert(ictOf(p, 0L).isEmpty)
    DeltaLog.write(Seq((2L, "b")).toDF("id", "s"), "overwrite", p,
      tableProperties = Map("delta.enableInCommitTimestamps" -> "true"))
    val v1 = Files.readString(Paths.get(p, "_delta_log", "0" * 19 + "1.json"))
    assert(v1.contains(""""delta.inCommitTimestampEnablementVersion":"1""""))
    assert(v1.contains(""""delta.inCommitTimestampEnablementTimestamp""""))
    assert(v1.contains(""""inCommitTimestamp""""))
    // the protocol upgraded to carry the feature
    assert(v1.contains(""""inCommitTimestamp"]""") ||
      v1.contains(""""inCommitTimestamp","""))
    // appends keep stamping
    DeltaLog.write(Seq((3L, "c")).toDF("id", "s"), "append", p)
    assert(ictOf(p, 2L).isDefined)
  }
}
