package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Per-version `.crc` checksum files (delta-spark's VersionChecksum):
  * every commit this writer wins records the post-commit snapshot's
  * numFiles/tableSizeBytes — computed INCREMENTALLY from the
  * predecessor's crc plus the commit's own add/remove actions (our
  * removes carry `size` for exactly this), never a snapshot fold — and
  * reads validate the fold against the version's crc when one exists,
  * refusing typed on mismatch.
  */
class DeltaChecksumSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/crc/$name"
    val pp = Paths.get(p)
    if (Files.exists(pp))
      Files.walk(pp).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    p
  }

  private def crc(p: String, v: Long): Option[(Long, Long)] = {
    val f = Paths.get(p, "_delta_log", f"$v%020d.crc")
    if (!Files.exists(f)) None
    else {
      val n = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readString(f))
      Some((n.get("numFiles").asLong, n.get("tableSizeBytes").asLong))
    }
  }

  private def foldCounts(p: String, v: Option[Long] = None): (Long, Long) = {
    val adds = DeltaLog.activeAddsAsOf(spark, p, v)
    (adds.length.toLong, adds.map(_.size).sum)
  }

  test("every commit writes a crc whose counts equal the snapshot fold") {
    val sp = spark; import sp.implicits._
    val p = freshDir("chain")
    DeltaLog.write((1L to 20L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(3), "overwrite", p, checkpointInterval = 0)     // v0
    DeltaLog.write(Seq((21L, "x")).toDF("id", "s"), "append", p,
      checkpointInterval = 0)                                      // v1
    assert(DeltaLog.deleteWhere(spark, p, "id <= 5") >= 1)         // v2
    DeltaLog.upsert(Seq((7L, "up")).toDF("id", "s"), Seq("id"), p) // v3
    DeltaLog.write(Seq((30L, "z")).toDF("id", "s"), "overwrite", p,
      checkpointInterval = 0)                                      // v4
    DeltaLog.restore(spark, p, 1L)                                 // v5
    assert(DeltaLog.optimize(spark, p) > 0)                        // v6
    (0L to 6L).foreach { v =>
      val c = crc(p, v)
      assert(c.isDefined, s"version $v must carry a crc")
      assert(c.get == foldCounts(p, Some(v)),
        s"v$v crc ${c.get} != fold ${foldCounts(p, Some(v))}")
    }
    // reads validate silently green
    assert(DeltaLog.read(spark, p).count() == 21L)
    assert(DeltaLog.read(spark, p, Some(2L)).count() == 16L)
  }

  test("a corrupted crc makes the read refuse typed; removing it heals") {
    val sp = spark; import sp.implicits._
    val p = freshDir("corrupt")
    DeltaLog.write(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      "overwrite", p, checkpointInterval = 0)
    DeltaLog.write(Seq((3L, "c")).toDF("id", "s"), "append", p,
      checkpointInterval = 0)
    val crcFile = Paths.get(p, "_delta_log", "0" * 19 + "1.crc")
    assert(Files.exists(crcFile))
    val original = Files.readString(crcFile)
    // corrupt THROUGH the hadoop filesystem: a raw java.nio write would
    // break hadoop's own .crc sidecar checksum of the file and the
    // reader would treat the unreadable checksum as missing
    val hfs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hcrc = new org.apache.hadoop.fs.Path(
      s"$p/_delta_log/${"0" * 19}1.crc")
    val out = hfs.create(hcrc, true)
    out.write(original.replaceFirst(
      "\"numFiles\":(\\d+)", "\"numFiles\":99").getBytes("UTF-8"))
    out.close()
    val e = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.read(spark, p).collect()
    }
    assert(e.getMessage.contains("checksum"), e.getMessage)
    // the distributed-fold route validates too
    val e2 = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.read(spark, p, None, snapshotDriverMaxBytes = 0L).collect()
    }
    assert(e2.getMessage.contains("checksum"), e2.getMessage)
    // time travel to v0 validates against v0's (intact) crc — green
    assert(DeltaLog.read(spark, p, Some(0L)).count() == 2L)
    hfs.delete(hcrc, false)
    assert(DeltaLog.read(spark, p).count() == 3L)
  }

  test("foreign tables without crc read fine; crafted commits break the chain silently") {
    val sp = spark; import sp.implicits._
    val p = freshDir("foreign")
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p,
      checkpointInterval = 0)
    // a hand-crafted (foreign) commit: no crc gets written for it, and
    // the NEXT commit skips too (missing predecessor) instead of
    // writing a wrong one
    Seq((9L, "f")).toDF("id", "s").coalesce(1).write
      .parquet(s"$p/_foreign")
    val part = Files.list(Paths.get(p, "_foreign")).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    val rel = "_foreign/" + Paths.get(part).getFileName.toString
    val size = Files.size(Paths.get(part))
    Files.writeString(Paths.get(p, "_delta_log", "0" * 19 + "1.json"),
      s"""{"add":{"path":"$rel","partitionValues":{},"size":$size,"modificationTime":0,"dataChange":true}}\n""")
    assert(crc(p, 1L).isEmpty)
    DeltaLog.write(Seq((2L, "b")).toDF("id", "s"), "append", p,
      checkpointInterval = 0)                                    // v2
    assert(crc(p, 2L).isEmpty,
      "a broken chain must skip, never write a wrong checksum")
    assert(DeltaLog.read(spark, p).count() == 3L)
  }

  test("cleanupLog sweeps cleaned commits' crcs but keeps the chain seed") {
    val sp = spark; import sp.implicits._
    val p = freshDir("cleanup")
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p,
      checkpointInterval = 0)
    DeltaLog.write(Seq((2L, "b")).toDF("id", "s"), "append", p,
      checkpointInterval = 0)
    DeltaLog.write(Seq((3L, "c")).toDF("id", "s"), "append", p,
      checkpointInterval = 0)
    DeltaLog.writeCheckpoint(spark, p, 2L)
    DeltaLog.cleanupLog(spark, p)
    assert(crc(p, 0L).isEmpty && crc(p, 1L).isEmpty,
      "cleaned commits' crcs must sweep")
    assert(crc(p, 2L).isDefined, "the newest crc stays as the chain seed")
    // the chain continues across the cleanup
    DeltaLog.write(Seq((4L, "d")).toDF("id", "s"), "append", p,
      checkpointInterval = 0)
    assert(crc(p, 3L).isDefined)
    assert(crc(p, 3L).get == foldCounts(p),
      s"${crc(p, 3L).get} vs ${foldCounts(p)}")
    assert(DeltaLog.read(spark, p).count() == 4L)
  }
}
