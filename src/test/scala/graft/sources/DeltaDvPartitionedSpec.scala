package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Deletion vectors on PARTITIONED tables whose partition directories
  * carry IDENTICAL file basenames — exactly what delta-spark's
  * dynamic-partition writer emits (part-00000-<jobUUID>.c000.parquet in
  * every dir). The DV row filter used to key on bare basenames, which on
  * such a layout merges row indices of DISTINCT files into one bitmap
  * attached to an arbitrary add: wrong rows deleted, real matches left
  * live. The key is now the trailing path segments at the minimal depth
  * that is snapshot-unique ([[DeltaLog.relKey]]/[[DeltaLog.dvKeyDepth]]),
  * so these tables read and mutate correctly instead of (at best)
  * refusing or (at worst) corrupting.
  */
class DeltaDvPartitionedSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/dvpart/$name"
    val pp = Paths.get(p)
    if (Files.exists(pp))
      Files.walk(pp).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    p
  }

  private val CollidingBase = "part-00000-0000cafe.c000.parquet"

  /** Foreign-style partitioned DV-enabled table: two partition dirs,
    * SAME basename in each; ids 0..9 under part=1, 100..109 under
    * part=2 (so a shared predicate matches different physical row
    * positions in each file).
    */
  private def fixture(name: String): String = {
    val sp = spark; import sp.implicits._
    val p = freshDir(name)
    def stage(part: Long, ids: Seq[Long]): Long = {
      val tmpDir = s"$p/_stage_$part"
      ids.map(i => (i, i * 2)).toDF("id", "v").coalesce(1)
        .write.mode("overwrite").parquet(tmpDir)
      val srcFile = Files.list(Paths.get(tmpDir)).iterator()
      var found: java.nio.file.Path = null
      while (srcFile.hasNext) {
        val f = srcFile.next()
        val n = f.getFileName.toString
        if (n.startsWith("part-") && n.endsWith(".parquet")) found = f
      }
      require(found != null, s"no part file staged in $tmpDir")
      val dest = Paths.get(p, s"part=$part", CollidingBase)
      Files.createDirectories(dest.getParent)
      Files.move(found, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.walk(Paths.get(tmpDir))
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      Files.size(dest)
    }
    val s1 = stage(1L, 0L to 9L)
    val s2 = stage(2L, 100L to 109L)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("part",
        org.apache.spark.sql.types.LongType)))
    val schemaJson = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val log = Paths.get(p, "_delta_log")
    Files.createDirectories(log)
    val actions = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"dvpart-$name","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":["part"],"configuration":{"delta.enableDeletionVectors":"true"}}}""",
      s"""{"add":{"path":"part=1/$CollidingBase","partitionValues":{"part":"1"},"size":$s1,"modificationTime":0,"dataChange":true}}""",
      s"""{"add":{"path":"part=2/$CollidingBase","partitionValues":{"part":"2"},"size":$s2,"modificationTime":0,"dataChange":true}}""")
    Files.writeString(log.resolve("0" * 20 + ".json"),
      actions.mkString("", "\n", "\n"))
    p
  }

  test("relKey/dvKeyDepth: basename at depth 1, partition-dir suffix on collision") {
    assert(DeltaLog.relKey("t", "a/f.parquet", 1) == "f.parquet")
    assert(DeltaLog.relKey("t", "a/f.parquet", 2) == "a/f.parquet")
    // a rel SHALLOWER than the depth pulls trailing base segments — the
    // same segments the scan's _metadata.file_path yields for that file
    assert(DeltaLog.relKey("dir/tbl", "f.parquet", 2) == "tbl/f.parquet")
    assert(DeltaLog.dvKeyDepth("t",
      Seq("a/f.parquet", "b/g.parquet")) == 1)
    assert(DeltaLog.dvKeyDepth("t",
      Seq("a/f.parquet", "b/f.parquet")) == 2)
    // URI-escapable segment chars only refuse when depth must exceed 1
    assert(DeltaLog.dvKeyDepth("t", Seq("a b/f.parquet", "c/g.parquet")) == 1)
    intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.dvKeyDepth("t", Seq("a b/f.parquet", "c/f.parquet"))
    }
  }

  test("read + versioned read of a colliding-basename DV table work") {
    val p = fixture("read")
    val before = DeltaLog.read(spark, p)
    assert(before.count() == 20L)
    // partition values resolve from the dirs
    assert(before.where(col("part") === 1).count() == 10L)
    assert(before.where(col("part") === 2).count() == 10L)
  }

  test("DV delete on colliding basenames bitmaps each file separately") {
    val sp = spark; import sp.implicits._
    val p = fixture("dvdelete")
    // matches sit at DIFFERENT physical positions per file: part=1 rows
    // 0,3,6,9 (ids 0,3,6,9) vs part=2 rows 2,5,8 (ids 102,105,108) — a
    // merged basename-keyed bitmap would delete positions {0,2,3,5,6,8,9}
    // from ONE arbitrary file and nothing from the other
    assert(DeltaLog.deleteWhereViaDv(spark, p, "id % 3 = 0") == 7L)
    val back = DeltaLog.read(spark, p)
    assert(back.count() == 13L, s"got ${back.count()}")
    assert(back.where(col("id") % 3 === 0).count() == 0L)
    assert(back.where(col("part") === 1).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 4L, 5L, 7L, 8L))
    assert(back.where(col("part") === 2).select("id").as[Long]
      .collect().sorted.toSeq ==
      Seq(100L, 101L, 103L, 104L, 106L, 107L, 109L))
    // each add carries its OWN descriptor with per-file cardinality
    val cards = DeltaLog.activeAddsAsOf(spark, p)
      .flatMap(a => a.dv.map(d => a.rel -> d.cardinality)).toMap
    assert(cards == Map(s"part=1/$CollidingBase" -> 4L,
      s"part=2/$CollidingBase" -> 3L), s"got $cards")
    // the pre-delete snapshot still reads whole
    assert(DeltaLog.read(spark, p, Some(0L)).count() == 20L)
    // a second DV generation unions correctly per file
    assert(DeltaLog.deleteWhereViaDv(spark, p, "id = 1 OR id = 100") == 2L)
    val again = DeltaLog.read(spark, p)
    assert(again.count() == 11L)
    assert(again.where(col("id").isin(1L, 100L)).count() == 0L)
  }

  test("predicate reads and CoW delete key DV'd colliding files correctly") {
    val sp = spark; import sp.implicits._
    val p = fixture("cow")
    assert(DeltaLog.deleteWhereViaDv(spark, p, "id % 3 = 0") == 7L)
    // skipping read path: DVs still apply on the kept files
    val hits = DeltaLog.readWhere(spark, p, "id >= 100")
      .select("id").as[Long].collect().sorted.toSeq
    assert(hits == Seq(100L, 101L, 103L, 104L, 106L, 107L, 109L),
      s"got $hits")
    // copy-on-write delete over the DV'd table: survivors come from LIVE
    // rows of each touched file — no resurrection, no cross-file bleed
    assert(DeltaLog.deleteWhere(spark, p, "id = 4 OR id = 104") == 2)
    val back = DeltaLog.read(spark, p)
    assert(back.count() == 11L, s"got ${back.count()}")
    assert(back.where(col("id").isin(4L, 104L)).count() == 0L)
    assert(back.where(col("id") % 3 === 0).count() == 0L,
      "CoW rewrite resurrected DV-deleted rows")
  }
}
