package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Delta file statistics, stats-based skipping, and OPTIMIZE.
  *
  * The contract under test: every predicate-pruned read returns EXACTLY
  * what a full-scan filter returns (pruning is invisible), while
  * `skippingStats` proves files were actually skipped; OPTIMIZE preserves
  * the snapshot byte-for-byte while changing the file layout.
  */
class DeltaSkippingSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val dir = java.nio.file.Paths.get("target/tmp/deltaskip")
    java.nio.file.Files.createDirectories(dir)
    dir.resolve(name).toString
  }

  private def rm(path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }

  /** 1000 rows in 10 range-disjoint files: file i holds EXACTLY ids
    * [100i, 100i+99] (ten 1-file commits — deterministic tiling, and the
    * appends exercise per-commit stats too).
    */
  private def writeRanged(path: String): Unit = {
    rm(path)
    val df = spark.range(1000).select(
      col("id"),
      (col("id") / lit(100)).cast("long").as("bucket"),
      concat(lit("name_"), format_string("%04d", col("id"))).as("name"),
      when(col("id") % 7 === 0, lit(null).cast("double"))
        .otherwise(col("id").cast("double") * 1.5).as("score"),
      date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        (col("id") / lit(10)).cast("int")).as("d"))
    (0 until 10).foreach { i =>
      val part = df.where(col("id") >= i * 100 && col("id") < (i + 1) * 100).coalesce(1)
      Writers.writeDeltaTable(part, if (i == 0) "overwrite" else "append", path)
    }
  }

  test("add actions carry footer stats (numRecords, min/max, nullCount)") {
    val p = tmp("stats_present")
    writeRanged(p)
    val adds = DeltaLog.activeAddsAsOf(spark, p)
    assert(adds.size == 10)
    assert(adds.forall(_.stats.isDefined))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val nodes = adds.map(a => mapper.readTree(a.stats.get))
    assert(nodes.map(_.get("numRecords").asLong).sum == 1000L)
    // id bounds across files tile [0, 999] disjointly
    val idMins = nodes.map(_.get("minValues").get("id").asLong).sorted
    val idMaxs = nodes.map(_.get("maxValues").get("id").asLong).sorted
    assert(idMins == (0L to 900L by 100L).toList)
    assert(idMaxs == (99L to 999L by 100L).toList)
    // nullable column records its null count; total = multiples of 7
    assert(nodes.map(_.get("nullCount").get("score").asLong).sum == 143L)
    // string and date columns got bounds too
    assert(nodes.head.get("minValues").get("name").asText.startsWith("name_"))
    assert(nodes.head.get("minValues").get("d").asText.matches("\\d{4}-\\d{2}-\\d{2}"))
  }

  test("range predicate prunes files and matches the full-scan result") {
    val p = tmp("skip_range")
    writeRanged(p)
    val pred = "id >= 250 AND id < 450"
    val (kept, total) = DeltaLog.skippingStats(spark, p, pred)
    assert(total == 10)
    assert(kept <= 3, s"expected <=3 files kept, got $kept") // ids 250..449 live in files 2,3,4
    val pruned = DeltaLog.readWhere(spark, p, pred)
    val full = DeltaLog.read(spark, p).where(expr(pred))
    assert(rowsOf(pruned) == rowsOf(full))
    assert(pruned.count() == 200)
  }

  test("equality, IN, string, date and flipped-literal predicates all prune correctly") {
    val p = tmp("skip_shapes")
    writeRanged(p)
    val preds = Seq(
      "id = 42" -> 1,
      "id IN (5, 905)" -> 2,
      "name = 'name_0123'" -> 1,
      "d >= DATE'2024-04-05'" -> 1, // epoch day 95 → ids 950..999, last file only
      "500 <= id" -> 5,
      "score > 1495.5" -> 1)
    preds.foreach { case (pred, maxKept) =>
      val (kept, total) = DeltaLog.skippingStats(spark, p, pred)
      assert(total == 10)
      assert(kept <= maxKept, s"$pred kept $kept files, expected <= $maxKept")
      val pruned = DeltaLog.readWhere(spark, p, pred)
      val full = DeltaLog.read(spark, p).where(expr(pred))
      assert(rowsOf(pruned) == rowsOf(full), s"rows diverge for: $pred")
    }
  }

  test("null-aware pruning: IS NULL keeps files with nulls, comparisons honor nullCount") {
    val p = tmp("skip_nulls")
    writeRanged(p)
    val isNull = DeltaLog.readWhere(spark, p, "score IS NULL")
    assert(isNull.count() == 143)
    val notNull = DeltaLog.readWhere(spark, p, "score IS NOT NULL AND id < 100")
    assert(notNull.count() == 85)
  }

  test("provably-empty predicate opens zero files but keeps schema and emptiness") {
    val p = tmp("skip_empty")
    writeRanged(p)
    val (kept, _) = DeltaLog.skippingStats(spark, p, "id > 5000")
    assert(kept == 0)
    val df = DeltaLog.readWhere(spark, p, "id > 5000")
    assert(df.count() == 0)
    assert(df.columns.toSeq == Seq("id", "bucket", "name", "score", "d"))
  }

  test("unsupported predicate shapes fall back to keeping all files, results still exact") {
    val p = tmp("skip_fallback")
    writeRanged(p)
    val pred = "id % 2 = 0 OR name LIKE 'name_00%'"
    val (kept, total) = DeltaLog.skippingStats(spark, p, pred)
    assert(kept == total) // no pruning claimed
    assert(rowsOf(DeltaLog.readWhere(spark, p, pred)) ==
      rowsOf(DeltaLog.read(spark, p).where(expr(pred))))
  }

  test("partition values prune partition-column predicates") {
    val p = tmp("skip_parts")
    rm(p)
    val sp = spark; import sp.implicits._
    val df = sp.range(200).select(col("id"),
      (col("id") % 4).cast("string").as("seg"))
    Writers.writeDeltaTable(df, "overwrite", p, partitionBy = Seq("seg"))
    val (kept, total) = DeltaLog.skippingStats(spark, p, "seg = '2'")
    assert(kept < total, s"partition pruning should drop files ($kept/$total)")
    val pruned = DeltaLog.readWhere(spark, p, "seg = '2'")
    assert(pruned.count() == 50)
    assert(pruned.select(countDistinct(col("seg"))).first.getLong(0) == 1L)
  }

  test("generated partition columns prune through the generation expression") {
    val sp = spark; import sp.implicits._
    val p = tmp("genpart")
    rm(p)
    // bucket GENERATED ALWAYS AS (id % 4), the table's PARTITION column
    val genMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("delta.generationExpression", "id % 4").build()
    // repartition(4) shuffles rows so EVERY file spans ~the full id
    // range — plain min/max stats on id cannot prune anything, and any
    // skipping below is attributable to the generated-partition rewrite
    DeltaLog.write(
      (0L until 400L).map(i => (i, s"v$i")).toDF("id", "s")
        .repartition(4)
        .withColumn("bucket", (col("id") % 4).as("bucket", genMeta)),
      "overwrite", p, partitionBy = Seq("bucket"))
    // predicate on the SOURCE column only: id = 7 ⇒ bucket = 3 is
    // implied through the generation expression — only partition 3's
    // files survive the skip
    val (kept, total) = DeltaLog.skippingStats(spark, p, "id = 7")
    assert(total >= 4, s"several files across 4 partitions: $total")
    assert(kept <= total / 4,
      s"generated-partition pruning must keep only partition 3's files: " +
        s"$kept of $total")
    // the control: WITHOUT the rewrite (predicate on id, stats useless)
    // a non-equality shape keeps everything — proving the skip above
    // came from the generated-column rewrite, not id stats
    val (keptCtl, totalCtl) = DeltaLog.skippingStats(spark, p, "id >= 7")
    assert(keptCtl == totalCtl,
      s"control must keep all files: $keptCtl of $totalCtl")
    // the pruned read equals the full-scan filter
    val got = DeltaLog.readWhere(spark, p, "id = 7")
      .select("id", "s", "bucket").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((7L, "v7", 3L)))
    // and the augmented conjunct reaches the SCAN as a partition filter
    val plan = DeltaLog.readWhere(spark, p, "id = 7")
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*bucket.*"),
      s"partition filter must reach the scan:\n$plan")
    // a NULL-evaluating generation (null literal source) maps to the
    // null partition; non-equality predicates stay un-augmented but
    // exact
    val all = DeltaLog.readWhere(spark, p, "id >= 396").collect()
    assert(all.length == 4)
  }

  test("generated-partition probe evaluates at the DECLARED source type") {
    val sp = spark; import sp.implicits._
    val p = tmp("genpart_widen")
    rm(p)
    // type-SENSITIVE generation expression: hash() of an int literal and
    // of the same value as a long differ, so a probe evaluated at the
    // raw literal's type (int 7) implies a WRONG bucket for the long
    // column and silently empties the read
    val genMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("delta.generationExpression", "abs(hash(id)) % 4").build()
    DeltaLog.write(
      (0L until 200L).map(i => (i, s"v$i")).toDF("id", "s")
        .repartition(4)
        .withColumn("bucket",
          org.apache.spark.sql.functions.abs(
            org.apache.spark.sql.functions.hash(col("id"))).cast("long")
            .%(4).as("bucket", genMeta)),
      "overwrite", p, partitionBy = Seq("bucket"))
    // "id = 7": an INT literal against the LONG column — typeMatches
    // admits the widening, so the augmented conjunct must come from
    // hash(CAST(7 AS BIGINT)), not hash(7)
    val got = DeltaLog.readWhere(spark, p, "id = 7")
      .select("id", "s").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((7L, "v7")),
      s"widened-literal probe must not misdirect the bucket: $got")
    // and the augmentation still PRUNES (to the correct partition)
    val (kept, total) = DeltaLog.skippingStats(spark, p, "id = 7")
    assert(kept < total, s"still prunes: $kept of $total")
  }

  test("randomized predicates: pruned read ALWAYS equals the full-scan filter") {
    val p = tmp("skip_random")
    writeRanged(p)
    val full = DeltaLog.read(spark, p)
    val rnd = new scala.util.Random(20260812L)
    val cols = Seq("id", "bucket", "score") // numeric columns with stats
    def atom(): String = rnd.nextInt(7) match {
      case 0 => s"${cols(rnd.nextInt(3))} = ${rnd.nextInt(1400) - 200}"
      case 1 => s"${cols(rnd.nextInt(3))} < ${rnd.nextInt(1400) - 200}"
      case 2 => s"${cols(rnd.nextInt(3))} >= ${rnd.nextInt(1400) - 200}"
      case 3 => s"${cols(rnd.nextInt(3))} IN (${Seq.fill(3)(rnd.nextInt(1200)).mkString(", ")})"
      case 4 => s"score IS ${if (rnd.nextBoolean()) "" else "NOT "}NULL"
      case 5 => s"name ${if (rnd.nextBoolean()) ">=" else "<"} 'name_0${rnd.nextInt(900) + 100}'"
      case 6 => s"d >= DATE'2024-0${rnd.nextInt(3) + 1}-${rnd.nextInt(27) + 1}'"
    }
    (1 to 60).foreach { i =>
      val pred = Seq.fill(rnd.nextInt(3) + 1)(atom()).mkString(" AND ")
      val got = rowsOf(DeltaLog.readWhere(spark, p, pred))
      val want = rowsOf(full.where(expr(pred)))
      assert(got == want, s"predicate #$i diverged: $pred")
    }
  }

  test("large commits harvest stats on executors, identical to the driver path") {
    val p = tmp("stats_executor")
    rm(p)
    // 40 files > the 32-file threshold → the parallelized harvest path
    val df = spark.range(2000).select(col("id"), (col("id") * 2).as("v"))
    Writers.writeDeltaTable(df.repartition(40), "overwrite", p)
    val adds = DeltaLog.activeAddsAsOf(spark, p)
    assert(adds.size == 40)
    assert(adds.forall(_.stats.isDefined), "every add must carry stats")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = adds.map(a => mapper.readTree(a.stats.get).get("numRecords").asLong).sum
    assert(n == 2000L)
    // and skipping still works over them
    assert(rowsOf(DeltaLog.readWhere(spark, p, "id BETWEEN 100 AND 110")) ==
      rowsOf(DeltaLog.read(spark, p).where(expr("id BETWEEN 100 AND 110"))))
  }

  test("optimize bin-packs small files, preserves rows, keeps history dataChange=false") {
    val p = tmp("optimize_pack")
    writeRanged(p)
    val before = DeltaLog.read(spark, p)
    val beforeRows = rowsOf(before)
    val compacted = DeltaLog.optimize(spark, p, targetBytes = 1L << 30)
    assert(compacted == 10)
    val addsAfter = DeltaLog.activeAddsAsOf(spark, p)
    assert(addsAfter.size == 1, s"expected 1 packed file, got ${addsAfter.size}")
    assert(rowsOf(DeltaLog.read(spark, p)) == beforeRows)
    // history records the OPTIMIZE commit; time travel to the pre-optimize
    // version (9 = the last append) still sees the 10-file layout
    assert(DeltaLog.history(spark, p).head._2 == "OPTIMIZE")
    assert(DeltaLog.activeAddsAsOf(spark, p, Some(9L)).size == 10)
  }

  test("cleanupLog drops checkpointed commits; reads, skipping and appends survive") {
    val p = tmp("log_cleanup")
    rm(p)
    val df = spark.range(120).select(col("id"), (col("id") % 5).as("k"))
    // 12 commits (versions 0..11) → checkpoint written at version 10
    Writers.writeDeltaTable(df.where(col("id") < 10).coalesce(1), "overwrite", p)
    (1 to 11).foreach { i =>
      Writers.writeDeltaTable(
        df.where(col("id") >= i * 10 && col("id") < (i + 1) * 10).coalesce(1),
        "append", p)
    }
    val deleted = DeltaLog.cleanupLog(spark, p)
    assert(deleted.nonEmpty && deleted.contains(f"${0L}%020d.json"))
    // full replay from checkpoint + tail commits
    assert(DeltaLog.read(spark, p).count() == 120)
    // stats survived the checkpoint roundtrip → skipping still prunes
    val (kept, total) = DeltaLog.skippingStats(spark, p, "id < 5")
    assert(kept < total, s"skipping dead after cleanup ($kept/$total)")
    // appends continue at the right version; time travel to a cleaned
    // version fails typed
    Writers.writeDeltaTable(df.where(col("id") < 3).coalesce(1), "append", p)
    assert(DeltaLog.read(spark, p).count() == 123)
    assertThrows[graft.GraftError.InvalidOperation](
      DeltaLog.read(spark, p, versionAsOf = Some(3L)))
  }

  test("float-column pruning honors Spark's double-widened comparison domain") {
    val p = tmp("skip_float")
    rm(p)
    // the LAST file holds floats whose max is exactly 0.1f. Spark evaluates
    // `f > 0.1` as (double)f > 0.1d, and (double)0.1f = 0.10000000149… > 0.1,
    // so the row MATCHES — a pruner comparing the shortest float rendering
    // "0.1" against the literal would wrongly skip the file.
    // Divide widens to double, so cast back: the column must be FLOAT
    val df = spark.range(101).select(
      col("id"), (col("id") / lit(1000.0)).cast("float").as("f"))
    (0 until 4).foreach { i =>
      val part = df.where(col("id") >= i * 26 && col("id") < (i + 1) * 26).coalesce(1)
      Writers.writeDeltaTable(part, if (i == 0) "overwrite" else "append", p)
    }
    // ids 0..25 → f in [0, 0.025], …, ids 78..100 → f in [0.078, 0.1]
    for (pred <- Seq("f > 0.1", "f >= 0.026", "f < 0.025", "f = 0.05",
        "f > 0.0989999")) {
      val got = rowsOf(DeltaLog.readWhere(spark, p, pred))
      val want = rowsOf(DeltaLog.read(spark, p).where(expr(pred)))
      assert(got == want, s"float pruning diverged for: $pred")
    }
    // the scenario verbatim: the last file's float max is exactly 0.1f,
    // which widens to 0.10000000149… > 0.1 — the file must be KEPT and
    // the 0.1f row must come back
    val edge = DeltaLog.readWhere(spark, p, "f > 0.1")
    assert(edge.count() ==
      DeltaLog.read(spark, p).where(expr("f > 0.1")).count())
    assert(edge.count() > 0, "row with f = 0.1f must survive (double-widened > 0.1)")
  }

  test("malformed boolean partition value keeps the file instead of failing the read") {
    val p = tmp("skip_badbool")
    rm(p)
    val sp = spark; import sp.implicits._
    val df = sp.range(20).select(col("id"), (col("id") % 2 === 0).as("flag"))
    Writers.writeDeltaTable(df, "overwrite", p, partitionBy = Seq("flag"))
    val full = DeltaLog.read(spark, p)
    assert(rowsOf(DeltaLog.readWhere(spark, p, "flag = true")) ==
      rowsOf(full.where(expr("flag = true"))))
    // and the hardened parse path itself: a corrupted partition value that
    // raw.toBoolean rejects must keep the file, never throw
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("flag", org.apache.spark.sql.types.BooleanType)))
    val corrupt = DeltaStats.AddEntry("part.parquet", Map("flag" -> "maybe"), None, 1L)
    val kept = DeltaStats.prune(spark, "flag = true", schema, Seq("flag"), Seq(corrupt))
    assert(kept == Seq(corrupt), "unparseable partition value must be kept, not pruned")
  }

  test("float partition values and shortest-float stats widen to the double domain") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType), StructField("f", FloatType)))
    // partition path segment "0.1" means the float 0.1f, which widens to
    // 0.10000000149… — so `f > 0.1` MUST keep the file, and `f > 0.101`
    // must prune it
    val partAdd = DeltaStats.AddEntry("f=0.1/part.parquet", Map("f" -> "0.1"), None, 1L)
    assert(DeltaStats.prune(spark, "f > 0.1", schema, Seq("f"), Seq(partAdd)).nonEmpty,
      "partition value 0.1f widens above the 0.1 literal; file must be kept")
    assert(DeltaStats.prune(spark, "f > 0.101", schema, Seq("f"), Seq(partAdd)).isEmpty)
    assert(DeltaStats.prune(spark, "f = 0.1", schema, Seq("f"), Seq(partAdd)).isEmpty,
      "the exact-decimal 0.1 literal never equals the widened 0.1f")
    // stats written by an external writer in shortest-float form ("0.1")
    val stats = """{"numRecords":10,"minValues":{"f":0.0},"maxValues":{"f":0.1},""" +
      """"nullCount":{"f":0}}"""
    val statAdd = DeltaStats.AddEntry("part.parquet", Map.empty, Some(stats), 1L)
    assert(DeltaStats.prune(spark, "f > 0.1", schema, Nil, Seq(statAdd)).nonEmpty,
      "shortest-float max 0.1 widens above the 0.1 literal; file must be kept")
    assert(DeltaStats.prune(spark, "f > 0.101", schema, Nil, Seq(statAdd)).isEmpty)
  }

  test("optimize zorder clusters both columns so either predicate skips most files") {
    val p = tmp("optimize_z")
    rm(p)
    val sp = spark; import sp.implicits._
    // x and y deliberately uncorrelated: row-order locality on one is
    // random on the other; z-order restores locality on BOTH
    val df = sp.range(4000).select(
      col("id"),
      (col("id") % 64).cast("double").as("x"),
      ((col("id") * 37) % 64).cast("double").as("y"))
    Writers.writeDeltaTable(df.repartition(16), "overwrite", p)
    DeltaLog.optimize(spark, p, targetBytes = 4L * 1024, zorderBy = Seq("x", "y"))
    val addsAfter = DeltaLog.activeAddsAsOf(spark, p)
    assert(addsAfter.size > 3, s"need several files to show skipping, got ${addsAfter.size}")
    for (pred <- Seq("x < 8", "y < 8")) {
      val (kept, total) = DeltaLog.skippingStats(spark, p, pred)
      assert(kept < total, s"$pred kept all $total files after zorder")
      assert(rowsOf(DeltaLog.readWhere(spark, p, pred)) ==
        rowsOf(DeltaLog.read(spark, p).where(expr(pred))))
    }
  }
}
