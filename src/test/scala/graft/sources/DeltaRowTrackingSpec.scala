package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions.col

/** Row tracking (delta PROTOCOL.md "Row Tracking", writer feature
  * `rowTracking`): every add carries `baseRowId` +
  * `defaultRowCommitVersion`, the assigned-id high-water mark rides a
  * `domainMetadata` action (domain delta.rowTracking) and survives the
  * checkpoint fold, and rewrites preserve each surviving row's id by
  * materializing it into the hidden physical columns minted at creation
  * (`delta.rowTracking.materializedRow*ColumnName`) — fresh rows take
  * the positional default baseRowId + row_index. `readWithRowIds`
  * resolves `_row_id`/`_row_commit_version` per that rule.
  */
class DeltaRowTrackingSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/rowtrack/$name"
    val pp = Paths.get(p)
    if (Files.exists(pp))
      Files.walk(pp).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    p
  }

  private val RT = Map("delta.enableRowTracking" -> "true")

  /** id → _row_id of the current snapshot. */
  private def rowIds(p: String): Map[Long, Long] =
    DeltaLog.readWithRowIds(spark, p)
      .select(col("id"), col("_row_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def commitText(p: String, v: Long): String =
    Files.readString(Paths.get(p, "_delta_log", f"$v%020d.json"))

  test("creation mints protocol, materialized names, base row ids and the hwm") {
    val sp = spark; import sp.implicits._
    val p = freshDir("create")
    DeltaLog.write((0L until 10L).map(i => (i, s"v$i")).toDF("id", "s"),
      "overwrite", p, tableProperties = RT)
    val v0 = commitText(p, 0L)
    assert(v0.contains(""""minWriterVersion":7"""))
    assert(v0.contains(""""rowTracking"""") &&
      v0.contains(""""domainMetadata""""))
    assert(v0.contains(""""baseRowId":0"""))
    assert(v0.contains(""""defaultRowCommitVersion":0"""))
    assert(v0.contains(""""rowIdHighWaterMark\":9"""))
    assert(v0.contains("materializedRowIdColumnName"))
    // fresh table: ids are the positional defaults 0..9, all distinct
    val ids = rowIds(p)
    assert(ids.values.toSeq.sorted == (0L until 10L))
    // the hidden materialized column never surfaces in a plain read
    assert(DeltaLog.read(spark, p).columns.toSeq == Seq("id", "s"))
    // appends continue past the high-water mark, never reusing ids
    DeltaLog.write(Seq((100L, "x"), (101L, "y")).toDF("id", "s"),
      "append", p)
    val ids2 = rowIds(p)
    assert(ids2.size == 12 && ids2.values.toSeq.distinct.size == 12)
    assert(ids2(100L) >= 10L && ids2(101L) >= 10L)
    // versions attach: fresh rows carry the appending commit's version
    val vers = DeltaLog.readWithRowIds(spark, p)
      .select(col("id"), col("_row_commit_version")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vers(0L) == 0L && vers(100L) == 1L)
  }

  test("upsert preserves survivor and updated ids; inserts get fresh ones") {
    val sp = spark; import sp.implicits._
    val p = freshDir("upsert")
    DeltaLog.write((0L until 8L).map(i => (i, i * 10)).toDF("id", "qty"),
      "overwrite", p, tableProperties = RT)
    val before = rowIds(p)
    DeltaLog.upsert(Seq((3L, 999L), (50L, 500L)).toDF("id", "qty"),
      Seq("id"), p)
    val after = rowIds(p)
    // survivors byte-identical ids; the UPDATED row keeps its id (row
    // lineage); the INSERT draws a fresh id past the old high-water mark
    (0L until 8L).foreach(i => assert(after(i) == before(i),
      s"id of row $i must survive the rewrite"))
    assert(after(50L) > before.values.max)
    assert(after.values.toSeq.distinct.size == after.size)
    // the updated row's commit version bumps; survivors keep theirs
    val vers = DeltaLog.readWithRowIds(spark, p)
      .select(col("id"), col("_row_commit_version")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vers(3L) == 1L && vers(0L) == 0L)
  }

  test("deleteWhere, DV delete and optimize preserve ids") {
    val sp = spark; import sp.implicits._
    val p = freshDir("mutations")
    DeltaLog.write((0L until 12L).map(i => (i, i % 3)).toDF("id", "grp"),
      "overwrite", p,
      tableProperties = RT + ("delta.enableDeletionVectors" -> "true"))
    DeltaLog.write((12L until 16L).map(i => (i, i % 3)).toDF("id", "grp"),
      "append", p)
    val before = rowIds(p)
    // copy-on-write delete: survivors keep ids, deleted ids vanish
    DeltaLog.deleteWhere(spark, p, "id = 5")
    val afterCow = rowIds(p)
    assert(!afterCow.contains(5L))
    afterCow.foreach { case (k, v) => assert(v == before(k)) }
    // DV delete: the re-add echoes baseRowId, ids stay positional
    DeltaLog.deleteWhereViaDv(spark, p, "id = 6")
    val afterDv = rowIds(p)
    assert(!afterDv.contains(6L))
    afterDv.foreach { case (k, v) => assert(v == before(k)) }
    // optimize compacts across files and reorders rows — materialized
    // ids survive (fresh positional ranges bind nothing)
    assert(DeltaLog.optimize(spark, p) >= 1)
    val afterOpt = rowIds(p)
    assert(afterOpt == afterDv)
    // purge materializes the DVs away; ids still stable
    DeltaLog.purgeDeletionVectors(spark, p)
    assert(rowIds(p) == afterDv)
    // restore to the post-CoW-delete version: the echoed base ids bring
    // every id back exactly as it was then (id 6 revives, with its id)
    DeltaLog.restore(spark, p, 2L)
    val restored = rowIds(p)
    assert(restored == afterCow)
  }

  test("the high-water mark survives checkpoint fold + log cleanup") {
    val sp = spark; import sp.implicits._
    val p = freshDir("checkpointed")
    DeltaLog.write((0L until 5L).map(i => (i, i)).toDF("id", "n"),
      "overwrite", p,
      tableProperties = RT + ("delta.enableDeletionVectors" -> "true"))
    DeltaLog.write(Seq((10L, 1L), (11L, 2L)).toDF("id", "n"), "append", p)
    // a commit that carries NO domainMetadata (a DV delete assigns no
    // new ids) sits newest — after cleanup the hwm can only come from
    // the CHECKPOINT's folded domainMetadata row
    DeltaLog.deleteWhereViaDv(spark, p, "id = 1")
    DeltaLog.writeCheckpoint(spark, p, 2L)
    DeltaLog.cleanupLog(spark, p)
    assert(!Files.exists(Paths.get(p, "_delta_log", "0" * 20 + ".json")),
      "fold must allow cleanup")
    // the next append's ids must start past the FOLDED hwm (6), not 0
    DeltaLog.write(Seq((12L, 3L)).toDF("id", "n"), "append", p,
      checkpointInterval = 0)
    val ids = rowIds(p)
    assert(ids.size == 7 && ids.values.toSeq.distinct.size == 7,
      s"ids must stay unique after a cleanup: $ids")
    assert(ids(12L) >= 7L, s"hwm must come from the checkpoint fold: $ids")
    assert(ids(10L) == 5L && ids(11L) == 6L)
  }

  test("foreign enablement without materialized names: appends fine, rewrites refuse") {
    val sp = spark; import sp.implicits._
    val p = freshDir("foreign")
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p,
      tableProperties = RT)
    // strip the minted materialized-name properties, as a foreign
    // enablement that never declared them would look
    val v0 = commitText(p, 0L)
    val stripped = v0.linesIterator.map { l =>
      if (!l.contains("metaData")) l
      else l.replaceAll(
        """"delta\.rowTracking\.materializedRow[A-Za-z]*ColumnName":"[^"]*",?""",
        "").replaceAll(",\\}", "}")
    }.mkString("\n")
    Files.writeString(Paths.get(p, "_delta_log", "0" * 20 + ".json"), stripped)
    // (config caches key on the newest commit's length+CRC — the
    // rewritten commit self-invalidates)
    // appends only mint fresh ids — fine
    DeltaLog.write(Seq((2L, "b")).toDF("id", "s"), "append", p)
    assert(rowIds(p).values.toSeq.distinct.size == 2)
    // a rewrite cannot preserve ids without the materialized columns
    val e = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.upsert(Seq((1L, "A")).toDF("id", "s"), Seq("id"), p)
    }
    assert(e.getMessage.contains("materialized"))
  }

  test("row tracking composes with column mapping: upsert/delete preserve ids") {
    val sp = spark; import sp.implicits._
    for (mode <- Seq("name", "id")) {
      val p = freshDir(s"mapped_$mode")
      DeltaLog.write((0L until 8L).map(i => (i, s"v$i")).toDF("id", "s"),
        "overwrite", p, columnMapping = Some(mode), tableProperties = RT)
      // the data files carry PHYSICAL column names; the materialized
      // row-id columns are physical-only identifiers on top
      val before = rowIds(p)
      assert(before.values.toSeq.sorted == (0L until 8L), s"$mode: $before")
      // upsert: survivors and the updated row keep their ids, the
      // insert gets a fresh one past the mark
      DeltaLog.upsert(Seq((3L, "up"), (100L, "new")).toDF("id", "s"),
        Seq("id"), p)
      val after = rowIds(p)
      assert(after(3L) == before(3L),
        s"$mode: updated row must keep its id")
      assert((0L until 8L).filterNot(_ == 3L)
        .forall(i => after(i) == before(i)),
        s"$mode: survivors must keep ids: $before -> $after")
      assert(after(100L) > before.values.max,
        s"$mode: insert mints past the mark")
      // deleteWhere: remaining rows keep their ids through the rewrite
      DeltaLog.deleteWhere(spark, p, "id = 0")
      val afterDel = rowIds(p)
      assert(afterDel == (after - 0L), s"$mode: $after -> $afterDel")
      // logical reads stay clean: no physical/materialized leakage
      assert(DeltaLog.read(spark, p).columns.toSeq == Seq("id", "s"))
      // and the feed/scan columns resolve logically after a checkpoint
      DeltaLog.writeCheckpoint(spark, p, 2L)
      DeltaLog.cleanupLog(spark, p)
      assert(rowIds(p) == afterDel, s"$mode: ids survive the fold")
    }
  }

  test("identity columns compose with column mapping") {
    val sp = spark; import sp.implicits._
    val p = freshDir("identity_mapped")
    val idMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("delta.identity.start", 1L)
      .putLong("delta.identity.step", 1L)
      .putBoolean("delta.identity.allowExplicitInsert", true).build()
    // create a name-mapped table whose id column is IDENTITY (GENERATED
    // BY DEFAULT): supplied at creation, assigned on appends
    DeltaLog.write(
      Seq((1L, "a"), (2L, "b")).toDF("id", "s")
        .select(col("id").as("id", idMeta), col("s")),
      "overwrite", p, columnMapping = Some("name"))
    val v0 = Files.readString(Paths.get(p, "_delta_log", "0" * 20 + ".json"))
    assert(v0.contains(""""identityColumns""""))
    assert(v0.contains(""""columnMapping""""))
    // append OMITTING the identity column: values assigned past the mark
    DeltaLog.write(Seq("c", "d").toDF("s"), "append", p)
    val got = DeltaLog.read(spark, p).select("id", "s").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")), s"$got")
    // the refreshed metaData carries the bumped mark AND the mapping
    // annotations (a clobbered annotation would break every later read)
    val v1 = Files.readString(Paths.get(p, "_delta_log", "0" * 19 + "1.json"))
    assert(v1.contains("highWaterMark\\\":4") ||
      v1.contains("""highWaterMark\":4"""), s"$v1")
    assert(v1.contains("delta.columnMapping.physicalName"))
    // and appends keep working on top of the refreshed schema
    DeltaLog.write(Seq("e").toDF("s"), "append", p)
    assert(DeltaLog.read(spark, p).where(col("id") === 5L).count() == 1L)
  }

  test("readWithRowIds routes distributed above the log-size threshold, same rows") {
    val sp = spark; import sp.implicits._
    val p = freshDir("distrib")
    DeltaLog.write((0L until 10L).map(i => (i, s"v$i")).toDF("id", "s"),
      "overwrite", p,
      tableProperties = RT + ("delta.enableDeletionVectors" -> "true"))
    DeltaLog.write(Seq((100L, "x"), (101L, "y")).toDF("id", "s"), "append", p)
    // DV delete so the distributed route exercises its DV subset too
    DeltaLog.deleteWhereViaDv(spark, p, "id = 3")
    def rowsVia(maxBytes: Long) =
      DeltaLog.readWithRowIds(spark, p, snapshotDriverMaxBytes = maxBytes)
        .select(col("id"), col("_row_id"), col("_row_commit_version"))
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    // snapshotDriverMaxBytes = 0 forces the distributed fold; rows,
    // materialized ids and commit versions must match the driver route
    assert(rowsVia(0L) == rowsVia(Long.MaxValue))
  }

  test("readWithRowIds refuses tables without row tracking") {
    val sp = spark; import sp.implicits._
    val p = freshDir("plain")
    DeltaLog.write(Seq((1L, "a")).toDF("id", "s"), "overwrite", p)
    val e = intercept[graft.GraftError.InvalidOperation] {
      DeltaLog.readWithRowIds(spark, p)
    }
    assert(e.getMessage.contains("row tracking"))
  }
}
