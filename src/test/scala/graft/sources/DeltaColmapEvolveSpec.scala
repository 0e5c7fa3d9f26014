package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Schema-evolving writes on NAME-mode column-mapped tables: a new frame
  * column gets minted mapping annotations (fresh physicalName +
  * delta.columnMapping.id above the table's maxColumnId), the commit
  * refreshes metaData with the widened schema and bumped maxColumnId,
  * and old readers keep resolving every pre-existing column through its
  * unchanged annotations. Before round 16 these writes refused typed.
  */
class DeltaColmapEvolveSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val p = s"target/tmp/cmevolve/$name"
    val pp = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(pp))
      java.nio.file.Files.walk(pp)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    p
  }

  import scala.jdk.CollectionConverters._

  private def newestCommit(p: String): String = {
    val log = java.nio.file.Paths.get(p, "_delta_log")
    java.nio.file.Files.list(log).iterator().asScala
      .map(_.getFileName.toString).filter(_.matches("\\d{20}\\.json"))
      .toSeq.sorted.lastOption
      .map(n => new String(java.nio.file.Files.readAllBytes(
        log.resolve(n)), "UTF-8")).getOrElse("")
  }

  test("evolving append mints annotations; old rows null; old columns still resolve") {
    val sp = spark
    import sp.implicits._
    val p = freshDir("append")
    DeltaLog.writeNameMapped(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), p)
    // v1: new column arrives through the mapped append path
    DeltaLog.write(Seq((3L, "c", 9.5)).toDF("id", "name", "score"),
      "append", p)
    val commit = newestCommit(p)
    assert(commit.contains("metaData") && commit.contains("score") &&
      commit.contains("delta.columnMapping.physicalName"),
      s"evolving append must refresh metaData with minted annotations:\n$commit")
    assert(commit.contains("\"delta.columnMapping.maxColumnId\":\"3\""),
      s"maxColumnId must bump past the two fixture columns:\n$commit")
    assert(commit.contains("\"delta.columnMapping.mode\":\"name\""),
      "the table configuration must be preserved, not wiped")
    val back = DeltaLog.read(spark, p).orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(back.map(_.getString(1)).toSeq == Seq("a", "b", "c"),
      "pre-existing columns must keep resolving through their annotations")
    assert(back(0).isNullAt(2) && back(1).isNullAt(2),
      "pre-evolution rows must read null for the new column")
    assert(back(2).getDouble(2) == 9.5)
    // the staged data file carries PHYSICAL (uuid-style) column names
    val parts = java.nio.file.Files.list(java.nio.file.Paths.get(p))
      .iterator().asScala.map(_.toString)
      .filter(f => f.endsWith(".parquet") && !f.contains("_delta_log")).toSeq
    val raw = spark.read.parquet(parts: _*)
    assert(raw.columns.forall(_.startsWith("col-")),
      s"files must stay physical-named, got ${raw.columns.mkString(",")}")
    // second evolution keeps minting ABOVE the bumped max (no id reuse)
    DeltaLog.write(Seq((4L, "d", 1.0, true)).toDF("id", "name", "score", "flag"),
      "merge", p)
    assert(newestCommit(p).contains("\"delta.columnMapping.maxColumnId\":\"4\""))
    val again = DeltaLog.read(spark, p)
    assert(again.columns.toSeq == Seq("id", "name", "score", "flag"))
    assert(again.where(col("flag")).count() == 1L)
    assert(again.where(col("id") === 3L).select("score").head.getDouble(0) == 9.5)
  }

  test("nested-struct evolution mints per-subfield annotations on name mode") {
    val sp = spark
    import sp.implicits._
    val p = freshDir("nested")
    DeltaLog.writeNameMapped(Seq((1L, "a")).toDF("id", "name"), p)
    val withStruct = Seq((2L, "b", (1, 2))).toDF("id", "name", "pair")
    DeltaLog.write(withStruct, "append", p)
    val commit = newestCommit(p)
    // the struct column AND both subfields carry their own annotations;
    // maxColumnId clears the deepest mint (2 fixture + parent + 2 subs)
    assert(commit.contains("\"delta.columnMapping.maxColumnId\":\"5\""),
      s"nested mint must bump maxColumnId past the subfields:\n$commit")
    val back = DeltaLog.read(spark, p).orderBy("id").collect()
    assert(back(0).isNullAt(2), "pre-evolution row reads null struct")
    val pair = back(1).getStruct(2)
    assert(pair.getInt(0) == 1 && pair.getInt(1) == 2,
      "nested values must round-trip through the physical rename")
    // subfield names come back LOGICAL
    val pairType = DeltaLog.read(spark, p).schema("pair").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(pairType.fieldNames.toSeq == Seq("_1", "_2"))
    // the staged file stores PHYSICAL names at every level
    val parts = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(p))
        .iterator().asScala.map(_.toString)
        .filter(f => f.endsWith(".parquet") && !f.contains("_delta_log")).toSeq
    }
    val raw = spark.read.option("mergeSchema", "true").parquet(parts: _*)
    val physPair = raw.schema.fields.find(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.StructType]).get
    assert(physPair.name.startsWith("col-"))
    assert(physPair.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.forall(_.startsWith("col-")),
      "nested struct subfields must be physical-named on file")
    // id-mode tables evolve nested columns too: staging emits parquet
    // field ids at EVERY nesting level, so the by-id reader (whose read
    // schema carries logical names that match nothing in the file —
    // only the ids do) resolves the subfields
    val pid = freshDir("nested_id")
    DeltaLog.writeIdMapped(Seq((1L, "a")).toDF("id", "name"), pid)
    DeltaLog.write(withStruct, "append", pid)
    val backId = DeltaLog.read(spark, pid).orderBy("id").collect()
    assert(backId(0).isNullAt(2), "pre-evolution row reads null struct")
    val pairId = backId(1).getStruct(2)
    assert(pairId.getInt(0) == 1 && pairId.getInt(1) == 2,
      "nested values must resolve BY FIELD ID on the id-mode table")
    assert(newestCommit(pid)
      .contains("\"delta.columnMapping.maxColumnId\":\"5\""))
  }
}
