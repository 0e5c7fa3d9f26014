package graft.sources

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import scala.collection.mutable.ListBuffer

/** Minimal Delta-protocol transaction log, dependency-free.
  *
  * The reference writes real delta tables (protocol + metaData commit
  * actions, then add actions per data file; append = next numbered
  * version — src/features/delta.rs:196-420 via delta-rs). The runtime here
  * ships no delta jar, so this implements the same on-disk contract
  * directly: `_delta_log/%020d.json` commits of newline-delimited actions
  * over Spark-written parquet data files. Readers replay adds − removes.
  *
  * Scope (documented, not hidden): no checkpoints, no concurrent-writer
  * conflict detection (single-writer pipelines), overwrite wipes the
  * table directory like the reference does (`fs::remove_dir_all`,
  * delta.rs:231). Data file paths are stored relative with no
  * percent-encoding (Spark part-file names and `col=val` partition
  * segments need none).
  */
object DeltaLog {

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def logDir(tbl: HPath) = new HPath(tbl, "_delta_log")

  private def commitName(version: Long) = f"$version%020d.json"

  /** Recursive data-file listing (relative path → status), excluding the
    * log directory and committer markers.
    */
  private def dataFiles(fs: FileSystem, tbl: HPath): Map[String, FileStatus] = {
    // qualify so relative table paths strip cleanly against the absolute
    // paths listStatus returns
    val base = fs.makeQualified(tbl).toUri.getPath.stripSuffix("/")
    val out = Map.newBuilder[String, FileStatus]
    def walk(dir: HPath): Unit = fs.listStatus(dir).foreach { s =>
      val name = s.getPath.getName
      if (s.isDirectory) { if (name != "_delta_log") walk(s.getPath) }
      else if (name.endsWith(".parquet"))
        out += s.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/") -> s
    }
    if (fs.exists(tbl)) walk(tbl)
    out.result()
  }

  /** `col=val` partition segments of a relative file path → partitionValues. */
  private def partitionValues(relPath: String): Seq[(String, String)] =
    relPath.split('/').dropRight(1).toSeq.collect {
      case seg if seg.contains('=') =>
        val Array(k, v) = seg.split("=", 2)
        k -> java.net.URLDecoder.decode(v, "UTF-8")
    }

  private def addAction(relPath: String, s: FileStatus): String = {
    val pv = partitionValues(relPath)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString(",")
    s"""{"add":{"path":"${esc(relPath)}","partitionValues":{$pv},""" +
      s""""size":${s.getLen},"modificationTime":${s.getModificationTime},""" +
      s""""dataChange":true}}"""
  }

  private def protocolAction: String =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  private def metaDataAction(schemaJson: String, partitionBy: Seq[String]): String = {
    val parts = partitionBy.map(p => s""""${esc(p)}"""").mkString(",")
    s"""{"metaData":{"id":"${java.util.UUID.randomUUID()}",""" +
      s""""format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":"${esc(schemaJson)}",""" +
      s""""partitionColumns":[$parts],"configuration":{},""" +
      s""""createdTime":${System.currentTimeMillis()}}}"""
  }

  /** Partition columns of the latest metaData action in the log (newest
    * commit wins — merge commits refresh metaData). Driver-side Jackson
    * parse of the tiny commit files.
    */
  private def latestPartitionColumns(fs: FileSystem, log: HPath): Option[Seq[String]] = {
    import com.fasterxml.jackson.databind.ObjectMapper
    val mapper = new ObjectMapper()
    existingVersions(fs, log).reverse.iterator.flatMap { v =>
      val in = fs.open(new HPath(log, commitName(v)))
      val text = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
        out.toString("UTF-8")
      } finally in.close()
      text.linesIterator.flatMap { line =>
        val node = try mapper.readTree(line) catch { case _: Exception => null }
        val md = if (node == null) null else node.get("metaData")
        val pc = if (md == null) null else md.get("partitionColumns")
        if (pc != null && pc.isArray) {
          val cols = scala.collection.mutable.ArrayBuffer.empty[String]
          pc.forEach(c => cols += c.asText)
          Some(cols.toSeq)
        } else None
      }.toSeq.lastOption // last metaData within the newest commit that has one
    }.nextOption()
  }

  private def existingVersions(fs: FileSystem, log: HPath): Seq[Long] =
    if (!fs.exists(log)) Nil
    else fs.listStatus(log).toSeq
      .map(_.getPath.getName).filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong).sorted

  /** Write `df` as a delta table: parquet data files + a numbered commit.
    * mode: overwrite (wipe + version 0), append (next version, add
    * actions for the new files only), merge (append + refreshed metaData
    * carrying the merged schema).
    */
  def write(df: DataFrame, mode: String, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val tbl = new HPath(path)
    val fs = tbl.getFileSystem(conf)
    val m = mode.toLowerCase
    require(Set("overwrite", "append", "merge").contains(m),
      s"writeDeltaTable: bad mode '$mode'")
    val fresh = m == "overwrite" || existingVersions(fs, logDir(tbl)).isEmpty
    if (!fresh) {
      // appends must match the table's declared partitioning — silently
      // mixing layouts would corrupt partition inference on read
      latestPartitionColumns(fs, logDir(tbl)).foreach { tableCols =>
        if (tableCols != partitionBy)
          throw graft.GraftError.PartitionError(
            s"append declares partitioning (${partitionBy.mkString(", ")}) " +
              s"but the table was written with (${tableCols.mkString(", ")})",
            tableCols)
      }
    }
    if (m == "overwrite" && fs.exists(tbl)) fs.delete(tbl, true)

    val before = if (fresh) Map.empty[String, FileStatus] else dataFiles(fs, tbl)
    val w = df.write.mode(if (fresh) "overwrite" else "append")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
    val after = dataFiles(fs, tbl)
    val newFiles = (after -- before.keySet).toSeq.sortBy(_._1)

    val version = if (fresh) 0L
      else existingVersions(fs, logDir(tbl)).lastOption.map(_ + 1).getOrElse(0L)
    val actions = ListBuffer.empty[String]
    if (version == 0L) actions += protocolAction
    if (version == 0L || m == "merge") {
      // merge commits refresh metaData with the post-write merged schema
      val schema =
        if (m == "merge")
          spark.read.option("mergeSchema", "true").parquet(path).schema
        else df.schema
      actions += metaDataAction(schema.json, partitionBy)
    }
    newFiles.foreach { case (rel, st) => actions += addAction(rel, st) }

    // commit atomically: temp file + rename into the numbered slot
    fs.mkdirs(logDir(tbl))
    val commit = new HPath(logDir(tbl), commitName(version))
    val tmp = new HPath(logDir(tbl), s".${commitName(version)}.tmp")
    val out = fs.create(tmp, true)
    try out.write((actions.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, commit))
      throw new IllegalStateException(s"delta commit rename failed: $commit")
  }

  /** Table dir has a delta log → snapshot = adds − removes across all
    * commits. Parsing uses Spark's own JSON reader (tiny driver-side job,
    * no extra dependency); our writer never emits removes but replaying
    * them keeps the reader correct on logs other writers produced.
    */
  def activeFiles(spark: SparkSession, path: String): Seq[String] = {
    val tbl = new HPath(path)
    val fs = tbl.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commits = existingVersions(fs, logDir(tbl))
      .map(v => new HPath(logDir(tbl), commitName(v)).toString)
    if (commits.isEmpty) return Nil
    val log = spark.read.json(commits: _*)
    val adds =
      if (log.columns.contains("add"))
        log.where(col("add").isNotNull).select(col("add.path"))
          .collect().map(_.getString(0)).toSeq
      else Nil
    val removes =
      if (log.columns.contains("remove"))
        log.where(col("remove").isNotNull).select(col("remove.path"))
          .collect().map(_.getString(0)).toSet
      else Set.empty[String]
    adds.filterNot(removes).map(rel => new HPath(tbl, rel).toString)
  }

  /** Snapshot read: the log's active files, partition columns re-inferred
    * from `col=val` paths via basePath, schema merged across files.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = activeFiles(spark, path)
    require(files.nonEmpty, s"loadDelta: empty or missing _delta_log in $path")
    spark.read
      .option("mergeSchema", "true")
      .option("basePath", path)
      .parquet(files: _*)
  }
}
