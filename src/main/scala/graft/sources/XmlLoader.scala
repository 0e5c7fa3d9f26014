package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.GraftFrame
import graft.normalize.Normalize
import scala.xml.{Elem, Node, XML}

/** XML loader (reference src/features/xml.rs — XmlAnalyzer/extractor with
  * Standard/Cartesian/Auto modes, 2,351 LoC of bespoke tree analysis).
  *
  * No spark-xml jar ships in this runtime, so records are flattened with
  * scala-xml. Standard mode takes an explicit record tag; Auto detects the
  * repeating element exactly like the reference's analyzer heuristic (the
  * most frequent element path with >1 occurrence and scalar children).
  * Parsing happens once on the driver (like the single-node reference);
  * for cluster-scale XML swap in a distributed tokenizer — the flattening
  * contract stays the same.
  */
object XmlLoader {

  sealed trait XmlMode
  case object Standard extends XmlMode
  case object Cartesian extends XmlMode
  case object Auto extends XmlMode

  /** Auto routing mirrors the reference's mode detector
    * (xml.rs:1841-1862): a record whose SAME parent repeats ≥ 2 DIFFERENT
    * child element types is a multi-relationship record → Cartesian; a
    * single repeating child type (header-detail) or flat records →
    * Standard. Wrapper elements (a tag holding only a homogeneous list,
    * like `<orders><order/>…</orders>`) are spliced transparently before
    * both detection and flattening.
    */
  def load(spark: SparkSession, path: String, alias: String,
      recordTag: Option[String] = None,
      mode: XmlMode = Auto): GraftFrame = {
    // open via the Hadoop FS API so xml loads work on HDFS/S3/file: paths
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(hPath)
    val root = try XML.load(in) finally in.close()
    val tag = recordTag.getOrElse(detectRecordTag(root))
    val records = (root \\ tag).collect { case e: Elem => spliceWrappers(e) }
    require(records.nonEmpty, s"loadXml: no <$tag> records in $path")
    val effective = mode match {
      case Auto =>
        if (records.exists(r => repeatedChildTypes(r).size >= 2)) Cartesian
        else Standard
      case m => m
    }
    effective match {
      case Cartesian => cartesianFlatten(spark, records, alias, auto = mode == Auto)
      case _ => standardFlatten(spark, records, alias)
    }
  }

  /** A wrapper is an element with no attributes, no text of its own, whose
    * element children are homogeneous (one label) and either repeat or are
    * themselves non-scalar — `<orders><order>…</order>…</orders>`. Splice
    * it away (children move up) so relationship detection and Cartesian
    * grouping see `customer → order` directly, the way the reference's
    * analyzer tracks full paths rather than only direct children
    * (xml.rs:172-615). A single SCALAR homogeneous child
    * (`<address><city>X</city></address>`) is a field holder, not a
    * wrapper, and is kept.
    */
  private def isWrapper(e: Elem): Boolean = {
    val elems = e.child.collect { case c: Elem => c }
    e.attributes.isEmpty &&
      e.child.forall(c => c.isInstanceOf[Elem] || c.text.trim.isEmpty) &&
      elems.nonEmpty && elems.map(_.label).distinct.size == 1 &&
      (elems.size >= 2 || !isScalar(elems.head))
  }

  private def spliceWrappers(e: Elem): Elem = {
    val newChildren = e.child.flatMap {
      case c: Elem if isWrapper(c) =>
        c.child.collect { case g: Elem => spliceWrappers(g) }
      case c: Elem => Seq(spliceWrappers(c))
      case other => Seq(other)
    }
    e.copy(child = newChildren)
  }

  private def standardFlatten(spark: SparkSession, records: Seq[Elem],
      alias: String): GraftFrame = {
    // column set = union of scalar child tags + attributes over all records
    val cols = scala.collection.mutable.LinkedHashSet.empty[String]
    records.foreach { r =>
      r.attributes.asAttrMap.keys.foreach(a => cols += Normalize.normalizeColumnName(a))
      r.child.collect { case e: Elem if isScalar(e) =>
        cols += Normalize.normalizeColumnName(e.label)
      }
    }
    val colSeq = cols.toSeq
    val rows = records.map { r =>
      val attrs = r.attributes.asAttrMap.map { case (k, v) =>
        Normalize.normalizeColumnName(k) -> v
      }
      val children = r.child.collect { case e: Elem if isScalar(e) =>
        Normalize.normalizeColumnName(e.label) -> e.text.trim
      }.toMap
      Row.fromSeq(colSeq.map(c => children.orElse(attrs).lift(c).orNull))
    }
    toFrame(spark, colSeq, rows, alias)
  }

  /** Child element labels occurring ≥ 2 times within a record. */
  private def repeatedChildTypes(r: Elem): Seq[String] = {
    val counts = r.child.collect { case e: Elem => e.label }
      .groupBy(identity).view.mapValues(_.size)
    counts.filter(_._2 >= 2).keys.toSeq.sorted
  }

  /** Multi-group flatten (reference xml.rs:667-785): scalar fields of the
    * record repeat onto every output row; each repeated child type forms a
    * group whose instances' fields are prefixed `<group>_<field>` (or just
    * `<group>` for text-only instances). How the groups COMBINE follows
    * the reference's `determine_combination_strategy` (xml.rs:507-518):
    *
    *  - ≥ 3 groups → **parallel arrays**: instances zipped index-wise up
    *    to the longest group, shorter groups padded with nulls — a cross
    *    product of many groups would explode multiplicatively.
    *  - every group's per-record max ≤ 3 → **cartesian product**: one row
    *    per combination (small and usually genuinely relational).
    *  - otherwise (one large group) → **header-detail**: one row per
    *    instance of the LARGEST group; other groups are dropped, like the
    *    reference's first-group-only `header_detail_combinations`
    *    (deviation: we pick the largest group, not HashMap iteration
    *    order, so the choice is deterministic).
    *
    * Explicit `Cartesian` mode always cross-products; `Auto` selects.
    */
  private def cartesianFlatten(spark: SparkSession, records: Seq[Elem],
      alias: String, auto: Boolean = false): GraftFrame = {
    val cols = scala.collection.mutable.LinkedHashSet.empty[String]
    val allRows = scala.collection.mutable.ArrayBuffer.empty[Map[String, String]]
    // group membership is decided at FILE level (the reference analyzes
    // the whole document): a child type repeating in ANY record is a group
    // everywhere, so a record holding a single instance still contributes
    // that instance's fields rather than dropping them
    val fileGroups = records.flatMap(repeatedChildTypes).distinct.sorted
    // per-group max instance count across the file drives the strategy
    def instanceCount(r: Elem, label: String): Int =
      r.child.count { case e: Elem => e.label == label; case _ => false }
    val maxCounts: Map[String, Int] = fileGroups.map(l =>
      l -> records.map(instanceCount(_, l)).max).toMap
    val strategy: String =
      if (!auto) "cartesian"
      else if (fileGroups.length >= 3) "parallel"
      else if (fileGroups.forall(l => maxCounts(l) <= 3)) "cartesian"
      else "header_detail"
    val detailGroup: Option[String] =
      if (strategy == "header_detail") maxCounts.toSeq.sortBy { case (l, n) => (-n, l) }
        .headOption.map(_._1)
      else None
    records.foreach { r =>
      val repeated = fileGroups.toSet
      val attrs = r.attributes.asAttrMap.map { case (k, v) =>
        Normalize.normalizeColumnName(k) -> v
      }
      val singles = r.child.collect {
        case e: Elem if isScalar(e) && !repeated.contains(e.label) =>
          Normalize.normalizeColumnName(e.label) -> e.text.trim
      }.toMap
      val base = attrs ++ singles
      base.keys.foreach(cols += _)
      // group label → instance field-maps, in document order
      val groups: Seq[(String, Seq[Map[String, String]])] =
        fileGroups.filter(l => r.child.exists {
          case e: Elem => e.label == l; case _ => false
        }).map { label =>
          val instances = r.child.collect {
            case e: Elem if e.label == label =>
              if (isScalar(e))
                Map(Normalize.normalizeColumnName(label) -> e.text.trim)
              else e.child.collect { case c: Elem if isScalar(c) =>
                Normalize.normalizeColumnName(s"${label}_${c.label}") -> c.text.trim
              }.toMap
          }
          instances.flatMap(_.keys).foreach(cols += _)
          label -> instances.toSeq
        }
      val combos: Seq[Map[String, String]] = strategy match {
        case "parallel" =>
          val maxLen = groups.map(_._2.length).maxOption.getOrElse(0)
          if (maxLen == 0) Seq(base)
          else (0 until maxLen).map { i =>
            groups.foldLeft(base) { case (acc, (_, instances)) =>
              if (i < instances.length) acc ++ instances(i) else acc
            }
          }
        case "header_detail" =>
          groups.find { case (l, _) => detailGroup.contains(l) }
            .map { case (_, instances) => instances.map(base ++ _) }
            .getOrElse(Seq(base))
        case _ =>
          groups.foldLeft(Seq(base)) { case (acc, (_, instances)) =>
            for (partial <- acc; inst <- instances) yield partial ++ inst
          }
      }
      allRows ++= combos
    }
    val colSeq = cols.toSeq
    toFrame(spark, colSeq,
      allRows.toSeq.map(m => Row.fromSeq(colSeq.map(m.get(_).orNull))), alias)
  }

  /** Standard-flatten ONE record to a column→value map — pure and
    * serializable, shared by the driver path and the distributed folder
    * path below.
    */
  private[sources] def recordToMap(r: Elem): Map[String, String] = {
    val attrs = r.attributes.asAttrMap.map { case (k, v) =>
      Normalize.normalizeColumnName(k) -> v
    }
    val children = r.child.collect { case e: Elem if isScalar(e) =>
      Normalize.normalizeColumnName(e.label) -> e.text.trim
    }.toMap
    attrs ++ children
  }

  /** Distributed folder-of-XML-documents load — the 100 TB shape for XML
    * is many files, not one big one, and the single-file loader (and
    * `loadFolder`'s per-file dispatch) parses on the driver. Here the
    * schema is fixed from ONE driver-side sample file (first by name —
    * the same first-file-wins contract as the reference's folder loader,
    * src/elusion.rs:6765-7265), then every file parses on the EXECUTORS
    * via wholeTextFiles: columns missing in a file are null, extra
    * columns are dropped. Standard flatten only (scalar records) — the
    * multi-group strategies need whole-document analysis and stay on the
    * single-file path.
    */
  def loadFolderDistributed(spark: SparkSession, dir: String, alias: String,
      recordTag: Option[String] = None): GraftFrame = {
    val hDir = new org.apache.hadoop.fs.Path(dir)
    val fs = hDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(hDir)
      .filter(s => s.isFile && s.getPath.getName.toLowerCase.endsWith(".xml"))
      .map(_.getPath).sortBy(_.getName)
    if (files.isEmpty)
      throw graft.GraftError.InvalidOperation("load_folder_xml",
        s"no .xml files in $dir")
    // schema pass: ONE driver parse of the first file, standard-flattened
    // with the same recordToMap the executors run — deriving the schema
    // through Auto-mode load() could pick a multi-group strategy whose
    // columns (order_oid, …) the executor-side standard flatten would
    // never populate
    val (tag, cols) = {
      val in = fs.open(files.head)
      val root = try XML.load(in) finally in.close()
      val t = recordTag.getOrElse(detectRecordTag(root))
      val records = (root \\ t).collect { case e: Elem => spliceWrappers(e) }
      require(records.nonEmpty, s"loadFolderDistributed: no <$t> records in ${files.head}")
      val c = scala.collection.mutable.LinkedHashSet.empty[String]
      records.foreach(r => recordToMap(r).keys.foreach(c += _))
      (t, c.toSeq)
    }
    val schema = StructType(cols.map(c => StructField(c, StringType)))
    val rows = spark.sparkContext
      .wholeTextFiles(files.map(_.toString).mkString(","))
      .flatMap { case (_, content) =>
        val root = XML.loadString(content)
        (root \\ tag).collect { case e: Elem =>
          val m = recordToMap(spliceWrappers(e))
          Row.fromSeq(cols.map(m.get(_).orNull))
        }
      }
    GraftFrame(spark.createDataFrame(rows, schema), alias)
  }

  /** Distributed SINGLE-file XML load — the Wikipedia-dump shape: one
    * multi-GB document with millions of repeated records, where a
    * driver-side DOM parse (the [[load]] path) caps out at driver RAM.
    * Spark's text source reads the file with the record's closing tag as
    * the line separator, so byte ranges split across executors (the
    * custom-delimiter line reader stitches records straddling split
    * boundaries); each fragment then parses independently with the same
    * recordToMap flatten as the folder-distributed path. The schema comes
    * from the FIRST record, streamed from the file head with bounded
    * driver I/O — never a whole-file read. Missing columns are null,
    * extra columns are dropped (first-record-wins, the folder contract).
    *
    * Split-by-tag contract (shared with every tag-delimited XML splitter):
    * the record element must not nest inside itself, closers must be the
    * literal `</tag>` (no `</tag >`), records must not be self-closed, and
    * comments/CDATA containing the closer are unsupported.
    */
  def loadSingleFileDistributed(spark: SparkSession, path: String,
      alias: String, recordTag: String): GraftFrame = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val closer = s"</$recordTag>"
    val head = readHeadThrough(fs, hPath, closer.getBytes("UTF-8"))
    val headText = new String(head, "UTF-8")
    val startIdx = recordStart(headText, recordTag)
    val closeIdx = headText.indexOf(closer)
    if (startIdx < 0 || closeIdx < startIdx)
      throw graft.GraftError.InvalidOperation("load_xml_distributed",
        s"no complete <$recordTag> record in the first " +
          s"${head.length} bytes of $path")
    val first = XML.loadString(headText.substring(startIdx, closeIdx + closer.length))
    val cols = {
      val c = scala.collection.mutable.LinkedHashSet.empty[String]
      recordToMap(spliceWrappers(first)).keys.foreach(c += _)
      c.toSeq
    }
    require(cols.nonEmpty, s"loadSingleFileDistributed: first <$recordTag> " +
      "record has no scalar fields or attributes")
    val schema = StructType(cols.map(c => StructField(c, StringType)))
    val tag = recordTag
    val rows = spark.read.option("lineSep", closer).textFile(path)
      .rdd.flatMap { frag =>
        val idx = recordStart(frag, tag)
        if (idx < 0) None // preamble-only or trailing </root> fragment
        else {
          val m = recordToMap(spliceWrappers(
            XML.loadString(frag.substring(idx) + s"</$tag>").asInstanceOf[Elem]))
          Some(Row.fromSeq(cols.map(m.get(_).orNull)))
        }
      }
    GraftFrame(spark.createDataFrame(rows, schema), alias)
  }

  /** Index of the first genuine `<tag…` open (next char closes or is
    * whitespace — not a longer tag name sharing the prefix), −1 if none.
    */
  private[sources] def recordStart(frag: String, tag: String): Int = {
    val open = "<" + tag
    var i = frag.indexOf(open)
    while (i >= 0) {
      val after = i + open.length
      if (after < frag.length) {
        val c = frag.charAt(after)
        if (c == '>' || c.isWhitespace) return i
      }
      i = frag.indexOf(open, i + 1)
    }
    -1
  }

  /** Read the file head up to and including the first occurrence of
    * `marker` (byte search — the marker is ASCII, which UTF-8 guarantees
    * cannot occur inside a multi-byte sequence), capped at 64 MB.
    */
  private def readHeadThrough(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, marker: Array[Byte],
      cap: Int = 64 << 20): Array[Byte] = {
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1 << 20)
      var scanned = 0
      var done = false
      while (!done && bos.size < cap) {
        val n = in.read(buf)
        if (n < 0) done = true
        else {
          bos.write(buf, 0, n)
          val arr = bos.toByteArray
          val from = math.max(0, scanned - marker.length + 1)
          val hit = indexOfBytes(arr, marker, from)
          if (hit >= 0) { done = true; return arr.take(hit + marker.length) }
          scanned = arr.length
        }
      }
      bos.toByteArray
    } finally in.close()
  }

  private def indexOfBytes(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    while (i <= hay.length - needle.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private def toFrame(spark: SparkSession, colSeq: Seq[String],
      rows: Seq[Row], alias: String): GraftFrame = {
    val schema = StructType(colSeq.map(c => StructField(c, StringType)))
    GraftFrame(spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema), alias)
  }

  private def isScalar(e: Elem): Boolean = !e.child.exists(_.isInstanceOf[Elem])

  /** Auto-mode record-element selection via relationship + cardinality
    * analysis (reference XmlAnalyzer, xml.rs:172-615: per-parent child
    * counts → Cardinality, multi-element patterns = parents with ≥ 2
    * repeating child groups, ranked by max_count × parent_count impact).
    *
    * 1. Walk the wrapper-spliced tree recording, for every (parent label,
    *    child label) relationship, the child count inside each parent
    *    INSTANCE — per-instance max ≥ 2 means one-to-many, the analog of
    *    the reference's `Cardinality::OneToMany`.
    * 2. A parent with ≥ 2 DISTINCT one-to-many child groups is a
    *    multi-entity record (reference find_multi_element_patterns) — the
    *    highest-impact one wins. This is what keeps two sibling repeating
    *    entities (`<customer><order/><order/><address/><address/>`)
    *    flattening as customer×orders×addresses instead of silently
    *    picking whichever child is globally most frequent and dropping
    *    the rest.
    * 3. Otherwise fall back to the most frequent repeating element
    *    (reference find_most_frequent_element), the header-detail / flat
    *    collection case.
    */
  private[sources] def detectRecordTag(root: Elem): String = {
    val spliced = spliceWrappers(root)
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    // (parent label, child label) → per-parent-instance counts
    val rel = scala.collection.mutable.LinkedHashMap.empty[(String, String), scala.collection.mutable.ArrayBuffer[Int]]
    def walk(e: Elem): Unit = {
      val elems = e.child.collect { case c: Elem => c }
      if (elems.nonEmpty) {
        elems.groupBy(_.label).foreach { case (cl, cs) =>
          rel.getOrElseUpdate((e.label, cl), scala.collection.mutable.ArrayBuffer.empty) += cs.size
        }
      }
      elems.foreach { c =>
        counts(c.label) = counts.getOrElse(c.label, 0) + 1
        walk(c)
      }
    }
    walk(spliced)
    // one-to-many groups per parent, with reference-style impact weight
    val oneToMany = rel.toSeq.collect {
      case ((p, c), occ) if occ.max >= 2 => (p, c, occ.max * occ.size)
    }
    val multiEntity = oneToMany.groupBy(_._1).collect {
      case (p, groups) if groups.map(_._2).distinct.size >= 2 =>
        p -> groups.map(_._3).sum
    }
    multiEntity.toSeq.sortBy { case (p, impact) => (-impact, p) }.headOption
      .map(_._1)
      .orElse(counts.filter(_._2 > 1).maxByOption(_._2).map(_._1))
      .getOrElse(root.child.collectFirst { case e: Elem => e.label }
        .getOrElse(root.label))
  }
}
