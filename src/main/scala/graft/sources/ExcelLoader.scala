package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.GraftFrame
import graft.normalize.Normalize
import org.apache.hadoop.fs.{Path => HPath}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import scala.xml.XML

/** Minimal Excel reader/writer (reference src/features/excel.rs: calamine
  * load with header sanitize + dedupe + per-column type detection;
  * rust_xlsxwriter typed-cell writer).
  *
  * XLSX is a zip of XML parts; this implementation reads/writes the
  * minimal part set (workbook, one worksheet, shared strings) with no
  * external dependency. Legacy `.xls` (BIFF8/OLE2, sniffed by magic
  * bytes, not extension) routes to [[BiffReader]]. Values load as
  * strings and run through the same majority-vote smart caster as CSV
  * (so `50000.5`/`true`/dates behave identically across loaders).
  * Formula caching, styles, and Excel serial date rendering are out of
  * scope — numbers arrive as their cached values.
  */
object ExcelLoader {

  // ───────────────────────────── reader ─────────────────────────────────

  def load(spark: SparkSession, path: String, alias: String): GraftFrame = {
    val rows = readRows(spark, path)
    require(rows.nonEmpty, s"loadExcel: empty sheet in $path")
    val width = rows.map(m => if (m.isEmpty) 0 else m.keys.max + 1).max
    val headers = Normalize.sanitizeHeaders(
      (0 until width).map(i => rows.head.getOrElse(i, s"col${i + 1}")))
    val dataRows = rows.tail.map(m =>
      Row.fromSeq((0 until width).map(i => m.get(i).orNull)))
    val schema = StructType(headers.map(h => StructField(h, StringType)))
    val raw = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(dataRows: _*)), schema)
    // same majority-vote typing as the CSV smart caster
    val sample = raw.limit(100).collect()
    val classes = headers.zipWithIndex.map { case (n, i) =>
      n -> CsvSmartCaster.vote(sample.toSeq.flatMap(r => Option(r.getString(i))))
    }.toMap
    val typed = raw.select(headers.map(h =>
      CsvSmartCaster.castExpr(org.apache.spark.sql.functions.col(h), classes(h)).as(h)): _*)
    GraftFrame(typed, alias)
  }

  private def colIndex(letters: String): Int =
    letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1

  /** Open via the Hadoop FS API (HDFS/S3/file: paths all work) and sniff
    * the container by magic bytes, the way calamine dispatches on content
    * (reference src/features/excel.rs:385-645): `PK` → OOXML zip (even if
    * the file is named `.xls` — mislabeled xlsx is common), the OLE2
    * signature D0 CF 11 E0 → legacy BIFF8, parsed by [[BiffReader]].
    * Anything else gets a typed InvalidOperation, not an opaque zip error.
    */
  private def readRows(spark: SparkSession, path: String): Seq[Map[Int, String]] = {
    val hPath = new HPath(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(hPath)
    val bytes = try in.readAllBytes() finally in.close()
    if (bytes.length >= 4 && bytes(0) == 0xD0.toByte && bytes(1) == 0xCF.toByte &&
        bytes(2) == 0x11.toByte && bytes(3) == 0xE0.toByte)
      return BiffReader.rows(bytes)
    if (bytes.length < 2 || bytes(0) != 'P'.toByte || bytes(1) != 'K'.toByte)
      throw graft.GraftError.InvalidOperation("load_excel",
        s"$path is not an Excel workbook (neither zip nor OLE2 signature)")
    xlsxRows(bytes, path)
  }

  private def xlsxRows(bytes: Array[Byte], path: String): Seq[Map[Int, String]] = {
    val parts = {
      val zis = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
      try Iterator.continually(zis.getNextEntry).takeWhile(_ != null).map { e =>
        e.getName -> new String(zis.readAllBytes(), "UTF-8")
      }.toMap
      finally zis.close()
    }
    val sheetXmlName = parts.keys
      .find(_.matches("xl/worksheets/sheet1\\.xml"))
      .orElse(parts.keys.find(_.startsWith("xl/worksheets/")))
      .getOrElse(throw new IllegalArgumentException(s"no worksheet in $path"))
    val shared: IndexedSeq[String] = parts.get("xl/sharedStrings.xml")
      .map(x => (XML.loadString(x) \\ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq)
      .getOrElse(IndexedSeq.empty)
    val sheet = XML.loadString(parts(sheetXmlName))
    (sheet \\ "row").map { r =>
      (r \ "c").flatMap { c =>
        val ref = (c \ "@r").text
        val colIdx = colIndex(ref.takeWhile(_.isLetter))
        val t = (c \ "@t").text
        val value = t match {
          case "s" => (c \ "v").headOption.map(v => shared(v.text.trim.toInt))
          case "inlineStr" => Some((c \\ "t").map(_.text).mkString)
          case "b" => (c \ "v").headOption.map(v => if (v.text.trim == "1") "true" else "false")
          case _ => (c \ "v").headOption.map(_.text)
        }
        value.map(colIdx -> _)
      }.toMap
    }
  }

  // ───────────────────────────── writer ─────────────────────────────────

  /** Single-sheet XLSX with typed cells: numbers as numeric cells,
    * booleans as b-cells, everything else as inline strings.
    */
  def write(df: DataFrame, path: String, sheetName: String = "Sheet1"): Unit = {
    val headers = df.columns
    val data = df.collect() // driver-side by nature of the single-file format
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def cellRef(r: Int, c: Int): String = {
      var n = c + 1; val s = new StringBuilder
      while (n > 0) { s.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      s.append((r + 1).toString).toString
    }
    def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    sb.append("<row r=\"1\">")
    headers.zipWithIndex.foreach { case (h, c) =>
      sb.append(s"""<c r="${cellRef(0, c)}" t="inlineStr"><is><t>${esc(h)}</t></is></c>""")
    }
    sb.append("</row>")
    data.zipWithIndex.foreach { case (row, r) =>
      sb.append(s"""<row r="${r + 2}">""")
      headers.indices.foreach { c =>
        val v = row.get(c)
        val ref = cellRef(r + 1, c)
        v match {
          case null => ()
          case b: Boolean =>
            sb.append(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
          case n: Number =>
            sb.append(s"""<c r="$ref"><v>$n</v></c>""")
          case other =>
            sb.append(s"""<c r="$ref" t="inlineStr"><is><t>${esc(other.toString)}</t></is></c>""")
        }
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")

    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """</Types>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>"""
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        s"""<sheets><sheet name="${sheetName}" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """</Relationships>"""

    // write through the Hadoop FS API so xlsx sinks work on any
    // filesystem, not just local disk (same fix class as folder/JSON loads)
    val hPath = new HPath(path)
    val fs = hPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    Option(hPath.getParent).foreach(fs.mkdirs(_))
    val zos = new ZipOutputStream(fs.create(hPath, true))
    try {
      def put(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", wbRels)
      put("xl/worksheets/sheet1.xml", sb.toString)
    } finally zos.close()
  }
}
