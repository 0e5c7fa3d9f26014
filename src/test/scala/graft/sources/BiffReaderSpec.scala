package graft.sources

import graft.SparkSpec
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Hand-crafted BIFF8 workbooks (no Excel available here, and shipping a
  * binary fixture would be opaque): the builder assembles the CFB
  * container and the record stream byte for byte, so every parsed field
  * is pinned by the test itself. Two container layouts are exercised —
  * the regular FAT chain (stream ≥ 4096 B) and the mini-stream (small
  * streams chained through the miniFAT), plus an SST string split across
  * a CONTINUE record.
  */
object BiffFixture {

  private def u16(v: Int): Array[Byte] =
    ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array
  private def u32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array
  private def dbl(v: Double): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array

  private def record(id: Int, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    u16(id) ++ u16(body.length) ++ body
  }

  /** Compressed (8-bit) XLUnicodeString with 16-bit length. */
  private def str16(s: String): Array[Byte] =
    u16(s.length) ++ Array(0x00.toByte) ++ s.getBytes("ISO-8859-1")

  private def rkInt(v: Int): Int = (v << 2) | 2
  private def rkInt100(v: Int): Int = (v << 2) | 3

  private def cell(row: Int, col: Int): Array[Byte] =
    u16(row) ++ u16(col) ++ u16(0) // xf index unused by the reader

  /** The workbook stream: globals (SST split over a CONTINUE mid-string)
    * + one sheet with every supported cell record type.
    * Rows: header (name, age, salary, active, note), then
    *  ("john smith", 25, 50000.5, true,  "computed")  — LABELSST/RK/NUMBER/BOOLERR/FORMULA-string
    *  ("jane",       30, 60000.25, false, 12)         — split-SST/MULRK(int,÷100)/BOOLERR/FORMULA-number
    */
  def workbookStream(): Array[Byte] = {
    // SST: 7 strings; "jane" is split "ja" | CONTINUE "ne"
    val sstStrings = Seq("name", "age", "salary", "active", "note", "john smith")
    val sstHead = u32(7) ++ u32(7) ++
      sstStrings.flatMap(s => str16(s)).toArray ++
      u16(4) ++ Array(0x00.toByte) ++ "ja".getBytes("ISO-8859-1")
    val continue = Array(0x00.toByte) ++ "ne".getBytes("ISO-8859-1")

    val sheetCells = Array(
      record(0x0809, u16(0x0600), u16(0x0010), u32(0), u32(0), u32(0)), // sheet BOF
      // header row via LABELSST 0..4
      record(0x00FD, cell(0, 0), u32(0)),
      record(0x00FD, cell(0, 1), u32(1)),
      record(0x00FD, cell(0, 2), u32(2)),
      record(0x00FD, cell(0, 3), u32(3)),
      record(0x00FD, cell(0, 4), u32(4)),
      // row 1
      record(0x00FD, cell(1, 0), u32(5)), // "john smith"
      record(0x027E, cell(1, 1), u32(rkInt(25))), // RK int
      record(0x0203, cell(1, 2), dbl(50000.5)), // NUMBER
      record(0x0205, cell(1, 3), Array(1.toByte, 0.toByte)), // BOOLERR true
      // FORMULA with cached STRING result
      record(0x0006, cell(1, 4),
        Array(0.toByte, 0, 0, 0, 0, 0), u16(0xFFFF), u16(0), u32(0), Array.empty[Byte]),
      record(0x0207, str16("computed")),
      // row 2
      record(0x00FD, cell(2, 0), u32(6)), // the CONTINUE-split "jane"
      // MULRK: age=30 (int RK), salary=60000.25 (÷100 RK); colFirst=1, colLast=2
      record(0x00BD, u16(2), u16(1),
        u16(0), u32(rkInt(30)), u16(0), u32(rkInt100(6000025)), u16(2)),
      record(0x0205, cell(2, 3), Array(0.toByte, 0.toByte)), // BOOLERR false
      record(0x0006, cell(2, 4), dbl(12.0), u16(0), u32(0)), // FORMULA numeric
      record(0x000A)) // sheet EOF

    val sheet = sheetCells.flatten

    // globals, with the BOUNDSHEET offset patched after layout
    def globals(sheetOffset: Int): Array[Byte] = Array(
      record(0x0809, u16(0x0600), u16(0x0005), u32(0), u32(0), u32(0)),
      record(0x0085, u32(sheetOffset), u16(0),
        Array("Sheet1".length.toByte, 0x00.toByte), "Sheet1".getBytes("ISO-8859-1")),
      record(0x00FC, sstHead),
      record(0x003C, continue),
      record(0x000A)).flatten

    val globalsLen = globals(0).length
    globals(globalsLen) ++ sheet
  }

  /** BIFF5 (Excel 5.0/95) workbook stream: same numeric records, but
    * strings are inline codepage byte strings (no SST) and the globals
    * carry a CODEPAGE record. "müller" pins the windows-1252 decode
    * (0xFC is NOT valid ASCII/UTF-8, so a wrong charset shows up).
    */
  def workbookStreamBiff5(): Array[Byte] = {
    val cp = "windows-1252"
    def label(row: Int, col: Int, s: String): Array[Byte] = {
      val b = s.getBytes(cp)
      record(0x0204, cell(row, col), u16(b.length), b)
    }
    val sheetCells = Array(
      record(0x0809, u16(0x0500), u16(0x0010), u32(0), u32(0)), // sheet BOF
      label(0, 0, "name"), label(0, 1, "age"), label(0, 2, "salary"),
      label(0, 3, "active"), label(0, 4, "note"),
      label(1, 0, "müller"),
      record(0x027E, cell(1, 1), u32(rkInt(25))),
      record(0x0203, cell(1, 2), dbl(50000.5)),
      record(0x0205, cell(1, 3), Array(1.toByte, 0.toByte)),
      // FORMULA with cached BIFF5 STRING result (cch16 + codepage bytes)
      record(0x0006, cell(1, 4),
        Array(0.toByte, 0, 0, 0, 0, 0), u16(0xFFFF), u16(0), u32(0)),
      record(0x0207, u16("naïve".getBytes(cp).length), "naïve".getBytes(cp)),
      // RSTRING (0x00D6): LABEL layout + trailing formatting runs the
      // reader must ignore — Excel 5.0/95 writes these for cells with
      // in-cell formatting (one run: start char 0, font 1)
      record(0x00D6, cell(2, 0), u16("jane".getBytes(cp).length),
        "jane".getBytes(cp), Array(1.toByte), u16(0x0100)),
      record(0x00BD, u16(2), u16(1),
        u16(0), u32(rkInt(30)), u16(0), u32(rkInt100(6000025)), u16(2)),
      record(0x0205, cell(2, 3), Array(0.toByte, 0.toByte)),
      record(0x0006, cell(2, 4), dbl(12.0), u16(0), u32(0)),
      record(0x000A))
    val sheet = sheetCells.flatten
    def globals(sheetOffset: Int): Array[Byte] = Array(
      record(0x0809, u16(0x0500), u16(0x0005), u32(0), u32(0)),
      record(0x0042, u16(1252)), // CODEPAGE
      record(0x0085, u32(sheetOffset), u16(0),
        Array("Sheet1".length.toByte), "Sheet1".getBytes("ISO-8859-1")),
      record(0x000A)).flatten
    val globalsLen = globals(0).length
    globals(globalsLen) ++ sheet
  }

  private def entry(name: String, objType: Int, start: Int, size: Int): Array[Byte] = {
    val e = new Array[Byte](128)
    val n = name.getBytes("UTF-16LE")
    System.arraycopy(n, 0, e, 0, n.length)
    System.arraycopy(u16(n.length + 2), 0, e, 64, 2)
    e(66) = objType.toByte
    e(67) = 0 // color
    java.util.Arrays.fill(e, 68, 80, 0.toByte)
    System.arraycopy(u32(0xFFFFFFFF), 0, e, 68, 4) // left sibling
    System.arraycopy(u32(0xFFFFFFFF), 0, e, 72, 4) // right sibling
    System.arraycopy(u32(0xFFFFFFFF), 0, e, 76, 4) // child
    System.arraycopy(u32(start), 0, e, 116, 4)
    System.arraycopy(u32(size), 0, e, 120, 4)
    e
  }

  private val End = 0xFFFFFFFE
  private val Free = 0xFFFFFFFF

  private def header(numFat: Int, dirStart: Int, miniFatStart: Int,
      numMiniFat: Int, difat0: Int): Array[Byte] = {
    val h = new Array[Byte](512)
    val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
    System.arraycopy(magic, 0, h, 0, 8)
    System.arraycopy(u16(0x003E), 0, h, 24, 2) // minor version
    System.arraycopy(u16(0x0003), 0, h, 26, 2) // major version
    System.arraycopy(u16(0xFFFE), 0, h, 28, 2) // byte order
    System.arraycopy(u16(9), 0, h, 30, 2) // sector shift → 512
    System.arraycopy(u16(6), 0, h, 32, 2) // mini shift → 64
    System.arraycopy(u32(numFat), 0, h, 44, 4)
    System.arraycopy(u32(dirStart), 0, h, 48, 4)
    System.arraycopy(u32(4096), 0, h, 56, 4) // mini cutoff
    System.arraycopy(u32(miniFatStart), 0, h, 60, 4)
    System.arraycopy(u32(numMiniFat), 0, h, 64, 4)
    System.arraycopy(u32(End), 0, h, 68, 4) // no DIFAT chain
    System.arraycopy(u32(0), 0, h, 72, 4)
    for (i <- 0 until 109)
      System.arraycopy(u32(if (i == 0) difat0 else Free), 0, h, 76 + 4 * i, 4)
    h
  }

  private def fatSector(entries: Seq[Int]): Array[Byte] = {
    val s = new Array[Byte](512)
    entries.padTo(128, Free).take(128).zipWithIndex.foreach { case (v, i) =>
      System.arraycopy(u32(v), 0, s, 4 * i, 4)
    }
    s
  }

  /** Container with the workbook stream ≥ 4096 B → regular FAT chain. */
  def xlsRegular(wb0: Array[Byte] = workbookStream()): Array[Byte] = {
    val wb = wb0 ++ new Array[Byte](math.max(0, 4096 - wb0.length)) // pad past cutoff
    val wbSectors = (wb.length + 511) / 512
    // layout: sector 0 = FAT, 1 = directory, 2.. = workbook
    val fat = Seq(0xFFFFFFFD, End) ++ // FAT sector marker, directory
      (0 until wbSectors).map(i => if (i == wbSectors - 1) End else 3 + i)
    val dir = entry("Root Entry", 5, End, 0) ++ entry("Workbook", 2, 2, wb.length) ++
      new Array[Byte](256)
    val out = new ByteArrayOutputStream()
    out.write(header(numFat = 1, dirStart = 1, miniFatStart = End, numMiniFat = 0, difat0 = 0))
    out.write(fatSector(fat))
    out.write(dir)
    out.write(wb)
    out.write(new Array[Byte](wbSectors * 512 - wb.length))
    out.toByteArray
  }

  /** Container with the workbook stream < 4096 B → mini-stream layout. */
  def xlsMiniStream(): Array[Byte] = {
    val wb = workbookStream()
    require(wb.length < 4096, "mini fixture must stay under the cutoff")
    val miniSectors = (wb.length + 63) / 64
    val container = wb ++ new Array[Byte](miniSectors * 64 - wb.length)
    val containerSectors = (container.length + 511) / 512
    // layout: sector 0 = FAT, 1 = directory, 2 = miniFAT, 3.. = mini-stream container
    val fat = Seq(0xFFFFFFFD, End, End) ++
      (0 until containerSectors).map(i => if (i == containerSectors - 1) End else 4 + i)
    val miniFat = (0 until miniSectors).map(i => if (i == miniSectors - 1) End else i + 1)
    val dir = entry("Root Entry", 5, 3, container.length) ++
      entry("Workbook", 2, 0, wb.length) ++ new Array[Byte](256)
    val out = new ByteArrayOutputStream()
    out.write(header(numFat = 1, dirStart = 1, miniFatStart = 2, numMiniFat = 1, difat0 = 0))
    out.write(fatSector(fat))
    out.write(dir)
    out.write(fatSector(miniFat))
    out.write(container)
    out.write(containerSectors * 512 - container.length match {
      case 0 => Array.empty[Byte]; case n => new Array[Byte](n)
    })
    out.toByteArray
  }
}

class BiffReaderSpec extends SparkSpec {

  private def tmp(name: String, bytes: Array[Byte]): String = {
    val dir = Paths.get("target/tmp/biff")
    Files.createDirectories(dir)
    val p = dir.resolve(name)
    Files.write(p, bytes)
    p.toString
  }

  private def checkFrame(path: String): Unit = {
    val f = ExcelLoader.load(spark, path, "xls")
    val types = f.df.schema.fields.map(x => x.name -> x.dataType.typeName).toMap
    assert(types == Map("name" -> "string", "age" -> "long",
      "salary" -> "double", "active" -> "boolean", "note" -> "string"))
    val rows = f.df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2), r.getBoolean(3), r.getString(4))).toSet
    assert(rows == Set(
      ("john smith", 25L, 50000.5, true, "computed"),
      ("jane", 30L, 60000.25, false, "12")))
  }

  test("BIFF8 .xls with regular FAT chain: all cell record types decode") {
    checkFrame(tmp("regular.xls", BiffFixture.xlsRegular()))
  }

  test("BIFF8 .xls stored in the mini-stream decodes identically") {
    checkFrame(tmp("mini.xls", BiffFixture.xlsMiniStream()))
  }

  test("extension dispatch routes genuine .xls through the BIFF reader") {
    val p = tmp("dispatch.xls", BiffFixture.xlsRegular())
    assert(Loaders.load(spark, p, "xd").df.count() == 2)
  }

  test("BIFF5 .xls decodes: codepage strings, no SST, same numeric records") {
    val p = tmp("biff5.xls", BiffFixture.xlsRegular(BiffFixture.workbookStreamBiff5()))
    val f = ExcelLoader.load(spark, p, "xls5")
    val types = f.df.schema.fields.map(x => x.name -> x.dataType.typeName).toMap
    assert(types == Map("name" -> "string", "age" -> "long",
      "salary" -> "double", "active" -> "boolean", "note" -> "string"))
    val rows = f.df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2), r.getBoolean(3), r.getString(4))).toSet
    // "müller"/"naïve" pin the windows-1252 byte-string decode
    assert(rows == Set(
      ("müller", 25L, 50000.5, true, "naïve"),
      ("jane", 30L, 60000.25, false, "12")))
  }

  test("pre-BIFF5 and corrupt containers get typed errors") {
    // BIFF4 version word in the BOF
    val wb = BiffFixture.workbookStream()
    // patch the globals BOF version (offset 4-5 inside the stream)
    wb(4) = 0x00.toByte; wb(5) = 0x04.toByte
    val e = intercept[graft.GraftError.InvalidOperation] { BiffReader.rows({
      // wrap the patched stream in the regular container layout
      val fixed = BiffFixture.xlsRegular()
      // the container embeds a fresh stream; patch its copy too (same offset:
      // header 512 + fat 512 + dir 512)
      fixed(1536 + 4) = 0x00.toByte; fixed(1536 + 5) = 0x04.toByte
      fixed
    }) }
    assert(e.getMessage.contains("BIFF8"))
    val corrupt = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte) ++
      new Array[Byte](600)
    val e2 = intercept[graft.GraftError.InvalidOperation] {
      ExcelLoader.load(spark, tmp("corrupt.xls", corrupt), "c")
    }
    assert(e2.getMessage.contains("OLE2"))
  }
}
