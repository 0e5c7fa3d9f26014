package graft.sources

import graft.GraftError

/** Minimal legacy-`.xls` (BIFF8) reader — the format calamine handles for
  * the reference's Excel loads (reference src/features/excel.rs:385-645).
  * Two layers, both parsed dependency-free:
  *
  *  1. **CFB / OLE2 compound container** (the D0 CF 11 E0 magic): FAT
  *     sector chains, the directory stream, and the mini-stream for
  *     streams below the cutoff (4096 B) — enough to extract the
  *     `Workbook` (or `Book`) stream.
  *  2. **BIFF8 record stream**: workbook globals (SST shared strings with
  *     CONTINUE spill-over, BOUNDSHEET sheet offsets) and the first
  *     worksheet substream's cell records — NUMBER, RK, MULRK, LABELSST,
  *     BOOLERR, LABEL, FORMULA (cached numeric/string/bool results with
  *     the trailing STRING record), BLANK/MULBLANK skipped.
  *
  * Output is the same `Seq[Map[colIndex → cellString]]` shape the XLSX
  * path produces, so header handling and the majority-vote smart caster
  * are shared. BIFF5/BIFF7 (Excel 5.0/95) is read too: numeric records
  * are identical, strings switch to inline CODEPAGE byte strings (no
  * SST). BIFF4 and older get a typed rejection rather than garbage.
  */
object BiffReader {

  // ───────────────────────── CFB container ─────────────────────────────

  private val FreeSect = 0xFFFFFFFF
  private val EndOfChain = 0xFFFFFFFE

  private def u16(d: Array[Byte], o: Int): Int =
    (d(o) & 0xFF) | ((d(o + 1) & 0xFF) << 8)
  private def u32(d: Array[Byte], o: Int): Int =
    (d(o) & 0xFF) | ((d(o + 1) & 0xFF) << 8) | ((d(o + 2) & 0xFF) << 16) | ((d(o + 3) & 0xFF) << 24)

  private def fail(reason: String): Nothing =
    throw GraftError.InvalidOperation("load_excel", reason)

  /** Extract a named stream ("Workbook"/"Book") from a CFB container. */
  private[sources] def cfbStream(data: Array[Byte], names: Seq[String]): Array[Byte] = {
    if (data.length < 512) fail("truncated OLE2 container")
    val sectorShift = u16(data, 30)
    if (sectorShift < 7 || sectorShift > 12)
      fail(s"corrupt OLE2 container (sector shift $sectorShift)")
    val sectorSize = 1 << sectorShift
    val miniSize = 1 << u16(data, 32)
    val dirStart = u32(data, 48)
    val miniCutoff = u32(data, 56)
    val miniFatStart = u32(data, 60)
    val numDifat = u32(data, 72)
    def sectorOffset(s: Int): Int = (s + 1) * sectorSize

    // FAT sector list: 109 header DIFAT entries + chained DIFAT sectors
    val fatSectors = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (i <- 0 until 109) {
      val s = u32(data, 76 + 4 * i)
      if (s != FreeSect && s != EndOfChain) fatSectors += s
    }
    var difat = u32(data, 68)
    var difatSeen = 0
    while (difat != EndOfChain && difat != FreeSect && difatSeen <= numDifat + 1) {
      val off = sectorOffset(difat)
      val perSector = sectorSize / 4 - 1
      for (i <- 0 until perSector) {
        val s = u32(data, off + 4 * i)
        if (s != FreeSect && s != EndOfChain) fatSectors += s
      }
      difat = u32(data, off + sectorSize - 4)
      difatSeen += 1
    }
    val entriesPerFat = sectorSize / 4
    val fat = new Array[Int](fatSectors.length * entriesPerFat)
    fatSectors.zipWithIndex.foreach { case (s, i) =>
      val off = sectorOffset(s)
      for (j <- 0 until entriesPerFat) fat(i * entriesPerFat + j) = u32(data, off + 4 * j)
    }

    def chain(start: Int): Seq[Int] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var s = start
      while (s != EndOfChain && s != FreeSect) {
        if (s < 0 || s >= fat.length) fail(s"corrupt OLE2 container (FAT chain sector $s out of range)")
        if (out.length > fat.length) fail("corrupt OLE2 container (cyclic FAT chain)")
        out += s
        s = fat(s)
      }
      out.toSeq
    }
    def readChain(start: Int): Array[Byte] = {
      val sects = chain(start)
      val out = new Array[Byte](sects.length * sectorSize)
      sects.zipWithIndex.foreach { case (s, i) =>
        val off = sectorOffset(s)
        if (off >= data.length) fail(s"corrupt OLE2 container (sector $s past end of file)")
        System.arraycopy(data, off, out, i * sectorSize, math.min(sectorSize, data.length - off))
      }
      out
    }

    val dir = readChain(dirStart)
    case class Entry(name: String, objType: Int, start: Int, size: Long)
    val entries = (0 until dir.length / 128).map { i =>
      val off = i * 128
      val nameLen = u16(dir, off + 64) // bytes incl. trailing null
      val name =
        if (nameLen >= 2)
          new String(dir, off, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
        else ""
      Entry(name, dir(off + 66) & 0xFF, u32(dir, off + 116),
        u32(dir, off + 120).toLong & 0xFFFFFFFFL)
    }
    val root = entries.find(_.objType == 5).getOrElse(fail("OLE2 container has no root entry"))
    val target = entries.find(e => e.objType == 2 && names.contains(e.name))
      .getOrElse(fail(s"no ${names.mkString("/")} stream in OLE2 container — not an Excel workbook?"))

    if (target.size >= miniCutoff) {
      readChain(target.start).take(target.size.toInt)
    } else {
      // mini-stream: 64-byte sectors inside the root entry's stream,
      // chained through the miniFAT
      val miniContainer = readChain(root.start)
      val miniFatRaw = readChain(miniFatStart)
      val out = new Array[Byte](target.size.toInt)
      var s = target.start
      var pos = 0
      var steps = 0
      val maxSteps = miniFatRaw.length / 4 + 1
      while (s != EndOfChain && s != FreeSect && pos < target.size) {
        if (s < 0 || (s + 1) * miniSize > miniContainer.length ||
            4 * s + 4 > miniFatRaw.length)
          fail(s"corrupt OLE2 container (mini-stream sector $s out of range)")
        if (steps > maxSteps) fail("corrupt OLE2 container (cyclic mini-FAT chain)")
        steps += 1
        val n = math.min(miniSize, target.size.toInt - pos)
        System.arraycopy(miniContainer, s * miniSize, out, pos, n)
        pos += n
        s = u32(miniFatRaw, 4 * s)
      }
      out
    }
  }

  // ───────────────────────── BIFF8 records ─────────────────────────────

  private case class Record(id: Int, start: Int, len: Int)

  private def records(wb: Array[Byte], from: Int): Iterator[Record] =
    new Iterator[Record] {
      private var pos = from
      def hasNext: Boolean = pos + 4 <= wb.length && {
        val id = u16(wb, pos)
        id != 0 || u16(wb, pos + 2) != 0 // zero padding after final EOF
      }
      def next(): Record = {
        val id = u16(wb, pos); val len = u16(wb, pos + 2)
        val r = Record(id, pos + 4, len)
        pos += 4 + len
        r
      }
    }

  /** Cursor over the concatenated data of an SST record and its CONTINUE
    * records. Strings spilling across a boundary restart with a fresh
    * compression-flag byte (the BIFF8 contract).
    */
  private final class SstCursor(wb: Array[Byte], segs: Seq[Record]) {
    private var seg = 0
    private var pos = 0
    private def remainingInSeg: Int = segs(seg).len - pos
    private def advanceSeg(): Unit = {
      seg += 1
      if (seg >= segs.length) fail("BIFF SST truncated (ran past the last CONTINUE record)")
      pos = 0
    }
    def readU8(): Int = {
      if (remainingInSeg == 0) advanceSeg()
      val v = wb(segs(seg).start + pos) & 0xFF
      pos += 1; v
    }
    def readU16(): Int = readU8() | (readU8() << 8)
    def readU32(): Int = readU16() | (readU16() << 16)
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) {
        if (remainingInSeg == 0) advanceSeg()
        val step = math.min(left, remainingInSeg)
        pos += step; left -= step
      }
    }
    /** Read `cch` characters honoring per-segment compression flags. */
    def readChars(cch: Int, highByteFirst: Boolean): String = {
      val sb = new StringBuilder(cch)
      var high = highByteFirst
      var left = cch
      while (left > 0) {
        if (remainingInSeg == 0) {
          advanceSeg()
          high = (readU8() & 1) == 1 // continued string restates the flag
        }
        val charBytes = if (high) 2 else 1
        val avail = remainingInSeg / charBytes
        val take = math.min(left, avail)
        if (take == 0 && remainingInSeg > 0) fail("BIFF SST string split mid-character")
        val bytes = take * charBytes
        val s =
          if (high) new String(wb, segs(seg).start + pos, bytes,
            java.nio.charset.StandardCharsets.UTF_16LE)
          else {
            val a = new Array[Char](take)
            var i = 0
            while (i < take) { a(i) = (wb(segs(seg).start + pos + i) & 0xFF).toChar; i += 1 }
            new String(a)
          }
        sb.append(s)
        pos += bytes
        left -= take
      }
      sb.toString
    }
  }

  private def parseSst(wb: Array[Byte], sst: Record, continues: Seq[Record]): IndexedSeq[String] = {
    val cur = new SstCursor(wb, sst +: continues)
    cur.readU32() // total string instances
    val unique = cur.readU32()
    val out = new scala.collection.mutable.ArrayBuffer[String](unique)
    var i = 0
    while (i < unique) {
      val cch = cur.readU16()
      val grbit = cur.readU8()
      val high = (grbit & 0x01) == 1
      val hasExt = (grbit & 0x04) != 0
      val hasRich = (grbit & 0x08) != 0
      val richRuns = if (hasRich) cur.readU16() else 0
      val extSize = if (hasExt) cur.readU32() else 0
      out += cur.readChars(cch, high)
      cur.skip(richRuns * 4 + extSize)
      i += 1
    }
    out.toIndexedSeq
  }

  /** Decode an RK value: 30-bit payload, bit0 = ×1/100, bit1 = int vs
    * truncated IEEE double.
    */
  private def rkValue(rk: Int): Double = {
    val div100 = (rk & 1) == 1
    val isInt = (rk & 2) == 2
    val v =
      if (isInt) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if (div100) v / 100.0 else v
  }

  /** Windows codepage id → JVM charset for BIFF5 byte strings. Unknown
    * codepages fall back to windows-1252 (what Excel wrote by default in
    * the locales where pre-97 files still circulate) — a wrong fallback
    * garbles non-ASCII glyphs but never throws or shifts cell boundaries,
    * since all these charsets are single-byte-indexed by cch.
    */
  private def biffCharset(codepage: Int): java.nio.charset.Charset = {
    val name = codepage match {
      case 437 => "IBM437"
      case 850 => "IBM850"
      case 932 => "windows-31j"
      case 936 => "GBK"
      case 949 => "x-windows-949"
      case 950 => "Big5"
      case 10000 => "x-MacRoman"
      case 28591 => "ISO-8859-1"
      case 65001 => "UTF-8"
      case cp if cp >= 1250 && cp <= 1258 => s"windows-$cp"
      case _ => "windows-1252"
    }
    try java.nio.charset.Charset.forName(name)
    catch { case _: Exception =>
      java.nio.charset.Charset.forName("windows-1252") }
  }

  /** Render a numeric cell the way the XLSX path stores it: integral
    * values without a fraction so the smart caster votes integer.
    */
  private def numStr(v: Double): String =
    if (v == scala.math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  /** Parse the workbook stream → sparse rows (rowIdx → colIdx → value). */
  private[sources] def rows(data: Array[Byte]): Seq[Map[Int, String]] = {
    val wb = cfbStream(data, Seq("Workbook", "Book"))
    if (wb.length < 8 || u16(wb, 0) != 0x0809)
      fail("stream does not start with a BIFF BOF record")
    val biffVersion = u16(wb, 4)
    // BIFF8 = 0x0600 (Excel 97+); BIFF5/BIFF7 = 0x0500 (Excel 5.0/95):
    // same record framing and numeric cells, but strings are CODEPAGE
    // byte strings and there is no SST (reference excel.rs:385-645 reads
    // both through calamine)
    val biff5 = biffVersion == 0x0500
    if (biffVersion != 0x0600 && !biff5)
      fail(f"unsupported BIFF version 0x$biffVersion%04X — only BIFF8 " +
        "(Excel 97+) and BIFF5 (Excel 5.0/95) .xls are readable; re-save as .xlsx")

    // pass 1: globals — SST (+ its CONTINUEs), CODEPAGE, first sheet offset
    var sst: IndexedSeq[String] = IndexedSeq.empty
    var codepage = if (biff5) 1252 else 1200
    var firstSheetOffset = -1
    val globals = records(wb, 0)
    var pendingSst: Option[(Record, scala.collection.mutable.ArrayBuffer[Record])] = None
    var done = false
    while (globals.hasNext && !done) {
      val r = globals.next()
      r.id match {
        case 0x00FC => pendingSst = Some((r, scala.collection.mutable.ArrayBuffer.empty))
        case 0x003C => pendingSst.foreach(_._2 += r)
        case 0x0042 => codepage = u16(wb, r.start) // CODEPAGE
        case 0x0085 => // BOUNDSHEET: sheet-BOF position, first sheet wins
          if (firstSheetOffset < 0) firstSheetOffset = u32(wb, r.start)
        case 0x000A => done = true // EOF of globals substream
        case _ => ()
      }
    }
    val charset = biffCharset(codepage)
    pendingSst.foreach { case (s, conts) => sst = parseSst(wb, s, conts.toSeq) }
    if (firstSheetOffset < 0) fail("BIFF workbook has no sheets")

    // pass 2: the sheet substream's cell records
    val cells = scala.collection.mutable.LinkedHashMap.empty[Int, scala.collection.mutable.Map[Int, String]]
    def put(row: Int, c: Int, v: String): Unit =
      cells.getOrElseUpdate(row, scala.collection.mutable.LinkedHashMap.empty)(c) = v
    val sheet = records(wb, firstSheetOffset)
    var lastFormulaCell: Option[(Int, Int)] = None // STRING record follows FORMULA
    var inSheet = false
    var ended = false
    while (sheet.hasNext && !ended) {
      val r = sheet.next()
      r.id match {
        case 0x0809 =>
          if (inSheet) ended = true else inSheet = true // next substream begins
        case 0x000A => ended = true
        case 0x0203 => // NUMBER
          put(u16(wb, r.start), u16(wb, r.start + 2),
            numStr(java.lang.Double.longBitsToDouble(
              java.nio.ByteBuffer.wrap(wb, r.start + 6, 8)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong)))
        case 0x027E => // RK
          put(u16(wb, r.start), u16(wb, r.start + 2), numStr(rkValue(u32(wb, r.start + 6))))
        case 0x00BD => // MULRK: row, colFirst, (xf+rk)*, colLast
          val row = u16(wb, r.start); val colFirst = u16(wb, r.start + 2)
          val n = (r.len - 6) / 6
          for (i <- 0 until n)
            put(row, colFirst + i, numStr(rkValue(u32(wb, r.start + 4 + 6 * i + 2))))
        case 0x00FD => // LABELSST
          val idx = u32(wb, r.start + 6)
          if (idx < 0 || idx >= sst.length) fail(s"LABELSST index $idx out of SST range")
          put(u16(wb, r.start), u16(wb, r.start + 2), sst(idx))
        case 0x0204 | 0x00D6 => // LABEL / RSTRING (label + ignorable
          // formatting runs — Excel 5.0/95 writes RSTRING for cells with
          // in-cell formatting; the string layout matches LABEL)
          val cch = u16(wb, r.start + 6)
          val s =
            if (biff5) new String(wb, r.start + 8, cch, charset)
            else if ((wb(r.start + 8) & 1) == 1)
              new String(wb, r.start + 9, cch * 2,
                java.nio.charset.StandardCharsets.UTF_16LE)
            else new String(wb, r.start + 9, cch,
              java.nio.charset.StandardCharsets.ISO_8859_1)
          put(u16(wb, r.start), u16(wb, r.start + 2), s)
        case 0x0205 => // BOOLERR
          val isErr = (wb(r.start + 7) & 0xFF) == 1
          if (!isErr)
            put(u16(wb, r.start), u16(wb, r.start + 2),
              if ((wb(r.start + 6) & 0xFF) == 1) "true" else "false")
        case 0x0006 => // FORMULA: cached result in bytes 6-13
          val row = u16(wb, r.start); val c = u16(wb, r.start + 2)
          if (u16(wb, r.start + 12) == 0xFFFF) {
            (wb(r.start + 6) & 0xFF) match {
              case 0 => lastFormulaCell = Some((row, c)) // string follows
              case 1 => put(row, c, if ((wb(r.start + 8) & 0xFF) == 1) "true" else "false")
              case _ => () // error / empty cached value
            }
          } else {
            put(row, c, numStr(java.lang.Double.longBitsToDouble(
              java.nio.ByteBuffer.wrap(wb, r.start + 6, 8)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong)))
          }
        case 0x0207 => // STRING: cached string result of the last FORMULA
          lastFormulaCell.foreach { case (row, c) =>
            val cch = u16(wb, r.start)
            val s =
              if (biff5) new String(wb, r.start + 2, cch, charset)
              else if ((wb(r.start + 2) & 1) == 1)
                new String(wb, r.start + 3, cch * 2,
                  java.nio.charset.StandardCharsets.UTF_16LE)
              else new String(wb, r.start + 3, cch,
                java.nio.charset.StandardCharsets.ISO_8859_1)
            put(row, c, s)
          }
          lastFormulaCell = None
        case _ => ()
      }
    }
    if (cells.isEmpty) fail("BIFF sheet has no cells")
    val maxRow = cells.keys.max
    (0 to maxRow).map(r => cells.get(r).map(_.toMap).getOrElse(Map.empty))
  }
}
