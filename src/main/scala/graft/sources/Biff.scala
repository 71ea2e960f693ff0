package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal legacy `.xls` (BIFF8 inside a CFB/OLE2 compound file) reader,
  * JDK-only, covering what the reference's Excel intake actually consumes
  * (ref: /root/reference/247/tools/read_file_tool.py:20-28 accepts `.xls`
  * alongside `.xlsx/.xlsm`): sheet names/visibility/active tab and a raw
  * string grid of cell values.
  *
  * Supported records: BOF, BOUNDSHEET, WINDOW1, SST (+CONTINUE spanning,
  * including a mid-string continuation's fresh grbit byte), LABELSST,
  * LABEL, NUMBER, RK, MULRK, BOOLERR, FORMULA (numeric / cached-string /
  * bool caches). Rich-text runs and phonetic data are skipped per spec
  * lengths; styles/formats are out of scope (values come back in their
  * lexical form like the xlsx reader's).
  *
  * Scale note: like [[Xlsx]], this is a driver-side config-grid source —
  * the 100 TB data path is parquet/csv/stream sources, never spreadsheets.
  */
object Biff {

  // ── CFB (compound file) layer ──────────────────────────────────────────

  private val CfbMagic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    .map(_.toByte)

  def isCfb(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && bytes.take(8).sameElements(CfbMagic)

  private final case class DirEntry(name: String, objType: Int,
                                    startSector: Int, size: Long, child: Int)

  private final class Cfb(bytes: Array[Byte]) {
    private def u16(off: Int): Int =
      ByteBuffer.wrap(bytes, off, 2).order(ByteOrder.LITTLE_ENDIAN).getShort & 0xFFFF
    private def i32(off: Int): Int =
      ByteBuffer.wrap(bytes, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

    require(isCfb(bytes), "not a compound file (bad magic)")
    private val sectorSize = 1 << u16(0x1E)
    private val miniSectorSize = 1 << u16(0x20)
    private val numFatSectors = i32(0x2C)
    private val firstDirSector = i32(0x30)
    private val miniCutoff = i32(0x38)
    private val firstMiniFatSector = i32(0x3C)
    private val numMiniFat = i32(0x40)
    private val firstDifatSector = i32(0x44)
    private val numDifat = i32(0x48)

    private def sectorBytes(sector: Int): Array[Byte] = {
      // Sector 0 starts AFTER the 512-byte header, at offset sectorSize —
      // (sector+1)*sectorSize per MS-CFB §2.2. For v3 (512-byte sectors)
      // this equals 512 + sector*512; for v4 (4096-byte sectors, which the
      // header parsing accepts via 1 << u16(0x1E)) the header pads to one
      // full sector, so the old 512-based formula read garbage.
      val off = (sector + 1) * sectorSize
      java.util.Arrays.copyOfRange(bytes, off, off + sectorSize)
    }

    // FAT sector list: 109 header DIFAT slots, then DIFAT chain sectors.
    private val fatSectors: Seq[Int] = {
      val fromHeader = (0 until math.min(109, numFatSectors))
        .map(i => i32(0x4C + i * 4))
      var extra = Vector.empty[Int]
      var difat = firstDifatSector
      var remaining = numFatSectors - fromHeader.size
      var guard = 0
      while (difat >= 0 && remaining > 0 && guard < numDifat + 1) {
        val sec = sectorBytes(difat)
        val ints = ByteBuffer.wrap(sec).order(ByteOrder.LITTLE_ENDIAN)
        val perSector = sectorSize / 4 - 1
        (0 until perSector).foreach { i =>
          val s = ints.getInt(i * 4)
          if (s >= 0 && remaining > 0) { extra :+= s; remaining -= 1 }
        }
        difat = ints.getInt(sectorSize - 4)
        guard += 1
      }
      fromHeader ++ extra
    }

    private val fat: Array[Int] = {
      val out = new Array[Int](fatSectors.size * (sectorSize / 4))
      fatSectors.zipWithIndex.foreach { case (s, i) =>
        val bb = ByteBuffer.wrap(sectorBytes(s)).order(ByteOrder.LITTLE_ENDIAN)
        (0 until sectorSize / 4).foreach(j => out(i * (sectorSize / 4) + j) = bb.getInt(j * 4))
      }
      out
    }

    private def chain(start: Int, table: Array[Int]): Seq[Int] = {
      var s = start
      val b = Vector.newBuilder[Int]
      var guard = 0
      while (s >= 0 && guard <= table.length) { b += s; s = table(s); guard += 1 }
      b.result()
    }

    private def readChain(start: Int, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      chain(start, fat).foreach(s => out.write(sectorBytes(s)))
      java.util.Arrays.copyOf(out.toByteArray, size.toInt)
    }

    val entries: Seq[DirEntry] = {
      val dir = {
        val out = new java.io.ByteArrayOutputStream()
        chain(firstDirSector, fat).foreach(s => out.write(sectorBytes(s)))
        out.toByteArray
      }
      (0 until dir.length / 128).map { i =>
        val off = i * 128
        val nameLen = ByteBuffer.wrap(dir, off + 64, 2)
          .order(ByteOrder.LITTLE_ENDIAN).getShort & 0xFFFF
        val name =
          if (nameLen >= 2)
            new String(dir, off, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
          else ""
        // NB: absolute ByteBuffer indices count from the ARRAY start even
        // when wrapped with an offset — index with off+field explicitly.
        val bb = ByteBuffer.wrap(dir).order(ByteOrder.LITTLE_ENDIAN)
        DirEntry(name, dir(off + 66) & 0xFF, bb.getInt(off + 116),
          bb.getLong(off + 120) & 0xFFFFFFFFL, bb.getInt(off + 76))
      }
    }

    private lazy val miniFat: Array[Int] = {
      val out = new java.io.ByteArrayOutputStream()
      if (numMiniFat > 0) chain(firstMiniFatSector, fat).foreach(s => out.write(sectorBytes(s)))
      val b = out.toByteArray
      val ints = new Array[Int](b.length / 4)
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      ints.indices.foreach(i => ints(i) = bb.getInt(i * 4))
      ints
    }

    private lazy val miniStream: Array[Byte] = {
      val root = entries.find(_.objType == 5).getOrElse(
        throw new IllegalArgumentException("compound file has no root entry"))
      readChain(root.startSector, root.size)
    }

    def stream(name: String): Option[Array[Byte]] =
      entries.find(e => e.objType == 2 && e.name == name).map { e =>
        if (e.size >= miniCutoff) readChain(e.startSector, e.size)
        else {
          val out = new java.io.ByteArrayOutputStream()
          chain(e.startSector, miniFat).foreach { s =>
            out.write(miniStream, s * miniSectorSize,
              math.min(miniSectorSize, miniStream.length - s * miniSectorSize))
          }
          java.util.Arrays.copyOf(out.toByteArray, e.size.toInt)
        }
      }
  }

  // ── BIFF8 record layer ────────────────────────────────────────────────

  private object Rec {
    val BOF = 0x809; val EOF = 0x0A; val BOUNDSHEET = 0x85; val WINDOW1 = 0x3D
    val SST = 0xFC; val CONTINUE = 0x3C; val LABELSST = 0xFD; val LABEL = 0x204
    val NUMBER = 0x203; val RK = 0x27E; val MULRK = 0xBD; val BOOLERR = 0x205
    val FORMULA = 0x06; val STRING = 0x207
  }

  private final case class Record(id: Int, data: Array[Byte], offset: Int)

  private def records(stream: Array[Byte], from: Int = 0): Iterator[Record] =
    new Iterator[Record] {
      private var pos = from
      def hasNext: Boolean = pos + 4 <= stream.length
      def next(): Record = {
        val bb = ByteBuffer.wrap(stream, pos, 4).order(ByteOrder.LITTLE_ENDIAN)
        val id = bb.getShort & 0xFFFF
        val len = bb.getShort(pos + 2) & 0xFFFF
        val rec = Record(id,
          java.util.Arrays.copyOfRange(stream, pos + 4, pos + 4 + len), pos)
        pos += 4 + len
        rec
      }
    }

  /** Cursor over a record's payload that transparently crosses into
    * CONTINUE records; `readCharsContinued` re-reads the fresh grbit byte a
    * mid-string continuation carries. */
  private final class SstCursor(first: Record, rest: Iterator[Record]) {
    private var data = first.data
    private var pos = 0
    private def ensure(n: Int): Unit =
      if (pos + n > data.length) advance()
    private def advance(): Unit = {
      if (!rest.hasNext) throw new IllegalArgumentException("SST truncated")
      val r = rest.next()
      require(r.id == Rec.CONTINUE, s"expected CONTINUE, got 0x${r.id.toHexString}")
      data = r.data; pos = 0
    }
    def atRecordEnd: Boolean = pos >= data.length
    def u8(): Int = { ensure(1); val v = data(pos) & 0xFF; pos += 1; v }
    def u16(): Int = { ensure(2)
      val v = ByteBuffer.wrap(data, pos, 2).order(ByteOrder.LITTLE_ENDIAN).getShort & 0xFFFF
      pos += 2; v }
    def i32(): Int = { ensure(4)
      val v = ByteBuffer.wrap(data, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      pos += 4; v }
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) {
        if (atRecordEnd) advance()
        val take = math.min(left, data.length - pos)
        pos += take; left -= take
      }
    }
    /** `cch` characters, compressed (1B) or UTF-16LE (2B) per `grbit` bit 0;
      * when the char run crosses a CONTINUE boundary the next chunk begins
      * with its own grbit byte (the encoding may switch mid-string). */
    def readCharsContinued(cch: Int, grbit0: Int): String = {
      val sb = new StringBuilder(cch)
      var remaining = cch
      var wide = (grbit0 & 1) == 1
      while (remaining > 0) {
        if (atRecordEnd) { advance(); wide = (u8() & 1) == 1 }
        val bytesPer = if (wide) 2 else 1
        val avail = (data.length - pos) / bytesPer
        val take = math.min(remaining, avail)
        if (take == 0 && !atRecordEnd)
          throw new IllegalArgumentException("SST char run stalled")
        if (wide)
          sb.append(new String(data, pos, take * 2, java.nio.charset.StandardCharsets.UTF_16LE))
        else
          (0 until take).foreach(i => sb.append((data(pos + i) & 0xFF).toChar))
        pos += take * bytesPer
        remaining -= take
      }
      sb.toString
    }
  }

  /** XLUnicodeRichExtendedString at the cursor. */
  private def readSstString(cur: SstCursor): String = {
    val cch = cur.u16()
    val grbit = cur.u8()
    val runs = if ((grbit & 8) != 0) cur.u16() else 0
    val ext = if ((grbit & 4) != 0) cur.i32() else 0
    val s = cur.readCharsContinued(cch, grbit)
    cur.skip(runs * 4)
    cur.skip(ext)
    s
  }

  private def parseSst(first: Record, rest: Iterator[Record]): IndexedSeq[String] = {
    val cur = new SstCursor(first, rest)
    cur.i32() // cstTotal
    val unique = cur.i32()
    (0 until unique).map(_ => readSstString(cur))
  }

  /** Short XLUnicodeString used by BOUNDSHEET (8-bit length). */
  private def shortUnicode(data: Array[Byte], off: Int): String = {
    val cch = data(off) & 0xFF
    val grbit = data(off + 1) & 0xFF
    if ((grbit & 1) == 1)
      new String(data, off + 2, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
    else (0 until cch).map(i => (data(off + 2 + i) & 0xFF).toChar).mkString
  }

  private def rkValue(rk: Int): Double = {
    val mul100 = (rk & 1) == 1
    val v =
      if ((rk & 2) == 2) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if (mul100) v / 100 else v
  }

  /** Doubles in their natural lexical form, mirroring xlsx's XML text:
    * integral values render without a trailing ".0". */
  private def numStr(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  // ── public surface ────────────────────────────────────────────────────

  final case class XlsWorkbook(sheets: Seq[Xlsx.SheetMeta], activeTab: Int,
                               sheetOffsets: Map[String, Int])

  private def workbookStream(path: String): Array[Byte] = {
    val cfb = new Cfb(Files.readAllBytes(Paths.get(path)))
    cfb.stream("Workbook").orElse(cfb.stream("Book")).getOrElse(
      throw new IllegalArgumentException(s"$path: no Workbook stream (not a BIFF8 .xls?)"))
  }

  def workbook(path: String): XlsWorkbook = parseWorkbook(workbookStream(path))

  private def parseWorkbook(stream: Array[Byte]): XlsWorkbook = {
    var sheets = Vector.empty[(Xlsx.SheetMeta, Int)]
    var activeTab = 0
    val it = records(stream)
    var done = false
    while (it.hasNext && !done) {
      val r = it.next()
      r.id match {
        case Rec.BOUNDSHEET =>
          val bb = ByteBuffer.wrap(r.data).order(ByteOrder.LITTLE_ENDIAN)
          val pos = bb.getInt(0)
          val hidden = r.data(4) & 0x03
          val name = shortUnicode(r.data, 6)
          sheets :+= (Xlsx.SheetMeta(name, visible = hidden == 0, relId = "") -> pos)
        case Rec.WINDOW1 if r.data.length >= 12 =>
          activeTab = ByteBuffer.wrap(r.data).order(ByteOrder.LITTLE_ENDIAN).getShort(10) & 0xFFFF
        case Rec.EOF => done = true // end of workbook-globals substream
        case _ =>
      }
    }
    XlsWorkbook(sheets.map(_._1), activeTab, sheets.map { case (m, p) => m.name -> p }.toMap)
  }

  /** Raw grid of one sheet as rows of strings (null = empty cell) — same
    * shape and conventions as [[Xlsx.readSheetGrid]]. */
  def readSheetGrid(path: String, sheetName: Option[String] = None): Seq[Seq[String]] = {
    val stream = workbookStream(path)
    val wb = parseWorkbook(stream)
    val meta = sheetName match {
      case Some(n) => wb.sheets.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"sheet '$n' not found; have: ${wb.sheets.map(_.name).mkString(", ")}"))
      case None =>
        wb.sheets.lift(wb.activeTab).filter(_.visible)
          .orElse(wb.sheets.find(_.visible))
          .getOrElse(throw new IllegalArgumentException("workbook has no visible sheet"))
    }

    // SST lives in the globals substream.
    val globals = records(stream)
    var sst: IndexedSeq[String] = IndexedSeq.empty
    var scanning = true
    while (globals.hasNext && scanning) {
      val r = globals.next()
      if (r.id == Rec.SST) { sst = parseSst(r, globals); scanning = false }
      else if (r.id == Rec.EOF) scanning = false
    }

    val cells = scala.collection.mutable.Map.empty[(Int, Int), String]
    val it = records(stream, wb.sheetOffsets(meta.name))
    require(it.hasNext && { val b = it.next(); b.id == Rec.BOF }, "sheet BOF expected")
    var inSheet = true
    var lastFormulaCell: Option[(Int, Int)] = None
    while (it.hasNext && inSheet) {
      val r = it.next()
      val bb = ByteBuffer.wrap(r.data).order(ByteOrder.LITTLE_ENDIAN)
      r.id match {
        case Rec.LABELSST =>
          cells((bb.getShort(0) & 0xFFFF, bb.getShort(2) & 0xFFFF)) =
            sst(bb.getInt(6))
        case Rec.LABEL =>
          val cch = bb.getShort(6) & 0xFFFF
          val grbit = r.data(8) & 0xFF
          val s =
            if ((grbit & 1) == 1)
              new String(r.data, 9, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
            else (0 until cch).map(i => (r.data(9 + i) & 0xFF).toChar).mkString
          cells((bb.getShort(0) & 0xFFFF, bb.getShort(2) & 0xFFFF)) = s
        case Rec.NUMBER =>
          cells((bb.getShort(0) & 0xFFFF, bb.getShort(2) & 0xFFFF)) =
            numStr(bb.getDouble(6))
        case Rec.RK =>
          cells((bb.getShort(0) & 0xFFFF, bb.getShort(2) & 0xFFFF)) =
            numStr(rkValue(bb.getInt(6)))
        case Rec.MULRK =>
          val row = bb.getShort(0) & 0xFFFF
          val colFirst = bb.getShort(2) & 0xFFFF
          val n = (r.data.length - 6) / 6
          (0 until n).foreach { i =>
            cells((row, colFirst + i)) = numStr(rkValue(bb.getInt(4 + i * 6 + 2)))
          }
        case Rec.BOOLERR =>
          val isErr = (r.data(7) & 0xFF) == 1
          if (!isErr)
            cells((bb.getShort(0) & 0xFFFF, bb.getShort(2) & 0xFFFF)) =
              if ((r.data(6) & 0xFF) == 1) "TRUE" else "FALSE"
        case Rec.FORMULA =>
          val row = bb.getShort(0) & 0xFFFF
          val c = bb.getShort(2) & 0xFFFF
          val resultBytes = java.util.Arrays.copyOfRange(r.data, 6, 14)
          lastFormulaCell = None
          if ((resultBytes(6) & 0xFF) == 0xFF && (resultBytes(7) & 0xFF) == 0xFF) {
            resultBytes(0) & 0xFF match {
              case 0 => lastFormulaCell = Some((row, c)) // string: next STRING record
              case 1 => cells((row, c)) = if ((resultBytes(2) & 0xFF) == 1) "TRUE" else "FALSE"
              case _ => // error / blank cache: leave empty
            }
          } else
            cells((row, c)) = numStr(
              ByteBuffer.wrap(resultBytes).order(ByteOrder.LITTLE_ENDIAN).getDouble(0))
        case Rec.STRING =>
          lastFormulaCell.foreach { rc =>
            val cch = bb.getShort(0) & 0xFFFF
            val grbit = r.data(2) & 0xFF
            cells(rc) =
              if ((grbit & 1) == 1)
                new String(r.data, 3, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
              else (0 until cch).map(i => (r.data(3 + i) & 0xFF).toChar).mkString
            lastFormulaCell = None
          }
        case Rec.EOF => inSheet = false
        case _ =>
      }
    }
    if (cells.isEmpty) Seq.empty
    else {
      val maxRow = cells.keys.map(_._1).max
      (0 to maxRow).map { r =>
        val rowCells = cells.collect { case ((`r`, c), v) => c -> v }
        if (rowCells.isEmpty) Seq.empty[String]
        else (0 to rowCells.keys.max).map(c => rowCells.getOrElse(c, null))
      }
    }
  }
}
