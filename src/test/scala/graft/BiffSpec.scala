package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Biff, Xlsx}

/** Round-trips hand-assembled BIFF8 compound files through the `.xls`
  * reader: both CFB storage paths (regular FAT for streams >= 4096 bytes,
  * ministream below), SST CONTINUE spanning with a mid-string grbit
  * switch, and the cell record family. The writer below is test-only and
  * intentionally minimal — it emits exactly the structures MS-CFB/MS-XLS
  * define for this subset. */
class BiffSpec extends AnyFunSuite {

  // ── test-only BIFF8 writers ───────────────────────────────────────────

  private def le16(v: Int): Array[Byte] =
    ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array
  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array
  private def le64(v: Double): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array

  private def rec(id: Int, data: Array[Byte]): Array[Byte] =
    le16(id) ++ le16(data.length) ++ data

  private def bof(dt: Int): Array[Byte] =
    rec(0x809, le16(0x0600) ++ le16(dt) ++ le16(0x0DBB) ++ le16(0x07CC) ++
      le32(0) ++ le32(0))

  private def window1(activeTab: Int): Array[Byte] =
    rec(0x3D, le16(0) ++ le16(0) ++ le16(0x4000) ++ le16(0x2000) ++ le16(0x38) ++
      le16(activeTab) ++ le16(0) ++ le16(1) ++ le16(600))

  private def boundsheet(pos: Int, hidden: Int, name: String): Array[Byte] = {
    val nameBytes = name.getBytes("ISO-8859-1")
    rec(0x85, le32(pos) ++ Array(hidden.toByte, 0.toByte) ++
      Array(nameBytes.length.toByte, 0.toByte) ++ nameBytes)
  }

  private def cellHead(row: Int, col: Int): Array[Byte] =
    le16(row) ++ le16(col) ++ le16(0) // ixfe 0

  private def number(row: Int, col: Int, v: Double): Array[Byte] =
    rec(0x203, cellHead(row, col) ++ le64(v))

  private def rkInt(v: Int, mul100: Boolean = false): Int =
    (v << 2) | 2 | (if (mul100) 1 else 0)

  private def rk(row: Int, col: Int, rkv: Int): Array[Byte] =
    rec(0x27E, cellHead(row, col) ++ le32(rkv))

  private def mulrk(row: Int, colFirst: Int, rkvs: Seq[Int]): Array[Byte] =
    rec(0xBD, le16(row) ++ le16(colFirst) ++
      rkvs.flatMap(v => le16(0) ++ le32(v)).toArray ++
      le16(colFirst + rkvs.size - 1))

  private def labelSst(row: Int, col: Int, isst: Int): Array[Byte] =
    rec(0xFD, cellHead(row, col) ++ le32(isst))

  private def boolErr(row: Int, col: Int, v: Boolean): Array[Byte] =
    rec(0x205, cellHead(row, col) ++ Array[Byte](if (v) 1 else 0, 0))

  private def formulaNum(row: Int, col: Int, v: Double): Array[Byte] =
    rec(0x06, cellHead(row, col) ++ le64(v) ++ le16(0) ++ le32(0) ++ le16(0))

  private def formulaStr(row: Int, col: Int, cached: String): Array[Byte] = {
    val res = Array[Byte](0, 0, 0, 0, 0, 0, 0xFF.toByte, 0xFF.toByte)
    rec(0x06, cellHead(row, col) ++ res ++ le16(0) ++ le32(0) ++ le16(0)) ++
      rec(0x207, le16(cached.length) ++ Array[Byte](0) ++
        cached.getBytes("ISO-8859-1"))
  }

  private def eof: Array[Byte] = rec(0x0A, Array.empty)

  /** SST holding `strs`, no CONTINUE (fits one record). */
  private def sst(strs: Seq[String]): Array[Byte] = {
    val body = le32(strs.size) ++ le32(strs.size) ++
      strs.toArray.flatMap(s =>
        le16(s.length) ++ Array[Byte](0) ++ s.getBytes("ISO-8859-1"))
    rec(0xFC, body)
  }

  /** SST split across a CONTINUE mid-string: "alpha" complete, "SPLITXX"'s
    * char run broken after 3 chars (CONTINUE resumes with a fresh grbit —
    * switched to UTF-16 wide to exercise the encoding flip), "omega" whole
    * in the continuation. */
  private def sstWithContinue(): (Array[Byte], Seq[String]) = {
    val s2 = "SPLITXX"
    val first = le32(3) ++ le32(3) ++
      (le16(5) ++ Array[Byte](0) ++ "alpha".getBytes("ISO-8859-1")) ++
      (le16(s2.length) ++ Array[Byte](0) ++ s2.take(3).getBytes("ISO-8859-1"))
    val cont = Array[Byte](1) ++ s2.drop(3).getBytes("UTF-16LE") ++
      (le16(5) ++ Array[Byte](0) ++ "omega".getBytes("ISO-8859-1"))
    (rec(0xFC, first) ++ rec(0x3C, cont), Seq("alpha", s2, "omega"))
  }

  /** Assemble a 2-sheet workbook stream; BOUNDSHEET offsets fixed up. */
  private def workbookStream(sstBytes: Array[Byte],
                             sheet1: Array[Byte], sheet2: Array[Byte],
                             activeTab: Int = 0): Array[Byte] = {
    def globals(p1: Int, p2: Int) =
      bof(0x0005) ++ window1(activeTab) ++
        boundsheet(p1, 0, "Data") ++ boundsheet(p2, 1, "Secret") ++
        sstBytes ++ eof
    val gLen = globals(0, 0).length
    globals(gLen, gLen + sheet1.length) ++ sheet1 ++ sheet2
  }

  // ── test-only CFB writer ──────────────────────────────────────────────

  private val FREESECT = 0xFFFFFFFF; private val ENDOFCHAIN = 0xFFFFFFFE
  private val FATSECT = 0xFFFFFFFD

  private def dirEntry(name: String, objType: Int, child: Int,
                       start: Int, size: Long): Array[Byte] = {
    val e = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
    val utf = name.getBytes("UTF-16LE")
    e.put(utf)
    e.putShort(64, ((name.length + 1) * 2).toShort)
    e.put(66, objType.toByte)
    e.put(67, 1.toByte) // black
    e.putInt(68, -1); e.putInt(72, -1); e.putInt(76, child)
    e.putInt(116, start)
    e.putLong(120, size)
    e.array
  }

  private def header(numFat: Int, firstDir: Int, firstMiniFat: Int,
                     numMiniFat: Int, fatSectors: Seq[Int]): Array[Byte] = {
    val h = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    h.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    h.putShort(0x18, 0x3E.toShort); h.putShort(0x1A, 3.toShort)
    h.putShort(0x1C, 0xFFFE.toShort)
    h.putShort(0x1E, 9.toShort); h.putShort(0x20, 6.toShort)
    h.putInt(0x2C, numFat); h.putInt(0x30, firstDir)
    h.putInt(0x38, 4096)
    h.putInt(0x3C, firstMiniFat); h.putInt(0x40, numMiniFat)
    h.putInt(0x44, ENDOFCHAIN); h.putInt(0x48, 0)
    (0 until 109).foreach(i =>
      h.putInt(0x4C + i * 4, fatSectors.lift(i).getOrElse(FREESECT)))
    h.array
  }

  private def pad(b: Array[Byte], unit: Int): Array[Byte] =
    java.util.Arrays.copyOf(b, ((b.length + unit - 1) / unit) * unit)

  private def fatSector(entries: Map[Int, Int]): Array[Byte] = {
    val f = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 128).foreach(i => f.putInt(i * 4, entries.getOrElse(i, FREESECT)))
    f.array
  }

  /** Wrap a Workbook stream into a CFB file; storage path chosen by size
    * exactly as a real writer would (ministream under 4096 bytes). */
  private def cfb(stream: Array[Byte]): Array[Byte] = {
    if (stream.length >= 4096) {
      val streamSectors = pad(stream, 512)
      val n = streamSectors.length / 512
      val chain = (0 until n).map(i =>
        (2 + i) -> (if (i == n - 1) ENDOFCHAIN else 3 + i)).toMap
      val fat = fatSector(chain ++ Map(0 -> FATSECT, 1 -> ENDOFCHAIN))
      val dir = pad(
        dirEntry("Root Entry", 5, child = 1, start = ENDOFCHAIN, size = 0) ++
          dirEntry("Workbook", 2, child = -1, start = 2, size = stream.length.toLong),
        512)
      header(1, 1, ENDOFCHAIN, 0, Seq(0)) ++ fat ++ dir ++ streamSectors
    } else {
      val mini = pad(stream, 64)
      val nMini = mini.length / 64
      val containers = pad(mini, 512)
      val m = containers.length / 512
      val containerChain = (0 until m).map(i =>
        (3 + i) -> (if (i == m - 1) ENDOFCHAIN else 4 + i)).toMap
      val fat = fatSector(containerChain ++
        Map(0 -> FATSECT, 1 -> ENDOFCHAIN, 2 -> ENDOFCHAIN))
      val miniFat = {
        val f = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
        (0 until 128).foreach { i =>
          f.putInt(i * 4,
            if (i < nMini - 1) i + 1
            else if (i == nMini - 1) ENDOFCHAIN
            else FREESECT)
        }
        f.array
      }
      val dir = pad(
        dirEntry("Root Entry", 5, child = 1, start = 3, size = mini.length.toLong) ++
          dirEntry("Workbook", 2, child = -1, start = 0, size = stream.length.toLong),
        512)
      header(1, 1, 2, 1, Seq(0)) ++ fat ++ dir ++ miniFat ++ containers
    }
  }

  private def writeXls(stream: Array[Byte]): Path = {
    val p = Files.createTempFile("biffspec", ".xls")
    Files.write(p, cfb(stream))
    p.deleteOnExit0()
    p
  }

  private implicit class PathOps(p: Path) {
    def deleteOnExit0(): Unit = p.toFile.deleteOnExit()
  }

  // ── the tests ─────────────────────────────────────────────────────────

  private def sheet1Cells: Array[Byte] =
    bof(0x0010) ++
      labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++
      number(1, 0, 3.5) ++ rk(1, 1, rkInt(42)) ++
      mulrk(2, 0, Seq(rkInt(7), rkInt(1234, mul100 = true))) ++
      boolErr(3, 0, v = true) ++
      formulaNum(3, 1, 99.0) ++ formulaStr(4, 0, "cached") ++
      eof

  private def sheet2Cells: Array[Byte] =
    bof(0x0010) ++ labelSst(0, 0, 2) ++ eof

  test("ministream .xls: grid, SST CONTINUE mid-string, hidden sheet") {
    val (sstBytes, strs) = sstWithContinue()
    val p = writeXls(workbookStream(sstBytes, sheet1Cells, sheet2Cells))
    assert(Files.size(p) < 8192) // genuinely exercises the ministream path

    val wb = Xlsx.workbook(p.toString)
    assert(wb.sheets.map(_.name) == Seq("Data", "Secret"))
    assert(wb.sheets.map(_.visible) == Seq(true, false))
    assert(wb.activeVisibleSheet.name == "Data")

    val grid = Xlsx.readSheetGrid(p.toString)
    assert(grid(0) == Seq(strs(0), strs(1)))        // alpha, SPLITXX via CONTINUE
    assert(grid(1) == Seq("3.5", "42"))             // NUMBER, RK
    assert(grid(2) == Seq("7", "12.34"))            // MULRK incl. mul100
    assert(grid(3) == Seq("TRUE", "99"))            // BOOLERR, FORMULA num cache
    assert(grid(4) == Seq("cached"))                // FORMULA + STRING cache

    val hidden = Xlsx.readSheetGrid(p.toString, Some("Secret"))
    assert(hidden(0) == Seq(strs(2)))
  }

  test("FAT-stream .xls (>= 4096 bytes) reads identically") {
    val bulk: Array[Byte] =
      (0 until 400).flatMap(i => number(10 + i, 0, i.toDouble)).toArray
    val p = writeXls(workbookStream(sst(Seq("a", "b", "c")),
      bof(0x0010) ++ labelSst(0, 0, 0) ++ bulk ++ eof, sheet2Cells))
    assert(Files.size(p) > 4096)
    val grid = Xlsx.readSheetGrid(p.toString)
    assert(grid(0) == Seq("a"))
    assert(grid(10) == Seq("0"))
    assert(grid(409) == Seq("399"))
  }

  test("non-Excel bytes get a clear error, not a zip crash") {
    val p = Files.createTempFile("biffspec", ".xls")
    Files.write(p, "this is not a spreadsheet".getBytes)
    p.toFile.deleteOnExit()
    val e = intercept[IllegalArgumentException](Xlsx.readSheetGrid(p.toString))
    assert(e.getMessage.contains("neither an OOXML"))
  }
}
