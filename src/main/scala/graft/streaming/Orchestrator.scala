package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Xlsx

/** S6/T1–T6 — the sheet-driven orchestrator (SURVEY.md §2.1 S6, §2.10).
  *
  * The reference polls a Google Sheet every 60 s, parses sectioned vendor
  * rows, claims Ready rows (Ready -> SENDING), watches for PO PDFs, merges
  * and emails them, then writes Sent/ERROR back
  * (ref /root/reference/sheet_bot/main.py:26-399,
  * /root/reference/sheet_bot/sheets.py:48-189).
  *
  * The sheet grid is tiny (driver data); the engine's contribution is the
  * normalized DataFrame shape, the idempotent claim transition, and the
  * status write-back interface — the per-vendor heavy work (PDF watch,
  * merge) runs through [[PdfWatcher]]. */
object Orchestrator {

  // Status machine constants. Ref: /root/reference/sheet_bot/utils.py:70-73.
  val Ready = "Ready"
  val Sending = "SENDING"
  val Sent = "Sent"
  val Error = "ERROR"

  /** F16 — (row, col) 1-based -> A1 ("AB3").
    * Ref: /root/reference/sheet_bot/utils.py:54-65. */
  def a1(row1: Int, col1: Int): String = {
    require(row1 >= 1 && col1 >= 1, "A1 coordinates must be 1-based")
    var n = col1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    s"${sb.toString}$row1"
  }

  private def clean(s: String): String = if (s == null) "" else s.trim

  /** One normalized vendor row: S6's output schema. */
  final case class VendorRow(section: String, sheetRow: Int, vendorNum: String,
                             vendorName: String, status: String, statusA1: String,
                             stores: Map[String, String])

  /** Inferred section header schema (1-based column indexes). */
  private final case class Schema(noteC: Int, vnumC: Int, vnameC: Int,
                                  statusC: Int, storeCols: Seq[Int])

  private def inferSchema(header: Seq[String]): Schema = {
    var note, vnum, vname, status = -1
    val stores = scala.collection.mutable.ArrayBuffer.empty[Int]
    header.zipWithIndex.foreach { case (raw, i) =>
      val name = clean(raw); val low = name.toLowerCase
      if (low == "note" && note < 0) note = i + 1
      else if (Set("vendor #", "vendor#", "vendor no", "vendor number")(low) && vnum < 0) vnum = i + 1
      else if (Set("vendor name", "vendor")(low) && vname < 0) vname = i + 1
      else if (low == "status") status = i + 1
      else if (name.nonEmpty && name.forall(_.isDigit)) stores += (i + 1)
      // "po count" and anything else: ignored
    }
    require(note > 0 && vnum > 0 && vname > 0 && status > 0,
      s"cannot infer section header: Note=$note Vendor#=$vnum VendorName=$vname Status=$status")
    Schema(note, vnum, vname, status, stores.toSeq)
  }

  /** S6 — parse the whole-sheet string grid into normalized vendor rows.
    * Sections start at any row containing a cell "Note" (ci); rows with an
    * empty Vendor # are dropped; `statusA1` is the exact cell for T2/T4
    * write-backs. Ref: /root/reference/sheet_bot/sheets.py:54-178. */
  def parseSections(values: Seq[Seq[String]]): Seq[VendorRow] = {
    val headerRows = values.zipWithIndex.collect {
      case (row, i) if row.exists(c => clean(c).equalsIgnoreCase("Note")) => i + 1
    }
    val endR = values.size
    val ranges = headerRows.zipAll(headerRows.drop(1).map(_ - 1), -1, endR)
      .collect { case (s, e) if s > 0 => (s, e) }
    ranges.zipWithIndex.flatMap { case ((hdrR, stopR), secIdx) =>
      val header = values(hdrR - 1)
      val sch = inferSchema(header)
      def cellAt(row: Seq[String], c1: Int): String =
        if (c1 <= row.size) clean(row(c1 - 1)) else ""
      val sectionLabel = {
        val l = if (hdrR < stopR + 1 && hdrR < values.size)
          cellAt(values(hdrR), sch.noteC) else ""
        if (l.nonEmpty) l else s"section_${secIdx + 1}"
      }
      (hdrR + 1 to stopR).flatMap { r =>
        val row = values(r - 1)
        val vendorNum = cellAt(row, sch.vnumC)
        if (vendorNum.isEmpty) None
        else Some(VendorRow(
          section = sectionLabel,
          sheetRow = r,
          vendorNum = vendorNum,
          vendorName = cellAt(row, sch.vnameC),
          status = cellAt(row, sch.statusC),
          statusA1 = a1(r, sch.statusC),
          stores = sch.storeCols.map(sc =>
            cellAt(header, sc) -> cellAt(row, sc)).toMap))
      }
    }
  }

  /** S6 as a DataFrame (the source's tabular contract). */
  def sectionsDf(spark: SparkSession, values: Seq[Seq[String]]): DataFrame = {
    import spark.implicits._
    parseSections(values)
      .map(v => (v.section, v.sheetRow, v.vendorNum, v.vendorName, v.status,
        v.statusA1, v.stores))
      .toDF("section", "sheet_row", "vendor_num", "vendor_name", "status",
        "status_a1", "stores")
  }

  /** J5 — all numeric store codes in a header ('452/490' -> 452, 490). */
  def storeCodesFromHeader(header: String): Seq[String] =
    "\\d+".r.findAllIn(if (header == null) "" else header).toSeq

  /** Store–PO items for a vendor row: skip blank/'x' cells, strip trailing
    * .0, expand multi-code headers. Ref: /root/reference/sheet_bot/main.py:185-200. */
  def storePoItems(row: VendorRow): Seq[String] =
    row.stores.toSeq.sortBy(_._1).flatMap { case (header, v) =>
      val sval0 = clean(v)
      if (sval0.isEmpty || sval0.equalsIgnoreCase("x")) Seq.empty
      else {
        val sval = if (sval0.endsWith(".0")) sval0.dropRight(2) else sval0
        storeCodesFromHeader(header).map(code => s"$code-$sval")
      }
    }

  /** T2 — idempotent claim: only Ready rows transition to SENDING; the
    * write-back target is the row's own statusA1 cell. Returns the rows
    * claimed this tick (duplicate micro-batches claim nothing new). */
  def claimReady(rows: Seq[VendorRow], writer: StatusWriter,
                 active: collection.Set[String]): Seq[VendorRow] = {
    val claimable = rows.filter(r =>
      r.status == Ready && !active.contains(r.vendorNum))
    writer.batchUpdate(claimable.map(r => r.statusA1 -> Sending))
    claimable
  }

  /** T4 — completion harvest: write terminal status for finished vendors. */
  def completeVendors(results: Seq[(VendorRow, Boolean)], writer: StatusWriter): Unit =
    writer.batchUpdate(results.map { case (row, ok) =>
      row.statusA1 -> (if (ok) Sent else Error)
    })

  /** T1–T4 (+T3) — one orchestrator tick: re-parse the sheet, claim Ready
    * rows not already active, process the claimed vendors CONCURRENTLY on a
    * bounded worker pool (the reference runs a 4-worker pool; per-vendor
    * work is dominated by PDF-watch/send waits, so workers overlap those),
    * then write terminal statuses back. Failures stay isolated per vendor:
    * one vendor's exception marks only that vendor ERROR. Result order is
    * the claim order regardless of completion order. */
  def runTick(values: Seq[Seq[String]], writer: StatusWriter,
              active: collection.Set[String], workers: Int = 4,
              vendorTimeoutMs: Long = 300000L)(
              processVendor: VendorRow => Boolean): Seq[(VendorRow, Boolean)] = {
    val claimed = claimReady(parseSections(values), writer, active)
    val results: Seq[(VendorRow, Boolean)] =
      if (claimed.isEmpty) Seq.empty
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.max(1, math.min(workers, claimed.size)))
        try {
          val futures = claimed.map { row =>
            row -> pool.submit(new java.util.concurrent.Callable[Boolean] {
              override def call(): Boolean =
                try processVendor(row) catch { case _: Exception => false }
            })
          }
          // Each vendor gets the reference's FULL 300 s budget on its own
          // future (ref /root/reference/sheet_bot/main.py:28 waits
          // result(timeout=300) per future, not against a shared tick
          // deadline): with 5 claimed vendors on a 4-pool, the queued 5th
          // must still execute and get its own budget — a shared deadline
          // would cancel it at left=0 without it ever running. Harvest is
          // in claim order, so earlier waits overlap later vendors'
          // execution; only a genuinely hung vendor burns its full budget.
          futures.map { case (row, f) =>
            val ok =
              try f.get(vendorTimeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
              catch {
                case _: java.util.concurrent.TimeoutException =>
                  f.cancel(true); false
                case _: java.util.concurrent.ExecutionException => false
              }
            row -> ok
          }
        } finally pool.shutdownNow()
      }
    completeVendors(results, writer)
    results
  }

  /** T6 — guarded cleanup: only paths inside the output base are deleted. */
  def isWithin(base: java.nio.file.Path, target: java.nio.file.Path): Boolean = {
    val b = base.toAbsolutePath.normalize
    val t = target.toAbsolutePath.normalize
    t.startsWith(b)
  }
}

/** K9 — batched status write-back ({a1 -> value} updates). The reference
  * posts these to the Sheets API; tests use [[InMemoryStatusWriter]]. */
trait StatusWriter {
  def batchUpdate(updates: Seq[(String, String)]): Unit
}

final class InMemoryStatusWriter extends StatusWriter {
  val cells = scala.collection.mutable.LinkedHashMap.empty[String, String]
  override def batchUpdate(updates: Seq[(String, String)]): Unit =
    updates.foreach { case (a1, v) => cells(a1) = v }
}

/** S5 — vendor e-mail workbook -> {vendor: recipients} (driver dimension).
  * Ref: /root/reference/sheet_bot/import_vendor_email.py:37-80. */
object Recipients {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r

  /** Order-preserving dedupe of regex-extracted, lowercased addresses. */
  def parseEmailCell(cell: String): Seq[String] =
    EmailRe.findAllIn(if (cell == null) "" else cell).map(_.toLowerCase).toSeq

  /** Load from an xlsx: col 0 vendor (trailing .0 stripped), cols 2+
    * scanned for emails; per-vendor order-preserving dedupe. */
  def load(xlsxPath: String): Map[String, Seq[String]] = {
    val grid = Xlsx.readSheetGrid(xlsxPath)
    grid.drop(1).flatMap { row =>
      val vendor0 = if (row.headOption.orNull == null) "" else row.head.trim
      val vendor = if (vendor0.endsWith(".0")) vendor0.dropRight(2) else vendor0
      if (vendor.isEmpty) None
      else {
        val emails = row.drop(2).flatMap(parseEmailCell).distinct
        Some(vendor -> emails)
      }
    }.toMap
  }
}

/** K8 — HTML body generation (items list -> body, body + signature).
  * Ref: /root/reference/sheet_bot/email_generator.py:6-89. */
object EmailBody {

  def body(items: Seq[String]): String = {
    val lis = items.map(i => s"    <li>$i</li>").mkString("\n")
    s"""<html>
       |  <body>
       |    <p>Hello,</p>
       |    <p>Attached are the following orders:</p>
       |    <ul>
       |$lis
       |    </ul>
       |    <p>Thank you.</p>
       |  </body>
       |</html>""".stripMargin
  }

  /** Compose body + signature by extracting each <body> inner HTML. */
  def combine(bodyHtml: String, signatureHtml: String, paddingPx: Int = 24): String = {
    def inner(html: String): String = {
      val m = "(?is)<body[^>]*>(.*)</body>".r.findFirstMatchIn(html)
      m.map(_.group(1)).getOrElse(html)
    }
    s"""<html>
       |  <body style="padding:${paddingPx}px">
       |${inner(bodyHtml)}
       |${inner(signatureHtml)}
       |  </body>
       |</html>""".stripMargin
  }
}
