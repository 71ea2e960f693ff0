package graft

import java.nio.file.Files
import java.time.LocalDate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.pipelines.AllocationPipeline
import graft.sinks.{MacroRenderer, XlsxWriter}
import graft.sinks.XlsxWriter.Sheet
import graft.sources.Xlsx
import graft.streaming.PdfWatcher
import graft.streaming.PdfWatcher.FileObs

/** End-to-end flows a reference user runs daily: allocation workbook ->
  * cleaned pivot -> mega-script workbook + ADPO X macro; and the S8 watcher
  * in TRUE streaming mode (flatMapGroupsWithState over a MemoryStream). */
class EndToEndSpec extends SparkSpec {
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  test("EP1 end-to-end: xlsx in -> pipeline -> mega-script xlsx + ADPO X out") {
    val dir = Files.createTempDirectory("e2e").toString
    // 1. Vendor drops the allocation workbook in the folder.
    XlsxWriter.write(s"$dir/weekly allocation 247.xlsx", Seq(Sheet("Sheet1", Seq(
      Seq("Allocation Report", "", "", "", "", ""),
      Seq("Item#", "Item Description", "114.0", "123", "142.0", "Total"),
      Seq("1234567", "FROZEN SHRIMP 16/20", "3", "", "2.0", "5"),
      Seq("2345678", "SALMON FILLET", "0", "4", "", "4"),
      Seq("TOTALS", "", "3", "4", "2", "9")))))
    // 2. S1 file pick + grid read into the engine.
    val path = Xlsx.fileByKeyword(dir, "allocation")
    val grid = Xlsx.readGrid(spark, path.toString)
    // 3. The full pipeline with a frozen clock.
    val out = AllocationPipeline.run(grid, today = LocalDate.of(2026, 8, 10))
    // 4a. K1 mega-script workbook.
    val mega = s"$dir/mega.xlsx"
    XlsxWriter.writeMegaScript(out, mega)
    val written = Xlsx.readSheetGrid(mega, Some("Scripting"))
    assert(written.head.take(4) == Seq("Branch", "Item", "Description", "Distro Size"))
    assert(written.size == 4) // header + 3 rows
    assert(written(1)(0) == "114" && written(1)(3) == "3")
    // 4b. K3 ADPO X macro from the same canonical table.
    val macroTxt = MacroRenderer.adpoX(out, buyer = "P2E", supplier = "81214",
      todayIso = "2026-08-10")
    val lines = macroTxt.split("\n")
    assert(lines.contains("Type  114-1234567"))
    assert(lines.contains("Type  123-2345678"))
    assert(lines.contains("Type  142-1234567"))
    // EDD from the frozen clock: Mon + 2 = Wed 2026-08-12 -> 08/12/26.
    assert(lines.count(_ == "Type 08/12/26") == 3)
  }

  test("T1-T6 orchestrator tick: claim -> watch -> merge -> email -> write-back") {
    import graft.streaming.{EmailBody, InMemoryStatusWriter, Orchestrator}
    import graft.sinks.PdfMerge
    val watch = Files.createTempDirectory("watch").toString
    val outBase = Files.createTempDirectory("out").toString
    // PO pdf already landed (stable size) for vendor 10001's store 142.
    Files.write(java.nio.file.Paths.get(s"$watch/acme-142-57466.pdf"),
      "PDFBYTES".getBytes)
    val sheet = Seq(
      Seq("Note", "Vendor #", "Vendor Name", "142", "Status"),
      Seq("seafood", "10001", "Acme Fish", "57466", "Ready"),
      Seq("", "10002", "Gulf Co", "", "Sent"))
    val writer = new InMemoryStatusWriter
    val results = Orchestrator.runTick(sheet, writer, Set.empty) { row =>
      val items = Orchestrator.storePoItems(row)            // ["142-57466"]
      val pos = items.map(_.split("-")(1))
      val vendorDir = s"$outBase/pdf_vendor_${row.vendorNum}"
      // two poll sweeps 4s apart -> settle (3s window), then move + merge
      val obs = PdfWatcher.sweep(Seq(watch), pos, nowMs = 0) ++
        PdfWatcher.sweep(Seq(watch), pos, nowMs = 4000)
      import spark.implicits._
      val settled = PdfWatcher.settleBatch(obs.toDS(), 3000, 300000).collect()
      settled.foreach(st => PdfWatcher.moveSettled(st, vendorDir))
      val (merged, _) = PdfMerge.combine(vendorDir, vendorDir, "08-12-26")
      val body = EmailBody.body(items)
      settled.nonEmpty && Files.exists(merged) && body.contains("<li>142-57466</li>")
    }
    assert(results.map { case (r, ok) => (r.vendorNum, ok) } == Seq(("10001", true)))
    // E2 status machine: claimed to SENDING, then completed to Sent.
    assert(writer.cells("E2") == Orchestrator.Sent)
    // second tick: row no longer Ready (status unchanged on the fake sheet
    // is Ready, but the vendor is active) -> nothing claimed
    val again = Orchestrator.runTick(sheet, writer, Set("10001"))(_ => true)
    assert(again.isEmpty)
  }

  test("S7 weekday tab pick + K2 lineage workbook round-trip") {
    import graft.pipelines.FlipsPipeline
    val dir = Files.createTempDirectory("k2").toString
    XlsxWriter.write(s"$dir/tabs.xlsx", Seq(
      Sheet("monday orders", Seq(Seq("m"))), Sheet("wed orders", Seq(Seq("w")))))
    val wb = Xlsx.workbook(s"$dir/tabs.xlsx")
    assert(Xlsx.sheetForWeekday(wb, java.time.DayOfWeek.WEDNESDAY).name == "wed orders")
    assert(Xlsx.sheetForWeekday(wb, java.time.DayOfWeek.FRIDAY).name == "monday orders")
    // K2: write the six-sheet baby-flip workbook and read back the lineage.
    import spark.implicits._
    val out = Seq((114L, "114-5", "8/12/2026", "D", 3.0, "L1", 6L, "2", 8))
      .toDF("Store", "PO #", "Invoice Date", "DESC", "Value", "LOT#",
        "weight", "pack size", "carrier code")
    val po = Seq(("114", "114-5")).toDF("Store", "PO #")
    val carrier = Seq(("114", 8)).toDF("Store", "carrier code")
    val raw = Seq(Seq("Item", "x"), Seq("1", "2"))
    XlsxWriter.writeBabyFlipWorkbook(s"$dir/baby.xlsx", out, raw,
      cleaned = po, pivot = po, po = po, carrier = carrier)
    val names = Xlsx.workbook(s"$dir/baby.xlsx").sheets.map(_.name)
    assert(names == Seq("Araho Sheet", "RD master", "RD clean",
      "Last Level Master", "PO#", "carriers"))
    val araho = Xlsx.readSheetGrid(s"$dir/baby.xlsx", Some("Araho Sheet"))
    assert(araho.head.head == "Column") // Store renamed for the Araho sheet
    // headerless dimension sheets
    assert(Xlsx.readSheetGrid(s"$dir/baby.xlsx", Some("PO#")).head == Seq("114", "114-5"))
    // K2 presentation fidelity: Invoice Date cells are live =TODAY()
    // formulas with the date style, the header row is frozen, and columns
    // carry autosized custom widths.
    val zip = new java.util.zip.ZipFile(s"$dir/baby.xlsx")
    val arahoXml = try {
      val e = zip.getEntry("xl/worksheets/sheet1.xml")
      new String(zip.getInputStream(e).readAllBytes, "UTF-8")
    } finally zip.close()
    assert(arahoXml.contains("<f>TODAY()</f>"))
    assert(arahoXml.contains("""s="1"><f>TODAY()""")) // date style applied
    assert(arahoXml.contains("""<pane ySplit="1" topLeftCell="A2""""))
    assert(arahoXml.contains("state=\"frozen\""))
    assert(arahoXml.contains("customWidth=\"1\""))
    // width = min(maxContentLen + 2, 60): col B ("PO #" header, "114-5"
    // value) -> 7
    assert(arahoXml.contains("""<col min="2" max="2" width="7" customWidth="1"/>"""))
  }

  test("S8 watcher in streaming mode: settle emitted from micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[FileObs]
    mem.addData(
      FileObs("57466", "/w/a-57466.pdf", 100, 0),
      FileObs("57466", "/w/a-57466.pdf", 100, 4000),
      FileObs("99", "/w/b-99.pdf", 10, 0),
      FileObs("99", "/w/b-99.pdf", 20, 2000),
      FileObs("99", "/w/b-99.pdf", 20, 20000))
    val q = PdfWatcher.settleStream(mem.toDS(), settleMs = 3000, maxWaitMs = 300000)
      .writeStream.format("memory").queryName("watch")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("watch").orderBy("po").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3))).toSeq
    assert(out == Seq(
      ("57466", "SETTLED", 4000L),
      ("99", "SETTLED", 20000L)))
  }
}
