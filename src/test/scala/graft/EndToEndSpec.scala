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
