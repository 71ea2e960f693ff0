package graft

import org.apache.spark.sql.functions._
import graft.sinks.MacroRenderer

/** K3–K5 macro renderer specs: group structure, item formatting, ordering,
  * footer variants. */
class MacroRendererSpec extends SparkSpec {
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  private def canonicalDf = {
    import spark.implicits._
    Seq(
      ("114", "1234567", 3L, "08/14/26", "7.0", ""),
      ("114", "45", 2L, "08/14/26", "7.0", ""),
      ("99", "2345678", 5L, "08/14/26", "", "12.50"))
      .toDF("Branch", "Item", "Distro Size", "Expected Delivery Date", "XDCK", "FOB")
  }

  test("K3 ADPO X: branch groups in numeric order, 7-digit items, footer") {
    val text = MacroRenderer.adpoX(canonicalDf, buyer = "P2E",
      supplier = "81214.0", todayIso = "2026-08-12")
    val lines = text.split("\n").toSeq
    // Branch 99 renders before 114 (numeric order).
    val i99 = lines.indexOf("Type 99")
    val i114 = lines.indexOf("Type 114")
    assert(i99 >= 0 && i114 > i99)
    // supplier digits stripped of .0
    assert(lines.contains("Type 81214"))
    // items zero-padded to 7 digits, qty rendered as int
    assert(lines.contains("Type  114-0000045"))
    assert(lines.contains("Type  114-1234567"))
    assert(lines.contains("Type  99-2345678"))
    // per-branch close-out block and clipboard save
    assert(lines.contains("Type  99-0990033"))
    assert(lines.count(_ == "key PA2") == 2)
    assert(lines.contains(
      "FileSpec clipboard,C:\\POs\\VendorNo-81214-2026-08-12.csv,append"))
    // scrubbed: no blank lines, no trailing spaces
    assert(!lines.exists(_.isEmpty))
    assert(!lines.exists(l => l.endsWith(" ") || l.endsWith("\t")))
  }

  test("K4 ADPO I: FOB presence selects footer variant") {
    val text = MacroRenderer.adpoI(canonicalDf, buyerCode = "P20",
      todayIso = "2026-08-12")
    val lines = text.split("\n").toSeq
    // both branches open with the constant second-level warehouse
    assert(lines.contains("Type 114544-1234567"))
    assert(lines.contains("Type 20000"))
    // branch 99 has FOB -> its footer types the fob value
    assert(lines.contains("type 12.5"))
    // branch 114 without FOB -> xdck typed from the no-FOB tail
    assert(lines.contains("Type 7"))
    assert(text.endsWith("\n"))
  }

  test("K5 DLPM: per-row 32-line template, 2-dp cost, store-item order") {
    import spark.implicits._
    val df = Seq(
      ("498", "1234567", "81214", 12.5),
      ("114", "22", "81214", 9.1))
      .toDF("Store#", "Item#", "Vendor#", "Cost")
    val text = MacroRenderer.dlpm(df, initials = "p.y", dateText = "08/12/26")
    val lines = text.split("\n").toSeq
    assert(lines.size == 64)
    // store 114 first (numeric), item zero-padded, cost 2dp
    assert(lines.indexOf("Type 114-0000022") < lines.indexOf("Type 498-1234567"))
    assert(lines.contains("Type 9.10"))
    assert(lines.contains("Type 12.50"))
    assert(lines.count(_ == "Type p.y") == 2)
    assert(MacroRenderer.dlpmFileName("08-12-26") == "08-12-26 247DLPM.txt")
  }
}
