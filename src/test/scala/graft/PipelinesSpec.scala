package graft

import java.time.LocalDate
import org.apache.spark.sql.functions._
import graft.core.SchemaOps
import graft.pipelines._

/** End-to-end vendor pipeline golden tests over the FIXTURES.md grids. */
class PipelinesSpec extends SparkSpec {

  test("EP1 allocation: FIXTURES §1 golden — clean, melt, agg, sort") {
    val grid = SchemaOps.gridFromRows(spark, Seq(
      Seq("Allocation Report", "", "", "", "", ""),
      Seq("Item#", "Item Description", "114.0", "123", "142.0", "Total"),
      Seq("1234567", "FROZEN SHRIMP 16/20", "3", "", "2.0", "5"),
      Seq("2345678", "SALMON FILLET", "0", "4", "", "4"),
      Seq("TOTALS", "", "3", "4", "2", "9")))
    val out = AllocationPipeline.pivot(AllocationPipeline.clean(grid))
    assert(out.columns.toSeq == Seq("Branch", "Item", "Distro Size"))
    assert(rows(out) == Seq(
      Seq("114", "1234567", 3L),
      Seq("123", "2345678", 4L),
      Seq("142", "1234567", 2L)))
  }

  test("EP1 allocation run: canonical 13-col schema, EDD weekend roll") {
    val grid = SchemaOps.gridFromRows(spark, Seq(
      Seq("t", "", ""),
      Seq("Item#", "114", "Total"),
      Seq("42", "7", "7"),
      Seq("TOTALS", "7", "7")))
    // Thursday + 2 = Saturday -> Monday 2026-08-10 -> "8/10/2026".
    val out = AllocationPipeline.run(grid, today = LocalDate.of(2026, 8, 6))
    assert(out.columns.toSeq == Canonical.Cols)
    val r = out.head()
    assert(r.getLong(0) == 114L)                    // Branch
    assert(r.getLong(1) == 42L)                     // Item
    assert(r.getString(2) == "")                    // Description blank
    assert(r.getLong(3) == 7L)                      // Distro Size
    assert(r.getLong(4) == 81214L)                  // Supplier On Record
    assert(r.getDate(5).toString == "2026-08-10")   // EDD rolled to Monday
    assert(r.getString(6) == "P2E")                 // WW Buyer
    assert(r.isNullAt(10))                          // XDCK numeric null
  }

  test("EP3 ACME: dock dispatch by filename, positional drops, branch prefix") {
    val grid = SchemaOps.gridFromRows(spark, Seq(
      Seq("id", "junk", "dock", "Branch", "Item", "Description", "Distro Size", "extra"),
      Seq("1", "x", "189", "86", "1234567", "SHRIMP", "3", "zzz"),
      Seq("2", "x", "407", "114", "2345678", "SALMON", "5", "zzz"),
      Seq("3", "x", "436", "99", "3456789", "COD", "0", "zzz")))
    val out = DockPipeline.runAcme(grid, "acme il week 32.xlsx", edd = "9/15/2026")
    // il -> docks {189,436}; dock 407 dropped; Distro 0 dropped;
    // two-digit branch 86 -> 186.
    assert(out.columns.toSeq == Canonical.Cols)
    assert(rows(out.select(col("Branch"), col("Item"), col("Distro Size"),
        col("Description"), col("WW Buyer"), col("Supplier On Record"))) ==
      Seq(Seq(186L, 1234567L, 3L, "SHRIMP", "P20", 44602L)))
    intercept[IllegalArgumentException](
      DockPipeline.runAcme(grid, "acme week.xlsx", "9/15/2026"))
  }

  test("EP4 Phillips: dock from filename, 14-col schema, Warehouse kept") {
    val grid = SchemaOps.gridFromRows(spark, Seq(
      Seq("junk", "dock", "Branch", "Item", "Description", "Distro Size", "x"),
      Seq("a", "436", "86", "111", "A", "2", "z"),
      Seq("b", "499", "87", "222", "B", "4", "z")))
    val out = DockPipeline.runPhillips(grid, "phillips 436 export.xlsx", "9/15/2026")
    assert(out.columns.toSeq == Canonical.PhillipsCols)
    assert(rows(out.select(col("Branch"), col("Item"), col("Distro Size"),
        col("Warehouse"), col("XdockCode"))) ==
      Seq(Seq(186L, 111L, 2L, 436L, "")))
  }

  test("EP2 price sheet: FIXTURES §2 golden — remap, drops, cost parse") {
    val grid = SchemaOps.gridFromRows(spark, Seq(
      Seq("Price Sheet", "", "", "", "", ""),
      Seq("Item#", "Item Name", "FOB", "490.0", "457", "142"),
      Seq("1234567", "SHRIMP", "9.10", "12.50", "$13.00", "0"),
      Seq("0", "ZERO", "1.00", "2.00", "3.00", "4.00")))
    val out = PriceSheetPipeline.run(grid)
    assert(out.columns.toSeq == Seq("Store#", "Item#", "Vendor#", "Cost"))
    // Item# 0 dropped; store 490->498; 457 dropped; zero cost dropped.
    assert(rows(out) == Seq(Seq("498", "1234567", 81214, 12.5)))
  }

  test("EP5 SouthernCross: coerce, LOT# trim, Item==0 drop, alpha reorder") {
    val grid = SchemaOps.gridFromRows(spark, Seq(
      Seq("Item", "Description", "142.0", "114", "LOT #", "junk"),
      Seq("1234567", "SHRIMP", "3.0", "", "L1", "j"),
      Seq("0", "ZERO ROW", "9", "9", "L2", "j"),
      Seq("2345678.0", "SALMON", "n/a", "4", "L3", "j")))
    val cleaned = SouthernCrossPipeline.clean(grid)
    // Alphabetical with Item pinned: Item, 114, 142, Description.
    assert(cleaned.columns.toSeq == Seq(SchemaOps.RowIdx, "Item", "114", "142", "Description"))
    val out = SouthernCrossPipeline.run(grid, edd = "9/15/2026")
    assert(rows(out.select(col("Branch"), col("Item"), col("Distro Size"))) ==
      Seq(Seq(114L, 2345678L, 4L), Seq(142L, 1234567L, 3L)))
  }

  test("EP1 Leavins variant: same pipeline, Leavins vendor constants") {
    val grid = SchemaOps.gridFromRows(spark, Seq(
      Seq("t", "", ""),
      Seq("Item#", "114", "Total"),
      Seq("42", "7", "7"),
      Seq("TOTALS", "7", "7")))
    val out = AllocationPipeline.run(grid, cfg = VendorConfig.Leavins,
      edd = Some("9/15/2026"))
    val r = out.head()
    assert(r.getLong(4) == 79906L)   // Supplier On Record
    assert(r.getString(6) == "P2M")  // WW Buyer
  }

  test("defaultEdd: weekday passthrough and weekend roll") {
    assert(Steps.defaultEdd(LocalDate.of(2026, 8, 10)) == "8/12/2026") // Mon -> Wed
    assert(Steps.defaultEdd(LocalDate.of(2026, 8, 6)) == "8/10/2026")  // Thu -> Mon
    assert(Steps.defaultEdd(LocalDate.of(2026, 8, 7)) == "8/10/2026")  // Fri -> Mon
  }
}
