package graft

import org.apache.spark.sql.functions._
import graft.pipelines.FlipsPipeline

/** Flips combined-workbook pipeline goldens (FIXTURES.md §3). */
class FlipsSpec extends SparkSpec {

  // Combined sheet: big region (store grid rows 0-4 + data) up to the Total
  // Weight boundary, then a second "Item" header starting the baby region.
  private val combined: Seq[Seq[String]] = Seq(
    //   c0       c1   c2   c3    c4            c5          c6
    Seq("junk", "", "", "", "$12.5 fob", "9.0", ""),              // r0 Fob values
    Seq("skip", "", "", "", "x", "x", ""),                        // r1 (dropped)
    Seq("junk", "", "", "", "7", "0", ""),                        // r2 Xdock values
    Seq("skip", "", "", "", "x", "x", ""),                        // r3 (dropped)
    Seq("Item", "a", "b", "c", "Store 114", "123 East", "Lot #"), // r4 headers
    Seq("1111111", "x", "x", "x", "3 cs", "", "L1"),              // r5 data
    Seq("2222222", "x", "x", "x", "", "about 2", "L2"),           // r6 data
    Seq("", "", "", "Total Weight", "", "", ""),                  // r7 boundary
    Seq("Item", "id", "some desc", "pack size", "114.0", "123", "Lot #", "Wgt"),
    Seq("3333333", "i1", "FROZEN X", "2", "3", "", "498-68594 39024", "9"),
    Seq("4444444", "i2", "FROZEN Y", "4", "(1)", "1,002", "111-22 10010", "9"),
    Seq("nah", "", "", "", "", "", "", ""))

  test("P12 split: Total Weight boundary and second Item marker") {
    val (big, baby) = FlipsPipeline.split(combined)
    assert(big.size == 7)
    assert(baby.head.head == "Item" && baby.size == 4)
  }

  test("J3 store dim: Fob/Xdock rows, first-int branch keys, leading-num values") {
    val (big, _) = FlipsPipeline.split(combined)
    val dim = FlipsPipeline.storeDim(spark, big)
    assert(rows(dim.orderBy("branch")) == Seq(
      Seq("114", 12.5, 7.0),
      Seq("123", 9.0, 0.0)))
  }

  test("big flip clean + pivot: num-anywhere parse, ceil, zero drop, sort") {
    val (big, _) = FlipsPipeline.split(combined)
    val cleaned = FlipsPipeline.cleanBig(spark, big)
    assert(cleaned.columns.filter(_ != "_row_idx").toSeq ==
      Seq("Item", "Store 114", "123 East", "Lot #"))
    val pivot = FlipsPipeline.pivotBig(cleaned)
    // "3 cs" -> 3 under Store 114; "about 2" -> 2 under 123 East; branch
    // sort by first int: 114 < 123.
    assert(rows(pivot) == Seq(
      Seq("Store 114", "1111111", "L1", 3L),
      Seq("123 East", "2222222", "L2", 2L)))
  }

  test("big flip output: XDCK/FOB broadcast lookup, P20/W constants") {
    val (big, _) = FlipsPipeline.split(combined)
    val pivot = FlipsPipeline.pivotBig(FlipsPipeline.cleanBig(spark, big))
    val out = FlipsPipeline.outputBig(pivot,
      FlipsPipeline.storeDim(spark, big), edd = "8/14/26")
    val got = rows(out.select(col("Branch"), col("Item"), col("Distro Size"),
      col("WW Buyer"), col("AmountCode"), col("XDCK"), col("FOB")))
    // "Store 114" -> 114: xdock 7, fob 12.5; "123 East" -> 123: xdock 0 -> null.
    assert(got == Seq(
      Seq(114L, 1111111L, 3L, "P20", "W", 7.0, 12.5),
      Seq(123L, 2222222L, 2L, "P20", "W", null, 9.0)))
  }

  test("baby flip clean + pivot: NA normalize, lot filter, ceil, store codes") {
    val (_, baby) = FlipsPipeline.split(combined)
    val cleaned = FlipsPipeline.cleanBaby(spark, baby)
    // Wgt dropped (right of Lot #), 3rd col renamed DESC, store headers
    // cleaned 114.0 -> 114.
    assert(cleaned.columns.filter(_ != "_row_idx").toSeq ==
      Seq("Item", "id", "DESC", "pack size", "114", "123", "Lot #"))
    val pivot = FlipsPipeline.pivotBaby(cleaned)
    // (1) -> ceil(-1) = -1; 1,002 -> 1002; blanks dropped.
    assert(rows(pivot.select(col("Item"), col("Store"), col("Value"))) == Seq(
      Seq("3333333", 114L, 3.0),
      Seq("4444444", 114L, -1.0),
      Seq("4444444", 123L, 1002.0)))
  }

  test("baby flip output: PO/carrier joins, weight, lot-last4 sort") {
    import spark.implicits._
    val (_, baby) = FlipsPipeline.split(combined)
    val pivot = FlipsPipeline.pivotBaby(FlipsPipeline.cleanBaby(spark, baby))
    val po = Seq(("114", "114-57466"), ("123", "123-99")).toDF("Store", "PO #")
    val carrier = Seq(("114", 8), ("123", 3)).toDF("Store", "carrier code")
    val out = FlipsPipeline.outputBaby(pivot, po, carrier, invoiceDate = "8/12/2026")
    assert(out.columns.toSeq == Seq("Store", "PO #", "Invoice Date", "DESC",
      "Value", "LOT#", "weight", "pack size", "carrier code"))
    val got = rows(out.select(col("Store"), col("PO #"), col("weight"),
      col("carrier code"), col("LOT#")))
    // Store 114 first; within it lot-last4 ascending: 10010 -> 10 sorts
    // before 39024 -> 9024. weight = Value * pack size.
    assert(got == Seq(
      Seq(114L, "114-57466", -4L, 8, "111-22 10010"),
      Seq(114L, "114-57466", 6L, 8, "498-68594 39024"),
      Seq(123L, "123-99", 4008L, 3, "111-22 10010")))
  }
}
