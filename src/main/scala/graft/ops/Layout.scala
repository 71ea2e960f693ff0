package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for the 100 TB scan path — the engine-side half
  * of storage pruning. A parquet lake is only as fast as the files a
  * predicate can SKIP: min/max footer stats prune perfectly when the data
  * is clustered on the filtered column, but sorting can cluster only ONE
  * dimension. Z-ORDERING (the Delta/Iceberg `OPTIMIZE ZORDER BY` idea,
  * itself Morton 1966) interleaves the bits of several dimensions into
  * one clustering key so that range-partitioning on it keeps EVERY
  * interleaved dimension's per-file min/max tight — a filter on any of
  * them skips most files, at the cost of none of them pruning quite as
  * tightly as a dedicated sort.
  *
  * Everything here is exact integer arithmetic (bin → interleave →
  * range-partition): no hashing, no floats, deterministic for a given
  * (lo, hi, bits) config — which is what makes the z-value itself
  * oracle-checkable cross-engine (q207).
  *
  * Scale shape: one pass to z-value (a scalar expression — codegen
  * folds the shift/mask chain), one range exchange (samples the z
  * distribution, the same machinery as a global sort), and an optional
  * within-partition sort so row groups inside a file stay clustered
  * too. No shuffle is wider than the final file count. */
object Layout {

  /** Fixed-width binning of a numeric column onto [0, 2^bits): values at
    * or below `lo` take bin 0, at or above `hi` take the top bin, and the
    * interior splits into equal widths — `floor((v − lo) · (2^bits /
    * (hi − lo)))`, a pure IEEE `− · floor` chain over the value and two
    * literals, so both engines compute the identical double and the
    * identical bin (the floor-on-shared-binary portability rule; `round`
    * is the class that diverges, floor is not). Caller supplies (lo, hi)
    * — bounds are data
    * statistics a lake keeps anyway, and literal bounds keep the bin a
    * pure function of the value (re-running over grown data never
    * re-bins old rows, so incremental re-clustering stays append-only).
    * NULL bins to 0: at layout time a NULL must land SOMEWHERE
    * deterministic, and the bottom bin keeps all NULLs co-located. */
  def bin(v: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 21, s"bin: bits must be in [1,21], got $bits")
    require(lo < hi, s"bin: need lo < hi, got [$lo, $hi)")
    val n = 1L << bits
    val w = coalesce(v.cast("double"), lit(lo))
    val scaled = floor((w - lit(lo)) * lit(n.toDouble / (hi - lo)))
      .cast("long")
    greatest(lit(0L), least(lit(n - 1), scaled))
  }

  /** Morton interleave of two already-binned values (each in
    * [0, 2^bits)): bit i of `a` lands at output bit 2i, bit i of `b` at
    * 2i+1. Exact integer shifts/masks — 2·bits terms, folded by codegen
    * into one expression; bits ≤ 21 keeps the result well inside a
    * BIGINT (42 bits). */
  def interleave(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 21, s"interleave: bits in [1,21], got $bits")
    (0 until bits).map { i =>
      val ai = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
      val bi = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      ai.bitwiseOR(bi)
    }.reduce(_ bitwiseOR _)
  }

  /** The z-value for two numeric columns under caller-supplied bounds —
    * [[bin]] then [[interleave]]. Exposed separately so a query can
    * PUBLISH the key (q207's oracle replays exactly this arithmetic). */
  def zValue(a: Column, loA: Double, hiA: Double,
             b: Column, loB: Double, hiB: Double, bits: Int): Column =
    interleave(bin(a, loA, hiA, bits), bin(b, loB, hiB, bits), bits)

  /** Re-cluster `df` on the z-order of two columns: range-partition on
    * the z-value into `numParts` output files, sort within each so row
    * groups stay clustered, and drop the helper column. After this
    * layout, per-partition min/max of BOTH columns are tight — a filter
    * on either one prunes most partitions (LayoutSpec asserts the
    * locality win over the incoming layout). Write the result with the
    * usual parquet sink; the footer stats do the rest at scan time. */
  def zorderRepartition(df: DataFrame, colA: String, loA: Double, hiA: Double,
                        colB: String, loB: Double, hiB: Double,
                        bits: Int = 16, numParts: Int = 64): DataFrame = {
    require(numParts >= 1, s"zorderRepartition: numParts >= 1, got $numParts")
    df.withColumn("_z",
        zValue(col(colA), loA, hiA, col(colB), loB, hiB, bits))
      .repartitionByRange(numParts, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
