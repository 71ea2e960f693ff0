package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout: driver-replayed Morton arithmetic, bin edge cases, and
  * the locality property the operator exists for — after
  * zorderRepartition, per-partition extents of BOTH dimensions shrink,
  * which is what lets parquet footer stats prune on either column. */
class LayoutSpec extends SparkSpec {

  /** Reference Morton interleave on the driver. */
  private def morton(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("interleave: exhaustive parity with the driver replica at bits=4, " +
      "spot magnitudes at bits=21") {
    import spark.implicits._
    val pairs = for (a <- 0 until 16; b <- 0 until 16) yield (a.toLong, b.toLong)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.interleave(col("a"), col("b"), 4).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == morton(a, b, 4), s"($a,$b)")
    }
    // bits=21 (the cap): the top bit of each input lands at bits 40/41
    val top = (1L << 21) - 1
    val g21 = Seq((top, 0L), (0L, top), (top, top)).toDF("a", "b")
      .select(Layout.interleave(col("a"), col("b"), 21).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(g21 == Seq(morton(top, 0L, 21), morton(0L, top, 21),
      morton(top, top, 21)))
  }

  test("bin: lo->0, hi and above -> top bin, below-lo clamps to 0, NULL " +
      "lands in bin 0, interior exact at power-of-two widths") {
    import spark.implicits._
    val vals = Seq[(Long, Option[Double])](
      (1L, Some(0.0)), (2L, Some(-5.0)), (3L, Some(512.0)), (4L, Some(600.0)),
      (5L, None), (6L, Some(2.0)), (7L, Some(255.9)), (8L, Some(510.0)))
      .toDF("id", "v")
    val got = vals.select(col("id"), Layout.bin(col("v"), 0.0, 512.0, 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // width = 2.0 per bin (512 / 256)
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 255L, 4L -> 255L,
      5L -> 0L, 6L -> 1L, 7L -> 127L, 8L -> 255L))
  }

  test("zorderRepartition locality: per-partition extents of BOTH " +
      "dimensions shrink vs the incoming layout") {
    import spark.implicits._
    // 64×64 uniform grid, arriving in x-major order (the worst case for
    // y-pruning under a plain sort-by-x layout).
    val grid = spark.range(4096).select(
      (col("id") / 64).cast("long").cast("double").as("x"),
      (col("id") % 64).cast("double").as("y"))
    val parts = 16
    def extents(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val rows = df.withColumn("_p", spark_partition_id())
        .groupBy("_p")
        .agg((max("x") - min("x")).as("ex"), (max("y") - min("y")).as("ey"))
        .collect()
      (rows.map(_.getAs[Double]("ex")).sum / rows.length,
        rows.map(_.getAs[Double]("ey")).sum / rows.length)
    }
    val z = Layout.zorderRepartition(grid, "x", 0.0, 64.0, "y", 0.0, 64.0,
      bits = 6, numParts = parts)
    val (zx, zy) = extents(z)
    // 16 partitions over a 64×64 z-curve ≈ a 4×4 macro-grid: each
    // partition spans ~16 of 63 in each dimension. Assert the halving —
    // loose enough for range-partition boundary jitter, impossible for a
    // one-dimensional layout (which leaves the OTHER dimension's extent
    // at the full 63).
    assert(zx < 63.0 / 2 && zy < 63.0 / 2, s"z extents: $zx, $zy")
    // the x-major incoming layout: x clusters (extent small) but y spans
    // the whole range in every partition
    val (_, ry) = extents(grid.repartitionByRange(parts, col("x"), col("y")))
    assert(ry > 63.0 / 2, s"sorted-by-x baseline should not cluster y: $ry")
  }
}
