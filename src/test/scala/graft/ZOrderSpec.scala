package graft

import java.nio.file.Files

import graft.sinks.{Compaction, ZOrder}
import org.apache.spark.sql.functions._

/** Z-order clustering: after a z-clustered write, EVERY clustered column's
  * per-file min/max span is a fraction of its global span — the property
  * parquet min/max pruning needs for multi-dimensional predicates (a plain
  * range sort gives it to one column only). */
class ZOrderSpec extends SparkSpec {

  /** (file -> per-column span) for each data file of a parquet dir. */
  private def fileSpans(dir: String, c: String): Seq[Long] =
    spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max(col(c)) - min(col(c))).as("span"))
      .collect().map(_.getLong(1)).toSeq

  test("zCluster: per-file spans shrink on BOTH dimensions") {
    // 256x256 uniform independent grid: a alone knows nothing about b.
    val df = spark.range(65536).select(
      (col("id") % 256).as("a"), expr("id div 256").as("b"))
    val dir = Files.createTempDirectory("zorder").resolve("t").toString
    ZOrder.zCluster(df, Seq("a", "b"), nPartitions = 64).write.parquet(dir)

    val spansA = fileSpans(dir, "a")
    val spansB = fileSpans(dir, "b")
    assert(spansA.size >= 32, s"expected ~64 files, got ${spansA.size}")
    // Aligned quad-tree cells at 64 files are 32x32 (span 31). A file whose
    // z-range straddles a quadrant boundary legitimately spans wider in one
    // dim (the Morton curve jumps there — the file crossing the midpoint
    // touches both halves), so the clustering property is STATISTICAL:
    // median/mean spans collapse on BOTH dims, vs ~255 everywhere for a
    // single-column sort or no sort. Straddlers are the bounded minority
    // (one per boundary, 63 boundaries, most at fine levels).
    def stats(s: Seq[Long]) = (s.sorted.apply(s.size / 2), s.sum / s.size,
      s.count(_ <= 64))
    val (medA, meanA, okA) = stats(spansA)
    val (medB, meanB, okB) = stats(spansB)
    assert(medA <= 64 && meanA <= 64, s"a: median=$medA mean=$meanA")
    assert(medB <= 64 && meanB <= 64, s"b: median=$medB mean=$meanB")
    assert(okA * 4 >= spansA.size * 3, s"only $okA/${spansA.size} a-files <= 64")
    assert(okB * 4 >= spansB.size * 3, s"only $okB/${spansB.size} b-files <= 64")

    // Clustering reorders, never changes content.
    val back = spark.read.parquet(dir)
    assert(back.count() == 65536)
    assert(back.agg(sum(col("a") * 65536 + col("b"))).head().getLong(0) ==
      df.agg(sum(col("a") * 65536 + col("b"))).head().getLong(0))
  }

  test("compactParquetDirZOrder: fragmented dir -> few z-clustered files") {
    val df = spark.range(65536).select(
      (col("id") % 256).as("a"), expr("id div 256").as("b"))
    val dir = Files.createTempDirectory("zorder-compact").resolve("t").toString
    df.repartition(50).write.parquet(dir) // fragmented, unclustered
    assert(Compaction.parquetFileCount(spark, dir) == 50)

    val bytes = Compaction.parquetBytes(spark, dir)
    val n = ZOrder.compactParquetDirZOrder(spark, dir, (bytes + 15) / 16,
      zCols = Seq("a", "b"))
    assert(n >= 8 && n <= 32, s"files written: $n")
    assert(Compaction.parquetFileCount(spark, dir) == n)
    assert(spark.read.parquet(dir).count() == 65536)
    // Both dims clustered post-compaction (pre-compaction each random
    // 1311-row file spans ~the full 0..255 range on both dims; after, at
    // ~16 files the aligned cell is 64x64, straddlers bounded as above).
    val sa = fileSpans(dir, "a"); val sb = fileSpans(dir, "b")
    assert(sa.sorted.apply(sa.size / 2) <= 127, s"a median ${sa.sorted}")
    assert(sb.sorted.apply(sb.size / 2) <= 127, s"b median ${sb.sorted}")
    assert(sa.count(_ <= 127) * 2 >= sa.size, s"a spans ${sa.sorted}")
    assert(sb.count(_ <= 127) * 2 >= sb.size, s"b spans ${sb.sorted}")
  }

  test("zClusterByQuantiles: heavy-tailed column clusters by rank") {
    // a = (id%256)^2 — uniform RANK, quadratic VALUE skew: linear min/max
    // quantization would crowd most rows into the low buckets. Equi-depth
    // quantile buckets must cluster it as well as the uniform case,
    // measured in rank space (sqrt(a) recovers the uniform 0..255 rank).
    val df = spark.range(65536).select(
      ((col("id") % 256) * (col("id") % 256)).as("a"),
      expr("id div 256").as("b"))
    val dir = Files.createTempDirectory("zorder-q").resolve("t").toString
    ZOrder.zClusterByQuantiles(df, Seq("a", "b"), nPartitions = 64)
      .write.parquet(dir)
    val ranks = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max(sqrt(col("a"))) - min(sqrt(col("a")))).as("ra"),
        (max(col("b")) - min(col("b"))).as("rb"))
      .collect().map(r => (r.getDouble(1), r.getLong(2))).toSeq
    val ra = ranks.map(_._1.toLong); val rb = ranks.map(_._2)
    assert(ra.size >= 32)
    assert(ra.sorted.apply(ra.size / 2) <= 64, s"a rank median ${ra.sorted.reverse.take(5)}")
    assert(rb.sorted.apply(rb.size / 2) <= 64, s"b median ${rb.sorted.reverse.take(5)}")
    assert(ra.sum / ra.size <= 80, s"a rank mean ${ra.sum / ra.size}")
    assert(rb.sum / rb.size <= 80, s"b mean ${rb.sum / rb.size}")
    assert(spark.read.parquet(dir).count() == 65536)
  }

  test("zCluster on a DATE column (ANSI-safe epoch quantization)") {
    // DATE doesn't cast to double under ANSI — the op must route through
    // unix_date. 256 distinct days x 256 longs, same grid as the base test.
    val df = spark.range(65536).select(
      date_add(lit("2020-01-01").cast("date"),
        (col("id") % 256).cast("int")).as("d"),
      expr("id div 256").as("b"))
    val dir = Files.createTempDirectory("zorder-date").resolve("t").toString
    ZOrder.zCluster(df, Seq("d", "b"), nPartitions = 64).write.parquet(dir)
    val spansD = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max(unix_date(col("d"))) - min(unix_date(col("d"))))
        .cast("long").as("span"))
      .collect().map(_.getLong(1)).toSeq
    assert(spansD.size >= 32)
    assert(spansD.sorted.apply(spansD.size / 2) <= 64,
      s"date median span ${spansD.sorted.reverse.take(5)}")
    assert(spark.read.parquet(dir).count() == 65536)
  }

  test("zCluster rejects bit budgets that overflow a long") {
    val df = spark.range(4).select(col("id").as("a"))
    intercept[IllegalArgumentException] {
      ZOrder.zCluster(df, Seq("a", "a", "a", "a"), 2, bits = 16)
    }
  }

  // ── fixed-bounds variant (r19): deterministic bins, publishable key ──

  /** Reference Morton interleave on the driver (k=2). */
  private def morton2(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("zValueFixed: exhaustive parity with the driver replica at bits=4, " +
      "spot magnitudes at bits=21") {
    import spark.implicits._
    // bounds [0, 2^bits) with integer values make the bin the identity,
    // so this isolates the interleave
    val pairs = for (a <- 0 until 16; b <- 0 until 16) yield (a.toLong, b.toLong)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValueFixed(
        Seq((col("a"), 0.0, 16.0), (col("b"), 0.0, 16.0)), 4).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == morton2(a, b, 4), s"($a,$b)")
    }
    val top = (1L << 21) - 1
    val hi = (1L << 21).toDouble
    val g21 = Seq((top, 0L), (0L, top), (top, top)).toDF("a", "b")
      .select(ZOrder.zValueFixed(
        Seq((col("a"), 0.0, hi), (col("b"), 0.0, hi)), 21).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(g21 == Seq(morton2(top, 0L, 21), morton2(0L, top, 21),
      morton2(top, top, 21)))
  }

  test("binFixed: lo->0, hi and above -> top bin, below-lo clamps to 0, " +
      "NULL lands in bin 0, interior exact at power-of-two widths") {
    import spark.implicits._
    val vals = Seq[(Long, Option[Double])](
      (1L, Some(0.0)), (2L, Some(-5.0)), (3L, Some(512.0)), (4L, Some(600.0)),
      (5L, None), (6L, Some(2.0)), (7L, Some(255.9)), (8L, Some(510.0)))
      .toDF("id", "v")
    val got = vals
      .select(col("id"), ZOrder.binFixed(col("v"), 0.0, 512.0, 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // width = 2.0 per bin (512 / 256)
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 255L, 4L -> 255L,
      5L -> 0L, 6L -> 1L, 7L -> 127L, 8L -> 255L))
  }

  /** Input metrics (recordsRead, bytesRead) actually consumed by `f` —
    * the ground truth for pruning assertions: parquet row groups skipped
    * by footer min/max stats never reach these counters. Task-end events
    * post async, so poll until the counters stabilize. */
  private def scanMetrics(f: => Unit): (Long, Long) = {
    import java.util.concurrent.atomic.AtomicLong
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val records = new AtomicLong; val bytes = new AtomicLong
    val l = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          records.addAndGet(m.inputMetrics.recordsRead)
          bytes.addAndGet(m.inputMetrics.bytesRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      var last = -1L; var stable = 0; var waited = 0
      while (stable < 2 && waited < 5000) {
        Thread.sleep(100); waited += 100
        val cur = records.get
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
    } finally spark.sparkContext.removeSparkListener(l)
    (records.get, bytes.get)
  }

  test("END-TO-END file pruning (r19 verdict item 1): a 2-D range predicate " +
      "over the z-clustered layout READS a small fraction of what the " +
      "1-D-sorted layout reads — asserted on Spark input metrics, so this " +
      "fails if parquet footer-stat pruning stops happening") {
    // 256x256 uniform grid. Z-layout: zClusterFixed at bits=8 over exact
    // integer bounds (bin == value, so per-file bounding boxes are tight
    // Morton cells). 1-D baseline: the same data range-sorted by x — the
    // best a single-column layout can do, and y stats are useless there
    // by construction (every file spans all of y).
    val df = spark.range(65536).select(
      (col("id") % 256).as("x"), expr("id div 256").as("y"))
    val zdir = Files.createTempDirectory("zprune").resolve("z").toString
    val sdir = Files.createTempDirectory("zprune").resolve("s").toString
    ZOrder.zClusterFixed(df, Seq(("x", 0.0, 256.0), ("y", 0.0, 256.0)),
      nPartitions = 64, bits = 8).write.parquet(zdir)
    df.repartitionByRange(64, col("x"))
      .sortWithinPartitions(col("x"), col("y")).write.parquet(sdir)

    // The probe: x in [0,64) AND y in [0,64) — 4096 of 65536 rows (1/16).
    // Quadrant-aligned, so the z-curve holds it in ONE contiguous z-range
    // (a handful of files); the x-sorted layout must read EVERY file
    // overlapping x<64 (16 of 64), each spanning all of y.
    def probe(dir: String): Long = {
      val out = spark.read.parquet(dir)
        .where(col("x") >= 0L && col("x") < 64L &&
          col("y") >= 0L && col("y") < 64L)
      val n = out.count()
      assert(n == 4096L, s"wrong probe result over $dir: $n")
      n
    }
    val (zRec, zBytes) = scanMetrics(probe(zdir))
    val (sRec, sBytes) = scanMetrics(probe(sdir))
    // Pruning must be ACTIVE at all in both layouts (else both read 65536)…
    assert(sRec < 65536L, s"1-D layout read everything: $sRec records")
    assert(zRec < 16384L, s"z layout barely pruned: $zRec records")
    // …and the z-layout must beat the 1-D layout by at least 2x on rows
    // actually decoded (expected ~4-6k vs ~16384: Morton straddler files
    // can pad the z side, but never to half the 1-D cost). THIS is the
    // assertion that fails if footer-stat row-group pruning regresses.
    assert(zRec * 2 <= sRec,
      s"z-order pruning lost its edge: z=$zRec ($zBytes B) vs " +
        s"1-D-sorted=$sRec ($sBytes B)")
    // Files TOUCHED by the probe (data pages contributing rows): the
    // z-layout concentrates the quadrant in a few files; the 1-D layout
    // necessarily spreads it over every x-overlapping file.
    def filesTouched(dir: String): Long =
      spark.read.parquet(dir)
        .where(col("x") >= 0L && col("x") < 64L &&
          col("y") >= 0L && col("y") < 64L)
        .select(input_file_name()).distinct().count()
    val zFiles = filesTouched(zdir); val sFiles = filesTouched(sdir)
    assert(zFiles <= 8L, s"z quadrant spread over $zFiles files")
    assert(sFiles >= 12L, s"1-D baseline unexpectedly clustered: $sFiles")
  }

  test("zClusterFixed locality: per-partition extents of BOTH dimensions " +
      "shrink vs a one-dimensional layout; helper-name collision rejected") {
    import spark.implicits._
    // 64×64 uniform grid arriving x-major — the worst case for y-pruning
    // under a sort-by-x layout.
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
    val z = ZOrder.zClusterFixed(grid,
      Seq(("x", 0.0, 64.0), ("y", 0.0, 64.0)), parts, bits = 6)
    val (zx, zy) = extents(z)
    // 16 partitions over a 64×64 curve ≈ a 4×4 macro-grid: each partition
    // spans ~16 of 63 per dimension — assert the halving, impossible for
    // a 1-D layout (which leaves the OTHER dimension at the full 63).
    assert(zx < 63.0 / 2 && zy < 63.0 / 2, s"z extents: $zx, $zy")
    val (_, ry) = extents(grid.repartitionByRange(parts, col("x"), col("y")))
    assert(ry > 63.0 / 2, s"sorted-by-x baseline should not cluster y: $ry")
    // a pre-existing helper-named column must be rejected, not silently
    // overwritten and dropped
    intercept[IllegalArgumentException] {
      ZOrder.zClusterFixed(grid.withColumn("_zval", lit(1)),
        Seq(("x", 0.0, 64.0), ("y", 0.0, 64.0)), parts, bits = 6)
    }
  }
}
