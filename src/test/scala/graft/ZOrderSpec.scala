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
}
