package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-column companion to
  * [[Compaction]]'s single-key range clustering. Range-sorting a table on
  * `a` makes parquet min/max row-group statistics prune reads for
  * predicates on `a` but does nothing for `b`; interleaving the bits of
  * BOTH columns' quantized values into one sort key gives every clustered
  * column a per-file value span of roughly `global_span / files^(1/k)` —
  * so a 2-D predicate (`a BETWEEN … AND b BETWEEN …`) skips most files at
  * the scan, the standard lake-layout trick for multi-dimensional access
  * paths at 100 TB (a `WHERE domain_bucket AND date` scan should not read
  * the whole corpus because the layout could only cluster one of them).
  *
  * Quantization is linear between the column's min and max (one tiny
  * aggregate row, broadcast into the projection — no extra shuffle beyond
  * the clustering repartition itself). Heavily skewed columns quantize
  * poorly under a linear scale — pre-transform them (log, bucket id) or
  * range-cluster on the dominant column instead; the operator stays
  * deliberately one-pass.
  *
  * Everything is plain `Column` arithmetic (casts, shifts, bitwise or) —
  * fully codegen'd, no UDFs. */
object ZOrder {

  /** Cluster `df` into `nPartitions` range partitions of the z-value over
    * `cols` (each quantized to `bits` bits; `cols.size * bits` must fit a
    * long). Rows inside each partition are z-sorted, so a parquet write of
    * the result yields one value-clustered file per partition. Clustered
    * columns must be numeric/date/timestamp (anything castable to double);
    * nulls quantize to bucket 0 (they cluster together at the curve's
    * origin). */
  def zCluster(df: DataFrame, cols: Seq[String], nPartitions: Int,
               bits: Int = 16): DataFrame = {
    require(cols.nonEmpty, "need at least one z-order column")
    require(cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits exceeds a long (63 usable bits)")
    require(nPartitions > 0, "nPartitions must be positive")
    val stats = df.agg(
      cols.flatMap(c => Seq(
        min(asDouble(df, c)).as(s"_zmin_$c"),
        max(asDouble(df, c)).as(s"_zmax_$c"))).head,
      cols.flatMap(c => Seq(
        min(asDouble(df, c)).as(s"_zmin_$c"),
        max(asDouble(df, c)).as(s"_zmax_$c"))).tail: _*)
    val maxQ = (1L << bits) - 1
    def quantized(c: String): Column = {
      val lo = col(s"_zmin_$c")
      val span = col(s"_zmax_$c") - lo
      val scaled = when(span <= 0.0 || col(c).isNull, lit(0L))
        .otherwise(least(
          floor((asDouble(df, c) - lo) / span * maxQ).cast("long"),
          lit(maxQ)))
      greatest(scaled, lit(0L))
    }
    // Stage the quantized value of each column ONCE in its own projection
    // (as zClusterByQuantiles does): inlining `quantized(c)` per
    // interleaved bit duplicates the when/floor/least/greatest chain
    // bits× per column — a codegen-size blowup on wide multi-column calls.
    val k = cols.size
    val staged = df.crossJoin(broadcast(stats))
      .select(df.columns.map(col).toIndexedSeq ++
        cols.map(c => quantized(c).as(s"_zq_$c")): _*)
    // Morton interleave: bit i of column j lands at position i*k + j.
    val z = (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftrightunsigned(col(s"_zq_$c"), i).bitwiseAND(lit(1L)),
          i * k + j)
      }
    }.reduce(_.bitwiseOR(_))
    staged
      .withColumn("_zval", z)
      .repartitionByRange(nPartitions, col("_zval"))
      .sortWithinPartitions(col("_zval"))
      .drop("_zval" +: cols.map(c => s"_zq_$c"): _*)
  }

  /** Skew-robust variant: quantize each column by its RANK (equi-depth
    * quantile buckets from one `approx_percentile` aggregate — still a
    * single broadcast stats row) instead of a linear min/max scale, so a
    * heavy-tailed column (bytes, view counts) spreads evenly over the
    * curve instead of collapsing into bucket 0. The bucket index is a
    * codegen'd count of boundaries <= value (`aggregate` over the
    * boundary array — `buckets` comparisons per row per column, so keep
    * `bits` modest; 8 bits = 256-way is plenty for file-level layout). */
  def zClusterByQuantiles(df: DataFrame, cols: Seq[String], nPartitions: Int,
                          bits: Int = 8): DataFrame = {
    require(cols.nonEmpty, "need at least one z-order column")
    require(cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits exceeds a long (63 usable bits)")
    require(nPartitions > 0, "nPartitions must be positive")
    val buckets = 1 << bits
    // Interior boundaries only (1/B … (B-1)/B): bucket = #{boundaries <= v}
    // lands uniform data uniformly in 0..B-1.
    val fractions = array((1 until buckets).map(i =>
      lit(i.toDouble / buckets)): _*)
    val stats = df.agg(
      percentile_approx(asDouble(df, cols.head), fractions, lit(10000))
        .as(s"_zq_${cols.head}"),
      cols.tail.map(c =>
        percentile_approx(asDouble(df, c), fractions, lit(10000))
          .as(s"_zq_$c")): _*)
    def bucketOf(c: String): Column =
      when(col(c).isNull, lit(0L)).otherwise(aggregate(
        col(s"_zq_$c"), lit(0L),
        (acc, b) => acc + when(asDouble(df, c) >= b, 1L).otherwise(0L)))
    val k = cols.size
    // Stage the bucket indexes in their own projection so the B-comparison
    // scan runs ONCE per column, not once per interleaved bit.
    val bucketed = df.crossJoin(broadcast(stats))
      .select(df.columns.map(col).toIndexedSeq ++
        cols.map(c => bucketOf(c).as(s"_zb_$c")): _*)
    val z = (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftrightunsigned(col(s"_zb_$c"), i).bitwiseAND(lit(1L)),
          i * k + j)
      }
    }.reduce(_.bitwiseOR(_))
    bucketed
      .withColumn("_zval", z)
      .repartitionByRange(nPartitions, col("_zval"))
      .sortWithinPartitions(col("_zval"))
      .drop("_zval" +: cols.map(c => s"_zb_$c"): _*)
  }

  /** Fixed-width binning onto [0, 2^bits) under CALLER-SUPPLIED bounds
    * (r19) — the deterministic twin of [[zCluster]]'s data-derived
    * min/max quantization: values at or below `lo` bin to 0, at or above
    * `hi` to the top bin, interior `floor((v − lo) · (2^bits/(hi − lo)))`
    * — a pure IEEE `− · floor` chain over the value and two literals, so
    * two engines computing it agree bit-for-bit (floor on a shared
    * binary double is the portable class; round is not). Literal bounds
    * make the bin a pure function of the VALUE: re-clustering grown data
    * never re-bins old rows (append-only incremental layout), and the
    * resulting z-key is oracle-checkable (q207). NULL bins to 0 — a
    * layout must put NULL somewhere deterministic, and the bottom bin
    * keeps NULLs co-located. Numeric input (cast dates/timestamps to
    * their epoch number first — [[zCluster]]'s asDouble shows the map).
    *
    * PORTABILITY FINE PRINT (r19 advisory): the replayed expression is
    * `floor((v − lo) · M)` with M the SINGLE precomputed double
    * `2^bits / (hi − lo)` — that constant, not the textbook
    * `(v − lo) / (hi − lo) · 2^bits`, is the contract. When `hi − lo`
    * is binary-exact (a power of two, or any p·2^k with small odd p)
    * the two forms coincide and a foreign engine may compute the ratio
    * itself; for arbitrary bounds `1/(hi−lo)` rounds, so an oracle must
    * multiply by the same precomputed M (one double literal) or risk a
    * ±1-bin disagreement exactly at bin edges. q207 uses power-of-two
    * widths; its oracle embeds M as a literal either way. */
  def binFixed(v: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 21, s"binFixed: bits in [1,21], got $bits")
    require(lo < hi, s"binFixed: need lo < hi, got [$lo, $hi)")
    val n = 1L << bits
    val scaled = floor((coalesce(v.cast("double"), lit(lo)) - lit(lo)) *
      lit(n.toDouble / (hi - lo))).cast("long")
    greatest(lit(0L), least(lit(n - 1), scaled))
  }

  /** The z-value over fixed-bounds bins, as ONE publishable Column (r19):
    * `specs` = (column, lo, hi) per dimension, bit i of dimension j at
    * output position i·k + j — the same layout [[zCluster]] writes, but
    * exact/deterministic end to end so a query can PUBLISH the key and a
    * foreign engine can replay it term by term (q207's oracle does).
    * Each dimension's bin chain is inlined per interleaved bit — fine
    * for a published key at modest k·bits; the CLUSTERING path
    * ([[zClusterFixed]]) stages bins in their own projection instead,
    * the codegen-size discipline the staged `_zq_*` comment below
    * documents. */
  def zValueFixed(specs: Seq[(Column, Double, Double)], bits: Int): Column = {
    require(specs.nonEmpty, "zValueFixed: need at least one dimension")
    require(specs.size * bits <= 63,
      s"${specs.size} cols x $bits bits exceeds a long (63 usable bits)")
    val k = specs.size
    (0 until bits).flatMap { i =>
      specs.zipWithIndex.map { case ((v, lo, hi), j) =>
        shiftleft(shiftrightunsigned(binFixed(v, lo, hi, bits), i)
          .bitwiseAND(lit(1L)), i * k + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** [[zCluster]] with fixed caller-supplied bounds (r19): stage each
    * dimension's [[binFixed]] ONCE in its own projection (the same
    * codegen-size discipline as zCluster's `_zq_*`), interleave the
    * staged bins, range-partition + z-sort, drop the helpers. Because
    * the bins are pure functions of the values, re-running over grown
    * data leaves old rows' keys unchanged — incremental re-clustering
    * stays append-only, which data-derived min/max cannot promise. */
  def zClusterFixed(df: DataFrame, specs: Seq[(String, Double, Double)],
                    nPartitions: Int, bits: Int = 16): DataFrame = {
    require(specs.nonEmpty, "need at least one z-order column")
    require(specs.size * bits <= 63,
      s"${specs.size} cols x $bits bits exceeds a long (63 usable bits)")
    require(nPartitions > 0, "nPartitions must be positive")
    val helpers = "_zval" +: specs.map { case (c, _, _) => s"_zq_$c" }
    require(!helpers.exists(df.columns.contains),
      s"zClusterFixed: input already has a ${helpers.mkString("/")} column" +
        " — rename it first (the helper columns are dropped on the way out)")
    val k = specs.size
    val staged = df.select(df.columns.map(col).toIndexedSeq ++
      specs.map { case (c, lo, hi) =>
        binFixed(col(c), lo, hi, bits).as(s"_zq_$c")
      }: _*)
    val z = (0 until bits).flatMap { i =>
      specs.zipWithIndex.map { case ((c, _, _), j) =>
        shiftleft(shiftrightunsigned(col(s"_zq_$c"), i).bitwiseAND(lit(1L)),
          i * k + j)
      }
    }.reduce(_.bitwiseOR(_))
    staged
      .withColumn("_zval", z)
      .repartitionByRange(nPartitions, col("_zval"))
      .sortWithinPartitions(col("_zval"))
      .drop(helpers: _*)
  }

  /** The column on a linear double scale, honoring the type: DATE and
    * TIMESTAMP don't cast to double under ANSI, so they go through their
    * epoch representation (days / microseconds) first — ordering is
    * preserved, which is all quantization needs. */
  private def asDouble(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.DateType =>
        unix_date(col(c)).cast("double")
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(c).cast("timestamp")).cast("double")
      case _ => col(c).cast("double")
    }

  /** [[Compaction.compactParquetDir]] with z-order clustering: rewrite
    * `dir` to ⌈bytes/targetBytes⌉ files, each clustered on the Morton
    * curve over `zCols`. Returns the number of files written. */
  def compactParquetDirZOrder(spark: org.apache.spark.sql.SparkSession,
                              dir: String, targetBytes: Long,
                              zCols: Seq[String], bits: Int = 16): Int =
    Compaction.rewrite(spark, dir, targetBytes,
      (df, n) => zCluster(df, zCols, n, bits))
}
