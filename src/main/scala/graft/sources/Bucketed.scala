package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins (the SURVEY §5 scale
  * mandate): two fact tables bucketed AND sorted by the same join key can
  * sort-merge join with ZERO exchange and ZERO sort — at 100 TB that's the
  * difference between re-shuffling both tables per query and reading
  * pre-organized buckets. Spark's built-in (non-Hive) catalog persists the
  * bucket spec in the table metadata, so every later reader plans around
  * it. The pattern pays off when a big-big join key is stable and queried
  * repeatedly (e.g. lineitem ⋈ orders on orderkey): pay one bucketed write,
  * amortize over every downstream join, aggregation, or dedup on that key.
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted managed parquet table. `buckets`
    * should be sized so one bucket of the LARGEST co-bucketed table fits an
    * executor's task comfortably (e.g. 100 TB / 4096 buckets ≈ 24 GB raw ≈
    * a few GB columnar — scan-able; scale buckets with data, they cost
    * nothing when idle). All co-joined tables must use the SAME bucket
    * count and key for exchange-free planning. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val sorted = if (sortCols.isEmpty) Seq(key) else sortCols
    // Pre-shuffle into exactly `buckets` hash partitions on the bucket key:
    // shuffle hash and bucket hash agree (both murmur3 pmod buckets), so
    // each writer task holds exactly one bucket => ONE file per bucket.
    // Spark only trusts a bucket's sortBy metadata when the bucket is a
    // single file; multi-file buckets get re-sorted at read, which forfeits
    // the sort-free merge join this layout exists for.
    df.repartition(buckets, df(key)).write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Read a bucketed table back with its bucket metadata attached (a plain
    * `spark.table` — the catalog carries the spec; listed here to make the
    * read side of the contract explicit). Bucketing alone removes the join
    * Exchange; to also skip the Sort, enable
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (Spark 3+
    * hides sorted-bucket ordering by default). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
