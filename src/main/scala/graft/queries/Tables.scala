package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loader for the driver-generated TPC-H-ish parquet
  * (TESTDATA.md). Parquet scans are splittable and get predicate pushdown /
  * column pruning from Catalyst — at 100 TB the same call fans out over the
  * cluster; nothing here is local-mode-specific. */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")

  /** Canonicalize `ts` to a nanosecond-epoch LONG regardless of how the
    * fixture writer encoded it. The driver has shipped events.parquet both
    * as INT64 TIMESTAMP(NANOS) (Spark refuses it by default; with
    * `nanosAsLong` it arrives as a raw ns long — passthrough) and as plain
    * µs TIMESTAMP/TIMESTAMP_NTZ (convert: µs × 1000). The NTZ→timestamp
    * cast is micros-exact because GraftSession pins the session timezone
    * to UTC; integer multiply, never float math (ns epochs exceed a
    * double's 2^53 mantissa). */
  def tsNs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => df
    case _ =>
      import org.apache.spark.sql.functions._
      df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
