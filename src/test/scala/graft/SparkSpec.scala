package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs — one JVM-wide session (Spark's
  * getOrCreate) so the suite doesn't pay startup per spec class. */
object SparkSpec {
  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // Codegen-STRICT for every suite, not just SparkEntrySpec's golden
    // loop: a whole-stage compile error must fail the test, never silently
    // fall back to interpreted execution (the q29 bug class — invalid Java
    // under Expand shipped for 4 rounds because fallback hid it).
    .config("spark.sql.codegen.fallback", "false")
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  import org.apache.spark.sql.{Column, DataFrame, Row}

  /** One-column string DataFrame helper. */
  def strDf(values: Seq[String]): DataFrame = {
    import spark.implicits._
    values.toDF("v")
  }

  /** Evaluate a Column expression over one string input. */
  def evalStr(input: String, f: Column => Column): Any = {
    import org.apache.spark.sql.functions.col
    val r = strDf(Seq(input)).select(f(col("v"))).collect()(0)
    if (r.isNullAt(0)) null else r.get(0)
  }

  def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(r => (0 until r.length).map(i => r.get(i)))
}
