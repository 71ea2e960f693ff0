package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every declared query pairs a Spark-first implementation with an
  * independent DuckDB oracle (where SQL-expressible) over the same parquet. */
object SparkEntry {

  /** All declared queries, grouped by area. */
  def queryDefs: Seq[QueryDef] =
    RelationalQueries.all ++ LlmQueries.all ++ VendorQueries.all ++
      MultimodalQueries.all ++ AnalyticsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_join_enrich")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    queryDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
