package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: the Spark-first implementation plus (where
  * SQL-expressible) an independent ANSI-SQL oracle the driver runs in DuckDB
  * over the same parquet tables. Column names/ordering must line up exactly
  * (the driver sorts columns by name before hashing). */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(sql))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
