package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact data profiling — per-column non-null/null/distinct counts and
  * min/max (rendered as strings so one long-format schema fits any column
  * type). The whole profile is ONE aggregation pass over the table
  * (Catalyst plans the multi-distinct via Expand with partial aggregation);
  * no collect, no per-column scans — profiling 100 TB costs one scan. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"__n_$c"),
      count_distinct(col(c)).as(s"__d_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"),
          col(s"__n_$c").as("n_nonnull"),
          (col("__total") - col(s"__n_$c")).as("n_null"),
          col(s"__d_$c").as("n_distinct"),
          col(s"__mn_$c").as("min_str"),
          col(s"__mx_$c").as("max_str"))
      }: _*)).as("p"))
      .select("p.*")
  }
}
