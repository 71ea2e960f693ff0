package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Exprs

/** Relational operator pack (SURVEY.md §2.4–§2.7) — thin, composable
  * wrappers over the declarative DataFrame API so Catalyst keeps full
  * visibility (pushdown, pruning, partial aggregation, broadcast planning).
  */
object Ops {

  /** U1–U5: wide -> long unpivot. `Spark.unpivot` gives a single Expand node
    * (no shuffle; scales linearly with input). */
  def meltToLong(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
                 varName: String, valName: String): DataFrame =
    df.unpivot(idCols.map(graft.core.SchemaOps.qcol).toArray, valueCols.map(graft.core.SchemaOps.qcol).toArray, varName, valName)

  /** A1/A3/A4: group-sum with pre-agg zero-fill and post-agg zero drop —
    * partial (map-side) aggregation is supplied by Catalyst. */
  def groupSumDropZero(df: DataFrame, keys: Seq[String], valueCol: String,
                       outName: String): DataFrame =
    df.withColumn(valueCol, coalesce(col(valueCol), lit(0.0)))
      .groupBy(keys.map(col): _*)
      .agg(sum(col(valueCol)).as(outName))
      .where(col(outName) =!= 0)

  /** A5: first-per-group under an explicit total order (never rely on
    * incidental row order — Spark partitions are unordered). */
  def firstPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }

  /** A7: order-preserving distinct — keep the first occurrence by an explicit
    * order column (pandas dict-dedupe semantics made shuffle-safe).
    * Ref: /root/reference/247/tools/read_file_tool.py:242. */
  def distinctKeepFirst(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame =
    firstPerGroup(df, keyCols, Seq(col(orderCol).asc))

  /** O1: numeric-aware sort — numeric strings by value (non-numeric last),
    * then lexical tiebreak. */
  def numericAwareSort(df: DataFrame, c: String, rest: Column*): DataFrame =
    df.orderBy((Exprs.numericSortKey(col(c)).asc_nulls_last +: col(c).asc +: rest).toIndexedSeq: _*)

  /** Global 1-based row numbers under a TOTAL order, computed scalably:
    * `row_number() OVER (ORDER BY …)` with no partition key forces every row
    * onto one task, which is the classic 100 TB single-machine bottleneck.
    * Instead: range-partitioned parallel sort (what orderBy plans anyway),
    * then per-partition offsets via zipWithIndex — one extra O(#partitions)
    * count job, no data movement beyond the sort itself.
    *
    * `order` must be a total order (include a unique tiebreak column);
    * otherwise rows equal under `order` get an arbitrary stable-but-
    * unspecified relative numbering. */
  def globalRowNumber(df: DataFrame, order: Seq[Column], outName: String): DataFrame = {
    // Range-partition by the sort key: partition i holds keys strictly below
    // partition i+1's, so a global rank = rank within my partition + total
    // rows in partitions before mine. Each step is parallel and codegen'd:
    //  - the window's partition key is spark_partition_id(), so "one window
    //    group" = "one range partition" — 200-ish groups, never one;
    //  - partition sizes are a map-side-combined count (32-row result);
    //  - their running offsets come from a tiny self-join (no window);
    //  - offsets broadcast back onto the ranked rows.
    // The ranged subplan appears twice and is reused (ReusedExchange), so
    // the data is shuffled and sorted once — no RDD hop, no eager job.
    val ranged = df.repartitionByRange(order: _*)
      .withColumn("_pid", spark_partition_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_pid")).orderBy(order: _*)
    val ranked = ranged.withColumn("_rn_in", row_number().over(w))
    val counts = ranged.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b._pid") < col("a._pid"), "left")
      .groupBy(col("a._pid").as("_pid"))
      .agg(coalesce(sum(col("b._cnt")), lit(0L)).as("_off"))
    ranked.join(broadcast(offsets), "_pid")
      .withColumn(outName, col("_rn_in") + col("_off"))
      .drop("_pid", "_rn_in", "_off")
  }

  /** J1/J2/J3: small-dimension enrich — explicitly broadcast so the plan is a
    * BroadcastHashJoin regardless of statistics availability. */
  def enrichLeft(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys, "left")

  /** Skew-safe equi-join for when the right side is too big to broadcast
    * and the key distribution is skewed: the left (skewed) side gets a
    * random salt in [0, salts), the right side is replicated once per salt
    * value, and the join key becomes (key, salt) — a hot key's rows now
    * spread over `salts` shuffle partitions instead of one straggler.
    * AQE's skew-join handles moderate skew automatically; explicit salting
    * is for the pathological keys AQE can't split (single-key hotspots).
    * Inner join; output columns = left ++ right-minus-keys. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val l = left.withColumn("_salt", (rand(seed = 42) * salts).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "_salt").drop("_salt")
  }
}
