package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates for 100 TB cardinality/quantile work, where exact
  * distinct/percentile would shuffle every value: what matters at scale is
  * MERGEABILITY — per-partition (or per-day, per-shard) sketches combine
  * into the global answer without revisiting data, so the spec pins (a)
  * bounded error vs exact and (b) sketch-union == whole-data sketch. */
class SketchSpec extends SparkSpec {

  // v ranges over up to 2*3761-1 distinct values (Scala-style % keeps sign);
  // the exact count is computed in each test, never assumed.
  private def vals = spark.range(0, 200000, 1, 8)
    .selectExpr("CAST(xxhash64(id) % 3761 AS BIGINT) AS v", "id % 8 AS shard")

  test("HLL sketch: bounded error, and per-shard sketches union to the global") {
    val exact = vals.selectExpr("COUNT(DISTINCT v)").head().getLong(0)
    val whole = vals.selectExpr(
      "hll_sketch_estimate(hll_sketch_agg(v)) AS est").head().getLong(0)
    assert(math.abs(whole - exact).toDouble / exact < 0.03,
      s"whole-data estimate $whole vs exact $exact")
    // The scale contract: sketch per shard (a day, a partition, a file),
    // union the 8 sketches — same estimate as sketching everything.
    val merged = vals.groupBy(col("shard"))
      .agg(hll_sketch_agg(col("v")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    assert(merged == whole,
      s"merged per-shard estimate $merged != whole-data estimate $whole")
  }

  test("approx_count_distinct (HLL++) within its documented error") {
    // rsd 0.02 -> ~2% standard error; assert within 3 sigma.
    val r = vals.selectExpr(
      "COUNT(DISTINCT v) AS exact", "approx_count_distinct(v, 0.02) AS est").head()
    val (exact, est) = (r.getLong(0), r.getLong(1))
    assert(math.abs(est - exact).toDouble / exact < 0.06, s"$est vs $exact")
  }

  test("approx_percentile lands within rank tolerance of the exact percentile") {
    // Skewed data (squares) so a sloppy implementation would show.
    val df = spark.range(0, 100001, 1, 8).selectExpr("id * id AS x")
    val r = df.selectExpr(
      "approx_percentile(x, 0.5, 10000) AS ap",
      "percentile_cont(0.5) WITHIN GROUP (ORDER BY x) AS ep").head()
    val (ap, ep) = (r.getLong(0), r.getDouble(1))
    // rank of ap must be within 1/accuracy of 0.5
    val rank = df.where(col("x") <= ap).count().toDouble / 100001
    assert(math.abs(rank - 0.5) < 0.01, s"ap=$ap rank=$rank exact=$ep")
  }
}
