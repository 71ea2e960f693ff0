package graft

import org.apache.spark.sql.functions._

/** Proof that engine plans compose with Spark's runtime row-level filtering
  * (InjectRuntimeFilter): on a shuffle join where one side carries a
  * selective predicate, the optimizer builds a bloom filter from the
  * selective side and applies it to the big side's scan — at 100 TB this
  * kills most fact rows BEFORE the shuffle instead of after it. The size
  * thresholds are production-tuned (10 GB application side), so the spec
  * lowers them to fire on fixture-sized data; the plan shape is what's
  * being asserted. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim predicate injects a bloom filter into the fact-side scan") {
    val c = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> c.getOption(k)).toMap
    try {
      // Defeat broadcast (runtime filters target shuffle joins — a
      // broadcast join already has the dim rows at the scan) and let the
      // filter fire on fixture-sized inputs.
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .where(col("o_orderstatus") === "F" && col("o_totalprice") > 150000.0)
      val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      assert(j.collect().nonEmpty)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter in plan:\n${plan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }
}
