package graft

import graft.sources.Bucketed
import org.apache.spark.sql.functions._

/** Co-located join layout: same key, same bucket count on both tables ->
  * the join plans with NO Exchange (and, with sorted buckets, no Sort) —
  * the pre-shuffled 100 TB join pattern. */
class BucketedSpec extends SparkSpec {

  test("bucketed+sorted tables join with zero exchange and zero sort") {
    val d = "/root/testdata/sf0.001"
    // Clean both catalog entries AND any stale managed-table directories a
    // previously failed run left behind (saveAsTable refuses to reuse them).
    for (t <- Seq("b_lineitem", "b_orders")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.delete)
      }
    }
    val li = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = spark.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    Bucketed.writeBucketed(li, "b_lineitem", "l_orderkey", buckets = 8)
    Bucketed.writeBucketed(
      ord.withColumnRenamed("o_orderkey", "l_orderkey"),
      "b_orders", "l_orderkey", buckets = 8)
    // At this fixture scale both sides fit the broadcast threshold, which
    // would bypass the bucketed path entirely — disable it so the plan we
    // assert on is the big-big one bucketing exists for (at 100 TB neither
    // side broadcasts).
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // Since Spark 3.0 a bucketed scan only advertises its sortBy ordering
    // under this flag (and only when each bucket is one file — which
    // writeBucketed's repartition guarantees). Without it the merge join
    // re-sorts already-sorted buckets.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val joined = Bucketed.readBucketed(spark, "b_lineitem")
        .join(Bucketed.readBucketed(spark, "b_orders"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange"), s"co-bucketed join still shuffles:\n${plan.take(600)}")
      assert(!plan.contains("Sort "), s"sorted buckets still re-sort:\n${plan.take(600)}")
      // And it computes the same rows as the plain join.
      assert(joined.count() ==
        li.join(ord.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    }
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
  }
}
