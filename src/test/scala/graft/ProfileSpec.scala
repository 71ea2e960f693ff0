package graft

import graft.ops.Profile

/** One-pass exact column profiling. */
class ProfileSpec extends SparkSpec {

  test("profile: null/distinct/min/max per column in one aggregation") {
    import spark.implicits._
    val df = Seq(
      (Some(3L), "b"), (Some(1L), "a"), (None, "a"), (Some(3L), "c")
    ).toDF("x", "s")
    val rows = Profile.profile(df, Seq("x", "s")).orderBy("col_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSeq
    assert(rows == Seq(
      ("s", 4L, 0L, 3L, "a", "c"),
      ("x", 3L, 1L, 2L, "1", "3")))
    // One scan: the plan has exactly one FileScan/LocalTableScan leaf.
    val plan = Profile.profile(df, Seq("x", "s")).queryExecution.executedPlan
    assert(plan.collectLeaves().size == 1, plan.toString.take(300))
  }

  test("vocabularyGrowth: first-occurrence bucketing, running total, " +
      "empty docs contribute nothing") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b"), (1L, "b c"),      // bucket 0: 4 tokens, new {a,b,c}
      (60L, "c d e"),                // bucket 1: 3 tokens, new {d,e}
      (130L, "   "))                 // whitespace only: no tokens at all
      .toDF("doc_id", "text")
    val got = Profile.vocabularyGrowth(docs, "doc_id", "text",
        bucketSize = 50L)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 4L, 3L, 3L), (1L, 3L, 2L, 5L)))
  }
}
