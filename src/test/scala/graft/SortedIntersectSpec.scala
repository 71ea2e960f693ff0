package graft

import org.apache.spark.sql.functions._
import graft.plans.SortedLongIntersectCount

/** Codegen'd two-pointer sorted-array intersection count. */
class SortedIntersectSpec extends SparkSpec {

  test("matches size(array_intersect) on random sorted long sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map { _ =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
        SortedLongIntersectCount(col("a"), col("b")).as("merge"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("empty and disjoint inputs") {
    import spark.implicits._
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L), Seq(2L, 4L)),
      (Seq(5L), Seq(5L))).toDF("a", "b")
    val got = df.select(SortedLongIntersectCount(col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 0L, 1L))
  }

  test("runs inside whole-stage codegen over a real source") {
    val df = spark.range(1, 1000)
      .selectExpr("sequence(0L, id % 20) AS a", "sequence(5L, 24L) AS b")
    val out = df.select(SortedLongIntersectCount(col("a"), col("b")).as("c"))
    assert(out.queryExecution.executedPlan.toString.contains("*(1)"))
    // |[0..n] ∩ [5..24]| = max(0, min(n,24) - 5 + 1) with n = id % 20
    val got = out.collect().map(_.getLong(0))
    val expect = (1L until 1000L).map { id =>
      val n = id % 20; math.max(0, math.min(n, 24) - 5 + 1)
    }
    assert(got.toSeq == expect)
  }
}
