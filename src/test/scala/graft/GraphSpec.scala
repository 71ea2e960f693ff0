package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Fixed-point PageRank: matches an independent plain-Scala reimplementation
  * of the integer recurrence on hand graphs, conserves mass up to floor
  * loss, handles dangling sinks, and is layout-invariant (the determinism
  * contract the integer arithmetic exists to provide). */
class GraphSpec extends SparkSpec {

  private val Scale = 1000000000000L

  /** Independent driver-side reimplementation of the documented
    * recurrence (defaults d = 85/100). */
  private def refRanks(edges: Seq[(String, String, Long)],
                       iters: Int): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toLong
    val wout = edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._3).sum }
    var r = nodes.map(_ -> Scale / n).toMap
    val base = (15L * Scale) / (100L * n)
    for (_ <- 1 to iters) {
      val d = nodes.filterNot(wout.contains).map(r).sum
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, w) => (r(s) * w) / wout(s) }.sum
      }
      r = nodes.map(v =>
        v -> (base + (85L * (in.getOrElse(v, 0L) + d / n)) / 100L)).toMap
    }
    r
  }

  private def runOp(edges: Seq[(String, String, Long)], iters: Int,
                    parts: Int = 1): Map[String, Long] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst", "w").repartition(parts)
    Graph.pageRankFixedPoint(df, "src", "dst", "w", iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("pageRankFixedPoint: matches the reference recurrence on a hand graph") {
    // A feeds B and C (weighted 2:1), B feeds C, C dangles.
    val edges = Seq(("A", "B", 2L), ("A", "C", 1L), ("B", "C", 1L))
    for (iters <- 0 to 4) {
      assert(runOp(edges, iters) == refRanks(edges, iters),
        s"mismatch at iters=$iters")
    }
    // C (fed by everyone) must outrank A (fed only by dangling spread).
    val r3 = runOp(edges, 3)
    assert(r3("C") > r3("B") && r3("B") > r3("A"))
  }

  test("pageRankFixedPoint: mass conserved up to floor loss; dangling sink handled") {
    val edges = Seq(("a", "b", 1L)) // b is a pure sink
    val r = runOp(edges, 3)
    assert(r.keySet == Set("a", "b"))
    assert(r == refRanks(Seq(("a", "b", 1L)), 3))
    // Each round floors at most a handful of units per node; total mass
    // stays within 10 units of scale on this 2-node graph.
    assert(math.abs(r.values.sum - Scale) <= 10L)
    assert(r("b") > r("a")) // the sink holds what it was fed
  }

  test("pageRankFixedPoint: layout-invariant and weight-sensitive") {
    val edges = (1L to 40L).flatMap(i =>
      Seq((s"u$i", s"h${i % 5}", i), (s"h${i % 5}", s"u${(i % 7) + 1}", 1L)))
    val one = runOp(edges, 3, parts = 1)
    val many = runOp(edges, 3, parts = 13)
    assert(one == many)
    assert(one == refRanks(edges, 3))
  }

  /** PPR reference: same recurrence with seed-restricted base/dangling. */
  private def refPpr(edges: Seq[(String, String, Long)], iters: Int,
                     seeds: Set[String]): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val nS = nodes.count(seeds).toLong
    val wout = edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._3).sum }
    var r = nodes.map(v => v -> (if (seeds(v)) Scale / nS else 0L)).toMap
    val base = (15L * Scale) / (100L * nS)
    for (_ <- 1 to iters) {
      val d = nodes.filterNot(wout.contains).map(r).sum
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, w) => (r(s) * w) / wout(s) }.sum
      }
      r = nodes.map(v => v ->
        ((if (seeds(v)) base else 0L) +
          (85L * (in.getOrElse(v, 0L) +
            (if (seeds(v)) d / nS else 0L))) / 100L)).toMap
    }
    r
  }

  test("personalizedPageRank: seed-restricted teleport matches reference; all-seeds reduces to uniform") {
    import spark.implicits._
    val edges = Seq(
      ("A", "X", 2L), ("A", "Y", 1L), ("B", "Y", 3L), ("B", "Z", 1L),
      ("X", "A", 1L)) // Y, Z dangle; A is both source and target
    val df = edges.toDF("src", "dst", "w")
    def run(pred: org.apache.spark.sql.Column): Map[String, Long] =
      graft.ops.Graph.personalizedPageRank(df, "src", "dst", "w", pred, 3)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Seeds = {A}: teleport mass flows only through A's out-edges.
    val seeded = run(col("node") === "A")
    assert(seeded == refPpr(edges, 3, Set("A")))
    // Z is reachable only from B, which holds no mass -> rank exactly 0.
    assert(seeded("Z") == 0L)
    assert(seeded("X") > 0L && seeded("A") > 0L)
    // seedPred true everywhere == the uniform variant, bit for bit.
    val uniform = graft.ops.Graph
      .pageRankFixedPoint(df, "src", "dst", "w", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(lit(true)) == uniform)
    // Empty seed set fails loudly instead of dividing by zero.
    val ex = intercept[IllegalArgumentException] { run(lit(false)) }
    assert(ex.getMessage.contains("seed predicate"))
  }

  test("pageRankFixedPoint: empty edges -> empty ranks; overflow guard trips") {
    import spark.implicits._
    val empty = Seq.empty[(String, String, Long)].toDF("src", "dst", "w")
    assert(Graph.pageRankFixedPoint(empty, "src", "dst", "w", 3).count() == 0L)
    val huge = Seq(("a", "b", Long.MaxValue / 1000L)).toDF("src", "dst", "w")
    val ex = intercept[Exception] {
      Graph.pageRankFixedPoint(huge, "src", "dst", "w", 1).collect()
    }
    assert(ex.getMessage.contains("pageRankFixedPoint") ||
      ex.getCause != null)
  }
}
