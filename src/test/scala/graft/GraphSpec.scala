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

  // ── triangle counting ──────────────────────────────────────────────────

  /** Brute-force per-node triangle counts over the canonicalized graph. */
  private def refTriangles(edges: Seq[(String, String)]): Map[String, Long] = {
    val und = edges.collect { case (a, b) if a != b =>
      (Seq(a, b).min, Seq(a, b).max)
    }.distinct
    val nodes = (und.map(_._1) ++ und.map(_._2)).distinct.sorted
    val es = und.toSet
    def conn(x: String, y: String) =
      es.contains((Seq(x, y).min, Seq(x, y).max))
    val tris = for {
      i <- nodes.indices
      j <- i + 1 until nodes.size
      k <- j + 1 until nodes.size
      if conn(nodes(i), nodes(j)) && conn(nodes(i), nodes(k)) &&
        conn(nodes(j), nodes(k))
    } yield Seq(nodes(i), nodes(j), nodes(k))
    val cnt = tris.flatten.groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
    nodes.map(n => n -> cnt.getOrElse(n, 0L)).toMap
  }

  private def runTriangles(edges: Seq[(String, String)],
                           parts: Int = 3): Map[String, Long] = {
    import spark.implicits._
    val df = edges.toDF("a", "b").repartition(parts)
    Graph.triangleCounts(df, "a", "b")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("triangleCounts: K4, path, and messy input canonicalization") {
    // K4: every node sits on 3 of the 4 triangles.
    val k4 = for {
      a <- Seq("p", "q", "r", "s"); b <- Seq("p", "q", "r", "s")
      if a < b
    } yield (a, b)
    assert(runTriangles(k4) == Map("p" -> 3L, "q" -> 3L, "r" -> 3L, "s" -> 3L))
    // Path graph: no triangles, but every node present with count 0.
    assert(runTriangles(Seq(("a", "b"), ("b", "c"), ("c", "d"))) ==
      Map("a" -> 0L, "b" -> 0L, "c" -> 0L, "d" -> 0L))
    // Self-loops dropped, duplicates and reversed duplicates collapse:
    // still exactly the one (x,y,z) triangle.
    val messy = Seq(("x", "y"), ("y", "x"), ("x", "x"), ("y", "z"),
      ("z", "y"), ("x", "z"), ("x", "y"))
    assert(runTriangles(messy) == Map("x" -> 1L, "y" -> 1L, "z" -> 1L))
  }

  test("triangleCounts: matches brute force on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val nodes = (0 until 28).map(i => s"n$i")
    val edges = for {
      i <- nodes.indices; j <- i + 1 until nodes.size
      if rnd.nextDouble() < 0.25
    } yield (nodes(i), nodes(j))
    // feed the op a messy multiset: both directions + duplicates
    val messy = edges ++ edges.map(_.swap) ++ edges.take(30)
    val expected = refTriangles(edges)
    assert(runTriangles(messy, parts = 5) == expected)
    assert(runTriangles(messy, parts = 1) == expected,
      "layout must not change counts")
  }

  test("triangleCounts: hub node — orientation keeps the hub wedge-free") {
    // Star hub h--l0..l59 plus one triangle (h, l0, l1): the hub's high
    // degree orients all its edges inward, so wedges centered at h are
    // impossible; the triangle is still found from its lowest-order corner.
    val star = (0 until 60).map(i => ("h", s"l$i"))
    val r = runTriangles(star :+ ("l0", "l1"))
    assert(r("h") == 1L && r("l0") == 1L && r("l1") == 1L)
    assert(r("l59") == 0L && r.size == 61)
  }
}
