package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling: rates hit within tolerance, absent
  * strata kept whole, and the selection is a pure function of the id (same
  * rows on every run — the retry-stability contract). */
class SamplingSpec extends SparkSpec {

  test("stratifiedSample: per-stratum rates, unlisted strata kept, stable") {
    import spark.implicits._
    val df = (0L until 10000L).map(i =>
      (i, if (i % 2 == 0) "a" else "b")).toDF("id", "s")
    val rates = Map("a" -> 0.3)
    val s1 = Sampling.stratifiedSample(df, "s", "id", rates)
    val s2 = Sampling.stratifiedSample(df, "s", "id", rates)
    // Deterministic: identical id sets across independent evaluations.
    val ids1 = s1.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = s2.select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // Stratum b (unlisted) kept whole; stratum a near 30%.
    val counts = s1.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("b") == 5000L)
    assert(math.abs(counts("a") - 1500L) < 150L, s"a=${counts("a")}")
  }

  test("mixtureResample: floor+Bernoulli replication, absent strata kept once, deterministic") {
    import spark.implicits._
    val df = (0L until 6000L).map(i =>
      (i, Seq("a", "b", "c")(((i % 3L)).toInt))).toDF("id", "s")
    val weights = Map("a" -> 0.25, "b" -> 2.5, "c" -> 0.0)
    val out = Sampling.mixtureResample(df, "s", "id", weights).cache()
    try {
      // Per-row law: n copies = floor(w) + [hashPpm(id) < frac(w)*1e6],
      // copy_id contiguous from 0 — replayed with the same hash column.
      val perRow = out.groupBy("id", "s")
        .agg(count(lit(1)).as("n"), min("copy_id").as("mn"),
          max("copy_id").as("mx"))
      val expected = df.withColumn("_ppm", Sampling.hashPpm(col("id")))
        .withColumn("_n",
          when(col("s") === "a", when(col("_ppm") < 250000L, 1L).otherwise(0L))
          .when(col("s") === "b", lit(2L) +
            when(col("_ppm") < 500000L, 1L).otherwise(0L))
          .otherwise(lit(0L)))
        .where(col("_n") > 0)
      val bad = perRow.join(expected, Seq("id"), "full")
        .where(col("n") =!= col("_n") || col("mn") =!= 0 ||
          col("mx") =!= col("n") - 1)
      assert(bad.isEmpty, "replication count or copy_id range wrong")
      // Stratum c (w=0) vanishes entirely; unlisted strata would keep 1.
      assert(out.where(col("s") === "c").isEmpty)
      val unl = Sampling.mixtureResample(df, "s", "id", Map("a" -> 3.0))
        .where(col("s") === "b")
      assert(unl.count() == 2000L &&
        unl.agg(max("copy_id")).head().getLong(0) == 0L)
      // Expected-share law: stratum a ~0.25x of 2000, b ~2.5x of 2000.
      val counts = out.groupBy("s").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(math.abs(counts("a") - 500L) < 100L, s"a=${counts("a")}")
      assert(math.abs(counts("b") - 5000L) < 150L, s"b=${counts("b")}")
      // Deterministic across evaluations.
      val again = Sampling.mixtureResample(df, "s", "id", weights)
      assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    } finally { out.unpersist(); () }
  }

  test("topKPerStratum: best-k by score, salted phase is exact, mega-stratum bounded") {
    import spark.implicits._
    // One mega-stratum (100k rows) and one tiny; scores collide heavily so
    // the id tiebreak matters.
    val df = ((0L until 100000L).map(i => (i, "mega", i % 997L)) ++
      (200000L until 200007L).map(i => (i, "tiny", i))).toDF("id", "s", "score")
    val out = Sampling.topKPerStratum(df, "s", "id", k = 25,
      ord = Seq(col("score").desc), fanout = 16)
    val got = out.collect().map(r => (r.getString(1), r.getLong(0))).toSeq
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    // Driver oracle: global sort by (score desc, id asc) per stratum.
    val expMega = (0L until 100000L).map(i => (i, i % 997L))
      .sortBy { case (id, sc) => (-sc, id) }.take(25).map(_._1).toSet
    assert(got("mega") == expMega)
    assert(got("tiny") == (200000L until 200007L).toSet) // short stratum whole
    // Layout-invariant: same winners from a different physical layout.
    val again = Sampling.topKPerStratum(df.repartition(31), "s", "id", k = 25,
        ord = Seq(col("score").desc), fanout = 16)
      .where(col("s") === "mega").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(again == expMega)
  }

  test("leakageSafeSplit: cluster-coherent splits, band fractions, pure function of pairs") {
    import spark.implicits._
    // 3000 docs, pair graph chains ids into 3-doc clusters (0-1-2, 3-4-5 …)
    // via transitivity only (0-1 and 1-2, never 0-2).
    val docs = (0L until 3000L).toDF("doc_id")
    val pairs = (0L until 3000L by 3).flatMap(i =>
      Seq((i, i + 1), (i + 1, i + 2))).toDF("doc_a", "doc_b")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", pairs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).cache()
    try {
      assert(out.count() == 3000)
      // Every cluster maps to exactly one split — the leakage guard.
      val mixed = out.groupBy("cluster_id")
        .agg(countDistinct("split").as("d")).where(col("d") > 1)
      assert(mixed.isEmpty, "a cluster spans splits")
      // Chained clusters resolved: cluster_id is the min member.
      val badC = out.where(col("cluster_id") =!= col("doc_id") - pmod(col("doc_id"), lit(3L)))
      assert(badC.isEmpty, "transitive cluster assignment wrong")
      // Band shares near 80/10/10 over 1000 clusters.
      val byCluster = out.select("cluster_id", "split").distinct()
        .groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(math.abs(byCluster("train") - 800L) < 80L, s"$byCluster")
      assert(math.abs(byCluster.getOrElse("val", 0L) - 100L) < 40L, s"$byCluster")
      assert(math.abs(byCluster.getOrElse("test", 0L) - 100L) < 40L, s"$byCluster")
      // Stable: identical assignment on re-evaluation with scrambled layout.
      val again = Sampling.leakageSafeSplit(docs.repartition(17), "doc_id",
        pairs.repartition(13), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    } finally { out.unpersist(); () }
  }

  test("exactKPerStratum: exact counts, short strata whole, partition-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = ((0L until 1000L).map(i => (i, "big")) ++
      (1000L until 1005L).map(i => (i, "tiny"))).toDF("id", "s")
    val out = Sampling.exactKPerStratum(df, "s", "id", 50)
    val counts = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("big" -> 50L, "tiny" -> 5L))
    // Same winners regardless of the input's physical layout.
    val a = out.select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.exactKPerStratum(df.repartition(13), "s", "id", 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("keepTopFraction: exact ceil(pN) cutoff, id ties, 0/1 edges, layout-invariant") {
    import spark.implicits._
    // Scores 500 down to 1 over ids 1..500; id ties on a constant-score
    // block exercise the tiebreak.
    val df = (1L to 500L).map(i => (i, if (i <= 10) 1000L else 500L - i))
      .toDF("id", "score")
    // p=0.1, N=500: IEEE ceil(0.1*500)=51; exact arithmetic keeps 50.
    val top = Sampling.keepTopFraction(df, "id", "score", 0.1)
    assert(top.count() == 50L)
    // The 10 score-100 rows rank 1..10 by id asc; ranks are 1..50 total.
    val got = top.orderBy("rank").collect()
    assert(got.take(10).map(_.getLong(0)).toSeq == (1L to 10L))
    assert(got.map(_.getLong(2)).toSeq == (1L to 50L))
    assert(Sampling.keepTopFraction(df, "id", "score", 0.0).count() == 0L)
    assert(Sampling.keepTopFraction(df, "id", "score", 1.0).count() == 500L)
    assert(Sampling.keepTopFraction(df.limit(0), "id", "score", 0.5)
      .count() == 0L)
    // Layout-invariant: identical kept set + ranks from a scrambled layout.
    val a = Sampling.keepTopFraction(df, "id", "score", 0.37)
    val b = Sampling.keepTopFraction(df.repartition(13), "id", "score", 0.37)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("prioritySample: top-k by exact integer priority, tau/w-hat law, short input, layout-invariant") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, i % 50L + 1L)).toDF("id", "w")
    val k = 100
    val out = Sampling.prioritySample(df, "id", "w", k).cache()
    try {
      assert(out.count() == k.toLong)
      // Replay the same integer law through the collected hash column and
      // rank driver-side — checks the salted two-phase windows against a
      // single-machine sort.
      val pri = df.withColumn("_u", Sampling.hashPpm(col("id")) + lit(1L))
        .select(col("id"), col("w"), (col("w") * 1000000L).as("_wu"),
          expr("(w * 1000000L) div _u").as("_pri"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val sorted = pri.sortBy(t => (-t._4, t._1))
      val expIds = sorted.take(k).map(_._1).toSet
      val tau = sorted(k)._4 // 1000 > k+1 rows, so the threshold exists
      assert(out.select("id").collect().map(_.getLong(0)).toSet == expIds)
      val whatBad = out.where(col("w_hat") =!=
        greatest(col("w"), lit(tau))).count()
      assert(whatBad == 0L, s"w_hat law violated for $whatBad rows (tau=$tau)")
      // Unbiasedness sanity (single realization, loose): the estimator sum
      // should land near the true total weight.
      val totalW = pri.map(_._2).sum
      val estW = out.agg(sum("w_hat")).head().getLong(0)
      assert(math.abs(estW - totalW).toDouble / totalW < 0.25,
        s"est=$estW true=$totalW")
      // Layout invariance.
      val again = Sampling.prioritySample(df.repartition(17), "id", "w", k)
      assert(again.select("id").collect().map(_.getLong(0)).toSet == expIds)
    } finally out.unpersist()
    // Corpus smaller than the sample: everything kept, tau = 0,
    // w_hat = exact weight.
    val small = (0L until 20L).map(i => (i, 7L)).toDF("id", "w")
    val allKept = Sampling.prioritySample(small, "id", "w", k)
    assert(allKept.count() == 20L)
    assert(allKept.where(col("w_hat") =!= 7L).count() == 0L)
  }

  test("temperatureSample: alpha=1 is uniform, alpha=0.5 flattens, rates replayable, layout-invariant") {
    import spark.implicits._
    val df = ((0L until 3200L).map(i => (i, "big")) ++
      (3200L until 3400L).map(i => (i, "small"))).toDF("id", "s")
    // alpha = 1: every stratum keeps ~targetFraction (ppm within 1 of
    // 300000 — the only rounding is the final ppm snap).
    val u = Sampling.temperatureSample(df, "s", "id", 0.3, alpha = 1.0)
    val uRates = u.select("s", "rate_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uRates.values.forall(v => math.abs(v - 300000L) <= 1L), uRates.toString)
    // alpha = 0.5: the small stratum keeps a HIGHER rate than the big one
    // (flattening), and the overall kept share still lands near target.
    val t = Sampling.temperatureSample(df, "s", "id", 0.3).cache()
    try {
      val rates = t.select("s", "rate_ppm").distinct().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rates("small") > rates("big"), rates.toString)
      val kept = t.count().toDouble / 3400.0
      assert(kept > 0.2 && kept < 0.4, s"kept=$kept")
      // Deterministic + layout-invariant.
      val again = Sampling.temperatureSample(df.repartition(13), "s", "id", 0.3)
      assert(t.select("id").exceptAll(again.select("id")).isEmpty)
      assert(again.select("id").exceptAll(t.select("id")).isEmpty)
    } finally t.unpersist()
    // rate cap: a tiny stratum whose flattened share exceeds its size
    // clips at 1e6 ppm (kept whole), never above.
    val skew = ((0L until 5000L).map(i => (i, "big")) ++
      (5000L until 5005L).map(i => (i, "tiny"))).toDF("id", "s")
    val c = Sampling.temperatureSample(skew, "s", "id", 0.5)
    val tinyRate = c.where(col("s") === "tiny")
      .select("rate_ppm").distinct().collect()
    assert(tinyRate.forall(_.getLong(0) <= 1000000L))
  }

  test("epochPlan: hand-computed targets, epoch cap + shortfall, " +
      "zero-token guard, outer-join audit covers both one-sided cases") {
    import spark.implicits._
    val rows = Seq(
      ("A", 60L), ("A", 40L),          // available 100
      ("B", 1000L),                    // available 1000
      ("C", 0L),                       // zero tokens: epochs guard
      ("D", 50L)                       // corpus source with NO weight row
    ).toDF("source", "n_tok")
    val weights = Seq(("A", 500000L), ("B", 10000L), ("C", 300000L),
      ("E", 100000L))                  // weight row with NO corpus rows
      .toDF("source", "weight_ppm")
    val got = Sampling.epochPlan(rows, "source", "n_tok", weights,
        budget = 1000L, maxEpochsPpm = 2000000L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      // A: target 500, cap 200 -> planned 200, exactly 2.0 epochs, short 300
      ("A", 100L, 500000L, 500L, 200L, 2000000L, 300L),
      // B: target 10 << cap 2000 -> planned 10 at 0.01 epochs
      ("B", 1000L, 10000L, 10L, 10L, 10000L, 0L),
      // C: nothing available -> epochs 0 by guard, all target is shortfall
      ("C", 0L, 300000L, 300L, 0L, 0L, 300L),
      // D: unweighted corpus source stays VISIBLE with zero allocation
      ("D", 50L, 0L, 0L, 0L, 0L, 0L),
      // E: weighted but absent from the corpus — full target is shortfall
      ("E", 0L, 100000L, 100L, 0L, 0L, 100L)))
  }

  test("mixtureWeights: driver-replayed softmax, tau flattens, ppm sums " +
      "within floor bias") {
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val stats = Seq(("web", 2.0), ("code", 1.0), ("books", 0.5))
      .toDF("src", "score")
    val got = Sampling.mixtureWeights(stats, "src", "score", tau = 1.0)
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getLong(3)))
    // max-shifted replay: exp((score − 2.0)/τ) ∈ (0, 1], exact micro
    // units, integral-division ppm
    val e = Map("web" -> r6(math.exp(0.0)), "code" -> r6(math.exp(-1.0)),
      "books" -> r6(math.exp(-1.5)))
    val eu = e.view.mapValues(v => math.floor(v * 1e6 + 0.5).toLong).toMap
    val tot = eu.values.sum
    def ppm(k: String) = eu(k) * 1000000L / tot
    assert(got.toSeq == Seq(
      ("books", e("books"), ppm("books")), ("code", e("code"), ppm("code")),
      ("web", e("web"), ppm("web"))))
    val sum = got.map(_._3).sum
    assert(sum <= 1000000L && sum >= 1000000L - 3)
    // higher tau → flatter mixture (the DoReMi aggressiveness knob)
    val flat = Sampling.mixtureWeights(stats, "src", "score", tau = 100.0)
      .collect().map(_.getLong(3))
    assert(flat.max - flat.min < got.map(_._3).max - got.map(_._3).min)
  }

  test("diverseTopK: per-stratum cap + global budget, capped-out rows " +
      "ineligible, deterministic ranks") {
    import spark.implicits._
    val df = Seq(
      ("A", 1L, 100L), ("A", 2L, 99L), ("A", 3L, 98L), ("A", 4L, 97L),
      ("B", 11L, 50L), ("B", 12L, 49L),
      ("C", 21L, 10L)).toDF("src", "id", "score")
    val got = Sampling.diverseTopK(df, "src", "id", k = 4, perStratum = 2,
        ord = Seq(col("score").desc))
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getInt(4)))
    // A's 98/97 are capped out even though they beat everything in B;
    // C's 10 loses the global budget.
    assert(got.toSeq == Seq(
      ("A", 1L, 100L, 1, 1), ("A", 2L, 99L, 2, 2),
      ("B", 11L, 50L, 1, 3), ("B", 12L, 49L, 2, 4)))
  }

  test("diverseTopK: equals the naive two-window reference on seeded " +
      "random data, any fanout") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val big = (1L to 500L)
      .map(i => (s"s${rnd.nextInt(8)}", i, rnd.nextInt(40).toLong))
      .toDF("src", "id", "score")
    val ws = Window.partitionBy(col("src"))
      .orderBy(col("score").desc, col("id").asc)
    val naive = big
      .withColumn("stratum_rank", row_number().over(ws).cast("int"))
      .where(col("stratum_rank") <= 5)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("id").asc)).cast("int"))
      .where(col("rank") <= 37)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getInt(4))).toSet
    for (fanout <- Seq(1, 3, 64)) {
      val got = Sampling.diverseTopK(big, "src", "id", k = 37,
          perStratum = 5, ord = Seq(col("score").desc), fanout = fanout)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getInt(3), r.getInt(4))).toSet
      assert(got == naive, s"fanout=$fanout diverged")
    }
  }
}
