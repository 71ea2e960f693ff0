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

  // ── deterministic (oracle-replayable) sketches: graft.ops.Sketches ──
  // DataSketches aggregates above are approximate and engine-private; the
  // md5-60-derived variants below trade bytes for bit-determinism, so an
  // external engine can replay the sketch (q100-q102's DuckDB oracles do).
  // NOTE on the HLL small-range branch: its one transcendental,
  // m·ln(m/v), was checked EXHAUSTIVELY for m ∈ {256, 4096} and every
  // v ∈ [1, m): java.lang.Math.log and DuckDB's ln disagree in the last
  // ulp for 5 of 4350 inputs, but round() to integer units agrees on ALL
  // of them — the oracle contract holds for any data, not just the tested
  // tables.

  private def detDf = spark.range(0, 60000, 1, 8).selectExpr(
    "CAST(id % 3000 AS STRING) AS v",
    "CAST(id % 4 AS INT) AS shard",
    "CAST(id % 2 AS STRING) AS grp")

  test("deterministic HLL: bounded error, shard-merge law, layout invariance") {
    import graft.ops.Sketches
    // id%2 and id%3000 split v into 1500 even / 1500 odd residues per group
    val exact = 1500.0
    val est = Sketches.hllDistinct(detDf, Seq("grp"), "v", p = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size == 2)
    est.values.foreach(e =>
      assert(math.abs(e - exact) / exact < 0.20, s"est $e vs exact $exact"))
    // Merge law: per-shard register tables union (per-register max) to
    // EXACTLY the whole-data register table — same rows, same estimate.
    val whole = Sketches.hllRegisters(detDf, Seq("grp"), "v", p = 8)
    val merged = (0 until 4).map(k =>
        Sketches.hllRegisters(detDf.where(col("shard") === k),
          Seq("grp"), "v", p = 8))
      .reduce(Sketches.hllMergeRegisters(_, _, Seq("grp")))
    assert(merged.collect().toSet == whole.collect().toSet)
    val mergedEst = Sketches.hllEstimate(merged, Seq("grp"), p = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mergedEst == est)
    // Determinism: partitioning must not move the estimate by one unit.
    val est1 = Sketches.hllDistinct(detDf.repartition(13), Seq("grp"), "v",
      p = 8).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est1 == est)
  }

  test("deterministic HLL: small-range linear-counting branch within bound") {
    import graft.ops.Sketches
    // 90 distinct values <<< m=256 -> v > 0 and raw <= 2.5m: the
    // linear-counting correction must engage and stay within ~12%.
    val small = spark.range(0, 9000, 1, 4)
      .selectExpr("CAST(id % 90 AS STRING) AS v", "'g' AS grp")
    val est = Sketches.hllDistinct(small, Seq("grp"), "v", p = 8)
      .head().getLong(1)
    assert(math.abs(est - 90.0) / 90.0 < 0.12, s"linear-counting est $est")
  }

  test("deterministic CMS: never undercounts, bounded overcount, merge law") {
    import graft.ops.Sketches
    import spark.implicits._
    // Zipf-ish: value k appears ~60000/(k+1) times for k in 0..99.
    val df = spark.range(0, 60000, 1, 8).selectExpr(
      "CAST(CAST(floor(60000.0 / (id + 1.0)) AS BIGINT) % 100 AS STRING) AS v",
      "CAST(id % 4 AS INT) AS shard")
    val exact = df.groupBy("v").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cms = Sketches.cmsSketch(df, "v", depth = 4, width = 512)
    val probes = exact.keys.toSeq.toDF("item")
    val est = Sketches.cmsEstimate(cms, probes, "item", depth = 4, width = 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS undercounted $k: ${est(k)} < $n")
      assert(est(k) <= n + (0.05 * 60000).toLong,
        s"CMS overcount on $k: ${est(k)} vs $n")
    }
    // Merge law: per-shard sketches sum per-cell to the whole-data sketch.
    val merged = (0 until 4).map(k =>
        Sketches.cmsSketch(df.where(col("shard") === k), "v",
          depth = 4, width = 512))
      .reduce(Sketches.cmsMerge)
    assert(merged.collect().toSet ==
      Sketches.cmsSketch(df, "v", depth = 4, width = 512).collect().toSet)
  }

  test("deterministic histogram: merge law; quantiles within one bin width") {
    import graft.ops.Sketches
    // x = id^2 / 60000 over [0, 60000): skewed so bins fill unevenly.
    val df = spark.range(0, 60000, 1, 8).selectExpr(
      "CAST(id AS DOUBLE) * CAST(id AS DOUBLE) / 60000.0 AS x",
      "CAST(id % 4 AS INT) AS shard")
    val (lo, hi, bins) = (0.0, 60000.0, 200)
    val w = (hi - lo) / bins
    val hist = Sketches.histogram(df, "x", lo, hi, bins)
    val qs = Seq(0.25, 0.5, 0.9)
    val est = Sketches.histQuantiles(hist, qs, lo, hi, bins)
      .collect().map(r => r.getDouble(0) -> r.getLong(1) / 1e6).toMap
    val xs = df.select("x").collect().map(_.getDouble(0)).sorted
    qs.foreach { q =>
      val exact = xs((q * xs.length).toInt min (xs.length - 1))
      assert(math.abs(est(q) - exact) <= w,
        s"q=$q est=${est(q)} exact=$exact binWidth=$w")
    }
    val merged = (0 until 4).map(k =>
        Sketches.histogram(df.where(col("shard") === k), "x", lo, hi, bins))
      .reduce(Sketches.histMerge(_, _))
    assert(merged.collect().toSet == hist.collect().toSet)
  }

  test("grouped histogram: per-group merge law and per-group quantile bound") {
    import graft.ops.Sketches
    // two groups with different distributions: g=0 uniform, g=1 squared
    val df = spark.range(0, 40000, 1, 8).selectExpr(
      "CAST(id % 2 AS STRING) AS g",
      "CASE WHEN id % 2 = 0 THEN CAST(id AS DOUBLE) / 2.0 " +
        "ELSE CAST(id AS DOUBLE) * CAST(id AS DOUBLE) / 40000.0 END AS x",
      "CAST(id % 4 AS INT) AS shard")
    val (lo, hi, bins) = (0.0, 40000.0, 100)
    val w = (hi - lo) / bins
    val hist = Sketches.histogram(df, "x", lo, hi, bins, keyCols = Seq("g"))
    // merge law with keys
    val merged = (0 until 4).map(k =>
        Sketches.histogram(df.where(col("shard") === k), "x", lo, hi, bins,
          keyCols = Seq("g")))
      .reduce(Sketches.histMerge(_, _, keyCols = Seq("g")))
    assert(merged.collect().toSet == hist.collect().toSet)
    // per-group quantiles within one bin width of the group's exact value
    val est = Sketches.histQuantiles(hist, Seq(0.5, 0.9), lo, hi, bins,
        keyCols = Seq("g"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getLong(2) / 1e6)
      .toMap
    for (g <- Seq("0", "1"); q <- Seq(0.5, 0.9)) {
      val xs = df.where(col("g") === g).select("x")
        .collect().map(_.getDouble(0)).sorted
      val exact = xs((q * xs.length).toInt min (xs.length - 1))
      assert(math.abs(est((g, q)) - exact) <= w,
        s"g=$g q=$q est=${est((g, q))} exact=$exact")
    }
    // group q90s must differ (uniform ~18000, squared ~32400 — the
    // medians coincide by construction: (0.5*40000)^2/40000 = 10000)
    assert(math.abs(est(("0", 0.9)) - est(("1", 0.9))) > 10 * w)
  }

  test("histogramAuto: derived bounds are exact min/max; composition law; junk dropped") {
    import graft.ops.Sketches
    // unknown-range data: values in [-137.5, 862.41) per group, plus junk
    val df = spark.range(0, 30000, 1, 8).selectExpr(
      "CAST(id % 2 AS STRING) AS g",
      "CAST(id AS DOUBLE) / 30.0 - 137.5 + CAST(id % 2 AS DOUBLE) * 0.41 AS x",
      "CAST(id % 4 AS INT) AS shard")
    val bins = 128
    val hist = Sketches.histogramAuto(df, "x", bins, keyCols = Seq("g"))
    // every row of one group carries the group's exact min/max
    val stats = df.groupBy("g").agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    hist.select("g", "lo", "hi").distinct().collect().foreach { r =>
      assert((r.getDouble(1), r.getDouble(2)) == stats(r.getString(0)))
    }
    // composition law: auto over the union == fixed-bounds shard
    // histograms merged at the union's derived bounds (checked ungrouped —
    // per-group bounds differ by construction)
    val g = df.agg(min(col("x")), max(col("x"))).head()
    val (glo, ghi) = (g.getDouble(0), g.getDouble(1))
    val autoAll = Sketches.histogramAuto(df, "x", bins)
      .select("bin", "cnt").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val mergedAll = (0 until 4).map(k =>
        Sketches.histogram(df.where(col("shard") === k), "x", glo, ghi, bins))
      .reduce(Sketches.histMerge(_, _))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(autoAll == mergedAll)
    // junk: null, NaN, infinities binless; finite data untouched
    import spark.implicits._
    val junk = Seq(Some(1.0), Some(5.0), None, Some(Double.NaN),
      Some(Double.PositiveInfinity), Some(Double.NegativeInfinity))
      .toDF("x")
    val jh = Sketches.histogramAuto(junk, "x", 4).collect()
    assert(jh.map(_.getLong(3)).sum == 2L)
    assert(jh.forall(r => r.getDouble(0) == 1.0 && r.getDouble(1) == 5.0))
  }

  test("histQuantilesAuto: within one derived bin width; constant group answers the constant") {
    import graft.ops.Sketches
    import spark.implicits._
    val df = spark.range(0, 20000, 1, 8).selectExpr(
      "CAST(id AS DOUBLE) * CAST(id AS DOUBLE) / 20000.0 - 250.0 AS x")
    val bins = 256
    val hist = Sketches.histogramAuto(df, "x", bins)
    val qs = Seq(0.25, 0.5, 0.9)
    val est = Sketches.histQuantilesAuto(hist, qs)
      .collect().map(r => r.getDouble(0) -> r.getLong(1) / 1e6).toMap
    val xs = df.select("x").collect().map(_.getDouble(0)).sorted
    val w = (xs.last - xs.head) / bins
    qs.foreach { q =>
      val exact = xs((q * xs.length).toInt min (xs.length - 1))
      assert(math.abs(est(q) - exact) <= w,
        s"q=$q est=${est(q)} exact=$exact binWidth=$w")
    }
    // constant group: hi == lo degenerates to bin 0 and answers lo exactly
    val const = Seq(("a", 42.5), ("a", 42.5), ("a", 42.5), ("b", 1.0),
      ("b", 2.0)).toDF("g", "x")
    val ch = Sketches.histogramAuto(const, "x", 8, keyCols = Seq("g"))
    assert(ch.where(col("g") === "a").collect()
      .forall(r => r.getInt(3) == 0 && r.getLong(4) == 3L))
    val cq = Sketches.histQuantilesAuto(ch, Seq(0.5, 0.99),
        keyCols = Seq("g"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getLong(2) / 1e6)
      .toMap
    assert(cq(("a", 0.5)) == 42.5 && cq(("a", 0.99)) == 42.5)
    assert(cq(("b", 0.99)) > 1.0)
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

  test("hllIntersectEstimate: identity, overlap accuracy, disjoint floor, " +
      "keyed variant") {
    import spark.implicits._
    import graft.ops.Sketches
    def regs(lo: Int, hi: Int) = Sketches.hllRegisters(
      (lo until hi).map(i => s"v$i").toDF("v"), Seq.empty, "v", p = 10)
    val a = regs(0, 1000)
    // identity: A ∩ A = A exactly (union of A with itself is A)
    val self = Sketches.hllIntersectEstimate(a, regs(0, 1000), Seq.empty,
      p = 10).head()
    assert(self.getLong(3) == self.getLong(0) &&
      self.getLong(0) == self.getLong(2))
    // overlap: |A∩B| = 500 true; p=10 (~3.25% per estimate) → generous 20%
    val mid = Sketches.hllIntersectEstimate(a, regs(500, 1500), Seq.empty,
      p = 10).head()
    assert(math.abs(mid.getLong(3) - 500L) < 100L, mid.toString)
    // disjoint: floored at 0, small vs the union
    val dis = Sketches.hllIntersectEstimate(a, regs(5000, 6000), Seq.empty,
      p = 10).head()
    assert(dis.getLong(3) >= 0L && dis.getLong(3) < 200L, dis.toString)
    // keyed variant joins per key
    def kregs(k: String, lo: Int, hi: Int) = Sketches.hllRegisters(
      (lo until hi).map(i => (k, s"v$i")).toDF("k", "v"), Seq("k"), "v",
      p = 10)
    val ka = kregs("x", 0, 400).unionByName(kregs("y", 0, 100))
    val kb = kregs("x", 200, 600).unionByName(kregs("y", 0, 100))
    val keyed = Sketches.hllIntersectEstimate(ka, kb, Seq("k"), p = 10)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(4)))
    assert(math.abs(keyed(0)._2 - 200L) < 60L, keyed.mkString(","))
    assert(math.abs(keyed(1)._2 - 100L) < 30L, keyed.mkString(","))
  }

  test("kmvSketch: merge law, below-k exactness, estimation accuracy, " +
      "keyed intersection") {
    import spark.implicits._
    import graft.ops.Sketches
    def data(lo: Int, hi: Int) = (lo until hi).map(i => s"v$i").toDF("v")
    // merge law: sketch(A ∪ B) == merge(sketch A, sketch B), exact set equality
    val sa = Sketches.kmvSketch(data(0, 3000), Seq.empty, "v", k = 128)
    val sb = Sketches.kmvSketch(data(2000, 5000), Seq.empty, "v", k = 128)
    val direct = Sketches.kmvSketch(data(0, 5000), Seq.empty, "v", k = 128)
    val merged = Sketches.kmvMergeSketches(sa, sb, Seq.empty, k = 128)
    assert(direct.count() == 128 && merged.count() == 128)
    assert(direct.except(merged).isEmpty && merged.except(direct).isEmpty)
    // below sketch size: ALL FOUR estimates exact (sets captured whole)
    val ea = Sketches.kmvSketch(data(0, 100), Seq.empty, "v", k = 256)
    val eb = Sketches.kmvSketch(data(60, 160), Seq.empty, "v", k = 256)
    val ex = Sketches.kmvIntersectEstimate(ea, eb, Seq.empty, k = 256).head()
    assert(ex.getLong(0) == 100L && ex.getLong(1) == 100L &&
      ex.getLong(2) == 160L && ex.getLong(3) == 40L, ex.toString)
    assert(ex.getLong(4) == 40L * 1000000L / 160L &&
      ex.getLong(5) == 40L, ex.toString)
    // estimation regime: |A|=|B|=3000, |A∩B|=1000; k=128 (~9% per est) —
    // generous 35% bands on counts, 50% on the Jaccard-derived intersect
    val est = Sketches.kmvIntersectEstimate(
      Sketches.kmvSketch(data(0, 3000), Seq.empty, "v", k = 128),
      Sketches.kmvSketch(data(2000, 5000), Seq.empty, "v", k = 128),
      Seq.empty, k = 128).head()
    assert(math.abs(est.getLong(0) - 3000L) < 1050L, est.toString)
    assert(math.abs(est.getLong(2) - 5000L) < 1750L, est.toString)
    assert(math.abs(est.getLong(5) - 1000L) < 500L, est.toString)
    // keyed variant: per-key join, disjoint key floors at 0
    def kdata(k: String, lo: Int, hi: Int) =
      (lo until hi).map(i => (k, s"v$i")).toDF("g", "v")
    val ka = Sketches.kmvSketch(
      kdata("x", 0, 100).unionByName(kdata("y", 0, 50)), Seq("g"), "v", k = 256)
    val kb = Sketches.kmvSketch(
      kdata("x", 50, 150).unionByName(kdata("y", 100, 150)), Seq("g"), "v", k = 256)
    val keyed = Sketches.kmvIntersectEstimate(ka, kb, Seq("g"), k = 256)
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(6)))
    assert(keyed.toSeq == Seq(("x", 50L), ("y", 0L)), keyed.mkString(","))
  }

  test("kmvDifferenceEstimate: below-k exactness both directions, " +
      "merge-then-diff == build-on-union law, estimation accuracy, " +
      "identity and disjoint edges, keyed variant") {
    import spark.implicits._
    import graft.ops.Sketches
    def data(lo: Int, hi: Int) = (lo until hi).map(i => s"v$i").toDF("v")
    // below sketch size: sketches hold the full sets, so |A\B| and |B\A|
    // are exact in BOTH the membership counts and the published estimates
    val ea = Sketches.kmvSketch(data(0, 100), Seq.empty, "v", k = 256)
    val eb = Sketches.kmvSketch(data(60, 160), Seq.empty, "v", k = 256)
    val ex = Sketches.kmvDifferenceEstimate(ea, eb, Seq.empty, k = 256).head()
    // (est_a, est_b, est_union, k_diff_ab, k_diff_ba, est_diff_ab, est_diff_ba)
    assert(ex.getLong(0) == 100L && ex.getLong(1) == 100L &&
      ex.getLong(2) == 160L, ex.toString)
    assert(ex.getLong(3) == 60L && ex.getLong(4) == 60L, ex.toString)
    assert(ex.getLong(5) == 60L && ex.getLong(6) == 60L, ex.toString)
    // merge law carries through the difference: the op over merged
    // sketches equals the op over sketches built from the union directly
    // (kmvMergeSketches IS the union sketch — exact set equality above) —
    // so diff estimates computed after a shard merge are the same numbers
    // a monolithic build would publish.
    val sa = Sketches.kmvSketch(data(0, 3000), Seq.empty, "v", k = 128)
    val s1 = Sketches.kmvSketch(data(0, 1500), Seq.empty, "v", k = 128)
    val s2 = Sketches.kmvSketch(data(1500, 3000), Seq.empty, "v", k = 128)
    val sb = Sketches.kmvSketch(data(2000, 5000), Seq.empty, "v", k = 128)
    val viaMerge = Sketches.kmvDifferenceEstimate(
      Sketches.kmvMergeSketches(s1, s2, Seq.empty, k = 128), sb,
      Seq.empty, k = 128).head()
    val direct = Sketches.kmvDifferenceEstimate(sa, sb, Seq.empty, k = 128)
      .head()
    assert(viaMerge.toSeq == direct.toSeq,
      s"merge-then-diff $viaMerge != direct $direct")
    // estimation regime: |A\B|=2000, |B\A|=2000 of a 5000 union at k=128
    // (~9% relative error per estimate) — generous 40% bands
    assert(math.abs(direct.getLong(5) - 2000L) < 800L, direct.toString)
    assert(math.abs(direct.getLong(6) - 2000L) < 800L, direct.toString)
    // identity: A\A is empty (count AND estimate); disjoint: A\B == A
    val self = Sketches.kmvDifferenceEstimate(sa, sa, Seq.empty, k = 128)
      .head()
    assert(self.getLong(3) == 0L && self.getLong(5) == 0L, self.toString)
    val dj = Sketches.kmvDifferenceEstimate(
      Sketches.kmvSketch(data(0, 80), Seq.empty, "v", k = 256),
      Sketches.kmvSketch(data(5000, 5040), Seq.empty, "v", k = 256),
      Seq.empty, k = 256).head()
    assert(dj.getLong(5) == 80L && dj.getLong(6) == 40L, dj.toString)
    // keyed variant: per-key membership split, never cross-key
    def kdata(k: String, lo: Int, hi: Int) =
      (lo until hi).map(i => (k, s"v$i")).toDF("g", "v")
    val ka = Sketches.kmvSketch(
      kdata("x", 0, 100).unionByName(kdata("y", 0, 50)), Seq("g"), "v", k = 256)
    val kb = Sketches.kmvSketch(
      kdata("x", 50, 150).unionByName(kdata("y", 100, 150)), Seq("g"), "v", k = 256)
    val keyed = Sketches.kmvDifferenceEstimate(ka, kb, Seq("g"), k = 256)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(6), r.getLong(7)))
    assert(keyed.toSeq == Seq(("x", 50L, 50L), ("y", 50L, 50L)),
      keyed.mkString(","))
  }
}
