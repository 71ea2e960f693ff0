package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic mergeable sketches — the pre-aggregation family for
  * 100 TB cardinality/frequency/quantile work. Spark's built-in
  * DataSketches aggregates (hll_sketch_agg / approx_percentile, spec'd in
  * SketchSpec) already cover the approximate path; these variants trade a
  * few bytes of register width for full DETERMINISM: every register /
  * counter / bin is an integer derived from an md5-60 hash (the engine's
  * oracle-replayable hash, Dedup.md5Hash60), so a DuckDB oracle replays
  * the sketch bit-for-bit and the driver's hash-compare gate applies to
  * the sketch family too.
  *
  * Scale contract (all three sketches):
  *  - the BUILD is one map-side-combinable groupBy whose output is bounded
  *    by the sketch size (m registers / d*w counters / `bins` bins), never
  *    by the data — per-shard sketches are tiny parquet rows;
  *  - MERGE is an associative per-cell aggregate (max / sum / sum), so
  *    per-day or per-shard sketches combine into the global answer without
  *    revisiting data — the property exact distinct/percentile lacks;
  *  - the ESTIMATE reads only the merged sketch (driver-sized).
  *
  * HyperLogLog estimation follows Flajolet et al. 2007 (the alpha_m bias
  * constant and the V>0 linear-counting small-range correction). The
  * harmonic sum is computed in FIXED POINT — Σ 2^(B+1-r) as a BIGINT, one
  * trailing double division — because a float Σ 2^-r is addition-order
  * dependent and Spark's partial aggregates must not be able to disagree
  * with the single-threaded oracle by an ulp. */
object Sketches {

  // ── HyperLogLog ──────────────────────────────────────────────────────

  /** Per-group HLL registers over md5-60(value): one row per non-empty
    * bucket, `(keyCols*, bucket INT, r INT)`. p register-index bits ⇒
    * m = 2^p buckets, B = 60 - p rank bits; r ∈ [1, B+1]. One shuffle,
    * map-side combined to ≤ m rows per group. */
  def hllRegisters(df: DataFrame, keyCols: Seq[String], valueCol: String,
                   p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val bBits = 60 - p
    val h = Dedup.md5Hash60(col(valueCol).cast("string"))
    val grouped = df.where(col(valueCol).isNotNull)
      .select(keyCols.map(col) :+ h.as("_h"): _*)
      .select(keyCols.map(col) ++ Seq(
        (col("_h") % m).cast("int").as("bucket"),
        shiftright(col("_h"), p).as("_w")): _*)
      .withColumn("_rho",
        when(col("_w") === 0, lit(bBits + 1))
          .otherwise(lit(bBits + 1) - length(bin(col("_w")))).cast("int"))
      .groupBy(keyCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("_rho")).as("r"))
    grouped
  }

  /** Merge two register tables (same p): per-(key, bucket) max — the HLL
    * union. Registers from disjoint shards merge to exactly the registers
    * of the union (spec-pinned law). */
  def hllMergeRegisters(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keyCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("r")).as("r"))

  /** Cardinality estimate per key from a register table:
    * `(keyCols*, est BIGINT)`. Fixed-point harmonic sum (exact BIGINT),
    * then the raw estimate C/s as round-half-up of the EXACT RATIONAL
    * via one integral division — (2C + s) div (2s) in DECIMAL(38,0),
    * with C = [[hllAlphaNumerator]] (an exact integer: its double ulp
    * is 2^(16+p−8) > 1, so αm²·2^(B+1) carries no fraction). The branch
    * test raw ≤ 2.5m likewise compares C ≤ 2.5m·s in exact integers.
    * `round(<double ratio of exact inputs>)` is the q171 r15/r16
    * cross-engine divergence class (converted here in r18); only the
    * small-range linear-counting branch keeps a double round — it is
    * transcendental (ln), where boundary hits are measure-zero per the
    * Round6 contract. Bit-identical across engines and partitionings. */
  def hllEstimate(regs: DataFrame, keyCols: Seq[String], p: Int = 8): DataFrame = {
    val m = 1 << p
    val bBits = 60 - p
    // alpha_m * m^2, scaled by 2^(B+1) to undo the fixed-point scaling of
    // the harmonic sum below. Computed once here; oracles embed the same
    // exact integer (hllAlphaNumerator).
    val twoC = hllAlphaNumerator(p) * 2
    val agg = regs.groupBy(keyCols.map(col): _*)
      .agg(
        // Σ 2^((B+1) - r): every term a power of two ≤ 2^B — an exact
        // BIGINT sum (≤ m·2^(B+1) < 2^62 for p ≥ 4), associative, safe
        // under partial aggregation.
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${bBits + 1} - r)")).as("_s_ne"),
        count(lit(1)).as("_nb"))
      .withColumn("_v", lit(m) - col("_nb"))
      .withColumn("_s",
        col("_s_ne") + col("_v") * lit(1L << (bBits + 1)))
    // raw ≤ 2.5m ⟺ C ≤ 2.5m·s ⟺ 2C ≤ 5m·s, all exact integers
    val smallRange = col("_v") > 0 &&
      expr(s"cast('$twoC' as decimal(38,0)) <= ${5L * m} * cast(_s as decimal(38,0))")
    val est = when(smallRange,
        round(lit(m.toDouble) * log(lit(m.toDouble) / col("_v").cast("double")))
          .cast("long"))
      .otherwise(expr(
        s"""cast((cast('$twoC' as decimal(38,0)) + _s)
           |  div (2 * cast(_s as decimal(38,0))) as bigint)""".stripMargin))
    agg.select(keyCols.map(col) :+ est.as("est"): _*)
  }

  /** Build + estimate in one call. */
  def hllDistinct(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  p: Int = 8): DataFrame =
    hllEstimate(hllRegisters(df, keyCols, valueCol, p), keyCols, p)

  /** Distinct-INTERSECTION estimate over two HLL register tables by
    * inclusion–exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), floored at
    * 0 — the cross-corpus overlap triage ("how many users/urls/doc-hashes
    * do these two crawls share") over sketches that are already built and
    * mergeable, no re-scan of either side. Honest caveat in the contract:
    * HLL unions are exact over sketches, but the subtraction AMPLIFIES
    * relative error when the true intersection is small versus the union
    * (the reason theta sketches exist) — treat small estimates as "below
    * sketch resolution", not as counts; exact joins or minhash signatures
    * are the precision tier. All three estimates reuse [[hllEstimate]]'s
    * deterministic fixed-point arithmetic, so the output is engine- and
    * layout-exact. Output: key cols + (est_a, est_b, est_union,
    * est_intersect), all BIGINT. */
  def hllIntersectEstimate(a: DataFrame, b: DataFrame, keyCols: Seq[String],
                           p: Int = 8): DataFrame = {
    val ea = hllEstimate(a, keyCols, p).withColumnRenamed("est", "est_a")
    val eb = hllEstimate(b, keyCols, p).withColumnRenamed("est", "est_b")
    val eu = hllEstimate(hllMergeRegisters(a, b, keyCols), keyCols, p)
      .withColumnRenamed("est", "est_union")
    val joined =
      if (keyCols.isEmpty)
        ea.crossJoin(broadcast(eb)).crossJoin(broadcast(eu))
      else ea.join(eb, keyCols).join(eu, keyCols)
    joined.withColumn("est_intersect",
      greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")))
  }

  /** alpha_m · m² · 2^(B+1) — the numerator of the raw HLL estimate over
    * the fixed-point harmonic sum, as the EXACT integer value of the
    * double αm²·2^(61−p): for p ≥ 4 the product exceeds 2^(60+p/…)
    * with ulp > 1, so the double is integral and `toBigIntegerExact`
    * cannot throw. Public so oracle SQL embeds the identical integer
    * literal (HUGEINT-ranged). */
  def hllAlphaNumerator(p: Int): BigInt = {
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val c = alpha * m * m * math.pow(2.0, 61 - p) // 2^(B+1) with B = 60 - p
    BigInt(new java.math.BigDecimal(c).toBigIntegerExact)
  }

  // ── KMV (k-minimum-values) ───────────────────────────────────────────
  //
  // The PRECISION tier for sketched set operations that
  // [[hllIntersectEstimate]]'s contract points at: a KMV sketch (Beyer
  // et al. 2007, "On synopses for distinct value estimation under
  // multiset operations") keeps the k smallest distinct md5-60 hashes of
  // a set. Union is "merge and re-take the k smallest" (EXACT over
  // sketches — spec-pinned law), and the intersection estimate
  // K∩/|L| · est(∪) has bounded relative error in the JACCARD, not in
  // the tiny inclusion–exclusion residual HLL suffers on. Bonus law:
  // any set with < k distinct values is captured WHOLE, so estimates
  // (incl. the intersection) degrade to exact counts below sketch size.

  /** KMV sketch per key: the `k` smallest DISTINCT md5-60 hashes of
    * `valueCol`, `(keyCols*, h BIGINT)`, ≤ k rows per key. Build is one
    * map-side-combined distinct on (key, hash) — the shuffle carries 8
    * bytes per per-partition-distinct value — then the salted two-phase
    * bottom-k (the [[Sampling.topKPerStratum]] pattern): no single task
    * ever sorts a whole key's distinct-hash set, only its 1/`fanout`
    * salt slice, and the final window ranks ≤ k·fanout survivors. */
  def kmvSketch(df: DataFrame, keyCols: Seq[String], valueCol: String,
                k: Int = 256, fanout: Int = 64): DataFrame = {
    val h = Dedup.md5Hash60(col(valueCol).cast("string"))
    val dis = df.where(col(valueCol).isNotNull)
      .select(keyCols.map(col) :+ h.as("h"): _*)
      .distinct()
    kmvBottomK(dis, keyCols, k, fanout)
  }

  /** Merge two KMV sketches (same k): distinct-union of the hash rows,
    * then the k smallest again — exactly the sketch of the UNION of the
    * underlying sets (every union hash small enough to make the cut is
    * present in one of the inputs). */
  def kmvMergeSketches(a: DataFrame, b: DataFrame, keyCols: Seq[String],
                       k: Int = 256, fanout: Int = 64): DataFrame =
    kmvBottomK(a.unionByName(b).distinct(), keyCols, k, fanout)

  private def kmvBottomK(dis: DataFrame, keyCols: Seq[String], k: Int,
                         fanout: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(fanout > 0, "fanout must be positive")
    import org.apache.spark.sql.expressions.Window
    val local = Window
      .partitionBy(keyCols.map(col) :+ pmod(col("h"), lit(fanout.toLong)): _*)
      .orderBy(col("h").asc)
    val global = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("h").asc)
    dis.withColumn("_lrk", row_number().over(local))
      .where(col("_lrk") <= k)
      .withColumn("_rk", row_number().over(global))
      .where(col("_rk") <= k)
      .drop("_lrk", "_rk")
  }

  /** Cardinality estimate per key from a KMV sketch: `(keyCols*, est
    * BIGINT)`. Sketch smaller than k ⇒ the set IS the sketch ⇒ exact
    * count; else the Beyer et al. unbiased estimator (k−1)/h₍k₎ on hashes
    * normalized to [0,1) — here round-half-up of the exact rational
    * (k−1)·2⁶⁰ / h₍k₎ via ONE integral division, (2C + h₍k₎) div
    * (2·h₍k₎) with C = [[kmvNumerator]] an exact integer (trunc ≡ floor
    * on the non-negative operands; div ≡ DuckDB `//`). Never
    * `round(<double ratio>)`: C/h₍k₎ is a small-denominator rational
    * that can sit within a half-ulp of a rounding boundary where two
    * engines' round() legitimately disagrees — the q171 r15/r16
    * divergence class, converted here in r18. 2C exceeds BIGINT for
    * k > 8, so the division runs in DECIMAL(38,0) (HUGEINT oracle-side). */
  def kmvEstimate(sketch: DataFrame, keyCols: Seq[String],
                  k: Int = 256): DataFrame = {
    val twoC = kmvNumerator(k) * 2
    val agg = sketch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_n"), max(col("h")).as("_hk"))
    agg.select(keyCols.map(col) :+
      when(col("_n") < k || col("_hk") === 0, col("_n"))
        .otherwise(expr(
          s"""cast((cast('$twoC' as decimal(38,0)) + _hk)
             |  div (2 * cast(_hk as decimal(38,0))) as bigint)"""
            .stripMargin))
        .as("est"): _*)
  }

  /** Distinct A / B / union / intersection estimates from two KMV
    * sketches — the precision tier of cross-corpus overlap triage.
    * Per the Beyer et al. multiset-operation scheme: L = the merged
    * (union) sketch, K∩ = |{h ∈ L : h ∈ A ∧ h ∈ B}|, Jaccard ≈ K∩/|L|,
    * and |A∩B| ≈ K∩/|L| · est(∪). Everything up to the final published
    * ratios is exact integers (two left-semi joins against L + one
    * count); `jaccard_ppm` is floored integer division (engine-exact)
    * and `est_intersect` round-half-up of the exact rational
    * K∩·est(∪)/|L| via one integral division. Below sketch size all
    * four estimates are EXACT counts (the sketches hold the full sets).
    * Output: key cols + (est_a, est_b, est_union, k_inter, jaccard_ppm,
    * est_intersect), all BIGINT. */
  def kmvIntersectEstimate(a: DataFrame, b: DataFrame, keyCols: Seq[String],
                           k: Int = 256, fanout: Int = 64): DataFrame = {
    val ea = kmvEstimate(a, keyCols, k).withColumnRenamed("est", "est_a")
    val eb = kmvEstimate(b, keyCols, k).withColumnRenamed("est", "est_b")
    val lu = kmvMergeSketches(a, b, keyCols, k, fanout)
    val eu = kmvEstimate(lu, keyCols, k).withColumnRenamed("est", "est_union")
    val joinCols = keyCols :+ "h"
    val inBoth = lu.join(a, joinCols, "left_semi").join(b, joinCols, "left_semi")
    val stats = lu.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("_nu"))
      .join(inBoth.groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("k_inter")),
        keyCols, "left")
      .na.fill(0L, Seq("k_inter"))
    val joined =
      if (keyCols.isEmpty)
        ea.crossJoin(broadcast(eb)).crossJoin(broadcast(eu))
          .crossJoin(broadcast(stats))
      else ea.join(eb, keyCols).join(eu, keyCols).join(stats, keyCols)
    joined
      .withColumn("jaccard_ppm",
        when(col("_nu") > 0,
          expr("CAST(k_inter * CAST(1000000 AS BIGINT) div _nu AS BIGINT)"))
          .otherwise(lit(0L)))
      .withColumn("est_intersect",
        // round-half-up of the exact rational k_inter·est_union/nu as ONE
        // integral division — (2·num + den) div (2·den); trunc ≡ floor on
        // the non-negative operands. Never `round(<double ratio>)`: the
        // three inputs are exact integers, so the quotient is a small-
        // denominator rational that can sit within a half-ulp of a
        // rounding boundary where two engines' round() legitimately
        // disagree (the q171 r15/r16 divergence class).
        when(col("_nu") > 0,
          expr("""cast((2 * cast(k_inter as decimal(38,0)) * est_union + _nu)
                 |  div (2 * cast(_nu as decimal(38,0))) as bigint)"""
            .stripMargin))
          .otherwise(lit(0L)))
      .drop("_nu")
  }

  /** Set-DIFFERENCE estimates from two KMV sketches — |A\B| and |B\A| at
    * sketch cost (r20; crawl-vs-crawl novelty triage: "how much of crawl
    * A is NOT already in crawl B" without touching either corpus). Same
    * Beyer et al. multiset scheme as [[kmvIntersectEstimate]], with the
    * membership split inverted: L = the merged (union) sketch, K_{A\B} =
    * |{h ∈ L : h ∈ A ∧ h ∉ B}|, and |A\B| ≈ K_{A\B}/|L| · est(∪) — the
    * difference fraction measured directly on the union sketch's uniform
    * sample, NOT est(A) − est(∩) (whose two independent errors amplify
    * exactly when the difference is small, the same failure mode
    * [[hllIntersectEstimate]]'s inclusion–exclusion caveat documents for
    * intersections). Everything up to the published counts is exact
    * integers (a left-semi + left-anti join against L per direction);
    * `est_diff_*` publishes round-half-up of the exact rational
    * K·est(∪)/|L| via one integral division ((2·num + den) div (2·den);
    * trunc ≡ floor on non-negative operands, div ≡ DuckDB `//`) — never
    * `round(<double ratio>)`, the q171 divergence class. Below sketch
    * size every estimate is EXACT (the sketches hold the full sets —
    * spec-pinned degradation law, including merge-then-diff ≡
    * build-on-union). Output: key cols + (est_a, est_b, est_union,
    * k_diff_ab, k_diff_ba, est_diff_ab, est_diff_ba), all BIGINT. */
  def kmvDifferenceEstimate(a: DataFrame, b: DataFrame, keyCols: Seq[String],
                            k: Int = 256, fanout: Int = 64): DataFrame = {
    val ea = kmvEstimate(a, keyCols, k).withColumnRenamed("est", "est_a")
    val eb = kmvEstimate(b, keyCols, k).withColumnRenamed("est", "est_b")
    val lu = kmvMergeSketches(a, b, keyCols, k, fanout)
    val eu = kmvEstimate(lu, keyCols, k).withColumnRenamed("est", "est_union")
    val joinCols = keyCols :+ "h"
    val abOnly = lu.join(a, joinCols, "left_semi").join(b, joinCols, "left_anti")
    val baOnly = lu.join(b, joinCols, "left_semi").join(a, joinCols, "left_anti")
    val stats = lu.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("_nu"))
      .join(abOnly.groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("k_diff_ab")),
        keyCols, "left")
      .join(baOnly.groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("k_diff_ba")),
        keyCols, "left")
      .na.fill(0L, Seq("k_diff_ab", "k_diff_ba"))
    val joined =
      if (keyCols.isEmpty)
        ea.crossJoin(broadcast(eb)).crossJoin(broadcast(eu))
          .crossJoin(broadcast(stats))
      else ea.join(eb, keyCols).join(eu, keyCols).join(stats, keyCols)
    def estDiff(kc: String) =
      when(col("_nu") > 0,
        expr(s"""cast((2 * cast($kc as decimal(38,0)) * est_union + _nu)
                |  div (2 * cast(_nu as decimal(38,0))) as bigint)"""
          .stripMargin))
        .otherwise(lit(0L))
    joined
      .withColumn("est_diff_ab", estDiff("k_diff_ab"))
      .withColumn("est_diff_ba", estDiff("k_diff_ba"))
      .drop("_nu")
  }

  /** (k−1)·2⁶⁰ — the KMV estimator numerator, an exact integer. Public
    * so oracle SQL embeds the identical constant as an integer literal
    * (HUGEINT-ranged for k > 8). */
  def kmvNumerator(k: Int): BigInt = BigInt(k - 1) << 60

  // ── Count-Min ────────────────────────────────────────────────────────

  /** Count-Min sketch of a value column: `(i INT, cell INT, cnt BIGINT)`,
    * d rows of w counters, hash_i(x) = md5-60(i ':' x) mod w. The build
    * explodes each row d ways but the groupBy combines map-side to
    * ≤ d·w rows per partition — the shuffle carries the SKETCH, not the
    * data. Merge = per-cell sum (cmsMerge). */
  def cmsSketch(df: DataFrame, valueCol: String, depth: Int = 4,
                width: Int = 512): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape d=$depth w=$width")
    df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string").as("_v"))
      .select(col("_v"),
        explode(array((0 until depth).map(lit): _*)).as("i"))
      .select(col("i"), cmsCell(col("i"), col("_v"), width).as("cell"))
      .groupBy(col("i"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two CMS tables of the same (d, w) shape: per-cell sum. */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("i"), col("cell")).agg(sum(col("cnt")).as("cnt"))

  /** Point-estimate counts for a set of items: `(item, est BIGINT)`,
    * est = min over the d rows (never under the true count). The sketch
    * (d·w rows) is broadcast; the probe side stays distributed. */
  def cmsEstimate(cms: DataFrame, items: DataFrame, itemCol: String,
                  depth: Int = 4, width: Int = 512): DataFrame = {
    val probe = items.where(col(itemCol).isNotNull)
      .select(col(itemCol).as("item"))
      .distinct()
      .select(col("item"),
        explode(array((0 until depth).map(lit): _*)).as("i"))
      .select(col("item"), col("i"),
        cmsCell(col("i"), col("item").cast("string"), width).as("cell"))
    probe.join(broadcast(cms), Seq("i", "cell"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** hash_i(x) = md5-60(i ':' x) mod w — oracle-replayable row hashes. */
  private def cmsCell(i: Column, v: Column, width: Int): Column =
    (Dedup.md5Hash60(concat(i.cast("string"), lit(":"), v)) % width).cast("int")

  // ── Mergeable fixed-bin histogram + quantile estimate ────────────────

  /** Fixed-bin histogram of a numeric column over [lo, hi), optionally
    * PER GROUP: `(keyCols*, bin INT, cnt BIGINT)`, non-empty bins only;
    * out-of-range values clamp to the edge bins. Map-side combinable to
    * ≤ groups × bins rows. */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                bins: Int, keyCols: Seq[String] = Nil): DataFrame = {
    require(hi > lo && bins >= 1, s"bad histogram [$lo,$hi)/$bins")
    val w = (hi - lo) / bins
    // NaN would make floor() NaN and the ANSI long cast throw mid-job;
    // drop NaN with the nulls (a NaN measurement has no bin). The clamp
    // happens in DOUBLE space BEFORE the cast: +/-Infinity and huge
    // finite values must clamp to the edge bins as documented, not blow
    // up the ANSI double->long cast.
    df.where(col(valueCol).isNotNull &&
        !isnan(col(valueCol).cast("double")))
      .select(keyCols.map(col) :+ least(greatest(
          floor((col(valueCol).cast("double") - lo) / w),
          lit(0.0)), lit((bins - 1).toDouble)).cast("int").as("bin"): _*)
      .groupBy((keyCols :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two histograms of the same shape: per-(key, bin) sum. */
  def histMerge(a: DataFrame, b: DataFrame,
                keyCols: Seq[String] = Nil): DataFrame =
    a.unionByName(b).groupBy((keyCols :+ "bin").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** [[histogram]] with the bounds derived IN-PLAN — the first-pass
    * profiling case where nobody knows the range yet. One extra aggregate
    * computes exact per-group (global when `keyCols` is empty) min/max,
    * broadcast back onto the scan (the ZOrder stats-row pattern: a
    * driver-free crossJoin/equi-join of one tiny stats table), then the
    * same clamp-free binning as [[histogram]] — every value lands inside
    * [lo, hi] by construction. Output rows CARRY their bounds
    * (`keyCols*, lo DOUBLE, hi DOUBLE, bin INT, cnt BIGINT`) so the
    * sketch is self-describing: [[histQuantilesAuto]] reads them instead
    * of trusting the caller to repeat the right constants. A constant
    * group (hi == lo) degenerates to the single bin 0.
    *
    * Determinism: min/max are exact, the bin expression is a fixed IEEE
    * double formula — bit-identical across engines/partitionings (q119).
    * Merging shards: derived bounds are a function of the DATA, so
    * per-shard autos don't align; the composition law is
    * `histogramAuto(a ∪ b) = histMerge(histogram(a, lo, hi),
    * histogram(b, lo, hi))` at the union's bounds (spec-pinned) — derive
    * bounds once over the union (cheap: the stats agg is mergeable
    * min/max), then the fixed-bounds mergeable machinery applies. */
  def histogramAuto(df: DataFrame, valueCol: String, bins: Int,
                    keyCols: Seq[String] = Nil): DataFrame = {
    require(bins >= 1, s"bad histogramAuto bins=$bins")
    // NaN and ±Infinity have no bin (an infinite bound would NaN the bin
    // arithmetic and, under ANSI, throw mid-job) — drop them with the nulls.
    val vals = df.where(col(valueCol).isNotNull &&
        !isnan(col(valueCol).cast("double")) &&
        abs(col(valueCol).cast("double")) =!= lit(Double.PositiveInfinity))
      .select(keyCols.map(col) :+ col(valueCol).cast("double").as("_v"): _*)
    val stats = vals.groupBy(keyCols.map(col): _*)
      .agg(min(col("_v")).as("lo"), max(col("_v")).as("hi"))
    val joined =
      if (keyCols.isEmpty) vals.crossJoin(broadcast(stats))
      else vals.join(broadcast(stats), keyCols)
    val w = (col("hi") - col("lo")) / bins
    val bin = when(col("hi") === col("lo"), lit(0))
      .otherwise(least(
        floor((col("_v") - col("lo")) / w),
        lit((bins - 1).toDouble)).cast("int"))
    joined
      .select(keyCols.map(col) ++
        Seq(col("lo"), col("hi"), bin.as("bin")): _*)
      .groupBy((keyCols ++ Seq("lo", "hi", "bin")).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a SELF-DESCRIBING histogram
    * ([[histogramAuto]] output — rows carry lo/hi): the same containing-
    * bin linear interpolation as [[histQuantiles]], bounds read from the
    * rows and the bin COUNT derived from them too — the build's maximum
    * value always lands in the last bin, so bins = max(bin) + 1 per
    * group (degenerate hi == lo groups answer `lo` for every probe and
    * never consult it). No caller-repeated constant can silently skew
    * the estimates. `(keyCols*, q DOUBLE, est_u BIGINT)` — the estimate
    * publishes as half-up micro-units via floor on the shared binary
    * double ([[histQuantiles]]'s microHalfUp contract; r18 — round(·, 6)
    * of this rational chain was the q171 divergence class). */
  def histQuantilesAuto(hist: DataFrame, qs: Seq[Double],
                        keyCols: Seq[String] = Nil): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0), s"bad qs $qs")
    val spark = hist.sparkSession
    import spark.implicits._
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ck = keyCols.indices.map(i => s"_ck$i")
    val cum = hist.select(
      keyCols.zip(ck).map { case (k, a) => col(k).as(a) } ++
        Seq(col("lo"), col("hi"), col("bin"), col("cnt"),
          sum(col("cnt")).over(win).as("cum")): _*)
    val n = hist.groupBy(keyCols.map(col): _*)
      .agg(sum(col("cnt")).as("n"),
        (max(col("bin")) + 1).cast("double").as("_bins"))
    val probes = qs.toDF("q")
    val interval = (col("cum") - col("cnt")).cast("double") < col("t") &&
      col("t") <= col("cum").cast("double")
    val joinCond = keyCols.zip(ck)
      .map { case (k, a) => col(k) === col(a) }
      .foldLeft(interval)(_ && _)
    val w = (col("hi") - col("lo")) / col("_bins")
    probes.crossJoin(broadcast(n))
      .withColumn("t", col("q") * col("n").cast("double"))
      .join(broadcast(cum), joinCond)
      .select(keyCols.map(col) ++ Seq(col("q"),
        microHalfUp(when(col("hi") === col("lo"), col("lo"))
          .otherwise(col("lo") + w *
            (col("bin") +
              (col("t") - (col("cum") - col("cnt")).cast("double")) /
                col("cnt").cast("double"))))): _*)
  }

  /** The portable micro-unit publication for a SHARED double chain:
    * HALF-UP rounding of the micro value, implemented as
    * `floor(x·10⁶ + 0.5)` cast BIGINT (NOT a plain floor of x·10⁶ —
    * re-implement from the formula, never the name). floor operates on
    * the binary double in every engine, so two engines that computed the
    * identical IEEE chain publish the identical integer (whereas
    * `round(x, 6)` rounds Spark's shortest-decimal representation but
    * DuckDB's binary value, and the two legitimately disagree within a
    * half-ulp of a 0.5e-6 boundary — the q171 r15/r16 divergence class;
    * the quantile interpolation is a rational of exact counts, which CAN
    * land there). Callers' values must stay ≲ 9.2e12 so the published
    * micro value fits the BIGINT cast — that is the binding bound, NOT
    * integer-exactness of x·10⁶ in a double (which would cap out near
    * 9e9 ≈ 2⁵³/10⁶ and is not required: both engines floor the SAME
    * IEEE double, exact or not). Note the semantics on negatives:
    * floor(x·10⁶ + 0.5) rounds half toward +∞ (−2.5 µ → −2), which
    * differs from BigDecimal HALF_UP (away from zero) at exact .5 µ
    * boundaries — portable regardless, since both engines apply the
    * identical floor formula. A histogram over larger magnitudes should
    * rescale first. */
  private def microHalfUp(x: Column): Column =
    floor(x * lit(1e6) + lit(0.5)).cast("long").as("est_u")

  /** Quantile estimates from a (merged, possibly per-group) histogram by
    * linear interpolation inside the containing bin:
    * `(keyCols*, q DOUBLE, est_u BIGINT)` — the estimate publishes as
    * half-up micro-units via floor on the shared binary double
    * ([[microHalfUp]]; r18 — round(·, 6) of this rational-of-exact-
    * counts chain was the q171 divergence class), one row per group ×
    * probe. The histogram is sketch-sized, so the cumulative window runs
    * over ≤ bins rows per group (partitioned on the keys — groups never
    * serialize onto one task); estimates are within one bin width of the
    * exact group quantile. */
  def histQuantiles(hist: DataFrame, qs: Seq[Double], lo: Double, hi: Double,
                    bins: Int, keyCols: Seq[String] = Nil): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0), s"bad qs $qs")
    val w = (hi - lo) / bins
    val spark = hist.sparkSession
    import spark.implicits._
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // cum carries its keys under collision-proof names so the probe join
    // below can equate them without ambiguous references.
    val ck = keyCols.indices.map(i => s"_ck$i")
    val cum = hist.select(
      keyCols.zip(ck).map { case (k, a) => col(k).as(a) } ++
        Seq(col("bin"), col("cnt"), sum(col("cnt")).over(win).as("cum")): _*)
    val n = hist.groupBy(keyCols.map(col): _*).agg(sum(col("cnt")).as("n"))
    val probes = qs.toDF("q")
    // (cum - cnt, cum] intervals tile (0, n] per group; t = q·n lands in
    // exactly one.
    val interval = (col("cum") - col("cnt")).cast("double") < col("t") &&
      col("t") <= col("cum").cast("double")
    val joinCond = keyCols.zip(ck)
      .map { case (k, a) => col(k) === col(a) }
      .foldLeft(interval)(_ && _)
    probes.crossJoin(broadcast(n))
      .withColumn("t", col("q") * col("n").cast("double"))
      .join(broadcast(cum), joinCond)
      .select(keyCols.map(col) ++ Seq(col("q"),
        microHalfUp(lit(lo) + lit(w) *
            (col("bin") +
              (col("t") - (col("cum") - col("cnt")).cast("double")) /
                col("cnt").cast("double")))): _*)
  }
}
