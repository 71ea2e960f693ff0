package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * streams the candidate corpus — one map-side pass over 100 TB, no shuffle
  * until the per-query top-k (a tiny aggregate). The SRP-LSH path buckets
  * both sides by hyperplane sign bits so only same-bucket pairs are scored.
  * All vector math is expression-level (`zip_with` + in-order `aggregate`
  * fold — deterministic summation order, unlike a float reduce). */
object Similarity {

  /** Dot product of two array<double> columns: a native codegen'd loop
    * with left-to-right accumulation — bit-identical to the interpreted
    * `aggregate(zip_with(...))` fold, but primitive (no boxed lambda per
    * element; this is the inner loop of every pair-scoring join). */
  def dot(a: Column, b: Column): Column = graft.plans.DoubleArrayDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity rounded to 6 dp (rounding makes the value robust to
    * last-ulp float-summation differences when compared across engines). */
  def cosine6(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Brute-force top-k cosine neighbors for each query vector.
    * `queries`/`corpus`: (id, vec array<double>). Self-matches excluded.
    * Output: (query_id, neighbor_id, sim, rank), rank 1..k, ties broken by
    * neighbor id. The query side is broadcast; corpus scan is map-only.
    * Norms are computed ONCE per row before the pair join (each is reused
    * across every pair that row participates in). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("_qv"),
      norm(col("vec")).as("_qn"))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("_cv"),
      norm(col("vec")).as("_cn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")), 6).as("sim"))
    topKByQuery(scored, "neighbor_id", k)
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) with cosine >=
    * threshold, exact. Norms precomputed per row; the pair join is the
    * exact path for modest corpora and for SAMPLED verification of the
    * SRP-bucketed scale path (which is approximate by construction). */
  def cosineNearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = vectors.select(col("id").as("id_a"), col("vec").as("_va"),
      norm(col("vec")).as("_na"))
    val b = vectors.select(col("id").as("id_b"), col("vec").as("_vb"),
      norm(col("vec")).as("_nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("_va"), col("_vb")) / (col("_na") * col("_nb")), 6).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** Signed-random-projection bucket id: sign bits of dot products with
    * `nPlanes` deterministic pseudo-random hyperplanes. Vectors in the same
    * bucket are cosine-close with high probability; at 100 TB this turns
    * all-pairs scoring into a per-bucket join. */
  /** The deterministic hyperplane set behind [[srpBucket]], exposed so an
    * external checker (e.g. a SQL oracle) can replay the exact same
    * bucketing: the planes are plan literals, not runtime randomness. */
  def srpPlanes(dim: Int, nPlanes: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  def srpBucket(vec: Column, dim: Int, nPlanes: Int): Column = {
    val planes = srpPlanes(dim, nPlanes)
    planes.zipWithIndex.map { case (p, i) =>
      val pl = lit(p.toArray)
      when(dot(vec, pl) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Embedding near-dup pairs through multi-table SRP-LSH — the 100 TB
    * path (the exact [[cosineNearDupPairs]] stays as the sampled verifier):
    * ONE set of `planesPerTable * tables` sign bits per vector, sliced into
    * `tables` bucket keys; a pair is a candidate when it collides in ANY
    * table (recall 1-(1-p^k)^L for per-plane agreement p — near-dups with
    * p→1 are caught with near-certainty), then candidates are verified with
    * the exact cosine. Banding rows carry only (id, table, bucket); vectors
    * and precomputed norms join back for the verify step, so no shuffle
    * ever moves an embedding more than once per side. */
  def srpNearDupPairs(vectors: DataFrame, dim: Int, planesPerTable: Int,
                      tables: Int, threshold: Double,
                      maxBucket: Int = 10000): DataFrame = {
    val mask = (1L << planesPerTable) - 1
    // Referenced three times (banding + both verify joins).
    val base = vectors.select(col("id"), col("vec"),
        norm(col("vec")).as("_n"),
        srpBucket(col("vec"), dim, planesPerTable * tables).as("_sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = base.select(col("id"),
        explode(array((0 until tables).map(t => struct(
          lit(t).as("_t"),
          shiftrightunsigned(col("_sig"), t * planesPerTable)
            .bitwiseAND(lit(mask)).as("_bkt"))): _*)).as("_x"))
      .select(col("id"), col("_x._t").as("_t"), col("_x._bkt").as("_bkt"))
    // Degenerate-bucket guard (same scheme as Dedup.minHashLshPairs): a
    // population of zero/near-zero vectors lands every row in one
    // sign-pattern bucket and makes the self-join quadratic. The oversized
    // set is tiny by construction, so aggregate bucket sizes (map-side
    // combine) and broadcast-anti-join the bad keys out before pairing.
    val bounded = dropOversized(banded, Seq("_t", "_bkt"), maxBucket)
    val cand = bounded.as("a").join(bounded.as("b"), Seq("_t", "_bkt"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(base.select(col("id").as("id_a"), col("vec").as("_va"), col("_n").as("_na")), "id_a")
      .join(base.select(col("id").as("id_b"), col("vec").as("_vb"), col("_n").as("_nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(dot(col("_va"), col("_vb")) / (col("_na") * col("_nb")), 6).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** Length guard for vector columns feeding the PQ kernels: passes the
    * vector through when it has at least `dim` elements, raises a clear
    * error naming the op otherwise. One codegen'd `size` per row — the
    * alternative is PqEncode's null codes surfacing as an opaque NPE (fit)
    * or silently poisoning ADC scores (index/serve). */
  private def vecChecked(vecCol: Column, dim: Int, op: String): Column =
    when(size(vecCol) >= dim, vecCol).otherwise(
      raise_error(concat(lit(s"$op: embedding shorter than dim=$dim (got "),
        size(vecCol).cast("string"), lit(" elements)"))).cast("array<double>"))

  /** Oversized-bucket guard shared by the SRP paths: buckets with more than
    * `maxBucket` members (degenerate sign patterns — e.g. all-zero vectors)
    * are dropped before any self-join can go quadratic on them. The
    * oversized key set is tiny by construction, so it aggregates map-side
    * and broadcasts into a left-anti join — no window, no extra shuffle of
    * the banded rows. */
  private def dropOversized(banded: DataFrame, keyCols: Seq[String],
                            maxBucket: Int): DataFrame = {
    val oversized = banded.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_bsz")).where(col("_bsz") > maxBucket)
      .select(keyCols.map(col): _*)
    banded.join(broadcast(oversized), keyCols, "left_anti")
  }

  /** Approximate top-k: score only within SRP buckets (multi-probe via the
    * planes' sign flips is the natural extension; single-probe here). */
  def srpTopK(vectors: DataFrame, dim: Int, nPlanes: Int, k: Int,
              maxBucket: Int = 10000): DataFrame = {
    val b = vectors.select(col("id"), col("vec"),
      srpBucket(col("vec"), dim, nPlanes).as("_bucket"),
      norm(col("vec")).as("_n"))
    // Same degenerate-bucket guard as [[srpNearDupPairs]]: a hot bucket
    // would make this self-join quadratic; drop it on both sides (queries
    // in a dropped bucket get no neighbors — the honest contract of a
    // single-probe LSH under degenerate data).
    val g = dropOversized(b, Seq("_bucket"), maxBucket)
    val l = g.select(col("_bucket"), col("id").as("query_id"),
      col("vec").as("_qv"), col("_n").as("_qn"))
    val r = g.select(col("_bucket"), col("id").as("neighbor_id"),
      col("vec").as("_cv"), col("_n").as("_cn"))
    val scored = l.join(r, Seq("_bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")), 6).as("sim"))
    topKByQuery(scored, "neighbor_id", k)
  }

  // ── IVF (inverted-file) ANN ────────────────────────────────────────────

  /** Per-vector cell id under a literal coarse quantizer: argmax cosine
    * against `cents`, smallest centroid id on (6-dp-rounded) ties. A pure
    * map-side projection — the 100 TB corpus-assignment pass touches each
    * row once and shuffles nothing; the centroids ride in the plan as
    * literals (they are driver-side state in every real IVF build, k-means
    * or sampled). Implemented as array_max over (sim, -cid) structs so the
    * lexicographic struct max IS the tie-broken argmax — semantics now
    * carried by the [[graft.plans.IvfCellAssign]] native loop kernel
    * (r18): the composed array_max-over-k-structs form emitted O(k·dim)
    * generated statements, blew the JVM's 64 KB method limit at 64 cells
    * × 32 dims, and silently ran interpreted under the production codegen
    * fallback (the q29 class; caught by the codegen-strict
    * ScaleSmokeSpec). Kernel parity with the composed form is spec-pinned
    * (SimilaritySpec "ivfCell kernel matches the composed argmax"). */
  private def ivfCell(vec: Column, cents: Seq[(Int, Seq[Double])]): Column =
    graft.plans.IvfCellAssign.cell(vec, cents)

  /** Driver-side centroid L2 norm — bit-identical to the in-plan
    * `sqrt(dot(cl, cl))` it replaces in quantizer expressions (the same
    * in-order multiply-accumulate as [[graft.plans.DoubleArrayDot]], the
    * same correctly-rounded IEEE sqrt), computed once per plan instead of
    * once per row per centroid. */
  private def centNorm(cv: Seq[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < cv.length) { acc += cv(i) * cv(i); i += 1 }
    math.sqrt(acc)
  }

  /** Deterministic spherical k-means for the IVF coarse quantizer —
    * assignment by cosine (matching the cosine ANN the quantizer serves),
    * recompute by per-dimension mean. Init from the k lowest-id vectors
    * (reproducible — no random restarts), then `iters` rounds of assign
    * (map-only, centroids as plan literals) +
    * recompute (posexplode to (cell, dim, value), ONE groupBy computing
    * per-dimension means — at 100 TB each round is one scan + one shuffle
    * of k*dim aggregate rows, and the k×dim centroid matrix lives on the
    * driver exactly as every production k-means keeps it). Empty cells
    * keep their previous centroid. */
  def fitCentroids(corpus: DataFrame, k: Int, iters: Int,
                   maxSample: Int = 0): Seq[(Int, Seq[Double])] = {
    if (maxSample > 0 && numericId(corpus))
      return fitCentroidsLocal(corpus, k, iters, maxSample)
    val (fit, cached) = fitSample(corpus, maxSample)
    try {
        var cents = fit.select(col("id"), col("vec")).orderBy(col("id")).limit(k)
          .collect().zipWithIndex
          .map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq
        for (_ <- 0 until iters) {
          val assigned = fit.select(ivfCell(col("vec"), cents).as("_cell"),
            posexplode(col("vec")).as(Seq("_dim", "_v")))
          val means = assigned.groupBy(col("_cell"), col("_dim"))
            .agg(avg(col("_v")).as("_m"))
            .collect().groupBy(_.getInt(0))
            .map { case (cell, rows) =>
              cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
            }
          cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
        }
        cents
      } finally cached.foreach(_.unpersist())
    }

    /** The BOUNDED fit, run driver-local (r20 optimization round — guide
      * §1.2 "fix the distributed algorithm first": a k-means over a
      * ≤ maxSample-row sample is driver-sized BY THE SAMPLING CONTRACT,
      * yet the distributed form paid `iters` plan+schedule round trips —
      * 2-3 jobs of pure latency per fit, the dominant cost of every
      * ANN-lifecycle query at any scale factor, while the cluster sat
      * idle. One TakeOrdered collect ships the sample (≤ 4096×64 doubles
      * = 2 MB — guide §5's driver budget is fine with it), the rounds run
      * as in-order Scala loops). BIT-IDENTICAL to the distributed bounded
      * fit it replaces, by construction, not by luck:
      *  - the sample is collected from the same (md5-60(id), id)
      *    TakeOrdered, whose single sorted partition fixed the
      *    distributed aggregation's accumulation order — the local loop
      *    walks the identical row order;
      *  - assignment calls the SAME [[graft.plans.IvfCellAssign]] kernel
      *    instance a plan would carry (one `assign` body, zero drift);
      *  - the per-(cell,dim) mean replays Spark's Average over doubles:
      *    0.0-seeded in-order additions, one final sum/count division
      *    (the single-partition partial merges into a zero buffer —
      *    exact).
      * SimilaritySpec's pre-existing equalities (bounded == unbounded at
      * maxSample ≥ |corpus|; partitioning invariance) pin the equivalence
      * against the distributed path, which remains in use for
      * maxSample <= 0 (the full-corpus fit must stay distributed) and for
      * non-numeric id columns (the local init sort assumes numeric ids —
      * every ANN caller's contract, but fail safe to the old path rather
      * than guess an ordering). */
    private def fitCentroidsLocal(corpus: DataFrame, k: Int, iters: Int,
                                  maxSample: Int): Seq[(Int, Seq[Double])] = {
      val rows = collectFitSample(corpus, maxSample)
      var cents: Seq[(Int, Seq[Double])] =
        rows.sortBy(_._1).take(k).zipWithIndex
          .map { case ((_, v), i) => (i, v.toSeq) }.toSeq
      for (_ <- 0 until iters) {
        val assign = graft.plans.IvfCellAssign.localAssigner(cents)
        val sum = scala.collection.mutable.HashMap.empty[(Int, Int), Double]
        val cnt = scala.collection.mutable.HashMap.empty[(Int, Int), Long]
        rows.foreach { case (_, v) =>
          val cell = assign(v)
          var d = 0
          while (d < v.length) {
            val key = (cell, d)
            sum.update(key, sum.getOrElse(key, 0.0) + v(d))
            cnt.update(key, cnt.getOrElse(key, 0L) + 1L)
            d += 1
          }
        }
        val means = sum.keys.toSeq.groupBy(_._1).map { case (cell, keys) =>
          cell -> keys.map(_._2).sorted
            .map(d => sum((cell, d)) / cnt((cell, d)).toDouble)
        }
        cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
      }
      cents
    }

    /** True when `id` is an integral column — the local bounded fit's
      * init sort (lowest-id seeding) then matches the distributed
      * `orderBy(id)` exactly. */
    private def numericId(corpus: DataFrame): Boolean =
      corpus.schema.find(_.name == "id").map(_.dataType).exists {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType => true
        case _ => false
      }

    /** The bounded fit sample, collected: (id, vec) rows in the exact
      * (md5-60(id), id) TakeOrdered order the distributed [[fitSample]]
      * partition had — the accumulation order every local mean must
      * replay. */
    private def collectFitSample(corpus: DataFrame,
                                 maxSample: Int): Array[(Long, Array[Double])] =
      corpus
        .orderBy(Dedup.md5Hash60(col("id").cast("string")), col("id"))
        .limit(maxSample)
        .select(col("id"), col("vec"))
        .collect()
        .map { r =>
          val id = r.get(0) match {
            case l: Long => l
            case i: Int => i.toLong
            case s: Short => s.toLong
            case other => throw new IllegalArgumentException(
              s"bounded fit: non-integral id $other") // numericId guards
          }
          (id, r.getSeq[Double](1).toArray)
        }

    /** Deterministic bounded fit sample for the iterative quantizer fits
      * (the [[graft.ops.Export.bpeLearn]] sampleFraction contract applied
      * to ANN): the `maxSample` lowest rows under (md5-60(id), id) — a
      * pseudo-random but REPLAYABLE subset (pure function of the ids, no
      * runtime randomness; same sample on any partitioning, retry or
      * engine). Production PQ/IVF fits on ~10⁵ vectors regardless of
      * corpus size — `iters` full-corpus scans at 100 TB is the fit-phase
      * scale-killer the verdict named, and the exactness story is
      * unchanged: codebooks/centroids only decide who pays the exact
      * re-rank, and the one full-corpus ASSIGNMENT pass stays exact. The
      * sample runs as one distributed TakeOrdered (no global sort) and is
      * persisted across the fit's rounds; maxSample <= 0 keeps the
      * full-corpus fit, and maxSample >= |corpus| is byte-identical to it
      * (same set, same seeding order). */
    private def fitSample(corpus: DataFrame,
                          maxSample: Int): (DataFrame, Option[DataFrame]) =
      if (maxSample <= 0) (corpus, None)
      else {
        val s = corpus
          .orderBy(Dedup.md5Hash60(col("id").cast("string")), col("id"))
          .limit(maxSample)
          .select(col("id"), col("vec"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (s, Some(s))
      }

    /** IVF top-k: assign every corpus vector to its nearest centroid cell
      * (map-only), have each query probe its `nprobe` nearest cells, and
      * score only the probed cells' members exactly — the inverted-list ANN
      * that complements the SRP-LSH path. Probe rows (a few per query) are
      * broadcast, so the corpus never moves: per-query work scales with the
      * probed lists, not the corpus. Recall is approximate by construction
      * (a true neighbor hiding in an unprobed cell is missed) but the
      * approximation is deterministic — same centroids, same answer, same
      * oracle replay. Cell skew bounds: a degenerate corpus collapsing into
      * one cell costs |cell| * queries-probing-it scoring rows, bounded by
      * the query count (unlike an unguarded LSH self-join's |bucket|²).
      * `queries`/`corpus`: (id, vec array<double>); self-matches excluded. */
    def ivfTopK(queries: DataFrame, corpus: DataFrame,
                cents: Seq[(Int, Seq[Double])], nprobe: Int, k: Int): DataFrame =
      ivfTopKAgainstIndex(queries, ivfIndex(corpus, cents), cents, nprobe, k)

    /** The IVF INDEX table — the ANN analog of [[Dedup.minHashSignatures]]:
      * (id, vec, _n, _cell) for every corpus vector, one map-only assignment
      * pass (centroids ride as plan literals). A 100 TB pipeline fits the
      * quantizer ONCE ([[fitCentroids]]), runs this pass once, WRITES the
      * result (parquet, `partitionBy("_cell")` so a probe's cell filter
      * prunes whole inverted lists at the file level) plus the centroid
      * table ([[ivfCentroidsDf]]), and serves every later query batch from
      * storage via [[ivfTopKAgainstIndex]] — corpus vectors are never
      * re-assigned, norms never recomputed, the quantizer never refit. */
    def ivfIndex(corpus: DataFrame, cents: Seq[(Int, Seq[Double])]): DataFrame =
      corpus.select(col("id"), col("vec"), norm(col("vec")).as("_n"),
        ivfCell(col("vec"), cents).as("_cell"))

    /** Centroid table (cid, cvec) for storage alongside the index — k×dim,
      * driver-sized by design (like every production IVF's quantizer). */
    def ivfCentroidsDf(spark: org.apache.spark.sql.SparkSession,
                       cents: Seq[(Int, Seq[Double])]): DataFrame = {
      import spark.implicits._
      cents.toDF("cid", "cvec")
    }

    /** Driver-side centroids from a stored centroid table (the read half of
      * the [[ivfCentroidsDf]] contract). */
    def ivfCentroidsFrom(df: DataFrame): Seq[(Int, Seq[Double])] =
      df.select(col("cid").cast("int"), col("cvec")).collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq

    /** Merge NEW vectors into a persisted [[ivfIndex]] directory WITHOUT a
      * rebuild — the recurring-crawl contract for the ANN tier (the graph
      * tier's [[Graph.graphIndexAppend]] story): a daily embedding batch
      * must not re-assign (or worse, refit) the whole history. The
      * quantizer stays FROZEN — `cents` must be the index's own stored
      * centroids ([[ivfCentroidsFrom]]); the delta is assigned map-side
      * against them, anti-joined on id against the stored index (re-seen
      * ids drop — the index stays keyed by id; null ids drop per the ANN
      * id contract), and appended under the same `partitionBy("_cell")`
      * layout, so [[ivfTopKAgainstIndex]]'s cell-filter file pruning keeps
      * working and serves results equal to a full rebuild over the union
      * under the same centroids (SimilaritySpec pins the equality).
      *
      * Cost shape: one map-only assignment of the DELTA + one id-column
      * scan of the stored index for the dedup anti-join — O(index ids)
      * read, never the O(history) re-encode. The delta is localCheckpoint'd
      * before the write so the append can't invalidate its own anti-join
      * scan, which also makes re-appending a seen delta a no-op (idempotent
      * crash repair). Each append adds one file set per touched cell;
      * after many appends re-run the full write once as compaction (the
      * lake-hygiene contract). */
    def ivfIndexAppend(spark: org.apache.spark.sql.SparkSession,
                       newCorpus: DataFrame, cents: Seq[(Int, Seq[Double])],
                       indexDir: String): Unit = {
      val fresh = ivfIndex(newCorpus.where(col("id").isNotNull), cents)
        .join(spark.read.parquet(indexDir).select(col("id")),
          Seq("id"), "left_anti")
        .localCheckpoint()
      fresh.write.mode("append").partitionBy("_cell").parquet(indexDir)
    }

    /** [[ivfIndexAppend]] for the COMPRESSED ([[pqIndex]] /
      * [[pqIndexResidual]]) layout: assign the delta against the frozen
      * coarse centroids, encode with the frozen codebooks (residual
      * encoding when `residualCents` is set — pass the index's own coarse
      * centroids, as at build time), dedup by id against the stored index,
      * append under `partitionBy("_cell")`. Same cost shape, idempotency,
      * and serve-equality contract as the full-vector variant. */
    def pqIndexAppend(spark: org.apache.spark.sql.SparkSession,
                      newCorpus: DataFrame, dim: Int, m: Int,
                      books: Seq[(Int, Int, Seq[Double])],
                      cents: Seq[(Int, Seq[Double])],
                      indexDir: String,
                      residual: Boolean = false): Unit = {
      val assigned = ivfIndex(newCorpus.where(col("id").isNotNull), cents)
      val enc =
        if (residual) pqIndexResidual(assigned, dim, m, books, cents)
        else pqIndex(assigned, dim, m, books)
      val fresh = enc
        .join(spark.read.parquet(indexDir).select(col("id")),
          Seq("id"), "left_anti")
        .localCheckpoint()
      fresh.write.mode("append").partitionBy("_cell").parquet(indexDir)
    }

    /** Per-cell exact member means of a stored [[ivfIndex]] — the
      * drift-detection input: (cell, n members, mean vector). One scan,
      * decimal-exact per-dimension sums ([[groupCentroids]]), then a
      * dim-bounded collect_list per cell — output is quantizer-sized. */
    private def cellMeans(index: DataFrame, dim: Int): DataFrame =
      groupCentroids(index.select(col("_cell"), col("vec")), "_cell",
          "vec", dim)
        .groupBy(col("_cell"))
        .agg(max(col("n")).as("n"),
          transform(array_sort(collect_list(struct(col("d"), col("c")))),
            x => x.getField("c")).as("_mv"))

    /** Drift audit for a frozen IVF/SemDeDup quantizer — WHICH cells'
      * member mass has rotated away from the centroid that was fitted
      * for them: per cell, `drift_ppm` = 10⁶ − floor(cos(centroid,
      * member-mean)·10⁶ + 0.5) (micro-units of cosine distance — the
      * member mean is the Lloyd-step optimum, so the angle between it
      * and the frozen centroid IS the refit opportunity), and `refit` =
      * 1 when it exceeds `driftPpm`. Cells with no members or a
      * zero-norm mean report NULL drift / refit 0 (nothing to re-fit
      * toward). This is the decision input of [[ivfCentroidRefresh]],
      * published as its own audit (the [[ivfCellDrift]] report is what a
      * pipeline alerts on between refreshes).
      *
      * Scale shape: one index scan into [[groupCentroids]]' map-side-
      * combined decimal sums (shuffle carries k·dim aggregate rows, not
      * vectors); the per-cell cosine is a plan-literal chain over the
      * k×dim stored centroids — quantizer-sized, like [[ivfCell]].
      * Output: (cell INT, n BIGINT, drift_ppm BIGINT, refit INT). */
    def ivfCellDrift(index: DataFrame, cents: Seq[(Int, Seq[Double])],
                     driftPpm: Long): DataFrame = {
      require(cents.nonEmpty, "ivfCellDrift: need at least one centroid")
      val dim = cents.head._2.size
      ivfCellDriftFromMeans(cellMeans(index, dim), cents, driftPpm)
    }

    /** [[ivfCellDrift]] over an ALREADY-AGGREGATED per-cell mean table —
      * shared with [[refreshPlan]], which needs both the drift verdicts
      * and the means themselves and used to pay the corpus aggregate
      * twice (once inside the drift audit, once for the mean collect). */
    private def ivfCellDriftFromMeans(means: DataFrame,
                                      cents: Seq[(Int, Seq[Double])],
                                      driftPpm: Long): DataFrame = {
      require(cents.nonEmpty, "ivfCellDrift: need at least one centroid")
      require(driftPpm > 0, "ivfCellDrift: driftPpm must be positive")
      val mn = norm(col("_mv"))
      val cos = cents.foldLeft(lit(null).cast("double")) {
        case (acc, (cid, cv)) =>
          when(col("_cell") === cid,
            round(dot(col("_mv"), lit(cv.toArray)) / (mn * lit(centNorm(cv))),
              6))
            .otherwise(acc)
      }
      means
        .select(col("_cell").cast("int").as("cell"), col("n"),
          when(mn =!= 0.0,
            lit(1000000L) - floor(cos * lit(1e6) + lit(0.5)).cast("long"))
            .as("drift_ppm"))
        .withColumn("refit",
          (col("drift_ppm").isNotNull && col("drift_ppm") > driftPpm)
            .cast("int"))
    }

    /** Incremental centroid maintenance for a persisted [[ivfIndex]] —
      * the refit half of the append story ([[ivfIndexAppend]] folds new
      * vectors in under a FROZEN quantizer; after enough appends the
      * frozen centroids drift off their cells' mass and recall decays):
      * re-fit ONLY the cells [[ivfCellDrift]] flags (each drifted
      * centroid moves to its members' exact mean — one Lloyd step on
      * that cell), migrate ONLY those cells' members (re-assigned
      * map-only against the updated centroid set; their partitions are
      * rewritten, receiving cells get appends), and return the updated
      * quantizer for the stored centroid table. Undrifted cells' rows
      * are never read, re-encoded, or rewritten — the O(drifted)
      * recurring cost a 100 TB index needs, not the O(history) rebuild.
      *
      * MISS CLASS (stated, the SemDeDup cross-cell contract): members of
      * UNDRIFTED cells are not re-assigned, so one sitting marginally
      * closer to a moved centroid stays put until its own cell drifts —
      * serve-equality with a full re-assignment holds exactly when the
      * refit is locally contained (the spec's fixture pins it; a
      * periodic full re-assignment is the compaction analogue).
      *
      * Crash contract: migrated rows are localCheckpoint'd BEFORE the
      * drifted partitions are deleted (same window as
      * [[ivfIndexAppend]]'s append — re-running a half-applied refresh
      * re-reads whatever partitions remain and re-derives a consistent
      * state only if the checkpoint write completed; treat the
      * delete+append pair as the commit point and re-run on doubt).
      *
      * Returns (updated centroids, refitted cell ids); no drift → the
      * input centroids verbatim and zero IO beyond the audit scan. */
    def ivfCentroidRefresh(spark: org.apache.spark.sql.SparkSession,
                           indexDir: String,
                           cents: Seq[(Int, Seq[Double])],
                           driftPpm: Long)
        : (Seq[(Int, Seq[Double])], Seq[Int]) = {
      require(cents.nonEmpty, "ivfCentroidRefresh: need centroids")
      val idx = spark.read.parquet(indexDir)
      val (newCents, driftedIds) = refreshPlan(idx, cents, driftPpm)
      if (driftedIds.isEmpty) (cents, Nil)
      else {
        val moved = idx
          .where(col("_cell").isin(driftedIds.map(Integer.valueOf): _*))
          .select(col("id"), col("vec"), col("_n"))
          .withColumn("_cell", ivfCell(col("vec"), newCents))
          .localCheckpoint()
        rewriteCells(spark, indexDir, driftedIds, moved)
        (newCents, driftedIds)
      }
    }

    /** FULL re-assignment compaction of a persisted [[ivfIndex]] — the
      * endpoint of [[ivfCentroidRefresh]]'s documented miss class:
      * refreshes re-assign only DRIFTED cells' members, so a member of
      * an undrifted cell sitting marginally closer to a moved centroid
      * stays put; after many refreshes those strays accumulate and
      * serve-equality with a fresh build erodes. Compaction re-assigns
      * EVERY stored row against the current centroids in one map-only
      * pass (centroids ride as plan literals — no shuffle, no refit) and
      * rewrites ONLY the cells whose membership changed: losing cells
      * are rewritten without their departed rows, gaining cells receive
      * appends — an unchanged cell's partition is never touched, so a
      * mostly-converged index compacts in O(strays), not O(history).
      * After it, the stored index IS `ivfIndex(corpus, cents)` —
      * serve-equality with a fresh build holds exactly (the spec pins it
      * after a drift → refresh → compact cycle).
      *
      * Run it on the lake-hygiene cadence the append/refresh docs
      * already name (e.g. weekly, or when [[ivfCellDrift]] shows residue
      * below the refresh threshold) — appends and refreshes stay the
      * cheap recurring path; this is the periodic true-up.
      *
      * Crash contract = the refresh's: moved+keeper rows are
      * localCheckpoint'd BEFORE the affected partitions are deleted;
      * treat delete+append as the commit point and re-run on doubt
      * (idempotent — a second pass finds nothing to move). Returns the
      * rewritten cell ids (empty = already compact, zero IO beyond the
      * audit scan). */
    def ivfCompact(spark: org.apache.spark.sql.SparkSession,
                   indexDir: String,
                   cents: Seq[(Int, Seq[Double])]): Seq[Int] = {
      require(cents.nonEmpty, "ivfCompact: need centroids")
      val idx = spark.read.parquet(indexDir)
        .withColumn("_newCell", ivfCell(col("vec"), cents))
      // quantizer-bounded collect: ≤ k distinct losing cell ids (gaining
      // cells need no tracking — they only receive appends)
      val losing = idx
        .where(col("_newCell").cast("int") =!= col("_cell").cast("int"))
        .select(col("_cell").cast("int").as("_c"))
        .distinct().collect().map(_.getInt(0)).toSeq
      if (losing.isEmpty) Nil
      else {
        val affected = losing.map(Integer.valueOf)
        // rows leaving an affected cell land at their new cell; rows
        // STAYING in an affected cell must ride along because the whole
        // partition is deleted
        val rewrite = idx
          .where(col("_cell").isin(affected: _*))
          .select(col("id"), col("vec"), col("_n"),
            col("_newCell").as("_cell"))
          .localCheckpoint()
        rewriteCells(spark, indexDir, losing, rewrite)
        losing.sorted
      }
    }

    /** [[ivfCompact]] for the COMPRESSED ([[pqIndex]] /
      * [[pqIndexResidual]]) layout — the full-re-assignment true-up of a
      * PQ directory after [[pqCentroidRefresh]] cycles: codes hold no
      * full vectors, so re-assignment reads `corpus` (the full-vector
      * table the PQ serving contract already keeps —
      * [[pqTopKAgainstIndex]]'s re-rank side), movers re-encode at their
      * new cell (their RESIDUAL codes describe the old cell's centroid;
      * plain codes migrate unchanged but the partition move is the
      * same), and rows that stay put keep their stored codes verbatim —
      * only cells that LOSE members are rewritten, so a mostly-converged
      * index compacts in O(strays). Stored rows absent from `corpus`
      * stay where they are (never silently dropped); corpus rows absent
      * from the index are never admitted (compaction moves rows, appends
      * add them — the [[pqCentroidRefresh]] stored-membership rule).
      * `cents` must be the index's current stored centroids. Crash
      * contract = the refresh's checkpoint-before-delete. Returns the
      * rewritten cell ids (empty = already compact). */
    def pqCompact(spark: org.apache.spark.sql.SparkSession,
                  indexDir: String, corpus: DataFrame,
                  dim: Int, m: Int,
                  books: Seq[(Int, Int, Seq[Double])],
                  cents: Seq[(Int, Seq[Double])],
                  residual: Boolean = false): Seq[Int] = {
      require(cents.nonEmpty, "pqCompact: need centroids")
      val assigned = ivfIndex(corpus.where(col("id").isNotNull), cents)
        .select(col("id"), col("vec"), col("_n"),
          col("_cell").cast("int").as("_newCell"))
      val stored = spark.read.parquet(indexDir)
      val movers = stored
        .select(col("id"), col("_cell").cast("int").as("_oldCell"))
        .join(assigned, Seq("id"))
        .where(col("_newCell") =!= col("_oldCell"))
      // quantizer-bounded collect: ≤ k losing cells
      val losing = movers.select(col("_oldCell")).distinct()
        .collect().map(_.getInt(0)).toSeq
      if (losing.isEmpty) Nil
      else {
        val affected = losing.map(Integer.valueOf)
        val encFrame = movers
          .select(col("id"), col("vec"), col("_n"),
            col("_newCell").as("_cell"))
        val enc =
          if (residual) pqIndexResidual(encFrame, dim, m, books, cents)
          else pqIndex(encFrame, dim, m, books)
        // keepers ride along because their whole partition is deleted;
        // their codes are still valid (cell and centroid unchanged)
        val keepers = stored
          .where(col("_cell").isin(affected: _*))
          .join(movers.select(col("id")), Seq("id"), "left_anti")
        val rewrite = keepers.unionByName(enc).localCheckpoint()
        rewriteCells(spark, indexDir, losing, rewrite)
        losing.sorted
      }
    }

    /** The refit decision shared by both refresh layouts: flag drifted
      * cells ([[ivfCellDrift]]), collect their members' means (≤ k rows
      * — quantizer-sized), and splice them into the centroid set.
      * Returns (updated centroids, refitted cell ids — empty when
      * nothing drifted). */
    private def refreshPlan(idx: DataFrame, cents: Seq[(Int, Seq[Double])],
                            driftPpm: Long)
        : (Seq[(Int, Seq[Double])], Seq[Int]) = {
      val dim = cents.head._2.size
      // ONE corpus aggregate: the per-cell mean table is quantizer-bounded
      // (≤ k rows), so pin it eagerly and feed BOTH the drift audit and
      // the mean collect from it — the previous shape ran the full
      // explode+decimal-sum aggregate twice (r21, guide §1.2).
      val cellMv = cellMeans(idx, dim).localCheckpoint()
      val flagged = ivfCellDriftFromMeans(cellMv, cents, driftPpm)
        .where(col("refit") === 1).select(col("cell"))
      val means = cellMv
        .join(flagged, col("_cell") === col("cell"))
        .select(col("cell"), col("_mv"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      (cents.map { case (cid, cv) => (cid, means.getOrElse(cid, cv)) },
        means.keys.toSeq.sorted)
    }

    /** Partition-level commit of a refresh: delete the refitted cells'
      * directories, append the (already-checkpointed) re-assigned rows.
      * The checkpoint-before-delete ordering is the crash contract both
      * refresh layouts document. */
    private def rewriteCells(spark: org.apache.spark.sql.SparkSession,
                             indexDir: String, driftedIds: Seq[Int],
                             moved: DataFrame): Unit = {
      val fs = new org.apache.hadoop.fs.Path(indexDir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      driftedIds.foreach { cid =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$indexDir/_cell=$cid"), true)
      }
      moved.write.mode("append").partitionBy("_cell").parquet(indexDir)
    }

    /** [[ivfCentroidRefresh]] for the COMPRESSED ([[pqIndex]] /
      * [[pqIndexResidual]]) layout — where a centroid move does MORE
      * than re-route assignments: residual codes are encoded AGAINST
      * their cell's centroid, so every member of a refitted cell must
      * re-encode (its stored codes describe a residual from a centroid
      * that no longer exists). The codes hold no full vectors, so the
      * drift audit and the re-encode both read `corpus` — the
      * full-vector table the PQ serving contract already keeps wherever
      * the corpus lives ([[pqTopKAgainstIndex]]'s re-rank side): one
      * map-only assignment pass for the audit, then re-encode of ONLY
      * the drifted cells' members. Plain (non-residual) codes don't
      * depend on the coarse centroids, but their rows still migrate, so
      * the partition rewrite is the same.
      *
      * Undrifted cells' rows are never re-encoded or rewritten — their
      * centroids are unchanged, so their residual codes stay valid (the
      * property that makes this O(drifted), and the reason the refresh
      * must go through THIS op rather than [[ivfCentroidRefresh]] on a
      * compressed directory). Same miss class and crash contract as the
      * full-vector refresh. Returns (updated centroids, refitted cell
      * ids).
      *
      * PRECONDITION (asserted, r18 advisory): `corpus` must contain
      * every stored id of the drifted cells — the refresh re-encodes
      * from full vectors, so a drifted cell's stored row missing from
      * `corpus` cannot be rewritten and its partition delete would
      * silently lose it (a stale residual code against the dead old
      * centroid is not a valid carry-through, unlike [[pqCompact]]'s
      * keepers, whose centroids survive). The op counts drifted-cell
      * stored ids anti-joined against `corpus` and raises before any
      * delete; undrifted cells never need the corpus row. */
    def pqCentroidRefresh(spark: org.apache.spark.sql.SparkSession,
                          indexDir: String, corpus: DataFrame,
                          dim: Int, m: Int,
                          books: Seq[(Int, Int, Seq[Double])],
                          cents: Seq[(Int, Seq[Double])],
                          driftPpm: Long,
                          residual: Boolean = false)
        : (Seq[(Int, Seq[Double])], Seq[Int]) = {
      require(cents.nonEmpty, "pqCentroidRefresh: need centroids")
      val assigned = ivfIndex(corpus.where(col("id").isNotNull), cents)
      val (newCents, driftedIds) = refreshPlan(assigned, cents, driftPpm)
      if (driftedIds.isEmpty) (cents, Nil)
      else {
        // Membership comes from the STORED index, not the re-assigned
        // corpus (round-16 advisory): a corpus row whose id was never
        // appended (or was dropped by pqIndexAppend's dedup) must not be
        // silently admitted by a refresh — refreshes move existing rows,
        // appends add new ones ([[ivfCentroidRefresh]]'s stored-index
        // semantics). The semi-join keys the corpus vectors by the
        // drifted partitions' STORED ids with NO filter on the corpus
        // side's own assignment: a stored row of a drifted cell whose
        // fresh old-centroid assignment lands elsewhere (a stray parked
        // there by an earlier refresh) would otherwise vanish — its
        // partition is deleted but the cell-filtered frame omits it.
        // The semi-join is partition-pruned to the drifted cells and
        // carries only ids.
        val storedIds = spark.read.parquet(indexDir)
          .where(col("_cell").isin(driftedIds.map(Integer.valueOf): _*))
          .select(col("id"))
        // fail-loudly precondition (see Scaladoc): every drifted-cell
        // stored row must have its full vector in `corpus`, or the
        // partition delete below would silently lose it. The probe side
        // is the raw corpus id column — not `assigned` — so the check
        // costs one id-only anti-join by construction, independent of
        // whether Catalyst prunes the assignment projection out.
        val orphaned = storedIds
          .join(corpus.where(col("id").isNotNull).select(col("id")),
            Seq("id"), "left_anti").count()
        require(orphaned == 0L,
          s"pqCentroidRefresh: $orphaned stored row(s) in drifted cells " +
            s"${driftedIds.sorted.mkString("[", ",", "]")} have no vector " +
            "in `corpus` — pass the corpus the index was built/appended " +
            "from (corpus must contain every stored id); refusing to " +
            "delete their partitions")
        val movedFull = assigned
          .join(storedIds, Seq("id"), "left_semi")
          .select(col("id"), col("vec"), col("_n"))
          .withColumn("_cell", ivfCell(col("vec"), newCents))
        val moved =
          (if (residual) pqIndexResidual(movedFull, dim, m, books, newCents)
           else pqIndex(movedFull, dim, m, books))
            .localCheckpoint()
        rewriteCells(spark, indexDir, driftedIds, moved)
        (newCents, driftedIds)
      }
    }

    // ── Product quantization (PQ) ──────────────────────────────────────────
    //
    // The compression tier for the persisted ANN index (Jégou et al.,
    // "Product Quantization for Nearest Neighbor Search", 2011 — public
    // method): split each vector into `m` subspaces, quantize every
    // subvector against a per-subspace codebook of `ksub` codewords, and
    // store ONE BYTE-SIZED CODE per subspace instead of dsub doubles. At
    // 100 TB of embeddings the full-vector [[ivfIndex]] is itself the
    // storage problem (the verdict's point) — a 64-dim float64 row is 512
    // bytes of vector; its PQ row is m=8 codes + an 8-byte norm. Queries
    // score candidates with ADC (asymmetric distance computation): the
    // query precomputes its m×ksub inner-product table once, each
    // candidate costs m array lookups + adds instead of `dim` multiplies,
    // and the top `rerank` survivors are re-scored EXACTLY against the
    // full vectors — so the final ranks/sims are exact cosine whenever the
    // true top-k survives the ADC cut.

    /** Deterministic per-subspace k-means (L2 on subvectors — PQ's metric):
      * init from the `ksub` lowest-id vectors' subvectors (reproducible, no
      * random restarts; same convention as [[fitCentroids]]), then `iters`
      * rounds of assign (map-only — codebooks ride as plan literals) +
      * per-dimension mean recompute (ONE groupBy of m·ksub·dsub aggregate
      * rows per round). Returns (subspace, code, codeword); the m×ksub×dsub
      * codebook matrix is driver-sized by design, like every production
      * PQ's. Empty codes keep their previous codeword. */
    def pqFitCodebooks(corpus: DataFrame, dim: Int, m: Int, ksub: Int,
                       iters: Int,
                       maxSample: Int = 0): Seq[(Int, Int, Seq[Double])] = {
      require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
      if (maxSample > 0 && numericId(corpus))
        return pqFitCodebooksLocal(corpus, dim, m, ksub, iters, maxSample)
      val dsub = dim / m
      val (fit, cached) = fitSample(corpus, maxSample)
      // Fail loudly on malformed input: a vec shorter than dim makes
      // PqEncode yield null codes (its documented refuse-to-guess contract),
      // which would otherwise surface as an opaque NPE at the driver-side
      // means collect — and downstream (pqIndex / ADC) null codes would
      // propagate silently. The guard is one codegen'd `size` per row.
      val checked = fit.select(col("id"),
        vecChecked(col("vec"), dim, "pqFitCodebooks").as("vec"))
      try {
      // Seed codewords from the lowest-id vectors (reproducible), but take
      // the first ksub DISTINCT subvectors per subspace: duplicate seeds
      // collapse the k-means to one effective codeword (the strict-< argmin
      // sends every row to the lowest duplicate and empty codes never
      // move). The residual fit hits this for real — rows that ARE coarse
      // centroids have all-zero residuals — and raw fits are unchanged
      // because their low-id subvectors are already distinct. If a subspace
      // has fewer than ksub distinct subvectors in the probe window, the
      // distinct ones cycle (bounded form of the old degenerate behavior).
      val init = checked.select(col("id"), col("vec")).orderBy(col("id"))
        .limit(math.max(ksub * 4, 64)).collect()
      require(init.length >= ksub,
        s"pqFitCodebooks: corpus has only ${init.length} rows; " +
          s"need at least ksub=$ksub to seed the codebooks")
      var books: Seq[(Int, Int, Seq[Double])] = (0 until m).flatMap { s =>
        val distinct = scala.collection.mutable.LinkedHashSet.empty[Seq[Double]]
        init.iterator.takeWhile(_ => distinct.size < ksub).foreach { r =>
          distinct += r.getSeq[Double](1).slice(s * dsub, (s + 1) * dsub)
        }
        val base = distinct.toIndexedSeq
        (0 until ksub).map(c => (s, c, base(c % base.size)))
      }
      for (_ <- 0 until iters) {
        val withCodes = checked.select(
          pqCodes(col("vec"), dim, m, books).as("_codes"),
          posexplode(array((0 until m).map(s =>
            slice(col("vec"), s * dsub + 1, dsub)): _*)).as(Seq("_s", "_sv")))
        val means = withCodes
          .select(col("_s"), element_at(col("_codes"), col("_s") + 1).as("_code"),
            posexplode(col("_sv")).as(Seq("_dim", "_v")))
          .groupBy(col("_s"), col("_code"), col("_dim"))
          .agg(avg(col("_v")).as("_mean"))
          .collect()
          .groupBy(r => (r.getInt(0), r.getInt(1)))
          .map { case (key, rows) =>
            key -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
          }
        books = books.map { case (s, c, old) =>
          (s, c, means.getOrElse((s, c), old))
        }
      }
      books
    } finally cached.foreach(_.unpersist())
  }

  /** The BOUNDED codebook fit, driver-local — [[fitCentroidsLocal]]'s
    * rationale and bit-equality construction applied to the per-subspace
    * k-means: same collected (md5-60(id), id)-ordered sample, encode via
    * the SAME [[graft.plans.PqEncode]] kernel body a plan would carry
    * ([[graft.plans.PqQuantize.localEncoder]]), per-(sub, code, dim)
    * means replaying Spark's Average accumulation order (row-major over
    * the sorted sample: row, then subspace, then dim — exactly the
    * posexplode expansion order). The pre-existing SimilaritySpec
    * equalities (bounded == unbounded at maxSample ≥ |corpus|;
    * partitioning invariance) pin the equivalence. */
  private def pqFitCodebooksLocal(corpus: DataFrame, dim: Int, m: Int,
                                  ksub: Int, iters: Int,
                                  maxSample: Int): Seq[(Int, Int, Seq[Double])] = {
    val dsub = dim / m
    val rows = collectFitSample(corpus, maxSample)
    rows.foreach { case (_, v) =>
      require(v.length >= dim,
        s"pqFitCodebooks: embedding shorter than dim=$dim (got " +
          s"${v.length} elements)")
    }
    val init = rows.sortBy(_._1).take(math.max(ksub * 4, 64))
    require(init.length >= ksub,
      s"pqFitCodebooks: corpus has only ${init.length} rows; " +
        s"need at least ksub=$ksub to seed the codebooks")
    var books: Seq[(Int, Int, Seq[Double])] = (0 until m).flatMap { s =>
      val distinct = scala.collection.mutable.LinkedHashSet.empty[Seq[Double]]
      init.iterator.takeWhile(_ => distinct.size < ksub).foreach {
        case (_, v) => distinct += v.slice(s * dsub, (s + 1) * dsub).toSeq
      }
      val base = distinct.toIndexedSeq
      (0 until ksub).map(c => (s, c, base(c % base.size)))
    }
    for (_ <- 0 until iters) {
      val encode = graft.plans.PqQuantize.localEncoder(books, m, ksub, dsub)
      val sum = scala.collection.mutable.HashMap.empty[(Int, Int, Int), Double]
      val cnt = scala.collection.mutable.HashMap.empty[(Int, Int, Int), Long]
      rows.foreach { case (_, v) =>
        val codes = encode(v)
        var s = 0
        while (s < m) {
          val c = codes(s)
          var d = 0
          while (d < dsub) {
            val key = (s, c, d)
            sum.update(key, sum.getOrElse(key, 0.0) + v(s * dsub + d))
            cnt.update(key, cnt.getOrElse(key, 0L) + 1L)
            d += 1
          }
          s += 1
        }
      }
      val means = sum.keys.toSeq.groupBy(k => (k._1, k._2)).map {
        case ((s, c), keys) =>
          (s, c) -> keys.map(_._3).sorted
            .map(d => sum((s, c, d)) / cnt((s, c, d)).toDouble)
      }
      books = books.map { case (s, c, old) =>
        (s, c, means.getOrElse((s, c), old))
      }
    }
    books
  }

  /** PQ codes for a full vector: array<int> of length m (nearest codeword
    * per subspace, argmin L2, smallest code on ties). A native codegen'd
    * LOOP over the codebook ([[graft.plans.PqEncode]]) — an unrolled
    * argmin over m·ksub literal structs dies in Janino at real codebook
    * sizes; the loop form is ~30 generated lines at any m/ksub. Map-only:
    * the codebook rides as an expression constant, like the IVF
    * centroids. */
  def pqCodes(vec: Column, dim: Int, m: Int,
              books: Seq[(Int, Int, Seq[Double])]): Column = {
    val ksub = books.size / m
    graft.plans.PqQuantize.encode(vec, books.sortBy(t => (t._1, t._2)),
      m, ksub, dim / m)
  }

  /** The COMPRESSED index: [[ivfIndex]] rows with the vector replaced by
    * its PQ codes — (id, _cell, _n, _codes). This is what a 100 TB
    * pipeline writes (partitionBy("_cell"), like the full index); the
    * full-vector table stays wherever the corpus lives and is touched
    * only by the re-rank join on the tiny candidate set. */
  def pqIndex(index: DataFrame, dim: Int, m: Int,
              books: Seq[(Int, Int, Seq[Double])]): DataFrame =
    index.select(col("id"), col("_cell"), col("_n"),
      pqCodes(vecChecked(col("vec"), dim, "pqIndex"), dim, m, books)
        .as("_codes"))

  // ── Residual (IVF-PQ) encoding ─────────────────────────────────────────
  //
  // Production IVF-PQ quantizes the RESIDUAL vec − centroid(cell), not the
  // raw vector (Jégou et al. 2011, §IV — the "IVFADC" variant): within a
  // cell the residuals are centered near zero with much smaller spread
  // than the raw vectors, so the same m×ksub code budget spends all its
  // resolution on the part of the vector the coarse quantizer didn't
  // already explain — materially tighter ADC scores at identical index
  // bytes. ADC adds the cell's contribution back per (query, cell):
  // ⟨q, x⟩ ≈ ⟨q, c_cell⟩ + ⟨q, residual̂⟩, where the first term is one dot
  // per PROBE row (a few per query) and the second is the usual m table
  // lookups. Exactness contract is unchanged: the re-rank join re-scores
  // the shortlist against full vectors, so ADC quality decides only who
  // pays the exact join (SimilaritySpec shows the residual shortlist
  // survives a rerank budget the raw-vector one drops neighbors at).

  /** Centroids as a dense array-of-arrays plan literal, indexed by cell
    * id + 1 (`element_at` is 1-based). Requires consecutive ids 0..k−1 —
    * true of [[fitCentroids]] output and any sane quantizer. */
  private def centArrayLit(cents: Seq[(Int, Seq[Double])]): Column = {
    val sorted = cents.sortBy(_._1)
    require(sorted.zipWithIndex.forall { case ((cid, _), i) => cid == i },
      s"residual PQ requires consecutive centroid ids 0..k-1, got " +
        sorted.map(_._1).mkString(","))
    array(sorted.map { case (_, cv) => lit(cv.toArray) }: _*)
  }

  /** vec − centroid(cellCol): the IVF-PQ residual, computed map-side with
    * the centroid matrix riding as a plan literal. */
  def residualVec(vec: Column, cellCol: Column,
                  cents: Seq[(Int, Seq[Double])]): Column =
    zip_with(vec, element_at(centArrayLit(cents), cellCol + 1), _ - _)

  /** Per-subspace codebooks fit on RESIDUALS — same deterministic k-means
    * as [[pqFitCodebooks]], run over vec − centroid(cell). */
  def pqFitCodebooksResidual(corpus: DataFrame,
                             cents: Seq[(Int, Seq[Double])],
                             dim: Int, m: Int, ksub: Int,
                             iters: Int,
                             maxSample: Int = 0): Seq[(Int, Int, Seq[Double])] =
    pqFitCodebooks(
      corpus.select(col("id"),
        residualVec(vecChecked(col("vec"), dim, "pqFitCodebooksResidual"),
          ivfCell(col("vec"), cents), cents).as("vec")),
      dim, m, ksub, iters, maxSample)

  /** The residual-encoded compressed index: [[pqIndex]] layout, codes
    * computed over vec − centroid(_cell) (the SAME `_cell` the row is
    * stored under — no re-assignment drift). Serve with
    * [[pqTopKAgainstIndex]] passing `residualCents`. */
  def pqIndexResidual(index: DataFrame, dim: Int, m: Int,
                      books: Seq[(Int, Int, Seq[Double])],
                      cents: Seq[(Int, Seq[Double])]): DataFrame =
    index.select(col("id"), col("_cell"), col("_n"),
      pqCodes(residualVec(vecChecked(col("vec"), dim, "pqIndexResidual"),
        col("_cell"), cents), dim, m, books).as("_codes"))

  /** Codebook table (sub, code, cw) for storage alongside the index —
    * m×ksub×dsub, driver-sized by design. */
  def pqCodebooksDf(spark: org.apache.spark.sql.SparkSession,
                    books: Seq[(Int, Int, Seq[Double])]): DataFrame = {
    import spark.implicits._
    books.toDF("sub", "code", "cw")
  }

  /** Driver-side codebooks from a stored codebook table. */
  def pqCodebooksFrom(df: DataFrame): Seq[(Int, Int, Seq[Double])] =
    df.select(col("sub").cast("int"), col("code").cast("int"), col("cw"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .sortBy(t => (t._1, t._2)).toSeq

  /** ANN top-k over the COMPRESSED index with exact re-rank: probe
    * `nprobe` cells (as [[ivfTopKAgainstIndex]]), ADC-score every probed
    * cell's codes — each query carries its m×ksub inner-product table,
    * computed once per query and broadcast, so a candidate costs m
    * lookups — keep the top `rerank` per query, then join those few back
    * to the FULL vectors (`corpus`: (id, vec)) and re-score with exact
    * cosine. Output (query_id, neighbor_id, sim, rank) with EXACT sims:
    * the PQ approximation decides only which `rerank` candidates pay the
    * exact join, so with an adequate margin the result equals the
    * brute-force top-k (q92's oracle holds it to exactly that). */
  def pqTopKAgainstIndex(queries: DataFrame, pqIdx: DataFrame,
                         corpus: DataFrame, cents: Seq[(Int, Seq[Double])],
                         books: Seq[(Int, Int, Seq[Double])],
                         dim: Int, m: Int,
                         nprobe: Int, rerank: Int, k: Int,
                         residualCents: Option[Seq[(Int, Seq[Double])]] = None): DataFrame =
    pqServe(queries, pqIdx, corpus, cents, books, dim, m, nprobe, rerank, k,
      residualCents, excludeClusters = None, idOut = "neighbor_id")

  /** Hard-negative mining SERVED FROM the persisted PQ/IVF index — the
    * scale form of [[hardNegatives]]: per query, the k most-ADC-similar
    * NON-cluster-mate candidates from the probed cells, exact-re-ranked.
    * The cluster exclusion applies BEFORE the ADC shortlist cut, so an
    * excluded near-dup can never consume rerank budget (a cluster-mate
    * topping the ADC scores — the common case, near-dups are the most
    * similar items — would otherwise crowd eligible negatives out of the
    * shortlist). Same label contract as [[hardNegatives]] ("c:"/"i:"
    * namespaces, min-label dedup, null ids dropped); same exactness
    * contract as [[pqTopKAgainstIndex]] (published sims are exact cosine;
    * with adequate nprobe/rerank margin the result equals the brute-force
    * [[hardNegatives]] — q124 pins exactly that).
    *
    * Scale shape: query labels ride the broadcast probe rows; candidate
    * labels come from ONE join of the probed code rows against the
    * (id → cluster) table — at a recurring 100 TB serve, materialize
    * `_cluster` into the stored index at build time instead (attach the
    * label column before the `partitionBy("_cell")` write) and this join
    * collapses to a stored-column read. Output: (query_id, negative_id,
    * sim, rank). */
  def hardNegativesAgainstIndex(queries: DataFrame, pqIdx: DataFrame,
                                corpus: DataFrame,
                                cents: Seq[(Int, Seq[Double])],
                                books: Seq[(Int, Int, Seq[Double])],
                                dim: Int, m: Int,
                                nprobe: Int, rerank: Int, k: Int,
                                clusters: DataFrame, idCol: String,
                                clusterCol: String,
                                residualCents: Option[Seq[(Int, Seq[Double])]] = None): DataFrame =
    pqServe(queries, pqIdx, corpus, cents, books, dim, m, nprobe, rerank, k,
      residualCents,
      excludeClusters = Some(clusterTable(clusters, idCol, clusterCol)),
      idOut = "negative_id")

  /** Shared PQ/IVF-PQ serving core behind [[pqTopKAgainstIndex]] and
    * [[hardNegativesAgainstIndex]]. `excludeClusters`: deduped
    * (_cid, _cluster) table; when present, candidates sharing the query's
    * cluster label are dropped at the ADC candidate stage (before the
    * shortlist cut) and output ids are named `idOut`. */
  private def pqServe(queries: DataFrame, pqIdx: DataFrame,
                      corpus: DataFrame, cents: Seq[(Int, Seq[Double])],
                      books: Seq[(Int, Int, Seq[Double])],
                      dim: Int, m: Int,
                      nprobe: Int, rerank: Int, k: Int,
                      residualCents: Option[Seq[(Int, Seq[Double])]],
                      excludeClusters: Option[DataFrame],
                      idOut: String): DataFrame = {
    require(rerank >= k, "rerank candidate count must be >= k")
    val ksub = books.size / m
    // Per-query ADC table (flat, tab[s·ksub+c] = ⟨q_s, books[s][c]⟩) — a
    // codegen'd loop, computed once per query row before the broadcast.
    val adcTab = graft.plans.PqQuantize.adcTable(col("vec"),
      books.sortBy(t => (t._1, t._2)), m, ksub, dim / m)
    val probeCells = explode(array(cents.map { case (cid, cv) =>
      struct(round(dot(col("vec"), lit(cv.toArray)) /
          (norm(col("vec")) * lit(centNorm(cv))), 6)
        .as("s"), lit(cid).as("c"))
    }: _*))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("_pc.s").desc, col("_pc.c").asc)
    // For a residual-encoded index (`residualCents` = the index's coarse
    // centroids): ⟨q, x⟩ ≈ ⟨q, c_cell⟩ + ⟨q, r̂⟩, so each PROBE row (a few
    // per query) carries its cell's ⟨q, c_cell⟩ — one dot per probe, not
    // per candidate; candidates still cost m lookups.
    val cellIp = residualCents match {
      case Some(rc) => dot(col("_qv"),
        element_at(centArrayLit(rc), col("_pc.c") + 1))
      case None => lit(0.0)
    }
    // With exclusion: cluster labels attach via one left join per side
    // (query labels ride the broadcast probes; candidate labels join the
    // probed code rows) under the hardNegatives "c:"/"i:" namespace
    // contract; ids absent from the table are singletons.
    val qBase = excludeClusters match {
      case Some(cl) => queries.where(col("id").isNotNull)
        .join(cl, queries("id") === col("_cid"), "left")
      case None => queries
    }
    val qLabel = excludeClusters.map(_ =>
      coalesce(concat(lit("c:"), col("_cluster")),
        concat(lit("i:"), col("id").cast("string"))).as("_qc")).toSeq
    val probes = qBase.select(Seq(col("id").as("query_id"),
        col("vec").as("_qv"), norm(col("vec")).as("_qn"), adcTab.as("_tab"),
        probeCells.as("_pc")) ++ qLabel: _*)
      .withColumn("_pr", row_number().over(wProbe))
      .where(col("_pr") <= nprobe)
      .select(Seq(col("query_id"), col("_qv"), col("_qn"), col("_tab"),
        col("_pc.c").as("_cell"), cellIp.as("_cip")) ++
        excludeClusters.map(_ => col("_qc")).toSeq: _*)
    val idx = excludeClusters match {
      case Some(cl) => pqIdx.where(col("id").isNotNull)
        .join(cl, pqIdx("id") === col("_cid"), "left")
        .withColumn("_nc", coalesce(concat(lit("c:"), col("_cluster")),
          concat(lit("i:"), col("id").cast("string"))))
      case None => pqIdx
    }
    // ADC scan: m table lookups + adds per candidate code row — ONE loop
    // kernel ([[graft.plans.PqAdcSum]]; r20). The m-term element_at chain
    // it replaces made every use of `_codes` re-emit the full pq_encode
    // evaluation inside the codegen'd join-match loop (~m × matches
    // kernel evals per stream row — measured 13× slower than interpreted
    // on the same data); same arithmetic, same summation order, one use
    // site. Exclusion (self + cluster-mates) applies HERE — before the
    // shortlist cut, so excluded ids never consume rerank budget.
    val approxIp = graft.plans.PqQuantize.adcSum(col("_tab"), col("_codes"),
      m, ksub)
    val keep = excludeClusters match {
      case Some(_) => col("query_id") =!= col("id") && col("_qc") =!= col("_nc")
      case None => col("query_id") =!= col("id")
    }
    val cand = idx.join(broadcast(probes), Seq("_cell"))
      .where(keep)
      .select(col("query_id"), col("id").as(idOut), col("_qv"),
        col("_qn"),
        ((col("_cip") + approxIp) / (col("_qn") * col("_n"))).as("_approx"))
    val shortlist = boundedTopK(cand, idOut, col("_approx"), rerank)
      .select(col("query_id"), col(idOut), col("_qv"), col("_qn"))
    // Exact re-rank: only `rerank` rows per query pay the full-vector join.
    val exact = shortlist
      .join(corpus.select(col("id").as(idOut), col("vec").as("_cv"),
        norm(col("vec")).as("_cn")), idOut)
      .select(col("query_id"), col(idOut),
        round(dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")), 6).as("sim"))
    topKByQuery(exact, idOut, k)
  }

  /** IVF top-k against a PRECOMPUTED index ([[ivfIndex]] output, typically
    * read back from storage): probe rows (a few per query) broadcast into
    * the stored inverted lists — per-batch cost scales with the probed
    * lists, never the corpus, and nothing on the corpus side recomputes. */
  def ivfTopKAgainstIndex(queries: DataFrame, index: DataFrame,
                          cents: Seq[(Int, Seq[Double])],
                          nprobe: Int, k: Int): DataFrame = {
    val c = index.select(col("id").as("neighbor_id"), col("vec").as("_cv"),
      col("_n").as("_cn"), col("_cell"))
    val probeCells = explode(array(cents.map { case (cid, cv) =>
      struct(round(dot(col("vec"), lit(cv.toArray)) /
          (norm(col("vec")) * lit(centNorm(cv))), 6)
        .as("s"), lit(cid).as("c"))
    }: _*))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("_pc.s").desc, col("_pc.c").asc)
    val probes = queries.select(col("id").as("query_id"), col("vec").as("_qv"),
        norm(col("vec")).as("_qn"), probeCells.as("_pc"))
      .withColumn("_pr", row_number().over(wProbe))
      .where(col("_pr") <= nprobe)
      .select(col("query_id"), col("_qv"), col("_qn"), col("_pc.c").as("_cell"))
    val scored = c.join(broadcast(probes), Seq("_cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")), 6).as("sim"))
    topKByQuery(scored, "neighbor_id", k)
  }

  /** Recall@k of an approximate top-k result against an exact ground
    * truth — the standing eval every deployed ANN index needs: recall is
    * THE quality dial that nprobe / band / codebook choices trade
    * against, and at 100 TB it must be measured on a query sample
    * continuously, not assumed from the paper. Both inputs are
    * (query_id, neighbor_id, …) top-k frames (e.g.
    * [[ivfTopKAgainstIndex]] vs [[bruteForceTopK]] over a sampled query
    * batch). Per TRUTH query: n_hits = |approx ∩ truth|, with n_truth as
    * the denominator so queries whose exact result has fewer than k
    * neighbors (tiny corpora, filters) score against what exists, and
    * queries the approximate path missed ENTIRELY still appear with
    * recall 0 — an index that silently drops queries must not be able to
    * hide them from its own eval.
    *
    * Scale shape: both sides are k-bounded per query (batch·k rows, not
    * corpus-sized); one hash join on (query, neighbor) and two map-side-
    * combined aggregates — no windows, no skew (every key appears ≤ k
    * times by construction). The published ratio is integer ppm via ONE
    * integral division of exact integers (`div` ≡ DuckDB `//`, trunc ≡
    * floor on the non-negative ratio) — never a rounded double, the
    * cross-engine portability rule every published count-ratio follows
    * (see [[graft.ops.Round6]]). Output: (query_id, n_hits, n_truth,
    * recall_ppm BIGINT). */
  def topKRecall(approx: DataFrame, truth: DataFrame): DataFrame = {
    val t = truth.select(col("query_id"), col("neighbor_id"))
    val a = approx.select(col("query_id"), col("neighbor_id"))
    val nT = t.groupBy(col("query_id")).agg(count(lit(1)).as("n_truth"))
    val hits = a.join(t, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    nT.join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("n_truth"),
        expr("coalesce(n_hits, 0L) * cast(1000000 as bigint) div n_truth")
          .as("recall_ppm"))
  }

  /** Contrastive hard-negative mining — the training-pair generator for
    * embedding/retrieval models: for each query, the k most-similar
    * corpus items EXCLUDING the query itself and everything in the
    * query's near-dup CLUSTER. The cluster exclusion is the point: the
    * most cosine-similar items to a document are usually its near
    * duplicates, and a near-dup labeled "negative" poisons a contrastive
    * objective (it is a false negative) — so similarity must be mined
    * OUTSIDE the duplicate equivalence class, which is exactly the
    * cluster table the dedup tier already publishes
    * ([[Dedup.dedupAssign]] over [[srpNearDupPairs]] — the SemDeDup
    * pipeline's byproduct).
    *
    * `clusters`: (idCol, clusterCol) — ids absent from it count as their
    * own singleton cluster (only exact self-matches excluded). Rows with
    * a NULL id on either side are dropped explicitly (same contract as
    * [[bruteForceTopK]], where the null-unsafe =!= self-match predicate
    * drops them implicitly): a null id can't be excluded, ranked, or
    * tie-broken, so it has no place in a training pair. Scale
    * shape: same as [[bruteForceTopK]] — queries broadcast, corpus scan
    * map-only, per-row norms computed once; cluster ids ride the
    * broadcast/scan sides so the exclusion is a plan predicate, not a
    * join against the pair graph. Swap the scoring side for the IVF/PQ
    * serving path when the corpus outgrows brute force — the exclusion
    * predicate composes unchanged.
    *
    * Output: (query_id, negative_id, sim, rank), rank 1..k by (sim desc,
    * id asc) — deterministic. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
                    clusters: DataFrame, idCol: String, clusterCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val cl = clusterTable(clusters, idCol, clusterCol)
    // Explicit null-id drop (see scaladoc): without it the nulls would be
    // silently discarded anyway by the null-unsafe =!= join predicates.
    def withCluster(df: DataFrame, side: String) = df
      .where(col("id").isNotNull)
      .join(cl, df("id") === col("_cid"), "left")
      .select(df("id").as(s"${side}_id"), col("vec").as(s"_${side}v"),
        norm(col("vec")).as(s"_${side}n"),
        coalesce(concat(lit("c:"), col("_cluster")),
          concat(lit("i:"), df("id").cast("string"))).as(s"_${side}c"))
    val q = withCluster(queries, "query")
    val c = withCluster(corpus, "negative")
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("negative_id") &&
          col("_queryc") =!= col("_negativec"))
      .select(col("query_id"), col("negative_id"),
        round(dot(col("_queryv"), col("_negativev")) /
          (col("_queryn") * col("_negativen")), 6).as("sim"))
    topKByQuery(scored, "negative_id", k)
  }

  /** Deduplicated (id → cluster label) table shared by the hard-negative
    * paths: min label per id (deterministic — a pair-derived cluster
    * table with repeated ids can't fan rows out into duplicate ranks);
    * labels are later prefixed "c:" while singleton fallbacks get "i:",
    * keeping the two namespaces DISJOINT (a dense cluster index 3 must
    * not collide with an unclustered id 3). */
  private def clusterTable(clusters: DataFrame, idCol: String,
                           clusterCol: String): DataFrame =
    clusters
      .select(col(idCol).as("_cid"), col(clusterCol).cast("string").as("_cl"))
      .where(col("_cid").isNotNull && col("_cl").isNotNull)
      .groupBy("_cid").agg(min(col("_cl")).as("_cluster"))

  /** Shared rank-and-cut tail of the per-query scorers: rank 1..k by
    * (sim desc, id asc) — one tie-break contract for every top-k path. */
  private def topKByQuery(scored: DataFrame, idOut: String, k: Int): DataFrame =
    boundedTopK(scored, idOut, col("sim"), k).withColumnRenamed("_rk", "rank")

  /** Salted two-phase per-query top-k — the bounded-task form of
    * `row_number().over(partitionBy(query_id))` (the
    * [[Sampling.topKPerStratum]] pattern, stratum = query): a naive
    * per-query window lands EVERY scored candidate for one query in ONE
    * task — |corpus| rows per task for the brute-force paths, the probed
    * cells' contents for IVF/PQ, both unbounded in corpus size. Phase 1
    * ranks within (query, xxhash64(id) mod fanout) sub-windows and keeps
    * k per salt, so no task ever sorts more than ~|candidates|/fanout
    * rows; phase 2 ranks the ≤ k·fanout survivors per query. Exact and
    * byte-identical to the naive window: the order (ord desc, id asc) is
    * total, and a global top-k row is necessarily a top-k row of its
    * salt bucket. Output: input columns + `_rk` (1..k). */
  private def boundedTopK(scored: DataFrame, idOut: String, ordCol: Column,
                          k: Int, fanout: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val local = Window
      .partitionBy(col("query_id"), pmod(xxhash64(col(idOut)), lit(fanout)))
      .orderBy(ordCol.desc, col(idOut).asc)
    val global = Window.partitionBy(col("query_id"))
      .orderBy(ordCol.desc, col(idOut).asc)
    scored.withColumn("_lrk", row_number().over(local))
      .where(col("_lrk") <= k)
      .withColumn("_rk", row_number().over(global))
      .where(col("_rk") <= k)
      .drop("_lrk")
  }

  // ── group centroids (mean pooling) ─────────────────────────────────────

  /** Per-group embedding centroid — mean pooling over a vector column:
    * the domain/cluster/class PROTOTYPE primitive (domain vectors for
    * mixture weighting, cluster centers for semantic bucketing, class
    * prototypes for nearest-centroid classification). Output is FLAT —
    * one row per (group, dimension): `(keyCol, d BIGINT, c DOUBLE,
    * n BIGINT)` with `c` the mean of dimension d over the group's
    * vectors and `n` the group's vector count — the layout downstream
    * per-dim math (re-normalization, centroid distances) consumes
    * directly, and the layout an external engine can hash-compare.
    *
    * Determinism: IEEE double summation is addition-order-dependent, so
    * each component is rounded to 6 dp and summed as DECIMAL(38,12) —
    * exact and associative, bit-identical across partitionings, retries
    * and engines (the Scoring tier's decimal-sum contract). The mean is
    * NOT a rounded double ratio (the q171 divergence class): the sum
    * quantizes to SIGNED micro-units by one integral division (sign
    * split so trunc ≡ floor on non-negative operands, `div` ≡ DuckDB
    * `//`), and `c` is that exact integer divided by 10⁶ — one IEEE
    * division of exact inputs, bit-identical on any engine.
    *
    * Scale shape: one posexplode (narrow) + ONE map-side-combinable
    * groupBy on (group, d) — the shuffle carries groups × dim partial
    * sums, never the vectors; no collect_list, no per-group arrays on
    * the heap. Null keys/vectors, vectors of the wrong length, and
    * vectors with any non-finite or |v| ≥ 1e9 component are dropped
    * WHOLE (a malformed embedding has no centroid contribution; a NaN
    * component would throw in the ANSI decimal cast mid-job, and a
    * per-component drop would silently skew the mean — the Sketches
    * NaN-defense rule applied row-wise). */
  def groupCentroids(df: DataFrame, keyCol: String, vecCol: String,
                     dim: Int): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    df.where(col(keyCol).isNotNull && col(vecCol).isNotNull &&
        size(col(vecCol)) === dim &&
        !exists(col(vecCol), x => x.isNull || isnan(x) || abs(x) >= 1e9))
      .select(col(keyCol), posexplode(col(vecCol)).as(Seq("d", "_v")))
      .groupBy(col(keyCol), col("d").cast("long").as("d"))
      .agg(sum(round(col("_v"), 6).cast("decimal(38,12)")).as("_s"),
        count(lit(1)).as("n"))
      .select(col(keyCol), col("d"),
        (expr(
          """(case when _s < 0 then -1L else 1L end) *
            |  (cast(abs(_s) * 1000000 as decimal(38,0)) div n)"""
            .stripMargin).cast("double") / lit(1e6)).as("c"),
        col("n"))
  }

  /** Simplified silhouette (Hruschka et al. 2004 — the centroid-based
    * variant of Rousseeuw 1987) per cluster — the internal clustering-
    * quality audit for the engine's cluster tiers (SemDeDup cells, kNN
    * components, label groups): for each point, a = cosine DISTANCE to
    * its own cluster's centroid, b = distance to the nearest OTHER
    * centroid, s = (b − a)/max(a, b) ∈ [−1, 1]. Unlike the full
    * silhouette's per-point pairwise scan (quadratic — unusable at
    * corpus scale), the centroid form is one cosine per (point,
    * centroid).
    *
    * Determinism: centroids are [[groupCentroids]]' decimal-exact means;
    * each cosine is [[cosine6]]; s is one fixed IEEE chain published as
    * floor(s·10⁶ + 0.5) micro-units (the q141 trick — half rounds
    * toward +∞), so sums and means stay in exact integers; the
    * per-cluster mean is integer division (both engines truncate toward
    * zero). s is NULL (excluded, counted in `n` but not `n_scored`)
    * when no other cluster exists.
    *
    * Scale shape: the centroid table is k·dim doubles and is BROADCAST
    * — k is a coarse-cluster count (the [[quantileBuckets]] caveat:
    * thresholds/centroids must fit a broadcast); scoring is a map-only
    * k-cosines-per-point pass whose per-point aggregate combines
    * map-side (the k rows of one point never leave their partition
    * unreduced); output is k rows. Output: (clusterCol, n BIGINT,
    * n_scored BIGINT, s_sum_ppm BIGINT, s_mean_ppm BIGINT). */
  def silhouetteSimplified(df: DataFrame, idCol: String, clusterCol: String,
                           vecCol: String, dim: Int): DataFrame = {
    val valid = df.where(col(clusterCol).isNotNull && col(vecCol).isNotNull &&
      size(col(vecCol)) === dim &&
      !exists(col(vecCol), x => x.isNull || isnan(x) || abs(x) >= 1e9))
    val centVec = groupCentroids(valid, clusterCol, vecCol, dim)
      .groupBy(col(clusterCol))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("c")))),
        s => s.getField("c")).as("_cvec"))
    val scored = valid.select(col(idCol), col(clusterCol), col(vecCol))
      .crossJoin(broadcast(centVec
        .select(col(clusterCol).as("_cc"), col("_cvec"))))
      .withColumn("_sim", cosine6(col(vecCol), col("_cvec")))
    val per = scored.groupBy(col(idCol), col(clusterCol))
      .agg(max(when(col("_cc") === col(clusterCol), col("_sim"))).as("_sa"),
        max(when(col("_cc") =!= col(clusterCol), col("_sim"))).as("_sb"))
    val a = lit(1.0) - col("_sa")
    val b = lit(1.0) - col("_sb")
    val s = when(greatest(a, b) > 0, (b - a) / greatest(a, b))
      .otherwise(lit(0.0))
    per
      .withColumn("_sppm", when(col("_sb").isNotNull,
        floor(s * lit(1000000.0) + lit(0.5)).cast("long")))
      .groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n"), count(col("_sppm")).as("n_scored"),
        sum(col("_sppm")).as("s_sum_ppm"))
      .withColumn("s_mean_ppm",
        when(col("n_scored") > 0, expr("s_sum_ppm div n_scored")))
  }

  /** kNN majority-vote classification — label new vectors from a labeled
    * corpus (the embedding-space classifier that needs no training: the
    * standard bootstrap for extending a small labeled set over a large
    * corpus): top-k cosine neighbors per query ([[bruteForceTopK]] — the
    * exact tier; swap the scoring side for [[pqTopKAgainstIndex]] at
    * corpus scale, the [[hardNegativesAgainstIndex]] composition), then
    * an integer vote with the deterministic tie rule (most votes, then
    * smallest label). The vote window orders ≤ k rows per query.
    * Output: (query_id, pred_label, votes BIGINT). */
  def knnClassify(queries: DataFrame, corpus: DataFrame, labelCol: String,
                  k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = bruteForceTopK(queries, corpus.select(col("id"), col("vec")), k)
    val voted = top
      .join(corpus.select(col("id").as("neighbor_id"),
        col(labelCol).as("_lab")), Seq("neighbor_id"))
      .groupBy(col("query_id"), col("_lab"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("_lab").asc)
    voted.withColumn("_r", row_number().over(w)).where(col("_r") === 1)
      .select(col("query_id"), col("_lab").as("pred_label"), col("votes"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic dedup at
    * the EMBEDDING level: coarse-cluster the corpus, then compare vectors
    * only WITHIN a cluster, dropping every vector that has a lower-id
    * cluster-mate at cosine ≥ `threshold`. This is the published
    * algorithm's shape exactly: the cluster bound turns the quadratic
    * all-pairs scan into k independent |cell|²-sized blocks (the paper
    * sizes k so cells stay ~10³–10⁴ rows), and the keep rule is
    * pair-ORIENTED — one representative (the lowest id) survives per
    * dup neighborhood, cross-cluster near-dups are missed BY DESIGN.
    * For orientation-invariant, chain-correct keeping, feed exact pairs
    * to [[graft.ops.Dedup.dedupFilter]] instead; SemDeDup is the scale
    * path that never materializes a global pair frame.
    *
    * `cents` is the frozen coarse quantizer ([[fitCentroids]] output, or
    * any deterministic centroid set) planted as plan literals — the
    * assignment pass is map-only, and the only shuffle is the
    * cell-keyed self-join. Sims are rounded to 6 dp BEFORE the threshold
    * compare so an oracle replays the boundary decision bit-for-bit.
    *
    * Output: one row per input vector — (idCol, cell INT, n_dups =
    * count of lower-id cell-mates at ≥ threshold, keep INT = 1 iff
    * n_dups = 0). Audit-friendly like [[graft.ops.Dedup.batchAdmission]]:
    * dropped rows stay visible with their evidence count. Zero-norm
    * vectors (cosine undefined — 0/0 is NaN, which sorts ABOVE every
    * real sim and throws under ANSI) skip the pair stage entirely and
    * publish (cell NULL, n_dups 0, keep 1): a zero vector is never
    * evidence for dropping anything, itself included — the [[knnGraph]]
    * exclusion with the keep side made explicit. */
  /** Per-vector int8 SCALAR quantization — the embedding-store compression
    * every serving stack applies before anything fancier (4 bytes → 1 byte
    * per dimension, ~4× smaller inverted lists than float32; PQ (q92) is
    * the next tier down): code_j = floor(v_j·127/absmax + 0.5), absmax the
    * vector's own ‖·‖∞ so codes always land in [-127, 127] — no clamp
    * branch to disagree over. `floor(x + 0.5)` instead of `round(x)` on
    * purpose: both engines evaluate the identical IEEE-754 double
    * expression tree (multiply, divide, add, floor — each bit-exact),
    * where round()'s half-case handling is implementation-defined.
    * Zero vectors quantize to all-zero codes (no 0/0).
    *
    * Output: (idCol, absmax DOUBLE, codes ARRAY<BIGINT>, max_abs_err
    * DOUBLE — the worst per-dimension reconstruction error, ≤
    * absmax/254 + ulp by construction, rounded 6 dp). Map-only
    * expression pack: no shuffle, no UDF, at any corpus size. */
  def scalarQuantizeInt8(vectors: DataFrame, idCol: String,
                         vecCol: String): DataFrame = {
    val am = array_max(transform(col(vecCol), x => abs(x)))
    def code(x: Column) =
      floor(x * lit(127.0) / col("_am") + lit(0.5))
    vectors.select(col(idCol), col(vecCol).as("_v"), am.as("_am"))
      .select(col(idCol), col("_am").as("absmax"),
        when(col("_am") === 0.0, transform(col("_v"), _ => lit(0L)))
          .otherwise(transform(col("_v"), x => code(x))).as("codes"),
        round(when(col("_am") === 0.0, lit(0.0)).otherwise(
          array_max(transform(col("_v"), x => abs(x -
            code(x).cast("double") * col("_am") / lit(127.0))))), 6)
          .as("max_abs_err"))
  }

  /** Embedding-level DECONTAMINATION of a training corpus against a
    * reference set (eval benchmarks, held-out suites): every corpus
    * vector with a reference vector at cosine ≥ `threshold` in its
    * coarse cell is flagged. Same geometry as [[semDedup]] — one frozen
    * quantizer, comparisons bounded to a cell — but the compare side is
    * a SECOND table, which is exactly the semantic train/test-overlap
    * check large-corpus pipelines run before training (the n-gram
    * lexical tier is [[graft.ops.Text.matchingSpans]]; this catches the
    * paraphrase-level leaks token matching misses).
    *
    * Scale shape: `refs` is the eval side — 10³–10⁶ rows against a
    * 100 TB corpus — so it is assigned, normed, and BROADCAST; the
    * corpus pass is then map-only (assignment is plan-literal centroid
    * math, the cell-equality predicate bounds the per-row compare count
    * to the ref cell's size, and the per-id evidence count is a
    * map-side-combined groupBy over corpus-id keys). Cross-cell leaks
    * are missed BY DESIGN, same contract as [[semDedup]] — widen by
    * assigning refs to multiple probe cells upstream if that matters.
    * Sims round to 6 dp BEFORE the threshold compare (engine-replayable
    * boundary).
    *
    * Output: one row per corpus vector — (idCol, cell INT, n_contam =
    * count of refs at ≥ threshold in the cell, keep INT = 1 iff 0).
    * Zero-norm rows (cosine undefined — NaN outranks every real sim,
    * ANSI throws on 0/0): a zero-norm CORPUS vector skips the compare
    * and publishes (cell NULL, n_contam 0, keep 1); a zero-norm REF is
    * dropped from the broadcast (it can't contaminate anything). Same
    * contract as [[semDedup]]. */
  def crossSemDedup(corpus: DataFrame, refs: DataFrame, idCol: String,
                    vecCol: String, cents: Seq[(Int, Seq[Double])],
                    threshold: Double): DataFrame = {
    require(cents.nonEmpty, "crossSemDedup: need at least one centroid")
    val c = corpus.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .select(col("_id"), col("_v"), norm(col("_v")).as("_n"))
      .select(col("_id"), col("_v"), col("_n"),
        when(col("_n") =!= 0.0, ivfCell(col("_v"), cents)).as("_cell"))
    val r = refs.select(col(idCol).as("_rid"), col(vecCol).as("_rv"))
      .select(col("_rid"), col("_rv"), norm(col("_rv")).as("_rn"))
      .where(col("_rn") =!= 0.0)
      .select(col("_rid"), col("_rv"), col("_rn"),
        ivfCell(col("_rv"), cents).as("_rcell"))
    val contam = c.join(broadcast(r), col("_cell") === col("_rcell"))
      .where(round(dot(col("_v"), col("_rv")) / (col("_n") * col("_rn")), 6)
        >= threshold)
      .groupBy(col("_id")).agg(count(lit(1)).as("n_contam"))
    c.join(contam, Seq("_id"), "left")
      .select(col("_id").as(idCol), col("_cell").as("cell"),
        coalesce(col("n_contam"), lit(0L)).as("n_contam"),
        col("n_contam").isNull.cast("int").as("keep"))
  }

  /** Brute-force top-k cosine over int8-QUANTIZED vectors — the serving
    * path that pairs with [[scalarQuantizeInt8]] (q141): score the codes
    * directly, never reconstructing floats. The per-vector absmax scale
    * CANCELS in cosine, so cosine(reconstructed q, reconstructed c) =
    * intdot(qcodes, ccodes) / (‖qcodes‖·‖ccodes‖) exactly — the score is
    * a pure function of the integer codes. Every intermediate is an
    * exact integer in double (codes ≤ 127, so a dot over dims ≤ 5×10⁸
    * stays under 2⁵³): the sum is order-independent, making this the
    * rare brute-force scorer that is bit-identical across engines with
    * NO rounding needed before the final 6-dp publish. Memory traffic is
    * the point at scale: 1 byte/dim streamed instead of 4 — the same
    * plan shape as [[bruteForceTopK]] (queries broadcast, corpus scan
    * map-only, salted two-phase top-k) at a quarter of the scan bytes.
    * All-zero vectors (absmax 0 → all-zero codes) publish sim 0.
    *
    * `qCodes` / `corpusCodes`: [[scalarQuantizeInt8]] output (idCol,
    * absmax, codes). Output: (query_id, neighbor_id, sim, rank 1..k by
    * (sim desc, id asc)); self-matches excluded. */
  def int8TopK(qCodes: DataFrame, corpusCodes: DataFrame, idCol: String,
               k: Int): DataFrame = {
    def prep(df: DataFrame, out: String, vec: String, nrm: String) =
      df.select(col(idCol).as(out),
          transform(col("codes"), _.cast("double")).as(vec))
        .withColumn(nrm, norm(col(vec)))
    val q = prep(qCodes, "query_id", "_qc", "_qn")
    val c = prep(corpusCodes, "neighbor_id", "_cc", "_cn")
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        when(col("_qn") * col("_cn") === 0.0, lit(0.0))
          .otherwise(round(dot(col("_qc"), col("_cc")) /
            (col("_qn") * col("_cn")), 6)).as("sim"))
    topKByQuery(scored, "neighbor_id", k)
  }

  /** Rank-biased overlap at depth k (Webber, Moffat & Zobel 2010, "A
    * Similarity Measure for Indefinite Rankings", eq. 5 truncated) between
    * two per-query rankings — the rank-SENSITIVE companion of
    * [[topKRecall]]: recall says WHETHER the approximate index returns
    * the right set, RBO says whether it returns it in the right ORDER,
    * weighting agreement at depth d by p^(d−1) (top-weighted: p=0.9
    * puts ~⅔ of the mass in the top 10). Per query:
    * {{{
    *   RBO_k = Σ_{d=1..k} round(w_d · round(1/d, 6), 6) · |A_d ∩ B_d|
    *   w_d   = round(p^(d−1) · (1−p) / (1−p^k), 6)   (normalized to Σ≈1)
    * }}}
    * where A_d/B_d are each run's top-d sets. Since |A_d ∩ B_d| counts
    * the matches whose max(rankA, rankB) ≤ d, the sum regroups as one
    * exact-decimal TAIL lookup per matched item ([[rboTail]] — k plan
    * literals, shared with the SQL oracle), summed AS DECIMAL. Queries
    * present in `runA` but absent from `runB` score 0 (same contract as
    * [[topKRecall]]'s dropped-query rule).
    *
    * Scale shape: the (query, item) equi-join touches only k-bounded
    * rows per query on each side; the depth profile is one k-wide
    * map-side explode of the MATCHED rows (≤ k per query) + a
    * map-side-combined groupBy — no windows, no per-query task holding
    * anything unbounded.
    *
    * `runA`/`runB`: (query_id, neighbor_id, rank) with rank 1..k (the
    * shape every top-k op here publishes). Output: (query_id, rbo). */
  def rankBiasedOverlap(runA: DataFrame, runB: DataFrame, k: Int,
                        p: Double = 0.9): DataFrame = {
    require(k > 0, "rankBiasedOverlap: k must be positive")
    require(p > 0 && p < 1, "rankBiasedOverlap: p must be in (0,1)")
    val tail = rboTail(k, p)
    val a = runA.select(col("query_id"), col("neighbor_id"),
      col("rank").as("_ra"))
    val b = runB.select(col("query_id"), col("neighbor_id"),
      col("rank").as("_rb"))
    val matched = a.join(b, Seq("query_id", "neighbor_id"))
      .select(col("query_id"),
        greatest(col("_ra"), col("_rb")).cast("int").as("_md"))
    val contrib = (2 to k).foldLeft(
      when(col("_md") === 1, lit(tail(0).toDouble))) { (acc, md) =>
      acc.when(col("_md") === md, lit(tail(md - 1).toDouble))
    }
    val scores = matched
      .select(col("query_id"), contrib.cast("decimal(18,6)").as("_c"))
      .groupBy(col("query_id"))
      .agg(round(sum(col("_c")).cast("double"), 6).as("rbo"))
    a.select(col("query_id")).distinct()
      .join(scores, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("rbo"), lit(0.0)).as("rbo"))
  }

  /** Kendall rank correlation (τ-a, Kendall 1938) between two ranked
    * runs per query — the pairwise-ORDER companion to
    * [[rankBiasedOverlap]] (RBO scores top-weighted overlap; τ asks
    * whether the two runs order the SHARED items the same way — an
    * index/reranker audit reads both: high RBO with low τ means the
    * same candidates in a scrambled order). Computed over docs present
    * in BOTH runs (the standard top-k treatment): per shared-doc pair
    * i < j, concordant when both runs order them identically, else
    * discordant; τ = (C − D)/(C + D). Ranks within one run are strict
    * by contract (row_number-produced), so ties cannot occur and
    * C + D = n(n−1)/2 exactly.
    *
    * Published as SIGNED integer ppm — sign(C−D)·((|C−D|·10⁶) div
    * (C+D)) — one integral division of exact counts (`div` ≡ DuckDB
    * `//`, trunc ≡ floor after the sign split; a rounded double ratio
    * is the q171 divergence class). NULL when fewer than two shared
    * docs (no pair to order). Queries sharing NO docs emit no row
    * (there is no order to correlate — [[rankBiasedOverlap]] publishes
    * their overlap-0 story).
    *
    * Scale shape: one (query, doc) equi-join, then a per-query
    * self-join bounded by k² pairs per query (k is the runs' own top-k
    * — an eval/serving constant, the [[graft.ops.Scoring.ndcgAtK]]
    * argument), one map-side-combined aggregate. Output: (query_id,
    * n_common BIGINT, concordant BIGINT, discordant BIGINT, tau_ppm
    * BIGINT). */
  def kendallTau(runA: DataFrame, runB: DataFrame): DataFrame = {
    val a = runA.select(col("query_id"), col("neighbor_id"),
      col("rank").cast("long").as("_ra"))
    val b = runB.select(col("query_id"), col("neighbor_id"),
      col("rank").cast("long").as("_rb"))
    val m = a.join(b, Seq("query_id", "neighbor_id"))
    val l = m.select(col("query_id"), col("neighbor_id").as("_di"),
      col("_ra").as("_rai"), col("_rb").as("_rbi"))
    val r = m.select(col("query_id"), col("neighbor_id").as("_dj"),
      col("_ra").as("_raj"), col("_rb").as("_rbj"))
    val pairs = l.join(r, Seq("query_id")).where(col("_di") < col("_dj"))
    val counts = m.groupBy(col("query_id")).agg(count(lit(1)).as("n_common"))
    val conc = (col("_rai") < col("_raj")) === (col("_rbi") < col("_rbj"))
    val cd = pairs.groupBy(col("query_id")).agg(
      sum(when(conc, 1L).otherwise(0L)).as("concordant"),
      sum(when(conc, 0L).otherwise(1L)).as("discordant"))
    counts.join(cd, Seq("query_id"), "left")
      .select(col("query_id"), col("n_common"),
        coalesce(col("concordant"), lit(0L)).as("concordant"),
        coalesce(col("discordant"), lit(0L)).as("discordant"))
      .withColumn("tau_ppm",
        when(col("n_common") >= 2, expr(
          """(case when concordant < discordant then -1L else 1L end) *
            |  ((abs(concordant - discordant) * cast(1000000 as bigint))
            |     div (concordant + discordant))""".stripMargin)))
  }

  /** The per-match-depth contribution table behind [[rankBiasedOverlap]]:
    * a match first counted at depth md contributes w_d/d for every
    * d ≥ md, so RBO_k = Σ_matches tail(md). Each w_d and each 1/d is
    * 6-dp-rounded before the product, and the tail sum is an exact
    * decimal — exposed so an external SQL oracle interpolates the
    * IDENTICAL literals (the shared-constant lockstep convention). */
  private[graft] def rboTail(k: Int, p: Double): Seq[BigDecimal] = {
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val wd = (1 to k).map(d =>
      r6(math.pow(p, d - 1) * (1 - p) / (1 - math.pow(p, k))).toDouble)
    (1 to k).map(md =>
      (md to k).map(d => r6(wd(d - 1) * r6(1.0 / d).toDouble)).sum)
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
    * Parallel Corpus Mining with Multilingual Sentence Embeddings", §3.2
    * ratio margin) — the parallel-pair miner of multilingual training
    * data: a raw cosine threshold can't separate translations from
    * hubness artifacts (some vectors are close to EVERYTHING), so each
    * pair's sim is normalized by the mean of both endpoints' k-NN
    * neighborhoods: margin(x,y) = cos(x,y) / ((μₖ(x)+μₖ(y))/2). Published
    * per source item: its best-margin target, with `mutual` = 1 when the
    * target's best-margin source is this item back (mutual argmax — the
    * paper's highest-precision retrieval mode).
    *
    * Determinism: sims round to 6 dp then enter ALL further arithmetic
    * as exact integer micro-units (floor(sim·10⁶ + 0.5) — the q141
    * convention), so each neighborhood is an exact integer (sum, count)
    * pair and the margin publishes as SIGNED integer ppm: margin_ppm =
    * sign(num) · ((|num|·10⁶) div den) with num = su·2·nx·ny, den =
    * sx·ny + sy·nx — ONE integral division of exact integers (`div` ≡
    * DuckDB `//`; sign split so trunc ≡ floor on non-negative operands).
    * Never round(num/den, 6): an integer-ratio double rounded to 6 dp is
    * the q171 divergence class — engines legitimately disagree on
    * round()'s direction within a half-ulp of a 0.5e-6 boundary. Pairs
    * whose denominator is ≤ 0 (anticorrelated neighborhoods — no
    * meaningful ratio) are excluded rather than published with a flipped
    * sign. Zero-norm vectors are dropped on both sides.
    *
    * Scale shape: the src side is the bounded query batch —
    * broadcast, so every tgt-side pass is map-only ([[bruteForceTopK]]'s
    * plan shape); per-side μₖ and the argmaxes are salted two-phase
    * top-k (no per-key task ever holds a full candidate set); the
    * per-tgt mean joins back by key WITHOUT a broadcast hint (the tgt
    * side is corpus-sized — AQE decides). The |src|×|tgt| score frame is
    * never materialized — each consumer branch recomputes the map-only
    * scan. For corpora where even that is too hot, bound candidates
    * first with [[knnGraph]]'s cell geometry and run the margin on its
    * edges.
    *
    * Output: (src_id, tgt_id, sim, margin_ppm BIGINT, mutual INT) — one
    * row per src vector with at least one positive-margin candidate. */
  def marginPairs(src: DataFrame, tgt: DataFrame, idCol: String,
                  vecCol: String, k: Int): DataFrame = {
    require(k > 0, "marginPairs: k must be positive")
    val s = src.select(col(idCol).as("src_id"), col(vecCol).as("_sv"),
        norm(col(vecCol)).as("_sn"))
      .where(col("_sn") =!= 0.0)
    val t0 = tgt.select(col(idCol).as("tgt_id"), col(vecCol).as("_tv"),
        norm(col(vecCol)).as("_tn"))
      .where(col("_tn") =!= 0.0)
    // The tgt side is the map-only stream of every pass below; a corpus
    // that arrives in fewer splits than the cluster has slots (one small
    // parquet file → ONE task doing |src|×|tgt| dot products serially)
    // would leave everything else idle. Spread it once — hash on the id,
    // deterministic — and only ever UP: at scale the scan already has
    // more partitions than this and the repartition is a no-op branch.
    val slots = tgt.sparkSession.sparkContext.defaultParallelism
    val t = if (t0.rdd.getNumPartitions < slots)
      t0.repartition(slots, col("tgt_id")) else t0
    def scored = t.crossJoin(broadcast(s))
      .select(col("src_id"), col("tgt_id"),
        round(dot(col("_sv"), col("_tv")) / (col("_sn") * col("_tn")), 6)
          .as("sim"))
      .withColumn("_su", floor(col("sim") * lit(1000000.0) + lit(0.5))
        .cast("long"))
    def sumTopK(keyCol: String, otherCol: String,
                sOut: String, nOut: String): DataFrame =
      boundedTopK(scored.withColumnRenamed(keyCol, "query_id"), otherCol,
          col("sim"), k)
        .groupBy(col("query_id"))
        .agg(sum(col("_su")).as(sOut), count(lit(1)).as(nOut))
        .select(col("query_id").as(keyCol), col(sOut), col(nOut))
    val mx = sumTopK("src_id", "tgt_id", "_sx", "_nx")
    val my = sumTopK("tgt_id", "src_id", "_sy", "_ny")
    val margins = scored
      .join(broadcast(mx), Seq("src_id"))
      .join(my, Seq("tgt_id"))
      .withColumn("_den",
        col("_sx") * col("_ny") + col("_sy") * col("_nx"))
      .withColumn("_mnum",
        col("_su") * lit(2L) * col("_nx") * col("_ny"))
      .withColumn("margin_ppm",
        when(col("_den") > 0, expr(
          """(case when _mnum < 0 then -1L else 1L end) *
            |  ((cast(abs(_mnum) as decimal(38,0)) * 1000000)
            |     div _den)""".stripMargin)))
      .where(col("margin_ppm").isNotNull)
    val fwd = boundedTopK(margins.withColumnRenamed("src_id", "query_id"),
        "tgt_id", col("margin_ppm"), 1)
      .select(col("query_id").as("src_id"), col("tgt_id"), col("sim"),
        col("margin_ppm"))
    val bwd = boundedTopK(margins.withColumnRenamed("tgt_id", "query_id"),
        "src_id", col("margin_ppm"), 1)
      .select(col("src_id"), col("query_id").as("tgt_id"), lit(1).as("_mut"))
    fwd.join(bwd, Seq("src_id", "tgt_id"), "left")
      .select(col("src_id"), col("tgt_id"), col("sim"), col("margin_ppm"),
        coalesce(col("_mut"), lit(0)).as("mutual"))
  }

  /** Per-dimension embedding-store statistics — the health monitor every
    * vector corpus needs BEFORE index builds and similarity math trust
    * it: a collapsed dimension (variance ≈ 0 — a dead unit or a
    * defaulted field), a runaway dimension (extreme min/max — an
    * unnormalized ingest batch), or a shifted mean (mixed encoder
    * versions) silently poisons every cosine downstream; per-dimension
    * moments catch all three in one pass. Vectors shorter than `dim`
    * fail loudly (the PQ-tier `vecChecked` contract).
    *
    * Determinism: sums of x and x² accumulate AS DECIMAL(38,12) (the
    * [[groupCentroids]] convention — exact, order-free); the published
    * moments are integer ppm via integral division of the exact sums
    * (sign split on the mean so trunc ≡ floor on non-negative operands;
    * `div` ≡ DuckDB `//` — a rounded double ratio is the q171
    * divergence class). The SECOND MOMENT is published rather than the
    * variance — var = m2 − mean² needs a square of a rational, which no
    * integral scheme keeps exact; the consumer derives it in one IEEE
    * step from two exact integers. min/max are exact doubles.
    *
    * Scale shape: one posexplode pass with map-side partial aggregation
    * — the shuffle carries dim × partial-aggregate rows, never vectors;
    * output is dim rows. Output: (d INT, n, mean_ppm BIGINT signed,
    * m2_ppm BIGINT, min_x, max_x). */
  def embeddingStats(vectors: DataFrame, idCol: String, vecCol: String,
                     dim: Int): DataFrame = {
    require(dim > 0, "embeddingStats: dim must be positive")
    val dec = "decimal(38,12)"
    val ex = vectors.select(posexplode(
      vecChecked(col(vecCol), dim, "embeddingStats")).as(Seq("d", "_x")))
    ex.groupBy(col("d"))
      .agg(count(lit(1)).as("n"),
        sum(col("_x").cast(dec)).as("_s"),
        sum((col("_x") * col("_x")).cast(dec)).as("_ss"),
        min(col("_x")).as("min_x"),
        max(col("_x")).as("max_x"))
      .select(col("d"), col("n"),
        expr(
          """(case when _s < 0 then -1L else 1L end) *
            |  ((abs(_s) * 1000000) div n)""".stripMargin).as("mean_ppm"),
        expr("(_ss * 1000000) div n").as("m2_ppm"),
        col("min_x"), col("max_x"))
  }

  /** Cell-bounded k-nearest-neighbor GRAPH over the embedding corpus —
    * the bridge from the vector tier to the graph tier: kNN edges feed
    * [[graft.ops.Dedup.connectedComponents]] (semantic clusters),
    * [[graft.ops.Graph.labelPropagation]] (communities), or
    * [[graft.ops.Graph.pageRankFixedPoint]] (centrality in embedding
    * space) — the NN-graph clustering recipe used for corpus topic
    * discovery. Same geometry as [[semDedup]]: a frozen coarse quantizer
    * assigns cells map-only, neighbors are ranked only WITHIN a cell
    * (k independent |cell|² blocks, never a global pair frame), so
    * cross-cell edges are missed BY DESIGN — size the quantizer so cells
    * hold ~10³–10⁴ rows. Zero-norm vectors are excluded from both sides
    * (cosine undefined; a NaN would outrank real sims in a desc sort).
    *
    * Output: directed kNN edges (idCol, neighbor_id, sim, rank 1..k by
    * (sim desc, id asc)); per-query ranking is the salted two-phase
    * top-k, so no task holds a cell's full candidate set. */
  def knnGraph(vectors: DataFrame, idCol: String, vecCol: String,
               cents: Seq[(Int, Seq[Double])], k: Int): DataFrame = {
    require(cents.nonEmpty, "knnGraph: need at least one centroid")
    require(k > 0, "knnGraph: k must be positive")
    // Zero-norm rows drop BEFORE the cell assignment: ivfCell divides by
    // the row norm, and under ANSI mode 0/0 throws in the same projection
    // regardless of a later filter.
    val base = vectors.select(col(idCol).as("_id"), col(vecCol).as("_v"),
        norm(col(vecCol)).as("_n"))
      .where(col("_n") =!= 0.0)
      .select(col("_id"), col("_v"), col("_n"),
        ivfCell(col("_v"), cents).as("_cell"))
    val o = base.select(col("_cell").as("_bcell"), col("_id").as("_bid"),
      col("_v").as("_bv"), col("_n").as("_bn"))
    val scored = base.join(o,
        col("_cell") === col("_bcell") && col("_id") =!= col("_bid"))
      .select(col("_id").as("query_id"), col("_bid").as("neighbor_id"),
        round(dot(col("_v"), col("_bv")) / (col("_n") * col("_bn")), 6)
          .as("sim"))
    topKByQuery(scored, "neighbor_id", k)
      .select(col("query_id").as(idCol), col("neighbor_id"), col("sim"),
        col("rank"))
  }

  def semDedup(vectors: DataFrame, idCol: String, vecCol: String,
               cents: Seq[(Int, Seq[Double])],
               threshold: Double): DataFrame = {
    require(cents.nonEmpty, "semDedup: need at least one centroid")
    // _cell is when-guarded on the norm: ivfCell divides by it, and a
    // zero-norm row must neither throw (ANSI 0/0) nor join the pair
    // stage (NULL cell never equi-matches) — see the contract above.
    val withCell = vectors.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .select(col("_id"), col("_v"), norm(col("_v")).as("_n"))
      .select(col("_id"), col("_v"), col("_n"),
        when(col("_n") =!= 0.0, ivfCell(col("_v"), cents)).as("_cell"))
    val lo = withCell.select(col("_cell").as("_bcell"), col("_id").as("_bid"),
      col("_v").as("_bv"), col("_n").as("_bn"))
    val dupCounts = withCell.join(lo,
        col("_cell") === col("_bcell") && col("_bid") < col("_id"))
      .where(round(dot(col("_v"), col("_bv")) / (col("_n") * col("_bn")), 6)
        >= threshold)
      .groupBy(col("_id")).agg(count(lit(1)).as("n_dups"))
    withCell.join(dupCounts, Seq("_id"), "left")
      .select(col("_id").as(idCol), col("_cell").as("cell"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        col("n_dups").isNull.cast("int").as("keep"))
  }
}
