package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** ANN / similarity-search specs with hand-computed cosine values. */
class SimilaritySpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.9, 0.1, 0.0)),   // close to 1
      (3L, Seq(0.0, 1.0, 0.0)),   // orthogonal to 1
      (4L, Seq(-1.0, 0.0, 0.0)))  // opposite to 1
      .toDF("id", "vec")
  }

  test("cosine6: exact hand-computed values") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0)), (Seq(1.0, 2.0), Seq(2.0, 4.0)))
      .toDF("a", "b")
    val out = df.select(Similarity.cosine6(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(out(0) == 0.0)
    assert(out(1) == 1.0)
  }

  test("bruteForceTopK: correct neighbor order, self excluded, broadcast plan") {
    val q = vecs.where(col("id") === 1)
    val out = Similarity.bruteForceTopK(q, vecs, k = 3)
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val got = out.orderBy("rank").collect().map(r => r.getLong(1)).toSeq
    assert(got == Seq(2L, 3L, 4L)) // by descending cosine: 0.993, 0.0, -1.0
    assert(!got.contains(1L))
  }

  test("srpTopK: same-bucket neighbors found with exact cosine values") {
    val out = Similarity.srpTopK(vecs, dim = 3, nPlanes = 2, k = 3)
      .where(col("query_id") === 1).collect()
    // Bucketing is approximate: whatever is returned must carry exact cosine.
    out.foreach { r =>
      assert(r.getDouble(2) <= 1.0 && r.getDouble(2) >= -1.0)
      assert(r.getLong(0) != r.getLong(1))
    }
  }

  test("srpNearDupPairs: subset of exact pairs, near-identical vectors caught") {
    import spark.implicits._
    // 20 base vectors + a jittered copy of each: 20 planted near-dup pairs
    // with cosine ~0.999, plus unrelated cross pairs.
    val rnd = new scala.util.Random(3)
    val base = (0L until 20L).map(i => i -> Seq.fill(16)(rnd.nextGaussian()))
    val all = base.flatMap { case (i, v) =>
      Seq((i, v), (i + 100L, v.map(_ + rnd.nextGaussian() * 0.01)))
    }
    val df = all.toDF("id", "vec")
    val exact = Similarity.cosineNearDupPairs(df, threshold = 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.srpNearDupPairs(df, dim = 16, planesPerTable = 4,
        tables = 8, threshold = 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Precision 1.0 (every LSH pair is exact-verified) …
    assert(lsh.subsetOf(exact))
    // … and recall on the planted near-identical pairs is high.
    val planted = (0L until 20L).map(i => (i, i + 100L)).toSet
    assert(planted.subsetOf(exact))
    val caught = planted.intersect(lsh).size
    assert(caught >= 18, s"only $caught/20 planted near-dups caught")
  }

  test("SRP degenerate corpus: hot buckets dropped, bounded candidates") {
    import spark.implicits._
    // All-identical vectors — every row lands in ONE sign-pattern bucket.
    // Without the maxBucket guard the self-join is quadratic (n²/2 pairs);
    // with it the degenerate bucket is dropped entirely, so both paths
    // complete with ZERO candidate pairs instead of 19900.
    val degenerate = (0L until 200L).map(i => (i, Seq.fill(8)(1.0))).toDF("id", "vec")
    val pairs = Similarity.srpNearDupPairs(degenerate, dim = 8,
      planesPerTable = 4, tables = 4, threshold = 0.9, maxBucket = 50)
    assert(pairs.count() == 0)
    val topk = Similarity.srpTopK(degenerate, dim = 8, nPlanes = 8, k = 3,
      maxBucket = 50)
    assert(topk.count() == 0)
    // Sanity: with the guard above the population size, results flow again.
    val small = (0L until 20L).map(i => (i, Seq.fill(8)(1.0))).toDF("id", "vec")
    assert(Similarity.srpNearDupPairs(small, dim = 8, planesPerTable = 4,
      tables = 4, threshold = 0.9).count() == 20 * 19 / 2)
  }

  test("fitCentroids: Lloyd iterations recover planted cluster centers") {
    import spark.implicits._
    // Two tight clusters far apart; k-means from worst-case init (both
    // seeds in cluster A, ids 0 and 1) must still split them in 3 rounds.
    val a = (0L until 50L).map(i => (i, Seq(10.0 + 0.01 * i, 0.0, 0.0)))
    val b = (50L until 100L).map(i => (i, Seq(0.0, 10.0 + 0.01 * (i - 50), 0.0)))
    val corpus = (a ++ b).toDF("id", "vec")
    val cents = Similarity.fitCentroids(corpus, k = 2, iters = 3)
    // One centroid near each cluster mean (x~10.25 / y~10.25).
    val xs = cents.map(_._2)
    assert(xs.exists(c => math.abs(c(0) - 10.245) < 0.5 && c(1) < 1.0))
    assert(xs.exists(c => math.abs(c(1) - 10.245) < 0.5 && c(0) < 1.0))
    // And the fitted quantizer routes queries to pure cells via ivfTopK.
    val res = Similarity.ivfTopK(corpus.where($"id" === 10L || $"id" === 60L),
      corpus, cents, nprobe = 1, k = 5).collect()
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ(10L).map(_.getLong(1)).forall(_ < 50L))
    assert(byQ(60L).map(_.getLong(1)).forall(_ >= 50L))
  }

  test("ivfTopK: probed-cell neighbors exact, self excluded, cells honored") {
    import spark.implicits._
    // Two well-separated clusters around orthogonal axes; centroids = one
    // representative of each. Queries land in their own cluster's cell, so
    // with nprobe=1 only same-cluster neighbors can appear.
    def v(axis: Int, eps: Double) =
      Seq.tabulate(4)(i => if (i == axis) 1.0 else eps)
    val corpus = (
      (0L until 10L).map(i => (i, v(0, 0.01 * i))) ++
      (10L until 20L).map(i => (i, v(2, 0.01 * (i - 10))))
    ).toDF("id", "vec")
    val cents = Seq(0 -> v(0, 0.0), 1 -> v(2, 0.0))
    val res = Similarity.ivfTopK(
      corpus.where($"id" === 0L || $"id" === 15L), corpus, cents,
      nprobe = 1, k = 3).collect()
    val byQuery = res.groupBy(_.getLong(0))
    // Query 0 (cluster A) only sees cluster-A ids; query 15 only cluster B.
    assert(byQuery(0L).map(_.getLong(1)).forall(_ < 10L))
    assert(byQuery(15L).map(_.getLong(1)).forall(id => id >= 10L && id != 15L))
    // Plan shape: probes broadcast, corpus never moves before the join.
    val plan = Similarity.ivfTopK(corpus.limit(2), corpus, cents, 1, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(300))
    // Ranks are 1..3 and sims non-increasing.
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3))
      val sims = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("persisted IVF index: probe batches served from storage match the " +
      "in-plan path, corpus never re-read") {
    import spark.implicits._
    val corpus = (0L until 60L)
      .map(i => (i, Seq.tabulate(4)(j => math.sin(i * 0.7 + j) + (if (j == (i % 4).toInt) 2.0 else 0.0))))
      .toDF("id", "vec")
    val cents = Similarity.fitCentroids(corpus, k = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-spec").toString
    // Fit once, assign once, write — the minHashSignatures contract.
    Similarity.ivfIndex(corpus, cents)
      .write.mode("overwrite").partitionBy("_cell").parquet(s"$dir/assign")
    Similarity.ivfCentroidsDf(spark, cents)
      .write.mode("overwrite").parquet(s"$dir/cents")
    val storedCents = Similarity.ivfCentroidsFrom(spark.read.parquet(s"$dir/cents"))
    assert(storedCents == cents) // quantizer round-trips exactly
    // TWO probe batches against the stored index, each matching ivfTopK.
    for (batch <- Seq(Seq(3L, 17L), Seq(8L, 44L, 59L))) {
      val queries = corpus.where(col("id").isin(batch: _*))
      val fromIndex = Similarity.ivfTopKAgainstIndex(queries,
          spark.read.parquet(s"$dir/assign"), storedCents, nprobe = 2, k = 5)
        .collect().map(_.toString).sorted.toSeq
      val inPlan = Similarity.ivfTopK(queries, corpus, cents, nprobe = 2, k = 5)
        .collect().map(_.toString).sorted.toSeq
      assert(fromIndex == inPlan, s"batch $batch")
    }
    // The stored path's scan set is the index files (corpus is an
    // in-memory relation here; the plan must read parquet from $dir only).
    val plan = Similarity.ivfTopKAgainstIndex(corpus.limit(1),
      spark.read.parquet(s"$dir/assign"), storedCents, 1, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains(new java.io.File(s"$dir/assign").getName), plan.take(400))
  }

  test("ivfCellDrift + ivfCentroidRefresh: drifted cells refit to member " +
      "means and migrate, result equals full re-assignment, undrifted " +
      "cells untouched, repeat refresh is a no-op") {
    import spark.implicits._
    def u(deg: Double) = {
      val r = math.toRadians(deg); Seq(math.cos(r), math.sin(r))
    }
    // stale quantizer: cents at 0°/90°/180°; cell-0 mass sits at ~35°,
    // cell-1 mass at ~65° (both drifted), cell-2 mass ON its centroid
    val corpus = Seq(
      (0L, u(30)), (1L, u(35)), (2L, u(40)),
      (10L, u(60)), (11L, u(65)), (12L, u(70)),
      (20L, u(180)), (21L, u(180)), (22L, u(180))).toDF("id", "vec")
    val cents = Seq(0 -> u(0), 1 -> u(90), 2 -> u(180))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfref").toString
    try {
      Similarity.ivfIndex(corpus, cents)
        .write.mode("overwrite").partitionBy("_cell").parquet(s"$dir/ivf")
      val report = Similarity.ivfCellDrift(
          spark.read.parquet(s"$dir/ivf"), cents, driftPpm = 50000L)
        .orderBy("cell").collect()
      assert(report.map(r => r.getInt(0) -> r.getInt(3)).toSeq ==
        Seq(0 -> 1, 1 -> 1, 2 -> 0), report.mkString("\n"))
      assert(report(2).getLong(2) == 0L) // on-centroid mass: zero drift

      val (newCents, drifted) = Similarity.ivfCentroidRefresh(
        spark, s"$dir/ivf", cents, driftPpm = 50000L)
      assert(drifted == Seq(0, 1))
      assert(newCents(2) == 2 -> u(180)) // undrifted centroid verbatim
      // every drifted centroid moved to its members' (round-6) mean
      assert(newCents(0)._2.head > 0.7 && newCents(0)._2(1) > 0.5)

      // the maintained index IS the full re-assignment under newCents
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(col("id"), col("vec"), col("_n"),
            col("_cell").cast("int"))
          .collect().map(_.toString).sorted.toSeq
      val stored = spark.read.parquet(s"$dir/ivf")
      assert(rows(stored) == rows(Similarity.ivfIndex(corpus, newCents)))

      // and it serves equal to the in-plan path under the new quantizer
      val queries = corpus.where(col("id").isin(1L, 11L, 20L))
      def serve(r: Seq[org.apache.spark.sql.Row]) =
        r.map(_.toString).sorted.toSeq
      assert(serve(Similarity.ivfTopKAgainstIndex(queries, stored,
          newCents, nprobe = 2, k = 3).collect().toSeq) ==
        serve(Similarity.ivfTopK(queries, corpus, newCents,
          nprobe = 2, k = 3).collect().toSeq))

      // refit centroids now sit ON their mass: repeat refresh is a no-op
      val (again, d2) = Similarity.ivfCentroidRefresh(
        spark, s"$dir/ivf", newCents, driftPpm = 50000L)
      assert(d2.isEmpty && again == newCents)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("ivfCompact: refresh leaves a stray in an undrifted cell, compact " +
      "moves it (rewriting only the losing cell), result equals a fresh " +
      "build, second compact is a no-op") {
    import spark.implicits._
    def u(deg: Double) = {
      val r = math.toRadians(deg); Seq(math.cos(r), math.sin(r))
    }
    // cents 0°/90°. Cell-0 mass at ~40° (drifts, refits to its mean).
    // Cell 1: three members ON 90° (no drift) plus a STRAY at 50° —
    // after the refresh moves cent 0 to ~40°, the stray is closer to the
    // moved centroid, but refreshes never re-assign undrifted cells:
    // the documented miss class this op closes.
    val corpus = Seq(
      (0L, u(35)), (1L, u(40)), (2L, u(45)),
      (10L, u(85)), (11L, u(90)), (12L, u(95)),
      (13L, u(50))).toDF("id", "vec")
    val cents = Seq(0 -> u(0), 1 -> u(90))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfcmp").toString
    try {
      Similarity.ivfIndex(corpus, cents)
        .write.mode("overwrite").partitionBy("_cell").parquet(s"$dir/ivf")
      val (newCents, drifted) = Similarity.ivfCentroidRefresh(
        spark, s"$dir/ivf", cents, driftPpm = 50000L)
      assert(drifted == Seq(0), s"only cell 0 drifts: $drifted")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(col("id"), col("vec"), col("_n"),
            col("_cell").cast("int"))
          .collect().map(_.toString).sorted.toSeq
      val fresh = rows(Similarity.ivfIndex(corpus, newCents))
      // the miss class is REAL on this fixture: the stray keeps cell 1
      assert(rows(spark.read.parquet(s"$dir/ivf")) != fresh,
        "fixture must exhibit the refresh miss class")
      // compact: only the losing cell (1) is rewritten
      val rewritten = Similarity.ivfCompact(spark, s"$dir/ivf", newCents)
      assert(rewritten == Seq(1), rewritten.toString)
      assert(rows(spark.read.parquet(s"$dir/ivf")) == fresh)
      // serve-equality with the in-plan path after the full cycle
      val queries = corpus.where(col("id").isin(1L, 13L))
      def serve(r: Seq[org.apache.spark.sql.Row]) =
        r.map(_.toString).sorted.toSeq
      assert(serve(Similarity.ivfTopKAgainstIndex(queries,
          spark.read.parquet(s"$dir/ivf"), newCents, nprobe = 2, k = 3)
          .collect().toSeq) ==
        serve(Similarity.ivfTopK(queries, corpus, newCents,
          nprobe = 2, k = 3).collect().toSeq))
      // already compact: second pass touches nothing
      assert(Similarity.ivfCompact(spark, s"$dir/ivf", newCents).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("pqCentroidRefresh: a stray parked in a cell by an earlier " +
      "refresh migrates when that cell drifts — never silently dropped") {
    import spark.implicits._
    def u(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r), math.sin(r), math.cos(r), math.sin(r))
    }
    // cell-0 mass at ~40° (drifts in round 1); cell 1 holds three
    // on-axis members, a 70° member that will pull its refreshed mean,
    // and the 50° STRAY whose fresh assignment flips to the moved
    // centroid after round 1 while its stored row stays in cell 1.
    val corpus = Seq(
      (0L, u(35)), (1L, u(40)), (2L, u(45)),
      (10L, u(85)), (11L, u(90)), (12L, u(95)), (14L, u(70)),
      (13L, u(50))).toDF("id", "vec")
    val cents = Seq(0 -> u(0), 1 -> u(90))
    val books = Similarity.pqFitCodebooks(corpus, dim = 4, m = 2, ksub = 4,
      iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-pqstray").toString
    try {
      Similarity.pqIndexResidual(
          Similarity.ivfIndex(corpus, cents), 4, 2, books, cents)
        .write.mode("overwrite").partitionBy("_cell").parquet(s"$dir/pq")
      // refresh 1: only cell 0 drifts (to ~40°). The 50° stray stays in
      // STORED cell 1 (the miss class) although it now fresh-assigns to
      // the moved centroid — the EXACT precondition of the loss scenario.
      val (c1, d1) = Similarity.pqCentroidRefresh(spark, s"$dir/pq",
        corpus, dim = 4, m = 2, books = books, cents = cents,
        driftPpm = 50000L, residual = true)
      assert(d1 == Seq(0))
      // refresh 2: the 70° member keeps cell 1's fresh mean ~5° off its
      // centroid (~3760 ppm), so a lower threshold flags cell 1 — and
      // cell 1's STORED partition still holds the stray, whose fresh
      // assignment under the current centroids is cell 0. A rewrite
      // frame filtered by the fresh assignment would omit it while
      // deleting its partition.
      val (c2, d2) = Similarity.pqCentroidRefresh(spark, s"$dir/pq",
        corpus, dim = 4, m = 2, books = books, cents = c1,
        driftPpm = 3000L, residual = true)
      assert(d2 == Seq(1), d2.toString)
      val ids = spark.read.parquet(s"$dir/pq")
        .select(col("id")).collect().map(_.getLong(0)).toSet
      assert(ids.contains(13L), "the stray must survive its cell's refresh")
      assert(ids.size == 8, s"no row may be lost or duplicated: $ids")
      // and the store equals the full rebuild under the newest centroids
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(col("id"), col("_n"), col("_codes"),
            col("_cell").cast("int"))
          .collect().map(_.toString).sorted.toSeq
      assert(rows(spark.read.parquet(s"$dir/pq")) ==
        rows(Similarity.pqIndexResidual(
          Similarity.ivfIndex(corpus, c2), 4, 2, books, c2)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("pqCompact: a stray's residual codes re-encode at its new cell, " +
      "only the losing cell rewrites, result equals a full rebuild, " +
      "second compact is a no-op, never-indexed rows stay out") {
    import spark.implicits._
    def u(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r), math.sin(r), math.cos(r), math.sin(r))
    }
    // the ivfCompact geometry: cell-0 mass at ~40° drifts; cell 1 has
    // three on-axis members plus a 50° stray that the refresh leaves
    // behind and the compact must move (re-encoding its RESIDUAL codes
    // against the moved centroid).
    val corpus = Seq(
      (0L, u(35)), (1L, u(40)), (2L, u(45)),
      (10L, u(85)), (11L, u(90)), (12L, u(95)),
      (13L, u(50))).toDF("id", "vec")
    val cents = Seq(0 -> u(0), 1 -> u(90))
    val books = Similarity.pqFitCodebooks(corpus, dim = 4, m = 2, ksub = 4,
      iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-pqcmp").toString
    try {
      Similarity.pqIndexResidual(
          Similarity.ivfIndex(corpus, cents), 4, 2, books, cents)
        .write.mode("overwrite").partitionBy("_cell").parquet(s"$dir/pq")
      val (newCents, drifted) = Similarity.pqCentroidRefresh(spark,
        s"$dir/pq", corpus, dim = 4, m = 2, books = books, cents = cents,
        driftPpm = 50000L, residual = true)
      assert(drifted == Seq(0))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(col("id"), col("_n"), col("_codes"),
            col("_cell").cast("int"))
          .collect().map(_.toString).sorted.toSeq
      val rebuilt = rows(Similarity.pqIndexResidual(
        Similarity.ivfIndex(corpus, newCents), 4, 2, books, newCents))
      assert(rows(spark.read.parquet(s"$dir/pq")) != rebuilt,
        "fixture must exhibit the refresh miss class")
      // a never-appended corpus row must not be admitted by the compact
      val intruder = corpus.unionByName(Seq((99L, u(52))).toDF("id", "vec"))
      val rewritten = Similarity.pqCompact(spark, s"$dir/pq", intruder,
        dim = 4, m = 2, books = books, cents = newCents, residual = true)
      assert(rewritten == Seq(1), rewritten.toString)
      assert(rows(spark.read.parquet(s"$dir/pq")) == rebuilt)
      assert(!spark.read.parquet(s"$dir/pq").select(col("id"))
        .collect().map(_.getLong(0)).contains(99L))
      // already compact: nothing to do
      assert(Similarity.pqCompact(spark, s"$dir/pq", corpus, 4, 2, books,
        newCents, residual = true).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("pqCentroidRefresh: refuses (before any delete) when a drifted " +
      "cell's stored row has no vector in the supplied corpus") {
    import spark.implicits._
    def u(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r), math.sin(r), math.cos(r), math.sin(r))
    }
    // cell 0 mass at ~40° → drifts; stored cell 0 holds ids {0,1,2}
    val corpus = Seq(
      (0L, u(35)), (1L, u(40)), (2L, u(45)), (10L, u(90))).toDF("id", "vec")
    val cents = Seq(0 -> u(0), 1 -> u(90))
    val books = Similarity.pqFitCodebooks(corpus, dim = 4, m = 2, ksub = 4,
      iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-pqmiss").toString
    try {
      Similarity.pqIndexResidual(
          Similarity.ivfIndex(corpus, cents), 4, 2, books, cents)
        .write.mode("overwrite").partitionBy("_cell").parquet(s"$dir/pq")
      // corpus missing stored id 1: the refresh cannot re-encode that row,
      // so it must refuse loudly (r18 advisory — the old semi-join deleted
      // the partition and silently lost the row)
      val ex = intercept[IllegalArgumentException] {
        Similarity.pqCentroidRefresh(spark, s"$dir/pq",
          corpus.where(col("id") =!= 1L), dim = 4, m = 2, books = books,
          cents = cents, driftPpm = 50000L, residual = true)
      }
      assert(ex.getMessage.contains("have no vector"), ex.getMessage)
      // refusal happened BEFORE the partition delete: store intact
      assert(spark.read.parquet(s"$dir/pq").count() == 4L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("pqCentroidRefresh: drifted cells re-encode against their moved " +
      "centroid (residual layout), result equals a full rebuild, " +
      "undrifted partitions untouched") {
    import spark.implicits._
    def u(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r), math.sin(r), math.cos(r), math.sin(r))
    }
    val corpus = Seq(
      (0L, u(30)), (1L, u(35)), (2L, u(40)),   // drifts off cent 0 (0°)
      (10L, u(60)), (11L, u(65)), (12L, u(70)), // drifts off cent 1 (90°)
      (20L, u(180)), (21L, u(180)), (22L, u(180))).toDF("id", "vec")
    val cents = Seq(0 -> u(0), 1 -> u(90), 2 -> u(180))
    val books = Similarity.pqFitCodebooks(corpus, dim = 4, m = 2, ksub = 4,
      iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-pqref").toString
    try {
      Similarity.pqIndexResidual(
          Similarity.ivfIndex(corpus, cents), 4, 2, books, cents)
        .write.mode("overwrite").partitionBy("_cell").parquet(s"$dir/pq")
      val (newCents, drifted) = Similarity.pqCentroidRefresh(spark,
        s"$dir/pq", corpus, dim = 4, m = 2, books = books, cents = cents,
        driftPpm = 50000L, residual = true)
      assert(drifted == Seq(0, 1))
      assert(newCents(2) == 2 -> u(180))
      // the maintained compressed index IS the full rebuild under
      // newCents — including the re-encoded residual codes
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(col("id"), col("_n"), col("_codes"),
            col("_cell").cast("int"))
          .collect().map(_.toString).sorted.toSeq
      val stored = spark.read.parquet(s"$dir/pq")
      val rebuilt = Similarity.pqIndexResidual(
        Similarity.ivfIndex(corpus, newCents), 4, 2, books, newCents)
      assert(rows(stored) == rows(rebuilt))
      // repeat refresh: centroids sit on their mass, nothing to do
      val (again, d2) = Similarity.pqCentroidRefresh(spark, s"$dir/pq",
        corpus, 4, 2, books, newCents, driftPpm = 50000L, residual = true)
      assert(d2.isEmpty && again == newCents)
      // membership comes from the STORED index: a corpus row never
      // appended (id 99, landing in a drifted cell) must NOT be admitted
      // by a refresh — refreshes move existing rows, appends add new ones
      val intruder = corpus.unionByName(
        Seq((99L, u(32))).toDF("id", "vec"))
      val (_, d3) = Similarity.pqCentroidRefresh(spark, s"$dir/pq",
        intruder, 4, 2, books, cents, driftPpm = 50000L, residual = true)
      assert(d3.nonEmpty, "intruder pulls cell 0 back into drift")
      val ids = spark.read.parquet(s"$dir/pq")
        .select(col("id")).collect().map(_.getLong(0)).toSet
      assert(!ids.contains(99L),
        "refresh must not admit rows absent from the stored index")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("ivfIndexAppend / pqIndexAppend: appended index serves equal to a " +
      "full build; re-seen and null ids drop; re-append is a no-op") {
    import spark.implicits._
    val all = (0L until 60L)
      .map(i => (i, Seq.tabulate(4)(j =>
        math.sin(i * 0.7 + j) + (if (j == (i % 4).toInt) 2.0 else 0.0))))
    val corpus = all.toDF("id", "vec")
    val cents = Similarity.fitCentroids(corpus, k = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-annapp").toString
    try {
      // full-vector IVF: build on the first half, append the rest plus
      // 10 RE-SEEN rows and a null id — only the genuinely new ids land
      Similarity.ivfIndex(corpus.where(col("id") < 30), cents)
        .write.mode("overwrite").partitionBy("_cell").parquet(s"$dir/ivf")
      val delta = (all.drop(30) ++ all.take(10))
        .map { case (i, v) => (java.lang.Long.valueOf(i), v) }
        .:+((null.asInstanceOf[java.lang.Long], all.head._2))
        .toDF("id", "vec")
      Similarity.ivfIndexAppend(spark, delta, cents, s"$dir/ivf")
      val stored = spark.read.parquet(s"$dir/ivf")
      assert(stored.count() == 60 &&
        stored.select("id").distinct().count() == 60)
      val queries = corpus.where(col("id").isin(3L, 44L, 59L))
      def serve(idx: org.apache.spark.sql.DataFrame) =
        Similarity.ivfTopKAgainstIndex(queries, idx, cents, nprobe = 2, k = 5)
          .collect().map(_.toString).sorted.toSeq
      assert(serve(stored) ==
        serve(Similarity.ivfIndex(corpus, cents)))
      // idempotent: re-appending the same delta changes nothing
      Similarity.ivfIndexAppend(spark, delta, cents, s"$dir/ivf")
      assert(spark.read.parquet(s"$dir/ivf").count() == 60)

      // PQ layout: same contract through the compressed encoder
      val emb = fixtureEmb
      val books = Similarity.pqFitCodebooks(emb, dim = 64, m = 8, ksub = 16,
        iters = 2, maxSample = 200)
      val pcents = Similarity.fitCentroids(emb, k = 8, iters = 2,
        maxSample = 200)
      Similarity.pqIndex(
          Similarity.ivfIndex(emb.where(col("id") < 250), pcents),
          64, 8, books)
        .write.mode("overwrite").partitionBy("_cell").parquet(s"$dir/pq")
      Similarity.pqIndexAppend(spark,
        emb.where(col("id") >= 200), // 50-row overlap with the stored half
        dim = 64, m = 8, books = books, cents = pcents,
        indexDir = s"$dir/pq")
      val pqStored = spark.read.parquet(s"$dir/pq")
      val full = Similarity.pqIndex(Similarity.ivfIndex(emb, pcents),
        64, 8, books)
      assert(pqStored.count() == full.count() &&
        pqStored.select("id").distinct().count() == full.count())
      val pq = emb.where(col("id") % 50 === 0)
      def servePq(idx: org.apache.spark.sql.DataFrame) =
        Similarity.pqTopKAgainstIndex(pq, idx, emb, pcents,
          books = books, dim = 64, m = 8, nprobe = 4, rerank = 40, k = 10)
          .collect().map(_.toString).sorted.toSeq
      assert(servePq(pqStored) == servePq(full))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  /** The q92 fixture view: 500 × 64-dim embeddings as array<double>. */
  private def fixtureEmb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"),
      transform(col("embedding"), _.cast("double")).as("vec"))

  test("PQ codebooks/codes: valid shape, deterministic fit, codebook round-trip") {
    val emb = fixtureEmb
    val books = Similarity.pqFitCodebooks(emb, dim = 64, m = 32, ksub = 16,
      iters = 2)
    assert(books.size == 32 * 16)
    assert(books.forall(_._3.size == 2)) // dsub = 64/32
    // Deterministic: a second fit is byte-identical (lowest-id init, no
    // runtime randomness anywhere).
    assert(Similarity.pqFitCodebooks(emb, 64, 32, 16, 2) == books)
    // Codebook storage round-trips exactly.
    val df = Similarity.pqCodebooksDf(spark, books)
    assert(Similarity.pqCodebooksFrom(df) == books)
    // Codes are length-m arrays over [0, ksub).
    val codes = Similarity.pqIndex(
        Similarity.ivfIndex(emb, Seq((0, Seq.fill(64)(0.1)))), 64, 32, books)
      .select(col("_codes")).collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.size == 32 && c.forall(x => x >= 0 && x < 16)))
  }

  test("PQ index compression: stored PQ index is a fraction of the full-vector index") {
    val emb = fixtureEmb
    val cents = emb.where(col("id") < 16).orderBy(col("id")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1))).toSeq
    val books = Similarity.pqFitCodebooks(emb, 64, 32, 16, iters = 1)
    val full = Similarity.ivfIndex(emb, cents)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-spec").toString
    full.write.mode("overwrite").partitionBy("_cell").parquet(s"$dir/full")
    Similarity.pqIndex(full, 64, 32, books)
      .write.mode("overwrite").partitionBy("_cell").parquet(s"$dir/pq")
    def bytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length else 0L
      walk(new java.io.File(p))
    }
    val (fb, pb) = (bytes(s"$dir/full"), bytes(s"$dir/pq"))
    // 64 float64s (512 B raw) collapse to 32 small ints + a norm; parquet
    // encoding overhead still leaves a large multiple.
    assert(pb * 4 < fb, s"PQ index $pb B not <1/4 of full index $fb B")
    // The storage round trip is result-invisible (the ivfIndex/q73
    // contract): probes served from the written parquet + a round-tripped
    // codebook table equal the in-plan path exactly.
    Similarity.pqCodebooksDf(spark, books)
      .write.mode("overwrite").parquet(s"$dir/books")
    val storedBooks = Similarity.pqCodebooksFrom(spark.read.parquet(s"$dir/books"))
    assert(storedBooks == books)
    val queries = emb.where(col("id") % 100 === 0)
    def run(idx: org.apache.spark.sql.DataFrame,
            bks: Seq[(Int, Int, Seq[Double])]) =
      Similarity.pqTopKAgainstIndex(queries, idx, emb, cents, bks, 64, 32,
          nprobe = 16, rerank = 60, k = 5)
        .collect().map(_.toString).sorted.toSeq
    assert(run(spark.read.parquet(s"$dir/pq"), storedBooks) ==
      run(Similarity.pqIndex(full, 64, 32, books), books))
  }

  test("PQ + ADC + exact re-rank equals brute force on the fixture, with margin") {
    val emb = fixtureEmb
    val cents = emb.where(col("id") < 16).orderBy(col("id")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1))).toSeq
    val books = Similarity.pqFitCodebooks(emb, 64, 32, 16, iters = 2)
    val pqIdx = Similarity.pqIndex(Similarity.ivfIndex(emb, cents), 64, 32, books)
    val queries = emb.where(col("id") % 50 === 0)
    val want = Similarity.bruteForceTopK(queries, emb, k = 10)
      .select("query_id", "neighbor_id", "sim", "rank")
      .collect().map(_.toString).sorted.toSeq
    // Plan shape: probes (with their ADC tables) broadcast into the code
    // rows — the corpus-side index never moves for a query batch.
    val plan = Similarity.pqTopKAgainstIndex(queries, pqIdx, emb, cents,
        books, 64, 32, nprobe = 16, rerank = 80, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    // The q92 configuration (rerank=80) must reproduce brute force, and so
    // must a 25%-smaller shortlist — the recall margin assertion: exactness
    // is not sitting on the cliff edge of the rerank budget. (rerank=40
    // drops three rank-8..10 tail neighbors on this fixture — that is the
    // measured cliff, which 80 clears 2x over.)
    for (rerank <- Seq(80, 60)) {
      val got = Similarity.pqTopKAgainstIndex(queries, pqIdx, emb, cents,
          books, 64, 32, nprobe = 16, rerank = rerank, k = 10)
        .select("query_id", "neighbor_id", "sim", "rank")
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, s"PQ@rerank=$rerank diverged from brute force")
    }
  }

  test("residual (IVF-PQ) encoding: brute-force-exact at the q92 budget, " +
      "tighter ADC shortlist than raw-vector PQ at the rerank cliff") {
    val emb = fixtureEmb
    // Residual encoding's premise is that the coarse centroid EXPLAINS
    // part of the vector — which needs real cell means (fitCentroids),
    // not the arbitrary lowest-id corpus vectors the q92 fixture uses as
    // cells (residuals w.r.t. a random other vector are LARGER than the
    // raw vector, and measurably degrade ADC — verified while writing
    // this test). Both paths get the same quantizer, so the comparison
    // isolates raw-vs-residual code content.
    val cents = Similarity.fitCentroids(emb, k = 16, iters = 2)
    val idx = Similarity.ivfIndex(emb, cents)
    val rawBooks = Similarity.pqFitCodebooks(emb, 64, 32, 16, iters = 2)
    val resBooks = Similarity.pqFitCodebooksResidual(emb, cents, 64, 32, 16,
      iters = 2)
    val rawIdx = Similarity.pqIndex(idx, 64, 32, rawBooks)
    val resIdx = Similarity.pqIndexResidual(idx, 64, 32, resBooks, cents)
    val queries = emb.where(col("id") % 50 === 0)
    val want = Similarity.bruteForceTopK(queries, emb, k = 10)
      .select("query_id", "neighbor_id", "sim", "rank")
      .collect().map(_.toString).sorted.toSeq
    def run(pqIdx: org.apache.spark.sql.DataFrame,
            books: Seq[(Int, Int, Seq[Double])],
            residual: Option[Seq[(Int, Seq[Double])]], rerank: Int) =
      Similarity.pqTopKAgainstIndex(queries, pqIdx, emb, cents, books,
          64, 32, nprobe = 16, rerank = rerank, k = 10,
          residualCents = residual)
        .select("query_id", "neighbor_id", "sim", "rank")
        .collect().map(_.toString).sorted.toSeq
    // Exact at the q92 rerank budget and at the 25%-margin budget.
    for (rerank <- Seq(80, 60))
      assert(run(resIdx, resBooks, Some(cents), rerank) == want,
        s"residual PQ@rerank=$rerank diverged from brute force")
    // Residuals spend the identical code budget on the variance the
    // coarse quantizer didn't explain — at the raw path's measured cliff
    // (rerank=40 drops tail neighbors on this fixture) the residual
    // shortlist must retain at least as many true top-10 rows.
    val wantSet = want.toSet
    val rawHit = run(rawIdx, rawBooks, None, 40).toSet.intersect(wantSet).size
    val resHit = run(resIdx, resBooks, Some(cents), 40).toSet
      .intersect(wantSet).size
    info(s"true rows retained at rerank=40: raw=$rawHit residual=$resHit of ${want.size}")
    assert(rawHit < want.size, "fixture no longer exhibits the raw-PQ cliff")
    assert(resHit > rawHit,
      s"residual encoding did not improve ADC recall ($resHit vs $rawHit)")
  }

  test("PQ input validation: short vectors and undersized corpora fail loudly") {
    import spark.implicits._
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
    // A vec shorter than dim used to surface as an opaque NPE at the
    // means collect (PqEncode's null-code contract); now it names the op.
    val bad = Seq((1L, Seq(1.0, 2.0)), (2L, Seq.fill(64)(0.5)))
      .toDF("id", "vec")
    val e = intercept[Exception] {
      Similarity.pqFitCodebooks(bad, dim = 64, m = 32, ksub = 2, iters = 1)
    }
    assert(chain(e).contains("pqFitCodebooks: embedding shorter than dim=64"),
      chain(e).take(400))
    // Null codes must not silently poison a stored index either.
    val e2 = intercept[Exception] {
      Similarity.pqIndex(
        Similarity.ivfIndex(bad, Seq((0, Seq(1.0, 0.0)))),
        dim = 64, m = 32,
        Seq.tabulate(32, 16)((s, c) => (s, c, Seq(0.0, 0.0))).flatten)
        .collect()
    }
    assert(chain(e2).contains("pqIndex: embedding shorter than dim=64"),
      chain(e2).take(400))
    // Fewer corpus rows than ksub fails at seeding with a clear message,
    // not later inside the codebook-shape require.
    val tiny = Seq((1L, Seq.fill(64)(0.5))).toDF("id", "vec")
    val e3 = intercept[IllegalArgumentException] {
      Similarity.pqFitCodebooks(tiny, 64, 32, 16, iters = 1)
    }
    assert(e3.getMessage.contains("need at least ksub=16"))
  }

  test("hardNegatives: same-cluster near-dups excluded, ranks contiguous") {
    import spark.implicits._
    // q0 and d1 are near-identical AND share cluster c0: d1 must NOT
    // appear among q0's negatives even though it is the most similar.
    // d2 is similar but in another cluster -> the rank-1 negative.
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0)),   // query, cluster 0
      (1L, Seq(0.999, 0.001, 0.0)), // near-dup of 0, cluster 0
      (2L, Seq(0.9, 0.1, 0.0)),   // similar, own cluster
      (3L, Seq(0.0, 1.0, 0.0)),   // orthogonal, own cluster
      (4L, Seq(-1.0, 0.0, 0.0))   // opposite, own cluster
    ).toDF("id", "vec")
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 2L), (3L, 3L), (4L, 4L))
      .toDF("vec_id", "cluster_id")
    val got = Similarity.hardNegatives(vecs.where($"id" === 0L), vecs,
        clusters, "vec_id", "cluster_id", k = 3)
      .collect().map(r => (r.getLong(1), r.getInt(3))).sortBy(_._2)
    assert(got.map(_._1).toSeq == Seq(2L, 3L, 4L),
      s"expected cluster-excluded ranking, got ${got.toSeq}")
    assert(got.map(_._2).toSeq == Seq(1, 2, 3), "ranks contiguous after exclusion")
    // ids missing from the cluster table are singletons: only the self
    // match is excluded
    val noCl = Similarity.hardNegatives(vecs.where($"id" === 0L), vecs,
        Seq.empty[(Long, Long)].toDF("vec_id", "cluster_id"), "vec_id",
        "cluster_id", k = 4)
      .collect().map(_.getLong(1)).toSet
    assert(noCl == Set(1L, 2L, 3L, 4L))
    // dense cluster INDICES must not collide with unclustered raw ids:
    // query 0 sits in cluster index 2; corpus item 2 is absent from the
    // cluster table — its singleton label "i:2" differs from "c:2", so
    // it stays a valid negative.
    val dense = Seq((0L, 2L), (1L, 2L)).toDF("vec_id", "cluster_id")
    val denseGot = Similarity.hardNegatives(vecs.where($"id" === 0L), vecs,
        dense, "vec_id", "cluster_id", k = 4)
      .collect().map(_.getLong(1)).toSet
    assert(denseGot == Set(2L, 3L, 4L), s"dense-index collision: $denseGot")
    // duplicate cluster rows (pair-derived tables repeat ids) must not
    // fan a negative into multiple ranks
    val dup = Seq((0L, 0L), (1L, 0L), (2L, 2L), (2L, 2L), (2L, 9L))
      .toDF("vec_id", "cluster_id")
    val dupGot = Similarity.hardNegatives(vecs.where($"id" === 0L), vecs,
        dup, "vec_id", "cluster_id", k = 5)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(dupGot.map(_._1).distinct.length == dupGot.length,
      s"duplicate negative ranks: ${dupGot.toSeq}")
    assert(dupGot.map(_._2).sorted.toSeq == (1 to dupGot.length).toSeq)
  }

  test("sampled ANN fits: layout-invariant, full-width sample equals the " +
      "unsampled fit, sampled codebooks still serve brute-force-exact") {
    val emb = fixtureEmb // 500 rows
    // The md5-ordered sample is a pure function of the ids: any
    // partitioning/ordering of the input fits identical codebooks.
    val books = Similarity.pqFitCodebooks(emb, 64, 32, 16, iters = 1,
      maxSample = 256)
    assert(Similarity.pqFitCodebooks(emb.repartition(7), 64, 32, 16, 1,
      256) == books)
    // maxSample >= |corpus| is the whole corpus: byte-equal to unsampled.
    assert(Similarity.pqFitCodebooks(emb, 64, 32, 16, 1, 4096) ==
      Similarity.pqFitCodebooks(emb, 64, 32, 16, 1))
    val cents = Similarity.fitCentroids(emb, k = 4, iters = 2,
      maxSample = 256)
    assert(Similarity.fitCentroids(emb.repartition(5), 4, 2, 256) == cents)
    assert(Similarity.fitCentroids(emb, 4, 2, 4096) ==
      Similarity.fitCentroids(emb, 4, 2))
    // A genuinely-sub-corpus fit (256 of 500) still reproduces the brute
    // force top-k at the q92 rerank margin: sampling moves ADC scores,
    // never the exact re-ranked answer.
    val qs = emb.where(col("id") % 50 === 0)
    val ivfCents = emb.where(col("id") < 16).orderBy(col("id")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1))).toSeq
    val pqIdx = Similarity.pqIndex(Similarity.ivfIndex(emb, ivfCents),
      64, 32, books)
    val got = Similarity.pqTopKAgainstIndex(qs, pqIdx, emb, ivfCents, books,
        64, 32, nprobe = 16, rerank = 80, k = 10)
      .collect().map(_.toString).sorted.toSeq
    val want = Similarity.bruteForceTopK(qs, emb, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want, "sampled-fit PQ diverged from brute force")
  }

  test("hardNegativesAgainstIndex: equals brute-force mining; cluster-mates " +
      "topping the ADC shortlist are excluded without eating rerank budget") {
    import spark.implicits._
    val emb = fixtureEmb
    // 100 near-clones of query 0's vector, all in query 0's cluster: they
    // top the ADC ranking for query 0 BY CONSTRUCTION, and there are more
    // of them than the whole rerank budget (60) — if exclusion ran after
    // the shortlist cut, query 0's shortlist would be clones only and the
    // query would get zero (or wrong) negatives.
    val q0vec = emb.where(col("id") === 0L).collect()(0).getSeq[Double](1)
    val rnd = new scala.util.Random(11)
    val clones = (0 until 100)
      .map(i => (10000L + i, q0vec.map(_ + rnd.nextGaussian() * 1e-4)))
      .toDF("id", "vec")
    val corpus = emb.unionByName(clones)
    val clusters = ((0 until 100).map(i => (10000L + i, 0L)) :+ ((0L, 0L)))
      .toDF("vec_id", "cluster_id")
    val queries = emb.where(col("id") % 100 === 0)
    val cents = emb.where(col("id") < 16).orderBy(col("id")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1))).toSeq
    val books = Similarity.pqFitCodebooks(emb, 64, 32, 16, iters = 2)
    val pqIdx = Similarity.pqIndex(Similarity.ivfIndex(corpus, cents),
      64, 32, books)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sorted.toSeq
    val got = rows(Similarity.hardNegativesAgainstIndex(queries, pqIdx,
      corpus, cents, books, dim = 64, m = 32, nprobe = 16, rerank = 60,
      k = 5, clusters, "vec_id", "cluster_id"))
    val want = rows(Similarity.hardNegatives(queries, corpus, clusters,
      "vec_id", "cluster_id", k = 5))
    assert(got == want, s"index-served mining diverged from brute force")
    // Query 0 got its full k ranks and no clone appears anywhere.
    assert(got.count(_._1 == 0L) == 5)
    assert(!got.exists(_._2 >= 10000L), s"clone leaked into negatives")
  }

  test("top-k tails: salted two-phase windows, byte-equal to the naive window") {
    import org.apache.spark.sql.expressions.Window
    val emb = fixtureEmb
    val queries = emb.where(col("id") % 100 === 0)
    val out = Similarity.bruteForceTopK(queries, emb, k = 5)
    // Plan shape: TWO window nodes — a local rank partitioned by
    // (query_id, pmod(xxhash64(id), fanout)) that bounds any single task to
    // ~|candidates|/fanout rows, then the global per-query rank over the
    // <= k*fanout survivors. A single per-query window (one task holding a
    // full query's candidate set — |corpus| rows here) must NOT appear.
    val plan = out.queryExecution.executedPlan.toString
    assert("windowspecdefinition".r.findAllIn(plan).size == 2, plan.take(2000))
    assert(plan.contains("xxhash64") && plan.contains("pmod"), plan.take(2000))
    // Spark's own WindowGroupLimit kicks in on both phases (map-side
    // partial top-k before each exchange) — keep it that way.
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    // Byte-equality with the naive single-window ranking over the same
    // scored set (the order is total, so two-phase is exact, not approx).
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
    val naive = emb.select(col("id").as("neighbor_id"), col("vec").as("cv"))
      .crossJoin(q).where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine6(col("qv"), col("cv")).as("sim"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id").asc)))
      .where(col("rank") <= 5)
    assert(out.collect().map(_.toString).sorted.toSeq ==
      naive.collect().map(_.toString).sorted.toSeq)
  }

  test("groupCentroids: exact means, malformed rows dropped, layout-invariant") {
    import spark.implicits._
    val rows = Seq(
      ("a", Seq(1.0, 2.0)), ("a", Seq(3.0, 5.0)), ("b", Seq(10.0, -2.5)),
      ("a", Seq(0.25)),            // wrong length -> dropped
      ("b", null.asInstanceOf[Seq[Double]]), // null vec -> dropped
      (null.asInstanceOf[String], Seq(7.0, 7.0))) // null key -> dropped
      .toDF("k", "vec")
    def run(parts: Int) = Similarity.groupCentroids(
        rows.repartition(parts), "k", "vec", dim = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    val got = run(3)
    assert(got == Map(
      ("a", 0L) -> ((2.0, 2L)), ("a", 1L) -> ((3.5, 2L)),
      ("b", 0L) -> ((10.0, 1L)), ("b", 1L) -> ((-2.5, 1L))))
    assert(run(1) == got, "layout must not change centroids")
  }

  test("kendallTau: identity +1e6, reversal -1e6, hand-computed mix, " +
      "sub-two-shared NULL, disjoint runs emit no row") {
    import spark.implicits._
    def run(rows: (String, Long, Int)*) =
      rows.toSeq.toDF("query_id", "neighbor_id", "rank")
    // q1: identical order → τ = 1; q2: full reversal of 3 shared docs →
    // τ = −1; q3: one swapped adjacent pair of 4 shared docs →
    // C=5, D=1 → τ = 4/6 → 666666 ppm (trunc); q4: single shared doc →
    // NULL; q5: no shared docs → no row.
    val a = run(
      ("q1", 1L, 1), ("q1", 2L, 2),
      ("q2", 1L, 1), ("q2", 2L, 2), ("q2", 3L, 3),
      ("q3", 1L, 1), ("q3", 2L, 2), ("q3", 3L, 3), ("q3", 4L, 4),
      ("q4", 1L, 1), ("q4", 2L, 2),
      ("q5", 1L, 1))
    val b = run(
      ("q1", 1L, 1), ("q1", 2L, 2),
      ("q2", 1L, 3), ("q2", 2L, 2), ("q2", 3L, 1),
      ("q3", 2L, 1), ("q3", 1L, 2), ("q3", 3L, 3), ("q3", 4L, 4),
      ("q4", 1L, 5), ("q4", 9L, 1),
      ("q5", 7L, 1))
    val got = Similarity.kendallTau(a, b).orderBy("query_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) Long.MinValue else r.getLong(4)))
    assert(got.toSeq == Seq(
      ("q1", 2L, 1L, 0L, 1000000L),
      ("q2", 3L, 0L, 3L, -1000000L),
      ("q3", 4L, 5L, 1L, 666666L),
      ("q4", 1L, 0L, 0L, Long.MinValue)), got.mkString(","))
    assert(!got.exists(_._1 == "q5"), "disjoint runs must emit no row")
  }

  test("topKRecall: per-truth-query hits, missing queries score 0, " +
      "short truth lists use their own denominator") {
    import spark.implicits._
    val truth = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),  // k=4 ground truth
      (2L, 20L), (2L, 21L),                         // only 2 exact rows
      (3L, 30L), (3L, 31L), (3L, 32L), (3L, 33L)
    ).toDF("query_id", "neighbor_id")
    val approx = Seq(
      (1L, 10L), (1L, 12L), (1L, 99L), (1L, 98L),  // 2/4 hit
      (2L, 20L), (2L, 21L), (2L, 97L), (2L, 96L),  // 2/2 despite junk
      (4L, 40L)                                     // not in truth: ignored
      // query 3 entirely missing from approx -> recall 0
    ).toDF("query_id", "neighbor_id")
    val got = Similarity.topKRecall(approx, truth).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 2L, 4L, 500000L), (2L, 2L, 2L, 1000000L), (3L, 0L, 4L, 0L)))
  }

  test("scalarQuantizeInt8: hand-computed codes, range bound, zero-vector " +
      "guard, reconstruction error exact") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, -0.5, 0.0)),
      (2L, Seq(0.0, 0.0, 0.0)),   // zero vector: no 0/0
      (3L, Seq(-2.0, 1.0, 0.25))  // negative absmax carrier
    ).toDF("id", "vec")
    val got = Similarity.scalarQuantizeInt8(df, "id", "vec")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Long](2),
        r.getDouble(3)))
    assert(got(0) == ((1L, 1.0, Seq(127L, -63L, 0L), 0.003937)))
    assert(got(1) == ((2L, 0.0, Seq(0L, 0L, 0L), 0.0)))
    assert(got(2)._2 == 2.0 && got(2)._3 == Seq(-127L, 64L, 16L))
    // every code in [-127, 127] by construction (no clamp branch)
    assert(got.flatMap(_._3).forall(c => c >= -127L && c <= 127L))
    // worst error bounded by half a quantization step (+ rounding slack)
    assert(got.forall(r => r._4 <= r._2 / 254.0 + 1e-6))
  }

  test("ivfCell kernel matches the composed argmax it replaced, " +
      "tie-break and NaN ordering included") {
    import spark.implicits._
    // The r18 IvfCellAssign loop kernel replaced the array_max-over-structs
    // form (which blew the 64 KB generated-method limit at 64 cells × 32
    // dims once two assignments shared a stage). This pin rebuilds the
    // composed expression verbatim and asserts cell-for-cell equality on
    // an adversarial fixture: random vectors, an exact rounded tie
    // (smallest cid must win), and a zero vector (the composed form threw
    // ANSI DIVIDE_BY_ZERO; the kernel must keep failing loudly so the
    // unguarded callers — ivfIndex/compact/refresh — don't silently admit
    // zero vectors into a cell).
    def composed(cents: Seq[(Int, Seq[Double])]) =
      array_max(array(cents.map { case (cid, cv) =>
        val cl = array(cv.map(lit): _*)
        struct(round(Similarity.dot(col("vec"), cl) /
            (Similarity.norm(col("vec")) * sqrt(Similarity.dot(cl, cl))), 6)
          .as("s"), lit(-cid).as("c"))
      }: _*)).getField("c") * lit(-1)
    val rnd = new scala.util.Random(42)
    val dim = 16
    val cents = (0 until 32).map(c =>
      (c, Seq.fill(dim)(rnd.nextGaussian())))
    val rows = (0L until 200L).map(i => (i, Seq.fill(dim)(rnd.nextGaussian())))
    val df = rows.toDF("id", "vec")
    val diff = df.select(col("id"),
        graft.plans.IvfCellAssign.cell(col("vec"), cents).as("k"),
        composed(cents).as("e"))
      .where(col("k") =!= col("e")).count()
    assert(diff == 0L, s"$diff kernel/composed cell mismatches")
    // exact tie: (1,1) is 0.707107 against BOTH axis centroids → cid 0;
    // a NaN ELEMENT makes every sim NaN — Spark's double ordering puts
    // NaN above everything, ties resolve to the smallest cid, and the
    // kernel's ascending strict-compare scan must agree with the
    // composed struct max
    val tieCents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
    val tied = Seq((1L, Seq(1.0, 1.0)), (2L, Seq(Double.NaN, 1.0)))
      .toDF("id", "vec")
      .select(col("id"),
        graft.plans.IvfCellAssign.cell(col("vec"), tieCents).as("k"),
        composed(tieCents).as("e")).orderBy("id").collect()
    assert(tied(0).getInt(1) == 0 && tied(0).getInt(2) == 0, tied(0).toString)
    assert(tied(1).getInt(1) == tied(1).getInt(2), tied(1).toString)
    // zero vector: kernel raises (composed threw ANSI DIVIDE_BY_ZERO)
    val zeroEx = intercept[Exception] {
      Seq((2L, Seq(0.0, 0.0))).toDF("id", "vec")
        .select(graft.plans.IvfCellAssign.cell(col("vec"), tieCents))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++
        msgs(e.getCause))
    assert(msgs(zeroEx).exists(_.contains("zero-norm vector")), zeroEx.toString)
    // zero-norm centroid rejected at plan build, not at run time
    val badCent = intercept[IllegalArgumentException] {
      graft.plans.IvfCellAssign.cell(col("vec"),
        Seq((0, Seq(0.0, 0.0)), (1, Seq(0.0, 1.0))))
    }
    assert(badCent.getMessage.contains("zero norm"), badCent.getMessage)
  }

  test("semDedup: lowest-id survivor per within-cell neighborhood, " +
      "cross-cell near-dups missed by contract, audit counts exact") {
    import spark.implicits._
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
    val df = Seq(
      // cell 0 neighborhood: 10 survives, 11 and 12 drop (n_dups 1 and 2)
      (10L, Seq(1.0, 0.0)),
      (11L, Seq(0.99, 0.01)),
      (12L, Seq(0.98, 0.02)),
      // cell 1 singleton: no mate, keeps
      (20L, Seq(0.01, 1.0)),
      // cross-cell near-dup pair: cos(30,31) ≈ 0.9997 but they straddle
      // the cell boundary — BOTH keep (the documented SemDeDup miss)
      (30L, Seq(0.72, 0.69)),
      (31L, Seq(0.69, 0.72))
    ).toDF("id", "vec")
    val got = Similarity.semDedup(df, "id", "vec", cents, threshold = 0.9)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      (10L, 0, 0L, 1), (11L, 0, 1L, 0), (12L, 0, 2L, 0),
      (20L, 1, 0L, 1), (30L, 0, 0L, 1), (31L, 1, 0L, 1)))
    // plan proof: the within-cell comparison is a real equi-join on the
    // cell key — never a nested-loop/cartesian pair frame
    val plan = Similarity.semDedup(df, "id", "vec", cents, threshold = 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "semDedup must stay cell-bounded:\n" + plan.take(800))
  }

  test("semDedup / crossSemDedup: zero-norm vectors publish " +
      "(cell NULL, 0 dups, keep 1) and never pair with cell-mates") {
    import spark.implicits._
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
    val df = Seq(
      (1L, Seq(0.0, 0.0)),   // zero vector — would be NaN ≥ threshold
      (2L, Seq(1.0, 0.0)),   // real cell-0 pair: 2 keeps, 3 drops
      (3L, Seq(0.99, 0.01))
    ).toDF("id", "vec")
    val got = Similarity.semDedup(df, "id", "vec", cents, threshold = 0.35)
      .orderBy("id").collect()
    assert(got(0).isNullAt(1) && got(0).getLong(2) == 0L &&
      got(0).getInt(3) == 1, got(0).toString)
    assert(got(1).getInt(1) == 0 && got(1).getInt(3) == 1)
    assert(got(2).getLong(2) == 1L && got(2).getInt(3) == 0)
    // cross: zero-norm corpus row keeps with NULL cell; zero-norm ref
    // is dropped from the broadcast (flags nothing)
    val refs = Seq((100L, Seq(0.99, 0.01)), (101L, Seq(0.0, 0.0)))
      .toDF("id", "vec")
    val x = Similarity.crossSemDedup(df, refs, "id", "vec", cents,
      threshold = 0.35).orderBy("id").collect()
    assert(x(0).isNullAt(1) && x(0).getLong(2) == 0L && x(0).getInt(3) == 1)
    assert(x(1).getLong(2) == 1L && x(1).getInt(3) == 0) // only ref 100
    assert(x(2).getLong(2) == 1L && x(2).getInt(3) == 0)
  }

  test("crossSemDedup: refs flag within-cell contamination, cross-cell " +
      "leaks missed by contract, refs side broadcast") {
    import spark.implicits._
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
    val corpus = Seq(
      (10L, Seq(1.0, 0.0)),    // cell 0: hits refs 100 AND 101
      (11L, Seq(0.0, 0.97)),   // cell 1: hits ref 102 only
      (12L, Seq(-1.0, 0.0)),   // cell 1 (cos -1 vs 0): hits nothing
      (13L, Seq(0.72, 0.69)))  // cell 0; its near-dup ref 103 sits in
                               // cell 1 — the documented cross-cell miss
      .toDF("id", "vec")
    val refs = Seq(
      (100L, Seq(0.99, 0.01)), (101L, Seq(0.98, 0.02)), // cell 0
      (102L, Seq(0.0, 1.0)), (103L, Seq(0.69, 0.72)))   // cell 1
      .toDF("id", "vec")
    val out = Similarity.crossSemDedup(corpus, refs, "id", "vec", cents,
      threshold = 0.9)
    val got = out.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      (10L, 0, 2L, 0), (11L, 1, 1L, 0), (12L, 1, 0L, 1), (13L, 0, 0L, 1)))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "refs must broadcast (map-only corpus pass):\n" + plan.take(800))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("rankBiasedOverlap: identical runs ≈ 1, disjoint 0, dropped query " +
      "0, driver-replayed partial overlap") {
    import spark.implicits._
    val runA = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 10L, 1), (2L, 11L, 2), (2L, 12L, 3),
      (3L, 10L, 1), (3L, 11L, 2), (3L, 12L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    // q1: identical; q2: same set, 11/12 swapped; q3: absent from B
    val runB = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 10L, 1), (2L, 12L, 2), (2L, 11L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.rankBiasedOverlap(runA, runB, k = 3, p = 0.9)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val tail = Similarity.rboTail(3, 0.9)
    def r6bd(xs: Seq[BigDecimal]): Double = BigDecimal(xs.sum.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // q1 match depths: 1,2,3; q2: 10 at 1, 11 at max(2,3)=3, 12 at 3
    val exp1 = r6bd(Seq(tail(0), tail(1), tail(2)))
    val exp2 = r6bd(Seq(tail(0), tail(2), tail(2)))
    assert(got.toSeq == Seq((1L, exp1), (2L, exp2), (3L, 0.0)))
    assert(math.abs(exp1 - 1.0) < 0.001) // weights normalized to ~1
    assert(exp2 < exp1)                  // order sensitivity: swap costs
  }

  test("embeddingStats: hand-computed moments, short vector fails loudly") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 4.0))).toDF("id", "vec")
    val got = Similarity.embeddingStats(df, "id", "vec", dim = 2)
      .orderBy("d").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      // d0: mean 2 → 2e6 ppm, E[x²] = (1+9)/2 = 5 → 5e6 ppm
      (0, 2L, 2000000L, 5000000L, 1.0, 3.0),
      // d1: mean 3 → 3e6 ppm, E[x²] = (4+16)/2 = 10 → 10e6 ppm
      (1, 2L, 3000000L, 10000000L, 2.0, 4.0)))
    val short = Seq((1L, Seq(1.0))).toDF("id", "vec")
    val e = intercept[Exception] {
      Similarity.embeddingStats(short, "id", "vec", dim = 2).collect()
    }
    assert(e.getMessage.contains("embeddingStats"))
  }

  test("marginPairs: driver-replayed margins, mutual argmax flag, " +
      "zero-norm rows dropped") {
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val srcV = Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0),
      9L -> Seq(0.0, 0.0))
    val tgtV = Seq(11L -> Seq(1.0, 0.05), 12L -> Seq(0.05, 1.0),
      13L -> Seq(0.7, 0.7))
    val src = srcV.toDF("id", "vec")
    val tgt = tgtV.toDF("id", "vec")
    // driver replay of the exact op arithmetic (k = 2)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      r6(d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum)))
    }
    val sv = srcV.filter(_._2.exists(_ != 0.0))
    val sims = for { (si, s) <- sv; (ti, t) <- tgtV }
      yield ((si, ti), cos(s, t))
    val simMap = sims.toMap
    def su(x: Double): Long = math.floor(x * 1000000.0 + 0.5).toLong
    def topSum(xs: Seq[Double]): (Long, Long) = {
      val top = xs.sorted(Ordering[Double].reverse).take(2)
      (top.map(su).sum, top.size.toLong)
    }
    val mx = sv.map { case (si, _) =>
      si -> topSum(sims.filter(_._1._1 == si).map(_._2)) }.toMap
    val my = tgtV.map { case (ti, _) =>
      ti -> topSum(sims.filter(_._1._2 == ti).map(_._2)) }.toMap
    def margin(si: Long, ti: Long): Option[Long] = {
      val (sx, nx) = mx(si); val (sy, ny) = my(ti)
      val den = sx * ny + sy * nx
      if (den > 0) {
        // signed-ppm replay: sign · trunc(|num|·10⁶ / den)
        val num = su(simMap((si, ti))) * 2 * nx * ny
        val sg = if (num < 0) -1L else 1L
        Some(sg * (BigInt(num).abs * 1000000 / BigInt(den)).toLong)
      } else None
    }
    val expFwd = sv.map { case (si, _) =>
      val best = tgtV.flatMap { case (ti, _) =>
        margin(si, ti).map(m => (ti, m)) }
        .sortBy { case (ti, m) => (-m, ti) }.head
      (si, best._1, simMap((si, best._1)), best._2)
    }
    val expBwd = tgtV.flatMap { case (ti, _) =>
      val cands = sv.flatMap { case (si, _) =>
        margin(si, ti).map(m => (si, m)) }
      if (cands.isEmpty) None
      else Some((cands.sortBy { case (si, m) => (-m, si) }.head._1, ti))
    }.toSet
    val exp = expFwd.map { case (si, ti, sim, m) =>
      (si, ti, sim, m, if (expBwd((si, ti))) 1 else 0) }
    val got = Similarity.marginPairs(src, tgt, "id", "vec", k = 2)
      .orderBy("src_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getInt(4)))
    assert(got.toSeq == exp)
    assert(!got.exists(_._1 == 9L)) // zero-norm src dropped
  }

  test("knnGraph: cell-bounded directed edges, zero vectors excluded, " +
      "rank order deterministic") {
    import spark.implicits._
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
    val df = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)), (3L, Seq(0.8, 0.2)),
      (10L, Seq(0.0, 1.0)), (11L, Seq(0.1, 0.9)),
      (20L, Seq(0.0, 0.0))) // zero vector: excluded entirely
      .toDF("id", "vec")
    val got = Similarity.knnGraph(df, "id", "vec", cents, k = 2)
      .orderBy("id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // cell 0 = {1,2,3}, cell 1 = {10,11}; no cross-cell edges, no id 20.
    assert(got.toSeq == Seq(
      (1L, 2L, 1), (1L, 3L, 2), (2L, 1L, 1), (2L, 3L, 2),
      (3L, 2L, 1), (3L, 1L, 2),
      (10L, 11L, 1), (11L, 10L, 1)))
    assert(!got.exists(e => e._1 == 20L || e._2 == 20L))
    val plan = Similarity.knnGraph(df, "id", "vec", cents, k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "knnGraph must stay cell-bounded:\n" + plan.take(800))
  }

  test("int8TopK: integer-code cosine matches driver replay, zero vector " +
      "publishes 0, ties by id") {
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)), (3L, Seq(0.0, 1.0)),
      (4L, Seq(0.0, 0.0))) // zero vector → all-zero codes → sim 0
      .toDF("id", "vec")
    val codes = Similarity.scalarQuantizeInt8(df, "id", "vec")
    val got = Similarity.int8TopK(codes.where(col("id") === 1), codes,
        "id", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // codes: 1→(127,0), 2→(127,14) [0.1·127/0.9+0.5 floors to 14],
    // 3→(0,127), 4→(0,0); cosine of codes = cosine of the reconstructed
    // vectors (absmax cancels).
    val sim12 = r6(127.0 * 127.0 /
      (127.0 * math.sqrt(127.0 * 127.0 + 14.0 * 14.0)))
    assert(got.toSeq == Seq(
      (1L, 2L, sim12, 1), (1L, 3L, 0.0, 2), (1L, 4L, 0.0, 3)))
  }

  test("silhouetteSimplified: tight clusters positive, misplaced point " +
      "negative, singleton-cluster NULLs, partition-invariant") {
    import spark.implicits._
    val pts = Seq(
      (1L, "a", Seq(1.0, 0.0)), (2L, "a", Seq(0.95, 0.05)),
      (3L, "a", Seq(0.9, 0.1)),
      (4L, "b", Seq(0.0, 1.0)), (5L, "b", Seq(0.05, 0.95)),
      // misplaced: labeled b but sits on cluster a's axis
      (6L, "b", Seq(1.0, 0.02))).toDF("id", "cl", "vec")
    val got = Similarity.silhouetteSimplified(pts, "id", "cl", "vec", dim = 2)
      .orderBy("cl").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // cluster a: tight, far from b's centroid → strongly positive mean
    assert(got(0)._1 == "a" && got(0)._2 == 3L && got(0)._3 == 3L)
    assert(got(0)._5 > 500000L, got(0).toString)
    // cluster b: two true members positive, the misplaced point negative,
    // so b's sum is less than a's despite similar tightness
    assert(got(1)._2 == 3L && got(1)._4 < got(0)._4, got.mkString(","))
    // the misplaced point alone: per-point s must be negative — check via
    // a singleton recomputation where it forms its own evidence
    val solo = Similarity.silhouetteSimplified(
      pts.where(col("id") === 6L || col("id") < 4L)
        .withColumn("cl", when(col("id") === 6L, "b").otherwise("a")),
      "id", "cl", "vec", dim = 2).orderBy("cl").collect()
    // b is a singleton cluster: its centroid IS the point, a = 0,
    // b-dist > 0 → s = 1 (scored, since another cluster exists)
    assert(solo(1).getLong(2) == 1L && solo(1).getLong(4) == 1000000L,
      solo.mkString(","))
    // single cluster overall → no other centroid → NULL sums, n_scored 0
    val one = Similarity.silhouetteSimplified(
      pts.withColumn("cl", lit("z")), "id", "cl", "vec", dim = 2).head()
    assert(one.getLong(1) == 6L && one.getLong(2) == 0L &&
      one.isNullAt(3) && one.isNullAt(4))
    // layout invariance (decimal centroid + micro-unit contract)
    val shuffled = Similarity.silhouetteSimplified(pts.repartition(7),
      "id", "cl", "vec", dim = 2)
      .orderBy("cl").collect().map(_.toSeq)
    assert(shuffled.toSeq == got.map(t =>
      Seq(t._1, t._2, t._3, t._4, t._5)).toSeq)
  }

  test("knnClassify: majority vote, smallest-label tie, self excluded") {
    import spark.implicits._
    // axis clusters: labels 1 (x-axis) and 2 (y-axis); query 100 sits on
    // the x-axis → neighbors mostly label 1
    val corpus = Seq(
      (1L, Seq(1.0, 0.0), 1), (2L, Seq(0.9, 0.1), 1), (3L, Seq(0.95, 0.05), 1),
      (4L, Seq(0.0, 1.0), 2), (5L, Seq(0.1, 0.9), 2))
      .toDF("id", "vec", "label")
    val q = Seq((100L, Seq(1.0, 0.01))).toDF("id", "vec")
    val got = Similarity.knnClassify(q, corpus, "label", k = 3).head()
    assert((got.getLong(0), got.getInt(1), got.getLong(2)) == (100L, 1, 3L))
    // tie at k=4 would be 3-1; force a tie with k=2 over one of each?
    // deterministic tie: equidistant diagonal query, one neighbor each →
    // 1 vote vs 1 vote → smallest label wins
    val qd = Seq((200L, Seq(1.0, 1.0))).toDF("id", "vec")
    val tie = Similarity.knnClassify(qd,
      Seq((1L, Seq(1.0, 0.0), 9), (2L, Seq(0.0, 1.0), 3))
        .toDF("id", "vec", "label"), "label", k = 2).head()
    assert(tie.getInt(1) == 3 && tie.getLong(2) == 1L, tie.toString)
    // a query that is also in the corpus never votes for itself
    val selfq = corpus.where(col("id") === 1L).select("id", "vec")
    val s = Similarity.knnClassify(selfq, corpus, "label", k = 4).head()
    assert(s.getLong(0) == 1L && s.getInt(1) == 1 && s.getLong(2) == 2L)
  }
}
