package graft
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Driver-run benchmark: times every declared query at SPARK_GRAFT_SF_DIR,
  * then emits ONE JSON line — as the process's last bare stdout line (the
  * build forks with StdoutOutput so sbt does not prefix it) and to
  * bench.json in the working directory. A failing query fails the bench
  * loudly (exit 1) instead of benching as "fast".
  *
  * Measurement methodology (round-6 rework after two rounds of
  * persist-lifecycle noise — r3's q45 ran 3.6× slower CACHED than cold,
  * r5's q20 ran 1.7× slower "steady" than its own first run):
  *
  *  1. one warm run per query (Janino codegen + JIT are per-process
  *     constants, not data costs — excluded by design);
  *  2. then REPS timed runs (default 3), the reported figure the MEDIAN —
  *     a single GC pause or page-cache miss can no longer move the
  *     round-over-round headline;
  *  3. between EVERY run: `cacheManager.clearCache()` drops the previous
  *     run's internal persists (MinHash signature frames etc.) so the next
  *     run honestly recomputes instead of re-materializing evicted columnar
  *     caches under leftover heap pressure, and an explicit GC settles the
  *     heap so run N's garbage isn't collected on run N+1's clock;
  *  4. every invocation APPENDS its full per-query detail to
  *     bench_history.jsonl (git-tracked) — bench.json alone is overwritten
  *     per run, which is why r4→r5's 31% regression could not be
  *     attributed per-query. History makes regressions diagnosable.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .map(v => scala.util.Try(v.toInt).getOrElse(
        sys.error(s"SPARK_GRAFT_BENCH_RUNS must be an int, got: '$v'")))
      .getOrElse(3).max(1)
    val spark = GraftSession.build(cpus.toInt, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (scan paths, codegen, shuffle machinery) so the
    // first measured query doesn't absorb one-time JVM/IO costs.
    SparkEntry.entry(spark).count()
    // The warm pass must use the TARGET fixture: at a smaller scale AQE
    // picks different join strategies (broadcast vs sort-merge), compiling
    // the wrong code.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", sfDir)

    /** Drop every cached frame the previous run left behind and settle the
      * heap, so one run's persists/garbage can't distort the next run. */
    def isolate(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      // clearCache() drops SQL-level cache entries but block eviction is
      // async; unpersist the underlying RDDs BLOCKING so run N's block-
      // manager memory is actually free before run N+1's timer starts.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }

    val results = SparkEntry.queries.map { case (name, fn) =>
      isolate()
      val tc = System.nanoTime()
      try fn(spark, warmDir).count()
      catch { case _: Throwable => () } // warm failures surface in the timed runs
      val cold = (System.nanoTime() - tc) / 1e9
      val runs = (1 to reps).map { _ =>
        isolate()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            spark.stop()
            sys.exit(1)
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> (median(runs), cold, runs)
    }
    def jmap(f: ((String, (Double, Double, Seq[Double]))) => String) =
      results.map { case (k, v) => s"\"" + k + "\":" + f((k, v)) }
        .mkString("{", ",", "}")
    val qs = jmap { case (_, v) => v._1.toString }
    val qsCold = jmap { case (_, v) => v._2.toString }
    val qsRuns = jmap { case (_, v) => v._3.mkString("[", ",", "]") }
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    val totalCold = if (results.nonEmpty) results.values.map(_._2).sum else 0.0
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""total_first_run":$totalCold,"queries_first_run":$qsCold,""" +
        s""""runs":$reps,"queries_runs":$qsRuns,"sf":"$sfDir"}"""
    // Anchor outputs to the repo root (not the process CWD) so the
    // git-tracked history archive can't silently land elsewhere when a
    // caller invokes the bench from another directory.
    val outRoot = Paths.get(sys.env.getOrElse("SPARK_GRAFT_REPO_DIR", "/root/repo"))
    Files.writeString(outRoot.resolve("bench.json"), full + "\n")
    // Append-only archive (git-tracked): every invocation — builder-local
    // and driver-run alike — lands here, so any round's per-query numbers
    // stay diffable against any other round's.
    val hist = outRoot.resolve("bench_history.jsonl")
    Files.writeString(hist, full + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    System.err.println(s"[bench] per-query detail appended to ${hist.toAbsolutePath}")
    // The driver captures only a ~2 KB TAIL of stdout: rounds 1-3 printed
    // the full per-query JSON (~2.2 KB) as the last line and it arrived
    // front-truncated — "parsed": null three rounds running. The final
    // stdout line must therefore be SHORT (<200 bytes): headline metric
    // only. Per-query detail lives in bench.json / bench_history.jsonl.
    val short = s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir"}"""
    // Silence ALL further logging (incl. the post-main ShutdownHookManager
    // INFO lines that otherwise print AFTER our JSON when the driver merges
    // stdout+stderr), stop Spark, THEN print — the JSON line is the final
    // line of the process's output, machine-parsable by the driver.
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(short)
    Console.out.flush()
  }
}
