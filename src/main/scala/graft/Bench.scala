package graft
import java.nio.file.{Files, Paths}

/** Driver-run benchmark: times every declared query at SPARK_GRAFT_SF_DIR,
  * then emits ONE JSON line — as the process's last bare stdout line (the
  * build forks with StdoutOutput so sbt does not prefix it) and to
  * bench.json in the working directory. A failing query fails the bench
  * loudly (exit 1) instead of benching as "fast". */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.build(cpus.toInt, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (scan paths, codegen, shuffle machinery) so the
    // first measured query doesn't absorb one-time JVM/IO costs.
    SparkEntry.entry(spark).count()
    // Steady-state methodology: run each query once untimed, then time the
    // second run. Complex queries pay 3-6 s of one-time Janino/JIT
    // compilation on first execution — a per-process constant, not a
    // data-volume cost; at 100 TB (or any warmed service) it is noise, so
    // the timed number should measure the data path. The warm pass must use
    // the TARGET fixture: at a smaller scale AQE picks different join
    // strategies (broadcast vs sort-merge), compiling the wrong code.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", sfDir)
    val results = SparkEntry.queries.map { case (name, fn) =>
      // Isolate queries: drop every cached frame the previous query left
      // behind, so its evictions/spills can't distort this measurement.
      spark.sharedState.cacheManager.clearCache()
      val tc = System.nanoTime()
      try fn(spark, warmDir).count()
      catch { case _: Throwable => () } // warm failures surface in the timed run
      val cold = (System.nanoTime() - tc) / 1e9
      // Clear AGAIN between the warm and timed runs: the warm pass's job is
      // one-time code costs (Janino codegen, JIT), which are process-wide
      // and survive the clear. Its leftover internal persists must NOT
      // survive — CacheManager would rewrite the timed run's identical
      // plans onto the warm run's columnar caches, and round 3 measured
      // that cache-hit path at 3.6× SLOWER than the honest recompute
      // (q45: 21.6 s cached vs 6.0 s cold — eviction pressure on the
      // default heap beat the pushed-down parquet re-scan). The timed run
      // must measure the recompute path a fresh run would take.
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          spark.stop()
          sys.exit(1)
      }
      name -> ((System.nanoTime() - t0) / 1e9, cold)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v._1 }
      .mkString("{", ",", "}")
    val qsCold = results.map { case (k, v) => s"\"" + k + "\":" + v._2 }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    val totalCold = if (results.nonEmpty) results.values.map(_._2).sum else 0.0
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""total_first_run":$totalCold,"queries_first_run":$qsCold,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench.json"), full + "\n")
    // The driver captures only a ~2 KB TAIL of stdout: rounds 1-3 printed
    // the full per-query JSON (~2.2 KB) as the last line and it arrived
    // front-truncated — "parsed": null three rounds running. The final
    // stdout line must therefore be SHORT (<200 bytes): headline metric
    // only. Per-query detail lives in bench.json alongside.
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
