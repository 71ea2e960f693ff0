package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Same-host A/B micro-bench for a named query subset (round-19 bisect
  * tool). The round-18 verdict left the shingle/Jaccard dedup family
  * `weak`: every r18 run measured it ~1.8-2.6x slower than r17's archived
  * record on UNTOUCHED operator code, while the frozen-plan q01 control
  * moved only ~1.35x — indistinguishable between host drift and a session-
  * level regression from the bench archive alone (r17 rows carry no host
  * canary). This main re-measures ONLY the named queries with Bench's
  * isolation discipline (cache clear + blocking unpersist + GC + settle,
  * one warm run, median of 3), brackets the sweep with the same CPU-bound
  * canary kernel, and appends one JSON line to `ab_bench.jsonl` tagged
  * with a caller-supplied label (e.g. "r17@1ddae47" / "r18-head"). Running
  * it back-to-back from an r17 worktree and from HEAD on the SAME host is
  * the controlled experiment the verdict asked for.
  *
  * Usage: runMain graft.AbBench <label> <q1,q2,...> [sfDir] [outFile]
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: AbBench <label> <q1,q2,...> [sfDir] [outFile]")
    val label = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outFile = if (args.length > 3) args(3) else "/root/repo/ab_bench.jsonl"
    val reps = 3

    val spark = GraftSession.build(32, "graft-ab-bench", Map(
      "spark.memory.storageFraction" -> "0.1",
      "spark.cleaner.referenceTracking.blocking.shuffle" -> "true"))
    spark.sparkContext.setLogLevel("WARN")

    val queries = SparkEntry.queries
    val missing = names.filterNot(queries.contains)
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(",")}")

    // Warm the session once (codegen/JIT/scan machinery).
    SparkEntry.entry(spark).count()

    def isolate(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      Thread.sleep(200)
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }

    // The identical xorshift-mix kernel Bench.scala's host canary uses:
    // a fixed CPU-bound spin, no plan, no IO — its wall time is a pure
    // host-speed probe comparable across processes and checkouts.
    def spin(n: Long): Long = {
      var x = 0x9E3779B97F4A7C15L; var i = 0L
      while (i < n) {
        x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
        x ^= x >>> 27; x *= 0x94D049BB133111EBL
        x ^= x >>> 31; i += 1
      }
      x
    }
    def canary(): (Long, Long) = {
      spin(1000000L)
      val t1 = System.nanoTime()
      val s1 = spin(200000000L)
      val single = (System.nanoTime() - t1) / 1000000L
      val t2 = System.nanoTime()
      val ts = (0 until 32).map { i =>
        val t = new Thread(() => { val r = spin(100000000L + i)
          if (r == 42L) println(r) })
        t.start(); t
      }
      ts.foreach(_.join())
      val parMs = (System.nanoTime() - t2) / 1000000L
      if (s1 == 42L) println(s1)
      (single, parMs)
    }

    val (c0s, c0p) = canary()
    val results = names.map { name =>
      val fn = queries(name)
      def run(): Double = {
        isolate()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm (cold) — discarded from the median like Bench's
      val runs = (1 to reps).map(_ => run())
      val med = median(runs)
      System.err.println(f"[ab] $name: med=$med%.2fs runs=${runs.map(r => f"$r%.2f").mkString(",")}")
      name -> (med, runs)
    }
    val (c1s, c1p) = canary()

    val qs = results.map { case (k, (m, _)) => "\"" + k + "\":" + m }.mkString("{", ",", "}")
    val qr = results.map { case (k, (_, rs)) => "\"" + k + "\":" + rs.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    val line =
      s"""{"label":"$label","total":$total,"queries":$qs,"runs":$qr,""" +
        s""""canary_single_ms":[$c0s,$c1s],"canary_par_ms":[$c0p,$c1p],"sf":"$sfDir"}"""
    Files.writeString(Paths.get(outFile), line + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(line)
    Console.out.flush()
  }
}
