package graft

/** The host-speed canary kernel, shared by [[Bench]] (official artifacts)
  * and [[AbBench]] (bisect runs) — ONE definition because cross-process
  * and cross-checkout comparability of canary milliseconds is the whole
  * point: any drift between two copies of the kernel would silently break
  * the canary-normalized contention guard and every A/B that leans on it.
  *
  * A fixed CPU-bound xorshift-mix spin: no plan, no shuffle, no IO, no
  * history needed. Single-thread wall time probes raw host speed (stable
  * even under the thread-pool contention that inflates parallel work);
  * the `par`-thread wall time probes the parallel channel the
  * shuffle-heavy query families ride (the r19 A/B found it swinging ±80%
  * on this host while single-thread speed held flat). */
object HostCanary {
  def spin(n: Long): Long = {
    var x = 0x9E3779B97F4A7C15L; var i = 0L
    while (i < n) {
      x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
      x ^= x >>> 27; x *= 0x94D049BB133111EBL
      x ^= x >>> 31; i += 1
    }
    x
  }

  /** (single-thread ms for 2·10⁸ mixes, wall ms for `par` threads of
    * 10⁸ each). Results are kept observably live so the JIT cannot
    * elide the spins. */
  def measure(par: Int): (Long, Long) = {
    spin(1000000L) // JIT warm
    val t1 = System.nanoTime()
    val s1 = spin(200000000L)
    val single = (System.nanoTime() - t1) / 1000000L
    val t2 = System.nanoTime()
    val ts = (0 until par).map { i =>
      val t = new Thread(() => { val r = spin(100000000L + i)
        if (r == 42L) println(r) })
      t.start(); t
    }
    ts.foreach(_.join())
    val parMs = (System.nanoTime() - t2) / 1000000L
    if (s1 == 42L) println(s1) // keep the single result live too
    (single, parMs)
  }
}
