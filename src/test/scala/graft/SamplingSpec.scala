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
}
