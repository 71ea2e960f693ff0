package graft

import org.apache.spark.sql.functions._
import graft.ops.Round6

/** The cross-libm round-6 portability guard: values far from a HALF_UP
  * boundary round normally; values inside the hazard band raise with the
  * site name (silent oracle mismatch → loud failure). */
class Round6Spec extends SparkSpec {

  test("guarded rounds safe values identically to round(_, 6)") {
    import spark.implicits._
    // generic ln outputs, exact-grid values (distance 0.5 from a
    // boundary), negatives, zero, and a null
    val vals = Seq(Some(math.log(3.0)), Some(-math.log(7.0) * 2),
      Some(0.0), Some(1.234567), Some(-9.876543), Some(42.0), None)
    val df = vals.toDF("y")
    val got = df.select(Round6.guarded(col("y"), "spec").as("g"),
      round(col("y"), 6).as("r")).collect()
    got.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0))
      else assert(r.getDouble(0) == r.getDouble(1), r.toString)
    }
  }

  test("guarded raises inside the hazard band, naming the site") {
    import spark.implicits._
    // exactly on a boundary: 0.0000005 → |frac(|y|·1e6) − 0.5| = 0
    val hazards = Seq(0.0000005, 1.0000015, -2.0000025)
    hazards.foreach { h =>
      val ex = intercept[Exception] {
        Seq(h).toDF("y").select(Round6.guarded(col("y"), "zipf spec"))
          .collect()
      }
      val msg = ex.getMessage +
        Option(ex.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("portability guard") && msg.contains("zipf spec"),
        s"$h: $ex")
    }
  }

  test("hazard-band edge: value just outside the margin passes") {
    import spark.implicits._
    // 0.5e-6 + 1e-11 is 10× the margin away from the boundary
    val y = 5.0e-7 + 1.0e-11
    val got = Seq(y).toDF("y")
      .select(Round6.guarded(col("y"), "edge")).head()
    assert(got.getDouble(0) == 1.0e-6, got.toString)
  }

  test("relative margin: large-magnitude boundary-adjacent values raise " +
      "where the absolute margin was numerically blind") {
    import spark.implicits._
    // y ≈ 1e8 sitting as close to a x.xxxxxx5 boundary as doubles allow:
    // ulp(1e8) ≈ 1.5e-8 ≫ 1e-12, so the old absolute margin passed it
    // unproven; the relative margin (16 ulp) must refuse it.
    val y = {
      val b = 1.0000000000000005e8 // boundary-adjacent at 1e8
      // nearest double to a 0.5e-6 boundary: construct via the quantum
      math.floor(b * 1e6) / 1e6 + 0.5e-6
    }
    val ex = intercept[Exception] {
      Seq(y).toDF("y").select(Round6.guarded(col("y"), "rel spec")).collect()
    }
    val msg = ex.getMessage +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("portability guard"), s"$y: $ex")
  }

  test("lenient: hazard rows publish NULL instead of raising") {
    import spark.implicits._
    val df = Seq(Some(0.0000005), Some(math.log(3.0)), None).toDF("y")
    val got = df.select(Round6.lenient(col("y")).as("g")).collect()
    assert(got(0).isNullAt(0), "boundary value must quarantine to NULL")
    assert(got(1).getDouble(0) ==
      BigDecimal(math.log(3.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(2).isNullAt(0))
  }

  test("quarantineFlag: 1 exactly where lenient quarantines — same " +
      "predicate, countable in the pipeline's existing aggregate") {
    import spark.implicits._
    // boundary hazard, clean transcendental, NULL, negative hazard, and
    // a relative-margin hazard at large |y| (the MarginRelUlps band)
    val bigHazard = {
      val b = 12345.0 + math.log(2.0)
      math.floor(b * 1e6) / 1e6 + 0.5e-6
    }
    val df = Seq(Some(0.0000005), Some(math.log(3.0)), None,
      Some(-0.0000015), Some(bigHazard)).toDF("y")
    val got = df.select(Round6.lenient(col("y")).as("g"),
      Round6.quarantineFlag(col("y")).as("f")).collect()
    // pinned row-by-row: hazards flag 1, clean flags 0, NULL input flags 0
    // — flag = 1 exactly where lenient NULLed a non-NULL input
    assert(got.map(_.getInt(1)).toSeq == Seq(1, 0, 0, 1, 1),
      got.mkString(","))
    assert(got(0).isNullAt(0) && got(3).isNullAt(0) && got(4).isNullAt(0))
    assert(!got(1).isNullAt(0) && got(2).isNullAt(0))
    // the documented pattern: count quarantines in the same aggregate
    val n = df.agg(org.apache.spark.sql.functions
      .sum(Round6.quarantineFlag(col("y"))).as("nq")).head().getLong(0)
    assert(n == 3L)
  }
}
