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
}
