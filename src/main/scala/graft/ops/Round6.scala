package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-portable 6-dp rounding of TRANSCENDENTAL outputs — the
  * proof obligation behind every `round(ln(...), 6)` this library
  * publishes (round 15's q171 showed two libms legitimately rounding the
  * same nDCG gain differently in the 6th decimal).
  *
  * The argument: `+ - * /` are correctly rounded by IEEE 754 in every
  * engine, so any two engines computing the same rational chain get the
  * SAME double, and rounding it to 6 dp is deterministic. `ln`/`log` are
  * NOT correctly rounded — conforming libms differ in the last ulps —
  * so `round(f(ln x), 6)` can differ across engines exactly when the
  * value sits within the cross-libm divergence of a HALF_UP boundary
  * (an odd multiple of 0.5e-6). Quantitatively: for |y| ≤ 64, one libm's
  * `ln` is within ~2 ulp ≈ 2.8e-14 of another's, and a site combining
  * two ln terms is within ~6e-14 — far below [[MarginAbs]] = 1e-12.
  * Therefore: if the computed value is ≥ 1e-12 from every rounding
  * boundary, EVERY faithful libm rounds it to the same 6-dp value, and
  * the round is proven portable for that row. (The margin also covers
  * Spark's round-via-shortest-decimal-repr vs DuckDB's
  * round-the-binary-value difference, which only bites within a half-ulp
  * of a boundary.)
  *
  * [[guarded]] turns that proof into a PER-ROW runtime check: values in
  * the hazard band raise (`raise_error` naming the site) instead of
  * silently mismatching an external oracle. Every declared-query ln site
  * routes through it, so a green run IS the exhaustive round-agreement
  * proof over that run's actual data — at the driver's scale factor and
  * at 100 TB alike. The check is three codegen'd flops per row (abs,
  * floor, compare); hazard hits on generic continuous values are
  * ~2·MarginAbs/1e-6 ≈ 2e-6 probable per row and deterministic for a
  * fixed corpus, so a pipeline that has run green stays green.
  */
object Round6 {

  /** Absolute distance from a 0.5e-6 rounding boundary below which the
    * 6-dp round is refused (≈ 30× the worst-case cross-libm divergence
    * of a two-ln-term site). */
  val MarginAbs: Double = 1e-12

  private val marginUnits = MarginAbs * 1e6

  /** round(y, 6) with the portability proof inlined: raises when `y` is
    * within [[MarginAbs]] of a HALF_UP rounding boundary. `site` names
    * the call in the error. NULL passes through; NaN/Inf fall through to
    * `round` untouched (frac-of-NaN compares false). */
  def guarded(y: Column, site: String): Column = {
    val u = abs(y) * lit(1e6)
    val dist = abs(u - floor(u) - lit(0.5))
    when(y.isNull, lit(null).cast("double"))
      .when(dist < lit(marginUnits), raise_error(concat(
        lit(s"round6 portability guard [$site]: value within 1e-12 of a " +
          "0.5e-6 rounding boundary, cross-libm round is unproven: "),
        y.cast("string"))).cast("double"))
      .otherwise(round(y, 6))
  }
}
