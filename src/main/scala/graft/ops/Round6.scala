package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-portable 6-dp rounding of TRANSCENDENTAL outputs — the
  * proof obligation behind every `round(ln(...), 6)` / `round(exp(...),
  * 6)` this library publishes (round 15's q171 showed two libms
  * legitimately rounding the same nDCG gain differently in the 6th
  * decimal).
  *
  * The argument: `+ - * /` are correctly rounded by IEEE 754 in every
  * engine, so any two engines computing the same rational chain get the
  * SAME double. Rounding that shared double to 6 dp is deterministic
  * ONLY away from the 0.5e-6 HALF_UP boundaries: within a half-ulp of a
  * boundary, Spark (round-via-shortest-decimal-repr) and DuckDB
  * (round-the-binary-value) legitimately disagree — which is why this
  * library NEVER publishes `round(<rational ratio>, 6)` at all: exact
  * count/decimal ratios publish as integer ppm via one integral
  * division (`div` ≡ `//`; the q200/q171 convention — see the ops'
  * Scaladoc), where no rounding boundary exists. `round(·, 6)` is
  * reserved for genuinely TRANSCENDENTAL values (ln, exp, sqrt-norm
  * cosines), where boundary hits are measure-zero — and this object is
  * the per-row proof that a given run never hit one.
  *
  * `ln`/`exp` are NOT correctly rounded — conforming libms differ in
  * the last ulps — so `round(f(ln x), 6)` can differ across engines
  * exactly when the value sits within the cross-libm divergence of a
  * HALF_UP boundary (an odd multiple of 0.5e-6). The divergence scales
  * with ulp(|y|): a faithful libm is within ~1 ulp of the exact value,
  * so two of them are within ~2 ulp ≈ |y|·4.4e-16 of each other, and a
  * site combining two such terms within ~4 ulp. The guard margin must
  * therefore scale with |y| (a fixed absolute margin is numerically
  * BLIND past |y| ≈ 2e3, silently passing values whose round is not
  * proven — the round-16 advisory finding): [[margin]] =
  * max(1e-12, |y|·16·2⁻⁵²). Consequences by magnitude:
  *  - |y| ≲ 2e3: margin 1e-12 (the historical behavior; hazard-band
  *    hits ~2e-6 per distinct value).
  *  - 2e3 ≲ |y| ≲ 1e8: relative margin; hazard probability grows
  *    linearly (~7e-6·|y|/1e3 per row) but every pass is PROVEN.
  *  - |y| ≳ 1.4e8: the ±margin bands cover the whole quantum — every
  *    row raises. CORRECT: at that magnitude a 6-dp round of a libm
  *    output cannot be certified at all; sites must bound their inputs
  *    (e.g. [[graft.ops.Sampling.mixtureWeights]] documents score/τ ≲
  *    18) or publish a different representation.
  *
  * [[guarded]] turns the proof into a PER-ROW runtime check: values in
  * the hazard band raise (`raise_error` naming the site) instead of
  * silently mismatching an external oracle. Every declared-query ln/exp
  * site routes through it, so a green run IS the exhaustive
  * round-agreement proof over that run's actual data — at the driver's
  * scale factor and at 100 TB alike. The check is a handful of
  * codegen'd flops per row.
  *
  * [[lenient]] is the production-pipeline variant: a web-scale corpus
  * with billions of distinct continuous values is near-certain to hit
  * the ~2e-6 band SOMEWHERE, and failing the whole job on one
  * unprovable row is the wrong trade for a pipeline that is not being
  * hash-compared against another engine — it NULLs the offending row
  * (quarantine semantics: count the NULLs downstream, alert on rate)
  * instead of raising. Declared queries keep [[guarded]]: there the
  * raise is the point, because the driver's oracle comparison would
  * otherwise report a silent mismatch.
  */
object Round6 {

  /** Absolute floor of the hazard margin (≈ 30× the worst-case
    * cross-libm divergence of a two-ln-term site at |y| ≤ 64). */
  val MarginAbs: Double = 1e-12

  /** Relative margin slope: 16 ulp at |y| (2 faithful libms ≤ 2 ulp
    * apart per term, ≤ 4 ulp for two-term sites, 4× safety). */
  val MarginRelUlps: Double = 16.0

  private val relSlope = MarginRelUlps * math.ulp(1.0) // 16·2⁻⁵²

  /** round(y, 6) with the portability proof inlined: raises when `y` is
    * within [[margin]](|y|) of a HALF_UP rounding boundary. `site` names
    * the call in the error. NULL passes through; NaN/Inf fall through to
    * `round` untouched (frac-of-NaN compares false). */
  def guarded(y: Column, site: String): Column =
    check(y, raise_error(concat(
      lit(s"round6 portability guard [$site]: value within the " +
        "cross-libm margin of a 0.5e-6 rounding boundary, " +
        "round is unproven: "),
      y.cast("string"))).cast("double"))

  /** [[guarded]]'s non-fatal twin for production pipelines: hazard-band
    * rows publish NULL (quarantine) instead of failing the job. Do NOT
    * use in declared queries — the oracle gate needs the raise. */
  def lenient(y: Column): Column = check(y, lit(null).cast("double"))

  private def check(y: Column, onHazard: Column): Column =
    when(y.isNull, lit(null).cast("double"))
      .when(hazard(y), onHazard)
      .otherwise(round(y, 6))

  /** The hazard-band predicate itself — the ONE definition shared by
    * [[guarded]], [[lenient]] and [[quarantineFlag]], so the quarantine
    * counter cannot de-synchronize from what lenient actually NULLs when
    * the margin formula changes. NULL input yields NULL (three-valued
    * logic) — every caller screens NULL first. */
  private def hazard(y: Column): Column = {
    val u = abs(y) * lit(1e6)
    val dist = abs(u - floor(u) - lit(0.5))
    // margin in 1e-6 units, scaled with ulp(|y|·1e6) = |y|·1e6·2⁻⁵²-ish
    val marginUnits = greatest(lit(MarginAbs * 1e6),
      abs(y) * lit(relSlope * 1e6))
    dist < marginUnits
  }

  /** 1 exactly where [[lenient]] quarantines (non-NULL value inside the
    * hazard band), else 0 — the audit half of the quarantine contract:
    * lenient NULLs the unprovable row so the job survives, and the
    * pipeline's EXISTING aggregate adds `sum(Round6.quarantineFlag(y))`
    * to count them in the same pass (no second scan), alerting when the
    * rate is abnormal instead of discovering silent NULLs downstream.
    * Shares [[hazard]] — the one predicate definition — with
    * [[lenient]]/[[guarded]], so flag = 1 ⟺ lenient = NULL ∧ input ≠
    * NULL by construction (spec-pinned). */
  def quarantineFlag(y: Column): Column =
    when(y.isNotNull && hazard(y), lit(1)).otherwise(lit(0))
}
