package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Coarse-quantizer cell assignment (argmax cosine against a literal
  * centroid set, smallest centroid id on 6-dp-rounded ties) as ONE native
  * loop kernel.
  *
  * Why an Expression and not `functions._` composition (the [[PqEncode]]
  * rationale): the composed form — `array_max` over k `(round(dot/·, 6),
  * −cid)` structs, each with its own inlined dot product — emits O(k·dim)
  * statements into a single generated method. At 64 cells × 32 dims the
  * enclosing `processNext()` exceeds the JVM's 64 KB method limit, Janino
  * refuses, and with `spark.sql.codegen.fallback=true` (the production
  * default) the whole stage silently runs interpreted — the q29 bug class,
  * caught in r18 by the codegen-strict ScaleSmokeSpec self-joining two
  * assignments into one stage. This kernel is ~3 generated lines calling a
  * JIT-compiled method regardless of k, keeps whole-stage codegen alive,
  * and evaluates identically in interpreted mode.
  *
  * Value parity with the composed form it replaces (spec-pinned in
  * SimilaritySpec): per-centroid similarity is
  * `round6(dot(vec, cent) / (‖vec‖ · norms(c)))` with round6 replicating
  * Spark's `Round(_, 6)` on doubles exactly — NaN/Inf pass through, else
  * HALF_UP on the shortest-decimal representation — dots/norms accumulate
  * in index order like [[DoubleArrayDot]], candidates compare via
  * `java.lang.Double.compare` (Spark's double ordering: NaN largest,
  * −0 < 0), ascending-cid scan with a strict `>` keeps the smallest id on
  * ties (≡ the struct max over (sim, −cid)). Dots run over
  * `min(|vec|, dim)` elements (the [[DoubleArrayDot]] convention); ‖vec‖
  * spans the full vector. A zero ‖vec‖ raises — the composed form threw
  * ANSI DIVIDE_BY_ZERO there, and unguarded callers (ivfIndex, compact,
  * refresh) rely on zero vectors failing loudly rather than silently
  * joining a cell; callers that admit zero-norm rows guard with
  * `when(norm =!= 0, …)` exactly as before (semDedup, crossSemDedup).
  * Zero-norm CENTROIDS are rejected driver-side at plan build. */
case class IvfCellAssign(child: Expression, cents: Array[Double],
                         cids: Array[Int], norms: Array[Double], dim: Int)
    extends UnaryExpression {
  require(cids.length > 0 && cids.length == norms.length &&
    cents.length == cids.length * dim, "inconsistent quantizer shape")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_cell_assign"

  // Structural equality over the array params (r19, advisory fix): the
  // synthesized case-class equals compares arrays by REFERENCE, so two
  // independently built but identical assignments never compare equal —
  // defeating Catalyst canonicalization, common-subexpression
  // elimination, and exchange reuse (the two-assignments-in-one-stage
  // shape ScaleSmokeSpec exercises). Same fix in every array-param
  // kernel under plans/.
  override def equals(other: Any): Boolean = other match {
    case o: IvfCellAssign =>
      child == o.child && dim == o.dim &&
        java.util.Arrays.equals(cents, o.cents) &&
        java.util.Arrays.equals(cids, o.cids) &&
        java.util.Arrays.equals(norms, o.norms)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child, Int.box(dim),
      Int.box(java.util.Arrays.hashCode(cents)),
      Int.box(java.util.Arrays.hashCode(cids)),
      Int.box(java.util.Arrays.hashCode(norms)))

  /** The kernel — shared verbatim by interpreted eval and generated code
    * (the generated call site is a one-liner into this JIT-compiled
    * method, so the two paths cannot drift). */
  def assign(v: ArrayData): Int = {
    val len = v.numElements()
    var i = 0; var acc = 0.0
    while (i < len) { val x = v.getDouble(i); acc += x * x; i += 1 }
    val vnorm = math.sqrt(acc)
    if (vnorm == 0.0)
      throw new IllegalArgumentException(
        "ivf_cell_assign: zero-norm vector has no cosine cell; filter or " +
          "when-guard zero-norm rows before assignment")
    val n = math.min(len, dim)
    var bestC = cids(0)
    var best = Double.NaN
    var c = 0
    while (c < cids.length) {
      var d = 0.0; var j = 0
      while (j < n) { d += v.getDouble(j) * cents(c * dim + j); j += 1 }
      val sim = IvfCellAssign.round6(d / (vnorm * norms(c)))
      if (c == 0 || java.lang.Double.compare(sim, best) > 0) {
        best = sim; bestC = cids(c)
      }
      c += 1
    }
    bestC
  }

  override protected def nullSafeEval(input: Any): Any =
    assign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ivfCellKernel", this,
      "graft.plans.IvfCellAssign")
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.assign($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): IvfCellAssign = copy(child = newChild)
}

object IvfCellAssign {
  /** Spark's `Round(x, 6)` for doubles, replicated: NaN/Infinity pass
    * through; otherwise HALF_UP over the shortest-decimal (Double.toString)
    * representation — the same BigDecimal path Spark's RoundBase takes. */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The kernel instance for a centroid set — sorts centroids by id (the
    * ascending tie-break scan relies on it), flattens to the `[c][d] →
    * c·dim+d` layout, and precomputes per-centroid norms driver-side
    * (in-order accumulation + IEEE sqrt — bit-identical to the in-plan
    * `sqrt(dot(cl, cl))` it replaces). Shared by the Column wrapper and
    * the driver-local bounded fit, so the two assignment paths are ONE
    * piece of arithmetic. */
  private def kernel(cents: Seq[(Int, Seq[Double])]): IvfCellAssign = {
    require(cents.nonEmpty, "ivf cell assignment: need at least one centroid")
    val sorted = cents.sortBy(_._1)
    val dim = sorted.head._2.size
    require(sorted.forall(_._2.size == dim),
      "ivf cell assignment: centroids must share one dimensionality")
    val flat = new Array[Double](sorted.size * dim)
    val norms = new Array[Double](sorted.size)
    sorted.zipWithIndex.foreach { case ((_, cv), c) =>
      var j = 0; var acc = 0.0
      while (j < dim) {
        val x = cv(j); flat(c * dim + j) = x; acc += x * x; j += 1
      }
      norms(c) = math.sqrt(acc)
      require(norms(c) > 0.0,
        s"ivf cell assignment: centroid ${sorted(c)._1} has zero norm")
    }
    IvfCellAssign(
      org.apache.spark.sql.catalyst.expressions.Literal(null), flat,
      sorted.map(_._1).toArray, norms, dim)
  }

  /** Column wrapper over [[kernel]]. */
  def cell(vec: Column, cents: Seq[(Int, Seq[Double])]): Column =
    GraftSqlBridge.column(
      kernel(cents).copy(child = GraftSqlBridge.expression(vec)))

  /** Driver-local assignment closure over the SAME kernel instance the
    * plan would carry — the bounded quantizer fit (r20) assigns its
    * driver-held sample through this, so local and in-plan assignment
    * cannot drift (one `assign` body). */
  def localAssigner(cents: Seq[(Int, Seq[Double])]): Array[Double] => Int = {
    val k = kernel(cents)
    v => k.assign(new org.apache.spark.sql.catalyst.util.GenericArrayData(v))
  }
}
