package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels as native codegen Expressions.
  *
  * Why expressions and not `functions._` composition: the codebook has
  * m×ksub codewords, and an unrolled argmin (array_max over m·ksub literal
  * structs) generates hundreds of inlined dot products — at m=32, ksub=16
  * Janino dies compiling the projection method. A LOOP over a codebook
  * held as a reference object generates ~30 lines regardless of codebook
  * size, keeps whole-stage codegen alive, and evaluates identically in
  * interpreted mode. The codebook rides flattened `[s][c][d] →
  * (s·ksub+c)·dsub+d`, exactly how a production PQ kernel lays it out. */

/** PQ code assignment: array<int> of length m — per subspace, the codeword
  * index minimizing L2 distance to the subvector (ascending scan with a
  * strict `<`, so ties keep the SMALLEST code — deterministic). Vectors
  * shorter than m·dsub yield null (refuse to guess padding). */
case class PqEncode(child: Expression, books: Array[Double],
                    m: Int, ksub: Int, dsub: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  // Structural equality over the array param — the synthesized equals is
  // reference-based, which defeats canonicalization/CSE/exchange reuse
  // across independently built instances (see IvfCellAssign).
  override def equals(other: Any): Boolean = other match {
    case o: PqEncode =>
      child == o.child && m == o.m && ksub == o.ksub && dsub == o.dsub &&
        java.util.Arrays.equals(books, o.books)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child, Int.box(m), Int.box(ksub),
      Int.box(dsub), Int.box(java.util.Arrays.hashCode(books)))

  override def nullable: Boolean = true

  /** The argmin loop — shared verbatim by interpreted eval and the
    * driver-local bounded fit ([[PqQuantize.localEncoder]]), so the two
    * encode paths cannot drift. Returns null for vectors shorter than
    * m·dsub (the refuse-to-guess contract). */
  def codes(v: ArrayData): Array[Int] = {
    if (v.numElements() < m * dsub) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var d2 = 0.0; var d = 0
        while (d < dsub) {
          val diff = v.getDouble(s * dsub + d) - books((s * ksub + c) * dsub + d)
          d2 += diff * diff; d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes(s) = best; s += 1
    }
    codes
  }

  override protected def nullSafeEval(input: Any): Any = {
    val out = codes(input.asInstanceOf[ArrayData])
    if (out == null) null else new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val d = ctx.freshName("d"); val d2 = ctx.freshName("d2")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      s"""
        if ($v.numElements() < ${m * dsub}) {
          ${ev.isNull} = true;
        } else {
          int[] $codes = new int[$m];
          for (int $s = 0; $s < $m; $s++) {
            int $best = 0; double $bestD = Double.MAX_VALUE;
            for (int $c = 0; $c < $ksub; $c++) {
              double $d2 = 0.0;
              for (int $d = 0; $d < $dsub; $d++) {
                double $diff = $v.getDouble($s * $dsub + $d)
                  - $booksRef[($s * $ksub + $c) * $dsub + $d];
                $d2 += $diff * $diff;
              }
              if ($d2 < $bestD) { $bestD = $d2; $best = $c; }
            }
            $codes[$s] = $best;
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Per-query ADC lookup table: array<double> of length m·ksub with
  * `tab[s·ksub+c] = ⟨query_s, books[s][c]⟩` (left-to-right accumulation,
  * same summation order as [[DoubleArrayDot]]). Computed once per QUERY
  * row; candidate scoring is then m array lookups instead of a dim-wide
  * dot. Vectors shorter than m·dsub yield null. */
case class PqAdcTable(child: Expression, books: Array[Double],
                      m: Int, ksub: Int, dsub: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_adc_table"

  // Structural equality over the array param (see IvfCellAssign).
  override def equals(other: Any): Boolean = other match {
    case o: PqAdcTable =>
      child == o.child && m == o.m && ksub == o.ksub && dsub == o.dsub &&
        java.util.Arrays.equals(books, o.books)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child, Int.box(m), Int.box(ksub),
      Int.box(dsub), Int.box(java.util.Arrays.hashCode(books)))

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < m * dsub) return null
    val tab = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        var ip = 0.0; var d = 0
        while (d < dsub) {
          ip += v.getDouble(s * dsub + d) * books((s * ksub + c) * dsub + d)
          d += 1
        }
        tab(s * ksub + c) = ip; c += 1
      }
      s += 1
    }
    new GenericArrayData(tab)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val tab = ctx.freshName("tab")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val d = ctx.freshName("d"); val ip = ctx.freshName("ip")
      s"""
        if ($v.numElements() < ${m * dsub}) {
          ${ev.isNull} = true;
        } else {
          double[] $tab = new double[${m * ksub}];
          for (int $s = 0; $s < $m; $s++) {
            for (int $c = 0; $c < $ksub; $c++) {
              double $ip = 0.0;
              for (int $d = 0; $d < $dsub; $d++) {
                $ip += $v.getDouble($s * $dsub + $d)
                  * $booksRef[($s * $ksub + $c) * $dsub + $d];
              }
              $tab[$s * $ksub + $c] = $ip;
            }
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($tab);
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcTable =
    copy(child = newChild)
}

/** The ADC candidate score: Σ_s tab[s·ksub + codes[s]] — one loop kernel
  * replacing the m-term `element_at(tab, s·ksub+1 + element_at(codes,
  * s+1))` chain pqServe composed before r20. Same arithmetic, same
  * left-to-right summation order (0.0-seeded fold ≡ the chain's left
  * reduce), same 0-based indexing the 1-based chain resolved to — and
  * the same out-of-bounds behavior (raise, as ANSI element_at did).
  *
  * Why it exists (r20 measurement): under whole-stage codegen the chain's
  * 32 uses of `_codes` each re-emitted the full pq_encode evaluation
  * inside the broadcast-join match loop — ~1280 kernel evaluations per
  * stream row, 13× slower than interpreted mode on the same data (probe:
  * cand stage 6–8 s codegen'd vs 0.5 s interpreted at sf0.1). With the
  * score as ONE expression, `_codes` has ONE use site; the ADC scan is
  * back to m array lookups per candidate — the cost the Scaladoc always
  * claimed. This is also the 100 TB-relevant form: the ADC loop is THE
  * hot path of PQ serving, and a fused bounds-checked lookup chain was
  * never going to vectorize. */
case class PqAdcSum(left: Expression, right: Expression, m: Int, ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_sum"

  /** The sum loop — shared by interpreted eval and generated code. */
  def score(tab: ArrayData, codes: ArrayData): Double = {
    if (codes.numElements() < m)
      throw new IllegalArgumentException(
        s"pq_adc_sum: codes has ${codes.numElements()} elements; need m=$m")
    val n = tab.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      val i = s * ksub + codes.getInt(s)
      if (i < 0 || i >= n)
        throw new IllegalArgumentException(
          s"pq_adc_sum: ADC table index $i out of bounds (table has $n " +
            "entries) — codes and table disagree on m/ksub")
      acc += tab.getDouble(i)
      s += 1
    }
    acc
  }

  override protected def nullSafeEval(tab: Any, codes: Any): Any =
    score(tab.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqAdcSumKernel", this,
      "graft.plans.PqAdcSum")
    nullSafeCodeGen(ctx, ev,
      (tab, codes) => s"${ev.value} = $self.score($tab, $codes);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcSum =
    copy(left = newLeft, right = newRight)
}

object PqQuantize {
  /** Flatten (sub, code, codeword) triples to the kernels' layout; also
    * validates the codebook is dense and rectangular. */
  def flatten(books: Seq[(Int, Int, Seq[Double])],
              m: Int, ksub: Int, dsub: Int): Array[Double] = {
    require(books.size == m * ksub,
      s"codebook must have m*ksub=${m * ksub} entries, got ${books.size}")
    val flat = new Array[Double](m * ksub * dsub)
    books.foreach { case (s, c, cw) =>
      require(s >= 0 && s < m && c >= 0 && c < ksub && cw.size == dsub,
        s"bad codebook entry (sub=$s, code=$c, |cw|=${cw.size})")
      var d = 0
      while (d < dsub) { flat((s * ksub + c) * dsub + d) = cw(d); d += 1 }
    }
    flat
  }

  def encode(vec: Column, books: Seq[(Int, Int, Seq[Double])],
             m: Int, ksub: Int, dsub: Int): Column =
    GraftSqlBridge.column(PqEncode(GraftSqlBridge.expression(vec),
      flatten(books, m, ksub, dsub), m, ksub, dsub))

  def adcTable(vec: Column, books: Seq[(Int, Int, Seq[Double])],
               m: Int, ksub: Int, dsub: Int): Column =
    GraftSqlBridge.column(PqAdcTable(GraftSqlBridge.expression(vec),
      flatten(books, m, ksub, dsub), m, ksub, dsub))

  /** The ADC candidate score Σ_s tab[s·ksub + codes[s]] as one kernel —
    * see [[PqAdcSum]]. */
  def adcSum(tab: Column, codes: Column, m: Int, ksub: Int): Column =
    GraftSqlBridge.column(PqAdcSum(GraftSqlBridge.expression(tab),
      GraftSqlBridge.expression(codes), m, ksub))

  /** Driver-local encode closure over the SAME kernel instance the plan
    * would carry — the bounded codebook fit (r20) encodes its driver-held
    * sample through this, so local and in-plan assignment cannot drift
    * (one `codes` body). Callers pre-check vector length; a short vector
    * raises here rather than returning the expression path's null. */
  def localEncoder(books: Seq[(Int, Int, Seq[Double])],
                   m: Int, ksub: Int, dsub: Int): Array[Double] => Array[Int] = {
    val kernel = PqEncode(
      org.apache.spark.sql.catalyst.expressions.Literal(null),
      flatten(books, m, ksub, dsub), m, ksub, dsub)
    v => {
      val out = kernel.codes(new GenericArrayData(v))
      require(out != null,
        s"pq encode: vector shorter than m*dsub=${m * dsub}")
      out
    }
  }
}
