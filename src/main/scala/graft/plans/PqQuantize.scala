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

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
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
    new GenericArrayData(codes)
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
}
