package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE merge application — the production-vocab path.
  *
  * Why an expression and not the nested-`replace` fold
  * ([[graft.ops.Export.bpeApplyMerges]]): the fold builds an M-deep
  * expression tree, ideal at the pinned M=24 (whole-stage codegen,
  * replayable in ANSI SQL) but a hard ceiling at a production 32k-merge
  * vocabulary — a 32k-deep tree breaks analysis/codegen exactly the way
  * PQ's unrolled argmin did ([[PqEncode]]'s rationale). This kernel holds
  * the merge table as a REFERENCE OBJECT (a rank map) and applies it with
  * the standard rank-priority algorithm: repeatedly merge the
  * lowest-ranked adjacent symbol pair present in the word (leftmost
  * occurrence first). Generated code is one static call regardless of M.
  *
  * Equivalence to the sequential fold (merge 1 applied everywhere, then
  * merge 2, ...) holds for every LEARNED merge table — one whose parts
  * are single characters or products of earlier merges, which is true by
  * construction of [[graft.ops.Export.bpeLearn]]'s output. Under that
  * property a merge can never create an occurrence of a lower-ranked
  * pair (the lower rank's parts would have to contain a later product),
  * so "always apply the lowest rank available" replays the sequential
  * order exactly; and merging one leftmost occurrence at a time equals
  * the fold's leftmost non-overlapping batch `replace` because a merge
  * product can never recreate its own pair. [[BpeApply.apply]] validates
  * the property at plan-construction time and refuses tables that lack
  * it (arbitrary non-learned tables keep the fold path). BpeSpec asserts
  * byte-equality of the two paths on learned tables, small and large.
  *
  * Cost: O(len²) per word with O(1) map lookups — independent of M,
  * which is the whole point (the fold is O(M·len) per word AND M-deep in
  * the plan). Symbols are built per CODEPOINT, matching the fold path's
  * regex `split(w, "")` (which never cuts a surrogate pair). */
case class BpeApplyExpr(child: Expression, pairs: Array[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  // Structural equality over the array param (see IvfCellAssign).
  override def equals(other: Any): Boolean = other match {
    case o: BpeApplyExpr =>
      child == o.child &&
        java.util.Arrays.equals(pairs.asInstanceOf[Array[AnyRef]],
          o.pairs.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child,
      Int.box(java.util.Arrays.hashCode(pairs.asInstanceOf[Array[AnyRef]])))

  /** Rank map x → (y → rank), built once per (de)serialized instance;
    * nested so the hot loop's lookups allocate nothing. */
  @transient private lazy val ranks = BpeKernel.buildRanks(pairs)

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.applyMerges(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, v => s"graft.plans.BpeKernel.applyMerges($v, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyExpr =
    copy(child = newChild)
}

object BpeApply {
  /** Column builder; validates the parts-precede property the kernel's
    * rank-priority application requires (see [[BpeApplyExpr]]). */
  def apply(word: Column, merges: Seq[(String, String)]): Column = {
    val avail = scala.collection.mutable.HashSet.empty[String]
    merges.foreach { case (x, y) =>
      def ok(s: String) = s.codePointCount(0, s.length) == 1 || avail.contains(s)
      require(ok(x) && ok(y),
        s"BpeApply requires a learned (parts-precede) merge table: part of " +
          s"('$x','$y') is neither a single character nor an earlier merge " +
          "product — use Export.bpeApplyMerges for arbitrary tables")
      avail += x + y
    }
    val flat = new Array[String](merges.size * 2)
    merges.zipWithIndex.foreach { case ((x, y), i) =>
      flat(2 * i) = x; flat(2 * i + 1) = y
    }
    GraftSqlBridge.column(BpeApplyExpr(GraftSqlBridge.expression(word), flat))
  }
}

/** The interpreted/codegen-shared kernel (a plain top-level object so the
  * generated code can call it as a static method). */
object BpeKernel {
  type Ranks = java.util.HashMap[String, java.util.HashMap[String, Integer]]

  def buildRanks(pairs: Array[String]): Ranks = {
    val m = new Ranks
    var i = 0
    while (2 * i + 1 < pairs.length) {
      m.computeIfAbsent(pairs(2 * i), _ => new java.util.HashMap[String, Integer])
        .putIfAbsent(pairs(2 * i + 1), Int.box(i))
      i += 1
    }
    m
  }

  def applyMerges(word: UTF8String, ranks: Ranks): ArrayData = {
    val s = word.toString
    // Codepoint-wise initial symbols (the fold path's regex split(w, "")).
    var len = s.codePointCount(0, s.length)
    val syms = new Array[String](len)
    var ci = 0; var si = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      syms(si) = new String(Character.toChars(cp))
      ci += Character.charCount(cp); si += 1
    }
    // Rank-priority application: merge the lowest-ranked adjacent pair
    // present (leftmost occurrence on rank ties — the strict < keeps the
    // first index found), repeat until no adjacent pair has a rank.
    var live = len > 1
    while (live) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j + 1 < len) {
        val inner = ranks.get(syms(j))
        if (inner != null) {
          val r = inner.get(syms(j + 1))
          if (r != null && r.intValue() < bestRank) {
            bestRank = r.intValue(); bestIdx = j
          }
        }
        j += 1
      }
      if (bestIdx < 0) live = false
      else {
        syms(bestIdx) = syms(bestIdx) + syms(bestIdx + 1)
        System.arraycopy(syms, bestIdx + 2, syms, bestIdx + 1, len - bestIdx - 2)
        len -= 1
        if (len <= 1) live = false
      }
    }
    val out = new Array[AnyRef](len)
    var k = 0
    while (k < len) { out(k) = UTF8String.fromString(syms(k)); k += 1 }
    new GenericArrayData(out)
  }
}
