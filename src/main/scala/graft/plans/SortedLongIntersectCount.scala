package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** |A ∩ B| for two ASCENDING-sorted long arrays as one codegen'd two-pointer
  * merge — no per-row hash-set build, no boxing.
  *
  * This exists because it is the measured hot path of near-dup
  * verification: `array_intersect` on ~500-element arrays across millions
  * of candidate pairs allocates a boxed hash set per row; the merge is a
  * tight primitive loop instead. Inputs MUST be sorted ascending
  * (`sort_array`) and duplicate-free — exactly the shape the dedup
  * per-doc shingle-hash sets have. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var cnt = 0L
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { cnt += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
        int $i = 0, $j = 0;
        final int $na = $a.numElements(), $nb = $b.numElements();
        long ${ev.value}_cnt = 0L;
        while ($i < $na && $j < $nb) {
          final long $x = $a.getLong($i);
          final long $y = $b.getLong($j);
          if ($x == $y) { ${ev.value}_cnt++; $i++; $j++; }
          else if ($x < $y) { $i++; } else { $j++; }
        }
        ${ev.value} = ${ev.value}_cnt;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectCount {
  /** Column API: |a ∩ b| for sorted long-array columns. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedLongIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
