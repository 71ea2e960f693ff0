package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** `filter.mightContainLong(x)` as a codegen'd expression — the scan-side
  * membership prefilter for decontamination at corpus scale.
  *
  * Why this exists: the exact decontamination path semi-joins EVERY corpus
  * window hash against the reference's distinct-hash table. When that table
  * outgrows the broadcast threshold, the join shuffles the full corpus-side
  * window stream — O(corpus) rows of (id, pos, hash) through the exchange at
  * 100 TB. A Bloom sketch of the reference hashes keeps the membership test
  * ON THE SCAN: the filter evaluates inside whole-stage codegen with zero
  * shuffle, and only the bloom-positive minority (true hits + fpp·windows
  * false positives) ever reaches the exact verify join that makes the final
  * result lossless.
  *
  * The filter object is built ONCE on the driver (a bounded-size sketch —
  * ~1.2 bytes/item at 1% fpp — the same driver-sized boundary as the IVF
  * centroids) and ships to executors via the serialized expression tree;
  * codegen references it through `addReferenceObj`, so the hot loop is one
  * virtual call on a primitive long. Spark's `BloomFilterImpl` is
  * `Serializable` with a compact custom format.
  */
case class BloomMightContainLong(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainLong = copy(child = newChild)
}

object BloomMightContainLong {
  /** Column API: true when `x` might be in `filter` (no false negatives). */
  def apply(x: Column, filter: BloomFilter): Column =
    GraftSqlBridge.column(BloomMightContainLong(
      GraftSqlBridge.expression(x), filter))
}
