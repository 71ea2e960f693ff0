package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as ONE aggregate: buffer = long[k] of running minima,
  * updated imperatively per shingle hash.
  *
  * Replaces k separate `min(pmod(a_i*h+b_i, P))` aggregate columns, whose
  * generated code grew with k and cost seconds of janino compilation per
  * plan — the dominant cost of one-shot LSH queries. Same math bit-for-bit:
  * h32 = pmod(xxhash64, 2^32), sig_i = min over shingles of
  * pmod(a_i*h32 + b_i, P), with a_i,b_i < 2^20 so a_i*h32+b_i < 2^52
  * (no overflow). Partial aggregation (map-side combine) comes from the
  * elementwise-min merge. */
case class MinHashSigAgg(child: Expression, k: Int,
                         as: Seq[Long], bs: Seq[Long], prime: Long,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(prime == (1L << 31) - 1,
    "MinHashSigAgg's division-free reduction assumes the Mersenne prime 2^31-1")

  // Indexed copies for the per-row loop (the Seq ctor params keep the
  // case-class equality/serialization simple; a List would make the loop
  // O(k²) in pointer chases).
  @transient private lazy val asArr: Array[Long] = as.toArray
  @transient private lazy val bsArr: Array[Long] = bs.toArray

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(prime)

  /** x mod (2^31-1) for 0 <= x < 2^52 without division (Mersenne fold);
    * equal to floorMod for this range. */
  @inline private def modP(x: Long): Long = {
    val x1 = (x & prime) + (x >>> 31)
    val x2 = (x1 & prime) + (x1 >>> 31)
    if (x2 >= prime) x2 - prime else x2
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h32 = java.lang.Math.floorMod(v.asInstanceOf[Long], 1L << 32)
      val a = asArr; val b = bsArr
      var i = 0
      while (i < k) {
        val p = modP(a(i) * h32 + b(i))
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "minhash_sig"

  override def withNewMutableAggBufferOffset(off: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSigAgg =
    copy(child = newChildren.head)
}

object MinHashSigAgg {
  def apply(h: Column, k: Int, as: Seq[Long], bs: Seq[Long], prime: Long): Column =
    GraftSqlBridge.column(
      MinHashSigAgg(GraftSqlBridge.expression(h), k, as, bs, prime)
        .toAggregateExpression())
}

/** 64-bit SimHash as ONE aggregate: buffer = int[64] per-bit votes
  * (+1 set / -1 clear per token hash), final signature sets bit b when
  * votes(b) > 0. Replaces 64 conditional-sum aggregate columns. */
case class SimHashSigAgg(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        buf(b) += (((h >>> b) & 1L).toInt * 2) - 1
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var b = 0
    while (b < 64) { if (buf(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "simhash_sig"

  override def withNewMutableAggBufferOffset(off: Int): SimHashSigAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): SimHashSigAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashSigAgg =
    copy(child = newChildren.head)
}

object SimHashSigAgg {
  def apply(h: Column): Column =
    GraftSqlBridge.column(
      SimHashSigAgg(GraftSqlBridge.expression(h)).toAggregateExpression())
}
