package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of a text's character n-gram shingles, in ONE
  * codegen'd pass — replaces the interpreted
  * `array_distinct(transform(sequence(...), substr)) -> explode -> xxhash64`
  * chain, which allocated a String per window plus a per-row hash set of
  * strings before hashing each gram a second time. Here each n-char window
  * (UTF-8 character boundaries, matching `substr` semantics: texts shorter
  * than n yield one whole-text shingle) is hashed directly from the
  * UTF8String's bytes (xxHash64), and dedup happens on sorted longs with no
  * boxing. The shingle TEXT never materializes — the expression's output is
  * already the 16-bytes-per-row shape every downstream dedup shuffle wants.
  *
  * Hash identity: any injective-on-grams 64-bit hash works for Jaccard
  * set math (collision probability ~ n²/2⁶⁴); values need only be
  * consistent within the plan, not with the previous xxhash64-of-string
  * formulation. Sorted ascending output (a free by-product of dedup). */
case class ShingleHash64(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash64"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash64.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ShingleHash64.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash64 =
    copy(child = newChild)
}

/** Positional variant of [[ShingleHash64]]: one hash per n-char window in
  * POSITION order, no dedup — element index i is the 0-based character
  * offset of the window, which is what span-level operators (verbatim
  * duplicated-span detection) need. Same hashing, same substr-style
  * character-boundary semantics (texts shorter than n yield one whole-text
  * window at offset 0). */
case class ShingleHashPos64(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash_pos64"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash64.computePos(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ShingleHash64.computePos($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashPos64 =
    copy(child = newChild)
}

object ShingleHashPos64 {
  def apply(text: Column, n: Int): Column =
    GraftSqlBridge.column(ShingleHashPos64(GraftSqlBridge.expression(text), n))
}

object ShingleHash64 {

  def apply(text: Column, n: Int): Column =
    GraftSqlBridge.column(ShingleHash64(GraftSqlBridge.expression(text), n))

  /** Window hashes in position order (no dedup) — backs
    * [[ShingleHashPos64]]. */
  def computePos(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(windowHashes(text, n))

  /** Per-window hashes in position order — the shared hashing pass. */
  private def windowHashes(text: UTF8String, n: Int): Array[Long] = {
    val bytes = text.getBytes // materialized once; windows slice this array
    val len = bytes.length
    // Character start offsets (UTF-8 boundaries), so windows count
    // characters like substr does, not bytes.
    var nChars = 0
    var off = 0
    val charOff = new Array[Int](len + 1)
    while (off < len) {
      charOff(nChars) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      nChars += 1
    }
    charOff(nChars) = len
    val nWindows = if (nChars <= n) 1 else nChars - n + 1
    val hashes = new Array[Long](nWindows)
    var i = 0
    while (i < nWindows) {
      val start = charOff(i)
      val end = charOff(math.min(i + n, nChars))
      hashes(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start,
          end - start, 42L)
      i += 1
    }
    hashes
  }

  /** Static helper the generated code calls — one virtual call per row. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val hashes = windowHashes(text, n)
    val nWindows = hashes.length
    // Dedup on sorted primitives — no boxing, no per-row hash set.
    java.util.Arrays.sort(hashes)
    var unique = 0
    var i = 0
    while (i < nWindows) {
      if (i == 0 || hashes(i) != hashes(i - 1)) {
        hashes(unique) = hashes(i); unique += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, unique))
  }
}
