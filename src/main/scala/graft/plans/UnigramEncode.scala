package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native unigram-LM (SentencePiece-style) Viterbi segmentation — the
  * second of the two tokenizer families real pipelines use (Kudo 2018,
  * "Subword Regularization" — public method). A word is segmented into
  * the piece sequence maximizing the sum of piece log-probabilities.
  *
  * All scores are INTEGER MICRO-log-probs (round(ln p × 10⁶)), so the
  * dynamic program is exact integer arithmetic replayable by an external
  * SQL engine — no float summation to disagree over. The total order on
  * segmentations (the contract the q93 oracle replays by full
  * enumeration) is:
  *
  *   1. total score, descending;
  *   2. piece count, ascending (fewer pieces win a score tie);
  *   3. the concatenation of zero-padded 6-digit piece ids, ascending
  *      (byte-wise — ASCII digits, so Java, UTF8 and SQL VARCHAR
  *      comparisons all agree).
  *
  * The DP keeps, per codepoint position, the best (score, count, path)
  * triple under that order. Appending the same edge to two prefixes
  * preserves their order (scores add the same constant, counts add one,
  * equal-length digit strings keep their byte order under a common
  * suffix), and edges out of a position are independent of how the
  * position was reached — so the per-position triple argmax equals the
  * full-enumeration argmax.
  *
  * A codepoint with no piece (learn-time-unseen char) takes the OOV edge:
  * fixed score [[UnigramKernel.OovScoreMicro]], id V + md5-60(char) mod
  * oovBuckets — the same hashed-OOV contract as vocabEncode/bpeEncode. */
case class UnigramEncodeExpr(child: Expression, piecesFlat: Array[String],
                             oovBuckets: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  // Structural equality over the array param (see IvfCellAssign).
  override def equals(other: Any): Boolean = other match {
    case o: UnigramEncodeExpr =>
      child == o.child && oovBuckets == o.oovBuckets &&
        java.util.Arrays.equals(piecesFlat.asInstanceOf[Array[AnyRef]],
          o.piecesFlat.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child, Int.box(oovBuckets),
      Int.box(java.util.Arrays.hashCode(piecesFlat.asInstanceOf[Array[AnyRef]])))

  @transient private lazy val table = UnigramKernel.buildTable(piecesFlat, oovBuckets)

  override protected def nullSafeEval(input: Any): Any =
    UnigramKernel.encode(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      "graft.plans.UnigramTable")
    defineCodeGen(ctx, ev, v => s"graft.plans.UnigramKernel.encode($v, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeExpr =
    copy(child = newChild)
}

object UnigramEncode {
  /** Column builder. `pieces`: (piece, id, scoreMicro) with ids 0..V−1. */
  def apply(word: Column, pieces: Seq[(String, Long, Long)],
            oovBuckets: Int): Column = {
    require(oovBuckets >= 1, "oovBuckets must be >= 1")
    require(pieces.map(_._2).sorted == (0L until pieces.size.toLong),
      "piece ids must be exactly 0..V-1")
    require(pieces.size + oovBuckets < 1000000,
      "id space must fit the 6-digit tie-break path encoding")
    val flat = new Array[String](pieces.size * 3)
    pieces.zipWithIndex.foreach { case ((p, id, sc), i) =>
      flat(3 * i) = p; flat(3 * i + 1) = id.toString
      flat(3 * i + 2) = sc.toString
    }
    GraftSqlBridge.column(
      UnigramEncodeExpr(GraftSqlBridge.expression(word), flat, oovBuckets))
  }
}

/** The piece table as a codegen-reference object (top-level class so the
  * generated Java can name its type). */
final class UnigramTable(val ids: java.util.HashMap[String, java.lang.Long],
                         val scores: java.util.HashMap[String, java.lang.Long],
                         val maxPieceLen: Int, val vocabSize: Long,
                         val oovBuckets: Int) extends Serializable

/** Interpreted/codegen-shared kernel (top-level object → static methods
  * callable from generated code). */
object UnigramKernel {
  /** Learn-time-unseen chars cost this fixed micro-log-prob — far below
    * any real piece, so OOV edges are taken only when forced. Pinned in
    * the q93 oracle SQL; do not change without re-pinning. */
  final val OovScoreMicro: Long = -20000000L

  type Table = UnigramTable

  def buildTable(flat: Array[String], oovBuckets: Int): Table = {
    val ids = new java.util.HashMap[String, java.lang.Long]
    val scores = new java.util.HashMap[String, java.lang.Long]
    var maxLen = 1
    var i = 0
    while (3 * i + 2 < flat.length) {
      val p = flat(3 * i)
      ids.put(p, java.lang.Long.valueOf(flat(3 * i + 1)))
      scores.put(p, java.lang.Long.valueOf(flat(3 * i + 2)))
      maxLen = math.max(maxLen, p.codePointCount(0, p.length))
      i += 1
    }
    new Table(ids, scores, maxLen, i.toLong, oovBuckets)
  }

  /** Hashed-OOV id for a single char: V + md5-60(char) mod oovBuckets —
    * byte-identical to Spark's conv(substr(md5(c),1,15),16,10) and
    * DuckDB's CAST('0x'||substr(md5(c),1,15) AS BIGINT). */
  def oovId(ch: String, vocabSize: Long, oovBuckets: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(ch.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
    vocabSize + java.lang.Long.parseLong(hex, 16) % oovBuckets
  }

  def encode(word: UTF8String, t: Table): ArrayData = {
    val s = word.toString
    // Codepoint boundaries: cps(i) = char offset of codepoint i.
    val n = s.codePointCount(0, s.length)
    if (n == 0) return new GenericArrayData(new Array[Long](0))
    val cps = new Array[Int](n + 1)
    var ci = 0; var k = 0
    while (ci < s.length) {
      cps(k) = ci; ci += Character.charCount(s.codePointAt(ci)); k += 1
    }
    cps(n) = s.length
    // dp per codepoint position: best (score, count, path) + backpointers.
    val NegInf = java.lang.Long.MIN_VALUE / 4
    val score = Array.fill(n + 1)(NegInf)
    val count = new Array[Int](n + 1)
    val path = new Array[String](n + 1)
    val fromPos = new Array[Int](n + 1)
    val edgeId = new Array[Long](n + 1)
    score(0) = 0L; count(0) = 0; path(0) = ""
    var i = 1
    while (i <= n) {
      var l = 1
      val maxL = math.min(t.maxPieceLen, i)
      while (l <= maxL) {
        val j = i - l
        if (score(j) > NegInf) {
          val sub = s.substring(cps(j), cps(i))
          var id = -1L
          var sc = 0L
          val pid = t.ids.get(sub)
          if (pid != null) { id = pid.longValue(); sc = t.scores.get(sub).longValue() }
          else if (l == 1) { id = oovId(sub, t.vocabSize, t.oovBuckets); sc = OovScoreMicro }
          if (id >= 0L) {
            val nsc = score(j) + sc
            val ncnt = count(j) + 1
            val npath = path(j) + f"$id%06d"
            val better =
              nsc > score(i) ||
                (nsc == score(i) && (ncnt < count(i) ||
                  (ncnt == count(i) && npath.compareTo(path(i)) < 0)))
            if (better) {
              score(i) = nsc; count(i) = ncnt; path(i) = npath
              fromPos(i) = j; edgeId(i) = id
            }
          }
        }
        l += 1
      }
      i += 1
    }
    // Reconstruct ids from backpointers (path holds the digit string; the
    // ids along the chosen chain are authoritative and identical).
    val out = new Array[Long](count(n))
    var pos = n
    var w = count(n) - 1
    while (pos > 0) { out(w) = edgeId(pos); pos = fromPos(pos); w -= 1 }
    new GenericArrayData(out)
  }
}
