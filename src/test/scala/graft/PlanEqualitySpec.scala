package graft

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

import graft.plans._

/** Structural equality of the array-param native kernels (r19 advisory
  * fix): the synthesized case-class equals compared Array fields by
  * REFERENCE, so two independently built but identical kernels never
  * compared equal — silently defeating Catalyst canonicalization,
  * common-subexpression elimination, and exchange reuse (the exact
  * two-assignments-in-one-stage shape ScaleSmokeSpec exercises). These
  * specs pin `equals`/`hashCode`/`semanticEquals` across independent
  * constructions, and inequality on any differing field — for every
  * kernel under plans/ that carries an array. */
class PlanEqualitySpec extends SparkSpec {

  private def vecChild: Expression =
    Literal.create(Seq(1.0, 2.0), ArrayType(DoubleType))
  private def strChild: Expression = Literal.create("abc", StringType)

  // Fresh arrays per call — the whole point is equality across DISTINCT
  // array instances with identical contents.
  private def ivf(): IvfCellAssign = IvfCellAssign(vecChild,
    Array(1.0, 0.0, 0.0, 1.0), Array(0, 1), Array(1.0, 1.0), 2)
  private def pqe(): PqEncode =
    PqEncode(vecChild, Array(0.5, 1.5, 2.5, 3.5), m = 2, ksub = 2, dsub = 1)
  private def adc(): PqAdcTable =
    PqAdcTable(vecChild, Array(0.5, 1.5, 2.5, 3.5), m = 2, ksub = 2, dsub = 1)
  private def bpe(): BpeApplyExpr = BpeApplyExpr(strChild, Array("a b", "ab c"))
  private def uni(): UnigramEncodeExpr = UnigramEncodeExpr(strChild,
    Array("a", "0", "-1500000", "b", "1", "-2000000"), oovBuckets = 8)

  test("independently built identical kernels are equal, hash equal, and " +
      "semanticEquals (canonicalization/CSE/exchange-reuse prerequisite)") {
    val pairs: Seq[(Expression, Expression)] = Seq(
      (ivf(), ivf()), (pqe(), pqe()), (adc(), adc()),
      (bpe(), bpe()), (uni(), uni()))
    pairs.foreach { case (x, y) =>
      assert(!(x.asInstanceOf[AnyRef] eq y.asInstanceOf[AnyRef]))
      assert(x == y, s"${x.prettyName}: equals")
      assert(x.hashCode == y.hashCode, s"${x.prettyName}: hashCode")
      assert(x.semanticEquals(y), s"${x.prettyName}: semanticEquals")
      assert(x.canonicalized == y.canonicalized, s"${x.prettyName}: canonicalized")
    }
  }

  test("any differing field breaks equality (no false positives)") {
    assert(ivf() != ivf().copy(cids = Array(0, 2)))
    assert(ivf() != ivf().copy(norms = Array(1.0, 2.0)))
    assert(ivf() != ivf().copy(cents = Array(1.0, 0.0, 0.0, 2.0)))
    assert(pqe() != pqe().copy(books = Array(0.5, 1.5, 2.5, 4.5)))
    assert(pqe() != pqe().copy(ksub = 1))
    assert(adc() != adc().copy(books = Array(0.5, 1.5, 2.5, 4.5)))
    // PqEncode and PqAdcTable share a field shape — they must never
    // compare equal to each other.
    assert(!pqe().equals(adc()) && !adc().equals(pqe()))
    assert(bpe() != BpeApplyExpr(strChild, Array("a b")))
    assert(uni() != uni().copy(oovBuckets = 16))
    assert(uni() != UnigramEncodeExpr(strChild,
      Array("a", "0", "-1500000"), 8))
  }
}
