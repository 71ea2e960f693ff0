package graft

import graft.ops.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Dedup operator specs: exact/LSH/prefix-filter paths must agree with each
  * other and with hand-computed Jaccard on small corpora. */
class DedupSpec extends SparkSpec {

  // Two near-identical docs (one char changed), one unrelated.
  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dot again and again"),
      (3L, "completely different content with nothing shared whatsoever xyz"))
      .toDF("doc_id", "text")
  }

  test("shingles: distinct n-char windows; short text -> whole text") {
    val out = evalStr("abcd", TextFunctions.shingles(_, 3))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(out.toSet == Set("abc", "bcd"))
    assert(evalStr("ab", TextFunctions.shingles(_, 3))
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("ab"))
  }

  test("ngramJaccardPairs (prefix filter) finds exactly the near-dup pair") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", shingleN = 8, threshold = 0.5)
      .collect()
    assert(pairs.length == 1)
    val p = pairs(0)
    assert(p.getLong(0) == 1L && p.getLong(1) == 2L)
    assert(p.getDouble(2) > 0.5 && p.getDouble(2) < 1.0)
  }

  test("minHashLshPairs agrees with exact ngramJaccardPairs") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", shingleN = 8, threshold = 0.5)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text", shingleN = 8,
      threshold = 0.5).orderBy("doc_a", "doc_b").collect().toSeq
    assert(lsh.map(r => (r.getLong(0), r.getLong(1))) ==
      exact.map(r => (r.getLong(0), r.getLong(1))))
    // Verified jaccard values must be identical (both exact over the sets).
    assert(lsh.map(_.getDouble(2)) == exact.map(_.getDouble(2)))
  }

  test("minHashLshPairsAgainst: bipartite pairs == cross-side slice of self-join") {
    import org.apache.spark.sql.functions._
    val newSide = docs.where(col("doc_id") % 2 === 0)
    val corpus = docs.where(col("doc_id") % 2 =!= 0)
    val inc = Dedup.minHashLshPairsAgainst(newSide, corpus, "doc_id", "text",
      shingleN = 8, threshold = 0.5).orderBy("new_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val full = Dedup.minHashLshPairs(docs, "doc_id", "text", shingleN = 8,
      threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => (a % 2 == 0) != (b % 2 == 0) }
      .map { case (a, b, j) => if (a % 2 == 0) (a, b, j) else (b, a, j) }
      .sortBy(p => (p._1, p._2)).toSeq
    assert(inc == full)
  }

  test("identical docs have jaccard 1.0 through the LSH path") {
    import spark.implicits._
    val dup = Seq((10L, "same text body here"), (11L, "same text body here"))
      .toDF("doc_id", "text")
    val out = Dedup.minHashLshPairs(dup, "doc_id", "text", threshold = 0.9).collect()
    assert(out.length == 1 && out(0).getDouble(2) == 1.0)
  }

  test("simHashPairs: identical docs pair at Hamming 0, unrelated docs don't pair") {
    import spark.implicits._
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content with nothing shared whatsoever xyz"))
      .toDF("doc_id", "text")
    val out = Dedup.simHashPairs(d, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, 2L, 0)))
  }

  test("simHashPerDoc distributed signature equals the per-row simHash64 expression") {
    val expected = docs.select(col("doc_id"), Dedup.simHash64(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaAgg = Dedup.simHashPerDoc(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAgg == expected)
  }
}
