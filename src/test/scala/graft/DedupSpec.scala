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

  test("persisted signature table: batch run scans signatures + batch text, " +
      "never corpus text, and matches the recompute-from-text path") {
    import org.apache.spark.sql.functions._
    // The 100 TB ingestion contract (Dedup.minHashSignatures scaladoc):
    // corpus signatures are computed ONCE and written; each batch joins
    // against the stored table. Build it from the real documents fixture,
    // write parquet, read back, and dedup a disjoint batch against it.
    val fixture = "/root/testdata/sf0.001/documents.parquet"
    // Corpus text lives in its OWN store (as it would at scale) so the
    // plan assertion below can prove it is never touched by a batch run.
    val corpusDir = java.nio.file.Files.createTempDirectory("corpus-docs").toString
    spark.read.parquet(fixture)
      .select(col("doc_id"), col("text")).where(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    val sigDir = java.nio.file.Files.createTempDirectory("sig-table").toString
    Dedup.minHashSignatures(corpus, "doc_id", "text", shingleN = 8)
      .write.mode("overwrite").parquet(sigDir)
    // Batch: odd-id docs, id-space shifted above the corpus.
    val batch = spark.read.parquet(fixture)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .where(col("doc_id") % 2 =!= 0)
    val out = Dedup.minHashLshPairsAgainstSignatures(
      batch, spark.read.parquet(sigDir), "doc_id", "text",
      shingleN = 8, threshold = 0.5)
    // Plan proof: the batch run reads the signature table, NEVER the
    // corpus text store.
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("corpus-docs"), s"corpus text rescanned:\n$plan")
    assert(plan.contains("sig-table"), s"signature table not in plan:\n$plan")
    // Result parity with the self-contained recompute-from-text variant.
    val fromSigs = out.orderBy("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val fromText = Dedup.minHashLshPairsAgainst(batch, corpus, "doc_id", "text",
        shingleN = 8, threshold = 0.5).orderBy("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(fromSigs == fromText)
    assert(fromSigs.nonEmpty) // the fixture carries planted near-dups
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
