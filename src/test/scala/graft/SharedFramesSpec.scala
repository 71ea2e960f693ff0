package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.queries.{SharedFrames, Tables}

/** The shared closure frames (r20) must be RESULT-IDENTICAL to the inline
  * builds they replace — the storage round trip and the memo are allowed
  * to change plans and cost, never content. */
class SharedFramesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("lexPairs / lexClusters == the inline pair build + closure, " +
      "bit-for-bit, and repeated calls serve the same content") {
    val docs = Tables.documents(spark, sf)
    val inlinePairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleN = 8, threshold = 0.8)
    val inlineAssign = Dedup.dedupAssign(docs.select(col("doc_id")),
      "doc_id", inlinePairs)

    val sharedPairs = SharedFrames.lexPairs(spark, sf)
    assert(sharedPairs.columns.toSeq == inlinePairs.columns.toSeq)
    assert(sharedPairs.exceptAll(inlinePairs).isEmpty &&
      inlinePairs.exceptAll(sharedPairs).isEmpty)

    val sharedAssign = SharedFrames.lexClusters(spark, sf)
    assert(sharedAssign.columns.toSeq == inlineAssign.columns.toSeq)
    assert(sharedAssign.exceptAll(inlineAssign).isEmpty &&
      inlineAssign.exceptAll(sharedAssign).isEmpty)

    // memo hit: the second call returns the same frame (content equality
    // is the observable contract; the build ran once per key by
    // construction of computeIfAbsent)
    val again = SharedFrames.lexClusters(spark, sf)
    assert(again.exceptAll(sharedAssign).isEmpty)

    // library cache contract: this spec's INLINE builds registered
    // handles; drain them so later suites' registry-delta assertions
    // (TextFunctionsSpec) see a clean slate. The shared-frame builds
    // drain their own at materialization time.
    Dedup.releaseCaches()
  }

  test("semCells == the inline frozen-quantizer assignment") {
    val emb = Tables.embeddings(spark, sf).select(
      col("vec_id").as("id"),
      transform(col("embedding"), _.cast("double")).as("vec"))
    val cents = emb.where(col("id") < 16).orderBy(col("id")).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1))).toSeq
    val inline = graft.ops.Similarity.ivfIndex(emb, cents)
      .select(col("id"), col("_cell"))
    val shared = SharedFrames.semCells(spark, sf)
    assert(shared.columns.toSeq == inline.columns.toSeq)
    assert(shared.exceptAll(inline).isEmpty && inline.exceptAll(shared).isEmpty)
  }
}
