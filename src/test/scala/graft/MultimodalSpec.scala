package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.ops.Multimodal.{MediaFeatures, MediaRow}

/** Multimodal column plumbing specs: metadata struct, frame sampling,
  * decoder-tier mapPartitions contract. */
class MultimodalSpec extends SparkSpec {
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  private def mediaDf = {
    import spark.implicits._
    Seq((1L, "abcdefgh".getBytes("UTF-8")), (2L, Array.empty[Byte]))
      .toDF("media_id", "blob")
  }

  test("withMetadata: typed struct with mime, byte size, fingerprint") {
    val out = Multimodal.withMetadata(mediaDf, "blob", "image/png")
    val r = out.orderBy("media_id").select("media_meta.*").collect()
    assert(r(0).getString(0) == "image/png")
    assert(r(0).getLong(1) == 8L)
    assert(r(0).getString(2).length == 32)
    assert(r(1).getLong(1) == 0L)
  }

  test("sampleFrames: n evenly-spaced fixed-width slices, codegen tier") {
    val out = mediaDf.where(col("media_id") === 1)
      .select(Multimodal.sampleFrames(col("blob"), n = 4, frameBytes = 2).as("f"))
    val frames = out.collect()(0).getSeq[Array[Byte]](0)
      .map(b => new String(b, "UTF-8"))
    // stride = 8/4 = 2 -> slices at 1,3,5,7
    assert(frames == Seq("ab", "cd", "ef", "gh"))
  }

  test("decode stub: deterministic pure-byte features") {
    val f = Multimodal.DecodeStub.decodeOne(
      MediaRow(7L, "image/png", "abc".getBytes("UTF-8")))
    assert(f == MediaFeatures(7L, "image/png", 3L,
      16 * ('a' + 1), 16 * ('b' + 1), 1 + 'c' % 4,
      "900150983cd24fb0d6963f7d28e17f72"))
    // empty payload: all at() = 0
    val e = Multimodal.DecodeStub.decodeOne(MediaRow(8L, "x", Array.empty))
    assert(e.width == 16 && e.height == 16 && e.channels == 1 && e.nBytes == 0)
  }

  test("decodeFeaturesDf: partition-batched decode over the typed Dataset") {
    val out = Multimodal.decodeFeaturesDf(mediaDf, "media_id", "blob", "audio/wav")
      .orderBy("mediaId").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("mime") == "audio/wav")
    assert(out(0).getAs[Long]("nBytes") == 8L)
    // repartitioned input decodes to identical results (order-independence)
    val re = Multimodal.decodeFeaturesDf(mediaDf.repartition(3), "media_id",
        "blob", "audio/wav")
      .orderBy("mediaId").collect()
    assert(re.toSeq.map(_.toString) == out.toSeq.map(_.toString))
  }
}
