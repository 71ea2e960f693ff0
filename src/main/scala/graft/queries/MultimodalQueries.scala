package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Multimodal, Similarity}

/** Multimodal-column and embedding-similarity operator coverage. The
  * `documents.text` payload stands in for a media blob (cast to BINARY —
  * the pipelines are byte-oriented and identical for real media), so even
  * the mapPartitions decoder tier gets a DuckDB oracle: the stub features
  * are pure byte functions both engines can compute. */
object MultimodalQueries {

  val all: Seq[QueryDef] = Seq(

    // ── expression tier: metadata + frame sampling over a binary column ──
    QueryDef("q37_blob_frames",
      """WITH s AS (
        |  SELECT doc_id, text,
        |         greatest(length(text) // 4, 1) AS stride
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS fp,
        |  to_base64(encode(substr(text, 0*stride + 1, 8))) AS frame0,
        |  to_base64(encode(substr(text, 1*stride + 1, 8))) AS frame1,
        |  to_base64(encode(substr(text, 2*stride + 1, 8))) AS frame2,
        |  to_base64(encode(substr(text, 3*stride + 1, 8))) AS frame3
        |FROM s
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val blob = col("text").cast("binary")
      val stride = greatest(floor(length(blob) / 4), lit(1)).cast("int")
      def frame(i: Int) =
        base64(blob.substr(lit(i) * stride + lit(1), lit(8))).as(s"frame$i")
      Tables.documents(s, d).select(
          col("doc_id"),
          length(blob).cast("long").as("n_bytes"),
          md5(blob).as("fp"),
          frame(0), frame(1), frame(2), frame(3))
        .orderBy(col("doc_id"))
    },

    // ── decoder tier: mapPartitions stub decode, oracle-checked because
    //    the stub features are deterministic byte functions ──
    QueryDef("q38_media_decode",
      """SELECT doc_id AS media_id, 'text/plain' AS mime,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  16 * (ascii(substr(text, 1, 1)) + 1) AS width,
        |  16 * (ascii(substr(text, 2, 1)) + 1) AS height,
        |  1 + ascii(substr(text, 3, 1)) % 4 AS channels,
        |  md5(text) AS fingerprint
        |FROM documents
        |ORDER BY media_id""".stripMargin) { (s, d) =>
      implicit val spark: org.apache.spark.sql.SparkSession = s
      val docs = Tables.documents(s, d)
        .withColumn("blob", col("text").cast("binary"))
      Multimodal.decodeFeaturesDf(docs, "doc_id", "blob", "text/plain")
        .select(col("mediaId").as("media_id"), col("mime"),
          col("nBytes").as("n_bytes"), col("width"), col("height"),
          col("channels"), col("fingerprint"))
        .orderBy(col("media_id"))
    },

    // ── embedding-cosine near-dup pairs (exact, norms precomputed) ──
    QueryDef("q39_embedding_neardup",
      """WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS e
        |  FROM embeddings WHERE vec_id % 2 = 0)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_inner_product(a.e, b.e) /
        |        (sqrt(list_inner_product(a.e, a.e)) *
        |         sqrt(list_inner_product(b.e, b.e))), 6) AS cos_sim
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE round(list_inner_product(a.e, b.e) /
        |        (sqrt(list_inner_product(a.e, a.e)) *
        |         sqrt(list_inner_product(b.e, b.e))), 6) >= 0.35
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .where(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("id"),
          transform(col("embedding"), _.cast("double")).as("vec"))
      Similarity.cosineNearDupPairs(emb, threshold = 0.35)
        .orderBy(col("id_a"), col("id_b"))
    }
  )
}
