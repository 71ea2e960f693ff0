package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Corpus-level text feature operators (multi-frame — the per-row tier
  * lives in [[graft.functions.TextFunctions]]). */
object Text {

  /** TF-IDF scoring table: one row per (doc, term) with term frequency,
    * document frequency and tf·ln(N/df), over whitespace tokens of the
    * lower-cased text. `nDocs` is the corpus size used for the idf
    * numerator (pass `docs.count()`; kept explicit so incremental runs can
    * pin the corpus-wide N while scoring a batch).
    *
    * Scale shape: text is repartitioned by doc id BEFORE tokenizing, so the
    * (doc, term) aggregate runs in place (hash(doc) co-locates every
    * (doc, term) group — no shuffle of exploded token rows) and the
    * shuffled payload is the compact text. The document-frequency table is
    * a map-side-combined count over the (doc, term) frame keyed by term —
    * vocabulary-sized, orders of magnitude smaller than the corpus — and
    * the final enrich join shuffles (or, when AQE sees a small vocabulary,
    * broadcasts) rows of (doc, term, tf): fixed-width, never raw text.
    * The tfidf value is rounded to 6 dp — a cross-engine determinism
    * contract (ln differs by ulps between libms), same as the cosine
    * scores in the ANN queries. */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String,
            nDocs: Long): DataFrame = {
    val toks = docs.repartition(col(idCol))
      .select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .where(col("term") =!= "")
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfTbl = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(dfTbl, "term")
      .select(col(idCol), col("term"), col("tf"), col("df"),
        F.round(col("tf") * F.log(lit(nDocs).cast("double") / col("df")), 6)
          .as("tfidf"))
  }
}
