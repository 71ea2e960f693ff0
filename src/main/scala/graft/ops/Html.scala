package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML / markup main-content extraction — the first stage of a web-corpus
  * pipeline (CommonCrawl-shaped input): strip non-content markup, then keep
  * only the text blocks that look like body copy, dropping navigation /
  * footer / boilerplate. The heuristics are the published jusText /
  * trafilatura shape (Pomikálek 2011 "Removing boilerplate and duplicate
  * content from web corpora"; Barbaresi 2021 trafilatura) reduced to their
  * deterministic core: segment on block-level tags, score each block by
  * text length and LINK DENSITY (boilerplate is short and link-dense; body
  * copy is long and link-sparse), keep qualifying blocks in document order.
  *
  * Everything is a pure Column-expression pack — regexp_replace / split /
  * posexplode / length, all codegen'd, no UDFs — so the whole extraction is
  * ONE map-side scan; [[mainContent]] adds a single groupBy(id) shuffle
  * that carries only the KEPT text (≈ output bytes, not input bytes). The
  * regexes use only the RE2-safe subset (no backrefs / lookaround, inline
  * `(?is)` flags, explicit `[ \t\r\n]` classes instead of the
  * engine-dependent `\s`), so a DuckDB oracle replays the extraction
  * byte-for-byte (q118).
  *
  * This is a HEURISTIC extractor, not an HTML5 parser: it does not build a
  * DOM, handles malformed markup the way a regex does, and decodes only the
  * six ubiquitous named entities (single pass, `&amp;` last — so the
  * standard naive-decoder caveat applies: `&amp;lt;` decodes to the literal
  * `&lt;`). That is the right trade at 100 TB: the parser-grade 1% needs a
  * DOM library; the boilerplate 99% needs throughput.
  */
object Html {

  /** Block-level tag boundary (opening OR closing): the segmentation points
    * of the block scorer. Inline tags (a, b, i, span, em, strong, …) do NOT
    * split — their text belongs to the enclosing block. */
  private[graft] val BlockTagRe: String =
    "(?i)</?(?:p|div|h[1-6]|ul|ol|li|table|thead|tbody|tr|td|th|blockquote" +
      "|pre|section|article|main|header|footer|nav|aside|form|fieldset" +
      "|figure|figcaption|br|hr)\\b[^>]*>"

  /** Anchor contents — group 1 is the link text (inner markup included;
    * it is tag-stripped before measuring). */
  private[graft] val LinkRe: String = "(?is)<a\\b[^>]*>(.*?)</a>"

  /** Drop the non-content element CONTENTS (script / style bodies are code,
    * not prose — raw `<` inside them must not leak into text) and comments. */
  private def stripNonContent(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, "(?is)<script\\b[^>]*>.*?</script>", " "),
        "(?is)<style\\b[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")

  /** Single-pass decode of the six ubiquitous named entities (plus the
    * numeric apostrophe). Order is load-bearing and mirrored by the q118
    * oracle: `&amp;` LAST, so already-escaped entities decode one level
    * (`&amp;lt;` → `&lt;`), never two. `&nbsp;` normalizes to a plain
    * space — corpus-text normalization, not display fidelity. */
  def decodeEntities(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (k, v)) => replace(acc, lit(k), lit(v)) }

  /** Text of a markup fragment whose script/style/comments are already
    * gone: strip remaining tags, decode entities, collapse whitespace. */
  private def innerText(c: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_replace(c, "<[^>]*>", " ")),
      "[ \\t\\r\\n]+", " "))

  /** Full plain text of an HTML string — the "just de-markup it" op for
    * pipelines that want everything (tag strip + entity decode + whitespace
    * collapse), no boilerplate judgment. */
  def htmlToText(c: Column): Column = innerText(stripNonContent(c))

  /** Per-block main-content scoring: segment `htmlCol` on block-level tags
    * and score every block. Output one row per SPLIT FRAGMENT — including
    * the empty fragments `split` yields between adjacent block tags and at
    * the document edges, which score `n_chars = 0, keep = false` (so
    * `block_idx` always numbers the raw segmentation; [[mainContent]]'s
    * keep-filter discards them). Each row is:
    * `(idCol, block_idx INT, block_text STRING, n_chars BIGINT,
    * link_ppm BIGINT, keep BOOLEAN)` where `link_ppm` is the link-text
    * share of the block's text in parts-per-million (integer floor — no
    * float compare can drift between engines) and
    * `keep = n_chars >= minChars AND link_ppm <= maxLinkPpm` — the jusText
    * core: body copy is long and link-sparse. Map-only (posexplode is
    * narrow); feed [[mainContent]] for the assembled result. */
  def mainContentBlocks(docs: DataFrame, idCol: String, htmlCol: String,
                        minChars: Int = 60,
                        maxLinkPpm: Long = 300000L): DataFrame = {
    require(minChars >= 1 && maxLinkPpm >= 0, "need minChars >= 1, maxLinkPpm >= 0")
    docs
      .select(col(idCol),
        posexplode(split(stripNonContent(col(htmlCol)), BlockTagRe)))
      .withColumnRenamed("pos", "block_idx")
      .select(col(idCol), col("block_idx"),
        innerText(col("col")).as("block_text"),
        innerText(array_join(
          regexp_extract_all(col("col"), lit(LinkRe), lit(1)), " "))
          .as("_ltext"))
      .withColumn("n_chars", length(col("block_text")).cast("long"))
      .withColumn("link_ppm",
        expr("(CAST(1000000 AS BIGINT) * length(_ltext)) div " +
          "greatest(n_chars, CAST(1 AS BIGINT))"))
      .withColumn("keep",
        col("n_chars") >= minChars && col("link_ppm") <= maxLinkPpm)
      .drop("_ltext")
  }

  /** Main content per document: the kept blocks of [[mainContentBlocks]]
    * joined with a newline in document order. Documents whose every block
    * fails the gate (pure-boilerplate pages) produce NO row — the natural
    * shape for a corpus filter (the dropped page was the point). ONE
    * groupBy(id) shuffle carrying kept text only. */
  def mainContent(docs: DataFrame, idCol: String, htmlCol: String,
                  minChars: Int = 60,
                  maxLinkPpm: Long = 300000L): DataFrame =
    mainContentBlocks(docs, idCol, htmlCol, minChars, maxLinkPpm)
      .where(col("keep"))
      .groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("block_idx"), col("block_text")))),
          x => x.getField("block_text")), "\n").as("content"))

  /** Double-quoted href + anchor body — groups 1/2. Only double-quoted
    * hrefs are matched (the dominant form; a STATED simplification —
    * single-quoted/unquoted attributes are skipped, and `[^>]` keeps the
    * scan from crossing the tag boundary). The `[ \t\r\n"'/]` delimiter
    * before `href` anchors it as an ATTRIBUTE NAME — without it the
    * non-greedy scan matches the tail of `data-href`/`xhref` and
    * extracts the wrong URL from `<a data-href="/a" href="/b">`. */
  private[graft] val HrefRe: String =
    "(?is)<a\\b[^>]*?[ \\t\\r\\n\"'/]href[ \\t\\r\\n]*=[ \\t\\r\\n]*" +
      "\"([^\"]*)\"[^>]*>(.*?)</a>"

  /** Out-link extraction — the web-graph edge builder (what feeds
    * PageRank / the graph spine / crawl frontiers) and the anchor-text
    * miner: every `<a href="...">` in the page becomes one row with the
    * href RESOLVED against the page's base URL and the anchor's visible
    * text extracted ([[htmlToText]] — tags stripped, entities decoded,
    * whitespace collapsed).
    *
    * Resolution is the deterministic RFC-3986 subset that covers crawl
    * data (simplifications STATED): absolute hrefs (any `scheme:` —
    * including mailto:, which downstream filters drop by scheme) pass
    * through; `//host/...` takes the base scheme; `/path` takes the base
    * origin; every other form (relative paths, pure fragments, empty,
    * unquoted) is DROPPED — at corpus scale the root-relative +
    * absolute forms carry the graph signal, and dot-segment resolution
    * against arbitrary base paths is parser-grade work this regex tier
    * deliberately avoids.
    *
    * Scale shape: one map-only pass (two `regexp_extract_all` over the
    * page + a bounded posexplode of its anchors); no shuffle at all —
    * the output feeds a groupBy/graph build downstream. Output:
    * (idCol, pos INT — document order, link_url, anchor). */
  def extractLinks(docs: DataFrame, idCol: String, htmlCol: String,
                   baseCol: String): DataFrame = {
    val hrefs = regexp_extract_all(col(htmlCol), lit(HrefRe), lit(1))
    val texts = regexp_extract_all(col(htmlCol), lit(HrefRe), lit(2))
    val scheme = regexp_extract(col("_base"),
      "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    val origin = regexp_extract(col("_base"),
      "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    docs.select(col(idCol), col(baseCol).as("_base"),
        posexplode(hrefs).as(Seq("pos", "_href")), texts.as("_t"))
      .withColumn("link_url",
        when(col("_href").rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), col("_href"))
          .when(col("_href").startsWith("//"),
            concat(scheme, lit(":"), col("_href")))
          .when(col("_href").startsWith("/"), concat(origin, col("_href"))))
      .where(col("link_url").isNotNull)
      .select(col(idCol), col("pos"), col("link_url"),
        htmlToText(element_at(col("_t"), col("pos") + 1)).as("anchor"))
  }
}
