package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expression pack for large-scale training-data pipelines:
  * token counting, quality scoring, language-ID heuristic, fingerprinting.
  * All pure Column compositions — codegen'd, no UDFs, embarrassingly
  * parallel (per-row), so they scale to 100 TB with zero shuffle. */
object TextFunctions {

  /** Whitespace token count ("" -> 0). */
  def tokenCountWs(text: Column): Column =
    when(trim(text) === "", lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish token count: runs of letters, runs of digits, or single other
    * non-space chars — a cheap proxy for subword tokenizers. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])"), lit(1))).cast("long")

  /** Ratio of punctuation chars to total chars (0 for empty). */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    val p = length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]-]", ""))
    when(n === 0, lit(0.0)).otherwise(p.cast("double") / n.cast("double"))
  }

  private val StopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Ratio of stopword tokens to all whitespace tokens (0 for empty). */
  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val stops = filter(toks, t => t.isin(StopwordsEn: _*))
    when(trim(text) === "", lit(0.0))
      .otherwise(size(stops).cast("double") / size(toks).cast("double"))
  }

  /** Mean whitespace-token length (0 for empty). */
  def meanTokenLen(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    when(trim(text) === "", lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
          / size(toks).cast("double"))
  }

  /** Gopher-style repetition signal: fraction of a doc's lines that are
    * duplicates of another line (0 when every line is unique). Pure
    * per-row expression — no shuffle at any scale. */
  def dupLineFrac(text: Column): Column = {
    val lines = split(text, "\n")
    round((size(lines) - size(array_distinct(lines))).cast("double") /
      size(lines).cast("double"), 6)
  }

  /** Lowercased whitespace-token word bigrams ("a b", "b c", ...); empty
    * for texts with fewer than two tokens. Feeds the top-bigram repetition
    * ratio (Gopher's top-2-gram fraction). */
  def wordBigrams(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val n = size(toks)
    when(trim(text) === "" || n < 2, array().cast("array<string>"))
      .otherwise(zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
        (a, b) => concat(a, lit(" "), b)))
  }

  /** Adjacent lower-cased word trigrams as "w1 w2 w3" strings — the
    * [[wordBigrams]] construction extended one order up (two nested
    * zip_with folds, still one map-only expression). Docs with fewer
    * than three tokens yield an empty array. */
  def wordTrigrams(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val n = size(toks)
    when(trim(text) === "" || n < 3, array().cast("array<string>"))
      .otherwise(zip_with(
        zip_with(slice(toks, lit(1), n - 2), slice(toks, lit(2), n - 2),
          (a, b) => concat(a, lit(" "), b)),
        slice(toks, lit(3), n - 2),
        (ab, c) => concat(ab, lit(" "), c)))
  }

  /** PII scrub for training text: e-mail addresses, SSN-shaped ids, and
    * IPv4 literals replaced with typed placeholders. Deterministic regex
    * passes (no ML NER) — the auditable baseline layer every corpus
    * pipeline runs before anything smarter. */
  val EmailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRx = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val Ipv4Rx = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRx, "<EMAIL>"),
        SsnRx, "<SSN>"),
      Ipv4Rx, "<IP>")

  /** Fixed-window character chunking with overlap (size > stride): the
    * split-long-documents op of a training pipeline. Returns
    * array<struct<idx int, chunk string>>; every char is covered, the last
    * chunk may be short, empty text yields one empty chunk. Pure per-row
    * expression — chunking 100 TB is a map-only pass. */
  def chunkFixed(text: Column, size: Int, stride: Int): Column =
    transform(
      sequence(lit(0),
        greatest(floor((length(text) - 1) / lit(stride)), lit(0.0)).cast("int")),
      i => struct(i.as("idx"),
        text.substr(i * lit(stride) + 1, lit(size)).as("chunk")))

  /** Host of a URL, lowercased, leading "www." stripped — the grouping key
    * for per-domain corpus stats and domain-level filtering. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:www\\.)?([^/?#:]+)", 1))

  /** Canonical URL for dedup keys: fragment removed, tracking params
    * (utm_*, ref, fbclid) dropped, separator artifacts cleaned. Every step
    * is a plain regexp_replace an external checker can replay. */
  def urlNormalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val noTrack = regexp_replace(noFrag,
      "([?&])(utm_[A-Za-z]+|ref|fbclid)=[^&]*", "$1")
    val fixQ = regexp_replace(noTrack, "\\?&+", "?")
    val fixAmp = regexp_replace(fixQ, "&&+", "&")
    regexp_replace(fixAmp, "[?&]+$", "")
  }

  /** Language-ID by stopword-marker counting: count non-overlapping hits of
    * each language's marker alternation, argmax with fixed precedence
    * (en > es > de > fr > zh on ties). A deterministic n-gram heuristic,
    * not a classifier — the oracle replicates it exactly. */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "(the|and|of|to|is)",
    "es" -> "(el|la|de|que|los)",
    "de" -> "(der|die|und|das|ein)",
    "fr" -> "(le|la|les|des|une)",
    "zh" -> "(de5|shi4|le5|zai4|he2)")

  def langScore(text: Column, pattern: String): Column =
    size(regexp_extract_all(lower(text), lit(pattern), lit(1))).cast("long")

  def langIdHeuristic(text: Column): Column = {
    val scores = LangMarkers.map { case (l, p) => l -> langScore(text, p) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Document fingerprint: MD5 over whitespace-collapsed, lowercased text.
    * Content-addressed identity for exact dedup at scale (group on the
    * 128-bit digest, never on the text body). */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))).cast("binary"))

  /** Distinct character n-gram shingles (n-char windows), the input to
    * MinHash/Jaccard dedup. Texts shorter than n yield one whole-text
    * shingle. Per-row linear work, no shuffle. */
  def shingles(text: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
        i => text.substr(i, lit(n))))
}
