package graft

import graft.functions.TextFunctions

/** Text-analysis expression pack specs (token counting, quality scoring,
  * language-ID, fingerprinting). */
class TextFunctionsSpec extends SparkSpec {

  test("tfIdf: hand-computed scores; (doc,term) aggregate never re-shuffles tokens") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "  "), // empty after trim: contributes to N, emits no terms
      (4L, "Apple date")).toDF("doc_id", "text")
    val out = graft.ops.Text.tfIdf(docs, "doc_id", "text", nDocs = 4L)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    // the idf rounds 6-dp under the guard FIRST, then multiplies by the
    // integer tf (the boundary-free grid product — see tfIdfWithN)
    def s(tf: Long, df: Long) = {
      val idf6 = BigDecimal(math.log(4.0 / df))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      (idf6 * tf).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(rows == Set(
      (1L, "apple", 2L, 2L, s(2, 2)), (1L, "banana", 1L, 2L, s(1, 2)),
      (2L, "banana", 1L, 2L, s(1, 2)), (2L, "cherry", 1L, 1L, s(1, 1)),
      (4L, "apple", 1L, 2L, s(1, 2)), (4L, "date", 1L, 1L, s(1, 1))))
    // Scale shape: the only hash exchange moving doc-keyed rows is the
    // explicit compact-text repartition; the (doc, term) aggregate runs on
    // hash(doc_id) partitioning in place — no exchange keyed (doc, term),
    // i.e. exploded token rows are never shuffled.
    val exchanges = out.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(l => l.contains("doc_id") && l.contains("term")),
      s"token rows re-shuffled by (doc, term):\n${exchanges.mkString("\n")}")
  }

  test("duplicatedSpans: merged intervals, intra-doc repeats, short texts") {
    import spark.implicits._
    val S = "0123456789ABCDEFGHIJ" // 20-char shared block
    val S2 = "KLMNOPQRSTUV" // 12-char block repeated inside one doc
    val docs = Seq(
      (1L, "abcde" + S + "fghij"), // S at chars 6..25
      (2L, "vw" + S + "pqrstuvw"), // S at chars 3..22
      (5L, S2 + "xx" + S2), // intra-doc repeat: islands [1,12] and [15,26]
      (6L, "dup"), (7L, "dup"), // shorter than n: whole-text window
      (8L, "entirely unique content with no duplicated windows"))
      .toDF("doc_id", "text")
    val out = graft.ops.Text.duplicatedSpans(docs, "doc_id", "text",
        n = 10, minOccur = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // Windows of 10 chars fully inside a shared block are duplicated; the
    // merged interval spans the whole block. 11 = 20 - 10 + 1 windows.
    assert(out == Set(
      (1L, 6L, 25L, 11L), (2L, 3L, 22L, 11L),
      (5L, 1L, 12L, 3L), (5L, 15L, 26L, 3L),
      (6L, 1L, 3L, 1L), (7L, 1L, 3L, 1L)))
  }

  test("removeDuplicatedSpans: surgery keeps exactly the novel remainder") {
    import spark.implicits._
    val S = "0123456789ABCDEFGHIJ"
    val S2 = "KLMNOPQRSTUV"
    val docs = Seq(
      (1L, "abcde" + S + "fghij"), // interior span -> prefix + suffix kept
      (2L, S + "tailpart"), // span at char 1 -> suffix only
      (3L, "headpart" + S), // span at the end -> prefix only
      (5L, S2 + "xx" + S2), // two islands -> only the "xx" gap survives
      (6L, "dup"), (7L, "dup"), // whole text duplicated -> empty remainder
      (8L, "entirely unique content with no duplicated windows"))
      .toDF("doc_id", "text")
    val out = graft.ops.Text.removeDuplicatedSpans(docs, "doc_id", "text",
        n = 10, minOccur = 2L)
      .select("doc_id", "clean_text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(1L) == "abcdefghij")
    assert(out(2L) == "tailpart")
    assert(out(3L) == "headpart")
    assert(out(5L) == "xx")
    assert(out(6L) == "" && out(7L) == "")
    assert(out(8L) == "entirely unique content with no duplicated windows")
  }

  test("matchingSpans + removeMatchingSpans: verbatim eval text located and excised") {
    import spark.implicits._
    val evalQ = "0123456789ABCDEFGHIJ" // 20-char benchmark passage
    val bench = Seq((100L, "prefix " + evalQ + " suffix")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "train " + evalQ + " more"), // contaminated interior
      (2L, "clean document with nothing from the eval split at all"),
      (3L, evalQ)) // the whole doc is eval text
      .toDF("doc_id", "text")
    val spans = graft.ops.Text.matchingSpans(corpus, "doc_id", "text",
        bench, "text", n = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // Doc 1: evalQ sits at chars 7..26, and the flanking SPACES are shared
    // too (benchmark also wraps evalQ in spaces, so windows like
    // " 012345678" match) — the merged span is [6, 27]. Doc 3: everything.
    assert(spans == Set((1L, 6L, 27L), (3L, 1L, 20L)), s"got $spans")
    val clean = graft.ops.Text.removeMatchingSpans(corpus, "doc_id", "text",
        bench, "text", n = 10)
      .select("doc_id", "clean_text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(clean(1L) == "trainmore") // both flanking spaces were in-span
    assert(clean(2L) == "clean document with nothing from the eval split at all")
    assert(clean(3L) == "")
  }

  test("matchingSpansBloom: identical to the exact path (sketch is a lossless prefilter)") {
    import org.apache.spark.sql.functions._
    // The bloom prefilter must be result-invisible: no false negatives by
    // construction, false positives killed by the verify join — so on real
    // data the spans AND the excised text must match the exact path
    // byte-for-byte, even at an absurd fpp where the sketch passes nearly
    // everything through.
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = all.where(col("doc_id") % 50 =!= 0)
    val bench = all.where(col("doc_id") % 50 === 0)
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    for (fpp <- Seq(0.01, 0.4)) {
      val exact = graft.ops.Text.matchingSpans(corpus, "doc_id", "text",
        bench, "text", n = 50).collect().toSet
      val bloom = graft.ops.Text.matchingSpansBloom(corpus, "doc_id", "text",
        bench, "text", n = 50, fpp = fpp).collect().toSet
      assert(bloom == exact, s"fpp=$fpp spans diverged")
    }
    val cleanExact = graft.ops.Text.removeMatchingSpans(corpus, "doc_id",
        "text", bench, "text", n = 50)
      .select(col("doc_id"), md5(col("clean_text").cast("binary")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val cleanBloom = graft.ops.Text.removeMatchingSpansBloom(corpus, "doc_id",
        "text", bench, "text", n = 50)
      .select(col("doc_id"), md5(col("clean_text").cast("binary")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(cleanBloom == cleanExact)
    // Library cache contract: the persisted reference-hash tables drain
    // through the shared registry (delta-based — another suite may own
    // unrelated persists in the shared session).
    graft.ops.Dedup.releaseCaches()
    assert(spark.sparkContext.getPersistentRDDs.keySet == persistedBefore)
  }

  test("matchingSpansBloom: the membership test runs on the scan (plan has the bloom filter)") {
    import spark.implicits._
    val bench = Seq((100L, "0123456789ABCDEFGHIJ")).toDF("doc_id", "text")
    val corpus = Seq((1L, "xx 0123456789ABCDEFGHIJ yy")).toDF("doc_id", "text")
    val out = graft.ops.Text.matchingSpansBloom(corpus, "doc_id", "text",
      bench, "text", n = 10)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain_long"),
      s"bloom prefilter missing from plan:\n$plan")
    // And it still finds the contamination through the sketch.
    val spans = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((1L, 4L, 23L)), s"got $spans")
    graft.ops.Dedup.releaseCaches()
  }

  test("span surgery conserves length: clean_len = len - sum(span widths), sf0.001") {
    import org.apache.spark.sql.functions._
    // Cross-op invariant on real data: removeDuplicatedSpans must cut
    // EXACTLY the intervals duplicatedSpans reports — nothing more (over-
    // deletion), nothing less (missed span), no off-by-one at boundaries.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val spanSum = graft.ops.Text.duplicatedSpans(docs, "doc_id", "text")
      .groupBy("doc_id")
      .agg(sum(col("span_end") - col("span_start") + 1).as("cut"))
    val bad = graft.ops.Text.removeDuplicatedSpans(docs, "doc_id", "text")
      .join(spanSum, Seq("doc_id"), "left")
      .where(length(col("clean_text")) =!=
        length(col("text")) - coalesce(col("cut"), lit(0L)))
      .count()
    assert(bad == 0L)
  }

  test("tokenCountWs: whitespace tokens, empty -> 0") {
    assert(evalStr("a b  c", TextFunctions.tokenCountWs) == 3L)
    assert(evalStr("", TextFunctions.tokenCountWs) == 0L)
    assert(evalStr("  ", TextFunctions.tokenCountWs) == 0L)
  }

  test("tokenCountBpe: letter runs, digit runs, single punct") {
    // "ab12!" -> [ab][12][!] = 3
    assert(evalStr("ab12!", TextFunctions.tokenCountBpe) == 3L)
    assert(evalStr("hello world", TextFunctions.tokenCountBpe) == 2L)
  }

  test("punctRatio: punct chars / total") {
    assert(evalStr("ab,.", TextFunctions.punctRatio) == 0.5)
    assert(evalStr("", TextFunctions.punctRatio) == 0.0)
  }

  test("stopwordRatio: en stopwords over ws tokens") {
    assert(evalStr("the fish and chips", TextFunctions.stopwordRatio) == 0.5)
    assert(evalStr("", TextFunctions.stopwordRatio) == 0.0)
  }

  test("meanTokenLen") {
    assert(evalStr("ab cdef", TextFunctions.meanTokenLen) == 3.0)
    assert(evalStr("", TextFunctions.meanTokenLen) == 0.0)
  }

  test("langIdHeuristic: marker argmax with fixed precedence, und when zero") {
    assert(evalStr("the cat and the dog is here", TextFunctions.langIdHeuristic) == "en")
    assert(evalStr("qqq www zzz", TextFunctions.langIdHeuristic) == "und")
  }

  test("fingerprint: whitespace-collapse + lowercase canonical md5") {
    val a = evalStr("Hello   World", TextFunctions.fingerprint)
    val b = evalStr("hello world", TextFunctions.fingerprint)
    val c = evalStr("hello world!", TextFunctions.fingerprint)
    assert(a == b)
    assert(a != c)
  }

  test("dupLineFrac: duplicated lines over total lines") {
    import spark.implicits._
    def frac(s: String): Double = Seq(s).toDF("t")
      .select(TextFunctions.dupLineFrac($"t")).head.getDouble(0)
    assert(frac("a\nb\nc") == 0.0)
    assert(frac("a\na\nb\na") == 0.5)   // 4 lines, 2 distinct
    assert(frac("x") == 0.0)
    assert(frac("") == 0.0)             // one empty line, unique
  }

  test("redactPii: emails, SSNs, IPv4s replaced; clean text untouched") {
    assert(evalStr("mail a.b+c@ex-am.co.uk now", TextFunctions.redactPii)
      == "mail <EMAIL> now")
    assert(evalStr("ssn 123-45-6789.", TextFunctions.redactPii) == "ssn <SSN>.")
    assert(evalStr("at 192.168.0.1:80", TextFunctions.redactPii) == "at <IP>:80")
    assert(evalStr("no pii here 12-34", TextFunctions.redactPii)
      == "no pii here 12-34")
  }

  test("chunkFixed: full coverage, overlap, short tail, empty text") {
    import spark.implicits._
    def chunks(s: String): Seq[(Int, String)] = Seq(s).toDF("t")
      .select(TextFunctions.chunkFixed($"t", size = 5, stride = 3))
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getString(1)))
    assert(chunks("abcdefgh") == Seq((0, "abcde"), (1, "defgh"), (2, "gh")))
    assert(chunks("ab") == Seq((0, "ab")))
    assert(chunks("") == Seq((0, "")))
    // Every char covered: concat of de-overlapped chunks == original.
    val s = "0123456789abcdef"
    val cs = chunks(s)
    val rebuilt = cs.head._2 + cs.tail.map(_._2.drop(2)).mkString
    assert(rebuilt == s)
  }

  test("urlHost + urlNormalize: host key and tracking-param-free URL") {
    import spark.implicits._
    def f(s: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
      Seq(s).toDF("t").select(c($"t")).head.getString(0)
    assert(f("https://www.Example.COM/a/b?x=1", TextFunctions.urlHost) == "example.com")
    assert(f("http://sub.site.org:8080/p", TextFunctions.urlHost) == "sub.site.org")
    assert(f("https://a.com/p?utm_source=x&id=7&ref=z#frag",
      TextFunctions.urlNormalize) == "https://a.com/p?id=7")
    assert(f("https://a.com/p?utm_a=1", TextFunctions.urlNormalize) == "https://a.com/p")
    assert(f("https://a.com/p?id=1&fbclid=zz", TextFunctions.urlNormalize)
      == "https://a.com/p?id=1")
  }

  test("wordBigrams: adjacent lowercase pairs; short/empty -> empty") {
    import spark.implicits._
    def bg(s: String): Seq[String] = Seq(s).toDF("t")
      .select(TextFunctions.wordBigrams($"t")).head.getSeq[String](0)
    assert(bg("The cat sat") == Seq("the cat", "cat sat"))
    assert(bg("one") == Seq.empty)
    assert(bg("") == Seq.empty)
    assert(bg("  spaced   out  ") == Seq("spaced out"))
  }

  test("warcRecords: record split, header extraction, CRLF and missing " +
      "blank-line cases, preamble discarded") {
    import spark.implicits._
    val warc = "junk preamble\n" +
      "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://a.com/x\r\n\r\nhello body\n" +
      "WARC/1.0\nWARC-Type: request\n\n\n" + // empty payload + newline
      "WARC/1.0\nWARC-Type: metadata\nNo-Blank-Line-Here: yes"
    val got = graft.ops.Text.warcRecords(
        Seq((1L, warc)).toDF("id", "warc"), "id", "warc")
      .orderBy("record_idx").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(3),
        r.getString(4)))
    assert(got.toSeq == Seq(
      (1, "response", "https://a.com/x", "hello body\n"),
      (2, "request", "", "\n"),
      (3, "metadata", "", ""))) // no blank line → payload ''
  }

  test("wordTrigrams: adjacent lowercase triples; short/empty -> empty") {
    import spark.implicits._
    def tg(s: String): Seq[String] = Seq(s).toDF("t")
      .select(TextFunctions.wordTrigrams($"t")).head.getSeq[String](0)
    assert(tg("The cat sat down") == Seq("the cat sat", "cat sat down"))
    assert(tg("a b c") == Seq("a b c"))
    assert(tg("a b") == Seq.empty)
    assert(tg("") == Seq.empty)
    assert(tg("  x   y  z ") == Seq("x y z"))
  }

  // ── HTML main-content extraction ───────────────────────────────────────

  private def html2text(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("h").select(graft.ops.Html.htmlToText($"h")).head.getString(0)
  }

  test("htmlToText: nested tags, entities, script-in-body, comments") {
    // nested inline tags strip cleanly, text order preserved
    assert(html2text("<p>a <b>bold <i>and italic</i></b> end</p>")
      == "a bold and italic end")
    // entity decode, &amp; last (single pass: &amp;lt; -> literal &lt;)
    assert(html2text("x &lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;&amp; done")
      == "x <tag> \"q\" 'a' & done")
    assert(html2text("&amp;lt;") == "&lt;")
    // script IN BODY with raw '<' inside must not leak code into text
    assert(html2text("<body>keep <script>if(a<b){x=1;}</script>this</body>")
      == "keep this")
    assert(html2text("<style>p < div {}</style>text") == "text")
    assert(html2text("a<!-- hidden <p>not text</p> -->b") == "a b")
    // uppercase/attribute-laden script tag still stripped
    assert(html2text("<SCRIPT type=\"text/javascript\">var y;</SCRIPT>ok")
      == "ok")
    // whitespace collapse across newlines/tabs
    assert(html2text("<p>one\n\t two</p>\n<p>three</p>") == "one two three")
  }

  test("mainContentBlocks: length gate and link-density gate") {
    import spark.implicits._
    val longText = "This paragraph clearly has enough characters to pass " +
      "the minimum main-content length gate of the extractor."
    val doc =
      "<html><body>" +
        "<div id=\"nav\"><a href=\"/\">Home</a> <a href=\"/a\">About</a></div>" +
        s"<p>$longText</p>" +
        "<p>short</p>" +
        "<p>See <a href=\"/r\">notes</a>. " + longText + "</p>" +
        "</body></html>"
    val rows = graft.ops.Html.mainContentBlocks(
        Seq((1L, doc)).toDF("id", "html"), "id", "html",
        minChars = 60, maxLinkPpm = 300000L)
      .where(org.apache.spark.sql.functions.length($"block_text") > 0)
      .orderBy($"block_idx")
      .collect().map(r => (r.getString(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
    // nav: short AND fully link text -> ppm 1e6, dropped
    val nav = rows.find(_._1.startsWith("Home")).get
    assert(nav._3 == 1000000L && !nav._4)
    // body paragraph: long, zero links -> kept
    val body = rows.find(_._1 == longText).get
    assert(body._3 == 0L && body._4)
    // short paragraph dropped by the length gate despite zero links
    assert(!rows.find(_._1 == "short").get._4)
    // inline link INSIDE body copy stays under the density gate
    val linked = rows.find(_._1.startsWith("See notes")).get
    assert(linked._4 && linked._3 > 0L && linked._3 <= 300000L)
  }

  test("redactPii: typed tokens, ordered counts, negatives survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Mail a.b+c@Sub.Example.org or x9@y.co today"),
      (2L, "Server 10.0.255.3, backup 192.168.1.1."),
      (3L, "Call +1 (555) 010-4477 or 555 010 9999 now"),
      // negatives: version, decimal, year, short number — none redact
      (4L, "v2.3.1 costs 3.14 in 2026, see page 42"),
      // interaction: email digits never count as phone; dotted quad is
      // an IP, not a phone (dots excluded from the phone class)
      (5L, "user12345678@host.com 10.1.2.3"),
      (6L, ""),
      // 8-digit joined ranges (years, counts) are BELOW the 9-digit
      // floor; a 9-digit dashed run is the boundary positive
      (7L, "era 1914-1918 and 2020 2021 runs"),
      (8L, "ssn-like 123-456-789 here"),
      // 8-digit locales (round-14 ADVICE): '+'-prefixed and pair-grouped
      // forms redact; the unprefixed single-separator 4+4 form is the
      // documented residual (shape-identical to a year range)
      (9L, "DK +45 12345678 or 12 34 56 78 ok"),
      (10L, "SG 6123 4567 stays (documented limitation)")).toDF("id", "text")
    val out = graft.ops.Text.redactPii(docs, "id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(out(0) == ((1L, "Mail <EMAIL> or <EMAIL> today", 2L, 0L, 0L)))
    assert(out(1) == ((2L, "Server <IP>, backup <IP>.", 0L, 2L, 0L)))
    assert(out(2) == ((3L, "Call <PHONE> or <PHONE> now", 0L, 0L, 2L)))
    assert(out(3) == ((4L, "v2.3.1 costs 3.14 in 2026, see page 42",
      0L, 0L, 0L)))
    assert(out(4) == ((5L, "<EMAIL> <IP>", 1L, 1L, 0L)))
    assert(out(5) == ((6L, "", 0L, 0L, 0L)))
    assert(out(6) == ((7L, "era 1914-1918 and 2020 2021 runs", 0L, 0L, 0L)))
    assert(out(7) == ((8L, "ssn-like <PHONE> here", 0L, 0L, 1L)))
    assert(out(8) == ((9L, "DK <PHONE> or <PHONE> ok", 0L, 0L, 2L)))
    assert(out(9) == ((10L, "SG 6123 4567 stays (documented limitation)",
      0L, 0L, 0L)))
  }

  test("c4Clean: line rules (terminal punct + min words), page gates " +
      "(kept-line floor, brace, lorem ipsum), audit rows survive") {
    import spark.implicits._
    val good = "Here is a first proper sentence for the page.\n" +
      "And here is clearly a second good one!\n" +
      "Is this a third sentence with enough words?"
    val docs = Seq(
      (1L, good),                                  // 3 kept -> keep
      (2L, good + "\nNav | Bar\nshort one.\nno punct here at all"),
      (3L, good + "\nvar x = { a: 1 };"),          // brace -> drop page
      (4L, good + "\nLOREM IPSUM dolor sit."),     // case-folded -> drop
      (5L, "Only two good sentences are here today.\n" +
        "And the second one is also fine."),       // 2 kept < 3 -> drop
      (6L, "")                                      // empty -> drop, audit
    ).toDF("id", "text")
    val got = graft.ops.Text.c4Clean(docs, "id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getInt(4))).sortBy(_._1)
    assert(got(0) == ((1L, good, 3, 3, 1)))
    // extra junk lines counted but not kept; page still passes
    assert(got(1)._3 == 6 && got(1)._4 == 3 && got(1)._5 == 1 &&
      got(1)._2 == good)
    assert(got(2)._5 == 0 && got(2)._4 == 3) // lines fine, brace kills page
    assert(got(3)._5 == 0)
    assert(got(4) == ((5L,
      "Only two good sentences are here today.\n" +
        "And the second one is also fine.", 2, 2, 0)))
    assert(got(5) == ((6L, "", 1, 0, 0)))
  }

  test("chunkTokens: overlap windows, no all-overlap tail, short tail kept, " +
      "empty doc -> zero chunks, overlap 0 partitions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4"), // n=5, size=3, overlap=1 -> [0..2], [2..4]
      (2L, "a"),              // single token -> one 1-token chunk
      (3L, ""), (4L, "   "),  // empty/blank -> zero chunks
      (5L, "x0 x1 x2 x3")     // n=4: starts 0, 2; 4 would be all-overlap
    ).toDF("id", "text")
    val got = graft.ops.Text.chunkTokens(docs, "id", "text",
        chunkSize = 3, overlap = 1)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getString(4))).toSet
    assert(got == Set(
      (1L, 0, 0L, 3, "t0 t1 t2"), (1L, 1, 2L, 3, "t2 t3 t4"),
      (2L, 0, 0L, 1, "a"),
      (5L, 0, 0L, 3, "x0 x1 x2"), (5L, 1, 2L, 2, "x2 x3")))
    // overlap 0: clean partition, every token exactly once
    val part = graft.ops.Text.chunkTokens(docs, "id", "text",
        chunkSize = 2, overlap = 0).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(4)))
    assert(part.toSet == Set(
      (1L, 0, "t0 t1"), (1L, 1, "t2 t3"), (1L, 2, "t4"),
      (2L, 0, "a"),
      (5L, 0, "x0 x1"), (5L, 1, "x2 x3")))
    // map-only contract: no exchange anywhere in the plan
    val plan = graft.ops.Text.chunkTokens(docs, "id", "text", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("dropRepeatedParagraphs plan: anti-join is hash-based, no NLJ/cartesian") {
    import spark.implicits._
    val docs = Seq((1L, "a\nb"), (2L, "a\nc")).toDF("id", "text")
    val plan = graft.ops.Text.dropRepeatedParagraphs(docs, "id", "text",
        minDf = 2L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"pair machinery leaked a quadratic join:\n$plan")
    assert(plan.contains("LeftAnti"), "hot-paragraph anti-join present")
    graft.ops.Dedup.releaseCaches()
  }

  test("dropRepeatedParagraphs: hot paragraphs drop, blanks survive, counts exact") {
    import spark.implicits._
    val banner = "Subscribe to our newsletter."
    // banner in all 4 docs (df=4 >= minDf=3); "rare" in 2 (df=2 < 3);
    // doc 4 repeats the banner twice (df counts it ONCE, both drop) and
    // has nothing else -> doc 4 vanishes entirely.
    val docs = Seq(
      (1L, s"alpha one\n$banner\n\nunique tail 1"),
      (2L, s"beta two\n$banner\nrare shared line"),
      (3L, s"gamma three\n$banner\nrare shared line"),
      (4L, s"$banner\n$banner")).toDF("id", "text")
    val out = graft.ops.Text.dropRepeatedParagraphs(docs, "id", "text",
        minDf = 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // blank separator line preserved as structure
    assert(out(1L) == (("alpha one\n\nunique tail 1", 2L, 1L)))
    assert(out(2L) == (("beta two\nrare shared line", 2L, 1L)))
    assert(out(3L) == (("gamma three\nrare shared line", 2L, 1L)))
    graft.ops.Dedup.releaseCaches()
  }

  test("mainContent: kept blocks join in document order; all-boilerplate page drops") {
    import spark.implicits._
    val para1 = "First body paragraph with plenty of characters to clear " +
      "the length gate comfortably end to end."
    val para2 = "Second body paragraph, also long enough to clear the " +
      "length gate and keep its document position."
    val page =
      "<div class=\"nav\"><a href=\"/\">Home</a></div>" +
        s"<p>$para1</p><div class=\"ad\"><a href=\"/buy\">Buy now</a></div>" +
        s"<p>$para2</p><div class=\"footer\"><a href=\"/tos\">Terms</a></div>"
    val boilerplateOnly =
      "<div><a href=\"/\">Home</a></div><p>tiny</p>"
    val out = graft.ops.Html.mainContent(
        Seq((1L, page), (2L, boilerplateOnly)).toDF("id", "html"),
        "id", "html", minChars = 60, maxLinkPpm = 300000L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(1L))
    assert(out(1L) == s"$para1\n$para2")
  }

  test("extractLinks: resolution rules, anchor text cleanup, skip forms, " +
      "document order") {
    import spark.implicits._
    val html =
      "<p><a href=\"https://other.org/x?q=1\">Abs</a> " +
        "<a href=\"/docs/1\">Doc &amp; <b>notes</b></a> " +
        "<a href=\"//cdn.org/lib\">  CDN   asset </a> " +
        "<a href=\"rel/skip\">rel</a> " +
        "<a href=\"#frag\">frag</a> " +
        "<a href=\"\">empty</a> " +
        "<a name=\"no-href\">none</a> " +
        "<a href='single'>sq</a> " +
        "<a data-href=\"/wrong\" href=\"/right\">attr name anchored</a> " +
        "<a href=\"mailto:a@b.c\">mail me</a></p>"
    val got = graft.ops.Html.extractLinks(
        Seq((7L, html, "http://base.org/a/b/c?z=2")).toDF("id", "html", "base"),
        "id", "html", "base")
      .orderBy("pos").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (0, "https://other.org/x?q=1", "Abs"),
      (1, "http://base.org/docs/1", "Doc & notes"),
      (2, "http://cdn.org/lib", "CDN asset"),
      // rel/frag/empty hrefs (pos 3-5) drop; pos keeps document order
      // data-href must NOT satisfy the href scan (delimiter-anchored)
      (6, "http://base.org/right", "attr name anchored"),
      (7, "mailto:a@b.c", "mail me")), got.mkString("\n"))
    // a page with no anchors yields no rows
    assert(graft.ops.Html.extractLinks(
      Seq((1L, "<p>plain</p>", "http://b.org")).toDF("id", "html", "base"),
      "id", "html", "base").isEmpty)
  }

  test("readability: hand-replayed counts and scores, fragment floor, " +
      "vowel-less floor, empty doc absent") {
    import spark.implicits._
    def milli(x: Double): Long = math.floor(x * 1000.0 + 0.5).toLong
    val docs = Seq(
      (1L, "The cat sat. A dog ran!"), // 6 words, 2 sentences, 6 syllables
      (2L, "xyzzy 42"),                // fragment: 1 sentence; y counts, 42 floors
      (3L, "   ")).toDF("doc_id", "text")
    val got = graft.ops.Text.readability(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val fre1 = milli(206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0))
    val fk1 = milli(0.39 * (6.0 / 2.0) + 11.8 * (6.0 / 6.0) - 15.59)
    assert(got(0) == (1L, 6L, 2L, 6L, fre1, fk1), got(0).toString)
    // xyzzy → one [aeiouy]+ run ("y" twice but runs: x-y-zz-y → 2 runs);
    // 42 → zero runs, floored to 1 → syllables = 3
    val fre2 = milli(206.835 - 1.015 * (2.0 / 1.0) - 84.6 * (3.0 / 2.0))
    val fk2 = milli(0.39 * (2.0 / 1.0) + 11.8 * (3.0 / 2.0) - 15.59)
    assert(got(1) == (2L, 2L, 1L, 3L, fre2, fk2), got(1).toString)
    assert(got.length == 2) // whitespace-only doc absent
  }

  test("ngramNovelty: verbatim 0, disjoint 1e6, partial ratio, " +
      "short-doc clamped window") {
    import spark.implicits._
    val train = Seq("abcdefghij").toDF("text")
    val eval = Seq(
      (1L, "abcdefghij"), // every 5-gram in train → novelty 0
      (2L, "zzzzzzz"),    // 3 windows, none seen → 1e6
      (3L, "abcdeXYZYX"), // 6 windows, 1 seen → floor(5e6/6)
      (4L, "abc"))        // len < n: ONE clamped window, unseen
      .toDF("doc_id", "text")
    val got = graft.ops.Text.ngramNovelty(eval, "doc_id", "text",
        train, "text", n = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 6L, 6L, 0L), (2L, 3L, 0L, 1000000L),
      (3L, 6L, 1L, 833333L), (4L, 1L, 0L, 1000000L)), got.mkString(","))
  }

  test("invertedIndex: exact df, hot-term cap keeps lowest ids, " +
      "within-doc dedupe, sorted postings") {
    import spark.implicits._
    val docs = Seq(
      (5L, "alpha beta beta"), (3L, "alpha gamma"), (9L, "alpha beta"),
      (1L, "alpha"), (7L, "alpha")).toDF("doc_id", "text")
    val got = graft.ops.Text.invertedIndex(docs, "doc_id", "text",
        maxPostings = 3)
      .orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
    assert(got.toSeq == Seq(
      // alpha: df 5 (exact), postings capped at the 3 LOWEST ids
      ("alpha", 5L, Seq(1L, 3L, 5L)),
      // beta appears twice in doc 5 → one posting (within-doc dedupe)
      ("beta", 2L, Seq(5L, 9L)),
      ("gamma", 1L, Seq(3L))), got.mkString(","))
    // conjunctive serve (uncapped → exact): alpha AND beta = {5, 9};
    // duplicate query terms collapse; a missing term empties the result
    val full = graft.ops.Text.invertedIndex(docs, "doc_id", "text",
      maxPostings = 100)
    def serve(ts: Seq[String]) =
      graft.ops.Text.searchConjunctive(full, ts)
        .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(serve(Seq("alpha", "beta")) == Seq(5L, 9L))
    assert(serve(Seq("alpha", "alpha", "beta")) == Seq(5L, 9L))
    assert(serve(Seq("alpha", "nosuch")) == Seq.empty)
  }

  test("trendingTerms: smoothed ratio hand-replayed, new term ranks " +
      "first, min support filters, totals include both slices") {
    import spark.implicits._
    // cur: aa×5, new×5, bb×1 (Nc=11); prev: aa×5, bb×4, cc×1 (Np=10);
    // V=4 → ratio = (c_cur+1)·14e6 // ((c_prev+1)·15)
    val cur = Seq((1L, "aa aa aa aa aa bb new new new new new"))
      .toDF("id", "text")
    val prev = Seq((2L, "aa aa aa aa aa bb bb bb bb cc")).toDF("id", "text")
    val got = graft.ops.Text.trendingTerms(cur, "text", prev, "text",
        topN = 10, minCount = 5L)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(got.toSeq == Seq(
      ("new", 5L, 0L, 6L * 14000000L / 15L, 1),  // 5600000
      ("aa", 5L, 5L, 6L * 14000000L / 90L, 2)),  // 933333
      got.mkString(","))
  }

  test("invertedIndexTf + searchBm25: served top-k equals a direct bm25 " +
      "corpus rescore; tf carried exactly; truncation under-reports " +
      "by contract") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark query engine query"),      // query tf 2
      (2L, "query window plan"),
      (3L, "window window window shuffle"),
      (4L, "plan shuffle codegen"),
      (5L, "query window query window")).toDF("doc_id", "text")
    val idx = graft.ops.Text.invertedIndexTf(docs, "doc_id", "text",
      maxPostings = 100)
    // tf postings exact and doc-sorted
    val q = idx.where(org.apache.spark.sql.functions.col("term") === "query")
      .head()
    assert(q.getLong(1) == 3L)
    assert(q.getSeq[org.apache.spark.sql.Row](2)
      .map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((1L, 2L), (2L, 1L), (5L, 2L)))
    val dls = graft.ops.Text.docLengths(docs, "doc_id", "text")
    val served = graft.ops.Text.searchBm25(idx, dls,
        Seq("query", "window"), k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // direct corpus rescore through the same scorer, ranked the same way
    val direct = graft.ops.Text.bm25(docs, "doc_id", "text",
        Seq("query", "window"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, s) => (BigDecimal(s).unary_-, id) }
      .take(3).zipWithIndex
      .map { case ((id, s), i) => (id, s, i + 1) }
    assert(served.toSeq == direct.toSeq, s"served=${served.mkString(",")}")
    // truncated index: the capped term's dropped postings are absent
    // from the candidate union (the stated serving trade)
    val cut = graft.ops.Text.invertedIndexTf(docs, "doc_id", "text",
      maxPostings = 2)
    val servedCut = graft.ops.Text.searchBm25(cut, dls,
        Seq("query", "window"), k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(servedCut.subsetOf(Set(1L, 2L, 3L, 5L)) && servedCut.size <= 4)
    assert(!servedCut.contains(5L) || !servedCut.contains(3L) ||
      servedCut.size < 4) // at cap 2, at least one posting was dropped
  }
}
