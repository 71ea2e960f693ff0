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
    def s(tf: Long, df: Long) =
      BigDecimal(tf * math.log(4.0 / df))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
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
}
