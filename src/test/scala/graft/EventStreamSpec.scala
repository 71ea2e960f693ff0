package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream

/** Structured Streaming specs: windowed agg + sessionization through
  * MemoryStream micro-batches, and batch/stream result parity. */
class EventStreamSpec extends SparkSpec {

  private val H = 3600L * 1000000000L // 1 hour in ns

  test("windowedAgg over a MemoryStream: per-window per-type counts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val events = mem.toDF().toDF("ts_ns", "event_type", "value")
    mem.addData(
      (0L, "click", 1.0), (10L, "click", 2.0), (H / 2, "view", 5.0),
      (H + 1, "click", 7.0))
    val q = EventStream.windowedAgg(events)
      .writeStream.format("memory").queryName("winagg")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("winagg")
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getString(1), r.getLong(2),
        r.getDecimal(3).doubleValue())).toSeq
    assert(out == Seq(("click", 2L, 3.0), ("view", 1L, 5.0), ("click", 1L, 7.0)))
  }

  test("windowedAgg: batch-equivalence on in-order input (the same op body " +
      "over the same rows, stream vs batch)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (0L, "click", 1.0), (10L * 60 * 1000000000L, "view", 2.5),
      (H / 2, "click", 3.0), (H + 1, "click", 7.0), (2 * H + 5, "view", 0.5))
    // batch: withWatermark is eliminated for non-streaming plans, so the
    // IDENTICAL op runs as a plain groupBy
    val batch = EventStream.windowedAgg(
        rows.toDF("ts_ns", "event_type", "value"))
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDecimal(3).doubleValue())).toSeq
    val mem = MemoryStream[(Long, String, Double)]
    mem.addData(rows: _*)
    val q = EventStream.windowedAgg(
        mem.toDF().toDF("ts_ns", "event_type", "value"))
      .writeStream.format("memory").queryName("wineq")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val stream = spark.table("wineq").orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDecimal(3).doubleValue())).toSeq
    assert(stream == batch && batch.size == 4)
  }

  test("windowedAgg late-data policy under adversarial reorder: a late row " +
      "whose window is still above the watermark updates it; one whose " +
      "window the watermark passed is dropped; append emits final rows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 100 * H // clear of the initial watermark (== epoch 0)
    def m(min: Long) = base + min * 60 * 1000000000L
    val mem = MemoryStream[(Long, String, Double)]
    val q = EventStream.windowedAgg(
        mem.toDF().toDF("ts_ns", "event_type", "value"))
      .writeStream.format("memory").queryName("winlate")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // B1 in-order: two rows in window [0h,1h), one in [1h,2h).
    // Watermark after B1 = 65min − 30min = 35min.
    mem.addData((m(10), "click", 1.0), (m(20), "click", 2.0),
      (m(65), "click", 4.0))
    q.processAllAvailable()
    // B2 reordered: 50min arrives AFTER the 65min row — late, but its
    // window's end (60min) is still above the 35min watermark → ACCEPTED.
    // The 100min row pushes the watermark to 70min, past [0h,1h)'s end.
    mem.addData((m(50), "click", 8.0), (m(100), "click", 16.0))
    q.processAllAvailable()
    // B3: 15min's window end (60min) is now BELOW the 70min watermark —
    // state evicted, row DROPPED (the pinned policy). The far-future
    // flush row drives the watermark past every real window so append
    // emits them all as FINAL.
    mem.addData((m(15), "click", 32.0), (m(600), "flush", 0.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("winlate").orderBy("window_start")
      .collect().map(r => (r.getString(1), r.getLong(2),
        r.getDecimal(3).doubleValue())).toSeq
    // [0h,1h): 1+2+8 — the accepted late row counted, the dropped one not
    // (11.0 ≠ 43.0 is the whole spec); [1h,2h): 4+16. The flush window is
    // still open — append has not emitted it.
    assert(out == Seq(("click", 3L, 11.0), ("click", 2L, 20.0)), out.toString)
  }

  test("slidingAgg: overlapping windows multiply membership; stream equals " +
      "batch on in-order input") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 45min event: lands in windows starting 0min and 30min (1h/30m) —
    // 75min event: windows starting 30min and 60min. The 30min window
    // holds both (the overlap the tumbling form can't express).
    val rows = Seq((45L * 60 * 1000000000L, "click", 1.0),
      (75L * 60 * 1000000000L, "click", 2.0))
    def runBatch() = EventStream.slidingAgg(
        rows.toDF("ts_ns", "event_type", "value"),
        windowDur = "1 hour", slide = "30 minutes")
      .orderBy("window_start")
      .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(2),
        r.getDecimal(3).doubleValue())).toSeq
    val batch = runBatch()
    assert(batch == Seq((0L, 1L, 1.0), (30L, 2L, 3.0), (60L, 1L, 2.0)),
      batch.toString)
    val mem = MemoryStream[(Long, String, Double)]
    mem.addData(rows: _*)
    val q = EventStream.slidingAgg(
        mem.toDF().toDF("ts_ns", "event_type", "value"),
        windowDur = "1 hour", slide = "30 minutes")
      .writeStream.format("memory").queryName("slideagg")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val stream = spark.table("slideagg").orderBy("window_start")
      .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(2),
        r.getDecimal(3).doubleValue())).toSeq
    assert(stream == batch)
  }

  test("slidingAgg slide<window late-row asymmetry: a late row whose OLDEST " +
      "containing window is evicted but whose younger window is alive " +
      "counts in the young window's final emission and not the old one") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 100 * H // clear of the initial watermark (== epoch 0)
    def m(min: Long) = base + min * 60 * 1000000000L
    val mem = MemoryStream[(Long, String, Double)]
    // 1 h windows sliding by 30 min, 30 min watermark: every event lives in
    // TWO windows, so "late" is per window, not per event.
    val q = EventStream.slidingAgg(
        mem.toDF().toDF("ts_ns", "event_type", "value"),
        windowDur = "1 hour", slide = "30 minutes", watermark = "30 minutes")
      .writeStream.format("memory").queryName("slidelate")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // B1 in-order: 40min (windows [0,60) and [30,90)), 95min (windows
    // [60,120) and [90,150)). Watermark after B1 = 95 − 30 = 65min, which
    // passes [0,60)'s end — that window finalizes and its state evicts.
    mem.addData((m(40), "click", 1.0), (m(95), "click", 2.0))
    q.processAllAvailable()
    // B2: the 50min row is LATE and asymmetric — its oldest containing
    // window [0,60) is already evicted (end 60 < wm 65) but its younger
    // window [30,90) is alive (end 90 > 65). The pinned contract: it
    // updates [30,90) and does NOT resurrect or alter [0,60). The flush
    // row drives the watermark past every real window so append emits
    // them all as final.
    mem.addData((m(50), "click", 4.0), (m(600), "flush", 0.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("slidelate")
      .where(col("event_type") === "click")
      .orderBy("window_start")
      .collect().map(r => (r.getTimestamp(0).getTime / 60000 - 100 * 60,
        r.getLong(2), r.getDecimal(3).doubleValue())).toSeq
    // [0,60): the 40min row ONLY — sum 1.0, not 5.0 (the late row did not
    // reach the evicted window). [30,90): 40min AND the accepted late
    // 50min row — sum 5.0 is the asymmetry proof. [60,120)/[90,150): the
    // 95min row. The flush windows are still open — absent from append.
    assert(out == Seq((0L, 1L, 1.0), (30L, 2L, 5.0),
      (60L, 1L, 2.0), (90L, 1L, 2.0)), out.toString)
  }

  test("slidingAggPanes == slidingAgg at several window/slide ratios " +
      "(1x tumbling, 2x, 4x, 60x fine-slide), including null values; " +
      "non-divisible slide rejected") {
    import spark.implicits._
    // Events straddling pane boundaries, a null value (sum skips it,
    // count does not), and a duplicate timestamp — enough structure that
    // a wrong pane→window assignment or a lost partial shows up.
    val rows = Seq[(Long, String, Option[Double])](
      (45L * 60 * 1000000000L, "click", Some(1.0)),
      (45L * 60 * 1000000000L, "click", Some(2.0)),
      (75L * 60 * 1000000000L, "click", Some(4.0)),
      (75L * 60 * 1000000000L, "view", None),
      (119L * 60 * 1000000000L, "view", Some(8.0)),
      (181L * 60 * 1000000000L, "click", Some(16.0)))
    val df = rows.toDF("ts_ns", "event_type", "value")
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.orderBy("window_start", "event_type")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1),
          r.getLong(2), Option(r.getDecimal(3)).map(_.toString))).toSeq
    for ((w, s) <- Seq(("1 hour", "1 hour"), ("1 hour", "30 minutes"),
        ("2 hours", "30 minutes"), ("1 hour", "1 minute"))) {
      val direct = canon(EventStream.slidingAgg(df, w, s))
      val panes = canon(EventStream.slidingAggPanes(df, w, s))
      assert(panes == direct, s"window=$w slide=$s:\n$panes\nvs\n$direct")
      assert(direct.nonEmpty)
    }
    intercept[IllegalArgumentException] {
      EventStream.slidingAggPanes(df, "1 hour", "7 minutes")
    }
    intercept[IllegalArgumentException] {
      EventStream.slidingAggPanes(df, "1 month", "1 day")
    }
  }

  test("slidingAggPanes streaming recipe: slidingPanes as the stateful " +
      "stage (MemoryStream micro-batches), panesRollup in the sink — " +
      "equals batch slidingAgg over the same rows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (45L * 60 * 1000000000L, "click", 1.0),
      (75L * 60 * 1000000000L, "click", 2.0),
      (75L * 60 * 1000000000L, "view", 4.0),
      (119L * 60 * 1000000000L, "click", 8.0))
    val mem = MemoryStream[(Long, String, Double)]
    // the stateful half runs as a live streaming aggregation…
    val q = EventStream.slidingPanes(
        mem.toDF().toDF("ts_ns", "event_type", "value"),
        slide = "30 minutes")
      .writeStream.format("memory").queryName("panestage")
      .outputMode("complete").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(rows.take(2): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(2): _*) // second micro-batch updates pane state
    q.processAllAvailable(); q.stop()
    // …and the fold half runs downstream over the pane sink.
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.orderBy("window_start", "event_type")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1),
          r.getLong(2), r.getDecimal(3).toString)).toSeq
    val streamed = canon(EventStream.panesRollup(
      spark.table("panestage"), "1 hour", "30 minutes"))
    val batch = canon(EventStream.slidingAgg(
      rows.toDF("ts_ns", "event_type", "value"), "1 hour", "30 minutes"))
    // 4 events × 2 windows each → 6 distinct (window, type) rows
    assert(streamed == batch && batch.size == 6, s"$streamed vs $batch")
  }

  test("sessionAgg: gap-based sessions per user in streaming mode") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double)]
    val events = mem.toDF().toDF("ts_ns", "user_id", "event_type", "value")
    // user 1: two events 10 min apart (one session), then one 2 h later.
    mem.addData(
      (0L, 1L, "c", 0.0), (600L * 1000000000L, 1L, "c", 0.0),
      (2 * H, 1L, "c", 0.0))
    val q = EventStream.sessionAgg(events)
      .writeStream.format("memory").queryName("sessagg")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("sessagg").orderBy("session_start").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L), (1L, 1L)))
  }

  test("streamingDedup: first-per-fingerprint survives, watermark bounds state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val docs = mem.toDF().toDF("ts_ns", "doc_id", "content")
    // Three distinct contents; "dup me" arrives three times within the
    // watermark horizon — exactly one survivor per content. Timestamps sit
    // well above epoch: event_time == 0 equals the query's INITIAL
    // watermark and is filtered as late before dedup state is consulted.
    val base = 100 * H
    mem.addData(
      (base, 1L, "dup me"), (base + 1, 2L, "unique a"), (base + 2, 3L, "dup me"),
      (base + 600L * 1000000000L, 4L, "dup me"), (base + 3, 5L, "unique b"))
    val q = EventStream.streamingDedup(docs)
      .writeStream.format("memory").queryName("streamdedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("streamdedup")
    assert(out.count() == 3)
    assert(out.select("content").as[String].collect().sorted.toSeq ==
      Seq("dup me", "unique a", "unique b"))
  }

  test("streamingNearDedup: batches LSH-matched against persisted signatures") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq(
      (1001L, "the quick brown fox jumps over the lazy dog again and again"),
      (1002L, "completely different content with nothing shared whatsoever xyz"))
      .toDF("doc_id", "text")
    // Write the signature table and read it BACK: the stream must work off
    // storage (the persisted-signature contract), not corpus text.
    val sigDir = java.nio.file.Files.createTempDirectory("sigs")
      .resolve("t").toString
    graft.ops.Dedup.minHashSignatures(corpus, "doc_id", "text")
      .write.parquet(sigDir)
    val sigs = spark.read.parquet(sigDir)

    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val got = scala.collection.mutable.SortedSet.empty[(Long, Long)]
    val q = EventStream.streamingNearDedup(docs, sigs, "doc_id", "text",
        threshold = 0.5) { (survivors, bid) =>
      val ids = survivors.select("doc_id").as[Long].collect()
      got.synchronized { ids.foreach(i => got += (bid -> i)) }
    }.start()
    // Batch 1: one near-dup of corpus doc 1001 (one char changed), one
    // novel doc. Batch 2: a near-dup of corpus doc 1002.
    mem.addData(
      (1L, "the quick brown fox jumps over the lazy dot again and again"),
      (2L, "woolly mammoths roamed pleistocene steppes chewing sedge tufts"))
    q.processAllAvailable()
    mem.addData(
      (3L, "completely different content with nothing shared whatsoever xy"))
    q.processAllAvailable()
    q.stop()
    // Only the novel doc survives; both near-dups are dropped in their
    // own micro-batch.
    assert(got.map(_._2).toSeq == Seq(2L), s"got: $got")
  }

  test("streamingNearDedup: intra-batch near-dups collapse to one canonical survivor") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq(
      (1001L, "completely different content with nothing shared whatsoever xyz"))
      .toDF("doc_id", "text")
    val sigs = graft.ops.Dedup.minHashSignatures(corpus, "doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val got = scala.collection.mutable.SortedSet.empty[Long]
    val q = EventStream.streamingNearDedup(docs, sigs, "doc_id", "text",
        threshold = 0.5) { (survivors, _) =>
      val ids = survivors.select("doc_id").as[Long].collect()
      got.synchronized { ids.foreach(got += _) }
    }.start()
    // Docs 1 and 2 are novel near-dups OF EACH OTHER in the same batch —
    // without the intra-batch pass both would survive and both would enter
    // the corpus. Doc 3 is genuinely unique.
    mem.addData(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dot again and again"),
      (3L, "woolly mammoths roamed pleistocene steppes chewing sedge tufts"))
    q.processAllAvailable(); q.stop()
    assert(got.toSeq == Seq(1L, 3L), s"got: $got") // canonical = smallest id
  }

  test("self-extending loop: batch 2 near-dedups against batch 1's survivors") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq(
      (1001L, "completely different content with nothing shared whatsoever xyz"))
      .toDF("doc_id", "text")
    val sigDir = java.nio.file.Files.createTempDirectory("sigs-ext")
      .resolve("t").toString
    graft.ops.Dedup.minHashSignatures(corpus, "doc_id", "text")
      .write.parquet(sigDir)

    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val got = scala.collection.mutable.SortedSet.empty[(Long, Long)]
    val q = EventStream.streamingNearDedupSelfExtending(docs, sigDir,
        "doc_id", "text", threshold = 0.5) { (survivors, bid) =>
      val ids = survivors.select("doc_id").as[Long].collect()
      got.synchronized { ids.foreach(i => got += (bid -> i)) }
    }.start()
    // Batch 1: a novel doc — survives, and its SIGNATURE is appended.
    mem.addData(
      (1L, "the quick brown fox jumps over the lazy dog again and again"))
    q.processAllAvailable()
    // Batch 2: a near-dup of batch 1's SURVIVOR (not of the seeded corpus)
    // must now be dropped — the production contract the docstring
    // promises — while a genuinely novel doc still gets through.
    mem.addData(
      (2L, "the quick brown fox jumps over the lazy dot again and again"),
      (3L, "woolly mammoths roamed pleistocene steppes chewing sedge tufts"))
    q.processAllAvailable()
    assert(q.exception.isEmpty, s"query failed: ${q.exception}")
    q.stop()
    assert(got.toSeq == Seq(0L -> 1L, 1L -> 3L), s"got: $got")
    // The signature table now covers the seed corpus + both survivors.
    assert(spark.read.parquet(sigDir).select("_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 3L, 1001L))
  }

  test("self-extending loop survives a mid-stream signature-dir compaction") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // The docstring's operational contract: the per-batch appends accrete
    // small files, and the fix is graft.sinks.Compaction over sigDir —
    // which must leave the dedup behavior untouched for later batches.
    val corpus = Seq(
      (1001L, "completely different content with nothing shared whatsoever xyz"))
      .toDF("doc_id", "text")
    val sigDir = java.nio.file.Files.createTempDirectory("sigs-compact")
      .resolve("t").toString
    graft.ops.Dedup.minHashSignatures(corpus, "doc_id", "text")
      .write.parquet(sigDir)

    def runBatch(rows: (Long, String)*): Seq[Long] = {
      val mem = MemoryStream[(Long, String)]
      val docs = mem.toDF().toDF("doc_id", "text")
      val got = scala.collection.mutable.SortedSet.empty[Long]
      val q = EventStream.streamingNearDedupSelfExtending(docs, sigDir,
          "doc_id", "text", threshold = 0.5) { (survivors, _) =>
        val ids = survivors.select("doc_id").as[Long].collect()
        got.synchronized { ids.foreach(got += _) }
      }.start()
      mem.addData(rows: _*)
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query failed: ${q.exception}")
      q.stop()
      got.toSeq
    }

    assert(runBatch(
      (1L, "the quick brown fox jumps over the lazy dog again and again"))
      == Seq(1L))
    // Compact the accreted signature files down to one.
    val bytes = graft.sinks.Compaction.parquetBytes(spark, sigDir)
    graft.sinks.Compaction.compactParquetDir(spark, sigDir, bytes * 2)
    assert(graft.sinks.Compaction.parquetFileCount(spark, sigDir) == 1)
    // Near-dup of the pre-compaction survivor is still caught; novel
    // content still passes and extends the (now-compacted) table.
    assert(runBatch(
      (2L, "the quick brown fox jumps over the lazy dot again and again"),
      (3L, "woolly mammoths roamed pleistocene steppes chewing sedge tufts"))
      == Seq(3L))
    assert(spark.read.parquet(sigDir).select("_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 3L, 1001L))
  }

  test("corpus-clean expressions run unchanged in a streaming pipeline") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._
    // The text-quality / sampling / PII layers are stateless per-row
    // expressions, so the SAME code drives a readStream ingest: filter by
    // token count, deterministic-sample, redact — no batch/stream fork.
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    mem.addData(
      (0L, "the quick brown fox jumped over the lazy dog entirely"),
      (1L, "short"),
      (2L, "email me at a@b.co right now please thanks kindly friend"),
      (3L, "x y z"))
    val cleaned = graft.ops.Sampling.stratifiedSample(
        docs.where(graft.functions.TextFunctions.tokenCountWs(col("text")) >= 3),
        "text", "doc_id", Map.empty)
      .select(col("doc_id"),
        graft.functions.TextFunctions.redactPii(col("text")).as("clean"))
    val q = cleaned.writeStream.format("memory").queryName("streamclean")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("streamclean").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out.map(_._1) == Seq(0L, 2L, 3L)) // doc 1 fails the length gate
    assert(out(1)._2 == "email me at <EMAIL> right now please thanks kindly friend")
  }

  test("windowedAgg under adversarial reorder: out-of-order rows whose " +
      "window is still OPEN aggregate (even below the raw watermark), a " +
      "row for an already-FINALIZED window drops (count pinned), " +
      "unfinalized windows stay in state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val events = mem.toDF().toDF("ts_ns", "event_type", "value")
    def m(x: Long): Long = x * 60L * 1000000000L // minutes -> ns
    val q = EventStream.windowedAgg(events) // 1 h windows, 30 min watermark
      .writeStream.format("memory").queryName("wooagg")
      .outputMode("append").start()
    // batch 1: in-order. max event time 10h10 -> watermark becomes 9h40.
    mem.addData((m(570), "view", 1.0), (m(600), "click", 1.0),
      (m(610), "click", 1.0))
    q.processAllAvailable()
    // batch 2 (wm 9h40): the 9h50 click AND the 9h10 view are both out
    // of order, and BOTH aggregate — lateness is per WINDOW, not per
    // event: their window [9,10) (end 10h) is still open at wm 9h40.
    // The 11h40 click advances the wm to 11h10, which FINALIZES [9,10)
    // and [10,11) (the engine runs a no-data batch to emit them).
    mem.addData((m(590), "click", 1.0), (m(550), "view", 1.0),
      (m(700), "click", 1.0))
    q.processAllAvailable()
    // batch 3 (wm 11h10): a second 9h50 view now targets the FINALIZED
    // [9,10) -> DROPPED (the pinned late-data loss); 20h advances the
    // wm to 19h30, finalizing [11,12) too.
    mem.addData((m(590), "view", 1.0), (m(1200), "click", 1.0))
    q.processAllAvailable()
    val dropped = q.recentProgress
      .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
    q.stop()
    val out = spark.table("wooagg")
      .selectExpr("unix_micros(window_start) div 3600000000L as hh",
        "event_type", "n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    // [9,10): both out-of-order rows counted, the post-finalization one
    // is NOT; [20,21) (the dummy's own window) is absent — still open.
    assert(out == Seq((9L, "click", 1L), (9L, "view", 2L),
      (10L, "click", 2L), (11L, "click", 1L)), out.mkString(","))
    assert(dropped == 1L,
      s"exactly the post-finalization 9h50 view must drop, got $dropped")
  }

  test("sessionAgg under adversarial reorder: an out-of-order row MERGES " +
      "into its session, a row whose would-be session is already closed " +
      "drops (count pinned), open sessions stay in state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double)]
    val events = mem.toDF().toDF("ts_ns", "user_id", "event_type", "value")
    def m(x: Long): Long = x * 60L * 1000000000L // minutes -> ns
    val q = EventStream.sessionAgg(events) // 30 min gap, 30 min watermark
      .writeStream.format("memory").queryName("woosess")
      .outputMode("append").start()
    // batch 1: user 1 at 10h00 and 10h10 (one session), user 2 at 10h05;
    // wm -> 9h40.
    mem.addData((m(600), 1L, "c", 0.0), (m(610), 1L, "c", 0.0),
      (m(605), 2L, "c", 0.0))
    q.processAllAvailable()
    // batch 2 (wm 9h40): user 1 at 9h50 is out of order and within the
    // 30 min gap of 10h00 -> MERGES (session becomes 9h50..10h10, n=3);
    // user 3 at 13h advances the wm to 12h30, which finalizes every
    // session ending before it (users 1-3; the engine's no-data batch
    // emits them).
    mem.addData((m(590), 1L, "c", 0.0), (m(780), 3L, "c", 0.0))
    q.processAllAvailable()
    // batch 3 (wm 12h30): user 2 at 9h10 would form a session ending
    // 9h40 <= wm -> DROPPED (the pinned late-data loss); the 20h dummy
    // leaves its own session open.
    mem.addData((m(550), 2L, "c", 0.0), (m(1200), 4L, "c", 0.0))
    q.processAllAvailable()
    val dropped = q.recentProgress
      .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
    q.stop()
    val out = spark.table("woosess")
      .selectExpr("unix_micros(session_start) div 60000000L as mm",
        "user_id", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => t._2).toSeq
    // user 1's session STARTS at the out-of-order 9h50 event (merge
    // proof); user 2's late row did not resurrect a second session;
    // user 4's session is still open -> absent.
    assert(out == Seq((9L * 60 + 50, 1L, 3L), (10L * 60 + 5, 2L, 1L),
      (13L * 60, 3L, 1L)), out.mkString(","))
    assert(dropped == 1L, s"exactly the 9h10 row must drop, got $dropped")
  }

  test("ts_ns -> event_time is exact integer division at the 2^53 boundary") {
    import spark.implicits._
    // exact µs = 2^53 + 1 — NOT representable as a double (doubles above
    // 2^53 are even), so float division `ts_ns/1000` rounds it down to
    // 2^53 and shifts the event by 1 µs; `ts_ns div 1000` must not.
    val exactMicros = (1L << 53) + 1 // 9007199254740993
    val ts = exactMicros * 1000L
    val df = Seq((ts, "click", 1.0)).toDF("ts_ns", "event_type", "value")
    val out = EventStream.windowedAgg(df, windowDur = "1 microsecond")
      .selectExpr("unix_micros(window_start)").as[Long].collect()
    assert(out.toSeq == Seq(exactMicros))
  }

  test("batch/stream parity: same expression over the events parquet") {
    // File stream sources want a directory; stage the events file into one.
    val dir = java.nio.file.Files.createTempDirectory("events-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = EventStream.windowedAgg(
      graft.queries.Tables.tsNs(spark.read.parquet(dir))
        .withColumnRenamed("ts", "ts_ns"))
    val q = EventStream.fromParquetDir(spark, dir)
      .writeStream.format("memory").queryName("paritystream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("paritystream")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("self-extending loop: at-least-once replay is not self-dropped and " +
      "appends no duplicate signatures") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq(
      (1001L, "completely different content with nothing shared whatsoever xyz"))
      .toDF("doc_id", "text")
    val sigDir = java.nio.file.Files.createTempDirectory("sigs-replay")
      .resolve("t").toString
    graft.ops.Dedup.minHashSignatures(corpus, "doc_id", "text")
      .write.parquet(sigDir)

    // One delivery of the SAME batch content (stable ids — the foreachBatch
    // at-least-once shape: crash after the signature append, replay).
    def deliverOnce(): Seq[Long] = {
      val mem = MemoryStream[(Long, String)]
      val docs = mem.toDF().toDF("doc_id", "text")
      val got = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = EventStream.streamingNearDedupSelfExtending(docs, sigDir,
          "doc_id", "text", threshold = 0.5) { (survivors, _) =>
        val ids = survivors.select("doc_id").as[Long].collect()
        got.synchronized { got ++= ids }
      }.start()
      mem.addData(
        (1L, "the quick brown fox jumps over the lazy dog again and again"),
        (2L, "the quick brown fox jumps over the lazy dot again and again"))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query failed: ${q.exception}")
      q.stop()
      got.sorted.toSeq
    }
    // First delivery: 1 survives, 2 is its intra-batch near-dup.
    assert(deliverOnce() == Seq(1L))
    // REPLAY, arriving after 1's signature is already in the table: the
    // batch must re-derive the same survivor set (1 ignores its own
    // signature; 2 falls to it — same outcome), NOT be silently dropped.
    assert(deliverOnce() == Seq(1L))
    // And the append is row-idempotent: no duplicate signature rows.
    val ids = spark.read.parquet(sigDir).select("_id").as[Long]
      .collect().sorted.toSeq
    assert(ids == Seq(1L, 1001L), s"signature table: $ids")
  }

  test("streamingHllRegisters: streaming registers across micro-batches " +
      "equal the batch build; estimate bit-identical") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val events = mem.toDF().toDF("g", "v")
    val q = EventStream.streamingHllRegisters(events, Seq("g"), "v", p = 6)
      .writeStream.format("memory").queryName("shll")
      .outputMode("complete").start()
    val b1 = (0 until 300).map(i => ("x", s"u$i")) ++
      (0 until 40).map(i => ("y", s"w$i"))
    val b2 = (150 until 450).map(i => ("x", s"u$i")) // overlaps b1
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("shll").orderBy("g", "bucket")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
    val batch = graft.ops.Sketches.hllRegisters(
        (b1 ++ b2).toDF("g", "v"), Seq("g"), "v", p = 6)
      .orderBy("g", "bucket")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
    assert(streamed == batch)
    // estimation is a pure function of the registers → bit-identical
    val se = graft.ops.Sketches.hllEstimate(spark.table("shll"),
      Seq("g"), p = 6).orderBy("g").collect().map(_.getLong(1)).toSeq
    val be = graft.ops.Sketches.hllDistinct((b1 ++ b2).toDF("g", "v"),
      Seq("g"), "v", p = 6).orderBy("g").collect().map(_.getLong(1)).toSeq
    assert(se == be && math.abs(se.head - 450L) < 120L, s"$se vs $be")
  }
}
