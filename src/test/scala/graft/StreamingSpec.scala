package graft

import java.nio.file.{Files, Paths}
import graft.streaming._
import graft.streaming.PdfWatcher.{FileObs, PoStatus}

/** S8 watcher state machine + S6/T1–T6 orchestrator specs. */
class StreamingSpec extends SparkSpec {
  implicit lazy val s: org.apache.spark.sql.SparkSession = spark

  test("S8 matchPo: -<PO>.pdf suffix, case-insensitive") {
    assert(PdfWatcher.matchPo("acme-142-57466.pdf", Seq("57466")) == Some("57466"))
    assert(PdfWatcher.matchPo("ACME-57466.PDF", Seq("57466")) == Some("57466"))
    assert(PdfWatcher.matchPo("57466.pdf", Seq("57466")) == None)
    assert(PdfWatcher.matchPo("x-574661.pdf", Seq("57466")) == None)
  }

  test("S8 settle: stable size for settle window -> SETTLED once") {
    import spark.implicits._
    val obs = Seq(
      FileObs("57466", "/w/a-57466.pdf", 100, 0),
      FileObs("57466", "/w/a-57466.pdf", 100, 1000),
      FileObs("57466", "/w/a-57466.pdf", 100, 3500),
      FileObs("57466", "/w/a-57466.pdf", 100, 9000)).toDS()
    val out = PdfWatcher.settleBatch(obs, settleMs = 3000, maxWaitMs = 300000)
      .collect().toSeq
    assert(out == Seq(PoStatus("57466", "SETTLED", "/w/a-57466.pdf", 3500)))
  }

  test("S8 settle: size change re-arms the debounce clock") {
    import spark.implicits._
    val obs = Seq(
      FileObs("p", "/w/x-p.pdf", 100, 0),
      FileObs("p", "/w/x-p.pdf", 200, 2900),  // grew -> re-arm
      FileObs("p", "/w/x-p.pdf", 200, 4000),  // only 1.1s stable
      FileObs("p", "/w/x-p.pdf", 200, 6000)).toDS() // 3.1s stable -> settle
    val out = PdfWatcher.settleBatch(obs, settleMs = 3000, maxWaitMs = 300000)
      .collect().toSeq
    assert(out.map(_.atMs) == Seq(6000L))
  }

  test("S8 timeout: never-stable file times out after maxWait") {
    import spark.implicits._
    val obs = (0 to 12).map(i =>
      FileObs("p", "/w/x-p.pdf", 100 + i, i * 1000L)).toDS()
    val out = PdfWatcher.settleBatch(obs, settleMs = 3000, maxWaitMs = 10000)
      .collect().toSeq
    assert(out.map(_.status) == Seq("TIMEOUT"))
    assert(out.head.atMs == 10000L)
  }

  test("S8 sweep + move: real files, K10 move semantics") {
    val watch = Files.createTempDirectory("watch").toString
    val dest = Files.createTempDirectory("dest").toString
    Files.write(Paths.get(s"$watch/acme-142-57466.pdf"), Array[Byte](1, 2, 3))
    Files.write(Paths.get(s"$watch/unrelated.txt"), Array[Byte](1))
    val obs = PdfWatcher.sweep(Seq(watch), Seq("57466"), nowMs = 5)
    assert(obs.size == 1 && obs.head.po == "57466" && obs.head.size == 3)
    val moved = PdfWatcher.moveSettled(
      PoStatus("57466", "SETTLED", obs.head.path, 5), dest)
    assert(Files.exists(moved) && !Files.exists(Paths.get(obs.head.path)))
    // idempotent: second move (file already present) is a no-op
    assert(PdfWatcher.moveSettled(
      PoStatus("57466", "SETTLED", obs.head.path, 6), dest) == moved)
  }

  test("S8 watchLoop: virtual-time poll until settle + move, missing PO times out") {
    val watch = Files.createTempDirectory("wl-watch").toString
    val dest = Files.createTempDirectory("wl-dest").toString
    Files.write(Paths.get(s"$watch/v-142-57466.pdf"), Array[Byte](1, 2))
    var now = 0L
    val statuses = PdfWatcher.watchLoop(
      Seq(watch), Seq("57466", "99999"), dest,
      settleMs = 3000, maxWaitMs = 10000, pollMs = 2000,
      clock = () => now, sleep = ms => now += ms)
    assert(statuses.map(s => (s.po, s.status)) ==
      Seq(("57466", "SETTLED"), ("99999", "TIMEOUT")))
    assert(Files.exists(Paths.get(s"$dest/v-142-57466.pdf")))
    assert(!Files.exists(Paths.get(s"$watch/v-142-57466.pdf")))
  }

  test("T5 arrivedItem: store parse from moved filename, PO fallback") {
    assert(PdfWatcher.arrivedItem("acme-142-57466.pdf", "57466") == "142")
    assert(PdfWatcher.arrivedItem("acme-57466.pdf", "57466") == "57466")
  }

  test("F16 a1 encode") {
    assert(Orchestrator.a1(3, 28) == "AB3")
    assert(Orchestrator.a1(1, 1) == "A1")
    assert(Orchestrator.a1(12, 26) == "Z12")
  }

  test("S6 parseSections: FIXTURES §8 golden") {
    val grid = Seq(
      Seq("Note", "Vendor #", "Vendor Name", "452/490", "142", "Status"),
      Seq("seafood", "10001", "Acme Fish", "57466.0", "x", "Ready"),
      Seq("", "10002", "Gulf Co", "", "68594", "Sent"),
      Seq("", "", "", "", "", ""),
      Seq("Note", "Vendor #", "Vendor Name", "165", "Status", ""),
      Seq("meat", "20001", "Plains Beef", "11111", "Ready", ""))
    val rows = Orchestrator.parseSections(grid)
    assert(rows.size == 3)
    val r1 = rows(0)
    assert(r1.section == "seafood" && r1.vendorNum == "10001" &&
      r1.status == "Ready" && r1.statusA1 == "F2")
    // Store columns admit digit-only headers (reference is_int_str), so
    // '142' is captured and composite '452/490' is not.
    assert(r1.stores == Map("142" -> "x"))
    assert(rows(1).stores == Map("142" -> "68594"))
    val r3 = rows(2)
    assert(r3.section == "meat" && r3.statusA1 == "E6" && r3.stores == Map("165" -> "11111"))
  }

  test("J5 storePoItems: x/blank skip, .0 strip, multi-code expansion") {
    val row = Orchestrator.VendorRow("s", 2, "10001", "Acme", "Ready", "F2",
      Map("452/490" -> "57466.0", "142" -> "x", "165" -> ""))
    assert(Orchestrator.storePoItems(row) == Seq("452-57466", "490-57466"))
  }

  test("T2/T4 claim + complete: idempotent state machine") {
    val rows = Seq(
      Orchestrator.VendorRow("s", 2, "10001", "A", Orchestrator.Ready, "F2", Map()),
      Orchestrator.VendorRow("s", 3, "10002", "B", Orchestrator.Sent, "F3", Map()))
    val w = new InMemoryStatusWriter
    val claimed = Orchestrator.claimReady(rows, w, Set.empty)
    assert(claimed.map(_.vendorNum) == Seq("10001"))
    assert(w.cells.toMap == Map("F2" -> Orchestrator.Sending))
    // duplicate micro-batch with the vendor already active claims nothing
    val again = Orchestrator.claimReady(rows, w, Set("10001"))
    assert(again.isEmpty)
    Orchestrator.completeVendors(Seq((rows(0), true)), w)
    assert(w.cells("F2") == Orchestrator.Sent)
  }

  test("T6 isWithin: guarded cleanup path check") {
    val base = Paths.get("/tmp/output_folder")
    assert(Orchestrator.isWithin(base, Paths.get("/tmp/output_folder/pdf_vendor_1/x.pdf")))
    assert(!Orchestrator.isWithin(base, Paths.get("/tmp/elsewhere/x.pdf")))
    assert(!Orchestrator.isWithin(base, Paths.get("/tmp/output_folder/../etc/passwd")))
  }

  test("S5 recipients: vendor .0 strip, email extraction, dedupe") {
    val dir = Files.createTempDirectory("rcpt").toString
    graft.sinks.XlsxWriter.write(s"$dir/vendors.xlsx", Seq(
      graft.sinks.XlsxWriter.Sheet("s", Seq(
        Seq("Vendor #", "Name", "Emails", "More"),
        Seq("10001.0", "Acme", "A@b.com; x a@B.com", "c@d.org"),
        Seq("", "skip", "z@z.org", "")))))
    val r = Recipients.load(s"$dir/vendors.xlsx")
    assert(r == Map("10001" -> Seq("a@b.com", "c@d.org")))
  }

  test("K8 email body: items list and body+signature composition") {
    val b = EmailBody.body(Seq("142-57466", "490-68594"))
    assert(b.contains("<li>142-57466</li>"))
    val combined = EmailBody.combine(b, "<html><body><p>Sig</p></body></html>")
    assert(combined.contains("<p>Sig</p>") && combined.contains("<li>142-57466</li>"))
    assert("(?is)<body".r.findAllIn(combined).size == 1)
  }

  // ── K7: injectable e-mail sink ──────────────────────────────────────────

  /** Fake transport recording every POST; scripted responses per URL. */
  private final class FakeHttp(respond: String => (Int, String)) extends HttpPost {
    val posts = scala.collection.mutable.ArrayBuffer
      .empty[(String, Map[String, String], String)]
    override def post(url: String, headers: Map[String, String], body: String,
                      timeout: java.time.Duration): (Int, String) = this.synchronized {
      posts += ((url, headers, body))
      respond(url)
    }
  }

  test("K7 GraphEmailSender: payload shape, auth header, 30s timeout path") {
    val http = new FakeHttp(_ => (202, ""))
    val sender = new GraphEmailSender(() => "tok-123", http)
    sender.send(EmailMessage(
      to = Seq("buyer@example.com"), cc = Seq("cc@example.com"),
      subject = "POs 142-57466", htmlBody = "<html><body>hi \"q\"</body></html>",
      attachments = Seq("po.pdf" -> "PDFBYTES".getBytes)))
    val (url, headers, body) = http.posts.head
    assert(url == "https://graph.microsoft.com/v1.0/me/sendMail")
    assert(headers("Authorization") == "Bearer tok-123")
    assert(body.contains(""""subject":"POs 142-57466""""))
    assert(body.contains(""""address":"buyer@example.com""""))
    assert(body.contains(""""address":"cc@example.com""""))
    assert(body.contains(""""contentType":"HTML""""))
    assert(body.contains("hi \\\"q\\\""))
    assert(body.contains(java.util.Base64.getEncoder.encodeToString("PDFBYTES".getBytes)))
    assert(body.contains("#microsoft.graph.fileAttachment"))
  }

  test("K7 GraphEmailSender: invalid recipient and HTTP failure are loud") {
    val http = new FakeHttp(_ => (500, "boom"))
    val sender = new GraphEmailSender(() => "tok", http)
    val bad = intercept[IllegalArgumentException] {
      sender.send(EmailMessage(Seq("not-an-email"), Nil, "s", "b", Nil))
    }
    assert(bad.getMessage.contains("invalid recipient"))
    assert(http.posts.isEmpty) // rejected before any network call
    val failed = intercept[RuntimeException] {
      sender.send(EmailMessage(Seq("a@b.co"), Nil, "s", "b", Nil))
    }
    assert(failed.getMessage.contains("HTTP 500"))
  }

  test("K7 DeviceCodeTokenProvider: device flow, pending poll, file cache") {
    val cache = java.nio.file.Files.createTempFile("tokcache", ".json")
    java.nio.file.Files.delete(cache)
    var polls = 0
    val http = new FakeHttp(url =>
      if (url.endsWith("/devicecode"))
        (200, """{"device_code":"dc1","interval":0,"expires_in":900,
                 |"message":"go to https://microsoft.com/devicelogin code ABC"}""".stripMargin)
      else {
        polls += 1
        if (polls < 3) (400, """{"error":"authorization_pending"}""")
        else (200, """{"access_token":"at-99","expires_in":3600}""")
      })
    var shown = ""
    val clock = new java.util.concurrent.atomic.AtomicLong(1000000L)
    val provider = new DeviceCodeTokenProvider("client-id", "common",
      cachePath = cache, http = http, onUserCode = shown = _,
      sleepMs = _ => (), nowMs = () => clock.get())
    assert(provider() == "at-99")
    assert(polls == 3)
    assert(shown.contains("devicelogin"))
    // Second call hits the file cache — no new HTTP at all.
    val before = http.posts.size
    assert(provider() == "at-99")
    assert(http.posts.size == before)
    // After expiry the flow re-runs.
    clock.addAndGet(4000L * 1000)
    polls = 0
    assert(provider() == "at-99")
    assert(polls >= 1)
  }

  test("K7+T3 end-to-end: tick claims, processes concurrently, sends, completes") {
    val grid = Seq(
      Seq("Note", "Vendor #", "Vendor Name", "Status", "490", "57"),
      Seq("Week 33", "81214", "Acme", "Ready", "68594", "x"),
      Seq("", "70005", "Bolt", "Ready", "", "57466"),
      Seq("", "99999", "Crash", "Ready", "1", ""))
    val writer = new InMemoryStatusWriter
    val sender = new InMemoryEmailSender
    val recipients = Map("81214" -> Seq("acme@example.com"),
      "70005" -> Seq("bolt@example.com"), "99999" -> Seq("crash@example.com"))
    // Barrier: passes only if two vendors are genuinely in-flight at once.
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = Orchestrator.runTick(grid, writer, Set.empty, workers = 4) { row =>
      if (row.vendorNum == "99999") throw new RuntimeException("vendor blew up")
      barrier.await(5, java.util.concurrent.TimeUnit.SECONDS)
      val items = Orchestrator.storePoItems(row)
      sender.send(EmailMessage(recipients(row.vendorNum), Nil,
        s"POs ${items.mkString(", ")}", EmailBody.body(items), Nil))
      true
    }
    assert(results.map(_._1.vendorNum) == Seq("81214", "70005", "99999"))
    assert(results.map(_._2) == Seq(true, true, false)) // failure isolated
    // Claim marked every row SENDING, then terminal states written back.
    assert(writer.cells("D2") == Orchestrator.Sent)
    assert(writer.cells("D3") == Orchestrator.Sent)
    assert(writer.cells("D4") == Orchestrator.Error)
    val subjects = sender.sent.map(_.subject).sorted
    assert(subjects == Seq("POs 490-68594", "POs 57-57466"))
  }

  test("MiniJson: strings with escapes, nested arrays/objects, literals") {
    import graft.streaming.MiniJson
    val v = MiniJson.parse(
      """{"a":[1,2,[3]],"s":"q\"\\\nA","b":true,"n":null,"o":{"x":-1.5e2}}""")
      .asInstanceOf[Map[String, Any]]
    assert(v("a") == Vector(1.0, 2.0, Vector(3.0)))
    assert(v("s") == "q\"\\\nA")
    assert(v("b") == true && v("n") == null)
    assert(v("o").asInstanceOf[Map[String, Any]]("x") == -150.0)
    intercept[IllegalArgumentException](MiniJson.parse("""{"a":1} junk"""))
  }

  test("S6/K9 live transport: full tick through a fake Sheets REST API") {
    // Fake Sheets v4 endpoints: metadata (tab list), values GET (the grid),
    // values:batchUpdate POST (recorded). Grid has one Ready vendor.
    val meta =
      """{"sheets":[
        |  {"properties":{"title":"Notes","index":0,"hidden":true}},
        |  {"properties":{"title":"Tues Orders","index":1}},
        |  {"properties":{"title":"Wed Orders","index":2}}]}""".stripMargin
    val grid =
      """{"range":"'Tues Orders'!A1:E3","majorDimension":"ROWS","values":[
        |  ["Note","Vendor #","Vendor Name","Status","490"],
        |  ["wk33","81214","Acme","Ready","68594"],
        |  ["","70005","Bolt","Sent","1"]]}""".stripMargin
    val posts = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val fakeGet = new HttpGet {
      def get(url: String, h: Map[String, String], t: java.time.Duration) = {
        assert(h("Authorization") == "Bearer tok-1")
        if (url.contains("/values/")) {
          assert(url.contains("%27Tues%20Orders%27"), url) // URL-encoded 'title'
          (200, grid)
        } else (200, meta)
      }
    }
    val fakePost = new HttpPost {
      def post(url: String, h: Map[String, String], body: String,
               t: java.time.Duration) = { posts += url -> body; (200, "{}") }
    }
    val client = new SheetsClient("sheet-123", () => "tok-1",
      http = fakeGet, httpPost = fakePost)
    // Tab list includes hidden 'Notes' (gspread's worksheets() does not
    // filter on visibility); Tuesday still matches "Tues Orders".
    val titles = client.sheetTitles()
    assert(titles == Seq("Notes", "Tues Orders", "Wed Orders"))
    val title = Sheets.pickTodayTitle(titles, java.time.DayOfWeek.TUESDAY).get
    assert(title == "Tues Orders")
    // Grid parses into the orchestrator's shape and a tick runs end-to-end.
    val values = client.getAllValues(title)
    assert(values(1) == Seq("wk33", "81214", "Acme", "Ready", "68594"))
    val writer = new RestStatusWriter(client, title)
    val results = Orchestrator.runTick(values, writer, Set.empty)(_ => true)
    assert(results.map(r => r._1.vendorNum -> r._2) == Seq("81214" -> true))
    // Two batchUpdate posts: SENDING on claim, Sent on completion — against
    // the row's own Status cell (D2), range-qualified with the tab title.
    assert(posts.size == 2)
    assert(posts.forall(_._1.endsWith("/sheet-123/values:batchUpdate")))
    assert(posts(0)._2.contains(""""range":"'Tues Orders'!D2""""))
    assert(posts(0)._2.contains(""""values":[["SENDING"]]"""))
    assert(posts(1)._2.contains(""""values":[["Sent"]]"""))
    // Empty update never posts (reference early-returns too).
    client.batchUpdate(title, Seq.empty)
    assert(posts.size == 2)
  }

  test("S7 parity: a HIDDEN day-named tab is still picked (sheets.py:42)") {
    // The reference's weekday pick iterates sh.worksheets(), which includes
    // hidden worksheets — a hidden 'Wed Orders' tab must win on Wednesday,
    // not be skipped in favor of the first visible sheet.
    val meta =
      """{"sheets":[
        |  {"properties":{"title":"Summary","index":0}},
        |  {"properties":{"title":"Wed Orders","index":1,"hidden":true}}]}""".stripMargin
    val fakeGet = new HttpGet {
      def get(url: String, h: Map[String, String], t: java.time.Duration) =
        (200, meta)
    }
    val fakePost = new HttpPost {
      def post(url: String, h: Map[String, String], body: String,
               t: java.time.Duration) = (200, "{}")
    }
    val client = new SheetsClient("sheet-123", () => "tok-1",
      http = fakeGet, httpPost = fakePost)
    val titles = client.sheetTitles()
    assert(titles == Seq("Summary", "Wed Orders"))
    assert(Sheets.pickTodayTitle(titles, java.time.DayOfWeek.WEDNESDAY)
      == Some("Wed Orders"))
  }

  test("T3 per-vendor budget: 5 claimed vendors on a 4-pool ALL execute") {
    // The reference waits result(timeout=300) on EACH future
    // (sheet_bot/main.py:28) — the budget is per vendor, not a shared tick
    // deadline. With 5 Ready vendors on 4 workers and per-vendor work
    // longer than half the budget, a shared deadline would expire the
    // queued 5th vendor at left=0 before it ever ran; per-future waits let
    // it execute and succeed.
    val grid = Seq("Note", "Vendor #", "Vendor Name", "Status") +:
      (1 to 5).map(i => Seq("", s"$i$i$i$i$i", s"V$i", "Ready"))
    val writer = new InMemoryStatusWriter
    val sleepMs = 600L
    val results = Orchestrator.runTick(grid, writer, Set.empty, workers = 4,
        vendorTimeoutMs = 900L) { _ =>
      Thread.sleep(sleepMs); true
    }
    assert(results.size == 5)
    assert(results.forall(_._2), s"a queued vendor was expired unrun: $results")
    (2 to 6).foreach(r => assert(writer.cells(s"D$r") == Orchestrator.Sent))
  }

  test("T3 hung vendor: tick completes within budget, hung ERROR, others Sent") {
    val grid = Seq(
      Seq("Note", "Vendor #", "Vendor Name", "Status"),
      Seq("wk", "11111", "Quick", "Ready"),
      Seq("", "22222", "Hung", "Ready"),
      Seq("", "33333", "AlsoQuick", "Ready"))
    val writer = new InMemoryStatusWriter
    val hungEntered = new java.util.concurrent.CountDownLatch(1)
    // The hung vendor blocks far beyond the tick's budget (the reference
    // bounds each vendor at 300 s; here 200 ms so the spec is fast). The
    // tick must NOT stall on it: it expires the wait, records ERROR, and
    // still writes every other vendor's terminal status.
    val t0 = System.nanoTime()
    val results = Orchestrator.runTick(grid, writer, Set.empty, workers = 4,
        vendorTimeoutMs = 200L) { row =>
      if (row.vendorNum == "22222") {
        hungEntered.countDown()
        try Thread.sleep(60000) catch { case _: InterruptedException => () }
        false
      } else {
        // ensure the hung vendor is genuinely running concurrently
        hungEntered.await(5, java.util.concurrent.TimeUnit.SECONDS)
        true
      }
    }
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(elapsedMs < 10000, s"tick stalled ${elapsedMs}ms on a hung vendor")
    assert(results.map(r => r._1.vendorNum -> r._2).toMap ==
      Map("11111" -> true, "22222" -> false, "33333" -> true))
    assert(writer.cells("D2") == Orchestrator.Sent)
    assert(writer.cells("D3") == Orchestrator.Error)
    assert(writer.cells("D4") == Orchestrator.Sent)
  }
}
