package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** S6/K9 — the live Google Sheets transport, against the PUBLIC Sheets v4
  * REST API (the reference reaches the same API through gspread:
  * /root/reference/sheet_bot/sheets.py:30-50,182-189). Like the e-mail sink
  * (K7), the HTTP layer and token acquisition are injectable, so
  * orchestration code depends only on [[StatusWriter]]/grid values and
  * tests drive a full tick through a fake transport.
  *
  * Surface mirrored from the reference:
  *  - worksheet list + today's-tab pick by weekday name prefix
  *    (sheets.py:38-46, utils.py:29-35);
  *  - whole-sheet string grid, the input to [[Orchestrator.parseSections]]
  *    (sheets.py:48-50 get_all_values);
  *  - batched status write-back of (A1, value) pairs
  *    (sheets.py:182-189 batch_update).
  */
object Sheets {

  /** Reference DAY_PREFIXES (utils.py:29-35): note Tue/Thu accept two
    * spellings. */
  val DayPrefixes: Map[java.time.DayOfWeek, Seq[String]] = Map(
    java.time.DayOfWeek.MONDAY -> Seq("mon"),
    java.time.DayOfWeek.TUESDAY -> Seq("tues", "tue"),
    java.time.DayOfWeek.WEDNESDAY -> Seq("wed"),
    java.time.DayOfWeek.THURSDAY -> Seq("thurs", "thu"),
    java.time.DayOfWeek.FRIDAY -> Seq("fri"))

  /** Today's tab by name prefix, falling back to the first sheet. */
  def pickTodayTitle(titles: Seq[String], day: java.time.DayOfWeek): Option[String] = {
    val prefixes = DayPrefixes.getOrElse(day, Seq.empty)
    titles.find(t => prefixes.exists(p => t.trim.toLowerCase.startsWith(p)))
      .orElse(titles.headOption)
  }
}

/** Minimal injectable HTTP GET (url, headers) -> (status, body) — the read
  * half of the transport ([[HttpPost]] is the write half). */
trait HttpGet {
  def get(url: String, headers: Map[String, String], timeout: Duration): (Int, String)
}

/** JDK HttpClient implementation (no extra dependencies). */
final class JdkHttpGet extends HttpGet {
  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()
  override def get(url: String, headers: Map[String, String],
                   timeout: Duration): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(url)).timeout(timeout).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }
}

/** Dependency-free recursive-descent JSON reader for the (small, flat-ish)
  * Sheets API responses: objects -> Map[String, Any], arrays -> Vector[Any],
  * strings -> String, numbers -> Double, true/false/null. Responses here
  * are driver-side config payloads (a sheet grid), never the data path. */
private[graft] object MiniJson {
  def parse(s: String): Any = {
    val p = new P(s); val v = p.value(); p.ws()
    require(p.eof, s"trailing JSON content at ${p.pos}")
    v
  }
  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c, s"expected '$c' at $pos"); pos += 1
    }
    def value(): Any = {
      ws()
      require(!eof, "unexpected end of JSON")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _   => num()
      }
    }
    private def lit(word: String, v: Any): Any = {
      require(s.regionMatches(pos, word, 0, word.length), s"bad literal at $pos")
      pos += word.length; v
    }
    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      val b = Map.newBuilder[String, Any]
      if (!eof && s.charAt(pos) == '}') { pos += 1; return b.result() }
      var more = true
      while (more) {
        ws(); val k = str(); ws(); expect(':')
        b += k -> value(); ws()
        if (!eof && s.charAt(pos) == ',') pos += 1 else more = false
      }
      expect('}'); b.result()
    }
    private def arr(): Vector[Any] = {
      expect('['); ws()
      val b = Vector.newBuilder[Any]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return b.result() }
      var more = true
      while (more) {
        b += value(); ws()
        if (!eof && s.charAt(pos) == ',') pos += 1 else more = false
      }
      expect(']'); b.result()
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case '"' => sb += '"'; case '\\' => sb += '\\'; case '/' => sb += '/'
            case 'b' => sb += '\b'; case 'f' => sb += '\f'; case 'n' => sb += '\n'
            case 'r' => sb += '\r'; case 't' => sb += '\t'
            case 'u' =>
              sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case other => throw new IllegalArgumentException(s"bad escape \\$other")
          }
        } else sb += c
        pos += 1
      }
      pos += 1
      sb.toString
    }
    private def num(): Double = {
      val start = pos
      while (!eof && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      s.substring(start, pos).toDouble
    }
  }
}

/** The live client. `tokenProvider` supplies the OAuth bearer (the
  * reference authenticates a service account; any () => String fits —
  * [[DeviceCodeTokenProvider]] or a static token). */
final class SheetsClient(spreadsheetId: String,
                         tokenProvider: () => String,
                         http: HttpGet = new JdkHttpGet,
                         httpPost: HttpPost = new JdkHttpPost,
                         base: String = "https://sheets.googleapis.com/v4/spreadsheets",
                         timeout: Duration = Duration.ofSeconds(30)) {

  private def auth = Map("Authorization" -> s"Bearer ${tokenProvider()}")

  private def getJson(url: String): Any = {
    val (st, body) = http.get(url, auth, timeout)
    if (st / 100 != 2)
      throw new RuntimeException(s"Sheets GET failed: HTTP $st — $body")
    MiniJson.parse(body)
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  /** Worksheet titles in tab order, HIDDEN TABS INCLUDED: gspread's
    * `sh.worksheets()` (the reference's weekday pick,
    * sheet_bot/sheets.py:42) does not filter on visibility, so a hidden
    * day-named tab must still win the today-pick. */
  def sheetTitles(): Seq[String] = {
    val j = getJson(s"$base/$spreadsheetId?fields=sheets.properties(title,index)")
    j.asInstanceOf[Map[String, Any]].getOrElse("sheets", Vector.empty)
      .asInstanceOf[Vector[Any]]
      .map(_.asInstanceOf[Map[String, Any]]("properties").asInstanceOf[Map[String, Any]])
      .map(_("title").asInstanceOf[String])
  }

  /** Whole-sheet string grid ('' for blanks): FORMATTED_VALUE renders each
    * cell the way the reference's get_all_values sees it. Ragged rows are
    * fine — [[Orchestrator.parseSections]] bounds-checks per cell. */
  def getAllValues(sheetTitle: String): Seq[Seq[String]] = {
    val j = getJson(s"$base/$spreadsheetId/values/${enc(s"'$sheetTitle'")}" +
      "?valueRenderOption=FORMATTED_VALUE&majorDimension=ROWS")
    j.asInstanceOf[Map[String, Any]].getOrElse("values", Vector.empty)
      .asInstanceOf[Vector[Any]]
      .map(_.asInstanceOf[Vector[Any]].map {
        case null => ""
        case s: String => s
        case other => other.toString
      })
  }

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** K9 — batched (A1, value) write-back: one values:batchUpdate POST, the
    * same wire shape gspread builds (sheets.py:186-189). No-op when empty. */
  def batchUpdate(sheetTitle: String, updates: Seq[(String, String)]): Unit = {
    if (updates.isEmpty) return
    val data = updates.map { case (a1, v) =>
      s"""{"range":${jstr(s"'$sheetTitle'!$a1")},"values":[[${jstr(v)}]]}"""
    }.mkString("[", ",", "]")
    val body = s"""{"valueInputOption":"USER_ENTERED","data":$data}"""
    val (st, resp) = httpPost.post(
      s"$base/$spreadsheetId/values:batchUpdate",
      auth + ("Content-Type" -> "application/json"), body, timeout)
    if (st / 100 != 2)
      throw new RuntimeException(s"Sheets batchUpdate failed: HTTP $st — $resp")
  }
}

/** [[StatusWriter]] over the live client — drop-in for the orchestrator's
  * claim/complete write-backs. */
final class RestStatusWriter(client: SheetsClient, sheetTitle: String)
    extends StatusWriter {
  override def batchUpdate(updates: Seq[(String, String)]): Unit =
    client.batchUpdate(sheetTitle, updates)
}
