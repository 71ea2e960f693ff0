package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64

/** K7 — the e-mail sink. The reference sends through Microsoft Graph with
  * an MSAL device-code flow, base64 file attachments, a 30 s timeout and
  * recipient validation (ref /root/reference/sheet_bot/email_sender.py:30-175).
  *
  * The engine keeps the transport INJECTABLE: orchestration code depends
  * only on [[EmailSender]]; [[GraphEmailSender]] is the production
  * implementation against the public Graph REST API, with the HTTP layer
  * and token acquisition abstracted so tests (and credential-less
  * environments) run against fakes. No secrets live in code — the caller
  * injects client/tenant ids and the token cache location. */
final case class EmailMessage(to: Seq[String], cc: Seq[String],
                              subject: String, htmlBody: String,
                              attachments: Seq[(String, Array[Byte])])

trait EmailSender {
  def send(msg: EmailMessage): Unit
}

/** Test/offline fake: records what would have been sent. */
final class InMemoryEmailSender extends EmailSender {
  val sent = scala.collection.mutable.ArrayBuffer.empty[EmailMessage]
  override def send(msg: EmailMessage): Unit = sent.synchronized { sent += msg }
}

/** Minimal injectable HTTP POST (url, headers, body) -> (status, body). */
trait HttpPost {
  def post(url: String, headers: Map[String, String], body: String,
           timeout: Duration): (Int, String)
}

/** JDK HttpClient implementation (no extra dependencies). */
final class JdkHttpPost extends HttpPost {
  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()
  override def post(url: String, headers: Map[String, String], body: String,
                    timeout: Duration): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(url)).timeout(timeout)
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }
}

object GraphEmail {

  /** Strict-enough recipient validation, mirroring the reference's check
    * before a send is attempted. */
  def validRecipient(addr: String): Boolean =
    Recipients.EmailRe.pattern.matcher(addr).matches()

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** The Graph /me/sendMail JSON payload (public API shape):
    * message{subject, body{contentType:HTML}, toRecipients, ccRecipients,
    * attachments[@odata.type fileAttachment, base64 contentBytes]}. */
  def sendMailJson(msg: EmailMessage): String = {
    def recips(rs: Seq[String]) = rs.map(r =>
      s"""{"emailAddress":{"address":${jstr(r)}}}""").mkString("[", ",", "]")
    val atts = msg.attachments.map { case (name, bytes) =>
      s"""{"@odata.type":"#microsoft.graph.fileAttachment","name":${jstr(name)},""" +
        s""""contentBytes":${jstr(Base64.getEncoder.encodeToString(bytes))}}"""
    }.mkString("[", ",", "]")
    s"""{"message":{"subject":${jstr(msg.subject)},""" +
      s""""body":{"contentType":"HTML","content":${jstr(msg.htmlBody)}},""" +
      s""""toRecipients":${recips(msg.to)},"ccRecipients":${recips(msg.cc)},""" +
      s""""attachments":$atts},"saveToSentItems":"true"}"""
  }
}

/** Production sender: POST /me/sendMail with a bearer token, 30 s timeout
  * (the reference's), recipients validated up front. `tokenProvider` is
  * any () => String — [[DeviceCodeTokenProvider]] or a static token. */
final class GraphEmailSender(tokenProvider: () => String,
                             http: HttpPost = new JdkHttpPost,
                             endpoint: String = "https://graph.microsoft.com/v1.0/me/sendMail",
                             timeout: Duration = Duration.ofSeconds(30))
    extends EmailSender {
  override def send(msg: EmailMessage): Unit = {
    val bad = (msg.to ++ msg.cc).filterNot(GraphEmail.validRecipient)
    require(bad.isEmpty, s"invalid recipient(s): ${bad.mkString(", ")}")
    require(msg.to.nonEmpty, "no recipients")
    val (status, body) = http.post(endpoint,
      Map("Authorization" -> s"Bearer ${tokenProvider()}",
        "Content-Type" -> "application/json"),
      GraphEmail.sendMailJson(msg), timeout)
    if (status / 100 != 2)
      throw new RuntimeException(s"Graph sendMail failed: HTTP $status — $body")
  }
}

/** OAuth2 device-code flow against the public Microsoft identity platform
  * (login.microsoftonline.com), with a file token cache — the same flow
  * the reference drives through MSAL. `onUserCode` surfaces the
  * "go to ... and enter code ..." message. */
final class DeviceCodeTokenProvider(clientId: String, tenant: String,
                                    scope: String = "https://graph.microsoft.com/.default",
                                    cachePath: java.nio.file.Path,
                                    http: HttpPost = new JdkHttpPost,
                                    onUserCode: String => Unit = msg => System.err.println(msg),
                                    sleepMs: Long => Unit = Thread.sleep,
                                    nowMs: () => Long = System.currentTimeMillis)
    extends (() => String) {

  private def form(kv: (String, String)*): String =
    kv.map { case (k, v) =>
      k + "=" + java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")

  // Narrow, dependency-free JSON field extraction: the token endpoints
  // return flat objects with string/number fields.
  private def strField(json: String, name: String): Option[String] =
    ("\"" + java.util.regex.Pattern.quote(name) + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      .findFirstMatchIn(json).map(_.group(1)
        .replace("\\/", "/").replace("\\\\", "\\").replace("\\\"", "\""))
  private def numField(json: String, name: String): Option[Long] =
    ("\"" + java.util.regex.Pattern.quote(name) + "\"\\s*:\\s*(\\d+)").r
      .findFirstMatchIn(json).map(_.group(1).toLong)

  private final case class Cached(token: String, expiresAtMs: Long)
  private def readCache(): Option[Cached] =
    if (!java.nio.file.Files.exists(cachePath)) None
    else {
      val s = new String(java.nio.file.Files.readAllBytes(cachePath), StandardCharsets.UTF_8)
      for (t <- strField(s, "access_token"); e <- numField(s, "expires_at_ms"))
        yield Cached(t, e)
    }
  private def writeCache(c: Cached): Unit = {
    // The cache holds a live bearer token — owner-only (0600) before any
    // bytes land, never the default umask (typically world-readable 0644).
    val perms = java.nio.file.attribute.PosixFilePermissions.fromString("rw-------")
    try {
      if (!java.nio.file.Files.exists(cachePath))
        java.nio.file.Files.createFile(cachePath,
          java.nio.file.attribute.PosixFilePermissions.asFileAttribute(perms))
      else java.nio.file.Files.setPosixFilePermissions(cachePath, perms)
    } catch { case _: UnsupportedOperationException => () } // non-POSIX FS
    java.nio.file.Files.write(cachePath,
      s"""{"access_token":"${c.token}","expires_at_ms":${c.expiresAtMs}}"""
        .getBytes(StandardCharsets.UTF_8))
  }

  override def apply(): String = {
    readCache().filter(_.expiresAtMs - 60000 > nowMs()) match {
      case Some(c) => c.token
      case None =>
        val base = s"https://login.microsoftonline.com/$tenant/oauth2/v2.0"
        val (_, dc) = http.post(s"$base/devicecode",
          Map("Content-Type" -> "application/x-www-form-urlencoded"),
          form("client_id" -> clientId, "scope" -> scope),
          Duration.ofSeconds(30))
        val deviceCode = strField(dc, "device_code").getOrElse(
          throw new RuntimeException(s"devicecode response missing device_code: $dc"))
        strField(dc, "message").foreach(onUserCode)
        var interval = numField(dc, "interval").getOrElse(5L) * 1000
        val deadline = nowMs() + numField(dc, "expires_in").getOrElse(900L) * 1000
        var token: Option[Cached] = None
        while (token.isEmpty && nowMs() < deadline) {
          sleepMs(interval)
          val (st, tr) = http.post(s"$base/token",
            Map("Content-Type" -> "application/x-www-form-urlencoded"),
            form("grant_type" -> "urn:ietf:params:oauth:grant-type:device_code",
              "client_id" -> clientId, "device_code" -> deviceCode),
            Duration.ofSeconds(30))
          if (st / 100 == 2)
            token = for (t <- strField(tr, "access_token"))
              yield Cached(t, nowMs() + numField(tr, "expires_in").getOrElse(3600L) * 1000)
          else strField(tr, "error") match {
            case Some("authorization_pending") => () // user hasn't approved yet
            case Some("slow_down") => interval += 5000 // RFC 8628 §3.5: keep
              // polling at interval+5s — Microsoft's endpoint does emit this
            case _ =>
              throw new RuntimeException(s"device-code token exchange failed: $tr")
          }
        }
        val c = token.getOrElse(throw new RuntimeException("device-code flow timed out"))
        writeCache(c)
        c.token
    }
  }
}
