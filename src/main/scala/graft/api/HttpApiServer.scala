package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.core.{Errors, EventLog}
import graft.exprs.EventOps
import org.apache.spark.unsafe.types.UTF8String

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import scala.util.Using

/** HTTP façade ≙ reference api/fasthttp (serve.go:31-93 routing; README.md
  * HTTP API): same routes, JSON shapes, shortest-hex versions, RFC3339
  * times, and error-string contract (internal/internal.go:7-14). Built on
  * the JDK's HttpServer — the engine itself stays the Spark library.
  *
  * Divergence: `GET /subscription` is WebSocket in the reference; the JDK
  * server has no WS, so subscriptions here are long-polls against the
  * in-process [[graft.streaming.VersionHub]] (`GET /subscription/poll`),
  * preserving the at-most-once watermark contract.
  */
final class HttpApiServer(
    log: EventLog,
    port: Int = 0,
    maxReadBatchSize: Int = 1000) {

  private val rfc3339 = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ssXXX")
    .withZone(ZoneOffset.UTC)
  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  // the default executor dispatches on a single thread — a long-poll would
  // block every other request (incl. the append that should resolve it)
  server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool { r =>
    val t = new Thread(r, "graft-http")
    t.setDaemon(true)
    t
  })
  server.createContext("/", (ex: HttpExchange) => route(ex))

  def start(): Int = {
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)

  private def hex(v: Long): String = EventOps.hexEncode(v).toString
  private def time(ts: Long): String = rfc3339.format(Instant.ofEpochSecond(ts))

  private def respond(ex: HttpExchange, code: Int, body: String,
      contentType: String = "application/json"): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
    Using.resource(ex.getResponseBody)(_.write(b))
  }

  private def bad(ex: HttpExchange, msg: String): Unit =
    respond(ex, 400, msg, "text/plain")

  private def route(ex: HttpExchange): Unit =
    try {
      val path = ex.getRequestURI.getPath
      val method = ex.getRequestMethod
      (method, path) match {
        case ("GET", "/version") =>
          respond(ex, 200, s"""{"version":"${hex(log.version)}"}""")
        case ("GET", "/version/initial") =>
          respond(ex, 200, s"""{"version-initial":"${hex(log.versionInitial)}"}""")
        case ("GET", "/meta") =>
          val fields = log.metadata.toSeq.sortBy(_._1)
            .map { case (k, v) => s"${jsonStr(k)}:${jsonStr(v)}" }
          respond(ex, 200, fields.mkString("{", ",", "}"))
        case ("GET", "/subscription/poll") =>
          // long-poll stand-in for the reference's WS push: block up to 30s
          // for the next watermark; 204 on timeout. At-most-once, consumers
          // re-scan from their cursor — same contract as broadcast.go:24-28.
          val sub = log.subscribe()
          try sub.poll(30000) match {
            case Some(v) => respond(ex, 200, s"""{"version":"${hex(v)}"}""")
            case None => respond(ex, 204, "")
          } finally sub.close()
        case ("POST", p) if p.startsWith("/log/") => handleAppend(ex, p)
        case ("GET", p) if p.startsWith("/log/") => handleScan(ex, p)
        case _ => respond(ex, 404, "", "text/plain")
      }
    } catch {
      case t: Throwable =>
        try respond(ex, 500, "internal error", "text/plain")
        catch { case _: Throwable => () }
    } finally ex.close()

  private def handleAppend(ex: HttpExchange, path: String): Unit = {
    val versionPart = path.stripPrefix("/log/")
    val assumed: Option[Long] =
      if (versionPart.isEmpty) None
      else EventOps.hexDecode(UTF8String.fromString(versionPart)) match {
        // the reference's append path reports malformed hex as
        // ErrInvalidVersion (serve.go:96-101); ErrMalformedVersion is the
        // GET scan path's string only
        case null => return bad(ex, "ErrInvalidVersion")
        case v => Some(v.longValue())
      }
    val body = ex.getRequestBody.readAllBytes()
    val events =
      try MsgCodec.decode(body)
      catch {
        case _: MsgCodec.MalformedMessageException =>
          return bad(ex, "ErrInvalidPayload")
      }
    try {
      val r = assumed match {
        case None if events.length == 1 => log.append(events.head)
        case None => log.appendMulti(events)
        case Some(a) if events.length == 1 => log.appendCheck(a, events.head)
        case Some(a) => log.appendCheckMulti(a, events)
      }
      val first = // "version-first" only for multi (README.md:43)
        if (events.length > 1) s""","version-first":"${hex(r.versionFirst)}""""
        else ""
      respond(ex, 200,
        s"""{"version":"${hex(r.version)}","version-previous":"${hex(r.versionPrevious)}"$first,"time":"${time(r.timestamp)}"}""")
    } catch {
      case _: Errors.ErrInvalidPayload => bad(ex, "ErrInvalidPayload")
      case _: Errors.ErrLabelContainsIllegalChars => bad(ex, "ErrInvalidPayload")
      case _: Errors.ErrLabelTooLong => bad(ex, "ErrInvalidPayload")
      case _: Errors.ErrMismatchingVersions => bad(ex, "ErrMismatchingVersions")
      case _: Errors.ErrPayloadSizeLimitExceeded =>
        bad(ex, "ErrPayloadSizeLimitExceeded")
    }
  }

  private def handleScan(ex: HttpExchange, path: String): Unit = {
    val version = EventOps.hexDecode(
      UTF8String.fromString(path.stripPrefix("/log/"))) match {
      case null => return bad(ex, "ErrMalformedVersion")
      case v => v.longValue()
    }
    val query = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    val params = query.split("&").filter(_.nonEmpty)
      .map(kv => kv.split("=", 2) match {
        case Array(k) => k -> ""
        case Array(k, v) => k -> v
      }).toMap
    val n = params.get("n") match {
      case Some(s) =>
        // negative n clamps like n=0 (deliberate hardening: the reference's
        // signed Atoi lets a negative n disable the batch cap entirely)
        try math.max(0, s.toInt) catch { case _: NumberFormatException =>
          return bad(ex, "ErrBadArgument") }
      case None => 0
    }
    val limit = HttpApiServer.adjustBatchSize(n, maxReadBatchSize)
    val reverse = params.contains("reverse")
    val skipFirst = params.contains("skip_first")
    try {
      // stream rows straight into a chunked response (no driver-side
      // materialization of the batch — the reference's streaming
      // serialization, serve.go:215-269). The scan itself must run before
      // headers are committed so ErrInvalidVersion can still map to a 400.
      val it = log.scan(version, reverse,
        if (limit > 0) Some(limit) else None, skipFirst)
        .select("version", "version_previous", "version_next",
          "timestamp", "label", "payload")
        .toLocalIterator()
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, 0) // length 0 = chunked
      Using.resource(ex.getResponseBody) { out =>
        out.write('[')
        var first = true
        while (it.hasNext) {
          val r = it.next()
          if (!first) out.write(',')
          first = false
          // jsonStr is a no-op for ingest-validated labels (their charset
          // has no quotes/backslashes) but keeps the response well-formed
          // if the log dir was written or damaged by other tooling
          out.write(
            s"""{"time":"${time(r.getLong(3))}","version":"${hex(r.getLong(0))}","version-previous":"${hex(r.getLong(1))}","version-next":"${hex(r.getLong(2))}","label":${jsonStr(r.getString(4))},"payload":${r.getString(5)}}"""
              .getBytes(StandardCharsets.UTF_8))
        }
        out.write(']')
      }
    } catch {
      case _: Errors.ErrInvalidVersion => bad(ex, "ErrInvalidVersion")
    }
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}

object HttpApiServer {
  /** ≙ reference AdjustBatchSize (serve.go:473-483). */
  def adjustBatchSize(requested: Int, limit: Int): Int =
    if (limit == 0) requested
    else if (requested == 0 || requested > limit) limit
    else requested
}
