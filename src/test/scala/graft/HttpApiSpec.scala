package graft

import graft.api.{HttpApiServer, MsgCodec}
import graft.core.{EventData, EventLog}
import graft.storage.InMemoryBackend
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers

/** Black-box HTTP API tests ≙ reference api/fasthttp/fasthttp_test.go:
  * routes, JSON shapes, hex versions, error-string contract, batch clamp. */
class HttpApiSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkFixture.spark
  private var log: EventLog = _
  private var server: HttpApiServer = _
  private var base: String = _
  private val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = {
    log = new EventLog(new InMemoryBackend(spark, Map("name" -> "api-test")))
    server = new HttpApiServer(log, maxReadBatchSize = 3)
    base = s"http://127.0.0.1:${server.start()}"
  }

  override def afterAll(): Unit = {
    server.stop()
    log.close()
  }

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      BodyHandlers.ofString())

  private def post(path: String, body: Array[Byte]): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .POST(BodyPublishers.ofByteArray(body)).build(), BodyHandlers.ofString())

  private def head(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .method("HEAD", BodyPublishers.noBody()).build(), BodyHandlers.ofString())

  test("append single → version/version-previous/time document") {
    val r = post("/log/", MsgCodec.encode(Seq(EventData("first", """{"x":1}"""))))
    assert(r.statusCode() == 200)
    assert(r.body().startsWith("""{"version":"1","version-previous":"0""""))
    assert(!r.body().contains("version-first"))
    assert(r.body().matches(""".*"time":"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z"}"""))
  }

  test("append multi → adds version-first") {
    val r = post("/log/", MsgCodec.encode(Seq(
      EventData("a", """{"x":2}"""), EventData("b", """{"x":3}"""))))
    assert(r.statusCode() == 200)
    assert(r.body().contains(""""version":"3""""))
    assert(r.body().contains(""""version-first":"2""""))
  }

  test("OCC append: stale version → 400 ErrMismatchingVersions") {
    val stale = post("/log/1", MsgCodec.encode(Seq(EventData("x", """{"y":1}"""))))
    assert(stale.statusCode() == 400 && stale.body() == "ErrMismatchingVersions")
    val cur = get("/version").body() // {"version":"3"}
    val v = cur.split("\"")(3)
    val ok = post(s"/log/$v", MsgCodec.encode(Seq(EventData("x", """{"y":1}"""))))
    assert(ok.statusCode() == 200)
  }

  test("version endpoints render shortest hex") {
    assert(get("/version").body() == """{"version":"4"}""")
    assert(get("/version/initial").body() == """{"version-initial":"1"}""")
  }

  test("meta returns the metadata document") {
    assert(get("/meta").body() == """{"name":"api-test"}""")
  }

  test("scan forward with n clamp, skip_first and reverse") {
    // maxReadBatchSize=3 clamps n=0 and n>3
    def events(body: String): Int = "\"time\":".r.findAllIn(body).length
    val all = get("/log/1")
    assert(all.statusCode() == 200)
    assert(events(all.body()) == 3) // clamped to 3
    val two = get("/log/1?n=2")
    assert(events(two.body()) == 2)
    assert(two.body().contains(""""version":"1"""") &&
      two.body().contains(""""version":"2""""))
    val skip = get("/log/1?n=2&skip_first")
    assert(skip.body().contains(""""version":"2"""") &&
      skip.body().contains(""""version":"3""""))
    val rev = get("/log/2?reverse&n=2")
    assert(rev.body().indexOf(""""version":"2"""") <
      rev.body().indexOf(""""version":"1""""))
  }

  test("scan returns raw JSON payloads and hex chain links") {
    val r = get("/log/1?n=1")
    assert(r.body().contains(""""payload":{"x":1}"""))
    assert(r.body().contains(""""version-next":"2""""))
    assert(r.body().contains(""""version-previous":"0""""))
  }

  test("error contract: malformed version, bad argument, invalid version, invalid payload") {
    assert(get("/log/zz").body() == "ErrMalformedVersion")
    assert(get("/log/zz").statusCode() == 400)
    assert(get("/log/1?n=abc").body() == "ErrBadArgument")
    assert(get("/log/ffff").body() == "ErrInvalidVersion")
    assert(post("/log/", Array[Byte](1, 2)).body() == "ErrInvalidPayload")
    assert(post("/log/", MsgCodec.encode(Seq(EventData("x", "{}")))).body()
      == "ErrInvalidPayload")
  }

  test("adjustBatchSize table (serve.go:473-483)") {
    val cases = Seq( // (requested, limit, expected)
      (0, 0, 0), (5, 0, 5), (0, 3, 3), (5, 3, 3), (2, 3, 2), (3, 3, 3))
    cases.foreach { case (req, lim, exp) =>
      assert(HttpApiServer.adjustBatchSize(req, lim) == exp, s"($req,$lim)")
    }
  }

  test("large payload round-trips through append + scan intact") {
    val big = (0 until 5000).map(i => s""""k$i": [$i, "v $i"]""")
      .mkString("{ ", " , ", " }") // ~90 KiB, whitespace-padded
    val r = post("/log/", MsgCodec.encode(Seq(EventData("big", big))))
    assert(r.statusCode() == 200)
    val v = r.body().split("\"")(3)
    val scanned = get(s"/log/$v?n=1").body()
    // payload comes back minified but value-identical
    assert(scanned.contains(""""k4999":[4999,"v 4999"]"""))
    assert(!scanned.contains("{ "))
  }

  test("oversized request lines are dropped, not allocated for") {
    val port = base.split(":").last.toInt
    val sock = new java.net.Socket("127.0.0.1", port)
    try {
      val out = sock.getOutputStream
      out.write("GET /".getBytes)
      val junk = ("x" * 8192).getBytes
      // server must cut the connection once the line passes its cap
      intercept[java.io.IOException] {
        var i = 0
        while (i < 1000) { out.write(junk); out.flush(); i += 1 }
        // if the write path never failed, the read side must see EOF
        sock.setSoTimeout(5000)
        if (sock.getInputStream.read() == -1) throw new java.io.EOFException
      }
    } finally sock.close()
    // and the server still serves normal requests afterwards
    assert(get("/version").statusCode() == 200)
  }

  test("Expect: 100-continue gets the interim response before the body") {
    val port = base.split(":").last.toInt
    val sock = new java.net.Socket("127.0.0.1", port)
    try {
      sock.setSoTimeout(5000)
      val out = sock.getOutputStream
      val body = MsgCodec.encode(Seq(EventData("cont", """{"c":1}""")))
      out.write((s"POST /log/ HTTP/1.1\r\nHost: x\r\nExpect: 100-continue\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes)
      out.flush()
      val in = sock.getInputStream
      def readFully(want: Int): String = {
        val buf = new Array[Byte](want)
        var read = 0
        var n = 0
        while (read < want && n >= 0) { // EOF must fail, not spin
          n = in.read(buf, read, want - read)
          if (n > 0) read += n
        }
        assert(read == want, s"connection closed after $read/$want bytes")
        new String(buf)
      }
      // "HTTP/1.1 100 Continue\r\n\r\n"
      assert(readFully(25).startsWith("HTTP/1.1 100 Continue"))
      out.write(body)
      out.flush()
      assert(readFully(17).startsWith("HTTP/1.1 200"))
    } finally sock.close()
  }

  test("HEAD mirrors GET status + headers with no body on every route") {
    post("/log/", MsgCodec.encode(Seq(EventData("hd", """{"h":1}"""))))
    // document routes: same status, same Content-Length GET would send
    for (p <- Seq("/version", "/version/initial", "/meta")) {
      val (g, h) = (get(p), head(p))
      assert(h.statusCode() == 200, p)
      assert(h.body().isEmpty, p)
      assert(h.headers().firstValue("Content-Length").map(_.toInt).orElse(-1)
        == g.body().getBytes("UTF-8").length, p)
    }
    // scan route: 200 + chunked headers, still no body
    val hs = head("/log/1")
    assert(hs.statusCode() == 200 && hs.body().isEmpty)
    // error contract carries over (no body either)
    assert(head("/log/zz").statusCode() == 400)
    assert(head("/log/zz").body().isEmpty)
    assert(head("/nope").statusCode() == 404)
    // and the connection stays usable for a normal request afterwards
    // (a body leaked on a HEAD response would desync keep-alive framing)
    assert(get("/version").statusCode() == 200)
  }

  test("msgcodec round-trips multi-event frames") {
    val evs = Seq(
      EventData("", """{"empty_label":true}"""),
      EventData("label_2", """{"ключ":"значение"}"""))
    assert(MsgCodec.decode(MsgCodec.encode(evs)) == evs)
    intercept[MsgCodec.MalformedMessageException](MsgCodec.decode(Array.empty))
    intercept[MsgCodec.MalformedMessageException](
      MsgCodec.decode(Array[Byte](9, 0, 9, 0, 0, 0, 1)))
    // hostile payloadLen near Int.MaxValue must not trigger an allocation
    intercept[MsgCodec.MalformedMessageException](
      MsgCodec.decode(Array[Byte](1, 0, -1, -1, -1, 0x7f, 'x')))
  }
}
