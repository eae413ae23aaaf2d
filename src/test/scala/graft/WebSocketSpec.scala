package graft

import graft.api.HttpApiServer
import graft.core.{EventData, EventLog}
import graft.storage.InMemoryBackend
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}

/** RFC6455 subscription parity ≙ reference api/fasthttp/serve.go:381-463 +
  * client/http.go:507-585: upgrade on `GET /subscription`, binary frames
  * carrying shortest-hex versions on append, server pings on the interval,
  * at-most-once delivery (capacity-1 mailbox, drops under lag). The JDK's
  * java.net.http.WebSocket is the independent client side.
  */
class WebSocketSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = SparkFixture.spark
  private var log: EventLog = _
  private var server: HttpApiServer = _
  private var wsUri: URI = _
  private val http = HttpClient.newHttpClient()

  override def beforeAll(): Unit = {
    log = new EventLog(new InMemoryBackend(spark, Map.empty))
    server = new HttpApiServer(log, wsPingIntervalMs = 250)
    wsUri = URI.create(s"ws://127.0.0.1:${server.start()}/subscription")
  }

  override def afterAll(): Unit = {
    server.stop()
    log.close()
  }

  private final class Collector extends WebSocket.Listener {
    val frames = new ConcurrentLinkedQueue[String]()
    val pings = new CountDownLatch(1)
    val msgLatch = new CountDownLatch(1)
    override def onOpen(ws: WebSocket): Unit = ws.request(1)
    override def onBinary(ws: WebSocket, data: ByteBuffer, last: Boolean)
        : java.util.concurrent.CompletionStage[_] = {
      val b = new Array[Byte](data.remaining())
      data.get(b)
      frames.add(new String(b, StandardCharsets.US_ASCII))
      msgLatch.countDown()
      ws.request(1)
      null
    }
    override def onPing(ws: WebSocket, msg: ByteBuffer)
        : java.util.concurrent.CompletionStage[_] = {
      pings.countDown()
      ws.sendPong(msg)
      ws.request(1)
      null
    }
    val closeLatch = new CountDownLatch(1)
    @volatile var closeCode = -1
    override def onClose(ws: WebSocket, statusCode: Int, reason: String)
        : java.util.concurrent.CompletionStage[_] = {
      closeCode = statusCode
      closeLatch.countDown()
      null
    }
  }

  private def connect(c: Collector): WebSocket =
    http.newWebSocketBuilder().buildAsync(wsUri, c).join()

  test("upgrade + binary shortest-hex version frame on append") {
    val c = new Collector
    val ws = connect(c)
    try {
      val r = log.append(EventData("ws_evt", """{"n":1}"""))
      assert(c.msgLatch.await(5, TimeUnit.SECONDS), "no frame within 5s")
      assert(c.frames.peek() == java.lang.Long.toHexString(r.version))
    } finally ws.abort()
  }

  test("server pings on the configured interval") {
    val c = new Collector
    val ws = connect(c)
    try assert(c.pings.await(5, TimeUnit.SECONDS), "no ping within 5s")
    finally ws.abort()
  }

  test("at-most-once under lag: intermediates may drop, feed converges") {
    val c = new Collector
    val ws = connect(c)
    try {
      // burst faster than the capacity-1 mailbox drains — versions
      // (including the newest: drop-newest like Go's select/default) may be
      // dropped by contract. The guarantee is convergence: once the burst
      // quiesces, a fresh append's watermark reaches the subscriber.
      (0 until 50).foreach { i =>
        log.append(EventData("burst", s"""{"i":$i}"""))
      }
      var converged = false
      var attempts = 0
      while (!converged && attempts < 10) {
        val want = java.lang.Long.toHexString(
          log.append(EventData("probe", s"""{"a":$attempts}""")).version)
        val deadline = System.nanoTime() + 1000000000L
        while (!converged && System.nanoTime() < deadline) {
          converged = c.frames.contains(want)
          if (!converged) Thread.sleep(20)
        }
        attempts += 1
      }
      assert(converged, "feed never converged to a fresh watermark")
      assert(c.frames.size() <= 61)
    } finally ws.abort()
  }

  test("client close frame tears down the subscription") {
    val c = new Collector
    val ws = connect(c)
    ws.sendClose(WebSocket.NORMAL_CLOSURE, "").join()
    // clean close handshake: the server echoes the close (same 1000 status)
    // before dropping the TCP connection — the JDK client surfaces the echo
    // as onClose
    assert(c.closeLatch.await(5, TimeUnit.SECONDS),
      "no close echo from the server")
    assert(c.closeCode == WebSocket.NORMAL_CLOSURE, s"echoed ${c.closeCode}")
    // server must unsubscribe: subsequent appends go to zero subscribers
    val deadline = System.nanoTime() + 5000000000L
    while (log.subscriberCount > 0 && System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(log.subscriberCount == 0, "subscription leaked after client close")
  }

  test("plain GET /subscription without upgrade headers is a 400") {
    val r = http.send(
      java.net.http.HttpRequest.newBuilder(
        URI.create(s"http${wsUri.toString.stripPrefix("ws")}")).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 400)
  }
}
