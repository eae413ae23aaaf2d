package graft.tools

import graft.core.{EventData, EventLog}
import graft.storage.InMemoryBackend

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets

/** Scratch profiler for the HTTP serving path: separates client transport
  * cost from server cost by driving the same server with (a) the library
  * client and (b) a minimal raw keep-alive socket. */
object HttpProfile {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def payload(i: Int) =
      s"""{ "key1": $i, "key2": "value $i", "key3": true, "key4": null, "key5": [1, 2, 3, $i] }"""

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // floor
    val log1 = new EventLog(new InMemoryBackend(spark))
    timed("backend_append_1k")(
      (0 until 1000).foreach(i => log1.append(EventData("E", payload(i)))))
    log1.close()

    // library client
    val log2 = new EventLog(new InMemoryBackend(spark))
    val srv2 = new graft.api.HttpApiServer(log2, 0)
    val port2 = srv2.start()
    val c = new graft.client.EventLogClient(s"http://127.0.0.1:$port2")
    c.append(EventData("E", payload(0))) // warm
    timed("httpclient_append_1k")(
      (0 until 1000).foreach(i => c.append(EventData("E", payload(i)))))
    c.close(); srv2.stop(); log2.close()

    // raw socket keep-alive
    val log3 = new EventLog(new InMemoryBackend(spark))
    val srv3 = new graft.api.HttpApiServer(log3, 0)
    val port3 = srv3.start()
    val sock = new Socket("127.0.0.1", port3)
    sock.setTcpNoDelay(true)
    val out = new BufferedOutputStream(sock.getOutputStream)
    val in = new BufferedInputStream(sock.getInputStream)
    def rawAppend(i: Int): Unit = {
      val body = graft.api.MsgCodec.encode(Seq(EventData("E", payload(i))))
      val head = s"POST /log/ HTTP/1.1\r\nHost: x\r\nContent-Length: ${body.length}\r\n\r\n"
      out.write(head.getBytes(StandardCharsets.ISO_8859_1))
      out.write(body)
      out.flush()
      // read status line + headers + content-length body
      var clen = -1
      var line = new StringBuilder
      var headerDone = false
      while (!headerDone) {
        val ch = in.read()
        if (ch == '\n') {
          val l = line.toString.stripSuffix("\r")
          if (l.isEmpty) headerDone = true
          else if (l.toLowerCase.startsWith("content-length:"))
            clen = l.substring(15).trim.toInt
          line = new StringBuilder
        } else line.append(ch.toChar)
      }
      val buf = in.readNBytes(clen)
      require(buf.length == clen)
    }
    rawAppend(0) // warm
    timed("rawsocket_append_1k")((0 until 1000).foreach(rawAppend))
    sock.close(); srv3.stop(); log3.close()
    spark.stop()
  }
}
