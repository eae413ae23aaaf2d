package graft

import graft.core.{EventData, EventLog}
import graft.sources.NativeLog
import graft.storage.InMemoryBackend
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import java.io.{FileOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

/** The reference's native binary file format, decoded: golden files are
  * composed here byte-for-byte from the documented layout (SURVEY.md §1.4;
  * write_event.go:58-101, write_file_header.go:36-61) with checksums from
  * the SHARED EventOps.checksum — so a real file written by the Go
  * implementation decodes identically.
  */
class NativeLogSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def cks(ts: Long, label: String, payload: String, prev: Long): Long =
    graft.exprs.EventOps.checksum(ts,
      UTF8String.fromString(label), UTF8String.fromString(payload), prev)

  private def entry(ts: Long, label: String, payload: String, prev: Long)
      : Array[Byte] = {
    val lb = label.getBytes("UTF-8")
    val pb = payload.getBytes("UTF-8")
    val buf = ByteBuffer.allocate(8 + 8 + 2 + 4 + lb.length + pb.length + 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(cks(ts, label, payload, prev))
    buf.putLong(ts)
    buf.putShort(lb.length.toShort)
    buf.putInt(pb.length)
    buf.put(lb)
    buf.put(pb)
    buf.putLong(prev)
    buf.array()
  }

  /** proto header + metadata pseudo-event + the given events, chained by
    * byte-offset versions exactly like file.go:330. */
  private def writeNative(
      meta: String, events: Seq[(Long, String, String)]): String = {
    val f = Files.createTempFile("graft-native", ".eventlog").toString
    val out = new FileOutputStream(f)
    try {
      val proto = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(5).array()
      out.write(proto)
      var offset = 4L
      val header = entry(1700000000L, "", meta, 0L)
      out.write(header)
      var prev = 0L // first real event's versionPrevious is 0 (sentinel)
      offset += header.length
      events.foreach { case (ts, label, payload) =>
        val e = entry(ts, label, payload, prev)
        out.write(e)
        prev = offset // this entry's version = its byte offset
        offset += e.length
      }
      f
    } finally out.close()
  }

  private val sample = Seq(
    (1700000001L, "user_created", """{"id":42}"""),
    (1700000002L, "order_placed", """{"id":42,"sku":"a"}"""),
    (1700000003L, "order_paid", """{"id":42}"""))

  test("decodes a golden native file: versions, chain, payloads, meta") {
    val f = writeNative("""{"app":"orders","env":"prod"}""", sample)
    assert(NativeLog.readMeta(f) === Map("app" -> "orders", "env" -> "prod"))
    val rows = NativeLog.read(spark, Seq(f)).orderBy("version").collect()
    assert(rows.length === 3)
    // versions are byte offsets; each entry's version_previous points to
    // the prior entry's offset (0 for the first)
    assert(rows.map(_.getLong(1)).toSeq ===
      Seq(0L, rows(0).getLong(0), rows(1).getLong(0)))
    assert(rows.map(_.getString(3)).toSeq === sample.map(_._2))
    assert(rows.map(_.getString(4)).toSeq === sample.map(_._3))
    assert(rows.map(_.getLong(2)).toSeq === sample.map(_._1))
  }

  test("a flipped payload byte surfaces as ErrInvalidVersion") {
    val f = writeNative("""{"a":"b"}""", sample)
    val raf = new RandomAccessFile(f, "rw")
    try {
      raf.seek(raf.length() - 12) // inside the last entry's payload
      val b = raf.read()
      raf.seek(raf.length() - 12)
      raf.write(b ^ 0x01)
    } finally raf.close()
    intercept[graft.core.Errors.ErrInvalidVersion] {
      NativeLog.decodeFile(f)
    }
  }

  test("a spliced entry with a valid checksum still fails the chain check") {
    // entry checksums are self-consistent, but the second event's
    // versionPrevious points at an offset from a DIFFERENT file layout —
    // per-entry verification alone cannot catch this; the chain rule must
    val f = Files.createTempFile("graft-splice", ".eventlog").toString
    val out = new FileOutputStream(f)
    try {
      out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(5).array())
      val header = entry(1700000000L, "", """{"a":"b"}""", 0L)
      out.write(header)
      out.write(entry(1700000001L, "ok", """{"i":1}""", 0L))
      // verPrev = 9999: checksum-valid for its own fields, chain-invalid
      out.write(entry(1700000002L, "spliced", """{"i":2}""", 9999L))
    } finally out.close()
    val ex = intercept[IllegalStateException](NativeLog.decodeFile(f))
    assert(ex.getMessage.contains("broken version chain"))
  }

  test("export escapes metadata that would break naive JSON concatenation") {
    val log = new EventLog(new InMemoryBackend(spark))
    try {
      log.append(EventData("e", """{"a":1}"""))
      val f = Files.createTempFile("graft-exportmeta", ".eventlog").toString
      NativeLog.export(log, f, Map("desc" -> "say \"hi\"\\now"))
      assert(NativeLog.readMeta(f) === Map("desc" -> "say \"hi\"\\now"))
    } finally log.close()
  }

  test("export with empty metadata stays reference-openable (MinPayloadLen)") {
    // "{}" (2 bytes) would violate the reference's MinPayloadLen=7 read
    // gate (read_event.go:108) — the default arg must fill, not pass through
    val log = new EventLog(new InMemoryBackend(spark))
    try {
      log.append(EventData("e", """{"a":1}"""))
      val f = Files.createTempFile("graft-emptymeta", ".eventlog").toString
      assert(NativeLog.export(log, f) === 1L)
      val d = NativeLog.decodeFile(f) // reader enforces the same bound
      assert(d.meta === NativeLog.DefaultExportMeta)
      assert(d.events.map(e => (e._4, e._5)) === Seq(("e", """{"a":1}""")))
    } finally log.close()
  }

  test("export refuses payloads under the format's 7-byte read minimum") {
    // {"":1} is a valid non-empty JSON object the ENGINE accepts at
    // 6 bytes — but the file format's read gate (read_event.go:108)
    // would refuse the written file, so export must reject it up front
    val log = new EventLog(new InMemoryBackend(spark))
    try {
      log.append(EventData("e", """{"":1}"""))
      val f = Files.createTempFile("graft-shortpayload", ".eventlog").toString
      val ex = intercept[IllegalArgumentException](NativeLog.export(log, f))
      assert(ex.getMessage.contains("read minimum"))
    } finally log.close()
  }

  test("export refuses labels over the file format's 256-byte ceiling") {
    val log = new EventLog(new InMemoryBackend(spark))
    try {
      log.append(EventData("x" * 300, """{"a":1}""")) // engine allows ≤65535
      val f = Files.createTempFile("graft-longlabel", ".eventlog").toString
      val ex = intercept[IllegalArgumentException](NativeLog.export(log, f))
      assert(ex.getMessage.contains("256"))
    } finally log.close()
  }

  test("an entry with payload under MinPayloadLen is rejected as corrupt") {
    // the reference's reader refuses payloadLen < 7 (read_event.go:108);
    // the importer must not accept files the reference itself would refuse
    val f = writeNative("""{"a":"b"}""",
      Seq((1700000001L, "tiny", """{"i"""))) // 4-byte payload, valid checksum
    val ex = intercept[IllegalStateException](NativeLog.decodeFile(f))
    assert(ex.getMessage.contains("outside the format bounds"))
  }

  test("an entry with a label length over 256 is rejected as corrupt") {
    val f = writeNative("""{"a":"b"}""",
      Seq((1700000001L, "L" * 300, """{"i":1}""")))
    val ex = intercept[IllegalStateException](NativeLog.decodeFile(f))
    assert(ex.getMessage.contains("label length"))
  }

  test("export → decode round-trips the engine log bit-for-bit") {
    val log = new EventLog(new InMemoryBackend(spark, Map("env" -> "rt")))
    try {
      sample.foreach { case (_, l, p) => log.append(EventData(l, p)) }
      val f = Files.createTempFile("graft-export", ".eventlog").toString
      assert(NativeLog.export(log, f, log.metadata) === 3L)
      // the exported file is a VALID native log: decodes checksum-clean,
      // preserves metadata, labels, payloads, and chain structure
      val d = NativeLog.decodeFile(f)
      assert(d.meta === Map("env" -> "rt"))
      assert(d.events.map(e => (e._4, e._5)) === sample.map(e => (e._2, e._3)))
      assert(d.events.head._2 === 0L, "first event's previous is 0")
      assert(d.events.map(_._1).toSet.size === 3, "distinct offset versions")
      // and it imports back into a fresh engine log losslessly
      val back = new EventLog(new InMemoryBackend(spark))
      try {
        NativeLog.importInto(back, f)
        assert(back.scan(1L).select("label", "payload").collect().toSeq ===
          log.scan(1L).select("label", "payload").collect().toSeq)
      } finally back.close()
    } finally log.close()
  }

  test("cli import creates the target log carrying the native metadata") {
    val f = writeNative("""{"app":"legacy"}""", sample)
    val dir = Files.createTempDirectory("graft-import").toString + "/migrated"
    graft.cli.Main.main(Array("import", f, dir))
    val log = new EventLog(
      graft.storage.ParquetLogBackend.open(spark, dir))
    try {
      assert(log.version === 3L)
      assert(log.metadata === Map("app" -> "legacy"))
      assert(log.checkIntegrity().count() === 0L)
    } finally log.close()
  }

  test("importInto replays a native log through the commit sequencer") {
    val f = writeNative("""{"a":"b"}""", sample)
    val log = new EventLog(new InMemoryBackend(spark))
    try {
      assert(NativeLog.importInto(log, f) === 3L)
      assert(log.version === 3L)
      val got = log.scan(1L).orderBy("version")
        .select("label", "payload").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(got.toSeq === sample.map(e => (e._2, e._3)))
      assert(log.checkIntegrity().count() === 0L)
    } finally log.close()
  }
}
