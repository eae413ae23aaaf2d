package graft.sources

import graft.core.{EventData, EventLog, EventSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

import java.io.{BufferedInputStream, DataInputStream, EOFException, FileInputStream}
import scala.collection.mutable.ArrayBuffer

/** Reader for the REFERENCE's native binary log file format — the
  * migration path for an existing romshark/eventlog deployment: open the
  * `.eventlog` file it wrote, get the same DataFrame every other source
  * here produces, checksum-verified.
  *
  * On-disk layout (reference, proto version 5): `u32 LE protoVersion`,
  * then entries back to back, the FIRST being the metadata pseudo-event
  * (empty label, payload = metadata JSON —
  * write_file_header.go:36-61). Each entry
  * (write_event.go:58-101):
  *
  * {{{ checksum u64 | timestamp u64 | labelLen u16 | payloadLen u32
  *   | label | payload | versionPrevious u64 }}}
  *
  * all little-endian; an entry's VERSION is its byte offset in the file
  * (file.go:330), and the checksum is XXH64(seed 0) over everything after
  * itself (checksum.go:9-67) — the exact function
  * [[graft.exprs.EventOps.checksum]] already implements for the engine's
  * own integrity column, so both sides share one definition.
  *
  * Scale shape: the format is inherently sequential WITHIN a file
  * (variable-length records, no sync markers), so one file = one task —
  * matching the single-node reference that wrote it; parallelism comes
  * from reading many files at once. Each is decoded streaming (64 KiB
  * buffer), never materialized whole.
  */
object NativeLog {
  final val SupportedProtoVersion = 5L

  /** Decoded native log: events (with byte-offset versions, exactly as the
    * reference reports them) + the creation metadata. */
  final case class Decoded(
      meta: Map[String, String],
      events: Seq[(Long, Long, Long, String, String, Long)])

  /** Read one or more native log files as a DataFrame in [[EventSchema]]
    * (versions are the reference's byte offsets). Many files decode in
    * parallel, one task each. */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val rows = spark.sparkContext
      .parallelize(paths, math.max(paths.size, 1))
      .flatMap(p => decodeFile(p).events.map(Row.fromTuple))
    spark.createDataFrame(rows, EventSchema.schema)
  }

  /** Metadata of a native log (the header pseudo-event's JSON payload). */
  def readMeta(path: String): Map[String, String] = decodeFile(path).meta

  /** Migrate a native log into an engine log: events re-append through the
    * commit sequencer in order, preserving label/payload bytes; versions
    * and timestamps are REASSIGNED (the engine's dense versions replace
    * the reference's byte offsets — record the mapping downstream if you
    * need to translate old cursors). */
  def importInto(log: EventLog, path: String, batch: Int = 1000): Long = {
    var n = 0L
    decodeFile(path).events.grouped(batch).foreach { g =>
      log.appendMulti(g.map(e => EventData(e._4, e._5)))
      n += g.size
    }
    n
  }

  /** Export an engine log to the reference's native format — the inverse
    * migration (and the round-trip harness for both codecs): events stream
    * through `toLocalIterator` in version order and are re-chained on
    * BYTE-OFFSET versions (the native format's semantics) with checksums
    * recomputed for the new chain. Timestamps and label/payload bytes are
    * preserved. Sequential single-file write by format necessity — the
    * reference's own writer is too (write_event.go). */
  def export(
      log: EventLog, path: String, meta: Map[String, String] = Map.empty)
      : Long = {
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path), 64 * 1024)
    try {
      val metaJson =
        if (meta.isEmpty) "{}"
        else meta.map { case (k, v) => s""""${k}":"${v}"""" }
          .mkString("{", ",", "}")
      out.write(u32LE(SupportedProtoVersion))
      var offset = 4L
      val header = encodeEntry(
        System.currentTimeMillis() / 1000L, "", metaJson, 0L)
      out.write(header)
      offset += header.length
      var prev = 0L
      var n = 0L
      val it = log.toDF.orderBy("version")
        .select("timestamp", "label", "payload").toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        val e = encodeEntry(r.getLong(0), r.getString(1), r.getString(2), prev)
        out.write(e)
        prev = offset
        offset += e.length
        n += 1L
      }
      n
    } finally out.close()
  }

  private def encodeEntry(
      ts: Long, label: String, payload: String, prev: Long): Array[Byte] = {
    val lb = label.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val pb = payload.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val cks = graft.exprs.EventOps.checksum(ts,
      UTF8String.fromBytes(lb), UTF8String.fromBytes(pb), prev)
    val buf = java.nio.ByteBuffer
      .allocate(8 + 8 + 2 + 4 + lb.length + pb.length + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putLong(cks).putLong(ts)
      .putShort(lb.length.toShort).putInt(pb.length)
      .put(lb).put(pb).putLong(prev)
    buf.array()
  }

  private def u32LE(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(v.toInt).array()

  /** Decode + checksum-verify a whole file. Corruption surfaces as
    * `ErrInvalidVersion` with the failing byte offset, mirroring the
    * reference's scan behavior (read_event.go:135-139). */
  private[graft] def decodeFile(path: String): Decoded = {
    val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(path), 64 * 1024))
    try {
      val proto = readU32LE(in)
      require(proto == SupportedProtoVersion,
        s"unsupported proto version $proto (supported: $SupportedProtoVersion)")
      var offset = 4L
      var first = true
      var meta = Map.empty[String, String]
      val out = ArrayBuffer.empty[(Long, Long, Long, String, String, Long)]
      var prevVersion = 0L
      var done = false
      while (!done) {
        readEntry(in, offset) match {
          case None => done = true
          case Some((stored, ts, label, payload, verPrev, entryLen)) =>
            val computed = graft.exprs.EventOps.checksum(
              ts, UTF8String.fromString(label), UTF8String.fromString(payload),
              verPrev)
            if (computed != stored)
              throw new graft.core.Errors.ErrInvalidVersion()
            if (first) {
              // header pseudo-event: metadata JSON, not a log event
              meta = parseMeta(payload)
              first = false
            } else {
              out += ((offset, verPrev, ts, label, payload, stored))
              prevVersion = offset
            }
            offset += entryLen
        }
      }
      Decoded(meta, out.toSeq)
    } finally in.close()
  }

  /** None at clean EOF (the loop's only exit); a PARTIAL entry throws. */
  private def readEntry(in: DataInputStream, offset: Long)
      : Option[(Long, Long, String, String, Long, Long)] = {
    val first = in.read()
    if (first < 0) return None
    def fail(what: String): Nothing =
      throw new IllegalStateException(
        s"truncated entry at offset $offset: $what")
    try {
      val checksum = readU64LEFirst(in, first)
      val ts = readU64LE(in)
      val labelLen = readU16LE(in)
      val payloadLen = readU32LE(in).toInt
      val lb = new Array[Byte](labelLen)
      in.readFully(lb)
      val pb = new Array[Byte](payloadLen)
      in.readFully(pb)
      val verPrev = readU64LE(in)
      Some((checksum, ts,
        new String(lb, java.nio.charset.StandardCharsets.UTF_8),
        new String(pb, java.nio.charset.StandardCharsets.UTF_8),
        verPrev, 8L + 8L + 2L + 4L + labelLen + payloadLen + 8L))
    } catch { case _: EOFException => fail("EOF inside entry") }
  }

  private def parseMeta(json: String): Map[String, String] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val b = Map.newBuilder[String, String]
    node.fields().forEachRemaining(e => b += e.getKey -> e.getValue.asText())
    b.result()
  }

  private def readU16LE(in: DataInputStream): Int = {
    val a = in.readUnsignedByte(); val b = in.readUnsignedByte()
    a | (b << 8)
  }
  private def readU32LE(in: DataInputStream): Long = {
    var v = 0L
    var i = 0
    while (i < 4) { v |= in.readUnsignedByte().toLong << (8 * i); i += 1 }
    v
  }
  private def readU64LE(in: DataInputStream): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= in.readUnsignedByte().toLong << (8 * i); i += 1 }
    v
  }
  /** readU64LE when byte 0 was already consumed by the EOF probe. */
  private def readU64LEFirst(in: DataInputStream, b0: Int): Long = {
    var v = b0.toLong & 0xffL
    var i = 1
    while (i < 8) { v |= in.readUnsignedByte().toLong << (8 * i); i += 1 }
    v
  }
}
