package graft.sources

import graft.core.{EventData, EventLog, EventSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

import java.io.{BufferedInputStream, DataInputStream, EOFException, FileInputStream}
import java.nio.charset.StandardCharsets

/** Reader/writer for the REFERENCE's native binary log file format — the
  * migration path for an existing romshark/eventlog deployment, in BOTH
  * directions: open the `.eventlog` file it wrote (checksum- and
  * chain-verified) or produce one from an engine log.
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
  * (file.go:330), the first entry's `versionPrevious` is the 0 sentinel,
  * and the checksum is XXH64(seed 0) over everything after itself
  * (checksum.go:9-67) — the exact function
  * [[graft.exprs.EventOps.checksum]] already implements for the engine's
  * own integrity column, so both sides share one definition. Decoding
  * verifies BOTH the per-entry checksum and the version chain (entry N's
  * `versionPrevious` = entry N-1's offset) — spliced files with
  * self-consistent entries are rejected, not just bit flips.
  *
  * Scale shape: the format is inherently sequential WITHIN a file
  * (variable-length records, no sync markers), so one file = one task —
  * matching the single-node reference that wrote it; parallelism comes
  * from reading many files at once. Decoding is a streaming Iterator over
  * a 64 KiB buffered stream — a file is never materialized whole.
  */
object NativeLog {
  final val SupportedProtoVersion = 5L

  /** The FILE format's label ceiling (reference file.go:42) — stricter than
    * the engine/wire cap of 65535 (internal.go:5): the reference sizes its
    * pooled read buffers as `MaxPayloadLen + MaxLabelLen + 8` (file.go:84),
    * so a longer label overruns them on read. Enforced symmetrically here:
    * `readEntry` treats a longer length as corruption and `export` refuses
    * to produce a file the reference could not open. */
  final val MaxFileLabelLen = 256

  /** Header metadata written when the caller supplies none. The reference
    * enforces `MinPayloadLen = 7` on EVERY entry at READ time including the
    * header pseudo-event (file.go:36, read_event.go:108) but not at write
    * time, so an empty-meta header (`{}`, 2 bytes) would produce a file the
    * reference itself can never reopen. Any non-empty map encodes to ≥ 8
    * bytes, so only the empty map needs the fill. */
  final val DefaultExportMeta: Map[String, String] = Map("exporter" -> "graft")

  /** (version, version_previous, timestamp, label, payload, checksum). */
  private type Ev = (Long, Long, Long, String, String, Long)

  /** Decoded native log (tests / small files — materializes the events;
    * the scale paths below stay on the iterator). */
  final case class Decoded(meta: Map[String, String], events: Seq[Ev])

  /** Read one or more native log files as a DataFrame in [[EventSchema]]
    * (versions are the reference's byte offsets). Many files decode in
    * parallel, one streaming task each. */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val rows = spark.sparkContext
      .parallelize(paths, math.max(paths.size, 1))
      .flatMap(p => openEvents(p)._2.map(Row.fromTuple))
    spark.createDataFrame(rows, EventSchema.schema)
  }

  /** Metadata of a native log — reads ONLY the header pseudo-event. */
  def readMeta(path: String): Map[String, String] = {
    val in = openStream(path)
    try readHeader(in)._1 finally in.close()
  }

  /** Migrate a native log into an engine log: events stream through the
    * commit sequencer in order. Versions and timestamps are REASSIGNED
    * (dense engine versions replace byte offsets), and payloads pass the
    * engine's standard append canonicalization (minify) — a NO-OP for
    * files the reference wrote, since it minified at original append. */
  def importInto(log: EventLog, path: String, batch: Int = 1000): Long = {
    var n = 0L
    openEvents(path)._2.grouped(batch).foreach { g =>
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
    // Validate EVERY row's format bounds BEFORE the first byte is
    // written: the native format has no trailer, so a file abandoned
    // mid-write at an entry boundary would read back as a valid, SHORTER
    // log — silent data loss for any tooling that trusts file existence.
    // One aggregate pass beats that failure mode.
    {
      import org.apache.spark.sql.functions.{col, max, min, octet_length}
      val b = log.toDF
        .agg(max(octet_length(col("label"))).as("maxLabel"),
          min(octet_length(col("payload"))).as("minPayload"))
        .head()
      if (!b.isNullAt(0)) {
        require(b.getInt(0) <= MaxFileLabelLen,
          s"a label of ${b.getInt(0)} bytes exceeds the native format's " +
            s"$MaxFileLabelLen-byte ceiling (file.go:42) — the reference " +
            "could not read the exported file")
        require(b.getInt(1) >= EventSchema.MinPayloadLen,
          s"a payload of ${b.getInt(1)} bytes is under the native " +
            s"format's ${EventSchema.MinPayloadLen}-byte read minimum " +
            "(read_event.go:108) — the exported file would be unreadable")
      }
    }
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path), 64 * 1024)
    var failed = false
    try {
      // Jackson (sorted keys): correct escaping for any metadata content
      val metaJson = {
        val filled = if (meta.isEmpty) DefaultExportMeta else meta
        val m = new java.util.TreeMap[String, String]()
        filled.foreach { case (k, v) => m.put(k, v) }
        val json = new com.fasterxml.jackson.databind.ObjectMapper()
          .writeValueAsString(m)
        require(json.getBytes(StandardCharsets.UTF_8).length >=
          EventSchema.MinPayloadLen,
          s"metadata JSON shorter than the format minimum " +
            s"${EventSchema.MinPayloadLen} — the reference could not reopen " +
            "the file (read_event.go:108)")
        json
      }
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
    } catch {
      case t: Throwable => failed = true; throw t
    } finally {
      out.close()
      // belt-and-braces for mid-write I/O failures: never leave a
      // truncated-but-decodable file behind
      if (failed) {
        try java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
        catch { case _: Exception => () }
      }
    }
  }

  private[graft] def encodeEntry(
      ts: Long, label: String, payload: String, prev: Long): Array[Byte] = {
    val lb = label.getBytes(StandardCharsets.UTF_8)
    val pb = payload.getBytes(StandardCharsets.UTF_8)
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

  /** Decode + verify a whole file into memory (tests / metadata). */
  private[graft] def decodeFile(path: String): Decoded = {
    val (meta, it) = openEvents(path)
    Decoded(meta, it.toSeq)
  }

  private def openStream(path: String): DataInputStream =
    new DataInputStream(
      new BufferedInputStream(new FileInputStream(path), 64 * 1024))

  /** Read proto gate + header pseudo-event; returns (meta, headerEnd). */
  private def readHeader(in: DataInputStream): (Map[String, String], Long) = {
    val proto = readU32LE(in)
    require(proto == SupportedProtoVersion,
      s"unsupported proto version $proto (supported: $SupportedProtoVersion)")
    readEntry(in, 4L) match {
      case None =>
        throw new IllegalStateException("native log has no header entry")
      case Some((stored, ts, lb, pb, verPrev, len)) =>
        verifyEntry(stored, ts, lb, pb, verPrev, 4L)
        if (verPrev != 0L)
          throw new IllegalStateException(
            "header pseudo-event must carry versionPrevious 0")
        (parseMeta(new String(pb, StandardCharsets.UTF_8)), 4L + len)
    }
  }

  /** Streaming decode: (metadata, verified event iterator). The stream
    * closes when the iterator exhausts (or on a decode error); an
    * abandoned iterator leaks one fd until GC — acceptable for a
    * migration reader, noted here deliberately. */
  private def openEvents(path: String): (Map[String, String], Iterator[Ev]) = {
    val in = openStream(path)
    try {
      val (meta, headerEnd) = readHeader(in)
      val it = new Iterator[Ev] {
        private var offset = headerEnd
        private var prevVersion = 0L // 0 sentinel: first event's `previous`
        private var nextEv: Option[Ev] = None
        private var open = true
        advance()
        private def advance(): Unit = {
          if (!open) { nextEv = None; return }
          try {
            readEntry(in, offset) match {
              case None =>
                nextEv = None
                open = false
                in.close()
              case Some((stored, ts, lb, pb, verPrev, len)) =>
                verifyEntry(stored, ts, lb, pb, verPrev, offset)
                if (verPrev != prevVersion)
                  throw new IllegalStateException(
                    s"broken version chain at offset $offset: " +
                      s"versionPrevious=$verPrev, expected $prevVersion")
                nextEv = Some((offset, verPrev, ts,
                  new String(lb, StandardCharsets.UTF_8),
                  new String(pb, StandardCharsets.UTF_8), stored))
                prevVersion = offset
                offset += len
            }
          } catch {
            case e: Throwable =>
              open = false
              try in.close() catch { case _: Exception => () }
              throw e
          }
        }
        override def hasNext: Boolean = nextEv.isDefined
        override def next(): Ev = {
          val e = nextEv.getOrElse(throw new NoSuchElementException)
          advance()
          e
        }
      }
      (meta, it)
    } catch { case e: Throwable => in.close(); throw e }
  }

  /** Checksum over the RAW bytes (exactly what the file contains — the
    * String round-trip would substitute U+FFFD for invalid UTF-8 and hash
    * different bytes than stored). */
  private def verifyEntry(
      stored: Long, ts: Long, lb: Array[Byte], pb: Array[Byte],
      verPrev: Long, offset: Long): Unit = {
    val computed = graft.exprs.EventOps.checksum(
      ts, UTF8String.fromBytes(lb), UTF8String.fromBytes(pb), verPrev)
    if (computed != stored)
      throw new graft.core.Errors.ErrInvalidVersion()
  }

  /** None at clean EOF (the loop's only exit); a PARTIAL entry throws.
    * Returns raw label/payload BYTES plus the entry's total length. */
  private[graft] def readEntry(in: DataInputStream, offset: Long)
      : Option[(Long, Long, Array[Byte], Array[Byte], Long, Long)] = {
    val first = in.read()
    if (first < 0) return None
    try {
      val checksum = readU64LEFirst(in, first)
      val ts = readU64LE(in)
      val labelLen = readU16LE(in)
      val payloadLenRaw = readU32LE(in)
      // the format's own payload bounds (file.go:33-36, read_event.go:108) —
      // a length outside them is corruption, and both sides matter: past the
      // ceiling a u32 near 2^31 would turn into a negative/2 GiB allocation
      // BEFORE any checksum ran; under MinPayloadLen the reference's own
      // reader returns ErrInvalidVersion, so accepting it here would make
      // the importer take files the reference refuses
      if (payloadLenRaw > EventSchema.DefaultPayloadLimit ||
          payloadLenRaw < EventSchema.MinPayloadLen)
        throw new IllegalStateException(
          s"corrupt entry at offset $offset: payload length $payloadLenRaw " +
            s"outside the format bounds [${EventSchema.MinPayloadLen}, " +
            s"${EventSchema.DefaultPayloadLimit}]")
      if (labelLen > MaxFileLabelLen)
        throw new IllegalStateException(
          s"corrupt entry at offset $offset: label length $labelLen " +
            s"exceeds the format maximum $MaxFileLabelLen (file.go:42)")
      val payloadLen = payloadLenRaw.toInt
      val lb = new Array[Byte](labelLen)
      in.readFully(lb)
      val pb = new Array[Byte](payloadLen)
      in.readFully(pb)
      val verPrev = readU64LE(in)
      Some((checksum, ts, lb, pb, verPrev,
        8L + 8L + 2L + 4L + labelLen + payloadLen + 8L))
    } catch {
      case _: EOFException =>
        throw new IllegalStateException(
          s"truncated entry at offset $offset: EOF inside entry")
    }
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
