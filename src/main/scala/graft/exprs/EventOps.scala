package graft.exprs

import com.fasterxml.jackson.core.JsonFactory
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level helpers behind the engine's custom Catalyst expressions.
  *
  * Semantics mirror the reference observable behavior (not its code):
  *  - minifyJson: /root/reference/internal/jsonminify/jsonminify.go:3-25
  *  - validatePayload: /root/reference/eventlog/validate_payload_json.go:10-66
  *  - validateLabel: /root/reference/eventlog/validate_label.go:5-22
  *  - checksum layout: /root/reference/eventlog/file/internal/checksum.go:9-67
  *    (XXH64 seed 0 over: ts u64 LE | labelLen u16 LE | payloadLen u32 LE |
  *     label | payload | versionPrevious u64 LE)
  *  - hex codec: /root/reference/internal/hex/{writeUint64,readUint64}.go
  *
  * All methods are static-forwarded (top-level object) so generated code can
  * call them directly inside whole-stage codegen.
  */
object EventOps {
  final val MaxLabelLen = 65535 // reference internal/internal.go:5

  /** Strip whitespace outside JSON strings; preserves key order, number text
    * and escape sequences byte-for-byte (to_json(from_json(x)) would not). */
  def minifyJson(in: UTF8String): UTF8String = {
    val b = in.getBytes
    val out = new Array[Byte](b.length)
    var i = 0
    var t = 0
    var inString = false
    while (t < b.length) {
      val c = b(t)
      var keep = true
      (c: Byte) match {
        case 0x20 => if (!inString) keep = false
        case 0x0a | 0x09 | 0x0d => keep = false
        case 0x22 =>
          if (!inString) inString = true
          else if (b(t - 1) != 0x5c) inString = false
        case _ => ()
      }
      if (keep) { out(i) = c; i += 1 }
      t += 1
    }
    UTF8String.fromBytes(out, 0, i)
  }

  private val jsonFactory = new JsonFactory()

  /** Strict payload validity: non-empty, first non-WS byte is '{', not an
    * empty object, and the whole input is exactly one valid JSON document. */
  def validatePayload(in: UTF8String): Boolean = {
    val b = in.getBytes
    if (b.length < 1) return false
    var i = 0
    var inObject = false
    while (i < b.length && !inObject) {
      (b(i): Byte) match {
        case 0x20 | 0x09 | 0x0a | 0x0d => i += 1
        case 0x7b => inObject = true
        case _ => return false
      }
    }
    if (!inObject) return false
    i += 1
    var scanning = true
    while (i < b.length && scanning) {
      (b(i): Byte) match {
        case 0x20 | 0x09 | 0x0a | 0x0d => i += 1
        case 0x7d => return false // '{' directly followed by '}': empty object
        case _ => scanning = false
      }
    }
    isOneJsonDocument(b)
  }

  /** Exactly one JSON root value, nothing but it in the input. */
  private def isOneJsonDocument(b: Array[Byte]): Boolean =
    try {
      val p = jsonFactory.createParser(b)
      try {
        if (p.nextToken() == null) return false
        p.skipChildren() // consumes the rest of the first value if container
        p.nextToken() == null // no trailing content
      } finally p.close()
    } catch { case _: Exception => false }

  /** Charset [A-Za-z0-9_\-.~%], length <= 65535. Empty labels are legal. */
  def validateLabel(in: UTF8String): Boolean = {
    val b = in.getBytes
    if (b.length > MaxLabelLen) return false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') ||
        c == '_' || c == '-' || c == '.' || c == '~' || c == '%'
      if (!ok) return false
      i += 1
    }
    true
  }

  /** XXH64(seed=0) over the reference's little-endian entry layout. */
  def checksum(
      timestamp: Long,
      label: UTF8String,
      payload: UTF8String,
      versionPrevious: Long): Long = {
    val lb = label.getBytes
    val pb = payload.getBytes
    val len = 8 + 2 + 4 + lb.length + pb.length + 8
    val buf = new Array[Byte](len)
    putLongLE(buf, 0, timestamp)
    buf(8) = (lb.length & 0xff).toByte
    buf(9) = ((lb.length >> 8) & 0xff).toByte
    putIntLE(buf, 10, pb.length)
    System.arraycopy(lb, 0, buf, 14, lb.length)
    System.arraycopy(pb, 0, buf, 14 + lb.length, pb.length)
    putLongLE(buf, 14 + lb.length + pb.length, versionPrevious)
    XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 0L)
  }

  private def putLongLE(b: Array[Byte], o: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { b(o + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
  }

  private def putIntLE(b: Array[Byte], o: Int, v: Int): Unit = {
    var i = 0
    while (i < 4) { b(o + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
  }

  /** Shortest lowercase hex; 0 -> "0". Treats the long as unsigned. */
  def hexEncode(v: Long): UTF8String =
    UTF8String.fromString(java.lang.Long.toHexString(v))

  /** Lower/upper hex -> long; null on empty, >16 digits, or bad chars. */
  def hexDecode(s: UTF8String): java.lang.Long = {
    val b = s.getBytes
    if (b.length == 0 || b.length > 16) return null
    var r = 0L
    var i = 0
    while (i < b.length) {
      val d = Character.digit(b(i), 16)
      if (d < 0) return null
      r = (r << 4) | d
      i += 1
    }
    java.lang.Long.valueOf(r)
  }
}
