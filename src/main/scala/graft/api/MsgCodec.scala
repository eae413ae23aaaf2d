package graft.api

import graft.core.EventData

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Binary wire codec for append bodies ≙ reference internal/msgcodec
  * (msgcodec.go:14-56 encode, :100-141 scan; README.md:21-28): 1..N frames of
  *
  *   labelLen u16 LE | payloadLen u32 LE | label | payload
  */
object MsgCodec {
  final class MalformedMessageException
      extends IllegalArgumentException("malformed message")

  def encode(events: Seq[EventData]): Array[Byte] = {
    val parts = events.map { e =>
      val l = e.label.getBytes(StandardCharsets.UTF_8)
      val p = e.payloadJson.getBytes(StandardCharsets.UTF_8)
      require(l.length <= 0xffff, "label too long for wire format")
      val buf = ByteBuffer.allocate(2 + 4 + l.length + p.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      buf.putShort((l.length & 0xffff).toShort)
      buf.putInt(p.length)
      buf.put(l)
      buf.put(p)
      buf.array()
    }
    parts.foldLeft(Array.emptyByteArray)(_ ++ _)
  }

  /** Decode all frames; the reference's two-pass scan (count + validate,
    * then emit) collapses to one pass over an in-memory body. Empty bodies
    * and truncated frames throw [[MalformedMessageException]]. */
  def decode(body: Array[Byte]): Seq[EventData] = {
    if (body.isEmpty) throw new MalformedMessageException
    val buf = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    val out = Seq.newBuilder[EventData]
    while (buf.remaining() > 0) {
      if (buf.remaining() < 6) throw new MalformedMessageException
      val labelLen = buf.getShort() & 0xffff
      val payloadLen = buf.getInt()
      // compare each length separately: labelLen + payloadLen can overflow
      // Int for a hostile payloadLen near Int.MaxValue, turning the bounds
      // check into a huge-allocation DoS
      if (payloadLen < 0 || labelLen > buf.remaining()
        || payloadLen > buf.remaining() - labelLen)
        throw new MalformedMessageException
      val label = new Array[Byte](labelLen)
      buf.get(label)
      val payload = new Array[Byte](payloadLen)
      buf.get(payload)
      out += EventData(
        new String(label, StandardCharsets.UTF_8),
        new String(payload, StandardCharsets.UTF_8))
    }
    out.result()
  }
}
