package graft

import graft.exprs.EventOps
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Unit corpus for the byte-parity helpers, mirroring the reference's test
  * matrices (eventlog_test.go:520-603, hex tests, jsonminify goldens). */
class EventOpsSpec extends AnyFunSuite {
  private def u(s: String) = UTF8String.fromString(s)

  // ---- label validation (reference validate_label.go + tests :546-603) ----

  test("labels: full legal charset accepted, max length boundary") {
    val legal = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ "_-.~%"
    assert(EventOps.validateLabel(u(legal.mkString)))
    assert(EventOps.validateLabel(u(""))) // empty labels are legal
    assert(EventOps.validateLabel(u("x" * EventOps.MaxLabelLen)))
    assert(!EventOps.validateLabel(u("x" * (EventOps.MaxLabelLen + 1))))
  }

  test("labels: exhaustive over all 256 single bytes") {
    val legal = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ "_-.~%").toSet
    (0 until 256).foreach { b =>
      val s = UTF8String.fromBytes(Array(b.toByte))
      assert(
        EventOps.validateLabel(s) == legal.contains(b.toChar),
        s"byte $b")
    }
  }

  // ---- payload validation (reference validate_payload_json.go + :520-538) ----

  test("payloads: invalid corpus rejected") {
    val invalid = Seq(
      "", " ", "\t", "\n", "{}", "{ }", "{\n}", " {} ",
      "[]", "[1,2]", "42", "1.5", "\"str\"", "null", "true", "false",
      "{\"x\":}", "{\"x\"", "{\"x\":1,}", "xyz", "{}{}", "{\"a\":1}{\"b\":2}",
      "{\"a\":1} trailing")
    invalid.foreach(p => assert(!EventOps.validatePayload(u(p)), s"<$p>"))
  }

  test("payloads: valid corpus accepted (incl. non-Latin keys)") {
    val valid = Seq(
      """{"x":0}""",
      """ {"x":0} """,
      """{"a":{"b":[1,2,{"c":null}]},"d":"e"}""",
      """{"ключ":"значение"}""",
      """{"キー":"値"}""",
      """{"a":1e10,"b":-0.5,"c":true,"d":null}""")
    valid.foreach(p => assert(EventOps.validatePayload(u(p)), s"<$p>"))
  }

  // ---- minify (reference jsonminify.go + golden fixtures) ----

  test("minify strips whitespace outside strings only") {
    assert(EventOps.minifyJson(u("""{ "a" : 1 , "b" : "x y\tz" }""")).toString
      == """{"a":1,"b":"x y\tz"}""")
    assert(EventOps.minifyJson(u("{\n\t\"a\": [1, 2,\r\n 3]\n}")).toString
      == """{"a":[1,2,3]}""")
  }

  test("minify preserves key order, number text, and escapes byte-for-byte") {
    val in = """{"z": 1.500, "a": "he said \"hi  there\"", "n": -0E+2}"""
    assert(EventOps.minifyJson(u(in)).toString
      == """{"z":1.500,"a":"he said \"hi  there\"","n":-0E+2}""")
  }

  test("minify replicates the reference's escaped-backslash quirk byte-for-byte") {
    // jsonminify.go:17 checks only ONE preceding backslash, so a string
    // ending in an escaped backslash (\\") mis-tracks the closing quote and
    // whitespace after it survives. Byte-parity means we reproduce exactly
    // that observable behavior (SURVEY.md §7.4).
    val quirky = """{"k":"a\\" ,"b":2}"""
    assert(EventOps.minifyJson(u(quirky)).toString == quirky) // space kept
    // ...while a plain escaped quote tracks correctly and whitespace strips
    assert(EventOps.minifyJson(u("""{"k":"a\"x" ,"b":2}""")).toString
      == """{"k":"a\"x","b":2}""")
  }

  test("minify is idempotent") {
    val in = """{"a":1,"b":"x y"}"""
    assert(EventOps.minifyJson(u(in)).toString == in)
  }

  test("minify at the 1 MiB payload bound (reference 1mb golden fixture scale)") {
    // ~1 MiB document with known minified form, built from repeated entries
    val n = 12000
    val padded = (0 until n).map(i =>
      s""" "key_$i" : [ 1 , 2.5 , "two words" , null ] """).mkString("{", ",", "}")
    val minified = (0 until n).map(i =>
      s""""key_$i":[1,2.5,"two words",null]""").mkString("{", ",", "}")
    assert(padded.length > 500000)
    assert(EventOps.minifyJson(u(padded)).toString == minified)
    assert(EventOps.validatePayload(u(padded)))
  }

  // ---- hex codec (reference internal/hex) ----

  test("hex: shortest-lowercase encode, decode roundtrip across magnitudes") {
    val cases = Seq(0L, 1L, 15L, 16L, 255L, 4096L, 65535L,
      1L << 32, Long.MaxValue, -1L /* = u64 max */ )
    cases.foreach { v =>
      val h = EventOps.hexEncode(v).toString
      assert(h == java.lang.Long.toHexString(v))
      assert(!h.startsWith("0") || h == "0") // shortest form
      assert(EventOps.hexDecode(u(h)) == v)
    }
  }

  test("hex decode: empty, overflow (>16 digits), bad chars → null") {
    assert(EventOps.hexDecode(u("")) == null)
    assert(EventOps.hexDecode(u("1" * 17)) == null)
    assert(EventOps.hexDecode(u("xyz")) == null)
    assert(EventOps.hexDecode(u("12g4")) == null)
    assert(EventOps.hexDecode(u("f" * 16)) == -1L) // u64 max fits
  }

  // ---- checksum (reference checksum.go layout) ----

  test("checksum is deterministic and sensitive to every field") {
    val base = EventOps.checksum(100L, u("lbl"), u("""{"x":0}"""), 7L)
    assert(base == EventOps.checksum(100L, u("lbl"), u("""{"x":0}"""), 7L))
    assert(base != EventOps.checksum(101L, u("lbl"), u("""{"x":0}"""), 7L))
    assert(base != EventOps.checksum(100L, u("lbL"), u("""{"x":0}"""), 7L))
    assert(base != EventOps.checksum(100L, u("lbl"), u("""{"x":1}"""), 7L))
    assert(base != EventOps.checksum(100L, u("lbl"), u("""{"x":0}"""), 8L))
  }

  test("checksum: label/payload boundary shifts change the hash") {
    // same concatenated bytes, different split → different length prefix
    assert(EventOps.checksum(1L, u("ab"), u("""{"x":0}"""), 0L)
      != EventOps.checksum(1L, u("a"), u("""b{"x":0}"""), 0L))
  }
}
