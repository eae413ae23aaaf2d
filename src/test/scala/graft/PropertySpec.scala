package graft

import graft.exprs.EventOps
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based guards over the byte-parity kernels (≙ the reference's
  * golden-file + exhaustive-corpus approach, generalized by generators). */
class PropertySpec extends AnyFunSuite {
  private def u(s: String) = UTF8String.fromString(s)

  /** Deterministic sampler (no scalatestplus bridge in the offline cache). */
  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    var misses = 0
    while (i < n && misses < 1000) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) => f(a); i += 1
        case None => misses += 1
      }
      seed = seed.next
    }
    assert(i == n, s"generator too sparse: $i/$n")
  }

  private val jsonScalar: Gen[String] = Gen.oneOf(
    Gen.choose(-1000000, 1000000).map(_.toString),
    Gen.choose(-1e6, 1e6).map(d => f"$d%.4f"),
    Gen.alphaNumStr.map(s => s"\"$s\""),
    Gen.const("null"), Gen.const("true"), Gen.const("false"))

  private val ws: Gen[String] =
    Gen.listOf(Gen.oneOf(" ", "\t", "\n", "\r")).map(_.mkString)

  /** Small JSON objects with random inter-token whitespace. */
  private val paddedJson: Gen[(String, String)] = for {
    n <- Gen.choose(1, 5)
    keys <- Gen.listOfN(n, Gen.alphaNumStr.suchThat(_.nonEmpty))
    vals <- Gen.listOfN(n, jsonScalar)
    pads <- Gen.listOfN(6 * n + 2, ws)
  } yield {
    val p = pads.iterator
    val entries = keys.distinct.zip(vals)
    val padded = entries.map { case (k, v) =>
      s"""${p.next()}"$k"${p.next()}:${p.next()}$v${p.next()}""" }
      .mkString(",")
    val minified = entries.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    (s"{$padded}", s"{$minified}")
  }

  test("minify: strips exactly the inter-token whitespace, preserves values") {
    forAll(paddedJson) { case (padded, expected) =>
      assert(EventOps.minifyJson(u(padded)).toString == expected)
    }
  }

  test("minify: idempotent on its own output") {
    forAll(paddedJson) { case (padded, _) =>
      val once = EventOps.minifyJson(u(padded)).toString
      assert(EventOps.minifyJson(u(once)).toString == once)
    }
  }

  test("minify: whitespace inside string values survives byte-for-byte") {
    forAll(Gen.listOf(Gen.oneOf("a", " ", "\\t", "x y"))) { parts =>
      val v = parts.mkString
      val in = s"""{ "k" : "$v" }"""
      assert(EventOps.minifyJson(u(in)).toString == s"""{"k":"$v"}""")
    }
  }

  test("valid padded objects always pass validatePayload; scalars never do") {
    forAll(paddedJson) { case (padded, _) =>
      assert(EventOps.validatePayload(u(padded)))
    }
    forAll(jsonScalar) { s => assert(!EventOps.validatePayload(u(s))) }
  }

  test("hex: decode(encode(v)) == v for arbitrary longs (incl. u64 range)") {
    forAll(Arbitrary.arbitrary[Long]) { v =>
      assert(EventOps.hexDecode(u(EventOps.hexEncode(v).toString)) == v)
    }
  }

  test("checksum: equal inputs agree, any single-field perturbation disagrees") {
    val gen = for {
      ts <- Gen.choose(0L, 1L << 40)
      label <- Gen.alphaNumStr
      n <- Gen.choose(0, 100)
      payload = s"""{"v":$n}"""
      vp <- Gen.choose(0L, 1L << 40)
    } yield (ts, label, payload, vp)
    forAll(gen) { case (ts, label, payload, vp) =>
      val c = EventOps.checksum(ts, u(label), u(payload), vp)
      assert(c == EventOps.checksum(ts, u(label), u(payload), vp))
      assert(c != EventOps.checksum(ts + 1, u(label), u(payload), vp))
      assert(c != EventOps.checksum(ts, u(label), u(payload), vp + 1))
      assert(c != EventOps.checksum(ts, u(label), u(payload + " "), vp))
    }
  }

  test("native entry codec round-trips arbitrary events byte-exactly") {
    val gen = for {
      ts <- Gen.choose(0L, 4102444800L) // sane unix-seconds range
      label <- Gen.listOf(Gen.oneOf(
        Gen.alphaNumChar, Gen.oneOf('_', '-', '.', '~', '%'))).map(_.mkString)
      payload <- Gen.oneOf(
        Gen.alphaNumStr.map(s => s"""{"k":"$s"}"""),
        Gen.const("""{"寿":"司","emoji":"🍣"}"""), // multi-byte UTF-8
        Gen.choose(0, 500).map(n => s"""{"big":"${"x" * n}"}"""))
      prev <- Gen.choose(0L, Long.MaxValue / 2)
    } yield (ts, label, payload, prev)
    forAll(gen) { case (ts, label, payload, prev) =>
      val bytes = graft.sources.NativeLog.encodeEntry(ts, label, payload, prev)
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val Some((cks, ts2, lb, pb, prev2, len)) =
        graft.sources.NativeLog.readEntry(in, 0L)
      assert(ts2 == ts && prev2 == prev && len == bytes.length)
      assert(new String(lb, "UTF-8") == label)
      assert(new String(pb, "UTF-8") == payload)
      // stored checksum must verify against the decoded raw bytes
      assert(cks == graft.exprs.EventOps.checksum(ts,
        UTF8String.fromBytes(lb), UTF8String.fromBytes(pb), prev))
    }
  }

  test("label validation agrees with the charset definition on arbitrary strings") {
    val legal = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ "_-.~%").toSet
    forAll(Arbitrary.arbitrary[String]) { s =>
      val expected =
        s.getBytes("UTF-8").length <= EventOps.MaxLabelLen &&
          s.forall(legal.contains)
      assert(EventOps.validateLabel(u(s)) == expected)
    }
  }
}
