package graft

import graft.exprs.{BpeEncode, BpeMergeTable, VectorOps}
import graft.multimodal.MultimodalPipeline.MediaCodec
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property guards over the round-8 native kernels: the fused PQ encoder
  * against a naive reference argmin, the fused BPE encoder against the
  * doubled-space string-rewrite semantics it replays, and the PPM stream
  * parser against synthesized frames. Generators, not fixtures — the
  * same discipline PropertySpec applies to the byte-parity kernels. */
class KernelPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 150)(f: A => Unit): Unit = {
    var seed = Seed(7L)
    var i = 0
    var misses = 0
    while (i < n && misses < 1000) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) => f(a); i += 1
        case None => misses += 1
      }
      seed = seed.next
    }
    assert(i == n, s"generator exhausted after $i/$n samples")
  }

  // ------------------------------------------------------------ PqEncode --

  private val pqCase: Gen[(Array[Double], Array[Double], Int, Int)] = for {
    m <- Gen.oneOf(1, 2, 4)
    dsub <- Gen.choose(1, 4)
    k <- Gen.choose(1, 8)
    dim = m * dsub
    r <- Gen.listOfN(dim, Gen.choose(-4.0, 4.0))
    cb <- Gen.listOfN(m * k * dsub, Gen.choose(-4.0, 4.0))
  } yield (r.toArray, cb.toArray, m, k)

  test("pqEncode equals the naive per-sub argmin with lowest-code ties") {
    forAll(pqCase) { case (r, cb, m, k) =>
      val dsub = r.length / m
      val got = VectorOps.pqEncode(new GenericArrayData(r), cb, m, k)
        .toIntArray()
      val want = (0 until m).map { sub =>
        val dists = (0 until k).map { code =>
          val off = (sub * k + code) * dsub
          var s = 0.0
          for (t <- 0 until dsub) {
            val d = r(sub * dsub + t) - cb(off + t); s += d * d
          }
          (s, code)
        }
        dists.minBy { case (d, c) => (d, c) }._2
      }
      assert(got.toSeq == want, s"m=$m k=$k r=${r.toSeq}")
    }
  }

  test("adcDot sums exactly the coded LUT entries") {
    val lutGen = for {
      m <- Gen.choose(1, 6)
      k <- Gen.choose(1, 8)
      lut <- Gen.listOfN(m * k, Gen.choose(-10.0, 10.0))
      codes <- Gen.listOfN(m, Gen.choose(0, k - 1))
    } yield (m, k, lut.toArray, codes.toArray)
    forAll(lutGen) { case (m, k, lut, codes) =>
      val lutArr = new GenericArrayData(
        (0 until m).map(s => new GenericArrayData(
          java.util.Arrays.copyOfRange(lut, s * k, (s + 1) * k))).toArray)
      val got = VectorOps.adcDot(new GenericArrayData(codes), lutArr)
      var want = 0.0
      for (s <- 0 until m) want += lut(s * k + codes(s))
      assert(got == want)
    }
  }

  // --------------------------------------------------------- BpeEncodeIds --

  /** Reference implementation of one merge round via the literal
    * doubled-space string rewrite the batch applyBpeMerge performs. */
  private def rewriteRound(syms: Seq[String], l: String, r: String,
      merged: String): Seq[String] = {
    val enc = " " + syms.mkString("  ") + " "
    val rep = enc.replace(s" $l  $r ", s" $merged ")
    rep.trim.split(" +").toSeq.filter(_.nonEmpty)
  }

  private val bpeCase: Gen[(String, Seq[(Long, String, String, String, Long)])] =
    for {
      nWords <- Gen.choose(1, 6)
      words <- Gen.listOfN(nWords,
        Gen.choose(1, 8).flatMap(n =>
          Gen.listOfN(n, Gen.choose('a', 'd')).map(_.mkString)))
      nMerges <- Gen.choose(0, 4)
      ls <- Gen.listOfN(nMerges, Gen.choose('a', 'd').map(_.toString))
      rs <- Gen.listOfN(nMerges, Gen.choose('a', 'd').map(_.toString))
    } yield {
      // chain merges so later rounds can consume earlier outputs
      var known = ('a' to 'd').map(_.toString).toVector
      val merges = (0 until nMerges).map { i =>
        // both sides drawn from the evolving symbol set, so later rounds
        // exercise merged symbols as LEFT and RIGHT elements
        val l = known(math.abs((ls(i) + rs(i) + i).hashCode) % known.length)
        val r = known(math.abs((rs(i) + ls(i) + i * 7).hashCode) % known.length)
        val m = l + r
        known = known :+ m
        (i + 1L, l, r, m, 10L - i)
      }
      (words.mkString(" "), merges)
    }

  test("BpeEncode.encodeIds replays the string-rewrite merge semantics") {
    forAll(bpeCase) { case (text, merges) =>
      val mt = BpeMergeTable(merges)
      val got = BpeEncode.encodeIds(UTF8String.fromString(text), mt)
        .toIntArray().toSeq
      // reference: per word, run every round through the string rewrite
      val ids = scala.collection.mutable.LinkedHashMap[String, Int]()
      for ((round, _, _, m, _) <- merges if !ids.contains(m))
        ids(m) = 25 + round.toInt
      val want = text.split("\\s+").filter(_.nonEmpty).flatMap { w =>
        var syms: Seq[String] = w.map(_.toString)
        for ((_, l, r, m, _) <- merges) syms = rewriteRound(syms, l, r, m)
        syms.map(s => if (s.length == 1) s.charAt(0) - 'a' else ids(s))
      }.toSeq
      assert(got == want, s"text='$text' merges=$merges")
    }
  }

  private val byteBpeCase
      : Gen[(String, Seq[(Long, String, String, String, Long)])] = {
    val charPool = Seq('a', 'b', 'Z', '0', '.', '!', '中', 'é')
    val wsPool = Seq(" ", "  ", "\t", "\n")
    for {
      nWords <- Gen.choose(1, 6)
      words <- Gen.listOfN(nWords,
        Gen.choose(1, 5).flatMap(n =>
          Gen.listOfN(n, Gen.oneOf(charPool)).map(_.mkString)))
      seps <- Gen.listOfN(nWords, Gen.oneOf(wsPool))
      nMerges <- Gen.choose(0, 5)
      picks <- Gen.listOfN(2 * nMerges, Gen.choose(0, 1 << 20))
    } yield {
      // base symbols actually present in the pool's UTF-8 bytes
      var known = charPool.mkString.getBytes("UTF-8").map(b =>
        f"${b & 0xff}%02X").distinct.toVector
      val merges = (0 until nMerges).map { i =>
        val l = known(picks(2 * i) % known.length)
        val r = known(picks(2 * i + 1) % known.length)
        val m = l + r
        known = known :+ m
        (i + 1L, l, r, m, 10L - i)
      }
      (words.zip(seps).map { case (w, s) => w + s }.mkString, merges)
    }
  }

  test("byte BpeEncode: rewrite-reference parity AND lossless decode on arbitrary unicode") {
    forAll(byteBpeCase) { case (text, merges) =>
      val mt = BpeMergeTable.bytes(merges)
      val got = BpeEncode.encodeIds(UTF8String.fromString(text), mt)
        .toIntArray().toSeq
      // ids reference: per word, byte hex symbols through the rewrite
      val ids = scala.collection.mutable.LinkedHashMap[String, Int]()
      for ((round, _, _, m, _) <- merges if !ids.contains(m))
        ids(m) = 255 + round.toInt
      val want = text.split("\\s+").filter(_.nonEmpty).flatMap { w =>
        var syms: Seq[String] = w.getBytes("UTF-8")
          .map(b => f"${b & 0xff}%02X").toSeq
        for ((_, l, r, m, _) <- merges) syms = rewriteRound(syms, l, r, m)
        syms.map(s =>
          if (s.length == 2) Integer.parseInt(s, 16) else ids(s))
      }.toSeq
      assert(got == want, s"text='$text' merges=$merges")
      // losslessness: decoding the ids reproduces the words' exact bytes
      val decoded = graft.exprs.BpeDecode.decodeByteIds(
        new GenericArrayData(got.toArray), mt).getBytes
      val expected = text.split("\\s+").filter(_.nonEmpty)
        .mkString("").getBytes("UTF-8")
      assert(java.util.Arrays.equals(decoded, expected),
        s"round trip lost bytes for '$text'")
    }
  }

  // ------------------------------------------------------- parsePpmFrames --

  test("parsePpmFrames round-trips synthesized multi-frame streams") {
    val frames = for {
      n <- Gen.choose(1, 4)
      dims <- Gen.listOfN(n,
        Gen.zip(Gen.choose(1, 5), Gen.choose(1, 5)))
    } yield dims
    forAll(frames, n = 80) { dims =>
      val bytes = dims.zipWithIndex.flatMap { case ((w, h), i) =>
        s"P6\n$w $h\n255\n".getBytes("US-ASCII").toSeq ++
          Seq.tabulate(w * h * 3)(j => ((i * 31 + j) % 251).toByte)
      }.toArray
      val got = MediaCodec.parsePpmFrames(bytes)
      assert(got.length == dims.length)
      got.zip(dims).zipWithIndex.foreach { case (((gw, gh, px), (w, h)), i) =>
        assert(gw == w && gh == h)
        assert(px.toSeq == Seq.tabulate(w * h * 3)(j => ((i * 31 + j) % 251).toByte))
      }
    }
  }
}
