package graft

import graft.exprs.TextOps
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets

/** TextOps.fingerprints edge cases vs a direct reimplementation of the
  * relational formulation (explode + window min + distinct) the DuckDB
  * oracle runs — the corpus-level equivalence is the oracle gate; this
  * pins the boundaries (empty, shorter than a gram, shorter than a
  * window, exact window length).
  */
class WinnowOpsSpec extends AnyFunSuite {
  private val K = 8
  private val W = 16

  /** Reference model: the relational formulation, literally. */
  private def model(t: Array[Byte]): Seq[Long] = {
    val n = math.max(t.length - (K - 1), 1)
    val h = (0 until n).map { i =>
      val g = t.slice(i, math.min(i + K, t.length))
      val d = java.security.MessageDigest.getInstance("MD5").digest(g)
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val keep = math.max(n - (W - 1), 1)
    (0 until keep).map(p => h.slice(p, math.min(p + W, n)).min)
      .distinct.sorted
  }

  private def kernel(s: String): Seq[Long] = {
    val a = TextOps.fingerprints(s.getBytes(StandardCharsets.UTF_8))
    (0 until a.numElements()).map(a.getLong)
  }

  private def check(s: String): Unit =
    assert(kernel(s) == model(s.getBytes(StandardCharsets.UTF_8)), s"input: '$s'")

  test("empty and sub-gram inputs produce the single clamped fingerprint") {
    check("")
    check("a")
    check("abcdefg") // len 7 < K
  }

  test("sub-window inputs (K <= len < K+W-1)") {
    check("abcdefgh") // exactly one gram
    check("abcdefghi")
    check("the quick brown") // 15 chars, n=8 < W
  }

  test("boundary: n == W and n == W + 1") {
    check("x" * (K - 1 + W)) // n = W, keep = 1
    check("abcdefgh" * 3) // n = 17 = W + 1, keep = 2
  }

  test("long mixed text matches the relational model") {
    check("the quick brown fox jumps over the lazy dog " * 20)
    check((0 until 500).map(i => s"tok$i").mkString(" "))
  }
}
