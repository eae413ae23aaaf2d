package graft.tools

import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Micro-bench for the phrase fold's membership probe (round-10 review
  * item: binary-search the sorted position arrays). Times
  * [[graft.exprs.PhraseScore.occurrences]] — whose `contains` is now a
  * binary search — against an in-place linear-scan reference, on a
  * synthetic LONG document (the robustness case: a repetitive document
  * whose phrase terms occur tens of thousands of times, so each of the
  * |S₀| start positions probes a positions array of the same size).
  * Run: `sbt "runMain graft.tools.PhraseMicro"`; numbers go to
  * BENCH_TREND.md. */
object PhraseMicro {

  private def linearOccurrences(
      phrase: GenericArrayData,
      m: ArrayBasedMapData): Long = {
    val k = phrase.numElements()
    val keys = m.keyArray
    val vals = m.valueArray
    def posOf(t: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
      var i = 0
      while (i < m.numElements()) {
        if (keys.getUTF8String(i).equals(t)) return vals.getArray(i)
        i += 1
      }
      null
    }
    def contains(
        a: org.apache.spark.sql.catalyst.util.ArrayData, x: Int): Boolean = {
      var i = 0
      while (i < a.numElements()) {
        if (a.getInt(i) == x) return true
        i += 1
      }
      false
    }
    val first = posOf(phrase.getUTF8String(0))
    var count = 0L
    var s = 0
    while (s < first.numElements()) {
      val p = first.getInt(s)
      var ok = true
      var i = 1
      while (ok && i < k) { ok = contains(posOf(phrase.getUTF8String(i)), p + i); i += 1 }
      if (ok) count += 1
      s += 1
    }
    count
  }

  def main(args: Array[String]): Unit = {
    // a 3-term phrase over a document where each term occurs n times at
    // stride 3 — every start matches, the worst-case fold
    val n = 30000
    val phrase = new GenericArrayData(Array[Any](
      UTF8String.fromString("a"), UTF8String.fromString("b"),
      UTF8String.fromString("c")))
    val pos = (0 until 3).map(off =>
      new GenericArrayData((0 until n).map(i => i * 3 + off).toArray))
    val m = new ArrayBasedMapData(
      new GenericArrayData(Array[Any](
        UTF8String.fromString("a"), UTF8String.fromString("b"),
        UTF8String.fromString("c"))),
      new GenericArrayData(pos.toArray[Any]))

    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach(_ => f) // warmup
      val t0 = System.nanoTime()
      val reps = 20
      var got = 0L
      (1 to reps).foreach(_ => got = f)
      val ms = (System.nanoTime() - t0) / 1e6 / reps
      println(f"$label%-22s $ms%9.2f ms/doc  (occurrences=$got)")
    }
    time("linear reference")(linearOccurrences(phrase, m))
    time("kernel (binary)")(graft.exprs.PhraseScore.occurrences(phrase, m))
  }
}
