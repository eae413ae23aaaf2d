package graft.tools

import graft.operators.FirstFitTree

/** Micro-benchmark for the FFD first-fit kernel (round 14): one LARGE
  * bucket — the shape the segment tree exists for — packed by (a) the
  * linear open-bin scan the round-13 kernel used and (b) the
  * [[FirstFitTree]] O(log bins) first-fit, asserting the assignments
  * are IDENTICAL before timing. No Spark: this isolates the in-kernel
  * complexity (the flatMapSortedGroups wrapper is the same either way).
  *
  * `FfdMicro [nDocs] [budget]` — defaults 1,000,000 docs, budget 1024.
  * Doc sizes are a deterministic LCG over [1, budget] mixed with a
  * short-doc-heavy tail (short docs keep bins open longest — the
  * worst case for the linear scan, and the realistic corpus shape).
  */
object FfdMicro {

  /** The round-13 kernel verbatim: linear scan over all open bins. */
  private def packLinear(sizes: Array[Long], budget: Long): Array[Long] = {
    val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = new Array[Long](sizes.length)
    var d = 0
    while (d < sizes.length) {
      val nEff = sizes(d)
      var i = 0
      var fit = -1
      while (fit < 0 && i < rem.length) {
        if (rem(i) >= nEff) fit = i
        i += 1
      }
      out(d) =
        if (fit >= 0) { rem(fit) -= nEff; fit + 1L }
        else { rem += budget - nEff; rem.length.toLong }
      d += 1
    }
    out
  }

  private def packTree(sizes: Array[Long], budget: Long): Array[Long] = {
    val bins = new FirstFitTree
    val out = new Array[Long](sizes.length)
    var d = 0
    while (d < sizes.length) {
      val nEff = sizes(d)
      val fit = bins.firstFit(nEff)
      out(d) =
        if (fit >= 0) { bins.take(fit, nEff); fit + 1L }
        else { bins.append(budget - nEff); bins.size.toLong }
      d += 1
    }
    out
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(1000000)
    val budget = args.lift(1).map(_.toLong).getOrElse(1024L)
    // deterministic LCG; 75% short docs (≤ budget/16), 25% across the
    // full range — FFD visits them sorted DESC like ffdAssign does
    var x = 0x9E3779B97F4A7C15L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    val sizes = Array.fill(nDocs) {
      val r = (next() >>> 1)
      if (r % 4 != 0) 1L + (r % (budget / 16))
      else 1L + (r % budget)
    }.sortBy(-_)

    // correctness first: identical assignments on a smaller prefix too
    val probe = sizes.take(math.min(nDocs, 200000))
    val a = packLinear(probe, budget)
    val b = packTree(probe, budget)
    require(java.util.Arrays.equals(a, b),
      "segment-tree first-fit must reproduce the linear scan's assignment")

    def time(f: => Array[Long]): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e6, r.max)
    }
    // warm both paths, then measure
    time(packTree(probe, budget)); time(packLinear(probe, budget))
    val (tTree, binsTree) = time(packTree(sizes, budget))
    val (tLin, binsLin) = time(packLinear(sizes, budget))
    require(binsTree == binsLin)
    println(f"docs=$nDocs budget=$budget bins=$binsTree")
    println(f"linear: ${tLin}%10.1f ms  (${tLin * 1e6 / nDocs}%8.1f ns/doc)")
    println(f"tree:   ${tTree}%10.1f ms  (${tTree * 1e6 / nDocs}%8.1f ns/doc)")
    println(f"speedup: ${tLin / tTree}%.1fx")
    println(f"""{"ffd_micro":{"docs":$nDocs,"budget":$budget,"bins":$binsTree,"linear_ms":$tLin%.1f,"tree_ms":$tTree%.1f,"speedup":${tLin / tTree}%.1f}}""")
  }
}
