package graft.operators

/** Max segment tree over open-bin remainders answering FIRST-FIT queries
  * in O(log bins): `firstFit(x)` returns the LOWEST bin index whose
  * remainder is ≥ x, or -1. This is the standard kernel-level fix for
  * first-fit(-decreasing) bin packing's linear open-bin scan — per
  * document the scan is O(bins), so a bucket is O(docs × bins) =
  * O(m²/budget) at fixed bucket count, which stops being tolerable when
  * one bucket holds millions of documents. The tree keeps the EXACT
  * same assignment by construction: the descent prefers the left
  * subtree whenever its max fits, so by induction the returned leaf is
  * the minimum index with remainder ≥ x — precisely the bin the linear
  * scan would pick — and first-fit order (bin creation order) is
  * preserved. Used by the FFD packers (`pack_best_fit`,
  * `pack_best_fit_tokens`); the `graft.tools.FfdMicro` micro-bench
  * measures the win against the linear scan on one large bucket.
  *
  * Layout: 1-based array tree, leaves at [cap, cap+n); unused leaves
  * hold 0, which can never win a query because every queried x ≥ 1 and
  * tracked remainders stay ≥ 0 (a take() only runs against a bin that
  * fits). Capacity doubles by rebuilding — amortized O(1) per append.
  *
  * NOT thread-safe; one instance per sequential per-group kernel.
  */
private[graft] final class FirstFitTree {
  private var cap = 1024
  private var n = 0
  private var tree = new Array[Long](2 * cap)

  /** Open bins so far. */
  def size: Int = n

  /** Current remainder of bin `i` (0-based). */
  def remaining(i: Int): Long = tree(cap + i)

  private def pullUp(leaf: Int): Unit = {
    var i = leaf >> 1
    while (i >= 1) {
      tree(i) = math.max(tree(2 * i), tree(2 * i + 1))
      i >>= 1
    }
  }

  private def grow(): Unit = {
    val nc = cap << 1
    val nt = new Array[Long](2 * nc)
    System.arraycopy(tree, cap, nt, nc, n)
    cap = nc
    tree = nt
    var i = cap - 1
    while (i >= 1) {
      tree(i) = math.max(tree(2 * i), tree(2 * i + 1))
      i -= 1
    }
  }

  /** Open a new bin with remainder `v` (appended in creation order);
    * returns its 0-based index. */
  def append(v: Long): Int = {
    if (n == cap) grow()
    val idx = n
    n += 1
    tree(cap + idx) = v
    pullUp(cap + idx)
    idx
  }

  /** Consume `d` from bin `idx`'s remainder. */
  def take(idx: Int, d: Long): Unit = {
    tree(cap + idx) -= d
    pullUp(cap + idx)
  }

  /** Lowest bin index with remainder ≥ x (x ≥ 1), or -1 if none fits —
    * the linear first-fit scan's answer in O(log bins). */
  def firstFit(x: Long): Int = {
    if (n == 0 || tree(1) < x) return -1
    var i = 1
    while (i < cap) i = if (tree(2 * i) >= x) 2 * i else 2 * i + 1
    i - cap
  }
}
