package graft.operators

/** Vocab-scale BPE training: the classic incremental pair-count trainer
  * (Sennrich et al. 2016's released implementation, and what production
  * tokenizer trainers do) run DRIVER-side over the collected word-frequency
  * table, with exact delta maintenance instead of per-round recounting.
  *
  * Division of labor, the shape a 100 TB corpus needs:
  *  - Spark does the CORPUS-scale half once — the distinct-word frequency
  *    aggregate (`TextAnalysis.bpeWordTableOf`): one scan + one shuffle,
  *    output vocab-sized;
  *  - the merge learning runs here over that table: a 30k-merge vocabulary
  *    is 30k argmax decisions over counts that change by small deltas —
  *    running each decision as a Spark job pays 30k stage launches to move
  *    kilobytes (the bottleneck SCALING.md prices for the sequential
  *    trainer), while this loop does the same arithmetic in-process.
  *
  * BIT-PARITY with the per-round Spark trainer
  * ([[graft.queries.TextAnalysis.trainBpeOn]]) is a hard contract, not an
  * approximation (BpeFastTrainerSpec pins it at 500+ merges):
  *  - pair counts are occurrence-weighted adjacent pairs × word frequency
  *    (the `bpePairCounts` definition);
  *  - each round's winner is argmax by (count DESC, lhs ASC, rhs ASC) —
  *    symbols are `[a-z]+` concatenations, so Java String ordering equals
  *    Spark's UTF8String binary ordering;
  *  - the merge applies as ONE greedy left-to-right non-overlapping pass
  *    whose output never re-pairs within the round (`applyBpeMerge`'s
  *    doubled-space semantics, the same pass [[graft.exprs.BpeEncode]]
  *    replays);
  *  - training stops early when no adjacent pair remains anywhere;
  *  - `pair_freq` records the chosen pair's PRE-round count.
  *
  * The argmax uses a lazy max-heap (entries re-pushed on every count
  * change, stale entries skipped on pop) so each round costs
  * O(touched words × their length) plus O(log pairs) per delta — never a
  * full rescan of the pair table, which is what makes 30k rounds viable.
  */
object BpeTrainer {

  /** (round, lhs, rhs, merged, pair_freq) in learned order — train_bpe's
    * output schema. */
  type Merges = Seq[(Long, String, String, String, Long)]

  private final case class Cand(c: Long, l: String, r: String)

  // max-heap priority: larger count wins; ties prefer the SMALLER (l, r)
  private val candOrd: Ordering[Cand] = (a: Cand, b: Cand) => {
    if (a.c != b.c) java.lang.Long.compare(a.c, b.c)
    else {
      val cl = b.l.compareTo(a.l) // reversed: smaller string = higher priority
      if (cl != 0) cl else b.r.compareTo(a.r)
    }
  }

  /** Train `rounds` merges over `words` = (frequency, symbol array) rows —
    * the collected word table, char-split. Mutates nothing it was given. */
  def train(words: Array[(Long, Array[String])], rounds: Int): Merges = {
    import scala.collection.mutable
    val syms: Array[Array[String]] = words.map(_._2.clone())
    val freq: Array[Long] = words.map(_._1)

    val counts = mutable.HashMap[(String, String), Long]()
    val byPair = mutable.HashMap[(String, String), mutable.Set[Int]]()
    val heap = mutable.PriorityQueue.empty[Cand](candOrd)

    def bump(p: (String, String), d: Long, wi: Int, adding: Boolean): Unit = {
      val n = counts.getOrElse(p, 0L) + d
      if (n <= 0L) { counts.remove(p) }
      else {
        counts(p) = n
        heap.enqueue(Cand(n, p._1, p._2))
      }
      val set = byPair.getOrElseUpdate(p, mutable.Set.empty[Int])
      if (adding) set += wi
    }

    def pairsOf(a: Array[String]): Iterator[(String, String)] =
      (0 until a.length - 1).iterator.map(i => (a(i), a(i + 1)))

    var wi = 0
    while (wi < syms.length) {
      for (p <- pairsOf(syms(wi))) bump(p, freq(wi), wi, adding = true)
      wi += 1
    }

    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var round = 1L
    var exhausted = false
    while (round <= rounds && !exhausted) {
      // pop until a live entry surfaces (stale counts are skipped; the
      // SAME pair may sit in the heap under several outdated counts)
      var best: Option[Cand] = None
      while (best.isEmpty && heap.nonEmpty) {
        val c = heap.dequeue()
        if (counts.get((c.l, c.r)).contains(c.c)) best = Some(c)
      }
      best match {
        case None => exhausted = true // no adjacent pairs anywhere — stop
        case Some(Cand(c, l, r)) =>
          val merged = l + r
          out += ((round, l, r, merged, c))
          // touched words: exactly those currently containing the pair
          val touched = byPair.getOrElse((l, r), mutable.Set.empty[Int]).toArray
          for (w <- touched) {
            val old = syms(w)
            // one greedy left-to-right non-overlapping pass — the
            // doubled-space applyBpeMerge semantics
            val next = mutable.ArrayBuffer[String]()
            var i = 0
            var changed = false
            while (i < old.length) {
              if (i + 1 < old.length && old(i) == l && old(i + 1) == r) {
                next += merged; i += 2; changed = true
              } else { next += old(i); i += 1 }
            }
            if (changed) {
              // exact multiset delta: remove the old word's pairs, add the
              // new word's — every affected count re-enters the heap
              for (p <- pairsOf(old)) bump(p, -freq(w), w, adding = false)
              syms(w) = next.toArray
              for (p <- pairsOf(syms(w))) bump(p, freq(w), w, adding = true)
            }
            // stale byPair memberships (words that no longer hold some
            // pair) are tolerated: the apply pass above re-checks the
            // symbols, and counts — the correctness carrier — are exact
          }
          byPair.remove((l, r))
          counts.remove((l, r))
          round += 1
      }
    }
    out.result()
  }
}
