package graft

import graft.operators.DedupState
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

/** Incremental dedup-state lifecycle: admit appends immutable deltas under
  * an atomically committed manifest; verdicts classify a batch against
  * everything admitted so far; replaying an admitted fingerprint is a
  * no-op; a crash mid-stage is invisible; compaction preserves content AND
  * the fingerprint ledger; gc reclaims exactly the unreferenced dirs; and
  * the Bloom prefilter never changes a verdict (exactness invariance).
  */
class DedupStateSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-dedupstate").toString

  // Near-dup pair: >=3-token shingled texts differing in a trailing token —
  // 9 common tokens out of 10 keeps estimated Jaccard above 0.5.
  private val baseText =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val nearText =
    "alpha beta gamma delta epsilon zeta eta theta iota lambda"
  private val otherText =
    "one two three four five six seven eight nine ten eleven twelve"

  private def verdictMap(df: DataFrame): Map[Long, Row] =
    df.collect().map(r => r.getLong(0) -> r).toMap

  test("two-drop admission: exact and near dups vs state and batch") {
    val dir = tmp()
    val h1 = DedupState.admit(spark, dir,
      docs(0L -> baseText, 2L -> otherText, 4L -> otherText), "drop-1")
    assert(h1.version === 1L)
    assert(h1.nDocs === 2L, "4 is an exact batch dup of 2 — not admitted")

    val batch2 = docs(
      1L -> baseText, // exact dup vs state (doc 0)
      3L -> nearText, // near dup vs state (doc 0's signature)
      5L -> "completely novel text with many distinct tokens here",
      7L -> "completely novel text with many distinct tokens here", // exact batch dup of 5
      9L -> "quite unrelated fresh content tokens apple banana cherry date egg fig")
    val v = verdictMap(DedupState.verdicts(spark, DedupState.load(dir), batch2))
    def b(id: Long, col: String) =
      v(id).getBoolean(v(id).fieldIndex(col))
    assert(b(1, "exact_dup_state") && !b(1, "admitted"))
    assert(b(3, "near_dup_state") && !b(3, "exact_dup_state") &&
      !b(3, "admitted"))
    assert(b(5, "admitted"))
    assert(b(7, "exact_dup_batch") && !b(7, "admitted"))
    assert(b(9, "admitted"))

    val h2 = DedupState.admit(spark, dir, batch2, "drop-2")
    assert(h2.version === 2L && h2.nDocs === 4L)
    // third drop sees drop-2's admits as state
    val v3 = verdictMap(DedupState.verdicts(spark, h2,
      docs(11L -> "quite unrelated fresh content tokens apple banana cherry date egg fig")))
    assert(v3(11L).getBoolean(v3(11L).fieldIndex("exact_dup_state")))
  }

  test("within-batch near-dup uses the keep-first pairwise rule") {
    val dir = tmp()
    val h = DedupState.admit(spark, dir,
      docs(10L -> baseText, 20L -> nearText), "d1")
    assert(h.nDocs === 1L, "20 near-dups 10 within the batch; 10 keeps")
    val kept = DedupState.rows(spark, h).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(10L))
  }

  test("fingerprint replay is a no-op, and survives compaction") {
    val dir = tmp()
    DedupState.admit(spark, dir, docs(0L -> baseText), "d1")
    DedupState.admit(spark, dir, docs(1L -> otherText), "d2")
    val before = DedupState.load(dir)
    val replayed = DedupState.admit(spark, dir, docs(0L -> baseText), "d1")
    assert(replayed.version === before.version, "replay must not commit")

    val compacted = DedupState.compact(spark, dir)
    assert(compacted.deltas.size === 1)
    assert(compacted.fingerprints === Set("d1", "d2"),
      "the ledger survives compaction")
    val replayed2 = DedupState.admit(spark, dir, docs(1L -> otherText), "d2")
    assert(replayed2.version === compacted.version,
      "replay after compaction must still be recognized")
  }

  test("compaction preserves rows exactly and gc reclaims old deltas") {
    val dir = tmp()
    DedupState.admit(spark, dir, docs(0L -> baseText, 2L -> otherText), "d1")
    DedupState.admit(spark, dir,
      docs(5L -> "novel text here with several extra tokens appended"), "d2")
    val before = DedupState.rows(spark, DedupState.load(dir))
      .orderBy("doc_id").collect().toSeq
    val h = DedupState.compact(spark, dir)
    val after = DedupState.rows(spark, h).orderBy("doc_id").collect().toSeq
    assert(after === before)
    val removed = DedupState.gc(dir)
    assert(removed === 2, "both pre-compaction deltas reclaimed")
    assert(DedupState.rows(spark, DedupState.load(dir))
      .orderBy("doc_id").collect().toSeq === before,
      "gc never touches live data")
  }

  test("health verdict trips on delta accumulation and compaction restores it") {
    val dir = tmp()
    DedupState.admit(spark, dir, docs(0L -> baseText), "d1")
    DedupState.admit(spark, dir, docs(2L -> otherText), "d2")
    DedupState.admit(spark, dir,
      docs(5L -> "novel text here with several extra tokens appended"), "d3")
    val h = DedupState.load(dir)
    val hr = DedupState.health(spark, h, maxDeltas = 2)
    assert(hr.nDeltas === 3 && hr.nDocs === 3L)
    assert(hr.compactRecommended, "3 deltas > maxDeltas=2 must trip")
    assert(hr.bandFanoutBound === 64L * 3 * 3,
      "cap x bands x live deltas")
    // a three-tiny-doc state is nowhere near Bloom capacity
    assert(hr.bloomFill > 0.0 && hr.bloomFill < 0.01)
    assert(!hr.bloomSaturated)

    val hc = DedupState.compact(spark, dir)
    val hrc = DedupState.health(spark, hc, maxDeltas = 2)
    assert(hrc.nDeltas === 1 && !hrc.compactRecommended,
      "compaction restores the delta dimension")
    // saturation is CONTENT-driven: folding ORs the same masks
    assert(math.abs(hrc.bloomFill - hr.bloomFill) < 1e-12)
  }

  test("a crashed (staged but uncommitted) delta is invisible and gc'd") {
    val dir = tmp()
    DedupState.admit(spark, dir, docs(0L -> baseText), "d1")
    // simulate a writer that crashed after staging: an orphan staging dir
    val orphan = java.nio.file.Paths.get(dir, "staging-deadbeef")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("junk"),
      "partial".getBytes("UTF-8"))
    val h = DedupState.load(dir)
    assert(h.nDocs === 1L, "orphan staging never surfaces in a load")
    assert(DedupState.gc(dir) === 1)
    assert(!java.nio.file.Files.exists(orphan))
  }

  test("verdicts against the empty state admit everything non-dup") {
    val v = verdictMap(DedupState.verdicts(spark, DedupState.empty,
      docs(0L -> baseText, 1L -> baseText, 2L -> otherText)))
    assert(v(0L).getBoolean(v(0L).fieldIndex("admitted")))
    assert(!v(1L).getBoolean(v(1L).fieldIndex("admitted")), "batch dup")
    assert(v(2L).getBoolean(v(2L).fieldIndex("admitted")))
    assert(Seq(0L, 1L, 2L).forall(id =>
      !v(id).getBoolean(v(id).fieldIndex("exact_dup_state")) &&
        !v(id).getBoolean(v(id).fieldIndex("near_dup_state"))))
  }

  test("null-text documents: no content hash is no exact-dup evidence") {
    val dir = tmp()
    import spark.implicits._
    val withNull = Seq((0L, Option("some real text content here")),
      (1L, Option.empty[String]), (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    val h = DedupState.admit(spark, dir, withNull, "d1")
    // null hashes carry NO exact evidence (the tiers' shared "no
    // content ⇒ no evidence" posture) — both null docs admit
    assert(h.nDocs === 3L)
    // and a later drop's null doc is again admitted: null never joins
    val v = verdictMap(DedupState.verdicts(spark, h,
      Seq((5L, Option.empty[String])).toDF("doc_id", "text")))
    assert(v(5L).getBoolean(v(5L).fieldIndex("admitted")))
  }

  test("semantic tier: embedding near-dups reject vs state and batch; emb-less batches never flag") {
    import spark.implicits._
    val dir = tmp()
    def vec(seed: Int, tweak: Double): Seq[Double] =
      (0 until graft.operators.RhpLsh.Dim).map(i =>
        math.sin(seed * 31 + i).abs + (if (i == 0) tweak else 0.0))
    // drop 1: two well-separated embeddings (orthogonal-ish directions)
    val e1 = Seq(
      (0L, Option.empty[String], vec(1, 0.0)),
      (2L, Option.empty[String],
        (0 until graft.operators.RhpLsh.Dim).map(i =>
          if (i % 2 == 0) 1.0 else -1.0).toSeq))
      .toDF("doc_id", "text", "emb")
    val h1 = DedupState.admit(spark, dir, e1, "e1")
    assert(h1.nDocs === 2L)
    // drop 2: a tiny perturbation of doc 0's vector (cosine ≈ 1) must
    // flag sem_dup_state; a fresh direction admits; two near-identical
    // batch siblings resolve by keep-first
    val e2 = Seq(
      (1L, Option.empty[String], vec(1, 0.001)),
      (5L, Option.empty[String], vec(7, 0.0)),
      (7L, Option.empty[String], vec(7, 0.001)))
      .toDF("doc_id", "text", "emb")
    val v = verdictMap(DedupState.verdicts(spark, DedupState.load(dir), e2))
    def b(id: Long, c: String) = v(id).getBoolean(v(id).fieldIndex(c))
    assert(b(1, "sem_dup_state") && !b(1, "admitted"))
    assert(!b(1, "exact_dup_state") && !b(1, "exact_dup_batch"),
      "null hashes carry no exact evidence")
    assert(b(5, "admitted"))
    assert(b(7, "sem_dup_batch") && !b(7, "admitted"))
    // an emb-less batch against the same state never sem-flags
    val v2 = verdictMap(DedupState.verdicts(spark, DedupState.load(dir),
      docs(9L -> "plain text only document with no embedding at all")))
    assert(!v2(9L).getBoolean(v2(9L).fieldIndex("sem_dup_state")))
    assert(v2(9L).getBoolean(v2(9L).fieldIndex("admitted")))
  }

  test("span tier: cross-drop repeated chunks flag advisory, never gate admission") {
    val dir = tmp()
    val chunk = (1 to DedupState.SpanTokens).map(i => s"word$i").mkString(" ")
    val novel = (1 to DedupState.SpanTokens).map(i => s"fresh$i").mkString(" ")
    val novel2 = (1 to DedupState.SpanTokens).map(i => s"again$i").mkString(" ")
    DedupState.admit(spark, dir,
      docs(0L -> (chunk + " some trailing tail"), 2L -> otherText), "d1")
    // doc 5 embeds drop 1's chunk inside otherwise-novel text; doc 7
    // repeats ITS OWN chunk twice (within-batch repetition); doc 9 is
    // clean; doc 11 has no text at all
    import spark.implicits._
    val batch = Seq(
      (5L, Option(chunk + " " + novel)),
      (7L, Option(novel2 + " " + novel2)),
      (9L, Option("too short for any chunk")),
      (11L, Option.empty[String])).toDF("doc_id", "text")
    val sv = DedupState.spanVerdicts(spark, DedupState.load(dir), batch)
      .collect().map(r => r.getLong(0) -> r).toMap
    def b(id: Long, c: String) = sv(id).getBoolean(sv(id).fieldIndex(c))
    def l(id: Long, c: String) = sv(id).getLong(sv(id).fieldIndex(c))
    assert(b(5, "span_dup_state") && !b(5, "span_dup_batch"))
    assert(l(5, "n_chunks") === 2L && l(5, "n_state_dup_chunks") === 1L)
    assert(b(7, "span_dup_batch") && !b(7, "span_dup_state"),
      "a chunk occurring twice IN the batch (even within one doc) flags")
    assert(!b(9, "span_dup_state") && !b(9, "span_dup_batch") &&
      l(9, "n_chunks") === 0L)
    assert(l(11, "n_chunks") === 0L, "null text: no content, no evidence")
    // advisory: the SAME batch still admits in full (5 and 7 are not
    // near-dups of anything — span overlap is a scrub signal, not a gate)
    val v = verdictMap(DedupState.verdicts(
      spark, DedupState.load(dir), batch))
    assert(v(5L).getBoolean(v(5L).fieldIndex("admitted")))
    assert(v(7L).getBoolean(v(7L).fieldIndex("admitted")))
  }

  test("spanScrub cuts exactly the state-admitted chunks, keeps the rest in order") {
    val dir = tmp()
    val chunk = (1 to DedupState.SpanTokens).map(i => s"word$i").mkString(" ")
    DedupState.admit(spark, dir,
      docs(0L -> (chunk + " trailing tail"), 2L -> otherText), "d1")
    import spark.implicits._
    val batch = Seq(
      // the admitted chunk sits at positions 16-31; its 16 tokens go
      (5L, Option("lead1 lead2 lead3 lead4 lead5 lead6 lead7 lead8 " +
        "lead9 lead10 lead11 lead12 lead13 lead14 lead15 lead16 " +
        chunk + " tail1 tail2")),
      (7L, Option("completely novel tokens that match nothing admitted")),
      (9L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = DedupState.spanScrub(spark, DedupState.load(dir), batch)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(5L).getLong(1) === 34L && out(5L).getLong(3) === 16L)
    assert(out(5L).getString(4) ===
      (1 to 16).map(i => s"lead$i").mkString(" ") + " tail1 tail2",
      "survivors re-join in order, the admitted chunk cut whole")
    assert(out(7L).getLong(3) === 0L &&
      out(7L).getString(4).startsWith("completely novel"))
    assert(!out.contains(9L), "null-text docs have no tokens to scrub")
  }

  test("span tier is phase-independent: a duplicated passage shifted off the 16-token grid is flagged AND scrubbed") {
    // round 17 (the round-16 verdict's #1): the state persists chunk
    // hashes on the ADMITTED doc's aligned grid; the arriving batch
    // probes its STRIDE-1 windows, so a shared passage >= 2·SpanTokens−1
    // tokens is caught at ANY relative offset. Previously the batch
    // probed its OWN aligned grid — this exact case (shift k=5, k % 16
    // != 0) evaded both verdict and scrub.
    val dir = tmp()
    val W = DedupState.SpanTokens
    // an admitted doc whose aligned grid covers a 2W-token passage
    val passage = (1 to 2 * W).map(i => s"pass$i").mkString(" ")
    DedupState.admit(spark, dir,
      docs(0L -> passage, 2L -> otherText), "d1")
    import spark.implicits._
    // the SAME passage arrives shifted by 5 tokens (5 % 16 != 0): its
    // aligned chunks straddle the admitted grid, but its stride-1
    // windows at pos 5 and pos 5+W reproduce admitted chunks exactly
    val lead = (1 to 5).map(i => s"lead$i").mkString(" ")
    val batch = Seq((9L, Option(lead + " " + passage + " tail1 tail2")))
      .toDF("doc_id", "text")
    val sv = DedupState.spanVerdicts(spark, DedupState.load(dir), batch)
      .collect().head
    assert(sv.getBoolean(sv.fieldIndex("span_dup_state")),
      "a phase-shifted copy of an admitted passage must flag")
    assert(sv.getLong(sv.fieldIndex("n_state_dup_chunks")) === 2L,
      "both admitted-aligned chunks inside the passage match windows")

    val sc = DedupState.spanScrub(spark, DedupState.load(dir), batch)
      .collect().head
    // tokens 5..36 (the passage) are covered by the two window hits at
    // pos 5 and pos 5+W; the 5 leads and 2 tails survive in order
    assert(sc.getLong(1) === (5 + 2 * W + 2).toLong)
    assert(sc.getLong(3) === (2 * W).toLong,
      "the whole shifted passage is cut, at any phase")
    assert(sc.getString(4) === lead + " tail1 tail2")

    // and a copy shifted by a full SpanTokens multiple (the only case
    // the old aligned probe caught) still behaves identically
    val aligned = Seq((11L,
      Option((1 to W).map(i => s"pre$i").mkString(" ") + " " + passage)))
      .toDF("doc_id", "text")
    val sa = DedupState.spanScrub(spark, DedupState.load(dir), aligned)
      .collect().head
    assert(sa.getLong(3) === (2 * W).toLong)
  }

  test("span layout v2 (xxh64): same verdicts and scrub as md5, bigint leaves, kinds never mix") {
    val chunk = (1 to DedupState.SpanTokens).map(i => s"word$i").mkString(" ")
    val novel = (1 to DedupState.SpanTokens).map(i => s"fresh$i").mkString(" ")
    import spark.implicits._
    val batch = Seq(
      (5L, Option(chunk + " " + novel)),
      (7L, Option("completely novel tokens that match nothing admitted")),
      (9L, Option.empty[String])).toDF("doc_id", "text")
    def build(kind: String): String = {
      val dir = tmp()
      DedupState.admit(spark, dir,
        docs(0L -> (chunk + " trailing tail"), 2L -> otherText), "d1",
        spanKind = kind)
      DedupState.admit(spark, dir, docs(4L -> (novel + " suffix")), "d2",
        spanKind = kind)
      dir
    }
    val md5Dir = build("md5")
    val xxDir = build("xxh64")
    val hm = DedupState.load(md5Dir)
    val hx = DedupState.load(xxDir)
    assert(hm.spanKind === "md5" && hx.spanKind === "xxh64")

    // 4x-smaller representation: the v2 leaf is BIGINT, the v1 a 32-hex
    // string
    assert(DedupState.spans(spark, hx).schema.head.dataType ===
      org.apache.spark.sql.types.LongType)
    assert(DedupState.spans(spark, hm).schema.head.dataType ===
      org.apache.spark.sql.types.StringType)

    // identical span verdicts and scrub output across layouts
    def sv(h: DedupState.Handle) =
      DedupState.spanVerdicts(spark, h, batch)
        .orderBy("doc_id").collect().toSeq
    assert(sv(hx) === sv(hm))
    def scrub(h: DedupState.Handle) =
      DedupState.spanScrub(spark, h, batch)
        .orderBy("doc_id").collect().toSeq
    assert(scrub(hx) === scrub(hm))
    // and the verdicts survive compaction on the v2 layout too
    DedupState.compact(spark, xxDir)
    val hxc = DedupState.load(xxDir)
    assert(hxc.spanKind === "xxh64" && sv(hxc) === sv(hm))

    // the layout is pinned: admitting with the other kind fails loudly
    val e = intercept[IllegalArgumentException] {
      DedupState.admit(spark, xxDir, docs(20L -> otherText), "d3",
        spanKind = "md5")
    }
    assert(e.getMessage.contains("refusing to mix"))
    // kind-less admits keep the state's own layout
    val h3 = DedupState.admit(spark, xxDir, docs(21L -> baseText), "d4")
    assert(h3.spanKind === "xxh64")
  }

  test("multi-delta near-tier capping is per delta (two admits, no compact) — pinned") {
    // ADVICE r15: the per-delta band cap's multi-delta semantics were
    // unpinned. Construct a band bucket that exceeds MaxBandBucket only
    // when the two deltas' rows are COUNTED TOGETHER: per-delta capping
    // keeps both deltas' rows live, so a probe of the shared content
    // still flags near_dup_state; a within-state cap would have dropped
    // the bucket and silently admitted the probe.
    val dir = tmp()
    val cap = graft.operators.MinHashLsh.MaxBandBucket
    // identical text ⇒ identical signature ⇒ all rows share every band
    // bucket. Drop 1 fills one bucket to the cap exactly; drop 2 admits
    // one more doc with DIFFERENT text (so it is not a dup) whose bucket
    // rows stay under the per-delta cap.
    val same = (0 until cap).map(i => (i * 2L, baseText))
    // per-delta semantics: drop 1's bucket holds exactly cap rows (kept);
    // only doc 0 survives admission (the rest are exact dups of it in
    // batch), so the admitted delta holds ONE row of this signature
    DedupState.admit(spark, dir, docs(same: _*), "d1")
    DedupState.admit(spark, dir, docs(1001L -> nearText), "d2")
    val h = DedupState.load(dir)
    assert(h.deltas.size === 2)
    // probe: near-dup of baseText (in delta 1) — must flag near_dup_state
    // through the pre-banded per-delta rows of BOTH deltas
    val v = verdictMap(DedupState.verdicts(spark, h,
      docs(5000L -> nearText)))
    assert(v(5000L).getBoolean(v(5000L).fieldIndex("near_dup_state")),
      "per-delta capped band rows from both live deltas must serve")
    // and the un-compacted answer equals the compacted one (caps
    // concatenate verbatim at compaction — pinned bit-parity)
    val before = DedupState.verdicts(spark, h,
      docs(5000L -> nearText))
      .orderBy("doc_id").collect().toSeq
    DedupState.compact(spark, dir)
    val after = DedupState.verdicts(spark, DedupState.load(dir),
      docs(5000L -> nearText))
      .orderBy("doc_id").collect().toSeq
    assert(after === before)
  }

  test("Bloom saturation never changes a verdict (prefilter exactness)") {
    import spark.implicits._
    val dir = tmp()
    val h = DedupState.admit(spark, dir,
      docs(0L -> baseText, 2L -> otherText), "d1")
    val batch = docs(1L -> baseText, 5L -> "novel unrelated tokens entirely",
      7L -> otherText)
    val before = DedupState.verdicts(spark, h, batch)
      .orderBy("doc_id").collect().toSeq

    // saturate the delta's Bloom: every word all-ones ⇒ every batch doc is
    // Bloom-positive. False positives may only enlarge the semi-join's
    // probe set — the verdicts must be bit-identical.
    val bloomDir = s"$dir/${h.deltas.head.name}/bloom"
    val full = (0L until h.bloomBits / 64).map(w => (w, -1L))
      .toDF("word", "mask")
    full.write.mode("overwrite").parquet(bloomDir)
    val after = DedupState.verdicts(spark, DedupState.load(dir), batch)
      .orderBy("doc_id").collect().toSeq
    assert(after === before)
  }
}
