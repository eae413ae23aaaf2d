package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}


/** Persisted, log-structured dedup state for INCREMENTAL corpus intake.
  *
  * A 100 TB corpus is not ingested once — crawl drops arrive over months,
  * and each drop must be deduplicated against EVERYTHING already admitted
  * without rescanning (or re-shingling) the admitted corpus. This operator
  * persists exactly the per-document evidence the dedup family needs —
  * the exact tier's content hash and the near-dup tier's MinHash
  * signature — as an append-only sequence of immutable delta directories
  * under one state root, and answers "which of these new documents are
  * novel?" with joins against that state.
  *
  * Layout under `dir`:
  * {{{
  *   manifest-v<N>          current = highest N; one header line
  *                          ("graft-dedup-state-v1 bits=<bloomBits>")
  *                          then one line per live delta:
  *                          "<deltaDir>\t<fingerprintLedger>\t<nDocs>"
  *   delta-<uuid>/rows/     parquet: doc_id, content_hash (md5 hex of
  *                          text), mins array<long>[12], emb
  *                          array<double> (null when the batch carried no
  *                          embedding) — ONE file set per delta; the
  *                          exact, lexical, and semantic tiers each read
  *                          only their columns (parquet projection), so
  *                          splitting the tiers into separate files would
  *                          buy no I/O and cost a second write pass
  *   delta-<uuid>/bloom/    parquet: word, mask — Bloom of the delta's
  *                          hashes ([[BloomSketch]], 64-bit words)
  * }}}
  *
  * Crash safety is the [[VersionedArtifact]] discipline: a delta is staged
  * under `staging-<uuid>`, renamed whole, and becomes LIVE only when the
  * next manifest (written to a temp name, then atomically renamed)
  * references it — a crash at any point leaves the previous manifest
  * intact and at worst an unreferenced directory, reclaimed by [[gc]].
  * Writers (admit/compact/gc) are single-writer by contract — the
  * deployment story is one intake job per state root, serialized by the
  * scheduler; a lost cross-process manifest race surfaces loudly as
  * EEXIST rather than silently dropping a delta. Readers only ever see
  * committed manifests.
  *
  * Idempotent replay: each admit records the batch's caller-supplied
  * fingerprint in the manifest; re-admitting a fingerprint the manifest
  * already holds returns the current state unchanged (the restart story —
  * an intake job that crashed AFTER commit but before its own bookkeeping
  * can simply re-run).
  *
  * Admission semantics (all six verdicts are returned per document, so
  * the rejects are auditable, not just absent):
  *
  *  - `exact_dup_state`: content hash already admitted in ANY delta.
  *  - `exact_dup_batch`: a smaller doc_id in THIS batch has the same hash
  *    (the min-id keeper rule the batch dedup_exact entry uses).
  *  - `near_dup_state`: a capped LSH band key collides with an admitted
  *    document's and signature agreement clears
  *    [[MinHashLsh.VerifyThreshold]].
  *  - `near_dup_batch`: a verified near-dup pair to a SMALLER doc_id in
  *    this batch (pairwise greedy keep-first — deterministic and
  *    oracle-expressible; a doc may be dropped against a batch sibling
  *    that is itself rejected, the conservative trade every greedy LSH
  *    dedup makes).
  *  - `sem_dup_state` / `sem_dup_batch`: the SEMANTIC tier — when the
  *    batch carries an `emb` column, random-hyperplane-banded candidates
  *    verified by exact cosine >= [[RhpLsh.VerifyCosine]] against
  *    admitted embeddings / smaller batch siblings (the paraphrase case
  *    no shingle tier can see). Structurally false for emb-less rows.
  *  - `admitted` = none of the above. Only admitted documents' evidence
  *    enters the state, which yields the invariant that non-null content
  *    hashes are GLOBALLY unique across deltas (an admitted doc was, by
  *    definition, no exact dup of any earlier delta or batch sibling) —
  *    so state reads never need a distinct.
  *
  * Scale shape of one admit at 100 TB state / TB-scale batch:
  *
  *  - Exact tier: the state's per-delta Bloom side-files fold into ONE
  *    ≤(bits/64)-row (word, mask) relation — broadcast — and prefilter
  *    the batch, so only Bloom-positive batch docs (true dups + the FP
  *    fraction) reach the semi-join against state hashes; the full state
  *    hash scan is columnar, projected to one 32-char column, and joined
  *    only against that residue. Bloom false positives only ENLARGE the
  *    candidate set; the semi-join decides, so results are exactly the
  *    no-Bloom results.
  *  - Near-dup tier: state signatures are scanned once per admit (one
  *    narrow column), banded map-side, capped, and joined on 8-byte
  *    (band, bkey) keys against the batch's bands — linear in state size
  *    with a bounded-fanout join, the honest cost of cross-drop near-dup
  *    detection. Caps are computed within-state and within-batch
  *    respectively, so one boilerplate band key can't go quadratic.
  *  - Deltas stay drop-sized; [[compact]] folds them into one when small
  *    files accumulate, preserving content exactly.
  */
object DedupState {

  /** Bloom capacity for the exact tier's per-delta side filter. 2^20 bits
    * ≈ 131 KiB folded — broadcastable whatever the state size; at ~10^5
    * admitted docs per filter the FP rate is ~1%, and FPs cost only a
    * row in the verification semi-join, never a verdict. */
  val DefaultBloomBits: Long = BloomSketch.DefaultBits

  private val Magic = "graft-dedup-state-v1"

  /** One live delta: its directory name, the fingerprint ledger of the
    * admits it holds (singleton until [[compact]] merges deltas — the
    * ledger keeps recognizing every admitted batch fingerprint), and how
    * many documents it holds. Manifest mechanics live in the shared
    * [[DeltaManifest]] (also the [[DecontamRegistry]] discipline). */
  final case class DeltaRef(name: String, ledger: String, nDocs: Long) {
    def fingerprints: Seq[String] = ledger.split(DeltaManifest.FpSep).toSeq
  }

  /** An immutable view of one committed manifest. `version` 0 = no state
    * yet (empty handle; every verdict is "novel"). */
  final case class Handle(
      dir: String, version: Long, bloomBits: Long, deltas: Seq[DeltaRef]) {
    def nDocs: Long = deltas.iterator.map(_.nDocs).sum
    def fingerprints: Set[String] =
      deltas.iterator.flatMap(_.fingerprints).toSet
  }

  /** The state before any admit: every verdict against it is "novel in
    * state" — what the first drop of a fresh intake sees. */
  def empty: Handle = Handle("", 0L, DefaultBloomBits, Seq.empty)

  /** Load the current committed state (the highest manifest). */
  def load(dir: String): Handle = {
    val st = DeltaManifest.load(dir, Magic, s"bits=$DefaultBloomBits")
    Handle(dir, st.version, st.payload.split("bits=").last.trim.toLong,
      st.refs.map(r => DeltaRef(r.name, r.ledger, r.n)))
  }

  /** All admitted rows `(doc_id, content_hash, mins, emb)`. Non-null
    * content hashes are globally distinct by the admitted-only invariant;
    * null-text admitted documents carry null hash/mins (no content ⇒ no
    * exact/lexical evidence), embedding-less documents carry null `emb`
    * (no semantic evidence). Parquet projection means callers touching
    * one column pay for one. */
  def rows(s: SparkSession, h: Handle): DataFrame =
    unionDeltas(s, h, "rows",
      "doc_id bigint, content_hash string, mins array<bigint>, " +
        "emb array<double>")

  /** All admitted content hashes (one 32-hex-char column). */
  def hashes(s: SparkSession, h: Handle): DataFrame =
    rows(s, h).select("content_hash")

  /** All admitted MinHash signatures `(doc_id, mins)`, null-sig rows
    * dropped. */
  def sigs(s: SparkSession, h: Handle): DataFrame =
    rows(s, h).filter(col("mins").isNotNull).select("doc_id", "mins")

  private def unionDeltas(
      s: SparkSession, h: Handle, leaf: String, schema: String)
      : DataFrame = {
    val paths = h.deltas.map(d => s"${h.dir}/${d.name}/$leaf")
    if (paths.isEmpty)
      s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(schema))
    // explicit schema, not inference: a column added to the layout later
    // (emb, round 14) reads as NULL from pre-existing deltas — the
    // schema-evolution path that lets a long-lived state gain tiers
    // without a rewrite
    else s.read.schema(org.apache.spark.sql.types.StructType.fromDDL(schema))
      .parquet(paths: _*)
  }

  /** The state's folded Bloom relation `(word, mask)` — per-delta filters
    * OR-folded; ≤ bits/64 rows, broadcastable. */
  private def bloomWords(s: SparkSession, h: Handle): DataFrame = {
    val perDelta = unionDeltas(s, h, "bloom", "word bigint, mask bigint")
    perDelta.groupBy("word").agg(expr("bit_or(mask)").as("mask"))
  }

  /** Read-only admission verdicts for a batch `(doc_id, text[, emb])`
    * against the state: one row per batch document with the six dup
    * verdicts and `admitted`. The optional `emb` column (array<double>)
    * switches on the SEMANTIC tier — random-hyperplane-banded cosine
    * near-dup detection vs admitted embeddings ([[RhpLsh]]); without it
    * the sem verdicts are structurally false. Does not touch the state
    * on disk. */
  def verdicts(s: SparkSession, h: Handle, batch: DataFrame): DataFrame =
    verdictsFull(s, h, batch).drop("mins", "emb")

  /** [[verdicts]] plus the evidence columns — what [[admit]] persists. */
  private def verdictsFull(
      s: SparkSession, h: Handle, batch: DataFrame): DataFrame = {
    val embCol =
      if (batch.columns.contains("emb")) col("emb").cast("array<double>")
      else lit(null).cast("array<double>")
    val b = batch
      .select(col("doc_id"), col("text"), embCol.as("emb"))
      .withColumn("content_hash", md5(col("text")))
      .withColumn("mins", when(col("text").isNotNull,
        graft.exprs.functions.minhash12(split(col("text"), "\\s+"))))

    // ---- exact tier -----------------------------------------------------
    // Within-batch: min-id keeper per hash. A null hash (null text) is NO
    // exact-dup evidence — same posture as the lexical/semantic tiers'
    // "no shingles/embedding ⇒ no evidence", and what keeps content-less
    // rows from window-grouping into accidental dups.
    val wh = Window.partitionBy(col("content_hash"))
    val withBatchExact = b.withColumn("exact_dup_batch",
      col("content_hash").isNotNull &&
        col("doc_id") =!= min(col("doc_id")).over(wh))

    // Vs state: Bloom prefilter (broadcast ≤16 K rows), then the deciding
    // semi-join against state hashes for the Bloom-positive residue only.
    val bloom = bloomWords(s, h)
    val probed = withBatchExact
      .withColumn("p1", BloomSketch.pos1(col("content_hash"), h.bloomBits))
      .withColumn("p2", BloomSketch.pos2(col("content_hash"), h.bloomBits))
      .withColumn("w1", expr("p1 DIV 64"))
      .withColumn("w2", expr("p2 DIV 64"))
      .join(broadcast(bloom.select(col("word").as("w1"),
        col("mask").as("mask1"))), Seq("w1"), "left")
      .join(broadcast(bloom.select(col("word").as("w2"),
        col("mask").as("mask2"))), Seq("w2"), "left")
      .withColumn("bloom_hit",
        expr("coalesce(shiftright(mask1, CAST(p1 % 64 AS INT)) & 1, 0L) = 1")
          && expr(
          "coalesce(shiftright(mask2, CAST(p2 % 64 AS INT)) & 1, 0L) = 1"))
      .drop("p1", "p2", "w1", "w2", "mask1", "mask2")
    val stateHit = probed.filter(col("bloom_hit"))
      .select("doc_id", "content_hash")
      .join(hashes(s, h), Seq("content_hash"), "left_semi")
      .select(col("doc_id")).withColumn("exact_dup_state", lit(true))

    // ---- near-dup tier --------------------------------------------------
    val batchSigs = b.filter(col("mins").isNotNull).select("doc_id", "mins")
    // Within-batch: verified pair to a smaller batch doc_id.
    val nearBatch = MinHashLsh.pairsFromSigs(batchSigs)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("near_dup_batch", lit(true))
    // Vs state: capped batch bands ⋈ capped state bands, verified by the
    // signatures riding both sides.
    val sb = MinHashLsh.cappedBandsOf(batchSigs)
    val ss = MinHashLsh.cappedBandsOf(sigs(s, h))
      .select(col("doc_id").as("sid"), col("mins").as("smins"),
        col("band"), col("bkey"))
    val nearState = sb.join(ss, Seq("band", "bkey"))
      .select(col("doc_id"), col("mins"), col("sid"), col("smins")).distinct()
      .filter(MinHashLsh.simEst(col("mins"), col("smins")) >=
        MinHashLsh.VerifyThreshold)
      .select(col("doc_id")).distinct()
      .withColumn("near_dup_state", lit(true))

    // ---- semantic tier ([[RhpLsh]]) ---------------------------------------
    // Built only when the batch CAN carry embeddings — an emb-less batch
    // (the common text intake) gets literal-false columns and none of
    // the sub-DAG's joins in its plan.
    val withSem: DataFrame => DataFrame =
      if (!batch.columns.contains("emb")) { flags =>
        flags.withColumn("sem_dup_state", lit(false))
          .withColumn("sem_dup_batch", lit(false))
      } else { flags =>
        val batchEmb = b.filter(col("emb").isNotNull)
          .select(col("doc_id"), col("emb").as("v"))
        val semBatch = RhpLsh.pairsOf(batchEmb)
          .select(col("doc_b").as("doc_id")).distinct()
          .withColumn("sem_dup_batch", lit(true))
        val eb = RhpLsh.cappedBandsOf(RhpLsh.withSig(batchEmb))
        val es = RhpLsh.cappedBandsOf(RhpLsh.withSig(
            rows(s, h).filter(col("emb").isNotNull)
              .select(col("doc_id"), col("emb").as("v"))))
          .select(col("doc_id").as("sid"), col("v").as("sv"),
            col("nrm").as("snrm"), col("b"), col("bkey"))
        val semState = eb.join(es, Seq("b", "bkey"))
          .select(col("doc_id"), col("v"), col("nrm"),
            col("sid"), col("sv"), col("snrm")).distinct()
          .filter(RhpLsh.cosinePre(col("v"), col("sv"),
            col("nrm"), col("snrm")) >= RhpLsh.VerifyCosine)
          .select(col("doc_id")).distinct()
          .withColumn("sem_dup_state", lit(true))
        flags.join(semState, Seq("doc_id"), "left")
          .join(semBatch, Seq("doc_id"), "left")
          .withColumn("sem_dup_state",
            coalesce(col("sem_dup_state"), lit(false)))
          .withColumn("sem_dup_batch",
            coalesce(col("sem_dup_batch"), lit(false)))
      }

    withSem(probed.drop("bloom_hit")
        .join(stateHit, Seq("doc_id"), "left")
        .join(nearState, Seq("doc_id"), "left")
        .join(nearBatch, Seq("doc_id"), "left"))
      .withColumn("exact_dup_state",
        coalesce(col("exact_dup_state"), lit(false)))
      .withColumn("near_dup_state",
        coalesce(col("near_dup_state"), lit(false)))
      .withColumn("near_dup_batch",
        coalesce(col("near_dup_batch"), lit(false)))
      .withColumn("admitted",
        !col("exact_dup_state") && !col("exact_dup_batch") &&
          !col("near_dup_state") && !col("near_dup_batch") &&
          !col("sem_dup_state") && !col("sem_dup_batch"))
      .select(col("doc_id"), col("content_hash"), col("mins"), col("emb"),
        col("exact_dup_state"), col("exact_dup_batch"),
        col("near_dup_state"), col("near_dup_batch"),
        col("sem_dup_state"), col("sem_dup_batch"), col("admitted"))
  }

  /** Admit a batch: compute verdicts against the current state, persist
    * the admitted documents' evidence as a new delta, and commit the next
    * manifest. Returns the post-admit handle. Re-admitting a fingerprint
    * already in the manifest is a no-op returning the current handle
    * (idempotent replay). */
  def admit(
      s: SparkSession, dir: String, batch: DataFrame,
      fingerprint: String): Handle = synchronized {
    DeltaManifest.requireCleanId(fingerprint)
    val h = load(dir)
    if (h.fingerprints.contains(fingerprint)) return h

    val staging = DeltaManifest.stagingPath(dir)
    val st = staging.toString
    // ONE computation of the verdict DAG materializes rows/; the Bloom and
    // the row count derive from the STAGED parquet, so the delta's two
    // artifacts can never disagree.
    verdictsFull(s, h, batch)
      .filter(col("admitted"))
      .select("doc_id", "content_hash", "mins", "emb")
      .write.parquet(s"$st/rows")
    val staged = s.read.parquet(s"$st/rows")
    BloomSketch.maskRelation(
      staged.filter(col("content_hash").isNotNull).select("content_hash"),
      wordBits = 64, bits = h.bloomBits)
      .write.parquet(s"$st/bloom")
    val n = staged.count()

    val deltaName = DeltaManifest.promote(staging)
    DeltaManifest.commit(dir, Magic, s"bits=${h.bloomBits}", h.version + 1,
      (h.deltas :+ DeltaRef(deltaName, fingerprint, n))
        .map(d => DeltaManifest.Ref(d.name, d.ledger, d.nDocs)))
    load(dir)
  }

  /** Fold every live delta's rows into one (with a re-derived Bloom at
    * the manifest's capacity) and commit a manifest referencing only it.
    * Content-preserving by construction; old deltas stay on disk until
    * [[gc]]. The fingerprint LEDGER survives -- the compacted ref carries
    * every ancestor fingerprint joined with [[FpSep]], so idempotent
    * replay keeps recognizing every admitted batch. */
  def compact(s: SparkSession, dir: String): Handle = synchronized {
    val h = load(dir)
    if (h.deltas.size <= 1) return h
    val staging = DeltaManifest.stagingPath(dir)
    val st = staging.toString
    rows(s, h).write.parquet(s"$st/rows")
    BloomSketch.maskRelation(
      s.read.parquet(s"$st/rows")
        .filter(col("content_hash").isNotNull).select("content_hash"),
      wordBits = 64, bits = h.bloomBits)
      .write.parquet(s"$st/bloom")
    val deltaName = DeltaManifest.promote(staging)
    val mergedLedger =
      h.deltas.map(_.ledger).mkString(DeltaManifest.FpSep.toString)
    DeltaManifest.commit(dir, Magic, s"bits=${h.bloomBits}", h.version + 1,
      Seq(DeltaManifest.Ref(deltaName, mergedLedger, h.nDocs)))
    load(dir)
  }

  /** Delete unreferenced directories under the state root: staging
    * leftovers and deltas no manifest-current reference holds (compacted-
    * away or crash orphans). Returns how many were removed. Single-writer
    * contract — never run concurrently with an in-flight [[admit]]. */
  def gc(dir: String): Int = synchronized {
    DeltaManifest.gc(dir, Magic, s"bits=$DefaultBloomBits")
  }
}
