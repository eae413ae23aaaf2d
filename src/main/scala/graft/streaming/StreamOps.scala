package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A streaming near-dup emission: `doc_b` arrived while `doc_a`'s band
  * state was live and their minhash signatures agree at `sim_est`.
  * Top-level so the product encoder resolves. */
final case class NearDupHit(doc_a: Long, doc_b: Long, sim_est: Double)

/** State for one LSH band bucket: (doc_id, signature, event-time ms) of
  * the documents currently holding the bucket. */
final case class BandBucket(entries: Seq[(Long, Seq[Long], Long)])

/** A streaming cluster-membership emission: `doc_id`'s current cluster
  * label (the smallest doc_id it is known to be connected to through this
  * band's collision history). Labels only ever DECREASE for a given doc;
  * the consumer's current label for a doc is the MIN over all emissions. */
final case class ClusterLabel(doc_id: Long, cluster: Long)

/** State for one label-propagating band bucket: (doc_id, signature,
  * event-time ms, current label) per held document. */
final case class LabelBucket(entries: Seq[(Long, Seq[Long], Long, Long)])

/** A COMPLETED fixed-length training row from [[StreamOps.packTokenIdsStream]]:
  * `ids` is exactly seqLen token ids; `n_real`/`n_pad` follow the batch
  * pack_token_sequences accounting (pad only on a timeout-flushed tail). */
final case class PackedTokenSeq(
    bucket: Long, seq_id: Long, n_real: Long, n_pad: Long, ids: Seq[Int])

/** State for one token-id pack stream: the bucket's next sequence id and
  * the current PARTIAL sequence (< seqLen ids — the hard state bound). */
final case class PackIdBuf(seqId: Long, buf: Seq[Int])

/** A streaming repeated-span emission ([[StreamOps.spanDedupStream]]):
  * `doc_id` carried a [[graft.queries.Dedup.SpanTokens]]-token chunk whose
  * hash the stream's own history (probably) already contains. */
final case class SpanDupFlag(doc_id: Long, chunk_hash: String)

/** State for one span-hash shard: a FIXED-size Bloom bitmap over every
  * chunk hash the shard has ever admitted — the hard state bound that
  * makes the span twin runnable forever.
  *
  * `routeV` versions the SHARD-ROUTING function the bitmap was built
  * under. Round 10 moved the route from digest chars [1, 4] to the slice
  * after both Bloom position slices; a checkpoint recorded under the old
  * routing holds bitmaps chunks will never re-route to, so resuming it
  * would silently pass previously-seen spans as unseen. The extra state
  * field makes Spark's state-store schema check REJECT such a resume
  * (fail loudly; restart on a fresh checkpoint), and the field value
  * guards any future routing change the schema check alone can't see. */
final case class SpanBloom(routeV: Int, words: Seq[Long])

/** A streaming heavy-hitter candidate ([[StreamOps.heavyHittersStream]]):
  * `token` is currently held by shard `shard`'s Misra–Gries buffer with
  * MG count `lower_bound` (a guaranteed UNDERcount: true count ≥
  * lower_bound, and ≤ lower_bound + shard_total/(capacity+1)). */
final case class HeavyHitterCandidate(
    shard: Long, token: String, lower_bound: Long, shard_total: Long)

/** State for one heavy-hitter shard: the MG buffer (≤ capacity entries —
  * the hard state bound) and the shard's total token count. */
final case class HhShardState(items: Seq[(String, Long)], total: Long)

/** A streaming pack assignment: where `doc_id` landed in its bucket's
  * concat-and-chunk token stream (same output contract as the batch
  * `pack_sequences`). Top-level so the product encoder resolves. */
final case class PackAssign(
    doc_id: Long, bucket: Long, n_tokens: Long, start_off: Long,
    seq_first: Long, seq_last: Long, n_seqs_spanned: Long)

/** State for one pack stream: the bucket's next free token offset. */
final case class PackOffset(offset: Long)

/** State for one source's admission counter ([[StreamOps.capPerSourceStream]]). */
final case class SourceCount(n: Long)

/** Streaming transforms for a continuously-ingesting training-data
  * pipeline (the streaming counterparts of the batch `queries/` operators). */
object StreamOps {

  /** Ceiling for [[decontaminateStream]]'s embedded-literal bitmap:
    * 2^24 bits / 32 per word = 2^19 Longs ≈ 4 MiB in the serialized plan
    * (each Long carries 32 used bits). */
  val MaxStreamBloomBits: Long = 1L << 24

  /** Streaming exact dedup: keep the FIRST document per content hash,
    * emitting survivors immediately (append mode, no watermark hold-back).
    *
    * State is BOUNDED by the watermark: a hash's dedup state expires once
    * the watermark passes its event time + `delay`, so state size tracks
    * the ingest rate × window, not corpus history — the property that
    * makes this runnable forever at 100 TB/day, where an unbounded
    * `dropDuplicates` would grow state with every distinct document ever
    * seen. Within-delay duplicates are dropped exactly; re-occurrences
    * farther apart than `delay` re-emit (cross-window dedup is the batch
    * dedup_exact/dedup_clusters job's responsibility downstream).
    *
    * @param docs    streaming DataFrame with an event-time and a text column
    * @param tsCol   event-time column (becomes the watermark column)
    * @param textCol document text column (hashed with md5, same keeper
    *                definition as the batch dedup_exact)
    * @param delay   watermark delay, e.g. "10 minutes"
    */
  def dedupExact(
      docs: DataFrame, tsCol: String, textCol: String, delay: String): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")

  // Same MinHash family as the batch dedup_minhash_lsh (Dedup.scala): 12
  // affine minhashes, 3 bands of 4 — a band key collides iff all 4 of its
  // signature rows agree.
  private val NumHashes = 12
  private val NumBands = 3
  private val RowsPerBand = NumHashes / NumBands

  /** Band-bucket state cap: a boilerplate band (degenerate shingle set)
    * would otherwise accrete state and compare quadratically — the
    * streaming analog of the batch MaxBandBucket hot-bucket cap. Docs
    * past the cap still COMPARE against the held entries (they can be
    * flagged); they just don't extend the bucket. */
  private val MaxBucketState = 16

  /** [[spanDedupStream]]'s shard-routing version, stamped into every
    * [[SpanBloom]] state row. Bump WHENEVER the chunk → shard route
    * changes (v2 = the round-10 move to the digest slice disjoint from
    * both Bloom position slices): bitmaps recorded under a different
    * route are unreachable by re-occurring chunks, so a resumed stream
    * must fail loudly rather than silently under-deduplicate. */
  private val SpanRouteVersion = 2

  /** Streaming NEAR-dup detection: the batch dedup_minhash_lsh made
    * incremental. Each document's minhash signature is banded exactly like
    * the batch operator; band keys shard the state store, and a document
    * that lands in a live bucket is verified against the bucket's held
    * signatures (agreement ≥ `simThreshold` ⇒ emit a [[NearDupHit]] with
    * the earlier document's id first).
    *
    * Custom state (`flatMapGroupsWithState`) rather than a built-in,
    * because the semantics are "join this row against a decaying set keyed
    * by an LSH bucket" — not expressible as a windowed aggregation.
    *
    * Scale + correctness contract:
    *  - State is bounded two ways: event-time timeout expires a bucket
    *    `delay` after its last activity (state ∝ ingest rate × window,
    *    like dedupExact), and [[MaxBucketState]] caps any single bucket.
    *  - Emission is AT-LEAST-ONCE per near-dup pair: a pair agreeing in
    *    more than one band emits once per agreeing band (buckets are
    *    independent shards and share no state). Downstream consumers
    *    needing exactly-one-row-per-pair run `dropDuplicates("doc_a",
    *    "doc_b")` per micro-batch; the batch clusters job is the
    *    system-of-record either way.
    *  - Within a micro-batch, rows are processed in (event time, doc_id)
    *    order, so doc_a < doc_b by arrival deterministically.
    *
    * @param docs         streaming DataFrame
    * @param tsCol        event-time column (becomes the watermark column)
    * @param idCol        long document id column
    * @param textCol      document text (whitespace-tokenized, same
    *                     tokenization as the batch operator)
    * @param delay        watermark delay AND bucket inactivity TTL,
    *                     e.g. "10 minutes"
    * @param simThreshold minimum signature-agreement fraction to emit
    */
  def dedupNearMinhash(
      docs: DataFrame,
      tsCol: String,
      idCol: String,
      textCol: String,
      delay: String,
      simThreshold: Double = 0.5): Dataset[NearDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val delayMs = parseDelayMs(delay)
    bandedSigs(docs, tsCol, idCol, textCol, delay)
      .groupByKey(_._4)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String,
         rows: Iterator[(java.sql.Timestamp, Long, Seq[Long], String)],
         state: GroupState[BandBucket]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = rows.toSeq.sortBy(r => (r._1.getTime, r._2))
            var entries = state.getOption.map(_.entries.toList).getOrElse(Nil)
            val hits = List.newBuilder[NearDupHit]
            batch.foreach { case (t, id, sig, _) =>
              entries.foreach { case (eid, esig, _) =>
                if (eid != id) {
                  var agree = 0
                  var i = 0
                  while (i < NumHashes) {
                    if (esig(i) == sig(i)) agree += 1
                    i += 1
                  }
                  val sim = agree.toDouble / NumHashes
                  if (sim >= simThreshold) hits += NearDupHit(eid, id, sim)
                }
              }
              if (entries.size < MaxBucketState && !entries.exists(_._1 == id))
                entries = entries :+ ((id, sig, t.getTime))
            }
            state.update(BandBucket(entries))
            val lastActivity = (batch.map(_._1.getTime) ++
              entries.map(_._3)).max
            state.setTimeoutTimestamp(lastActivity + delayMs)
            hits.result().iterator
          }
      }
  }

  /** Watermark-delay string → milliseconds (months rejected: ambiguous). */
  private def parseDelayMs(delay: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(delay))
    require(iv.months == 0, s"month-based delays are ambiguous in ms: $delay")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** The shared banding front half of the streaming near-dup operators:
    * minhash-12 signature, watermark, one row per LSH band with the band's
    * bucket key. Identical family and banding as the batch
    * dedup_minhash_lsh, so streaming and batch agree on what collides. */
  private def bandedSigs(
      docs: DataFrame, tsCol: String, idCol: String, textCol: String,
      delay: String): Dataset[(java.sql.Timestamp, Long, Seq[Long], String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("long").as("doc_id"),
        graft.exprs.functions.minhash12(split(col(textCol), "\\s+")).as("sig"))
      .withWatermark("ts", delay)
      .select(col("ts"), col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(NumBands - 1))).as("band"))
      .withColumn("bkey", concat_ws(":", col("band") +:
        (0 until RowsPerBand).map(i =>
          element_at(col("sig"), col("band") * RowsPerBand + lit(i + 1))): _*))
      .select(col("ts"), col("doc_id"), col("sig"), col("bkey"))
      .as[(java.sql.Timestamp, Long, Seq[Long], String)]
  }

  /** Streaming CLUSTER MEMBERSHIP: the batch dedup_clusters made
    * incremental — each document gets a cluster label (the min doc_id of
    * its near-dup group) as it arrives, instead of waiting for a batch
    * connected-components job over the full pair graph.
    *
    * Mechanism — a banded-state union-find approximation:
    *  - Band buckets shard the state store exactly like
    *    [[dedupNearMinhash]]; each bucket holds (id, sig, ts, label) per
    *    live document.
    *  - On arrival, the document is verified against the bucket's held
    *    signatures; the linked group's labels are UNIONED to their min
    *    (min of the arriving id and every linked entry's label), and the
    *    merge propagates through the bucket by label equality — within one
    *    bucket this is a true union-find over the collision history.
    *  - Every arrival emits its current label (singletons emit
    *    `(id, id)`), and any held entry whose label decreases re-emits.
    *    Labels are monotone non-increasing per (bucket, doc): the
    *    consumer's view is `min(cluster) GROUP BY doc_id` over the
    *    changelog — the natural upsert into a KV store (keep the smaller).
    *
    * Approximation contract (vs batch connected components):
    *  - EXACT for clique-shaped duplicate groups that share at least one
    *    band bucket — the dominant near-dup shape at high thresholds
    *    (copies of one source document all collide pairwise). The
    *    StreamingSpec replay proves partition agreement with the batch CC
    *    on such a corpus.
    *  - Chain-shaped components (A~B, B~C, A≁C) whose links land in
    *    DIFFERENT buckets may split across labels: buckets share no state,
    *    and there is no feedback edge in a streaming DAG to re-propagate a
    *    cross-bucket merge. [[reconcileClusterLabels]] CLOSES the split at
    *    the batch-reconciliation cadence (batch CC over the accumulated
    *    changelog — every split chain's links are in there); this
    *    operator remains the low-latency view between reconciles.
    *  - State is bounded exactly like [[dedupNearMinhash]]: event-time
    *    timeout per bucket + [[MaxBucketState]] cap. Docs beyond the cap
    *    still RECEIVE labels (they compare against held entries); they
    *    just don't extend the bucket.
    *
    * @param docs         streaming DataFrame
    * @param tsCol        event-time column (becomes the watermark column)
    * @param idCol        long document id column
    * @param textCol      document text (whitespace-tokenized, same
    *                     tokenization as the batch operator)
    * @param delay        watermark delay AND bucket inactivity TTL
    * @param simThreshold minimum signature-agreement fraction to link
    */
  def clusterLabelsStream(
      docs: DataFrame,
      tsCol: String,
      idCol: String,
      textCol: String,
      delay: String,
      simThreshold: Double = 0.5): Dataset[ClusterLabel] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val delayMs = parseDelayMs(delay)
    bandedSigs(docs, tsCol, idCol, textCol, delay)
      .groupByKey(_._4)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String,
         rows: Iterator[(java.sql.Timestamp, Long, Seq[Long], String)],
         state: GroupState[LabelBucket]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = rows.toSeq.sortBy(r => (r._1.getTime, r._2))
            var entries = state.getOption.map(_.entries.toList).getOrElse(Nil)
            val out = List.newBuilder[ClusterLabel]
            batch.foreach { case (t, id, sig, _) =>
              val linked = entries.filter { case (eid, esig, _, _) =>
                eid != id && {
                  var agree = 0; var i = 0
                  while (i < NumHashes) {
                    if (esig(i) == sig(i)) agree += 1; i += 1
                  }
                  agree.toDouble / NumHashes >= simThreshold
                }
              }
              val selfLabel = entries.collectFirst {
                case (eid, _, _, l) if eid == id => l
              }.getOrElse(id)
              val merged = if (linked.isEmpty) selfLabel
                else math.min(selfLabel, linked.map(_._4).min)
              // union by label equality: every entry sharing a linked
              // label was merged with that group earlier — pull it too
              val mergedLabels = (linked.map(_._4).toSet + selfLabel)
              entries = entries.map { case e @ (eid, esig, ets, el) =>
                val touch = eid == id || (linked.nonEmpty && mergedLabels(el))
                if (touch && el != merged) {
                  out += ClusterLabel(eid, merged)
                  (eid, esig, ets, merged)
                } else e
              }
              // the arriving doc always reports membership (even singleton)
              out += ClusterLabel(id, merged)
              if (entries.size < MaxBucketState && !entries.exists(_._1 == id))
                entries = entries :+ ((id, sig, t.getTime, merged))
            }
            state.update(LabelBucket(entries))
            val lastActivity = (batch.map(_._1.getTime) ++
              entries.map(_._3)).max
            state.setTimeoutTimestamp(lastActivity + delayMs)
            // one emission per (doc, label): monotone labels make earlier
            // duplicates within the batch redundant
            out.result().distinct.iterator
          }
      }
  }

  /** CLOSE [[clusterLabelsStream]]'s one documented asymmetry vs batch
    * connected components: chain-shaped groups (A~B, B~C, A≁C) whose
    * links land in DIFFERENT band buckets stay split in the stream —
    * buckets share no state and a streaming DAG has no feedback edge to
    * re-propagate a cross-bucket merge. The RECONCILE runs batch CC over
    * the stream's own accumulated label changelog: every emitted
    * (doc_id, label) row is a PROVEN same-cluster link (the label is
    * another document this one was transitively linked to inside some
    * bucket), and every verified pairwise link was observed in SOME
    * bucket (that is LSH's candidate-generation property, identical to
    * the batch operator's) — so the transitive closure over changelog
    * rows IS the batch components over the stream's verified pair graph.
    *
    * Run it at the batch-reconciliation cadence (the system-of-record
    * job): stream labels give the low-latency view; the reconcile
    * converges them. Input: the changelog sink's (doc_id, cluster) rows —
    * ALL emissions, duplicates and superseded labels included (extra rows
    * are extra edges inside one component — harmless). Output one row per
    * doc: (doc_id, cluster = min doc_id of the converged component), the
    * batch dedup_clusters label convention.
    *
    * Scale shape: edges ≤ distinct changelog rows (each doc emits once
    * per label DECREASE — bounded by its merge count, not stream volume),
    * and the CC is the same checkpointed per-round-bounded operator the
    * batch pipeline runs. */
  def reconcileClusterLabels(changelog: DataFrame): DataFrame = {
    val c = changelog
      .select(col("doc_id").cast("long").as("doc_id"),
        col("cluster").cast("long").as("cluster"))
    val vertices = c.select(col("doc_id").as("id"))
      .union(c.select(col("cluster").as("id"))).distinct()
    val edges = c.filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id").as("src"), col("cluster").as("dst"))
      .distinct()
    graft.operators.ConnectedComponents.run(vertices, edges)
      .select(col("id").as("doc_id"), col("component").as("cluster"))
  }

  /** Streaming token-id packing: COMPLETED fixed-length training rows of
    * REAL BPE ids materialize continuously as documents arrive — the
    * batch pack_token_sequences made incremental, and the composition of
    * [[tokenizeBpeStream]] (stateless encode from the persisted model)
    * with the pack state machine. A trainer can tail the output sink;
    * every emitted row is final and exactly `seqLen` ids.
    *
    * Semantics vs batch (deliberate, documented divergence): the batch
    * operator orders each bucket by a deterministic md5 shuffle of the
    * WHOLE corpus; a stream cannot know the corpus, so packing order is
    * ARRIVAL order ((event time, doc_id) within a micro-batch — the
    * operator is deterministic under replay of the same stream). Fixed
    * row length, EOS-after-every-document, and pad-only-on-the-tail are
    * the invariants shared with batch; the tail here is a bucket that
    * TIMES OUT (watermark passes its last activity + delay): its partial
    * sequence flushes once, padded with `padId`, and the bucket's state
    * is freed — a quiet bucket costs nothing forever.
    *
    * State bound: ONE partial sequence (< seqLen ints) + one Long per
    * live bucket — seqLen × 4 bytes × buckets, regardless of how many
    * documents ever flowed through.
    *
    * @param docs     streaming DataFrame
    * @param tsCol    event-time column (watermark + timeout clock)
    * @param idCol    long document id (bucket = id % buckets, the batch rule)
    * @param textCol  document text
    * @param modelDir persisted [[graft.operators.BpeModel]] artifact
    * @param buckets  independent pack streams (batch default 32)
    * @param seqLen   ids per training row (batch default 128)
    * @param eosId    end-of-document id appended after every document.
    *                 Default −1 = DERIVED FROM THE ALPHABET (az → 34 =
    *                 26 + 8 merges, bytes → 264) — the a-z ids 34/35 are
    *                 valid BYTE ids ('"' and '#') under alphabet="bytes",
    *                 so a fixed default there would pack separators
    *                 indistinguishable from content bytes with no error.
    * @param padId    tail-flush padding id (−1 = derived: az 35, bytes 265)
    * @param delay    watermark delay AND bucket inactivity TTL
    * @param alphabet "az" (default) or "bytes" — which tokenizer twin
    *                 encodes the stream; the pack state machine is
    *                 alphabet-blind
    */
  def packTokenIdsStream(
      docs: DataFrame,
      tsCol: String,
      idCol: String,
      textCol: String,
      modelDir: String,
      buckets: Int = 32,
      seqLen: Int = 128,
      eosId: Int = -1,
      padId: Int = -1,
      delay: String = "10 minutes",
      alphabet: String = "az"): Dataset[PackedTokenSeq] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val delayMs = parseDelayMs(delay)
    val eos = if (eosId >= 0) eosId
      else if (alphabet == "bytes") 264 else 34
    val pad = if (padId >= 0) padId
      else if (alphabet == "bytes") 265 else 35
    val tokenized = (alphabet match {
      case "az" => tokenizeBpeStream(docs, textCol, modelDir)
      case "bytes" => tokenizeBpeBytesStream(docs, textCol, modelDir)
      case other => throw new IllegalArgumentException(
        s"alphabet must be az or bytes, got '$other'")
    })
      .select(col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("long").as("doc_id"),
        (col(idCol).cast("long") % buckets).as("bucket"),
        col("token_ids"))
      .withWatermark("ts", delay)
      .as[(java.sql.Timestamp, Long, Long, Seq[Int])]
    tokenized
      .groupByKey(_._3)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (bucket: Long,
         rows: Iterator[(java.sql.Timestamp, Long, Long, Seq[Int])],
         state: GroupState[PackIdBuf]) =>
          if (state.hasTimedOut) {
            // tail flush: the ONLY place padding exists (batch invariant).
            // The sequence COUNTER survives the flush — state.remove()
            // would restart seq_id at 0 on revival and duplicate
            // (bucket, seq_id) keys at the sink. Keeping the emptied
            // state is free: groups number at most `buckets` by
            // construction (bucket = id % buckets), so boundedness never
            // depended on the TTL — only the flush semantics do.
            val out = state.getOption.filter(_.buf.nonEmpty).map { st =>
              state.update(PackIdBuf(st.seqId + 1, Vector.empty))
              PackedTokenSeq(bucket, st.seqId, st.buf.length.toLong,
                (seqLen - st.buf.length).toLong,
                st.buf ++ Seq.fill(seqLen - st.buf.length)(pad))
            }
            // park the timeout one delay ahead — the stale timestamp is
            // already past the watermark and would re-fire every batch
            state.setTimeoutTimestamp(
              state.getCurrentWatermarkMs() + delayMs)
            out.iterator
          } else {
            val batch = rows.toSeq.sortBy(r => (r._1.getTime, r._2))
            var st = state.getOption.getOrElse(PackIdBuf(0L, Vector.empty))
            var buf = st.buf.toVector
            var seqId = st.seqId
            val out = List.newBuilder[PackedTokenSeq]
            batch.foreach { case (_, _, _, ids) =>
              buf = buf ++ ids :+ eos
              while (buf.length >= seqLen) {
                out += PackedTokenSeq(
                  bucket, seqId, seqLen.toLong, 0L, buf.take(seqLen))
                buf = buf.drop(seqLen)
                seqId += 1
              }
            }
            state.update(PackIdBuf(seqId, buf))
            state.setTimeoutTimestamp(
              batch.map(_._1.getTime).max + delayMs)
            out.result().iterator
          }
      }
  }

  /** Streaming ANN serving: a stream of query vectors probed against a
    * PERSISTED IVF-PQ index ([[graft.operators.PqIndex]]) — approximate
    * top-k retrieval as a STREAM-STATIC join, the online half of the
    * batch ann_ivf_pq path.
    *
    * Shape, sized for a 100 TB index:
    *  - per query row, the nProbe nearest coarse cells come from ONE
    *    fused expression over the centroid reference object (no
    *    broadcast-join against a centroid table), then explode to
    *    (query, cell) rows;
    *  - the stream-static inner join on `cell` is STATELESS (no
    *    watermark state: the static side is just re-read per
    *    micro-batch) and partition-prunes a loaded index (pq_codes is
    *    cell-partitioned on disk), so each micro-batch reads only the
    *    probed cells' codes;
    *  - scoring reads CODES ONLY: [[graft.exprs.PqAdcCosine]] computes
    *    the residual ADC cosine in one codegen pass — fold orders
    *    identical to the batch LUT path, so stream and batch scores are
    *    bit-identical (spec-pinned);
    *  - per-query top-k is a windowed aggregate (sort_array + slice over
    *    the collected candidate structs, score desc / n_id asc — the
    *    batch rank order), emitted on watermark close in append mode.
    *    Candidate volume per query is bounded by the probed cells' list
    *    sizes, the same bound the batch probe carries.
    *
    * @param queries   streaming DataFrame of (event-time, id, vector)
    * @param tsCol     event-time column
    * @param idCol     long query id column
    * @param vecCol    array<double> query vector column
    * @param idx       built or loaded PQ index (static side)
    * @param nProbe    coarse cells probed per query
    * @param topK      neighbors returned per query
    * @param windowLen tumbling-window length, e.g. "10 seconds"
    * @param delay     watermark delay
    */
  def annProbeStream(
      queries: DataFrame,
      tsCol: String,
      idCol: String,
      vecCol: String,
      idx: graft.operators.PqIndex,
      nProbe: Int,
      topK: Int,
      windowLen: String,
      delay: String): DataFrame = {
    val t = idx.scoreTable
    val probes = queries
      .select(col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("long").as("q_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withWatermark("ts", delay)
      .withColumn("cell",
        explode(graft.exprs.functions.ivf_nearest_cells(col("qv"), t, nProbe)))
    val cand = idx.codes.select(col("vec_id").as("n_id"), col("cell"),
      col("nrm"), col("codes"))
    probes.join(cand, Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("adc_cosine", graft.exprs.functions.pq_adc_cosine(
        col("qv"), col("cell"), col("codes"), col("nrm"), t))
      .groupBy(window(col("ts"), windowLen), col("q_id"))
      .agg(slice(sort_array(collect_list(struct(
        (-col("adc_cosine")).as("neg"), col("n_id")))), 1, topK).as("top"))
      .select(col("window"), col("q_id"),
        expr("transform(top, x -> x.n_id)").as("top_ids"),
        expr("transform(top, x -> -x.neg)").as("top_scores"))
  }

  /** Streaming per-source admission cap: keep the FIRST `cap` documents
    * per source, drop the rest — the batch cap_per_source's intent under
    * streaming constraints. Selection necessarily diverges from batch
    * (documented): the batch operator keeps a deterministic HASH-ranked
    * top-N over the whole corpus (order-free, replayable); a stream
    * cannot rank what hasn't arrived, so it admits by ARRIVAL order —
    * deterministic under replay of the same stream, and the right
    * semantics for an ingest quota ("stop taking from this crawl after
    * N"). State: ONE Long per live source, no timeout needed — state is
    * bounded by source cardinality, not corpus size.
    *
    * @param cap max documents admitted per source value */
  def capPerSourceStream(
      docs: DataFrame, tsCol: String, idCol: String, sourceCol: String,
      cap: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("long").as("doc_id"),
        col(sourceCol).cast("string").as("source"))
      .as[(java.sql.Timestamp, Long, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (source: String,
         rows: Iterator[(java.sql.Timestamp, Long, String)],
         state: GroupState[SourceCount]) =>
          val batch = rows.toSeq.sortBy(r => (r._1.getTime, r._2))
          var n = state.getOption.map(_.n).getOrElse(0L)
          val kept = batch.takeWhile { _ => n < cap && { n += 1; true } }
          state.update(SourceCount(n))
          kept.map { case (ts, id, _) => (id, source, ts) }.iterator
      }
      .toDF("doc_id", "source", "ts")
  }

  /** Streaming train/val/test assignment: the batch split_corpus made
    * incremental — STATELESS, because the assignment is a pure
    * content-independent hash of the id (the same shared
    * [[graft.queries.TextAnalysis.splitBucketOf]]/`splitOf` derivation,
    * so a doc gets the identical split whether it flows through the
    * stream or a batch backfill — the property that makes the split safe
    * to compute in two places at all). */
  def splitStream(docs: DataFrame, idCol: String): DataFrame =
    docs
      .withColumn("bucket",
        graft.queries.TextAnalysis.splitBucketOf(col(idCol)))
      .withColumn("split",
        graft.queries.TextAnalysis.splitOf(col("bucket")))

  /** Streaming source-weight mixing: the batch mix_corpus made
    * incremental — stateless fractional upsampling, `floor(w)` copies
    * plus one more iff the id's hash fraction falls under `frac(w)`
    * (weights in HALVES, integer math, the batch operator's exact
    * arithmetic). Deterministic across runs and engines: a replayed
    * document emits the same copies.
    *
    * @param weightHalves integer column of 2× the source weight (e.g. 3
    *                     ⇒ weight 1.5: one copy always, a second for the
    *                     half of id-space under the hash threshold) */
  def mixStream(
      docs: DataFrame, idCol: String, weightHalves: Column): DataFrame =
    docs
      .withColumn("w2", weightHalves)
      .withColumn("hex16",
        graft.queries.TextAnalysis.splitBucketOf(col(idCol)))
      .withColumn("n_copies", expr("w2 DIV 2") +
        when(col("w2") % 2 === 1 && col("hex16") < 32768L, 1L)
          .otherwise(0L))
      .filter(col("n_copies") > 0)
      .withColumn("copy_idx",
        explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("w2", "hex16")

  /** Streaming perplexity filtering (the CCNet-style LM filter in the
    * ingest tier): the batch text_perplexity_bigram's model applied per
    * row — train on trusted history
    * ([[graft.queries.TextAnalysis.bigramNllTable]]), score the live
    * stream, threshold on avg_nll downstream. Stateless: the bigram→NLL
    * map rides the plan as one reference object
    * ([[graft.exprs.BigramNllScore]] — same tokenization, bigram key,
    * seen-only scoring, and fixed-point contracts as the batch query,
    * bit-parity spec'd). Scores are comparable across batch and stream
    * by construction, so ONE threshold governs both tiers. */
  def perplexityStream(
      docs: DataFrame, textCol: String,
      model: graft.exprs.BigramNllTable): DataFrame =
    docs
      .withColumn("pp",
        graft.exprs.functions.bigram_nll_score(col(textCol), model))
      .withColumn("n_bigrams", col("pp.n_bigrams"))
      .withColumn("nll_scaled", col("pp.nll_scaled"))
      .withColumn("avg_nll",
        when(col("n_bigrams") > 0,
          col("nll_scaled").cast("double")
            / graft.queries.TextAnalysis.NllScale.toDouble
            / col("n_bigrams").cast("double"))
          .otherwise(lit(0.0)))
      .drop("pp")

  /** Streaming quality classification: the batch classify_quality_nb's
    * learned model applied per row — train once in batch
    * ([[graft.queries.TextAnalysis.nbQualityModelTable]]), score the live
    * stream forever. Stateless: the |w|-top-K weight map + prior ride the
    * plan as one reference object ([[graft.exprs.NbQualityScore]] — the
    * same tokenization, unseen-token, and fixed-point contracts as the
    * batch scorer, spec-pinned to bit equality on the training corpus). */
  def classifyQualityStream(
      docs: DataFrame, textCol: String,
      model: graft.exprs.NbModelTable): DataFrame =
    docs
      .withColumn("nb",
        graft.exprs.functions.nb_quality_score(col(textCol), model))
      .withColumn("n_tokens", col("nb.n_tokens"))
      .withColumn("score_scaled", col("nb.score_scaled"))
      .withColumn("pred", (col("score_scaled") > 0).cast("int"))
      .drop("nb")

  /** Streaming DSIR scoring: the batch dsir_weights model applied per row
    * — fit the λ table on the raw+target corpora in batch
    * ([[graft.queries.TextAnalysis.dsirTable]]), score the live stream,
    * threshold / Gumbel-sample downstream. Stateless: the B-bucket λ
    * array rides the plan as one reference object
    * ([[graft.exprs.DsirScoreExpr]] — same tokenization, bigram key,
    * md5 bucket, and fixed-point contracts as the batch query, bit-parity
    * spec'd on the training corpus, where every bucket is seen by
    * construction; stream-only docs may hit absent buckets, which score
    * as the batch inner join does: not at all). */
  def dsirScoreStream(
      docs: DataFrame, textCol: String,
      model: graft.exprs.DsirScoreTable): DataFrame =
    docs
      .withColumn("ds",
        graft.exprs.functions.dsir_score(col(textCol), model))
      .withColumn("n_feats", col("ds.n_feats"))
      .withColumn("weight_scaled", col("ds.weight_scaled"))
      .drop("ds")

  /** Streaming anomaly scoring: the batch events_anomaly's per-type
    * z-score applied to a LIVE event stream against a STATIC baseline —
    * per-type integer moments computed by a batch job over history
    * ([[graft.queries.EventLogQueries.anomalyBaseline]]), broadcast into
    * a stateless stream-static join, scored by the SAME folded-algebra
    * projection ([[graft.queries.EventLogQueries.withAnomalyZ]] — one
    * correctly-rounded division + sqrt, so stream and batch z-scores are
    * bit-identical for the same baseline, spec-pinned). Baseline drift is
    * the batch job's cadence decision, exactly like the NB classifier and
    * the PQ codebooks: train/fit on history, serve the stream, refresh
    * periodically.
    *
    * @param events   streaming DataFrame with the value column
    * @param valueCol 2-decimal numeric column (×100 is exact in BIGINT)
    * @param baseline static (event_type, n, s1, s2) moments
    */
  def anomalyStream(
      events: DataFrame, valueCol: String, baseline: DataFrame): DataFrame =
    graft.queries.EventLogQueries.withAnomalyZ(
      events
        .withColumn("v100", round(col(valueCol) * 100).cast("long"))
        .join(broadcast(baseline), "event_type"))
      .drop("v100", "a", "var_n2", "n", "s1", "s2")

  /** Streaming lexical search: a stream of keyword queries served from the
    * PERSISTED [[graft.operators.SearchIndex]] — the lexical twin of
    * [[annProbeStream]]. Each query row's text splits to terms, the
    * stream-static join reads the postings (token-keyed), and two
    * CHAINED windowed aggregations — per-(query, doc) score sum, then
    * per-query top-k — emit on watermark close. Scores are the exact
    * BIGINT `Σ cnt × idf_q6` the batch search computes, so stream and
    * batch answers are identical for the same terms (spec-pinned).
    *
    * SNAPSHOT semantics: the index stores no precomputed IDF (df and
    * corpus totals are query-time-exact in batch), so the scored postings
    * here are a derived model — the caller creates it ONCE
    * ([[graft.operators.SearchIndex.snapshot]] persists it, `close()`
    * unpersists — the explicit lifecycle replacing the fire-and-forget
    * persist that leaked a cached plan per constructed stream), each
    * micro-batch joins against the cached snapshot, and N streams may
    * share one snapshot. Documents appended to the index after the
    * snapshot was taken are served after a snapshot refresh / stream
    * restart — or LIVE via [[LiveSearchServer]], which re-lists the
    * committed batches per micro-batch; the batch search is always exact.
    *
    * @param queries   streaming DataFrame of (event-time, id, query text)
    * @param tsCol     event-time column
    * @param idCol     long query id column
    * @param qCol      whitespace-separated query terms column
    * @param snap      scoring snapshot ([[graft.operators.SearchIndex.snapshot]]),
    *                  mode "tfidf" or "bm25" — BM25's per-(doc, term)
    *                  contribution is fully precomputable for a snapshot,
    *                  so both modes are one join + exact BIGINT sums and
    *                  both match their batch search bit-for-bit
    * @param topK      documents returned per query
    * @param windowLen tumbling-window length
    * @param delay     watermark delay
    */
  def searchStream(
      queries: DataFrame,
      tsCol: String,
      idCol: String,
      qCol: String,
      snap: graft.operators.SearchSnapshot,
      topK: Int,
      windowLen: String,
      delay: String): DataFrame = {
    require(snap.mode == "tfidf" || snap.mode == "bm25",
      s"searchStream needs a tfidf or bm25 snapshot, got '${snap.mode}'")
    val terms = queries
      .select(col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("long").as("q_id"),
        // distinct BEFORE exploding: the batch search's isin filter
        // inherently dedups repeated query terms — "vector vector" must
        // not double-count, or the batch-identical-scores contract breaks
        explode(array_distinct(split(col(qCol), "\\s+"))).as("token"))
      .withWatermark("ts", delay)
    terms
      .join(snap.df, Seq("token"))
      .groupBy(window(col("ts"), windowLen), col("q_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("score"))
      .groupBy(col("window"), col("q_id"))
      .agg(slice(sort_array(collect_list(struct(
        (-col("score")).as("neg"), col("doc_id")))), 1, topK).as("top"))
      .select(col("window"), col("q_id"),
        expr("transform(top, x -> x.doc_id)").as("top_ids"),
        expr("transform(top, x -> -x.neg)").as("top_scores"))
  }

  /** Streaming EXACT-PHRASE search: the positional twin of
    * [[searchStream]] — each query row carries a whole phrase, the
    * stream-static join on its distinct tokens pulls the candidate
    * (doc, token, positions) rows from the pruned postings snapshot, a
    * windowed aggregate rebuilds each candidate's token → positions map,
    * and the fused [[graft.exprs.PhraseOccurrences]] kernel runs the
    * SAME start-position fold the batch searchPhrase plans with Column
    * HOFs — per-row, because the fold's shape here depends on each
    * query's own phrase (data, not plan structure). Occurrence counts
    * are exact integers, so stream ≡ batch bit-for-bit (spec-pinned).
    * Snapshot lifecycle as [[searchStream]] (mode "phrase").
    *
    * @param queries   streaming DataFrame of (event-time, id, phrase text)
    * @param tsCol     event-time column
    * @param idCol     long query id column
    * @param qCol      whitespace-separated phrase column (token order IS
    *                  the phrase)
    * @param snap      positional snapshot
    *                  ([[graft.operators.SearchIndex.snapshot]], mode "phrase")
    * @param topK      documents returned per query
    * @param windowLen tumbling-window length
    * @param delay     watermark delay */
  def searchPhraseStream(
      queries: DataFrame,
      tsCol: String,
      idCol: String,
      qCol: String,
      snap: graft.operators.SearchSnapshot,
      topK: Int,
      windowLen: String,
      delay: String): DataFrame = {
    require(snap.mode == "phrase",
      s"searchPhraseStream needs a phrase snapshot, got '${snap.mode}'")
    val q = queries
      .select(col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("long").as("q_id"),
        split(col(qCol), "\\s+").as("phrase"))
      .withColumn("token", explode(array_distinct(col("phrase"))))
      .withWatermark("ts", delay)
    q.join(snap.df, Seq("token"))
      .groupBy(window(col("ts"), windowLen), col("q_id"), col("doc_id"),
        col("phrase"))
      .agg(map_from_entries(
        collect_list(struct(col("token"), col("pos")))).as("m"))
      .withColumn("n_occurrences",
        graft.exprs.functions.phrase_occurrences(col("phrase"), col("m")))
      .filter(col("n_occurrences") > 0)
      .groupBy(col("window"), col("q_id"))
      .agg(slice(sort_array(collect_list(struct(
        (-col("n_occurrences")).as("neg"), col("doc_id")))), 1, topK)
        .as("top"))
      .select(col("window"), col("q_id"),
        expr("transform(top, x -> x.doc_id)").as("top_ids"),
        expr("transform(top, x -> -x.neg)").as("top_counts"))
  }

  /** Streaming BPE tokenization: per-document token-id sequences from the
    * PERSISTED merge-table artifact ([[graft.operators.BpeModel]]) — the
    * batch tokenize_bpe_ids made incremental, and the natural consumer of
    * train_bpe's saved model: train once in batch, tokenize the live
    * stream forever.
    *
    * Stateless projection — no watermark, no state store: the model loads
    * ONCE at query definition (model-sized: one row per learned merge)
    * and rides the plan as a codegen reference object
    * ([[graft.exprs.BpeEncodeIds]] — the same lowercase → `[a-z]+` →
    * merge-chain → id-scheme contract as the batch path, fused into one
    * native pass per row). Latency is per-row compute only, which is what
    * a tokenizing ingest tier needs; the batch path keeps its
    * distinct-vocabulary broadcast amortization for backfills.
    *
    * @param docs     streaming DataFrame
    * @param textCol  document text column
    * @param modelDir [[graft.operators.BpeModel]] artifact dir (latest
    *                 version wins, matching BpeModel.load)
    */
  def tokenizeBpeStream(
      docs: DataFrame, textCol: String, modelDir: String): DataFrame = {
    val merges = graft.operators.BpeModel.load(docs.sparkSession, modelDir)
    docs
      .withColumn("token_ids",
        graft.exprs.functions.bpe_encode_ids(col(textCol), merges))
      .withColumn("n_ids", size(col("token_ids")).cast("long"))
  }

  /** BYTE-alphabet twin of [[tokenizeBpeStream]]: the same stateless
    * per-row projection, with the byte-mode kernel (whitespace words,
    * UTF-8 byte base symbols, ids 0-255 + 255+round merges) over a
    * train_bpe_bytes model artifact — so the live tokenizer sees digits,
    * punctuation, case, and non-Latin text exactly like the batch
    * tokenize_bpe_ids_bytes path (bit-parity spec-pinned). */
  def tokenizeBpeBytesStream(
      docs: DataFrame, textCol: String, modelDir: String): DataFrame = {
    val merges = graft.operators.BpeModel.load(docs.sparkSession, modelDir)
    docs
      .withColumn("token_ids",
        graft.exprs.functions.bpe_encode_byte_ids(col(textCol), merges))
      .withColumn("n_ids", size(col("token_ids")).cast("long"))
  }

  /** GPT-2-complete twin of [[tokenizeBpeBytesStream]]: same stateless
    * per-row projection with the gpt2 pre-tokenizer mode (contractions,
    * space-prefix, whitespace runs — lossless including whitespace) over
    * a train_bpe_gpt2 model artifact. Bit-parity with the batch
    * tokenize_bpe_ids_gpt2 path is spec-pinned. */
  def tokenizeBpeGpt2Stream(
      docs: DataFrame, textCol: String, modelDir: String): DataFrame = {
    val merges = graft.operators.BpeModel.load(docs.sparkSession, modelDir)
    docs
      .withColumn("token_ids",
        graft.exprs.functions.bpe_encode_gpt2_ids(col(textCol), merges))
      .withColumn("n_ids", size(col("token_ids")).cast("long"))
  }

  /** Streaming benchmark decontamination: drop documents sharing any 3-gram
    * shingle with a STATIC benchmark corpus, as a stateless projection — the
    * batch `decontaminate_bloom` made streaming. The benchmark compiles ONCE
    * at query definition into a 2^20-bit Bloom bitmap (two md5-slice hashes
    * per shingle, 32-bit words so every bit test is exact positive-integer
    * arithmetic) embedded as an array literal: each micro-batch row probes
    * the filter inside codegen — no join, no state, no watermark, and the
    * filter ships to every task like any other literal. False positives
    * (standard Bloom semantics) drop a clean document; false negatives
    * cannot happen, which is the correct failure direction for
    * decontamination.
    *
    * @param docs         streaming DataFrame
    * @param textCol      document text column (whitespace-tokenized)
    * @param benchmark    STATIC benchmark corpus
    * @param benchTextCol benchmark text column
    */
  def decontaminateStream(
      docs: DataFrame, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      bits: Long = graft.operators.BloomSketch.DefaultBits): DataFrame = {
    import graft.operators.BloomSketch
    BloomSketch.hexChars(bits) // validate the shape early
    // The streaming probe EMBEDS the bitmap as a plan literal (below) —
    // that stops being sane when the array itself is megabytes riding
    // every task's serialized plan. 2^24 bits (= 2^19 Longs ≈ 4 MiB) is
    // the documented ceiling; beyond it, use the batch mask-relation join
    // (decontaminate_bloom) whose broadcast scales independently. The
    // floor exists because the bitmap is indexed in 32-bit words: 16 bits
    // (the smallest power of 16) would allocate ZERO words.
    require(bits >= 256 && bits <= MaxStreamBloomBits,
      s"decontaminateStream embeds the filter as a $bits-bit literal; " +
        s"supported range is [256, $MaxStreamBloomBits] bits — use the " +
        "batch mask-relation path (decontaminateBloom) for larger filters")
    val WordBits = 32
    val Words = (bits / WordBits).toInt
    // sketch build: bounded at `Words` rows whatever the benchmark size
    // (collecting a fixed-size sketch is the documented exception to the
    // no-collect rule — it IS the broadcast); hash slicing and bit layout
    // shared with the batch decontaminate_bloom via BloomSketch
    val masks = BloomSketch.maskRelation(
      benchmark
        .select(explode(graft.exprs.functions.ngram_shingles(
          split(col(benchTextCol), "\\s+"))).as("sng"))
        .select(md5(col("sng")).as("h"))
        .distinct(),
      WordBits, bits).collect()
    val bitmap = new Array[Long](Words)
    masks.foreach(r => bitmap(r.getLong(0).toInt) = r.getLong(1))
    val bm = typedLit(bitmap.toSeq)
    // 32-bit words keep every mask positive, so the bit test is exact
    // double-free-of-rounding arithmetic: floor(mask / 2^bit) % 2
    def bitSet(p: Column): Column = {
      val mask = element_at(bm, floor(p / WordBits).cast("int") + 1)
      val bit = pow(lit(2.0), pmod(p, lit(WordBits.toLong))).cast("long")
      pmod(floor(mask / bit).cast("long"), lit(2L)) === 1L
    }
    // coalesce(…, false): a null text has no shingles and CANNOT be
    // contaminated — without the guard the null predicate would silently
    // drop exactly the rows the filter has no evidence against
    docs.filter(!coalesce(exists(
      graft.exprs.functions.ngram_shingles(split(col(textCol), "\\s+")),
      s => {
        val h = md5(s)
        bitSet(BloomSketch.pos1(h, bits)) && bitSet(BloomSketch.pos2(h, bits))
      }), lit(false)))
  }

  /** Streaming decontamination against the PERSISTED registry
    * ([[graft.operators.DecontamRegistry]]) — the live-serving form of
    * [[decontaminateStream]]: instead of embedding one static benchmark
    * as a plan literal, each micro-batch RE-LOADS the registry manifest
    * (a file stat + ≤ bits/64-row fold — the LiveServers refresh
    * discipline), so a benchmark registered mid-stream gates the very
    * next micro-batch with no restart. The sink receives the batch's
    * CLEAN documents (flagged docs dropped — same criterion as the
    * registry's flag card: any shingle with both Bloom positions set).
    * `sink` must be idempotent per micro-batch (the standard
    * foreachBatch replay contract).
    *
    * `embCol` (round 15) switches on the registry's SEMANTIC tier: rows
    * whose embedding clears `tau` exact cosine against any REGISTERED
    * benchmark vector ([[graft.operators.DecontamRegistry.flagSemantic]])
    * are dropped too — and because the registry re-loads per batch, an
    * embedding benchmark registered mid-stream gates the very next
    * micro-batch exactly like a shingle registration. Rows without an
    * embedding (null) carry no semantic evidence and pass that leg. */
  def decontaminateRegistryStream(
      docs: DataFrame, idCol: String, textCol: String,
      regDir: String, checkpointDir: String,
      embCol: Option[String] = None,
      tau: Double = graft.queries.Dedup.SemanticDecontamTau)(
      sink: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val reg = graft.operators.DecontamRegistry.load(regDir)
        val base = Seq(col(idCol).cast("long").as("doc_id"),
          col(textCol).cast("string").as("text"))
        val b = batch.select(base ++ embCol.map(c =>
          col(c).cast("array<double>").as("emb")): _*)
        val flagged = graft.operators.DecontamRegistry
          .flag(s, reg, b).select("doc_id")
        val clean0 = b.join(flagged, Seq("doc_id"), "left_anti")
        val clean = embCol match {
          case None => clean0
          case Some(_) =>
            val semFlagged = graft.operators.DecontamRegistry
              .flagSemantic(s, reg,
                b.filter(col("emb").isNotNull), "doc_id", "emb", tau)
              .select("doc_id")
            clean0.join(semFlagged, Seq("doc_id"), "left_anti")
        }
        sink(clean)
      }
      .start()

  /** Ceiling for [[decontaminateSemanticStream]]'s plan-literal
    * benchmark: beyond it the embedded vectors ride every serialized
    * task (the streaming-Bloom discipline) — and per-row cost is one
    * cosine per benchmark row, so a corpus-scale "benchmark" belongs on
    * the batch decontaminate_semantic / dedup_semantic_pq paths. */
  private val MaxStreamBenchRows = 4096

  /** Streaming SEMANTIC decontamination (round 13): the embedding-level
    * leakage check at ingest — each arriving document's embedding is
    * scored against the (small, static) benchmark set, and every
    * benchmark item it clears `tau` against emits a hit row
    * (vec_id, b_id, cosine). STATELESS: the benchmark embeds as a plan
    * literal (bounded by [[MaxStreamBenchRows]]), the per-row work is a
    * projection, no aggregation state anywhere — append-safe without a
    * watermark. The cosine is the SAME cosinePre expression the batch
    * entry plans, over the same per-vector norms, so stream hits and
    * the batch entry's pre-aggregation hits are bit-identical
    * (StreamingSpec replays the corpus and pins it; the batch entry's
    * per-doc (n_bench_hits, max_cos) aggregate is exactly a group-by
    * over these rows). Emitting the OFFENDER id is the ingest-side
    * bonus the batch audit aggregates away. */
  def decontaminateSemanticStream(
      docs: DataFrame, idCol: String, vecCol: String,
      bench: DataFrame, benchIdCol: String, benchVecCol: String,
      tau: Double): DataFrame = {
    import graft.queries.Similarity
    val bRows = bench
      .select(col(benchIdCol).cast("long").as("b_id"),
        col(benchVecCol).cast("array<double>").as("bv"))
      .withColumn("bn", Similarity.norm(col("bv")))
      .collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
    require(bRows.length > 0, "empty benchmark set")
    require(bRows.length <= MaxStreamBenchRows,
      s"benchmark has ${bRows.length} rows — beyond the " +
        s"$MaxStreamBenchRows plan-literal ceiling; use the batch " +
        "decontaminate_semantic (broadcast relation) instead")
    val benchLit = typedLit(bRows.toSeq)
    docs
      .select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
      .withColumn("b", explode(benchLit))
      .withColumn("cosine", Similarity.cosinePre(
        col("v"), col("b._2"), col("nrm"), col("b._3")))
      .filter(col("cosine") >= tau)
      .select(col("vec_id"), col("b._1").as("b_id"), col("cosine"))
  }

  /** Streaming SPAN dedup — the last batch/stream asymmetry closed: the
    * batch dedup_span_exact needs corpus-wide chunk counts, which no
    * bounded stream state can hold exactly, so the twin flags repeated
    * spans AT INGEST through a Bloom filter over the stream's OWN chunk
    * history (decontaminateStream's machinery pointed inward).
    *
    * Chunking is the batch operator's exact grid: non-overlapping
    * [[graft.queries.Dedup.SpanTokens]]-token chunks of the whitespace
    * tokens, md5 over the space-joined slice — so stream and batch agree
    * on what a span IS. Each chunk routes to a shard by a digest slice
    * DISJOINT from the two Bloom position slices (independence keeps the
    * per-shard filter at its nominal FP rate); the
    * shard's state is one FIXED-size bitmap (bits/shard × shards total,
    * forever — state does not grow with stream volume). A chunk whose two
    * Bloom positions (the BloomSketch hex-prefix slices) are already set
    * emits a [[SpanDupFlag]]; then its bits are set.
    *
    * Guarantee direction (the one that matters for hygiene, and the spec
    * gate): NO false negatives — a chunk hash seen before is ALWAYS
    * flagged on re-occurrence, so the stream's flagged-hash set is a
    * SUPERSET of the batch operator's duplicated-chunk set over the same
    * data (StreamingSpec replays a corpus and asserts it). False
    * positives flag a clean first occurrence (standard Bloom semantics);
    * saturation of the fixed bitmap RAISES the FP rate but can never
    * create a false negative. The batch job stays the system-of-record;
    * a long-running intake rotates state by restarting on a fresh
    * checkpoint at its batch-reconciliation cadence.
    *
    * @param docs       streaming DataFrame
    * @param tsCol      event-time column (micro-batch ordering key)
    * @param idCol      long document id column
    * @param textCol    document text (whitespace-tokenized)
    * @param spanTokens tokens per chunk (default: the batch SpanTokens)
    * @param bloomBits  bits per shard bitmap — BloomSketch's power-of-16
    *                   contract; capacity scales as shards × bloomBits
    * @param shards     state shards (parallelism × capacity fan-out) */
  def spanDedupStream(
      docs: DataFrame,
      tsCol: String,
      idCol: String,
      textCol: String,
      spanTokens: Int = graft.queries.Dedup.SpanTokens,
      bloomBits: Long = 1L << 16,
      shards: Int = 64): Dataset[SpanDupFlag] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hc = graft.operators.BloomSketch.hexChars(bloomBits)
    // the shard route must be INDEPENDENT of the two Bloom position
    // slices (digest chars [1, hc] and [hc+1, 2hc]): routing by the p1
    // slice itself would let p1 take only bloomBits/shards values within
    // a shard, saturating that layer ~shards× faster than designed. Four
    // hex chars AFTER both position slices keep the route disjoint.
    require(2 * hc + 4 <= 32,
      s"bloomBits $bloomBits leaves no md5 hex for disjoint shard routing")
    require(shards >= 1 && shards <= 65536, s"shards $shards outside [1, 65536]")
    val words = (bloomBits / 64L).toInt
    val chunks = docs
      .select(col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("long").as("doc_id"),
        split(col(textCol), "\\s+").as("toks"))
      .filter(size(col("toks")) >= spanTokens)
      .select(col("ts"), col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          expr(s"size(toks) DIV $spanTokens") - 1)).as("ci"))
      .select(col("ts"), col("doc_id"), col("ci").cast("int").as("ci"),
        md5(concat_ws(" ",
          slice(col("toks"), (col("ci") * spanTokens + 1).cast("int"),
            lit(spanTokens))))
          .as("chunk_hash"))
      .withColumn("shard",
        (conv(substring(col("chunk_hash"), 2 * hc + 1, 4), 16, 10)
          % shards).cast("long"))
      .as[(java.sql.Timestamp, Long, Int, String, Long)]
    chunks
      .groupByKey(_._5)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long,
         rows: Iterator[(java.sql.Timestamp, Long, Int, String, Long)],
         state: GroupState[SpanBloom]) =>
          state.getOption.foreach { st =>
            require(st.routeV == SpanRouteVersion,
              s"spanDedupStream checkpoint was recorded under shard-" +
                s"routing v${st.routeV}, this build routes v$SpanRouteVersion" +
                " — resuming would silently under-deduplicate; restart on" +
                " a fresh checkpoint")
          }
          val bm: Array[Long] = state.getOption
            .map(_.words.toArray).getOrElse(new Array[Long](words))
          val out = List.newBuilder[SpanDupFlag]
          // deterministic replay order: (event time, doc, chunk index)
          rows.toSeq.sortBy(r => (r._1.getTime, r._2, r._3)).foreach {
            case (_, id, _, h, _) =>
              // the BloomSketch position discipline: two hex-PREFIX
              // slices of the digest (the chunk hash IS an md5 hex)
              val p1 = java.lang.Long.parseLong(h.substring(0, hc), 16)
              val p2 = java.lang.Long.parseLong(h.substring(hc, 2 * hc), 16)
              def isSet(p: Long): Boolean =
                ((bm((p / 64L).toInt) >>> (p % 64L)) & 1L) == 1L
              if (isSet(p1) && isSet(p2)) out += SpanDupFlag(id, h)
              bm((p1 / 64L).toInt) |= 1L << (p1 % 64L)
              bm((p2 / 64L).toInt) |= 1L << (p2 % 64L)
          }
          state.update(SpanBloom(SpanRouteVersion, bm.toSeq))
          out.result().iterator
      }
  }

  /** The streaming pretraining intake — the composition the streaming
    * operators exist for: Gopher-style quality gate (stateless kernel
    * projection, cheapest first so later stages see less volume) →
    * watermark-bounded exact dedup → benchmark decontamination (stateless
    * Bloom probe). Everything upstream of model training, as one streaming
    * transform; near-dup detection stays a separate emission stream
    * ([[dedupNearMinhash]]) because it flags pairs rather than filtering.
    *
    * @param docs         streaming DataFrame
    * @param tsCol        event-time column (watermark for the dedup stage)
    * @param textCol      document text column
    * @param benchmark    STATIC benchmark corpus to decontaminate against
    * @param benchTextCol benchmark text column
    * @param delay        dedup watermark delay, e.g. "10 minutes"
    */
  def cleanStream(
      docs: DataFrame, tsCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, delay: String): DataFrame = {
    val t = split(col(textCol), "\\s+")
    val st = graft.exprs.functions.token_stats(t,
      array(graft.queries.TextAnalysis.Stopwords.map(lit): _*),
      typedLit(Seq.empty[String]))
    val r = graft.exprs.functions.repetition_stats(t)
    val gated = docs
      .filter(col(textCol).isNotNull)
      .withColumn("_st", st).withColumn("_r", r)
      .filter(col("_st.n_words") >= 20 &&
        col("_st.n_stop").cast("double") / col("_st.n_words") >= 0.05 &&
        col("_r.top_cnt").cast("double") / col("_r.n_tokens") <= 0.2)
      .drop("_st", "_r")
    decontaminateStream(
      // drop dedupExact's internal helper column: the intake's output
      // schema is the caller's schema, nothing more
      dedupExact(gated, tsCol, textCol, delay).drop("content_hash"),
      textCol, benchmark, benchTextCol)
  }

  /** Streaming sequence packing: the batch `pack_sequences` discipline made
    * incremental. Each bucket's token stream keeps extending as documents
    * arrive — a document is assigned the bucket's current offset and the
    * offset advances by its token count, so training sequences fill
    * continuously across micro-batches (concat-and-chunk, documents may
    * straddle sequence boundaries).
    *
    * Differences from the batch operator, by design:
    *  - Order is ARRIVAL order (event time, then doc_id within a
    *    micro-batch), not the batch md5 shuffle — a stream has no corpus
    *    to pre-shuffle. Replay from a checkpoint reprocesses whole
    *    micro-batches, which re-sorts identically, so assignments are
    *    deterministic per (checkpoint, input) pair.
    *  - State is ONE Long per bucket (`PackOffset`) — bounded by
    *    `buckets` forever, no watermark needed, which is why this uses
    *    NoTimeout: packing state must never expire or offsets would
    *    collide.
    *
    * @param docs    streaming DataFrame
    * @param tsCol   event-time column (micro-batch sort key)
    * @param idCol   long document id column (bucket = pmod(id, buckets))
    * @param textCol document text (whitespace-tokenized)
    * @param buckets independent pack streams (batch default: 32)
    * @param budget  tokens per training sequence (batch default: 512)
    */
  def packSequences(
      docs: DataFrame,
      tsCol: String,
      idCol: String,
      textCol: String,
      buckets: Int = 32,
      budget: Int = 512): Dataset[PackAssign] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("long").as("doc_id"),
        // sign-preserving % (not pmod), matching the batch pack_sequences
        // and its oracle's convention for the bucket key
        (col(idCol).cast("long") % buckets).as("bucket"),
        size(split(col(textCol), "\\s+")).cast("long").as("n_tokens"))
      .as[(java.sql.Timestamp, Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (bucket: Long,
         rows: Iterator[(java.sql.Timestamp, Long, Long, Long)],
         state: GroupState[PackOffset]) =>
          var off = state.getOption.map(_.offset).getOrElse(0L)
          val out = rows.toSeq.sortBy(r => (r._1.getTime, r._2)).map {
            case (_, id, _, n) =>
              val start = off
              off += n
              PackAssign(id, bucket, n, start,
                start / budget, (off - 1) / budget,
                (off - 1) / budget - start / budget + 1)
          }
          state.update(PackOffset(off))
          out.iterator
      }
  }

  /** Streaming data card: the batch `corpus_report` made incremental — a
    * watermark-windowed (source, lang) aggregate, so a continuously-
    * ingesting intake publishes its volume / length-range / dup-pressure
    * card per event-time window instead of once per batch run. All the
    * sum/min/max/count columns are the exact batch semantics per window;
    * the ONE deviation is dup pressure: exact `count_distinct` needs
    * unbounded per-group state in a stream, so this uses
    * `approx_count_distinct` (HLL, ~2% default error) and names the
    * column `n_unique_approx` to say so — the batch operator remains the
    * exact record. State: one aggregate row per (window, source, lang),
    * expired by the watermark — bounded by card width × live windows, not
    * by stream volume.
    *
    * Char counting: by default `sum_chars` is Spark's `length(textCol)`
    * — UTF-16 code units, NOT bytes and NOT codepoints. If the batch
    * table carries a precomputed `n_chars` column under a different
    * definition (the driver's tables do), pass it via `nCharsCol` so the
    * streaming card sums the SAME values the batch `corpus_report` reads;
    * otherwise the two cards can deviate on non-BMP text.
    *
    * @param docs      streaming DataFrame
    * @param tsCol     event-time column
    * @param textCol   document text column
    * @param srcCol    source/domain column
    * @param langCol   language column
    * @param win       event-time window width, e.g. "1 hour"
    * @param delay     watermark delay (allowed lateness)
    * @param nCharsCol precomputed char-count column to sum instead of
    *                  `length(textCol)` (match the batch table's own
    *                  n_chars definition)
    */
  /** Streaming watch-list scan — the text_keyword_scan kernel on a
    * document stream, STATELESS (the automaton is a plan reference
    * object; each row's counts are independent). Emits one row per
    * (doc, keyword) with the keyword's overlap-counting occurrence
    * count, matched ids resolving through the SAME [[graft.exprs.KeywordTable]]
    * the batch entry plans. */
  def keywordScanStream(
      docs: DataFrame, idCol: String, textCol: String,
      keywords: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val table = new graft.exprs.KeywordTable(keywords)
    val kw = keywords.zipWithIndex.map { case (k, i) => (i, k) }
      .toDF("kid", "kw")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        graft.exprs.functions.keyword_scan(col(textCol), table).as("c"))
      .select(col("doc_id"), posexplode(col("c")).as(Seq("kid", "n")))
      .join(broadcast(kw), "kid")
      .select(col("doc_id"), col("kw"), col("n").cast("long").as("n"))
  }

  /** Streaming sessionization — the events_sessionize batch entry as a
    * continuous view, built ENTIRELY from Spark's native `session_window`
    * (merging session windows + watermark state eviction; no custom
    * state code to maintain). Emits one row per CLOSED session in append
    * mode once the watermark passes the session's gap.
    *
    * Semantics vs batch: batch starts a new session when the gap is
    * STRICTLY greater than `gap`; session_window's half-open [t, t+gap)
    * windows split at exactly-equal gaps. The boundary case requires a
    * gap of exactly `gap` microseconds — measure-zero in event data and
    * absent from the test corpus (StreamingSpec compares the full
    * per-user session lists against the batch entry).
    *
    * Output times are MICROSECONDS since epoch (the batch entry's unit).
    * State: one open session per active user, evicted at watermark —
    * bounded by concurrently-active users, not stream volume. */
  def sessionizeStream(
      events: DataFrame,
      tsCol: String,
      userCol: String,
      gap: String = "30 minutes",
      delay: String = "10 minutes"): DataFrame =
    events
      // ns → µs → timestamp (ts ≥ 0 so integer div = floor, like batch)
      .withColumn("__t", timestamp_micros(expr(s"$tsCol div 1000")))
      .withWatermark("__t", delay)
      .groupBy(col(userCol), session_window(col("__t"), gap))
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min(col("__t"))).as("t_start"),
        unix_micros(max(col("__t"))).as("t_end"))
      .select(col(userCol), col("t_start"), col("t_end"), col("n_events"))

  /** Streaming heavy hitters — the [[graft.queries.TextAnalysis]]
    * text_heavy_hitters candidate generator as a continuous view. Tokens
    * route to a shard by token hash, so EVERY occurrence of a token lands
    * in one shard and the shard's Misra–Gries buffer (the batch
    * aggregate's exact update rule — one definition,
    * [[graft.exprs.MisraGries.add]]) sees the token's full stream
    * frequency. The MG survivor bound only TIGHTENS under sharding
    * (undercount ≤ shard_total/(capacity+1) ≤ n/(capacity+1)), so at any
    * point the union of shard candidates is a SUPERSET of the global
    * heavy hitters over everything ingested so far — the same
    * superset-then-recount contract the batch entry's oracle rests on
    * (recount exactly downstream when exact counts are needed).
    *
    * State: one ≤capacity-entry map + one counter per shard, FOREVER —
    * state never grows with stream volume. Emissions (update mode): each
    * shard's full candidate list per micro-batch that touched it,
    * ≤ shards × capacity rows per batch.
    */
  def heavyHittersStream(
      docs: DataFrame,
      textCol: String,
      capacity: Int = 1024,
      shards: Int = 32): Dataset[HeavyHitterCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tokens = docs.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), "\\s+")).as("token"))
      // leading-whitespace documents split to an empty first token;
      // filter it so the candidate set never carries the "" artifact
      // (the batch entry's oracle is insulated by identical splitting
      // in both engines; a stream consumer has no such mirror)
      .filter(length(col("token")) > 0)
      .select(col("token"), pmod(xxhash64(col("token")), lit(shards.toLong))
        .as("shard"))
      .as[(String, Long)]
    tokens.groupByKey(_._2)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Long, rows: Iterator[(String, Long)],
         state: GroupState[HhShardState]) =>
          val st = state.getOption.getOrElse(HhShardState(Nil, 0L))
          val buf = scala.collection.mutable.HashMap.from(st.items)
          var total = st.total
          rows.foreach { case (tok, _) =>
            graft.exprs.MisraGries.add(buf, tok, 1L, capacity)
            total += 1
          }
          state.update(HhShardState(buf.toSeq.sortBy(_._1), total))
          buf.toSeq.sortBy(_._1).map { case (tok, c) =>
            HeavyHitterCandidate(shard, tok, c, total)
          }.iterator
      }
  }

  /** Streaming priority sample — the batch `sample_priority` entry
    * (Duffield–Lund–Thorup weighted sampling without replacement) per
    * closed event-time window: deterministic md5 uniform (the batch
    * salt, so identical rows produce identical priorities), one
    * bounded-state [[graft.exprs.PrioritySampleAgg]] per window holding
    * the top-(k+1) — never the window's rows — and the kept k emitted
    * with the same τ / ŵ = max(w, τ) estimator algebra on window close.
    * Priority sampling is EXACTLY mergeable (the global top-(k+1) is a
    * function of partial top-(k+1)s), so micro-batch boundaries and
    * shuffle order cannot change the sample — bit-parity with batch is
    * pinned in StreamingSpec.
    *
    * @return (win_start, doc_id, w, rank, priority, w_est) per window */
  def prioritySampleStream(
      docs: DataFrame, tsCol: String, idCol: String, wCol: String,
      k: Int, win: String = "10 seconds",
      delay: String = "10 seconds"): DataFrame = {
    val u32 = conv(substring(
      md5(concat(lit("ps"), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("long")
    docs
      .select(col(tsCol).cast("timestamp").as("__ts"),
        col(idCol).cast("long").as("doc_id"),
        col(wCol).cast("double").as("w"),
        ((u32 + lit(1L)).cast("double") / lit(4294967296.0)).as("u"))
      .withColumn("priority", col("w") / col("u"))
      .withWatermark("__ts", delay)
      .groupBy(window(col("__ts"), win))
      .agg(graft.exprs.functions.priority_sample(
        col("priority"), col("doc_id"), col("w"), k).as("sample"))
      .select(col("window.start").as("win_start"),
        explode(col("sample")).as("s"))
      .select(col("win_start"), col("s.doc_id"), col("s.w"),
        col("s.rank"), col("s.priority"), col("s.w_est"))
  }

  /** Stateless streaming twin of mix_temperature's per-doc decision:
    * the batch entry's audit fixes the per-source acceptance THRESHOLDS
    * (⌊rate·2³²⌋ — data, engine-exact), and a continuous ingestion
    * stream applies them as one codegen'd md5 fold + integer compare
    * per row — the frozen-model serving pattern (dsirScoreStream's: fit
    * batch, serve the artifact). No state, no shuffle; re-running the
    * batch audit and restarting with fresh thresholds is the policy
    * refresh path. Sources absent from the profile DROP (threshold 0):
    * an unprofiled source has no rate, and silently keeping it would
    * un-balance exactly what the operator exists to balance.
    *
    * Bit-parity with the batch decision is structural (same salt, same
    * fold, same compare) and pinned in StreamingSpec against the batch
    * audit's per-source kept counts. */
  def mixTemperatureStream(
      docs: DataFrame, idCol: String, srcCol: String,
      thresholds: Map[String, Long]): DataFrame = {
    require(thresholds.nonEmpty, "empty mixing profile")
    val thr = typedLit(thresholds)
    val u32 = conv(substring(
      md5(concat(lit("mt"), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("long")
    docs
      .withColumn("__thr",
        coalesce(element_at(thr, col(srcCol)), lit(0L)))
      .filter(u32 < col("__thr"))
      .drop("__thr")
  }

  /** Streaming distribution quantiles — the text_quantiles_sketch KLL
    * aggregate per closed event-time window and group. State per
    * (window, group) is the sketch's O(k·log(n/k)) doubles, never the
    * window's rows. The sketch is mergeable, so micro-batch splits only
    * reorder compactions — estimates stay inside the SAME rank-error
    * bound (not bit-equal across splits, unlike prioritySampleStream's
    * exact mergeability; the spec gates the bound, not bits).
    *
    * @return (win_start, <groupCol>, q, est) per closed window */
  def quantilesStream(
      rows: DataFrame, tsCol: String, groupCol: String, valCol: String,
      quantiles: Seq[Double], labels: Seq[String], k: Int,
      win: String = "10 seconds", delay: String = "10 seconds"): DataFrame = {
    require(quantiles.length == labels.length, "one label per quantile")
    val lab = array(labels.map(lit): _*)
    rows
      .select(col(tsCol).cast("timestamp").as("__ts"), col(groupCol),
        col(valCol).cast("double").as("__v"))
      .withWatermark("__ts", delay)
      .groupBy(window(col("__ts"), win), col(groupCol))
      .agg(graft.exprs.functions.kll_quantiles(col("__v"), quantiles, k)
        .as("ests"))
      .select(col("window.start").as("win_start"), col(groupCol),
        posexplode(col("ests")).as(Seq("i", "est")))
      .select(col("win_start"), col(groupCol),
        element_at(lab, col("i") + 1).as("q"), col("est"))
  }

  /** Round 14: the optional `rejects` leg — the quarantine stream
    * [[graft.sources.CorpusJsonl.ingestStream]] writes (or any relation
    * of rejected lines with an event-time column `rejectsTsCol`) — is
    * unioned in BEFORE the window aggregate as sentinel rows (source
    * '(intake)', lang '(rejects)', metric columns null), so each closed
    * window's card carries its quarantined-line count as one extra row:
    * the same convention the batch corpus_report uses. A data card that
    * can't say "N lines rejected this window" under-reports the corpus.
    * (Skipped FILES are stream-audited by
    * [[graft.sources.CorpusJsonl.fileAuditStream]] — a file-granular
    * relation with its own sink, not a per-line stream to union here.) */
  def corpusReportStream(
      docs: DataFrame, tsCol: String, textCol: String,
      srcCol: String, langCol: String,
      win: String, delay: String,
      nCharsCol: Option[String] = None,
      rejects: Option[DataFrame] = None,
      rejectsTsCol: String = "ts"): DataFrame = {
    val t = split(col(textCol), "\\s+")
    val nChars = nCharsCol.map(c => col(c).cast("long"))
      .getOrElse(length(col(textCol)).cast("long"))
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(tsCol).cast("timestamp").as("__rts"),
        col(srcCol).cast("string").as("__src"),
        col(langCol).cast("string").as("__lang"),
        size(t).cast("long").as("n_toks"),
        nChars.as("n_chars"),
        md5(col(textCol)).as("hsh"))
    val all = rejects.fold(base)(r => base.unionByName(
      r.select(col(rejectsTsCol).cast("timestamp").as("__rts"),
        lit("(intake)").as("__src"), lit("(rejects)").as("__lang"),
        lit(null).cast("long").as("n_toks"),
        lit(null).cast("long").as("n_chars"),
        lit(null).cast("string").as("hsh"))))
    all
      .withWatermark("__rts", delay)
      .groupBy(window(col("__rts"), win), col("__src"), col("__lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        min(col("n_toks")).as("min_toks"),
        max(col("n_toks")).as("max_toks"),
        sum(col("n_chars")).as("sum_chars"),
        approx_count_distinct(col("hsh")).as("n_unique_approx"))
      .select(col("window.start").as("win_start"),
        col("__src").as(srcCol), col("__lang").as(langCol),
        col("n_docs"), col("n_tokens"), col("min_toks"),
        col("max_toks"), col("sum_chars"), col("n_unique_approx"))
  }
}
