package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted FFD token-packing state for INCREMENTAL intake — the
  * "close the recurring loop to training rows" operator: drop N+1's
  * documents pack into the SAME first-fit-decreasing bins drop N left
  * open, so sequences continue across drops (no repacking, no renumber)
  * and the emitted training rows are EXACTLY what one sequential
  * replay of all drops would produce.
  *
  * A [[DeltaManifest]]-committed store (the [[DedupState]] /
  * [[DecontamRegistry]] discipline — immutable deltas, atomic manifest,
  * fingerprint-idempotent replay). Each [[pack]] writes one delta:
  * {{{
  *   delta-<uuid>/contrib/  parquet: bucket, seq, step, doc_id,
  *                          ids_doc array<int> — the drop's CONTRIBUTION
  *                          to each training sequence (each doc's
  *                          truncated prefix + EOS, stamped with its
  *                          assigned bin `seq` and per-bucket visit
  *                          index `step`); a sequence spanning drops
  *                          holds contrib rows in several deltas
  *   delta-<uuid>/bins/     parquet: bucket, seq, rem — the POST-pack
  *                          snapshot of every bucket's open-bin
  *                          remainders (bin creation order = seq)
  *   delta-<uuid>/counters/ parquet: bucket, steps — the post-pack
  *                          per-bucket visit counter
  * }}}
  * `contrib/` accumulates across deltas (it IS the corpus's packed
  * form); `bins/`+`counters/` are SNAPSHOTS — only the LATEST delta's
  * pair seeds the next pack, which is what makes each delta immutable
  * while the packer state evolves. [[compact]] concatenates contrib
  * verbatim and carries the latest snapshot, so [[trainingRows]] is
  * invariant under compaction.
  *
  * FFD semantics per drop (the pack_best_fit kernel, seeded): documents
  * visit per bucket in (n_eff DESC, doc_id) order, each takes the
  * LOWEST-indexed open bin with remainder ≥ n_eff (the
  * [[FirstFitTree]] O(log bins) query) or opens a new bin; n_eff =
  * min(n_ids + 1, L) — the doc's truncated prefix plus one EOS. Packing
  * is therefore FFD *within* each drop and first-come *across* drops —
  * exactly the semantics of running the batch packer on each drop as it
  * lands, which is the contract the two-drop oracle replays (a global
  * re-FFD over all drops would require repacking history on every
  * drop, the cost this operator exists to avoid).
  *
  * Scale shape: one drop's pack is one sorted-group pass over the
  * drop's docs (buckets are the parallelism; the per-bucket tree holds
  * open-bin remainders, the same working set the batch packer keeps) +
  * a join of assignments back to the drop's token arrays. The bins
  * snapshot rewrite is O(open bins) per drop — at extreme state sizes
  * a deployment caps it by closing bins under a fill threshold, a
  * documented semantic knob this operator deliberately does NOT apply
  * (the sequential-replay oracle would no longer be exact).
  *
  * Crash/replay: delta staged whole, manifest commit atomic
  * (EEXIST-loud), fingerprint replay is a no-op — an intake job that
  * crashed after commit re-runs clean; a crash before commit leaves an
  * unreferenced staging dir for [[gc]].
  */
object PackState {

  private val Magic = "graft-pack-state-v1"

  /** The packing geometry, pinned into the manifest header: a state
    * packed under one geometry refuses packs under another (silently
    * mixing sequence lengths would corrupt every row). */
  final case class Params(seqLen: Int, eosId: Int, padId: Int, buckets: Int) {
    require(seqLen >= 2 && buckets >= 1)
    private[PackState] def payload =
      s"L=$seqLen eos=$eosId pad=$padId buckets=$buckets"
  }

  final case class DeltaRef(name: String, ledger: String, nDocs: Long) {
    def fingerprints: Seq[String] = ledger.split(DeltaManifest.FpSep).toSeq
  }

  final case class Handle(
      dir: String, version: Long, params: Params, deltas: Seq[DeltaRef]) {
    def nDocs: Long = deltas.iterator.map(_.nDocs).sum
    def fingerprints: Set[String] =
      deltas.iterator.flatMap(_.fingerprints).toSet
  }

  /** Load the current committed state; `version` 0 (no packs yet) if
    * none. A geometry mismatch with an existing manifest fails loudly. */
  def load(dir: String, p: Params): Handle = {
    val st = DeltaManifest.load(dir, Magic, p.payload)
    require(st.payload == p.payload,
      s"pack state at $dir was built with geometry '${st.payload}', " +
        s"caller passed '${p.payload}' — refusing to mix")
    Handle(dir, st.version, p, st.refs.map(r =>
      DeltaRef(r.name, r.ledger, r.n)))
  }

  private val ContribSchema =
    "bucket bigint, seq bigint, step bigint, doc_id bigint, " +
      "ids_doc array<int>"
  private val BinsSchema = "bucket bigint, seq bigint, rem bigint"
  private val CountersSchema = "bucket bigint, steps bigint"

  private def readLeaf(
      s: SparkSession, dir: String, deltas: Seq[String],
      leaf: String, schema: String): DataFrame = {
    val paths = deltas.map(d => s"$dir/$d/$leaf")
    if (paths.isEmpty)
      s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(schema))
    else s.read.schema(org.apache.spark.sql.types.StructType.fromDDL(schema))
      .parquet(paths: _*)
  }

  /** Every drop's per-sequence contributions, across all deltas. */
  def contrib(s: SparkSession, h: Handle): DataFrame =
    readLeaf(s, h.dir, h.deltas.map(_.name), "contrib", ContribSchema)

  /** The current open-bin snapshot (latest delta's). */
  def bins(s: SparkSession, h: Handle): DataFrame =
    readLeaf(s, h.dir, h.deltas.lastOption.map(_.name).toSeq,
      "bins", BinsSchema)

  private def counters(s: SparkSession, h: Handle): DataFrame =
    readLeaf(s, h.dir, h.deltas.lastOption.map(_.name).toSeq,
      "counters", CountersSchema)

  /** Pack a drop of `(doc_id, token_ids array<int>)` rows into the
    * state: FFD within the drop, continuing the persisted bins, one new
    * delta. Fingerprint-idempotent. */
  def pack(
      s: SparkSession, dir: String, idRows: DataFrame,
      fingerprint: String, p: Params): Handle = synchronized {
    import s.implicits._
    DeltaManifest.requireCleanId(fingerprint)
    val h = load(dir, p)
    if (h.fingerprints.contains(fingerprint)) return h
    val L = p.seqLen.toLong

    val ids = idRows
      .select(col("doc_id").cast("long").as("doc_id"),
        col("token_ids").cast("array<int>").as("token_ids"))
      .withColumn("bucket", (col("doc_id") % p.buckets).cast("long"))
      .withColumn("n_ids", size(col("token_ids")).cast("long"))
      .withColumn("n_eff", least(col("n_ids") + 1L, lit(L)))

    // seed rows: (bucket, kind, a, b) — kind 1 = open bin (a=seq, b=rem)
    // in creation order, kind 2 = visit counter (b=steps); the kernel's
    // sort key (kind, a) replays bins before the counter
    val seed = bins(s, h)
      .select(col("bucket"), lit(1).as("kind"),
        col("seq").as("a"), col("rem").as("b"))
      .unionByName(counters(s, h)
        .select(col("bucket"), lit(2).as("kind"),
          lit(0L).as("a"), col("steps").as("b")))
      .as[(Long, Int, Long, Long)]
    val docs = ids.select("doc_id", "bucket", "n_eff")
      .as[(Long, Long, Long)]

    // ONE sorted cogroup pass per bucket: replay the seed into the tree,
    // FFD the drop's docs, then emit the post-pack snapshot. Buckets in
    // the seed but absent from the drop re-emit their snapshot verbatim;
    // fresh buckets start empty. Output kinds mirror the seed's
    // (0 = assignment row).
    val raw = seed.groupByKey(_._1)
      .cogroupSorted(docs.groupByKey(_._2))(
        col("kind"), col("a"))(col("n_eff").desc, col("doc_id")) {
        (bucket, seedIt, docIt) =>
          val tree = new FirstFitTree
          var steps = 0L
          seedIt.foreach {
            case (_, 1, _, rem) => tree.append(rem); ()
            case (_, _, _, st) => steps = st
          }
          val assigned = docIt.map { case (docId, _, nEff) =>
            steps += 1L
            val fit = tree.firstFit(nEff)
            val seq =
              if (fit >= 0) { tree.take(fit, nEff); fit + 1L }
              else { tree.append(L - nEff); tree.size.toLong }
            (0, bucket, docId, seq, steps, nEff)
          }
          // Iterator.++'s rhs is by-name: the snapshot materializes only
          // after every assignment has updated the tree/counter
          assigned ++ Iterator.single(()).flatMap { _ =>
            (0 until tree.size).iterator.map(i =>
              (1, bucket, 0L, (i + 1).toLong, tree.remaining(i), 0L)) ++
              Iterator.single((2, bucket, 0L, 0L, steps, 0L))
          }
      }
      .toDF("kind", "bucket", "doc_id", "seq", "x", "n_eff")

    val staging = DeltaManifest.stagingPath(dir)
    val st = staging.toString
    // stage the kernel output ONCE; every delta artifact derives from it
    raw.write.parquet(s"$st/raw")
    val rawStaged = s.read.schema(
      org.apache.spark.sql.types.StructType.fromDDL(
        "kind int, bucket bigint, doc_id bigint, seq bigint, " +
          "x bigint, n_eff bigint")).parquet(s"$st/raw")
    rawStaged.filter(col("kind") === 0)
      .join(ids.select(col("doc_id"), col("token_ids"), col("n_eff")
        .as("ne")), Seq("doc_id"))
      .select(col("bucket"), col("seq"), col("x").as("step"), col("doc_id"),
        concat(slice(col("token_ids"), lit(1), (col("ne") - 1L).cast("int")),
          array(lit(p.eosId))).cast("array<int>").as("ids_doc"))
      .write.parquet(s"$st/contrib")
    rawStaged.filter(col("kind") === 1)
      .select(col("bucket"), col("seq"), col("x").as("rem"))
      .write.parquet(s"$st/bins")
    rawStaged.filter(col("kind") === 2)
      .select(col("bucket"), col("x").as("steps"))
      .write.parquet(s"$st/counters")
    val n = s.read.schema(org.apache.spark.sql.types.StructType
      .fromDDL(ContribSchema)).parquet(s"$st/contrib").count()
    graft.storage.ParquetLogBackend.deleteRecursively(staging.resolve("raw"))

    val deltaName = DeltaManifest.promote(staging)
    DeltaManifest.commit(dir, Magic, p.payload, h.version + 1,
      (h.deltas :+ DeltaRef(deltaName, fingerprint, n))
        .map(d => DeltaManifest.Ref(d.name, d.ledger, d.nDocs)))
    load(dir, p)
  }

  /** The state's training rows so far — one audit row per sequence,
    * `(bucket, seq, n_docs, n_real, n_pad, ids_md5)`, docs concatenated
    * in their FFD visit order (`step` is globally increasing per bucket
    * across drops), tail padded to the geometry's L with PAD; the md5
    * pins every id of every row (the pack_best_fit_tokens
    * materialization, served from persisted contributions — emitting
    * never re-tokenizes an earlier drop). Per-sequence collect_list is
    * bounded by L ids. */
  def trainingRows(s: SparkSession, h: Handle): DataFrame = {
    val L = h.params.seqLen.toLong
    contrib(s, h)
      .groupBy("bucket", "seq")
      .agg(count(lit(1)).as("n_docs"),
        sort_array(collect_list(struct(col("step"), col("ids_doc"))))
          .as("a"))
      .withColumn("real_ids",
        flatten(expr("transform(a, x -> x.ids_doc)")))
      .withColumn("n_real", size(col("real_ids")).cast("long"))
      .withColumn("n_pad", lit(L) - col("n_real"))
      .withColumn("ids_md5", md5(concat_ws(",",
        concat(col("real_ids"),
          array_repeat(lit(h.params.padId), col("n_pad").cast("int")))
          .cast("array<string>"))))
      .select(col("bucket"), col("seq"), col("n_docs"),
        col("n_real"), col("n_pad"), col("ids_md5"))
  }

  /** Fold every delta's contrib verbatim into one delta carrying the
    * LATEST bins/counters snapshot; [[trainingRows]] and the next
    * [[pack]] answer identically before and after. The ledger survives. */
  def compact(s: SparkSession, dir: String, p: Params): Handle =
    synchronized {
      val h = load(dir, p)
      if (h.deltas.size <= 1) return h
      val staging = DeltaManifest.stagingPath(dir)
      val st = staging.toString
      contrib(s, h).write.parquet(s"$st/contrib")
      bins(s, h).write.parquet(s"$st/bins")
      counters(s, h).write.parquet(s"$st/counters")
      val deltaName = DeltaManifest.promote(staging)
      val mergedLedger =
        h.deltas.map(_.ledger).mkString(DeltaManifest.FpSep.toString)
      DeltaManifest.commit(dir, Magic, p.payload, h.version + 1,
        Seq(DeltaManifest.Ref(deltaName, mergedLedger, h.nDocs)))
      load(dir, p)
    }

  /** Reclaim unreferenced delta/staging dirs (manifest-driven). */
  def gc(dir: String, p: Params): Int = synchronized {
    DeltaManifest.gc(dir, Magic, p.payload)
  }
}
