package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted benchmark-contamination REGISTRY for incremental intake.
  *
  * Benchmarks publish over time: a production intake decontaminates
  * every drop against the registry of ALL benchmarks registered so far,
  * without re-shingling old benchmarks and without redeploying when a
  * new one lands. Each [[register]] stores only the benchmark's Bloom
  * words — [[BloomSketch]] masks of its distinct shingle hashes — as one
  * immutable delta under a [[DeltaManifest]]-committed manifest
  * (`graft-decontam-registry-v1 bits=<n>`). Registrations are
  * name-idempotent (the ledger is the replay record); [[compact]] folds
  * word deltas with `bit_or`, and because positions are per-shingle,
  * the OR of two benchmarks' masks IS the mask of their shingle-set
  * union — so a registry built in N registrations answers EXACTLY what
  * a single-shot Bloom over the concatenated benchmarks answers (the
  * property the oracle-gated entry pins).
  *
  * SEMANTIC registrations (round 15): a benchmark can also publish its
  * EMBEDDINGS — [[registerEmbeddings]] persists (b_id, bv, bn) rows as a
  * `vecs/` delta leaf under the same manifest/ledger discipline — and
  * [[flagSemantic]] serves the paraphrase-leakage check (exact cosine ≥
  * τ against every registered vector) that the shingle tier structurally
  * cannot see: a benchmark item REWRITTEN into a crawl drop shares no
  * 3-grams with the registered original but sits next to it in embedding
  * space. A delta carries a `words/` leaf, a `vecs/` leaf, or (after
  * [[compact]]) both; each probe path reads only the leaves of its kind.
  *
  * Scale shape: a registration is one pass over the benchmark (KB-GB
  * scale, shingle → md5 → distinct → ≤ bits/64 mask rows; embeddings →
  * norm projection); a [[flag]] probe folds all word deltas into ONE
  * broadcastable (word, mask) relation and runs the shared
  * [[BloomSketch.flagCard]] over the corpus drop — corpus-linear, two
  * broadcast lookups per shingle, nothing rescans a registered benchmark
  * ever again. A [[flagSemantic]] probe broadcasts the registered
  * vectors (benchmark suites are SMALL by contract — the
  * decontaminateSemantic posture; corpus-scale "benchmarks" belong on
  * the ANN index paths) and makes ONE corpus scan with the τ filter
  * before the aggregate, so the shuffle carries only the rare hits.
  * False positives are the Bloom contract (sized by `bits`, ~1% at 10^4
  * shingles per 2^20 bits) and are REPRODUCED by the oracle, so the gate
  * stays exact; the semantic tier has no FPs at all (exact cosine).
  */
object DecontamRegistry {

  val DefaultBits: Long = BloomSketch.DefaultBits

  private val Magic = "graft-decontam-registry-v1"

  final case class Handle(
      dir: String, version: Long, bits: Long, st: DeltaManifest.State) {
    /** Registered benchmark names (ledger entries). */
    def names: Set[String] = st.ledgerEntries
    /** Total registered evidence units (distinct shingles for text
      * registrations, vectors for embedding registrations; pre-fold
      * sum) — the capacity-planning statistic. */
    def nShingles: Long = st.n
  }

  def load(dir: String): Handle = {
    val st = DeltaManifest.load(dir, Magic, s"bits=$DefaultBits")
    Handle(dir, st.version, st.payload.split("bits=").last.trim.toLong, st)
  }

  /** Distinct md5-hex shingle hashes of a documents relation
    * `(doc_id, text, ...)` — the same derivation decontaminate_bloom
    * shingles with (hash BEFORE distinct, so exchanges carry 32-char
    * digests). */
  def shingleHashes(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(graft.exprs.functions.ngram_shingles(
          split(col("text"), "\\s+"))).as("sng"))
      .select(col("doc_id"), md5(col("sng")).as("h"))
      .distinct()

  /** Register a benchmark under `name`: persist its Bloom words as a new
    * delta and commit the next manifest. Re-registering a name is a
    * no-op returning the current handle (idempotent replay). */
  def register(
      s: SparkSession, dir: String, benchmark: DataFrame,
      name: String): Handle = synchronized {
    DeltaManifest.requireCleanId(name)
    val h = load(dir)
    if (h.names.contains(name)) return h
    val staging = DeltaManifest.stagingPath(dir)
    val hashes = shingleHashes(benchmark).select("h")
    BloomSketch.maskRelation(hashes, wordBits = 64, bits = h.bits)
      .write.parquet(s"${staging.toString}/words")
    // the ref's n records the benchmark's distinct-shingle count — the
    // registry's capacity-planning statistic (FP rate grows with it)
    val n = hashes.distinct().count()
    val deltaName = DeltaManifest.promote(staging)
    DeltaManifest.commit(dir, Magic, s"bits=${h.bits}", h.version + 1,
      h.st.refs :+ DeltaManifest.Ref(deltaName, name, n))
    load(dir)
  }

  /** Register a benchmark's EMBEDDINGS under `name`: persist
    * (b_id, bv, bn) rows — the vector and its precomputed L2 norm, so
    * every later probe reuses one norm pass — as a `vecs/` delta under
    * the same ledger. Name-idempotent like [[register]]; a benchmark
    * that publishes both text and embeddings registers twice under two
    * names (e.g. "suite" and "suite-emb"). The ref's n records the
    * vector count. */
  def registerEmbeddings(
      s: SparkSession, dir: String, benchmark: DataFrame,
      idCol: String, vecCol: String, name: String): Handle = synchronized {
    DeltaManifest.requireCleanId(name)
    val h = load(dir)
    if (h.names.contains(name)) return h
    val staging = DeltaManifest.stagingPath(dir)
    val v = benchmark.select(col(idCol).cast("long").as("b_id"),
        col(vecCol).cast("array<double>").as("bv"))
      .withColumn("bn", graft.queries.Similarity.norm(col("bv")))
    v.write.parquet(s"${staging.toString}/vecs")
    val n = s.read.schema(org.apache.spark.sql.types.StructType.fromDDL(
      VecsSchema)).parquet(s"${staging.toString}/vecs").count()
    val deltaName = DeltaManifest.promote(staging)
    DeltaManifest.commit(dir, Magic, s"bits=${h.bits}", h.version + 1,
      h.st.refs :+ DeltaManifest.Ref(deltaName, name, n))
    load(dir)
  }

  private val VecsSchema = "b_id bigint, bv array<double>, bn double"

  private def leafRefs(h: Handle, leaf: String): Seq[DeltaManifest.Ref] =
    h.st.refs.filter(r => java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(h.dir, r.name, leaf)))

  private def readLeaf(
      s: SparkSession, h: Handle, leaf: String, schema: String): DataFrame = {
    val paths = leafRefs(h, leaf).map(r => s"${h.dir}/${r.name}/$leaf")
    if (paths.isEmpty)
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(schema))
    else s.read.schema(org.apache.spark.sql.types.StructType.fromDDL(
      schema)).parquet(paths: _*)
  }

  /** The registry's folded Bloom relation (≤ bits/64 rows); a delta may
    * carry only a `vecs/` leaf (semantic registration) and contributes
    * nothing here. */
  def words(s: SparkSession, h: Handle): DataFrame =
    readLeaf(s, h, "words", "word bigint, mask bigint")
      .groupBy("word").agg(expr("bit_or(mask)").as("mask"))

  /** Every registered benchmark embedding `(b_id, bv, bn)` across all
    * `vecs/` deltas. */
  def vecs(s: SparkSession, h: Handle): DataFrame =
    readLeaf(s, h, "vecs", VecsSchema)

  /** Per-document contamination card of a corpus drop against EVERY
    * registered benchmark: `(doc_id, n_shingles, n_flagged,
    * flagged_frac)`, flagged docs only — [[BloomSketch.flagCard]] over
    * the folded words. */
  def flag(s: SparkSession, h: Handle, corpus: DataFrame): DataFrame =
    BloomSketch.flagCard(shingleHashes(corpus), words(s, h), h.bits)

  /** The SEMANTIC contamination card of a corpus drop against every
    * registered benchmark EMBEDDING: `(doc_id, n_bench_hits, max_cos)`,
    * hit rows only — exact cosine ≥ `tau` against the broadcast
    * registered vectors (the decontaminateSemantic shape served from
    * persisted state; same pinned left-fold cosine, so the DuckDB
    * oracle reproduces it bit-for-bit). The τ filter runs before the
    * aggregate, so the shuffle carries only the rare hits. */
  def flagSemantic(
      s: SparkSession, h: Handle, corpus: DataFrame,
      idCol: String, vecCol: String, tau: Double): DataFrame = {
    import graft.queries.Similarity
    val c = corpus.select(col(idCol).cast("long").as("doc_id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    c.crossJoin(broadcast(vecs(s, h)))
      .withColumn("cosine", Similarity.cosinePre(
        col("v"), col("bv"), col("nrm"), col("bn")))
      .filter(col("cosine") >= tau)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bench_hits"), max(col("cosine")).as("max_cos"))
  }

  /** Fold all word deltas into one (`bit_or` across deltas — exactly the
    * union-set mask) and every vec delta verbatim, and commit a manifest
    * referencing only the merged delta; the name ledger survives. Both
    * probe paths answer identically before and after (OR-of-masks =
    * mask-of-union; vector rows concatenate). */
  def compact(s: SparkSession, dir: String): Handle = synchronized {
    val h = load(dir)
    if (h.st.refs.size <= 1) return h
    val staging = DeltaManifest.stagingPath(dir)
    java.nio.file.Files.createDirectories(staging)
    if (leafRefs(h, "words").nonEmpty)
      words(s, h).write.parquet(s"${staging.toString}/words")
    if (leafRefs(h, "vecs").nonEmpty)
      vecs(s, h).write.parquet(s"${staging.toString}/vecs")
    val deltaName = DeltaManifest.promote(staging)
    val mergedLedger =
      h.st.refs.map(_.ledger).mkString(DeltaManifest.FpSep.toString)
    DeltaManifest.commit(dir, Magic, s"bits=${h.bits}", h.version + 1,
      Seq(DeltaManifest.Ref(deltaName, mergedLedger, h.nShingles)))
    load(dir)
  }

  /** Reclaim unreferenced delta/staging dirs (manifest-driven). */
  def gc(dir: String): Int = synchronized {
    DeltaManifest.gc(dir, Magic, s"bits=$DefaultBits")
  }

  /** Typed registry-health verdict (round 17 — the third
    * [[DeltaManifest]] store gains the [[DedupState.health]] /
    * [[PackState.health]] pattern, so compaction cadence stops being a
    * caller-guessed constant):
    *
    *  - `nRegistrations` drives the per-probe costs that scale with
    *    LIVE deltas, not content: [[words]] folds one `bit_or` group
    *    over every `words/` leaf and [[vecs]] concatenates every
    *    `vecs/` leaf on each probe. [[compact]] restores the dimension
    *    to 1 without changing any flag (OR-of-masks = mask-of-union;
    *    vector rows concatenate).
    *  - `wordBloomFill` is the folded Bloom's set-bit fraction —
    *    CONTENT-driven (compaction ORs the same masks), so saturation
    *    is a CAPACITY signal, not a compaction one: the flag FP rate
    *    ≈ fill² per shingle, and past ~50% [[flag]] starts flagging
    *    clean documents at a visible rate. Remediation is re-registering
    *    into a registry with larger `bits` — surfaced here BEFORE the
    *    probe degrades.
    *  - `vecsBytes` is the semantic tier's BROADCAST volume: every
    *    [[flagSemantic]] ships the registered vectors to every
    *    executor. Benchmark suites are small by contract; a registry
    *    heading past `maxVecsBytes` (default 256 MB) is drifting toward
    *    the ANN index paths and `vecsHeavy` says so.
    *
    * `compactRecommended` trips on the delta dimension alone. */
  final case class HealthReport(
      nRegistrations: Int,
      nShingles: Long,
      nVecs: Long,
      vecsBytes: Long,
      wordBloomFill: Double,
      compactRecommended: Boolean,
      bloomSaturated: Boolean,
      vecsHeavy: Boolean)

  def health(
      s: SparkSession, h: Handle, maxDeltas: Int = 16,
      maxBloomFill: Double = 0.5,
      maxVecsBytes: Long = 256L << 20): HealthReport = {
    val setBits = words(s, h)
      .agg(coalesce(sum(expr("bit_count(mask)")), lit(0L)))
      .head().getLong(0)
    val fill = if (h.bits <= 0) 0.0 else setBits.toDouble / h.bits
    // 8 B/component + the norm + row overhead — the broadcast estimate,
    // not an exact serialized size
    val vecStats = vecs(s, h)
      .agg(count(lit(1)),
        coalesce(sum(size(col("bv")).cast("long") * 8L + 24L), lit(0L)))
      .head()
    HealthReport(
      nRegistrations = h.st.refs.size,
      nShingles = h.nShingles,
      nVecs = vecStats.getLong(0),
      vecsBytes = vecStats.getLong(1),
      wordBloomFill = fill,
      compactRecommended = h.st.refs.size > maxDeltas,
      bloomSaturated = fill > maxBloomFill,
      vecsHeavy = vecStats.getLong(1) > maxVecsBytes)
  }
}
