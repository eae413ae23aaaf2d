package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Edit-distance similarity join (record linkage) via q-gram prefix
  * filtering — the Ed-Join candidate-generation scheme (Xiao, Wang, Lin,
  * VLDB 2008; public literature), recast as declarative Spark plans.
  *
  * Shape: the naive formulation is an all-pairs `levenshtein` cross join —
  * O(n²) and unrunnable at corpus scale. Prefix filtering bounds it:
  *
  *  1. Each string s contributes its DISTINCT q-grams.
  *  2. Fix any global total order on grams (we use document-frequency
  *     ascending, gram value as tiebreak — "rarest first", which minimizes
  *     candidate volume; correctness holds for ANY consistent order).
  *  3. Each string indexes only its first `k·q + 1` grams in that order
  *     (its *prefix*). Candidate pairs = pairs sharing ≥1 prefix gram.
  *  4. Verify candidates with banded `levenshtein(…, threshold = k)`.
  *
  * Why no false negatives (the property that makes the naive SQL a valid
  * oracle): one edit touches ≤ q positional grams, so it can delete ≤ q
  * DISTINCT gram values from a string's gram set; k edits delete ≤ k·q.
  * Hence ed(x,y) ≤ k ⟹ |set(Gx) ∩ set(Gy)| ≥ max(|Gx|,|Gy|) − k·q =: t.
  * When t ≥ 1, the standard prefix-filter theorem gives an intersection
  * between the (|G|−t+1)-prefixes, and |G|−t+1 ≤ k·q+1 for the larger side
  * (the smaller side's prefix is capped at all of its grams). The only
  * uncovered case is t < 1 — BOTH strings have ≤ k·q grams (length ≤
  * k·q+q−1) — which the short-string block below handles by an explicit
  * length-banded join over that (tiny, bounded-length) subset.
  *
  * 100 TB posture: the shuffle keys are single grams; candidate volume is
  * Σ_g df_prefix(g)², where df_prefix counts only PREFIX occurrences — the
  * rarest-first order drives hot "stop-grams" out of prefixes wherever a
  * string has anything rarer, which is the Ed-Join argument for why this
  * stays near-linear on natural text. No cap is applied (a cap would break
  * the exact-oracle guarantee); instead, a corpus whose gram alphabet is
  * too small to discriminate (zero-padded ids and the like — the measured
  * 100× scale-killer: 131 BILLION gram candidates at 1.5M such names) is
  * detected from the candidate-volume aggregate itself and rerouted to
  * the ≤k-DELETION SIGNATURE generator (FastSS / Mor–Fraenkel — see the
  * adaptive-generation block below and
  * [[graft.exprs.EditDistanceOps.deletionNeighborhood]]), which that
  * same corpus family keeps near-linear (~40·n candidates at any n).
  * Verification is the banded edit-distance kernel —
  * O(k·min(|l|,|r|)) per pair, not full DP — under either generator.
  * All stages are plain exchanges + codegen'd expressions.
  */
object FuzzyJoin {

  /** BMP guard at every entry point: the candidate generation counts in
    * CODE POINTS (Spark `length`, `substr` q-grams) while the verify
    * kernel ([[graft.exprs.EditDistanceOps.within]]) counts UTF-16 code
    * units — a supplementary-plane character makes the two disagree, and
    * the length band / gram-survival argument could then drop a pair the
    * kernel itself would accept (a false negative the no-false-negative
    * proof doesn't cover). Rather than silently weakening the exactness
    * contract, non-BMP input raises. The check is one codegen'd encode
    * per DISTINCT string (code-point length == code-unit length iff no
    * char is above U+FFFF), never per pair. */
  private def assertBmp(c: Column): Column =
    when(length(encode(c, "UTF-16BE")) =!= length(c) * 2,
      raise_error(concat(
        lit("FuzzyJoin: non-BMP string (code point above U+FFFF) — "),
        lit("the q-gram band arithmetic is code-point-based while the "),
        lit("verify kernel counts UTF-16 code units, so exactness is "),
        lit("only guaranteed for BMP text: "), c)))
      .otherwise(c)

  /** Distinct q-grams of a string column; empty array below length q
    * (guarded — Spark's `sequence(1, 0)` would count DOWN, not empty). */
  def qgrams(c: Column, q: Int): Column =
    when(length(c) < q, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), length(c) - (q - 1)),
          i => c.substr(i, lit(q)))))

  /** Strings with ≤ k·q distinct grams (length ≤ k·q+q−1) sit outside the
    * prefix-filter guarantee; they pair through the short block. */
  private def shortLen(q: Int, k: Int): Int = k * q + q - 1

  /** (s, g) prefix rows: each distinct string's first min(k·q+1, all)
    * grams under (df asc, gram asc), with df computed over `corpus` —
    * both join sides must rank against the SAME order, so callers pass
    * the union of their gram tables when the sides differ. */
  private def prefixRows(grams: DataFrame, dfTable: DataFrame, q: Int, k: Int): DataFrame = {
    val w = Window.partitionBy("s").orderBy(col("df"), col("g"))
    grams.join(dfTable, "g")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k * q + 1)
      .select("s", "g")
  }

  private def gramRows(names: DataFrame, q: Int): DataFrame =
    names.select(col("s"), explode(qgrams(col("s"), q)).as("g"))

  // ---------------------------------------------------------------------
  // Adaptive candidate generation (round 12). The gram-prefix scheme's
  // candidate volume is Σ_g C(df_prefix(g), 2) — near-linear on natural
  // text, but a corpus whose strings draw from a TINY gram alphabet
  // (e.g. zero-padded numeric ids: 101 distinct 2-grams however many
  // strings) degenerates toward n²/|alphabet|: measured 10.6M candidates
  // at 15k such names, 131 BILLION at 1.5M — a true 100× scale-killer.
  // For the small-k regime these joins run in, the ≤k-DELETION
  // NEIGHBORHOOD signature (FastSS / Mor–Fraenkel; see
  // [[graft.exprs.EditDistanceOps.deletionNeighborhood]] for the
  // no-false-negative proof) keys candidates by (len−k)-char signatures
  // whose buckets stay near-constant on exactly those corpora
  // (~40·n candidates at any n on the numeric-id family), at the price
  // of a (len+1)^k-factor signature explosion that natural long-string
  // corpora shouldn't pay. Neither dominates, so the generator is CHOSEN
  // FROM THE DATA, deterministically, with bounded decision cost:
  //  1. volG = exact gram-prefix candidate volume (one aggregate over
  //     the prefix table the plan needs anyway);
  //  2. if volG ≤ the deletion path's INPUT row bound (Σ |D≤k(s)|,
  //     computed from length stats alone) the gram plan is already no
  //     worse than the other path's floor — take it (the common case:
  //     natural text never reaches step 3);
  //  3. else pay one signature pass to compute volD exactly and take
  //     the smaller volume.
  // Both paths end in the same banded verify + output-sized distinct,
  // so the result is generator-independent (result-identical to the
  // naive quadratic oracle either way).
  // ---------------------------------------------------------------------

  /** Deletion signatures explode as (len+1)^k — beyond k=2 the gram
    * path is always taken. */
  private val MaxDeletionK = 2

  private def delSigs(names: DataFrame, k: Int): DataFrame =
    names.select(col("s"),
      explode(graft.exprs.functions.deletion_neighborhood(col("s"), k))
        .as("sig"))

  /** TWICE the upper bound on |D≤k(s)| from the length alone (doubled so
    * the k=2 triangular term stays in integer arithmetic — Spark's `/`
    * is fractional even on longs; the caller halves driver-side). */
  private def nbhdBound2x(len: Column, k: Int): Column = {
    val l = len.cast("long")
    k match {
      case 0 => lit(2L)
      case 1 => (l + 1L) * 2L
      case _ => lit(2L) + l * 2L + l * (l - 1L)
    }
  }

  /** Σ C(bucket, 2) over `key` buckets — the self-join candidate volume
    * (upper bound: ignores the length band). */
  private def pairVolumeSelf(keyed: DataFrame, key: String): Long =
    // Spark's `/` is fractional even on longs — halve driver-side
    keyed.groupBy(key).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") * (col("c") - 1L)), lit(0L)))
      .head().getLong(0) / 2L

  /** Σ cA·cB over shared `key` buckets — the two-sided volume. */
  private def pairVolumeMatch(a: DataFrame, b: DataFrame, key: String): Long =
    a.groupBy(key).agg(count(lit(1)).as("ca"))
      .join(b.groupBy(key).agg(count(lit(1)).as("cb")), key)
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)))
      .head().getLong(0)

  private def sigRowBound(names: DataFrame, k: Int): Long =
    names.agg(coalesce(sum(nbhdBound2x(length(col("s")), k)), lit(0L)))
      .head().getLong(0) / 2L

  /** The deterministic generator choice for a SELF join (exposed for
    * the plan spec): "grams" or "deletions". */
  private[graft] def selfGenerator(
      names: DataFrame, prefix: DataFrame, k: Int): String = {
    if (k > MaxDeletionK) return "grams"
    val volG = pairVolumeSelf(prefix, "g")
    if (volG <= sigRowBound(names, k)) return "grams"
    if (pairVolumeSelf(delSigs(names, k), "sig") < volG) "deletions"
    else "grams"
  }

  /** The generator choice for a probe-vs-catalog join. */
  private[graft] def matchGenerator(
      p: DataFrame, c: DataFrame,
      prefixP: DataFrame, prefixC: DataFrame, k: Int): String = {
    if (k > MaxDeletionK) return "grams"
    val volG = pairVolumeMatch(prefixP, prefixC, "g")
    if (volG <= sigRowBound(p, k) + sigRowBound(c, k)) return "grams"
    if (pairVolumeMatch(delSigs(p, k), delSigs(c, k), "sig") < volG)
      "deletions"
    else "grams"
  }

  /** All pairs (name_a < name_b) of distinct values of `column` within
    * edit distance k, with the distance. Result-identical to the naive
    * all-pairs `levenshtein` join (the DuckDB oracle) under EITHER
    * candidate generator — the generator is chosen from the data (see
    * the adaptive-generation block above). */
  def selfJoin(data: DataFrame, column: String, q: Int, k: Int): DataFrame = {
    val names = data.select(col(column).as("s"))
      .filter(col("s").isNotNull).distinct()
      .select(assertBmp(col("s")).as("s"))
    val g = gramRows(names, q)
    val dfTable = g.groupBy("g").agg(count(lit(1)).as("df"))
    val prefix = prefixRows(g, dfTable, q, k)
    if (selfGenerator(names, prefix, k) == "deletions") {
      // deletion-signature candidates: every true pair shares a ≤k-
      // deletion variant (proof at the kernel), so ONE equi-join on the
      // signature generates all of them; the length band still prunes
      // for free, and there is no short-string special case (signatures
      // cover every length exactly). The merge hint is load-bearing:
      // Catalyst's static size estimate does not model the (len+1)^k
      // explode fan-out, under-sizes the signature relation, and
      // broadcasts it — which OOMs the build-side hash map at exactly
      // the corpus sizes this path exists for (measured at the 100×
      // rehearsal). Sort-merge is the right physical join for two
      // corpus-scale sides; AQE may still downgrade to broadcast from
      // ACTUAL runtime sizes, which is safe.
      val sigs = delSigs(names, k)
      val cand = sigs.as("a").hint("merge").join(sigs.as("b"),
          col("a.sig") === col("b.sig") && col("a.s") < col("b.s") &&
            abs(length(col("a.s")) - length(col("b.s"))) <= k)
        .select(col("a.s").as("name_a"), col("b.s").as("name_b"))
      return verify(cand, "name_a", "name_b", k).distinct()
    }
    // length band is free (ed ≤ k ⟹ |len diff| ≤ k) and cuts candidates
    // before they exist as rows
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.s") < col("b.s") &&
          abs(length(col("a.s")) - length(col("b.s"))) <= k)
      .select(col("a.s").as("name_a"), col("b.s").as("name_b"))
    val shorts = names.filter(length(col("s")) <= shortLen(q, k))
    val shortPairs = shorts.as("a").join(shorts.as("b"),
        col("a.s") < col("b.s") &&
          abs(length(col("a.s")) - length(col("b.s"))) <= k)
      .select(col("a.s").as("name_a"), col("b.s").as("name_b"))
    // verify BEFORE dedup: the banded levenshtein is ~100 ns/candidate,
    // while a distinct over the raw candidate pairs is a full shuffle of
    // the (hot-gram-amplified) pair stream — measured 33 s vs 2 s at
    // sf0.1 on the adversarial constant-prefix names. Duplicated
    // candidates (pairs sharing several prefix grams, ≤ (kq+1)² of them)
    // re-verify cheaply and collapse in the output-sized distinct.
    verify(cand.union(shortPairs), "name_a", "name_b", k).distinct()
  }

  /** All (probe, candidate, dist) with ed ≤ k between distinct probe
    * strings and distinct catalog strings. Gram ranks are computed over
    * the UNION of both sides so the two prefixes share one global order. */
  def matchJoin(probes: DataFrame, probeCol: String,
      catalog: DataFrame, catCol: String, q: Int, k: Int): DataFrame = {
    val p = probes.select(col(probeCol).as("s"))
      .filter(col("s").isNotNull).distinct()
      .select(assertBmp(col("s")).as("s"))
    val c = catalog.select(col(catCol).as("s"))
      .filter(col("s").isNotNull).distinct()
      .select(assertBmp(col("s")).as("s"))
    val pg = gramRows(p, q)
    val cg = gramRows(c, q)
    val dfTable = pg.union(cg).groupBy("g").agg(count(lit(1)).as("df"))
    val prefixP = prefixRows(pg, dfTable, q, k)
    val prefixC = prefixRows(cg, dfTable, q, k)
    if (matchGenerator(p, c, prefixP, prefixC, k) == "deletions") {
      // merge hint: see selfJoin — static stats under-size the explode
      val cand = delSigs(p, k).as("a").hint("merge")
        .join(delSigs(c, k).as("b"),
          col("a.sig") === col("b.sig") &&
            abs(length(col("a.s")) - length(col("b.s"))) <= k)
        .select(col("a.s").as("probe"), col("b.s").as("candidate"))
      return verify(cand, "probe", "candidate", k).distinct()
    }
    val cand = prefixP.as("a")
      .join(prefixC.as("b"),
        col("a.g") === col("b.g") &&
          abs(length(col("a.s")) - length(col("b.s"))) <= k)
      .select(col("a.s").as("probe"), col("b.s").as("candidate"))
    val shortPairs = p.filter(length(col("s")) <= shortLen(q, k)).as("a")
      .join(c.filter(length(col("s")) <= shortLen(q, k)).as("b"),
        abs(length(col("a.s")) - length(col("b.s"))) <= k)
      .select(col("a.s").as("probe"), col("b.s").as("candidate"))
    // verify-then-distinct: see selfJoin — dedup the output, not the
    // hot-gram-amplified candidate stream
    verify(cand.union(shortPairs), "probe", "candidate", k).distinct()
  }

  /** Banded verification: Spark's threshold form returns −1 above k, so
    * the per-pair cost is O(k·len), not the full DP table. */
  /** Distinct-gram ceiling for [[matchStream]]'s plan-literal df map —
    * the same plan-literal discipline as the streaming Bloom filter's
    * bitmap ceiling: beyond it, the map rides every serialized task. */
  private val MaxStreamCatalogGrams = 65536

  /** STREAM-STATIC fuzzy match: a streaming probe column resolved
    * against a static catalog — live entity lookup at ingest. The
    * catalog is SNAPSHOTTED at stream construction: its distinct names
    * are written once to a frozen parquet sibling of nothing the caller
    * owns (a temp dir that lives as long as the stream), and BOTH order
    * sources — the df map embedded as a probe-side plan literal AND the
    * per-micro-batch catalog prefix index — derive from that one
    * snapshot. Without the freeze, the two sides would read the LIVE
    * catalog dir independently (the literal once, the static plan per
    * micro-batch), and a catalog mutation mid-stream would rank the two
    * prefixes against DIFFERENT gram orders — the no-false-negative
    * theorem needs ONE consistent order. With it, a mutated catalog dir
    * simply keeps serving the construction-time snapshot, consistently.
    *
    * The probe side computes its OWN prefix per row, with no streaming
    * aggregation: probe grams rank against the snapshot's df map
    * (bounded by [[MaxStreamCatalogGrams]] distinct grams — tiny for
    * q=2), sorted inside an array. The global order comes from the
    * CATALOG ALONE — a stream can't be df-counted up front, and the
    * prefix-filter theorem holds under ANY one consistent order; grams
    * unseen in the catalog take df 0 and merely occupy prefix slots.
    * Candidate dedup is a windowed (probe, candidate) aggregate —
    * bounded state, append emission on watermark close.
    *
    * The stream side stays GRAM-PREFIX by design (no adaptive reroute):
    * the deletion generator's decision passes need corpus statistics a
    * stream cannot pay per micro-batch, and the plan-literal gram
    * ceiling already bounds the catalog family this builder accepts —
    * a degenerate catalog beyond it is directed to batch matchJoin by
    * the ceiling's require.
    *
    * @return (win_start, probe, candidate, dist) per closed window */
  def matchStream(probes: DataFrame, tsCol: String, probeCol: String,
      catalog: DataFrame, catCol: String, q: Int, k: Int,
      win: String = "10 seconds", delay: String = "10 seconds"): DataFrame = {
    val spark = catalog.sparkSession
    // freeze the catalog: one read of the live source, one parquet write;
    // every downstream plan (literal + per-batch static side) reads the
    // frozen files, so no later catalog mutation can split the order
    val snapDir = java.nio.file.Files
      .createTempDirectory("graft-fuzzy-catsnap").toString
    // the snapshot lives as long as the stream (its plans keep reading
    // it); it is collected at JVM exit rather than leaked across runs
    sys.addShutdownHook(graft.storage.ParquetLogBackend
      .deleteRecursively(java.nio.file.Paths.get(snapDir)))
    catalog.select(col(catCol).as("s"))
      .filter(col("s").isNotNull).distinct()
      .select(assertBmp(col("s")).as("s"))
      .write.mode("overwrite").parquet(snapDir)
    val c = spark.read.parquet(snapDir)
    val cg = gramRows(c, q)
    val dfTable = cg.groupBy("g").agg(count(lit(1)).as("df"))
    val catPrefix = prefixRows(cg, dfTable, q, k)
    val catShort = c.filter(length(col("s")) <= shortLen(q, k))
    val dfRows = dfTable.collect() // ≤ catalog distinct grams, checked:
    require(dfRows.length <= MaxStreamCatalogGrams,
      s"catalog has ${dfRows.length} distinct $q-grams — beyond the " +
        s"$MaxStreamCatalogGrams plan-literal ceiling; use batch matchJoin")
    val dfLit = typedLit(
      dfRows.map(r => r.getString(0) -> r.getLong(1)).toMap)
    val pRows = probes
      .select(col(tsCol).cast("timestamp").as("__ts"),
        assertBmp(col(probeCol)).as("s"))
      .filter(col("s").isNotNull)
      .withWatermark("__ts", delay)
    val probePrefix = pRows
      .withColumn("ranked", slice(array_sort(
        transform(qgrams(col("s"), q), g =>
          struct(coalesce(element_at(dfLit, g), lit(0L)).as("df"),
            g.as("g")))), 1, k * q + 1))
      .select(col("__ts"), col("s"), explode(col("ranked")).as("t"))
      .select(col("__ts"), col("s"), col("t.g").as("g"))
    val cand = probePrefix.as("a")
      .join(catPrefix.as("b"),
        col("a.g") === col("b.g") &&
          abs(length(col("a.s")) - length(col("b.s"))) <= k)
      .select(col("__ts"), col("a.s").as("probe"), col("b.s").as("candidate"))
    val shortPairs = pRows
      .filter(length(col("s")) <= shortLen(q, k)).as("a")
      .join(catShort.as("b"),
        abs(length(col("a.s")) - length(col("b.s"))) <= k)
      .select(col("__ts"), col("a.s").as("probe"), col("b.s").as("candidate"))
    verify(cand.unionByName(shortPairs), "probe", "candidate", k)
      .groupBy(window(col("__ts"), win), col("probe"), col("candidate"))
      .agg(min(col("dist")).as("dist"))
      .select(col("window.start").as("win_start"),
        col("probe"), col("candidate"), col("dist"))
  }

  /** Banded verification through the native kernel
    * ([[graft.exprs.EditDistanceOps.within]]): distance if ≤ k, else −1.
    * Spark's built-in `levenshtein(l, r, threshold)` measured ~3.4 µs per
    * pair on the sf0.1 verify hot path (10.6M candidates → 35 s); the
    * codegen'd band runs the same semantics an order of magnitude
    * faster — verification IS the fuzzy join's inner loop at scale. */
  private def verify(pairs: DataFrame, a: String, b: String, k: Int): DataFrame =
    pairs
      // long, not int: DuckDB's levenshtein is BIGINT and the driver's
      // result hash is dtype-sensitive
      .withColumn("dist",
        graft.exprs.functions.edit_distance_within(col(a), col(b), k)
          .cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= k)
}
