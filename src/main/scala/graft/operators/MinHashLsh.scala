package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** The shared MinHash-LSH candidate machinery: signatures, banded keys,
  * hot-bucket caps, and verified within-relation pairs. One definition so
  * the batch dedup family ([[graft.queries.Dedup]]), its pipeline
  * compositions, and the incremental intake state ([[DedupState]]) can
  * never drift in shingling, hash family, banding, caps, or the verify
  * threshold — the DuckDB oracles mirror exactly one derivation.
  *
  * Scale shape (unchanged from the Dedup original): the signature is
  * computed inside the scan stage by the fused
  * [[graft.exprs.TextOps.minhash12]] kernel (no explode, no groupBy);
  * band keys are 8-byte xxhash64s of each band's minhash slice; hot
  * buckets are capped so no (band, key) bucket can turn a candidate join
  * quadratic; verification compares the signatures that RIDE the band
  * rows, so no extra shuffle re-attaches them.
  */
object MinHashLsh {

  /** Signature width (minhash count per document). */
  val NumHashes = 12

  /** LSH bands over the signature; [[RowsPerBand]] minhashes each. */
  val NumBands = 3

  val RowsPerBand: Int = NumHashes / NumBands

  /** Hot-bucket cap: a candidate bucket of size n yields n²/2 pairs, so
    * one pathological bucket (boilerplate band key, giant duplicate
    * cluster) turns the verify join quadratic at scale. Buckets over the
    * cap are DROPPED — the standard web-dedup trade: members of a giant
    * cluster are still caught by exact dedup, and a band key shared by
    * >64 docs carries no similarity signal. Oracles apply the same cap. */
  val MaxBandBucket = 64

  /** Verified-near-duplicate threshold on estimated Jaccard (agreeing
    * minhashes / [[NumHashes]]). */
  val VerifyThreshold = 0.5

  private def toks(c: Column): Column = split(c, "\\s+")

  /** MinHash signature table `(doc_id, mins array<long>[12])` over a
    * documents relation `(doc_id, text, ...)`. Null-text docs are dropped
    * (they have no shingles; exact dedup still sees them). */
  def signaturesOf(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.exprs.functions.minhash12(toks(col("text"))).as("mins"))

  /** Banded keys `(doc_id, mins, band, bkey)` of a signature relation —
    * band key = xxhash64 of the band's [[RowsPerBand]] minhashes: an
    * 8-byte shuffle key instead of a concatenated string (same buckets;
    * 64-bit collisions are ~n²/2⁶⁴ — negligible, and verification filters
    * false candidates). Signatures ride the band rows. */
  def bandsOf(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("mins"),
      explode(transform(sequence(lit(0), lit(NumBands - 1)), b =>
        struct(b.as("band"), xxhash64(
          (0 until RowsPerBand).map(r =>
            element_at(col("mins"), b * RowsPerBand + r + 1)): _*).as("bkey"))))
        .as("bk"))
      .select(col("doc_id"), col("mins"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))

  /** [[bandsOf]] with the hot-bucket cap applied WITHIN the given
    * relation: buckets holding more than [[MaxBandBucket]] of its rows are
    * dropped. The bucket-size count shuffles on (band, bkey) — the same
    * keys any downstream candidate join needs, so both sides of a
    * self-join still collapse into one exchange via reuse. */
  def cappedBandsOf(sigs: DataFrame): DataFrame = {
    val wb = Window.partitionBy(col("band"), col("bkey"))
    bandsOf(sigs)
      .withColumn("bsz", count(lit(1)).over(wb))
      .filter(col("bsz") <= MaxBandBucket)
      .drop("bsz")
  }

  /** Estimated Jaccard from two signatures: agreeing positions / width. */
  def simEst(minsA: Column, minsB: Column): Column =
    size(filter(sequence(lit(1), lit(NumHashes)), i =>
      element_at(minsA, i) === element_at(minsB, i))) /
      lit(NumHashes.toDouble)

  /** Verified near-dup pairs within one signature relation:
    * `(doc_a, doc_b, sim_est)` with doc_a < doc_b and sim_est >=
    * [[VerifyThreshold]]. Capped-band bucket self-join for candidates,
    * signature agreement for verification. */
  def pairsFromSigs(sigs: DataFrame): DataFrame = {
    val capped = cappedBandsOf(sigs)
    capped.select(col("doc_id").as("doc_a"), col("mins").as("mins_a"),
        col("band"), col("bkey"))
      .join(capped.select(col("doc_id").as("doc_b"), col("mins").as("mins_b"),
        col("band"), col("bkey")), Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "mins_a", "mins_b").distinct()
      .withColumn("sim_est", simEst(col("mins_a"), col("mins_b")))
      .filter(col("sim_est") >= VerifyThreshold)
      .select("doc_a", "doc_b", "sim_est")
  }

  /** [[pairsFromSigs]] over a documents relation. */
  def pairsOf(docs: DataFrame): DataFrame = pairsFromSigs(signaturesOf(docs))
}
