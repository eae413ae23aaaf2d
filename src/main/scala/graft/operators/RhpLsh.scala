package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Random-hyperplane LSH for embedding vectors (SimHash for vectors),
  * factored from the Dedup queries so the batch embedding-dedup family
  * and the incremental intake state ([[DedupState]]'s semantic tier)
  * share ONE definition of planes, banding, caps, and the verify
  * threshold — the same never-drift argument as [[MinHashLsh]].
  *
  * 32 sign bits in 4 bands of 8: bit agreement P = 1 − θ/π, so a
  * cosine-0.8 pair collides in a band with P ≈ 0.16 and in ≥1 of 4 with
  * P ≈ 0.5 — tunable recall — while unrelated pairs pass at ~4/256.
  * Candidates are verified by EXACT cosine, so banding costs recall,
  * never precision. The hyperplane matrix is ±1 Rademacher from md5
  * parity, deterministically derived so the DuckDB oracles inline the
  * IDENTICAL matrix.
  */
object RhpLsh {

  val Planes = 32
  val Bands = 4

  /** Embeddings-table dimensionality (TESTDATA.md). */
  val Dim = 64

  /** Shared hot-bucket cap (same trade as [[MinHashLsh.MaxBandBucket]]). */
  val MaxBandBucket: Int = MinHashLsh.MaxBandBucket

  /** Verified-near-duplicate threshold on exact cosine. */
  val VerifyCosine = 0.4

  /** ±1 Rademacher hyperplane weight, md5-parity seeded (`rhp_<p>_<i>`). */
  def sign(p: Int, i: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rhp_${p}_$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if ((h(0) & 1) == 1) 1.0 else -1.0
  }

  /** Fused-loop dot — the same left fold the oracle SQL renders, so
    * cosines stay cross-engine bit-exact (the Similarity discipline). */
  private def dot(a: Column, b: Column): Column =
    graft.exprs.functions.dot_product(a, b)

  /** Adds `nrm` (L2 norm, computed once and carried) and `sig` (the
    * packed 32-bit hyperplane signature) to a relation with vector
    * column `v`. Every other column passes through. */
  def withSig(e: DataFrame): DataFrame =
    e.withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .withColumn("sig",
        (0 until Planes).map { p =>
          val w = array((0 until Dim).map(i => lit(sign(p, i))): _*)
          when(dot(col("v"), w) >= 0d, lit(1L << p)).otherwise(0L)
        }.reduce(_ + _))

  /** Explodes a [[withSig]] relation into its band rows `(…, b, bkey)`. */
  def bandsOf(sigRel: DataFrame): DataFrame =
    sigRel.select(col("*"),
      explode(sequence(lit(0), lit(Bands - 1))).as("b"))
      .withColumn("bkey",
        expr("(sig div CAST(pow(2, b * 8) AS BIGINT)) % 256"))

  /** [[bandsOf]] with the hot-bucket cap applied WITHIN the given
    * relation. */
  def cappedBandsOf(sigRel: DataFrame): DataFrame = {
    val wb = Window.partitionBy(col("b"), col("bkey"))
    bandsOf(sigRel)
      .withColumn("bsz", count(lit(1)).over(wb))
      .filter(col("bsz") <= MaxBandBucket)
      .drop("bsz")
  }

  /** Exact cosine from a pair dot and precomputed norms — identical bits
    * to the Similarity queries' cosinePre (same values, same operation
    * order). */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Verified near-dup pairs within one `(doc_id, v)` relation:
    * `(doc_a, doc_b, cosine)` with doc_a < doc_b and cosine >=
    * [[VerifyCosine]]. Capped-band bucket self-join for candidates,
    * exact cosine for verification; vectors and norms RIDE the band rows
    * (no re-attach shuffle). */
  def pairsOf(e: DataFrame): DataFrame = {
    val capped = cappedBandsOf(withSig(e))
    capped.select(col("doc_id").as("doc_a"), col("v").as("va"),
        col("nrm").as("na"), col("b"), col("bkey"))
      .join(capped.select(col("doc_id").as("doc_b"), col("v").as("vb"),
        col("nrm").as("nb"), col("b"), col("bkey")), Seq("b", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "va", "vb", "na", "nb").distinct()
      .withColumn("cosine",
        cosinePre(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cosine") >= VerifyCosine)
      .select("doc_a", "doc_b", "cosine")
  }
}
