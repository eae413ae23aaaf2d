package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared Bloom-filter construction for the decontamination operators
  * (batch `decontaminate_bloom`, streaming `decontaminateStream`): two
  * hash positions per key from md5 slices, masks aggregated per word with
  * `bit_or`. One definition so the batch and streaming filters can never
  * drift in hash slicing or bit layout; word size is the ONE intentional
  * difference (batch joins 64-bit masks; streaming embeds a literal and
  * uses 32-bit words so every bit test stays exact positive arithmetic),
  * so it is a parameter, not a fork.
  *
  * Capacity is a RUNTIME parameter (`bits`), not a compile-time constant:
  * a 10^9-shingle benchmark wants 16^9 = 2^36 bits for ~1% FP (SCALING.md;
  * capacities are powers of 16, so 2^36 is the first admissible size) and
  * "recompile to resize" is not a deployable operator. Every position
  * width derives from the one value, and because positions are hex-PREFIX
  * slices of the same digest, growing `bits` only extends each position —
  * a collision at a larger filter is always a collision at a smaller one,
  * so flagged sets shrink monotonically as capacity grows (spec-asserted).
  */
object BloomSketch {
  /** Default filter size in bits: 2^20 ≈ 131 KiB — comfortably broadcast-
    * and literal-embeddable, ~0.04% FP at 10^4 benchmark shingles. */
  val DefaultBits: Long = 1L << 20

  /** Hex digits per position (= log16 bits). Powers of 16 only, so
    * positions slice whole hex digits; ceiling 16^12 = 2^48 keeps a
    * position comfortably inside a Long AND inside the exact-integer
    * range of the oracle's double fold (a*16+b over ≤12 digits < 2^53),
    * while two positions use ≤24 of md5's 32 hex chars. */
  def hexChars(bits: Long): Int = {
    val h = java.lang.Long.numberOfTrailingZeros(bits) / 4
    require(h >= 1 && h <= 12 && (1L << (h * 4)) == bits,
      s"Bloom bits must be a power of 16 in [16, 16^12]; got $bits")
    h
  }

  /** Default-capacity hex width (oracle-side mirrors derive from this). */
  val HexChars: Int = hexChars(DefaultBits)

  /** First hash position of an md5 hex column: digest bits 0..log2(bits). */
  def pos1(h: Column, bits: Long = DefaultBits): Column =
    conv(substring(h, 1, hexChars(bits)), 16, 10).cast("long")

  /** Second hash position: the next log2(bits) digest bits. */
  def pos2(h: Column, bits: Long = DefaultBits): Column = {
    val hc = hexChars(bits)
    conv(substring(h, 1 + hc, hc), 16, 10).cast("long")
  }

  /** Per-document contamination card from a (doc_id, h) shingle-hash
    * relation probed against a 64-bit-word (word, mask) Bloom relation:
    * `(doc_id, n_shingles, n_flagged, flagged_frac)`, flagged-docs only —
    * the decontaminate_bloom probe shape, factored so the single-shot
    * entry and the persisted [[DecontamRegistry]] can never drift. The
    * words relation is ≤ bits/64 rows and broadcast twice (one lookup
    * per hash position); the per-doc shingle count rides a doc_id
    * window over the probe rows. */
  def flagCard(
      sh: DataFrame, words: DataFrame, bits: Long = DefaultBits)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    sh
      .withColumn("p1", pos1(col("h"), bits))
      .withColumn("p2", pos2(col("h"), bits))
      .withColumn("n_shingles",
        count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .withColumn("w1", expr("p1 DIV 64"))
      .withColumn("w2", expr("p2 DIV 64"))
      .join(broadcast(words.select(col("word").as("w1"),
        col("mask").as("mask1"))), Seq("w1"), "left")
      .join(broadcast(words.select(col("word").as("w2"),
        col("mask").as("mask2"))), Seq("w2"), "left")
      .filter(
        expr("coalesce(shiftright(mask1, CAST(p1 % 64 AS INT)) & 1, 0L) = 1")
          && expr(
          "coalesce(shiftright(mask2, CAST(p2 % 64 AS INT)) & 1, 0L) = 1"))
      .groupBy("doc_id")
      .agg(max(col("n_shingles")).as("n_shingles"),
        count(lit(1)).as("n_flagged"))
      .withColumn("flagged_frac",
        col("n_flagged").cast("double") / col("n_shingles"))
      .select("doc_id", "n_shingles", "n_flagged", "flagged_frac")
  }

  /** (word, mask) relation of the set bits for the given md5-hex keys:
    * at most bits/wordBits rows whatever the input size. */
  def maskRelation(
      md5Keys: DataFrame, wordBits: Int,
      bits: Long = DefaultBits): DataFrame = {
    val h = md5Keys.columns.head
    md5Keys
      .select(explode(array(pos1(col(h), bits), pos2(col(h), bits))).as("p"))
      .distinct()
      .select(expr(s"p DIV $wordBits").as("word"),
        expr(s"shiftleft(1L, CAST(p % $wordBits AS INT))").as("m"))
      .groupBy("word").agg(expr("bit_or(m)").as("mask"))
  }
}
