package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared Bloom-filter construction for the decontamination operators
  * (batch `decontaminate_bloom`, streaming `decontaminateStream`): 2^20
  * bits, two hash positions per key from md5 slices, masks aggregated per
  * word with `bit_or`. One definition so the batch and streaming filters
  * can never drift in hash slicing or bit layout; word size is the ONE
  * intentional difference (batch joins 64-bit masks; streaming embeds a
  * literal and uses 32-bit words so every bit test stays exact positive
  * arithmetic), so it is a parameter, not a fork.
  */
object BloomSketch {
  /** Filter size in bits — THE scaling knob (SCALING.md): a 10^9-shingle
    * benchmark wants 2^34 for ~1% FP. Must be a power of 16 so positions
    * slice whole hex digits; everything below derives from it. */
  val Bits: Long = 1L << 20

  /** Hex digits per position (= log16 Bits). */
  private[graft] val HexChars: Int = {
    val h = java.lang.Long.numberOfTrailingZeros(Bits) / 4
    require(1L << (h * 4) == Bits, "BloomSketch.Bits must be a power of 16")
    h
  }

  /** First hash position of an md5 hex column: digest bits 0..log2(Bits). */
  def pos1(h: Column): Column =
    conv(substring(h, 1, HexChars), 16, 10).cast("long")

  /** Second hash position: the next log2(Bits) digest bits. */
  def pos2(h: Column): Column =
    conv(substring(h, 1 + HexChars, HexChars), 16, 10).cast("long")

  /** (word, mask) relation of the set bits for the given md5-hex keys:
    * at most Bits/wordBits rows whatever the input size. */
  def maskRelation(md5Keys: DataFrame, wordBits: Int): DataFrame = {
    val h = md5Keys.columns.head
    md5Keys
      .select(explode(array(pos1(col(h)), pos2(col(h)))).as("p"))
      .distinct()
      .select(expr(s"p DIV $wordBits").as("word"),
        expr(s"shiftleft(1L, CAST(p % $wordBits AS INT))").as("m"))
      .groupBy("word").agg(expr("bit_or(m)").as("mask"))
  }
}
