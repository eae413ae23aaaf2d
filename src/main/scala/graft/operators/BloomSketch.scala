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
  /** Filter size in bits (2^20): 5 hex chars per position. */
  val Bits: Int = 1 << 20

  /** First hash position of an md5 hex column: bits 0..19 of the digest. */
  def pos1(h: Column): Column = conv(substring(h, 1, 5), 16, 10).cast("long")

  /** Second hash position: the next 20 digest bits. */
  def pos2(h: Column): Column = conv(substring(h, 6, 5), 16, 10).cast("long")

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
