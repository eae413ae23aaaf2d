package graft.tools

import graft.operators.PackState
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-measurement for the round-16 closed-bins tier: packs the SAME
  * sequence of fixed-size drops into two PackStates — closeBelow = 0
  * (the pre-round-16 layout, every bin ever opened re-emitted in every
  * snapshot) and closeBelow = 8 — and prints each drop's `bins/`
  * snapshot row count (the per-drop rewrite volume) plus the final
  * training-row count of both states. The closeBelow=0 column grows
  * linearly with drops-so-far (the round-15 `weak`); the closeBelow=8
  * column stays bounded by the drop's own fill frontier.
  *
  * `PackSnapshotMicro [drops] [docsPerDrop]` — defaults 8 drops × 4096
  * docs. Doc sizes are a deterministic LCG over [1, L-1] (short-doc
  * heavy, the shape that keeps bins open longest).
  */
object PackSnapshotMicro {
  def main(args: Array[String]): Unit = {
    val drops = args.headOption.map(_.toInt).getOrElse(8)
    val docsPerDrop = args.drop(1).headOption.map(_.toInt).getOrElse(4096)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val L = 128
    def params(close: Int) = PackState.Params(
      seqLen = L, eosId = 98, padId = 99, buckets = 8, closeBelow = close)
    def drop(i: Int) = {
      val base = i.toLong * docsPerDrop
      (0 until docsPerDrop).map { j =>
        val id = base + j
        // LCG size in [1, L-1], biased short (mod then halve sometimes)
        val x = ((id * 6364136223846793005L + 1442695040888963407L) >>> 33)
        val n = (1 + (x % (L - 1))).toInt
        (id, (1 to n).map(_.toInt))
      }.toDF("doc_id", "token_ids")
    }
    val dir0 = java.nio.file.Files
      .createTempDirectory("graft-packsnap0").toString
    val dir8 = java.nio.file.Files
      .createTempDirectory("graft-packsnap8").toString
    println(f"${"drop"}%6s ${"bins0"}%10s ${"bins8"}%10s ${"closed8"}%10s")
    (0 until drops).foreach { i =>
      val d = drop(i)
      val h0 = PackState.pack(spark, dir0, d, s"d$i", params(0))
      val h8 = PackState.pack(spark, dir8, d, s"d$i", params(8))
      val b0 = PackState.bins(spark, h0).count()
      val b8 = PackState.bins(spark, h8).count()
      val c8 = PackState.binsClosed(spark, h8).count()
      println(f"${i + 1}%6d $b0%10d $b8%10d $c8%10d")
    }
    val t0 = PackState.trainingRows(spark,
      PackState.load(dir0, params(0))).count()
    val t8 = PackState.trainingRows(spark,
      PackState.load(dir8, params(8))).count()
    println(s"training rows: closeBelow=0 -> $t0, closeBelow=8 -> $t8")
    spark.stop()
  }
}
