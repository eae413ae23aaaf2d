package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the minhash-LSH pipeline. */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val w = split(col("text"), "\\s+")
    val sh = when(size(w) < 3, array(array_join(w, " ")))
      .otherwise(transform(sequence(lit(1), size(w) - 2), i =>
        concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
    val hs = transform(sh, sg => conv(substring(md5(sg), 1, 8), 16, 10).cast("long"))
    val mins = transform(sequence(lit(0), lit(11)), j =>
      array_min(transform(hs, h => ((j * 2 + 1) * h + j * 12582917L) % 2147483647L)))
    t("shingles only")(d.select(col("doc_id"), sh.as("x")).agg(sum(size(col("x")))).collect())
    t("hashes")(d.select(col("doc_id"), hs.as("x")).agg(sum(size(col("x")))).collect())
    t("mins")(d.select(col("doc_id"), mins.as("x")).agg(sum(size(col("x")))).collect())
    val minsDf = d.select(col("doc_id"), mins.as("mins"))
    val bands = minsDf.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(2)), b =>
        struct(b.as("band"), concat_ws("|",
          (0 until 4).map(r => element_at(col("mins"), b * 4 + r + 1)): _*).as("bkey"))))
        .as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    t("bands")(bands.count())
    val cand = bands.select(col("doc_id").as("doc_a"), col("band"), col("bkey"))
      .join(bands.select(col("doc_id").as("doc_b"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    t("cand")(cand.count())
    spark.stop()
  }
}
