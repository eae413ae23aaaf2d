package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the dedup pipelines at sf0.1. */
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
    // warmup
    spark.read.parquet(s"$dir/documents.parquet").count()

    val q = graft.queries.Dedup.queries
    t("warm lsh")(q("dedup_minhash_lsh")(spark, dir).count())
    t("lsh again")(q("dedup_minhash_lsh")(spark, dir).count())
    t("jaccard")(q("dedup_ngram_jaccard")(spark, dir).count())

    // stages
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val words = d.select(col("doc_id"),
      posexplode(split(col("text"), "\\s+")).as(Seq("pos", "word")))
    t("posexplode")(words.count())
    import org.apache.spark.sql.expressions.Window
    val wd = Window.partitionBy("doc_id").orderBy("pos")
    val nw = Window.partitionBy("doc_id")
    val sh = words
      .withColumn("w1", lead(col("word"), 1).over(wd))
      .withColumn("w2", lead(col("word"), 2).over(wd))
      .withColumn("n", count(lit(1)).over(nw))
      .withColumn("s", concat_ws(" ", col("word"), col("w1"), col("w2")))
      .filter((col("n") >= 3 && col("w2").isNotNull)
        || (col("n") < 3 && col("pos") === 0))
      .select(col("doc_id"), col("s"))
    t("shingleRows")(sh.count())
    val hashed = sh.select(col("doc_id"),
      conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("h"))
    t("hashed")(hashed.count())
    val mins = hashed.groupBy("doc_id")
      .agg(array((0 until 12).map(j =>
        min((col("h") * (j * 2 + 1) + lit(j.toLong * 12582917L)) % 2147483647L)): _*)
        .as("mins"))
    t("minhashTable")(mins.count())
    t("distinct shingles")(sh.distinct().count())
    val tt = sh.distinct()
    t("inverted-index join")(
      tt.as("x").join(tt.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id")).count())
    spark.stop()
  }
}
