package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1 scale rehearsal (BENCH_TREND.md "sf1 spot check"): upsamples the
  * sf0.1 documents table 10× and runs the worst-shuffle operator family at
  * both scales, printing measured slope vs the linear-work prediction from
  * SCALING.md.
  *
  * Upsample shape: 10 copies per document, each with a distinct copy token
  * appended — copies are NEAR-duplicates (not exact), so the near-dup
  * operators see the realistic heavy case (every document sits in a
  * 10-clique) while exact dedup still has work to do within each copy.
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docsOut = new java.io.File(s"$out/documents.parquet")
    if (!docsOut.exists()) {
      val d = spark.read.parquet(s"$base/documents.parquet")
      val stride = d.agg(max(col("doc_id"))).head().getLong(0) + 1L
      d.crossJoin(spark.range(10).toDF("cp"))
        .select(
          (col("doc_id") + col("cp") * stride).as("doc_id"),
          concat(col("text"), lit(" cp"), col("cp")).as("text"),
          col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
    }

    val worst = Seq( // the worst shuffles per SCALING.md + VERDICT r06,
      // plus the composed pipeline (the heaviest chain in the repo)
      "dedup_span_exact", "dedup_span_overlap", "dedup_minhash_lsh",
      "dedup_ngram_jaccard", "dedup_clusters", "pack_sequences",
      "pipeline_span_scrub", "pipeline_pretrain_corpus")
    val all = graft.SparkEntry.queries

    def timeAt(dir: String, name: String): Double = {
      val t0 = System.nanoTime()
      all(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }

    // one untimed warmup per query (codegen + JIT), then the timed pass
    worst.foreach { q => timeAt(base, q); timeAt(out, q) }
    println(f"${"query"}%-24s ${"sf0.1"}%8s ${"sf1"}%8s  ratio (10x rows)")
    worst.foreach { q =>
      val a = timeAt(base, q)
      val b = timeAt(out, q)
      println(f"$q%-24s $a%8.2f $b%8.2f  ${b / a}%5.1fx")
    }
    spark.stop()
  }
}
