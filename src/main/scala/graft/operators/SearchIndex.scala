package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A persisted LEXICAL search index: the inverted (token → postings)
  * relation with precomputed fixed-point IDF — the text analog of
  * [[IvfIndex]]'s build-once / load-anywhere / query-many lifecycle, so a
  * serving tier never rescans the corpus (`search_tfidf` is the ad-hoc
  * one-shot; this is the artifact).
  *
  * Scale shape:
  *  - build: one corpus scan — token explode, per-(doc, token) counts
  *    collapse map-side, one df aggregate joined back for idf. The
  *    postings relation is corpus-sized (Σ distinct (doc, token)); the
  *    idf rides each posting as a precomputed fixed-point weight so query
  *    time does ZERO model work.
  *  - save: `partitionBy(tbucket)` where tbucket = xxhash64(token) mod
  *    [[SearchIndex.TokenBuckets]] — a query's terms map to bucket
  *    literals driver-side, so the scan statically prunes to the probed
  *    buckets' files: a k-term query touches ≤ k/64 of the index however
  *    large the corpus (the inverted-list property, on disk).
  *  - search: terms filter inside the pruned scan, per-doc score is one
  *    map-side partial sum of `cnt × idf_q6` (exact BIGINTs, the
  *    search_tfidf discipline), top-k is TakeOrdered — never a global
  *    sort.
  */
final class SearchIndex private[operators] (
    val postings: DataFrame, // (token, tbucket, doc_id, cnt, idf_q6)
    val nDocs: Long) {

  def save(dir: String): Unit = {
    val spark = postings.sparkSession
    import spark.implicits._
    postings.write.mode("overwrite")
      .partitionBy("tbucket").parquet(s"$dir/postings")
    Seq(nDocs).toDF("n_docs")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }
}

object SearchIndex {

  /** Token-hash partition fan-out of the persisted postings. 64 buckets
    * keeps per-bucket file counts planner-friendly while a one-term query
    * still prunes 63/64 of the index. */
  val TokenBuckets = 64

  private def bucketOf(token: org.apache.spark.sql.Column) =
    pmod(xxhash64(token), lit(TokenBuckets.toLong))

  /** Build from (doc_id, text): whitespace tokens (the text family's
    * `split("\\s+")` contract), IDF = floor(ln(nDocs/df) · 1e6) — the
    * exact search_tfidf arithmetic, precomputed per token. */
  def build(docs: DataFrame): SearchIndex = {
    val d = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val nDocs = d.count()
    val tf = d.select(col("doc_id"),
        explode(split(col("text"), "\\s+")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
    val idf = tf.groupBy("token")
      .agg(countDistinct(col("doc_id")).as("df"))
      .select(col("token"),
        floor(log(lit(nDocs).cast("double") / col("df").cast("double"))
          * 1000000L).cast("long").as("idf_q6"))
    val postings = tf.join(idf, "token")
      .select(col("token"), bucketOf(col("token")).as("tbucket"),
        col("doc_id"), col("cnt"), col("idf_q6"))
    new SearchIndex(postings, nDocs)
  }

  def load(spark: SparkSession, dir: String): SearchIndex = {
    val n = spark.read.parquet(s"$dir/meta").head().getLong(0)
    new SearchIndex(spark.read.parquet(s"$dir/postings"), n)
  }

  /** Top-`topK` documents for `terms` by summed TF-IDF. The bucket
    * literals are computed DRIVER-side so the postings scan partition-
    * prunes before the token filter runs. */
  def search(
      idx: SearchIndex, terms: Seq[String], topK: Int): DataFrame = {
    val buckets = terms.map { t =>
      // mirror xxhash64(token) % TokenBuckets driver-side
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.fromString(t), 42L)
      java.lang.Math.floorMod(h, TokenBuckets.toLong)
    }.distinct
    idx.postings
      .filter(col("tbucket").isin(buckets: _*))
      .filter(col("token").isin(terms: _*))
      .groupBy("doc_id")
      .agg(sum(col("cnt") * col("idf_q6")).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(topK)
      .select("doc_id", "score")
  }
}
