package graft

import graft.operators.SearchIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted lexical index lifecycle: build → save → load answers match
  * the ad-hoc search_tfidf query bit-for-bit (the oracle also gates the
  * query entry), the driver-side bucket mirror agrees with the engine's
  * xxhash64, and the postings scan statically prunes to the query terms'
  * buckets — the property that makes a k-term query touch ~k/64 of the
  * index at any corpus size. */
class SearchIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def docs = graft.util.Tables(spark, sfDir, "documents")
    .select(col("doc_id"), col("text"))

  private lazy val saved: (SearchIndex, String) = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-searchspec").toString
    SearchIndex.build(docs).save(dir)
    (SearchIndex.load(spark, dir), dir)
  }

  test("save/load round-trips postings and doc count") {
    val (idx, dir) = saved
    assert(idx.nDocs === docs.filter(col("text").isNotNull).count())
    assert(idx.postings.count() > 0)
    val buckets = new java.io.File(s"$dir/postings")
      .listFiles().filter(_.getName.startsWith("tbucket="))
    assert(buckets.nonEmpty && buckets.length <= SearchIndex.TokenBuckets)
  }

  test("driver-side bucket mirror equals the engine's xxhash64 for every token") {
    val (idx, _) = saved
    // any disagreement would make search() read the wrong partition and
    // silently drop postings — assert the mirror over the REAL vocabulary
    val mism = idx.postings
      .select(col("token"), col("tbucket"),
        pmod(xxhash64(col("token")), lit(SearchIndex.TokenBuckets.toLong))
          .as("expect"))
      .filter(col("tbucket") =!= col("expect")).count()
    assert(mism === 0L)
  }

  test("search answers match the ad-hoc search_tfidf query exactly") {
    val (idx, _) = saved
    val adHoc = SparkEntry.queries("search_tfidf")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val served = SearchIndex
      .search(idx, Seq("vector", "stream", "window", "merge"), 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served === adHoc)
  }

  test("the postings scan prunes to the query terms' buckets") {
    val (idx, _) = saved
    val q = SearchIndex.search(idx, Seq("vector"), 5)
    val scans = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("postings"))
    assert(scans.nonEmpty)
    assert(scans.exists(s =>
      s.contains("PartitionFilters") && s.contains("tbucket")),
      s"tbucket filter must reach PartitionFilters:\n${scans.mkString("\n")}")
  }
}
