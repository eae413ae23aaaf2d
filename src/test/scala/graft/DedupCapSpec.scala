package graft

import graft.queries.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hot-bucket caps under a pathological duplicate-heavy corpus: a giant
  * cluster of identical documents would make every LSH band bucket and every
  * shingle's inverted-index bucket quadratic (300 identical docs → ~45k
  * candidate pairs per bucket). With the caps, those buckets are dropped, the
  * join stays linear, and small legitimate near-dup clusters still surface.
  */
class DedupCapSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private lazy val corpusDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedupcap").toString
    import spark.implicits._
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val hot = (0 until 300).map(i => (i.toLong, boiler))
    // one legit near-dup pair (shares all but the final word: 28 of 29
    // shingles → jaccard 28/30 ≈ 0.93) + distinct docs
    val stem = (0 until 30).map(i => s"tok$i").mkString(" ")
    val pair = Seq((1000L, s"$stem kappa"), (1001L, s"$stem lambda"))
    val distinct = (2000 until 2010).map(i =>
      (i.toLong, s"unique document number $i with entirely distinct content $i"))
    (hot ++ pair ++ distinct).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("minhash LSH drops the hot cluster's buckets but keeps small clusters") {
    val out = Dedup.queries("dedup_minhash_lsh")(spark, corpusDir).collect()
    val hotPairs = out.count(r => r.getLong(0) < 300 && r.getLong(1) < 300)
    assert(hotPairs === 0, "hot-cluster pairs must be dropped by the band cap")
    assert(out.exists(r => r.getLong(0) == 1000L && r.getLong(1) == 1001L),
      "legit near-dup pair must survive the cap")
  }

  test("ngram jaccard drops high-df shingles but keeps small clusters") {
    val out = Dedup.queries("dedup_ngram_jaccard")(spark, corpusDir).collect()
    val hotPairs = out.count(r => r.getLong(0) < 300 && r.getLong(1) < 300)
    assert(hotPairs === 0, "hot shingles (df=300 > cap) must be dropped")
    assert(out.exists(r => r.getLong(0) == 1000L && r.getLong(1) == 1001L),
      "legit near-dup pair must survive the df cap")
  }

  test("exact dedup still catches the hot cluster the caps dropped") {
    val out = Dedup.queries("dedup_exact")(spark, corpusDir)
      .filter(col("is_dup")).count()
    assert(out === 299, "299 of the 300 identical docs are duplicates")
  }
}
