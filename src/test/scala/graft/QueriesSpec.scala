package graft

import org.scalatest.funsuite.AnyFunSuite

/** Per-operator execution spec: every SparkEntry query must run at sf0.001
  * and produce a sane result. Value-level equivalence is the DuckDB oracle
  * gate (tools/oracle_check.py); this guards compilability + non-emptiness
  * in-repo. */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.001"

  // Queries where an empty result at sf0.001 is legitimate (tiny data →
  // possibly no near-dup pairs / violations).
  private val mayBeEmpty = Set(
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_embedding",
    "dedup_embedding_lsh", "join_anti")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.schema.nonEmpty, s"$name: empty schema")
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name: zero rows")
    }
  }

  test("entry query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
