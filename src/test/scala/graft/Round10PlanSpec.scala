package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the round-10 changes (the
  * Round8/9PlanSpec discipline continued): properties EXPLAIN.md
  * documents, pinned so a refactor can't silently regress them. */
class Round10PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("tokenize_bpe_ids_bytes: the byte merge chain is the ONE fused kernel") {
    val p = plan("tokenize_bpe_ids_bytes")
    assert(p.contains("bpe_encode_ids"),
      "byte vocab encode must go through the fused kernel: " + p.take(1500))
    assert(!p.contains("replace("),
      "per-merge replace chain leaked back into the plan: " + p.take(1500))
  }

  test("train_bpe_bytes plans exactly one corpus job shape (vocab aggregate feeds the driver trainer)") {
    // the fast trainer collects ONE word-frequency aggregate; the learned
    // merges surface as a local relation — no per-round scan can exist in
    // the returned table's plan
    val p = plan("train_bpe_bytes")
    assert(p.contains("LocalTableScan") || p.contains("Scan ExistingRDD")
        || p.contains("LocalRelation"),
      "trained merges must be a driver-computed local relation: " +
        p.take(1200))
  }

  test("batch searchPhrase plans the fused phrase kernel, not an interpreted HOF chain") {
    import org.apache.spark.sql.functions._
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-phrase-planpin").toString
    graft.operators.SearchIndex.build(
      graft.util.Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text"))).save(idxDir)
    val idx = graft.operators.SearchIndex.load(spark, idxDir)
    val p = graft.operators.SearchIndex
      .searchPhrase(idx, Seq("vector", "stream"), 5)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("phrase_occurrences"),
      "the start-position fold must be the fused kernel: " + p.take(2000))
    assert(!p.contains("array_contains"),
      "the per-term interpreted HOF chain leaked back: " + p.take(2000))
    // the pruned-scan shape is unchanged: both partition filters still
    // reach the postings scan
    assert(p.contains("tbucket") && p.contains("batch"),
      "partition pruning must survive the fold change: " + p.take(2000))
  }
}
