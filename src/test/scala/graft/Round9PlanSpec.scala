package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the round-9 changes (the
  * Round8PlanSpec discipline continued): properties EXPLAIN.md documents,
  * pinned so a refactor can't silently regress them. */
class Round9PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  /** Formatted explain, not executedPlan.toString: the kernel projection
    * rides an aggregate's RESULT expression list, which treeString elides
    * to output attribute names — only the formatted mode prints it. */
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("tokenize_bpe_ids: the merge chain is ONE fused kernel, not per-merge rewrites") {
    val p = plan("tokenize_bpe_ids")
    assert(p.contains("bpe_encode_ids"),
      "vocab encode must go through the fused kernel: " + p.take(1500))
    assert(!p.contains("replace("),
      "per-merge replace chain leaked back into the plan: " + p.take(1500))
  }

  test("tokenize_bpe: vocab token counts come from the fused kernel too") {
    val p = plan("tokenize_bpe")
    assert(p.contains("bpe_encode_ids"), p.take(1500))
    assert(!p.contains("replace("), p.take(1500))
  }
}
