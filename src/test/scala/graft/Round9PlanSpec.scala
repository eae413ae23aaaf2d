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

  test("probeAll over a LOADED index: fused kernels in-plan, zero driver materialization") {
    import org.apache.spark.sql.functions._
    val e = graft.util.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-pq-planpin").toString
    graft.operators.PqIndex.build(e, m = 8, kCodes = 16).save(idxDir)
    val idx = graft.operators.PqIndex.load(spark, idxDir)
    val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"))
    val p = graft.operators.PqIndex
      .probeAll(idx, q, nProbe = 2, topK = 5, rerank = 20)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("ivf_nearest_cells"), p.take(2000))
    assert(p.contains("pq_adc_cosine"), p.take(2000))
    // the serving adcProbe materializes a (q, cell, LUT) local relation
    // driver-side; the batch probe must not — everything is a scan or a
    // derived relation of one
    assert(!p.contains("LocalTableScan"),
      "driver-side LUT/probe materialization leaked into probeAll: " +
        p.take(2000))
    assert(!p.contains("adc_dot"),
      "the LUT-lookup expression belongs to the serving path only: " +
        p.take(2000))
  }
}
