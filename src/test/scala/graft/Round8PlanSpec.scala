package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the round-8 query additions — the
  * properties EXPLAIN.md documents, pinned in CI so a refactor can't
  * silently regress them (the ScanPushdownSpec discipline applied to the
  * new surface). */
class Round8PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("search_tfidf: matched-terms filter sits under the aggregates, no Window, top-k is TakeOrdered") {
    val p = plan("search_tfidf")
    assert(!p.contains("Window"), p.take(1500))
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must be TakeOrdered, never a global sort: " + p.take(1500))
    // the matched-terms filter must exist as a real Filter over the
    // exploded tokens (cutting rows before any shuffle) — accept either
    // rendering (IN-list or the optimizer's INSET conversion)
    assert(p.contains(" IN (") || p.contains("INSET") ||
      p.contains("isin"), "no matched-terms filter in plan: " + p.take(2000))
  }

  test("text_perplexity_bigram: bigrams come from zipped slices, not a lag Window") {
    val p = plan("text_perplexity_bigram")
    assert(!p.contains("Window"),
      "a per-token lag window would shuffle the corpus per doc: " +
        p.take(1500))
  }

  test("dedup_winnow: fused fingerprint kernel, no cartesian product") {
    val p = plan("dedup_winnow")
    assert(p.contains("winnow_fps"),
      "fingerprints must come from the fused kernel: " + p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("ann_ivf_pq: the encode is a projection (pq_encode), never a codebook join") {
    val e = graft.util.Tables(spark, dir, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding")
          .cast("array<double>").as("v"))
    val idx = graft.operators.PqIndex.build(e, m = 8, kCodes = 16)
    val p = idx.codes.queryExecution.executedPlan.toString
    assert(p.contains("pq_encode"), p.take(1500))
    // the 256-way codebook join this replaced would appear as an extra
    // join over a LocalTableScan of 2048 rows
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("graft_version_diff: both snapshot scans carry their own version ceiling") {
    val df = SparkEntry.queries("graft_version_diff")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("versions=[1, 800]") && p.contains("versions=[1, 300]"),
      "each side must plan its own pruned ceiling: " + p.take(2000))
  }
}
