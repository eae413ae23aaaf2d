package graft

import graft.queries.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** The split-leakage GATE: the oracle pins the composed query's zero on
  * the synthetic corpus; these pin the gate's firing behavior on crafted
  * leakage (which the intact pipeline can never produce — CC collapses
  * every minhash pair, so only a broken composition trips it). */
class LeakageGateSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def kept(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "split")
  }
  private def pairs(rows: (Long, Long, Double)*) = {
    import spark.implicits._
    rows.toDF("doc_a", "doc_b", "sim_est")
  }

  test("gate fails loudly on a cross-split near-dup pair") {
    val e = intercept[IllegalStateException] {
      Dedup.assertNoSplitLeakage(
        kept(1L -> "train", 2L -> "val"),
        pairs((1L, 2L, 0.9)), 0.5)
    }
    assert(e.getMessage.contains("split leakage gate"))
  }

  test("gate passes same-split pairs, sub-threshold pairs, and pruned docs") {
    // same split: not leakage
    assert(Dedup.assertNoSplitLeakage(
      kept(1L -> "train", 2L -> "train"), pairs((1L, 2L, 0.9)), 0.5) == 0L)
    // below the sim threshold: not gated
    assert(Dedup.assertNoSplitLeakage(
      kept(1L -> "train", 2L -> "val"), pairs((1L, 2L, 0.4)), 0.5) == 0L)
    // an endpoint the pipeline dropped: pair is moot
    assert(Dedup.assertNoSplitLeakage(
      kept(1L -> "train"), pairs((1L, 2L, 0.9)), 0.5) == 0L)
  }

  test("pipeline_pretrain_gated emits the card with leak_pairs = 0") {
    val rows = SparkEntry.queries("pipeline_pretrain_gated")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val i = rows.head.fieldIndex("leak_pairs")
    rows.foreach(r => assert(r.getLong(i) == 0L))
  }
}
