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
  test("split_by_cluster: no near-dup component straddles splits; singletons match split_corpus") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("split_by_cluster")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    // the invariant the operator exists for: one split per cluster
    rows.groupBy(_._2).foreach { case (c, ms) =>
      assert(ms.map(_._3).distinct.length == 1, s"cluster $c straddles splits")
    }
    // singleton components (cluster_id = doc_id) must agree with the
    // doc-hash split_corpus assignment — only group members ever move
    val docSplit = SparkEntry.queries("split_corpus")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    rows.filter(r => r._1 == r._2).foreach { case (d, _, s) =>
      assert(docSplit(d) == s, s"singleton $d moved: $s vs ${docSplit(d)}")
    }
    // and the crafted non-singleton case: every member takes the KEEPER's
    // doc-hash split, verified against the cluster id directly
    rows.filter(r => r._1 != r._2).foreach { case (d, c, s) =>
      assert(docSplit(c) == s, s"member $d of $c not on keeper's split")
    }
  }
}
