package graft

import graft.operators.{IvfIndex, PqIndex, SearchIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Window => LWindow}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 pins:
  *
  *  - the text SNAPSHOT-SERVING top-k is BOUNDED: the per-q_id fold runs
  *    a row_number rank window (sort spills) and filters to ≤ topK rows
  *    BEFORE any collect_list, so a high-df query token can no longer
  *    put O(matching docs) structs into one non-spilling aggregation
  *    buffer (the round-16 `weak`). Pinned structurally: every
  *    collect_list aggregate in the serving plan sits above a rank
  *    filter, on the plain, filtered, AND keyed variants, both scorer
  *    and phrase modes;
  *  - the PQ tier's keyed filtered probe reads the index ONCE per
  *    multi-tenant batch (Round16PlanSpec pinned IVF only — this closes
  *    the regression hole on `adcProbeFilteredKeyed`);
  *  - null-keyed query rows FAIL LOUDLY on all three keyed serving
  *    tiers instead of silently vanishing from the output.
  */
class Round17PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def docs = graft.util.Tables(spark, sfDir, "documents")
    .select(col("doc_id"), col("text"))

  private def emb = graft.util.Tables(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Scans in `df`'s optimized plan rooted under `dirKey`. */
  private def indexScans(df: DataFrame, dirKey: String): Int =
    df.queryExecution.optimizedPlan.collectLeaves().count {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.exists(_.toString.contains(dirKey))
        case _ => false
      }
      case _ => false
    }

  /** Every collect_list Aggregate in `df`'s plan must sit above a
    * row_number rank filter — the bounded-buffer discipline. */
  private def assertBoundedTopK(df: DataFrame, what: String): Unit = {
    val plan = df.queryExecution.optimizedPlan
    val rankWindows = plan.collect {
      case w: LWindow if w.windowExpressions.exists(
        _.toString.contains("row_number")) => w
    }
    assert(rankWindows.nonEmpty,
      s"$what: the serving plan must rank per q_id with row_number")
    // only the PER-QUERY fold (grouping = [q_id]) needs the bound: the
    // phrase mode's intermediate (q_id, doc_id, …) positions-map fold
    // is bounded by one document's matched-term positions, not by the
    // corpus
    val collectAggs = plan.collect {
      case a: Aggregate if a.groupingExpressions.size == 1 &&
        a.aggregateExpressions.exists(
          _.toString.contains("collect_list")) => a
    }
    assert(collectAggs.nonEmpty, s"$what: expected the final array fold")
    collectAggs.foreach { a =>
      val bounded = a.collect {
        case f: Filter if f.condition.toString.contains("rn") &&
          f.collectFirst { case w: LWindow => w }.nonEmpty => f
      }.nonEmpty
      assert(bounded,
        s"$what: a collect_list aggregate has NO rank filter beneath " +
          "it — its buffer would hold every matching (doc, score) " +
          "struct for the query (collect_list does not spill)")
    }
  }

  test("snapshot serving top-k is bounded on every variant and mode") {
    import spark.implicits._
    val idx = SearchIndex.build(docs)
    val queries = Seq((1L, "vector stream"), (2L, "the query"))
      .toDF("q_id", "q")
    val allowed = docs.filter(col("doc_id") % 2 === 0).select("doc_id")
    val keyedQ = Seq((1L, "vector stream", "t2"), (2L, "the query", "t3"))
      .toDF("q_id", "q", "tenant")
    val allowedKeyed = docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id").withColumn("tenant", lit("t2"))
      .unionByName(docs.filter(col("doc_id") % 3 === 0)
        .select("doc_id").withColumn("tenant", lit("t3")))
    for (mode <- Seq("bm25", "tfidf", "phrase")) {
      val snap = idx.snapshot(mode)
      try {
        assertBoundedTopK(
          SearchIndex.answerWithSnapshot(snap, queries, 10),
          s"$mode plain")
        assertBoundedTopK(
          SearchIndex.answerWithSnapshotFiltered(snap, queries, allowed,
            10), s"$mode filtered")
        assertBoundedTopK(
          SearchIndex.answerWithSnapshotFilteredKeyed(snap, keyedQ,
            "tenant", allowedKeyed, 10), s"$mode keyed")
      } finally snap.close()
    }
  }

  test("bounded serving answers equal the batch searchers (the rank rewrite changed the plan, not the algebra)") {
    import spark.implicits._
    val idx = SearchIndex.build(docs)
    val snap = idx.snapshot("bm25")
    try {
      val served = SearchIndex.answerWithSnapshot(
        snap, Seq((7L, "vector stream")).toDF("q_id", "q"), 5)
        .collect().map(r =>
          r.getSeq[Long](1).zip(r.getSeq[Long](2)).toSeq).head
      val batch = SearchIndex
        .searchBm25(idx, Seq("vector", "stream"), 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(served === batch)
    } finally snap.close()
  }

  test("PQ keyed filtered probe: one index scan serves every tenant in the batch") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-r17plan-pq").toString
    PqIndex.build(emb, m = 8, kCodes = 16, coarseK = 4).save(dir)
    val idx = PqIndex.load(spark, dir)
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("v")).head().getSeq[Double](0)
    val queries = Seq((9000003L, qv, "t3"), (9000005L, qv, "t5"))
      .toDF("q_id", "qv", "tenant")
    val allowedKeyed =
      emb.filter(col("vec_id") % 3 === 0).select("vec_id")
        .withColumn("tenant", lit("t3"))
        .unionByName(emb.filter(col("vec_id") % 5 === 0).select("vec_id")
          .withColumn("tenant", lit("t5")))
    val keyed = PqIndex.adcProbeFilteredKeyed(
      idx, queries, "tenant", allowedKeyed,
      nProbe = 4, topK = 5, rerank = 50)
    assert(indexScans(keyed, dir) >= 1)
    // the CODES relation must be read once, not once per tenant; the
    // rerank leg legitimately reads raw vectors — count codes scans by
    // requiring the total under the dir stays at the two relations
    // (codes + raw rerank read), not 2 × tenants
    assert(indexScans(keyed, dir) <= 2,
      "the multi-tenant batch must read the index ONCE per relation " +
        "(codes + rerank) — per-tenant loops pay one scan each")
    assert(keyed.count() > 0)
  }

  test("null-keyed query rows fail loudly on all three keyed tiers") {
    import spark.implicits._
    val ivfDir = java.nio.file.Files
      .createTempDirectory("graft-r17plan-nullk").toString
    IvfIndex.build(emb, k = 4).save(ivfDir)
    val ivf = IvfIndex.load(spark, ivfDir)
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("v")).head().getSeq[Double](0)
    val nullQ = Seq((1L, qv, null.asInstanceOf[String]))
      .toDF("q_id", "qv", "tenant")
    val ak = emb.select("vec_id").withColumn("tenant", lit("t"))
    val e1 = intercept[IllegalArgumentException] {
      IvfIndex.probeFilteredKeyed(ivf, nullQ, "tenant", ak, 4, 5).count()
    }
    assert(e1.getMessage.contains("NULL"))

    val pqDir = java.nio.file.Files
      .createTempDirectory("graft-r17plan-nullk-pq").toString
    PqIndex.build(emb, m = 8, kCodes = 16, coarseK = 4).save(pqDir)
    val e2 = intercept[IllegalArgumentException] {
      PqIndex.adcProbeFilteredKeyed(PqIndex.load(spark, pqDir), nullQ,
        "tenant", ak, 4, 5, rerank = 10).count()
    }
    assert(e2.getMessage.contains("NULL"))

    val idx = SearchIndex.build(docs)
    val snap = idx.snapshot("bm25")
    try {
      val nullTextQ = Seq((1L, "vector", null.asInstanceOf[String]))
        .toDF("q_id", "q", "tenant")
      val akDocs = docs.select("doc_id").withColumn("tenant", lit("t"))
      val e3 = intercept[Exception] {
        SearchIndex.answerWithSnapshotFilteredKeyed(
          snap, nullTextQ, "tenant", akDocs, 5).collect()
      }
      assert(e3.getMessage != null)
    } finally snap.close()
  }
}
