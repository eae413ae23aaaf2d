package graft

import graft.operators.SearchIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 plan pins — the load-bearing physical-plan properties of the
  * deletion lifecycle and the unified serving plan:
  *  - an index with NO active tombstones plans NO anti-join (the common
  *    case pays zero for the delete feature existing);
  *  - with tombstones active, the exclusion is a BROADCAST left-anti
  *    join and the (batch, tbucket) partition pruning still reaches the
  *    postings scan — deletes must not break the inverted-list property;
  *  - LiveSearchServer.answer and SearchIndex.answerWithSnapshot produce
  *    the same physical plan (the directive was one DEFINITION; this
  *    pins that the delegation also yields one PLAN). */
class Round11PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def docs = graft.util.Tables(spark, sfDir, "documents")
    .select(col("doc_id"), col("text"))

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("no active tombstones → no anti-join anywhere in the search plan") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-r11plan-a").toString
    SearchIndex.build(docs).save(dir)
    val p = plan(SearchIndex.search(
      SearchIndex.load(spark, dir), Seq("vector"), 5))
    assert(!p.contains("LeftAnti"),
      s"tombstone-free load must plan no anti-join:\n$p")
  }

  test("active tombstones → broadcast left-anti exclusion, partition pruning intact") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-r11plan-b").toString
    SearchIndex.build(docs).save(dir)
    val victim = SearchIndex.search(
        SearchIndex.load(spark, dir), Seq("vector"), 1)
      .head().getLong(0)
    assert(SearchIndex.deleteDocs(spark, dir, Seq(victim)) === 1L)
    val q = SearchIndex.search(SearchIndex.load(spark, dir),
      Seq("vector"), 5)
    val p = plan(q)
    assert(p.contains("LeftAnti"),
      s"tombstoned load must exclude via anti-join:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      s"the tombstone side must broadcast (takedown-sized by contract):\n$p")
    val scans = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("postings"))
    assert(scans.exists(s =>
      s.contains("PartitionFilters") && s.contains("tbucket") &&
        s.contains("batch")),
      s"deletes must not break partition pruning:\n${scans.mkString("\n")}")
  }

  test("LiveSearchServer.answer plans identically to SearchIndex.answerWithSnapshot") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-r11plan-c").toString
    SearchIndex.build(docs.limit(50)).save(dir)
    val server = new graft.streaming.LiveSearchServer(spark, dir, "bm25")
    try {
      val queries = Seq((1L, "vector stream")).toDF("q_id", "q")
      val viaServer = server.answer(queries, "q_id", "q", 5)
      // the server's snapshot handle is internal; reproduce the direct
      // call over an equivalent fresh snapshot and compare the EXPLAIN
      // shape modulo plan ids / cached-relation names
      val snap = SearchIndex.load(spark, dir).snapshot("bm25")
      try {
        val direct = SearchIndex.answerWithSnapshot(snap, queries, 5)
        def shape(df: org.apache.spark.sql.DataFrame): String =
          df.queryExecution.executedPlan.toString
            .replaceAll("#\\d+", "#N")
            .replaceAll("plan_id=\\d+", "plan_id=N")
            .replaceAll("cachedrdd_\\d+", "cachedrdd_N")
        assert(shape(viaServer) === shape(direct),
          "the serving tier must construct the batch answer plan")
      } finally snap.close()
    } finally server.close()
  }

  // ---- extension-tier plan pins (fuzzy join / z-order / heavy hitters) ----

  test("fuzzy_join_names plans NO cartesian/nested-loop join") {
    // the whole point of prefix filtering is replacing the all-pairs
    // product with equi-joins on gram keys; a regression to a cartesian
    // would still pass the oracle at sf0.01 and then melt at scale
    val q = graft.queries.Relational.queries("fuzzy_join_names")(spark, sfDir)
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"fuzzy join must not plan a cartesian product:\n$p")
    // the short-string block's length-band join is a nested loop over two
    // near-empty sides — allowed ONLY under a broadcast. Strip the
    // broadcast form FIRST: asserting the disjunction directly is
    // vacuously true whenever any BroadcastNestedLoopJoin is present.
    val nonBroadcast = p.replace("BroadcastNestedLoop", "")
    assert(!nonBroadcast.contains("NestedLoop"),
      s"only broadcast nested loops (short block) are acceptable:\n$p")
  }

  test("layout_zorder keeps the interleave kernel inside codegen") {
    val q = graft.queries.Relational.queries("layout_zorder")(spark, sfDir)
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("zorder16"),
      s"the Morton kernel must appear in the plan:\n$formatted")
    // AQE's pre-execution explain carries no codegen spans — execute,
    // then read the FINAL plan, where codegen'd operators carry a *(n)
    // stage star on the very Project holding the kernel
    q.collect()
    val fin = q.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[zorder16""".r.findFirstIn(fin).isDefined,
      s"the key computation must run inside whole-stage codegen:\n$fin")
  }

  test("text_heavy_hitters: MG candidates broadcast; no vocabulary-wide shuffle before the candidate filter") {
    val q = graft.queries.TextAnalysis.queries("text_heavy_hitters")(spark, sfDir)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("misra_gries"),
      s"the MG aggregate must be in the plan:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the candidate semi-join must broadcast the <=capacity list:\n$p")
  }
}
