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
}
