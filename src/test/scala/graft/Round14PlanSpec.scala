package graft

import graft.operators.DedupState
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for the round-14 incremental admission path: the
  * Bloom prefilter must BROADCAST (its whole point — a shuffled mask
  * lookup would cost what it saves), nothing may plan a cartesian, and
  * an emb-less batch must plan NONE of the semantic tier's sub-DAG (the
  * common text intake pays zero for the tier it doesn't use).
  */
class Round14PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def stateWith(rows: Seq[(Long, String)]): DedupState.Handle = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-planstate").toString
    DedupState.admit(spark, dir, rows.toDF("doc_id", "text"), "d1")
  }

  test("admission plan: Bloom mask lookups broadcast, no cartesian anywhere") {
    import spark.implicits._
    val h = stateWith(Seq(
      0L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "one two three four five six seven eight nine ten"))
    val v = DedupState.verdicts(spark, h,
      Seq(1L -> "some incoming document text with several words here")
        .toDF("doc_id", "text"))
    val pp = v.queryExecution.executedPlan.toString
    assert(!pp.contains("CartesianProduct"),
      s"no verdict flag may go all-pairs:\n$pp")
    // the two (word, mask) lookups are the plan's ONLY way to consult the
    // Bloom relation — both must be broadcast joins
    val bloomJoins = "BroadcastHashJoin".r.findAllIn(pp).size
    assert(bloomJoins >= 2,
      s"Bloom position lookups must broadcast (found $bloomJoins " +
        s"broadcast joins):\n$pp")
  }

  test("emb-less batches plan NONE of the semantic sub-DAG") {
    import spark.implicits._
    val h = stateWith(Seq(
      0L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val v = DedupState.verdicts(spark, h,
      Seq(1L -> "plain text document").toDF("doc_id", "text"))
    val lp = v.queryExecution.optimizedPlan.toString
    // the semantic tier's fingerprints: the packed-signature power
    // arithmetic and the cosine's dot_product never appear for a batch
    // that cannot carry embeddings
    assert(!lp.contains("POWER") && !lp.toLowerCase.contains("dot_product"),
      s"text-only admission must not build RhpLsh nodes:\n$lp")
    assert(v.columns.contains("sem_dup_state") &&
      v.columns.contains("sem_dup_batch"),
      "the verdict schema stays fixed either way")
    // and the literal-false columns really are false
    val r = v.collect().head
    assert(!r.getAs[Boolean]("sem_dup_state") &&
      !r.getAs[Boolean]("sem_dup_batch"))
  }

  test("emb-bearing batches against a text-only state: the tier engages without a state rewrite") {
    import spark.implicits._
    val h = stateWith(Seq(
      0L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    // the pre-semantic-tier state has no emb column on disk; the
    // explicit-schema read surfaces it as null and the verdict runs
    val batch = Seq((1L, "new doc",
        (0 until graft.operators.RhpLsh.Dim).map(_.toDouble)))
      .toDF("doc_id", "text", "emb")
    val r = DedupState.verdicts(spark, h, batch).collect().head
    assert(!r.getAs[Boolean]("sem_dup_state"),
      "a text-only state carries no semantic evidence")
    assert(r.getAs[Boolean]("admitted"))
  }
}
