package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE is the runtime half of the skew story (the static half is
  * join_skew_salted's explicit salting): a hot join key that would pin one
  * reducer gets split across tasks by OptimizeSkewedJoin at runtime, with
  * no query rewrite. This spec proves the mechanism actually engages on
  * this engine's session settings — at 100 TB "AQE will handle it" is only
  * a plan if it demonstrably fires.
  */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink thresholds so the test corpus counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on ONE hot key vs 50 keys with 10 rows each
      val facts = (1 to 50000).map(i => (1L, s"payload_$i")) ++
        (2L to 51L).flatMap(k => (1 to 10).map(i => (k, s"p$i")))
      val dims = (1L to 51L).map(k => (k, s"dim_$k"))
      val f = facts.toDF("k", "payload").repartition(4)
      val d = dims.toDF("k", "name").repartition(4)
      val joined = f.join(d, "k")
      // collect() (not count(), which builds a different plan tree) so THIS
      // DataFrame's adaptive plan executes and finalizes
      assert(joined.collect().length === 50000 + 50 * 10)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), p.take(500))
      assert(p.contains("skew=true"),
        s"OptimizeSkewedJoin must mark the join:\n${p.take(3000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
