package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketing story for 100 TB co-located joins, demonstrated end to end:
  * writing both sides of a recurring join bucketed by the join key lets every
  * subsequent join (and aggregation on that key) run with ZERO exchanges —
  * the shuffle is paid once at layout time, not once per query. This is the
  * layout a production deployment of this engine would choose for the
  * fact-to-fact joins (orders x lineitem) that cannot broadcast.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed fact-to-fact join plans with zero exchanges") {
    import graft.util.Tables
    val orders = Tables(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")

    // tables carry explicit paths, so the (static) warehouse dir is unused
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the non-broadcast path: this is the join shape that, at
      // scale, would otherwise shuffle BOTH fact tables on every run
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      val p = plan(joined)
      assert(!p.contains("Exchange"),
        s"bucketed join + same-key agg must plan zero exchanges:\n${p.take(3000)}")
      assert(p.contains("SortMergeJoin"), p.take(1000))

      // identical results to the plain (shuffling) formulation
      val plain = orders.join(lineitem,
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      val a = joined.orderBy("o_orderkey").collect().map(_.toSeq)
      val b = plain.orderBy("o_orderkey").collect().map(_.toSeq)
      assert(a.sameElements(b), "bucketed layout must not change results")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      // the tables are EXTERNAL (explicit path): DROP removes metadata
      // only, so the staged parquet needs deleting too
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).forEach(rm(_))
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(java.nio.file.Paths.get(wh))
    }
  }
}
