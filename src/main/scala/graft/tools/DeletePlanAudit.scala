package graft.tools

import graft.operators.SearchIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: dump the search physical plans BEFORE and AFTER a
  * tombstone delete — the evidence behind EXPLAIN.md's round-11 section
  * and Round11PlanSpec's assertions (tombstone-free loads plan no
  * anti-join; tombstoned loads exclude via a broadcast left-anti with
  * partition pruning intact).
  *
  * Usage: runMain graft.tools.DeletePlanAudit [sfDir]
  */
object DeletePlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.util.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-delplan").toString
    SearchIndex.build(docs).save(dir)

    def dump(tag: String): Unit = {
      val q = SearchIndex.search(SearchIndex.load(spark, dir),
        Seq("vector"), 5)
      println(s"==== $tag ====")
      println(q.queryExecution.executedPlan.toString)
    }
    dump("NO TOMBSTONES (common case: no anti-join anywhere)")
    val victim = SearchIndex.search(SearchIndex.load(spark, dir),
      Seq("vector"), 1).head().getLong(0)
    SearchIndex.deleteDocs(spark, dir, Seq(victim))
    dump(s"TOMBSTONE ACTIVE (deleted doc $victim: broadcast left-anti)")
    spark.stop()
  }
}
