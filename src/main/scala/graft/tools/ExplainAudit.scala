package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted plans for plan-quality audits. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("q1_agg", "q3_topk_join")
    val executed = args.contains("--executed")
    names.filterNot(_ == "--executed").foreach { q =>
      println(s"===== $q")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      if (executed) {
        // run the query so AQE finalizes, then dump the adaptive plan —
        // runtime stage reuse (ReusedExchange/ReusedSubquery) only shows
        // here, never in the pre-execution formatted plan
        df.collect() // count() would execute a different (re-planned) query
        df.explain("formatted") // now prints isFinalPlan=true with reuse
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
