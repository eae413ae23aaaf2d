package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted plans for plan-quality audits. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // flags first, then positional (names, dir) — so "--executed" anywhere
    // never shadows the names list or gets mistaken for the data dir;
    // unknown flags fail loudly (a typo'd --executed would otherwise
    // silently dump the WRONG, pre-execution plan)
    val (flags, pos) = args.partition(_.startsWith("--"))
    val unknown = flags.filterNot(_ == "--executed")
    require(unknown.isEmpty, s"unknown flags: ${unknown.mkString(", ")}")
    val executed = flags.contains("--executed")
    val dir = if (pos.length > 1) pos(1) else "/root/testdata/sf0.01"
    val names = if (pos.nonEmpty) pos(0).split(",").toSeq
      else Seq("q1_agg", "q3_topk_join")
    names.foreach { q =>
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
