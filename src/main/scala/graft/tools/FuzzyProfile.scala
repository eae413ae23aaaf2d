package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-by-stage timing/cardinality audit of the fuzzy self-join —
  * isolates where the Ed-Join plan spends its time at a given SF. */
object FuzzyProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - s) / 1e9}%8.2f s")
      r
    }
    val q = 2; val k = 1
    val names = graft.util.Tables(spark, sfDir, "customer")
      .select(col("c_name").as("s")).filter(col("s").isNotNull).distinct()
    println(s"names: ${t("count names")(names.count())}")
    val g = names.select(col("s"),
      explode(graft.operators.FuzzyJoin.qgrams(col("s"), q)).as("g"))
    println(s"gram rows: ${t("gram explode")(g.count())}")
    val dfT = g.groupBy("g").agg(count(lit(1)).as("df"))
    println(s"distinct grams: ${t("df table")(dfT.count())}")
    val w = Window.partitionBy("s").orderBy(col("df"), col("g"))
    val prefix = g.join(dfT, "g")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k * q + 1).select("s", "g")
    println(s"prefix rows: ${t("prefix")(prefix.count())}")
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.s") < col("b.s"))
      .select(col("a.s").as("name_a"), col("b.s").as("name_b"))
    println(s"raw candidates: ${t("candidates")(cand.count())}")
    // force full string materialization without a shuffle: sum of lengths
    println("strings materialized: " + t("materialize")(
      cand.select(sum(length(col("name_a")) + length(col("name_b"))))
        .head().getLong(0)))
    val ver = cand.withColumn("dist",
      levenshtein(col("name_a"), col("name_b"), 1)).filter(col("dist") >= 0)
    println(s"verified (no distinct): ${t("verify-nodistinct")(ver.count())}")
    println(s"verified distinct: ${t("verify+distinct")(ver.distinct().count())}")
    println("hot prefix grams:")
    prefix.groupBy("g").agg(count(lit(1)).as("n"))
      .orderBy(desc("n")).limit(10).collect()
      .foreach(r => println(s"  '${r.getString(0)}' ${r.getLong(1)}"))
    val full = t("full operator")(graft.operators.FuzzyJoin
      .selfJoin(graft.util.Tables(spark, sfDir, "customer"), "c_name", q, k)
      .count())
    println(s"full result: $full")
    spark.stop()
  }
}
