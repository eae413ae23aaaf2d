package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused repetition_stats kernel vs a brute-force model of the
  * relational form it replaces. */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def stats(text: String): (Long, Long, Long, Long, Long) = {
    import spark.implicits._
    val r = Seq(text).toDF("text")
      .select(graft.exprs.functions.repetition_stats(
        split(col("text"), "\\s+")).as("r"))
      .select("r.*").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  private def model(text: String): (Long, Long, Long, Long, Long) = {
    val toks = text.split("\\s+", -1).toSeq
    val counts = toks.groupBy(identity).view.mapValues(_.size.toLong)
    val bigrams = toks.sliding(2).filter(_.size == 2)
      .map(_.mkString(" ")).toSeq
    (toks.size.toLong, counts.size.toLong, counts.values.max,
      bigrams.size.toLong, bigrams.distinct.size.toLong)
  }

  test("kernel matches the relational model on varied inputs") {
    for (t <- Seq(
      "a", "a a", "a b", "a b a b a", "x y z x y z x y",
      "one two two three three three",
      "solo dup dup solo dup end"))
      assert(stats(t) === model(t), s"text: '$t'")
  }

  test("single token: no bigrams, fractions degrade to 0") {
    assert(stats("word") === ((1L, 1L, 1L, 0L, 0L)))
  }

  test("all-identical tokens: one distinct unigram and one distinct bigram") {
    assert(stats("w w w w w") === ((5L, 1L, 5L, 4L, 1L)))
  }

  test("null array elements are treated as empty strings, not NPE") {
    import spark.implicits._
    val r = Seq(Seq[String]("a", null, "a")).toDF("t")
      .select(graft.exprs.functions.repetition_stats(col("t")).as("r"))
      .select("r.*").head()
    // tokens: a, "", a -> 3 total, 2 distinct, top=2; bigrams "a " and " a"
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((3L, 2L, 2L, 2L, 2L)))
  }
}
