package graft

import graft.exprs.KeywordTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Aho–Corasick keyword scan vs naive position-by-position counting —
  * the semantics the text_keyword_scan oracle states in SQL. */
class KeywordScanSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def naive(text: String, kw: String): Int =
    (0 to text.length - kw.length)
      .count(i => text.regionMatches(i, kw, 0, kw.length))

  test("overlaps, nested keywords, shared prefixes (property)") {
    val rnd = new scala.util.Random(31)
    val keywords = Seq("a", "aa", "ab", "aba", "bab", "abab", "bb", "cab")
    val table = new KeywordTable(keywords)
    for (_ <- 0 until 2000) {
      val text = (0 until rnd.nextInt(40))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val got = table.scan(text)
      keywords.zipWithIndex.foreach { case (kw, i) =>
        assert(got(i) === naive(text, kw), s"'$kw' in '$text'")
      }
    }
  }

  test("one pass counts every keyword, overlapping included") {
    val table = new KeywordTable(Seq("aa", "aaa"))
    assert(table.scan("aaaa").toSeq === Seq(3, 2))
    val t2 = new KeywordTable(Seq("he", "she", "his", "hers"))
    assert(t2.scan("ushers").toSeq === Seq(1, 1, 0, 1))
  }

  test("expression path: counts through codegen match the driver scan") {
    val keywords = Seq("stream", "vector", "data")
    val table = new KeywordTable(keywords)
    val texts = Seq("vector stream restreaming", "datadata", "", "nothing here")
    val got = texts.toDF("text")
      .select(graft.exprs.functions.keyword_scan(col("text"), table))
      .as[Seq[Int]].collect()
    texts.zip(got).foreach { case (t, counts) =>
      assert(counts === keywords.map(naive(t, _)), s"text '$t'")
    }
  }
}
