package graft

import graft.queries.{Dedup, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the corpus-profiling operators on a crafted corpus:
  * test-set decontamination (benchmark 3-gram overlap), top-K vocabulary,
  * and the lexical rarity profile. The DuckDB oracle pins bit-exactness on
  * the synthetic tables; these pin the SEMANTICS on known documents.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // doc 0 is the benchmark split (doc_id % 97 == 0); doc 1 copies its
  // leading phrase (shares exactly one 3-gram), doc 2 is clean; docs 10-12
  // exercise the rarity thresholds (tf>=1000 common, tf<=2 rare).
  private lazy val corpusDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-corpusops").toString
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma something else entirely"),
      (2L, "completely different words here"),
      (10L, Seq.fill(1000)("w").mkString(" ")),
      (11L, "w rareone raretwo"),
      (12L, "mid mid mid"))
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("decontaminate_ngram flags only docs sharing a 3-gram with benchmark") {
    val out = Dedup.queries("decontaminate_ngram")(spark, corpusDir).collect()
    assert(out.length === 1, "only doc 1 overlaps the benchmark split")
    val r = out.head
    assert(r.getLong(0) === 1L)
    assert(r.getLong(1) === 4L, "doc 1 has 4 distinct shingles")
    assert(r.getLong(2) === 1L, "exactly 'alpha beta gamma' is contaminated")
    assert(r.getDouble(3) === 0.25)
  }

  test("text_vocab ranks by occurrences with deterministic tie-break") {
    val out = TextAnalysis.queries("text_vocab")(spark, corpusDir).collect()
    val top = out.head
    assert(top.getString(0) === "w" && top.getLong(1) === 1001L &&
      top.getLong(2) === 2L)
    // equal-count tokens must appear in ascending token order
    val counts = out.map(r => (r.getLong(1), r.getString(0)))
    assert(counts.sameElements(counts.sortBy { case (n, t) => (-n, t) }))
  }

  test("text_rarity profiles rare and common token mass per document") {
    val out = TextAnalysis.queries("text_rarity")(spark, corpusDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(10L) === ((1000L, 0L, 1000L, 0.0)))
    assert(out(11L) === ((3L, 2L, 1L, 2.0 / 3.0)))
    assert(out(12L) === ((3L, 0L, 0L, 0.0)), "tf=3 is neither rare nor common")
  }
}
