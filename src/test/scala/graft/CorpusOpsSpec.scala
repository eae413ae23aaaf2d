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

  test("chunk_documents splits long docs into overlapping windows") {
    // the driver corpus's docs are all <= 99 tokens (single-chunk), so the
    // multi-chunk grid is pinned here: doc 10 has 1000 tokens →
    // (1000-128+95)//96 + 1 = 11 chunks, starts 96 apart, 40-token tail
    val all = TextAnalysis.queries("chunk_documents")(spark, corpusDir)
      .collect()
    val long = all.filter(_.getLong(0) == 10L)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(long.length == 11)
    long.foreach { case (k, start, nt, txt) =>
      assert(start == 96 * k)
      assert(nt == (if (k == 10) 40L else 128L), s"chunk $k token count")
      assert(txt.split(" ").length.toLong == nt, s"chunk $k text length")
    }
    // short docs yield exactly one chunk covering the whole text
    val short = all.filter(_.getLong(0) == 2L)
    assert(short.length == 1)
    assert(short.head.getLong(3) == 4L)
    assert(short.head.getString(4) == "completely different words here")
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

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("cap_per_source keeps the 15-doc hash prefix of each source") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cap").toString
    import spark.implicits._
    val docs = (1L to 20L).map(i => (i, "hot")) ++
      (100L to 102L).map(i => (i, "cold"))
    docs.toDF("doc_id", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.queries("cap_per_source")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.count(t => t._2 == "hot" && t._5) === 15)
    assert(out.filter(_._2 == "cold").forall(t => t._5 && t._3 == 3L))
    // the kept set is exactly the md5-order prefix — reproducible capping
    val expected = (1L to 20L)
      .sortBy(i => (md5hex(i.toString), i)).take(15).toSet
    assert(out.filter(t => t._2 == "hot" && t._5).map(_._1).toSet === expected)
  }

  test("sample_token_budget fills the budget and keeps the crossing doc") {
    val dir = java.nio.file.Files.createTempDirectory("graft-budget").toString
    import spark.implicits._
    // four 1000-token docs: greedy md5-order prefix keeps exactly three
    // (cum_before 0/1000/2000 < 2500) — the third CROSSES the budget
    val docs = (1L to 4L).map(i => (i, Seq.fill(1000)("t").mkString(" "), "en"))
    docs.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.queries("sample_token_budget")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.length === 3)
    val expected = (1L to 4L).sortBy(i => (md5hex(i.toString), i)).take(3)
    assert(out.map(_._1).toSet === expected.toSet)
    assert(out.map(_._3).sorted.toSeq === Seq(0L, 1000L, 2000L))
  }

  // five docs: two target-domain (en), two off-domain with disjoint
  // vocabulary, and one RAW doc whose content is target-like — the doc
  // DSIR exists to find (selection is by content, not by the label)
  private lazy val dsirDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    import spark.implicits._
    Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the dog sat on the log", "en"),
      (3L, "zog blarg frump wizzle qux", "xx"),
      (4L, "glorp snee vrax plim drub", "xx"),
      (5L, "the cat sat on the log", "xx"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dsir_weights ranks target-like content above off-domain content") {
    val out = TextAnalysis.queries("dsir_weights")(spark, dsirDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L))
    def avg(d: Long): Double = out(d)._2.toDouble / out(d)._1.toDouble
    // the en-like raw doc (5) must outscore both true off-domain docs,
    // and genuinely-target docs must outscore off-domain ones
    assert(avg(5L) > avg(3L) && avg(5L) > avg(4L),
      s"en-like raw doc not promoted: ${out}")
    assert(avg(1L) > avg(3L) && avg(2L) > avg(4L))
  }

  test("sample_importance is a deterministic Gumbel top-k of the weights") {
    val run1 = TextAnalysis.queries("sample_importance")(spark, dsirDir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // N=80 exceeds the corpus, so the sample is the whole corpus —
    // the interesting contracts are the key algebra and determinism
    assert(run1.map(_._1).toSet === Set(1L, 2L, 3L, 4L, 5L))
    run1.foreach { case (d, w, g, k) =>
      assert(k == w + g, s"doc $d key != weight + gumbel") }
    val run2 = TextAnalysis.queries("sample_importance")(spark, dsirDir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(run1.sortBy(_._1).toSeq === run2.sortBy(_._1).toSeq)
  }

  test("train_bpe merges greedily left-to-right with deterministic ties") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    import spark.implicits._
    // 'aaaa' x2 pins greedy overlap handling: ' a a a a ' must merge to
    // 'aa aa' (left-to-right non-overlapping), then to 'aaaa'. The long
    // word supplies freq-1 pairs for the remaining rounds, which must
    // resolve by the (freq desc, pair asc) tie-break: (b,c), then the
    // merged symbol chains ((bc,d), (bcd,e), ...) because 'bc' < 'd'.
    Seq((1L, "aaaa aaaa bcdefghijklmnopq"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.queries("train_bpe")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, "a", "a", "aa", 6L),
      (2L, "aa", "aa", "aaaa", 2L),
      (3L, "b", "c", "bc", 1L),
      (4L, "bc", "d", "bcd", 1L),
      (5L, "bcd", "e", "bcde", 1L),
      (6L, "bcde", "f", "bcdef", 1L),
      (7L, "bcdef", "g", "bcdefg", 1L),
      (8L, "bcdefg", "h", "bcdefgh", 1L)))
  }

  test("tokenize_bpe counts tokens under the learned merges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tokbpe").toString
    import spark.implicits._
    // Training corpus (both docs): word freqs aaaa=3, aa=1, zz=1, plus the
    // freq-1 long word ⇒ merges (a,a) c=10, (aa,aa) c=3, then (b,c)…
    // (bcdefg,h) by the pair-asc tie-break ('b…' < 'z'), so zz NEVER
    // merges. Tokens: aaaa→1, aa→1, zz→2, q→1 (len-1, outside the
    // training vocab but still tokenized), bcdefghijklmnopq→bcdefgh+9
    // singles=10.
    Seq((1L, "aaaa aaaa bcdefghijklmnopq"), (2L, "aa q zz aaaa"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.queries("tokenize_bpe")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 3L, 12L), (2L, 4L, 5L)))
  }

  test("bpe stops with a shorter merge table when pairs run out") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpex").toString
    import spark.implicits._
    // one 2-char word: round 1 merges (a,b), round 2 finds zero adjacent
    // pairs — the loop must stop (not crash) and tokenization must apply
    // just the one merge
    Seq((1L, "ab ab")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val tr = TextAnalysis.queries("train_bpe")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(3), r.getLong(4)))
    assert(tr.toSeq === Seq((1L, "ab", 2L)))
    val tok = TextAnalysis.queries("tokenize_bpe")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tok.toSeq === Seq((1L, 2L, 2L)))
  }

  test("train_bpe_batched applies symbol-disjoint merges K-wide per round") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpeb1").toString
    import spark.implicits._
    // five fully disjoint pairs with strictly ordered freqs: round 1 must
    // batch the top K=4 in one pass, round 2 picks up the leftover
    Seq((1L, "ab ab ab ab ab cd cd cd cd ef ef ef gh gh ij"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.queries("train_bpe_batched")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      (1L, 1L, "a", "b", "ab", 5L),
      (1L, 2L, "c", "d", "cd", 4L),
      (1L, 3L, "e", "f", "ef", 3L),
      (1L, 4L, "g", "h", "gh", 2L),
      (2L, 5L, "i", "j", "ij", 1L)))
  }

  test("train_bpe_batched excludes candidates conflicting with higher ranks") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpeb2").toString
    import spark.implicits._
    // the sequential trainer's chain corpus: after (a,a) and (b,c), every
    // remaining candidate shares a symbol with its higher-ranked neighbour
    // ((c,d) with (b,c), (d,e) with the EXCLUDED (c,d) — the rule is over
    // all higher-ranked candidates, not just selected ones), so each round
    // keeps exactly the head of each disjoint chain
    Seq((1L, "aaaa aaaa bcdefghijklmnopq"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.queries("train_bpe_batched")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      (1L, 1L, "a", "a", "aa", 6L),
      (1L, 2L, "b", "c", "bc", 1L),
      (2L, 3L, "aa", "aa", "aaaa", 2L),
      (2L, 4L, "bc", "d", "bcd", 1L),
      (3L, 5L, "bcd", "e", "bcde", 1L)))
    // the conflict-rule invariant: within a round, kept merges are
    // pairwise symbol-disjoint (a self-pair (x,x) contributes the single
    // symbol x, so it conflicts with any other merge touching x but not
    // with itself)
    out.groupBy(_._1).foreach { case (round, ms) =>
      val sets = ms.map(m => Set(m._3, m._4))
      for (i <- sets.indices; j <- sets.indices if i < j)
        assert((sets(i) & sets(j)).isEmpty,
          s"round $round merges share symbols: ${ms.toSeq}")
    }
  }

  test("sample_fixed keeps the global md5 prefix via TakeOrdered") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sfix").toString
    import spark.implicits._
    (1L to 100L).map(i => (i, "en", "web")).toDF("doc_id", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = TextAnalysis.queries("sample_fixed")(spark, dir)
    // the scale contract: per-partition top-N heaps, no global sort shuffle
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    val out = df.collect().map(_.getLong(0))
    val expected = (1L to 100L)
      .sortBy(i => (md5hex(i.toString), i)).take(60).sorted
    assert(out.toSeq === expected)
  }

  test("bpe merge cache never serves stale merges after an overwrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpec").toString
    import spark.implicits._
    Seq((1L, "ab ab")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val first = TextAnalysis.queries("train_bpe")(spark, dir).collect()
      .map(_.getString(3))
    assert(first.toSeq === Seq("ab"))
    // same path, new corpus: the name+size+mtime fingerprint must miss
    Seq((1L, "xy xy")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val second = TextAnalysis.queries("train_bpe")(spark, dir).collect()
      .map(_.getString(3))
    assert(second.toSeq === Seq("xy"))
  }

  test("classify_quality_nb separates a cleanly split corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nb").toString
    import spark.implicits._
    // docs 1-4: pure stop-word text (ratio 1.0 → label 1); docs 5-8: pure
    // content text (ratio 0 → label 0); doc 9 sits EXACTLY on the 6%
    // threshold (3 stops / 50 tokens) and pins the >= inclusivity
    val stopDoc = "the a of to in is and the a of"
    val contentDoc = "quick brown fox jumps over lazy dog runs far away"
    val boundary = (Seq.fill(3)("the") ++ Seq.fill(47)("word")).mkString(" ")
    ((1L to 4L).map((_, stopDoc)) ++ (5L to 8L).map((_, contentDoc)) ++
      Seq((9L, boundary)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.queries("classify_quality_nb")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(out.map(x => (x._1, x._2)).toSeq ===
      (1L to 4L).map((_, 1)) ++ (5L to 8L).map((_, 0)) :+ (9L -> 1))
    // stop tokens only occur in class 1, content tokens only in class 0:
    // every clean doc must score on its own side
    out.filter(_._1 <= 8L).foreach { case (id, label, _, score, pred) =>
      assert(pred === label, s"doc $id mispredicted (score=$score)")
      assert((score > 0) === (label == 1), s"doc $id score sign")
    }
    // NB trained on its own labels must beat the majority baseline here
    val acc = out.count(x => x._5 == x._2).toDouble / out.length
    assert(acc >= 8.0 / 9.0, s"training accuracy $acc")
  }
}
