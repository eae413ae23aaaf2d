package graft

import graft.queries.{Dedup, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-6 pipeline operators on crafted corpora:
  * concat-and-chunk sequence packing, repeated-span detection, unigram-LM
  * perplexity scoring, and the Gopher-style composite quality gate. The
  * DuckDB oracle pins bit-exactness on the synthetic tables; these pin the
  * SEMANTICS on documents with known structure.
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def corpus(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-pipeops").toString
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("pack_sequences tiles each bucket's token stream exactly") {
    // doc_ids 0/32/64/96 share bucket 0; 1/33 share bucket 1
    val dir = corpus(Seq(
      0L -> Seq.fill(300)("tok").mkString(" "), // 300 tokens
      32L -> Seq.fill(400)("tok").mkString(" "), // straddles the 512 boundary
      64L -> Seq.fill(100)("tok").mkString(" "),
      96L -> Seq.fill(600)("tok").mkString(" "), // longer than one sequence
      1L -> Seq.fill(10)("tok").mkString(" "),
      33L -> Seq.fill(20)("tok").mkString(" ")))
    val out = TextAnalysis.queries("pack_sequences")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.length === 6)
    // within each bucket the [start_off, start_off + n_tokens) intervals
    // tile [0, total) with no gaps or overlaps, in SOME deterministic order
    for ((_, docs) <- out.groupBy(_._2)) {
      val sorted = docs.sortBy(_._4)
      assert(sorted.head._4 === 0L, "first doc starts at offset 0")
      for (Array(a, b) <- sorted.sliding(2))
        assert(b._4 === a._4 + a._3, "contiguous token stream")
    }
    for ((_, _, n, start, first, last, spanned) <- out) {
      assert(first === start / 512)
      assert(last === (start + n - 1) / 512)
      assert(spanned === last - first + 1)
    }
    // 1400 tokens in bucket 0 ⇒ some doc must straddle a sequence boundary
    assert(out.filter(_._2 == 0L).exists(_._7 >= 2))
  }

  test("pack_sequences invariants hold on a randomized corpus") {
    // deterministic pseudo-random doc sizes: every bucket gets a mix of
    // tiny, boundary-straddling, and multi-sequence docs
    val rng = new scala.util.Random(42)
    val docs = (0 until 200).map { i =>
      val id = rng.nextInt(100000).toLong * 200 + i // sparse, collision-free
      id -> Seq.fill(1 + rng.nextInt(1200))("t").mkString(" ")
    }
    val dir = corpus(docs)
    val out = TextAnalysis.queries("pack_sequences")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.length === docs.length)
    for ((id, bucket, n, start, first, last, spanned) <- out) {
      assert(bucket === id % 32)
      assert(first === start / 512 && last === (start + n - 1) / 512)
      assert(spanned === last - first + 1 && n >= 1)
    }
    for ((_, bDocs) <- out.groupBy(_._2)) {
      val sorted = bDocs.sortBy(_._4)
      assert(sorted.head._4 === 0L)
      for (Array(a, b) <- sorted.sliding(2))
        assert(b._4 === a._4 + a._3,
          s"gap/overlap in bucket ${a._2} at offset ${b._4}")
    }
  }

  test("dedup_span_exact finds the shared 16-token chunk and nothing else") {
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val shared = words("p", 16)
    val dir = corpus(Seq(
      1L -> (shared + " " + words("a", 16)), // chunk 0 shared, chunk 1 unique
      2L -> (shared + " " + words("b", 16)),
      3L -> words("c", 32), // all chunks unique
      4L -> words("d", 10))) // too short: no full chunk
    val out = Dedup.queries("dedup_span_exact")(spark, dir).collect()
    assert(out.length === 1, "exactly one repeated chunk across the corpus")
    val r = out.head
    assert(r.getLong(1) === 2L, "two occurrences")
    assert(r.getLong(2) === 2L, "in two distinct docs")
    assert(r.getLong(3) === 1L, "example is the smallest doc_id")
  }

  test("dedup_span_overlap catches a passage the chunk grid misses") {
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    // the same 16-token passage, at offset 0 in doc 1 but offset 5 in
    // doc 2: the non-overlapping chunk grid hashes it at DIFFERENT phase
    // in each doc (chunk 0 = p0..p15 vs e0..e4 p0..p10), so span_exact is
    // blind to it; stride-1 windows align on it regardless of phase
    val shared = words("p", 16)
    val dir = corpus(Seq(
      1L -> (shared + " " + words("a", 16)),
      2L -> (words("e", 5) + " " + shared + " " + words("b", 11))))
    assert(Dedup.queries("dedup_span_exact")(spark, dir).collect().isEmpty,
      "the chunk grid must NOT see the phase-shifted copy (that's the gap)")
    val out = Dedup.queries("dedup_span_overlap")(spark, dir).collect()
    assert(out.length === 1, "exactly one repeated stride-1 span")
    val r = out.head
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L && r.getLong(3) === 1L)
  }

  test("text_perplexity scores a uniform corpus uniformly, rare above common") {
    // x,y,z each appear twice: p = 1/3, nll_tok = floor(-ln(1/3)*1e6)
    val uniform = corpus(Seq(1L -> "x x y", 2L -> "y z z"))
    val u = TextAnalysis.queries("text_perplexity")(spark, uniform).collect()
    val perTok = math.floor(-math.log(1.0 / 3.0) * 1e6).toLong
    for (r <- u) {
      assert(r.getLong(1) === 3L)
      assert(r.getLong(2) === 3L * perTok)
      assert(math.abs(r.getDouble(3) - perTok / 1e6) < 1e-9)
    }
    // a doc made of corpus-rare tokens scores a higher avg NLL than one
    // made of the dominant token
    val skewed = corpus(Seq(
      10L -> Seq.fill(50)("common").mkString(" "),
      11L -> "rareone raretwo rarethree"))
    val s = TextAnalysis.queries("text_perplexity")(spark, skewed).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(s(11L) > s(10L))
  }

  test("pipeline_pack_corpus packs only deduped, gate-passing docs") {
    val clean = ("the quick brown fox jumps over lazy dogs and then some " +
      "more words appear here today while the sun shines bright above")
    val dir = corpus(Seq(
      1L -> clean,
      2L -> clean, // exact dup of 1: dropped by the keeper rule
      3L -> "too short")) // fails the n_words >= 20 gate
    val out = TextAnalysis.queries("pipeline_pack_corpus")(spark, dir).collect()
    assert(out.length === 1 && out.head.getLong(0) === 1L)
    assert(out.head.getLong(3) === 0L, "sole doc starts its bucket at 0")
  }

  test("decontaminate_bloom is a superset of the exact ngram check") {
    val dir = "/root/testdata/sf0.001"
    val exact = Dedup.queries("decontaminate_ngram")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bloom = Dedup.queries("decontaminate_bloom")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(exact.keySet.subsetOf(bloom.keySet),
      "every exactly-contaminated doc must be bloom-flagged")
    for ((doc, n) <- exact)
      assert(bloom(doc) >= n, s"doc $doc: bloom count below exact count")
  }

  test("pipeline_span_scrub cuts repeated passages but keeps one copy") {
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val shared = words("p", 20)
    val dir = corpus(Seq(
      1L -> (shared + " " + words("a", 10)), // first occurrence: keeper
      2L -> (words("e", 7) + " " + shared + " " + words("b", 3)),
      3L -> words("c", 10))) // short doc: passes through untouched
    val out = Dedup.queries("pipeline_span_scrub")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // doc 1 holds every span's first occurrence → loses nothing
    assert(out(1L) === ((30L, 30L, 0L, shared + " " + words("a", 10))))
    // doc 2's copy of the passage is cut; its unique tokens survive
    assert(out(2L) === ((30L, 10L, 20L, words("e", 7) + " " + words("b", 3))))
    // sub-window docs have no spans and pass through (normalized join)
    assert(out(3L) === ((10L, 10L, 0L, words("c", 10))))
  }

  test("span width is a runtime knob: wider spans flag strictly less") {
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    // docs share a 20-token passage at different phases: 16-token windows
    // find 5 repeated spans (positions 0..4 of the passage), 20-token
    // windows exactly 1, 24-token windows none
    val shared = words("p", 20)
    val dir = corpus(Seq(
      1L -> (shared + " " + words("a", 10)),
      2L -> (words("e", 7) + " " + shared + " " + words("b", 3))))
    assert(Dedup.spanOverlapDedup(spark, dir, 16).collect().length === 5)
    assert(Dedup.spanOverlapDedup(spark, dir, 20).collect().length === 1)
    assert(Dedup.spanOverlapDedup(spark, dir, 24).collect().isEmpty)
    // default entry point and explicit default agree; junk widths fail fast
    assert(Dedup.queries("dedup_span_overlap")(spark, dir).collect().toSeq
      === Dedup.spanOverlapDedup(spark, dir, 16).collect().toSeq)
    intercept[IllegalArgumentException](Dedup.spanOverlapDedup(spark, dir, 1))
  }

  test("bloom capacity is a runtime knob with prefix-monotone flagging") {
    // positions are hex-PREFIX slices of one digest, so a collision at a
    // bigger filter is always a collision at a smaller one: as capacity
    // grows the flagged set can only shrink, and it never shrinks past
    // the exact ngram answer. Running 2^20 and 2^24 over the same corpus
    // pins all of that (and that both sizes WORK without a recompile).
    val dir = "/root/testdata/sf0.001"
    val exact = Dedup.queries("decontaminate_ngram")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b20 = Dedup.decontaminateBloom(spark, dir, 1L << 20).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b24 = Dedup.decontaminateBloom(spark, dir, 1L << 24).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(exact.keySet.subsetOf(b24.keySet) &&
      b24.keySet.subsetOf(b20.keySet),
      "exact ⊆ flagged@2^24 ⊆ flagged@2^20")
    for ((doc, n) <- exact) {
      assert(b24(doc) >= n && b20(doc) >= b24(doc),
        s"doc $doc: per-doc counts must be monotone in capacity")
    }
    // default-capacity entry point and the explicit default agree exactly
    assert(Dedup.queries("decontaminate_bloom")(spark, dir).collect().toSeq
      === Dedup.decontaminateBloom(
        spark, dir, graft.operators.BloomSketch.DefaultBits).collect().toSeq)
    // malformed capacities fail fast, not wrong
    intercept[IllegalArgumentException](
      Dedup.decontaminateBloom(spark, dir, (1L << 20) + 16))
    intercept[IllegalArgumentException](
      Dedup.decontaminateBloom(spark, dir, 1L << 34)) // not a power of 16
  }

  test("split_corpus is a stable partition near the 8/1/1 target") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.TextAnalysis.queries("split_corpus")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(3))
    assert(rows.map(_._1).distinct.length === rows.length, "a partition")
    val frac = rows.groupBy(_._2).view.mapValues(_.length.toDouble / rows.length)
    assert(frac("train") > 0.7 && frac("train") < 0.9, frac.toMap.toString)
    assert(frac("val") > 0.05 && frac("val") < 0.15)
    assert(frac("test") > 0.05 && frac("test") < 0.15)
    // deterministic: a re-run assigns identically (hash of doc_id only)
    val again = graft.queries.TextAnalysis.queries("split_corpus")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(3))
    assert(rows.toSeq === again.toSeq)
  }

  test("shuffle_corpus shards cover the corpus with dense positions") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.TextAnalysis.queries("shuffle_corpus")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).distinct.length === rows.length)
    for ((shard, docs) <- rows.groupBy(_._2)) {
      assert(docs.map(_._3).sorted.toSeq === (1L to docs.length),
        s"shard $shard positions must be dense from 1")
    }
    assert(rows.map(_._2).distinct.length === 8, "all shards populated")
  }

  test("mix_corpus upsampling converges to the source weights") {
    val dir = "/root/testdata/sf0.01" // 25 docs per source
    val out = TextAnalysis.queries("mix_corpus")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    // copies per doc are bounded by ceil(weight) and floor(weight)
    for ((_, _, w, n) <- out)
      assert(n >= math.floor(w).toLong && n <= math.ceil(w).toLong)
    // per source, total copies land within the hash-fraction tolerance of
    // weight × n_docs (exactly n·floor(w) plus a Binomial(n, frac) tail)
    for ((src, docs) <- out.groupBy(_._2)) {
      val w = docs.head._3
      val nDocs = docs.map(_._1).distinct.length
      val copies = docs.groupBy(_._1).map(_._2.head._4).sum
      assert(math.abs(copies - w * nDocs) <= 10,
        s"$src: $copies copies for weight $w over $nDocs docs")
    }
    // deterministic: a second run produces the identical expansion
    val again = TextAnalysis.queries("mix_corpus")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(again.toSeq === out.toSeq)
  }

  test("text_vocab_sketch never underestimates and matches exact top counts") {
    val dir = "/root/testdata/sf0.001"
    val sk = TextAnalysis.queries("text_vocab_sketch")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val exact = TextAnalysis.queries("text_vocab")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk.nonEmpty)
    for ((tok, (tf, est, isExact)) <- sk) {
      assert(est >= tf, s"$tok: count-min must overestimate, got $est < $tf")
      assert(isExact === (est == tf))
      assert(exact(tok) === tf, s"$tok: true count disagrees with text_vocab")
    }
  }

  test("emb_quantize maps ranges to full-scale int8 codes, constants to 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft-quant").toString
    import spark.implicits._
    Seq((1L, Seq(0f, 10f)), (2L, Seq(5f, 10f)), (3L, Seq(10f, 10f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.queries.Similarity.queries("emb_quantize")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // dim 0 spans [0,10]: codes 0, floor(127.5)=127, 255
    assert(out(0L) === ((0.0, 10.0, 3L, 382L, 127L * 127 + 255L * 255)))
    // dim 1 is constant: hi == lo collapses every code to 0
    assert(out(1L) === ((10.0, 10.0, 3L, 0L, 0L)))
  }

  test("pipeline_pretrain_corpus composes keeper/gate/decontaminate/stats") {
    // one doc per exclusion path, two survivors with distinct langs so the
    // aggregated output pins per-doc membership without depending on the
    // (separately oracle-gated) split assignment
    val cluster = ("apple banana cherry date elder fig grape honey iris " +
      "jade kiwi lemon mango nectar olive peach quince rose straw tomato " +
      "ugli vine wheat xray yam") // 25 words, >100 chars
    val unique = ("zebra yak wolf viper tiger snake rhino puma otter newt " +
      "mole lynx koala jackal ibex heron gecko ferret eagle dingo crane " +
      "bison") // 22 words, >100 chars
    val contaminated = ("this long document quotes the secret eval answer " +
      "verbatim along with twenty or so other perfectly ordinary filler " +
      "words stretched out to pass both quality thresholds easily") // 27 w
    val docs = Seq(
      (1L, contaminated, "en"), // gated in, but shares a 3-gram with doc 97
      (2L, cluster, "en"), // near-dup cluster keeper (min id) — survives
      (3L, cluster, "en"), // cluster duplicate — dropped
      (4L, cluster, "en"), // cluster duplicate — dropped
      (5L, unique, "fr"), // unique, clean — survives
      (6L, "too short to pass the gate", "en"), // fails n_words >= 20
      (97L, "the secret eval answer is forty two", "en")) // benchmark split
    val dir = java.nio.file.Files.createTempDirectory("graft-ppc").toString
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.queries("pipeline_pretrain_corpus")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    // exactly the two survivors, one per lang, whatever their splits
    assert(out.map(_._3).sum === 2L, out.toSeq)
    assert(out.filter(_._2 == "en").map(_._4).sum === 25L, out.toSeq)
    assert(out.filter(_._2 == "fr").map(_._4).sum === 22L, out.toSeq)
  }

  test("pipeline_gopher_filter keeps clean prose, rejects degenerate docs") {
    val clean = ("the quick brown fox jumps over lazy dogs and then some " +
      "more words appear here today while the sun shines bright above")
    val dir = corpus(Seq(
      1L -> clean, // 21 words, stopwords present, varied
      2L -> Seq.fill(30)("word").mkString(" "), // top_frac = 1.0
      3L -> "too short to pass", // n_words < 20
      4L -> (1 to 25).map(i => s"unique$i").mkString(" "))) // no stopwords
    val out = TextAnalysis.queries("pipeline_gopher_filter")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
  }

  test("split_leakage_audit accounts for every minhash near-dup pair") {
    val sfDir = "/root/testdata/sf0.001"
    val audit = Dedup.queries("split_leakage_audit")(spark, sfDir).collect()
    val nPairs = Dedup.queries("dedup_minhash_lsh")(spark, sfDir).count()
    // the audit is a PARTITION of the pair set by split class: totals match
    assert(audit.map(_.getLong(3)).sum === nPairs,
      "audit pair totals must equal the dedup_minhash_lsh pair count")
    audit.foreach { r =>
      val (lo, hi, crosses) = (r.getString(0), r.getString(1), r.getBoolean(2))
      assert(crosses === (lo != hi), s"crosses flag wrong for ($lo, $hi)")
      assert(lo <= hi, s"split class not canonicalized: ($lo, $hi)")
      val maxSim = r.getDouble(4)
      assert(maxSim >= 0.5 && maxSim <= 1.0, s"max_sim $maxSim out of range")
    }
  }
}
