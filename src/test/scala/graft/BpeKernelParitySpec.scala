package graft

import graft.queries.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The batch tokenizer now encodes the vocabulary through the fused
  * [[graft.exprs.BpeEncodeIds]] kernel (one codegen reference object,
  * plan depth constant in merge count). This spec pins the kernel against
  * the REFERENCE semantics it replaced — the per-merge
  * `applyBpeMerge` column-rewrite chain — at a merge table an order of
  * magnitude larger than anything the corpus trainer learns (500 synthetic
  * merges vs ~10 trained), including chained merges (a round's output
  * feeding a later round) and first-round-wins id collisions.
  *
  * The reference chain is checkpointed every 25 merges: the point of the
  * kernel is precisely that the un-checkpointed chain outgrows the
  * analyzer at production vocab sizes, so the spec bounds the reference's
  * plan depth the same way the trainer bounds its own rounds. */
class BpeKernelParitySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** 400 base pair merges over a–t plus 100 chained merges whose lhs is an
    * earlier round's output — several outputs repeat across rounds, so the
    * first-round-wins id rule is exercised, not just stated. */
  private def syntheticMerges(): Seq[(Long, String, String, String, Long)] = {
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var round = 0L
    for (c1 <- 'a' to 't'; c2 <- 'a' to 't') {
      round += 1
      out += ((round, c1.toString, c2.toString, s"$c1$c2", 1000L - round))
    }
    for (i <- 0 until 90) {
      round += 1
      val l = s"${('a' + i % 20).toChar}${('a' + (i * 7) % 20).toChar}"
      val r = ('a' + (i * 3) % 26).toChar.toString
      out += ((round, l, r, l + r, 10L))
    }
    // explicit re-learned symbols: (x, yz) and later (xy, z) BOTH emit
    // "xyz" for five triples — the id map must keep the FIRST round's id
    for (i <- 0 until 5) {
      val (x, y, z) = (('a' + i).toChar, ('a' + i + 1).toChar,
        ('a' + i + 2).toChar)
      round += 1
      out += ((round, x.toString, s"$y$z", s"$x$y$z", 9L))
      round += 1
      out += ((round, s"$x$y", z.toString, s"$x$y$z", 8L))
    }
    out.result()
  }

  private def words(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    (0 until n).map { _ =>
      val len = 3 + rnd.nextInt(18)
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }.distinct
  }

  test("fused kernel == chained-column reference at 500 merges") {
    val merges = syntheticMerges()
    assert(merges.size == 500)
    val ws = words(300)
    import spark.implicits._
    val wdf = ws.toDF("word")

    // REFERENCE: the exact column-rewrite chain tokenIdsOf used before the
    // kernel — one applyBpeMerge per round over the char-split symbols
    var v = wdf.withColumn("syms", concat_ws(" ",
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")))
    merges.grouped(25).foreach { g =>
      g.foreach { case (_, l, r, _, _) =>
        v = v.withColumn("syms", TextAnalysis.applyBpeMerge(col("syms"), l, r))
      }
      v = v.localCheckpoint(true)
    }
    val refSyms = v.collect().map(r => r.getString(0) -> r.getString(1)).toMap

    // the id scheme the batch path and the kernel share: base char → 0-25,
    // round-r merge output → 25 + r, FIRST round wins on a re-learned symbol
    val ids = scala.collection.mutable.LinkedHashMap[String, Int]()
    for ((round, _, _, m, _) <- merges if !ids.contains(m))
      ids += m -> (25 + round.toInt)
    assert(ids.size < merges.size,
      "the synthetic table must actually contain re-learned symbols")
    val expected = ws.map { w =>
      w -> refSyms(w).split(" ").toSeq
        .map(s => if (s.length == 1) s.charAt(0) - 'a' else ids(s))
    }.toMap

    val got = wdf.select(col("word"),
        graft.exprs.functions.bpe_encode_ids(col("word"), merges).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toList).toMap
    assert(got.keySet === expected.keySet)
    for (w <- ws)
      assert(got(w) === expected(w).toList, s"word '$w'")
  }

  test("byte kernel == chained-column reference on digits + punctuation + case + CJK") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val chars = "abcdXYZ0189.,!中文デ"
    val ws = (0 until 200).map { _ =>
      (0 until (2 + rnd.nextInt(4)))
        .map(_ => chars(rnd.nextInt(chars.length))).mkString
    }.distinct
    val docs = (0 until 60).map(i =>
      (i.toLong, (0 until 30).map(_ => ws(rnd.nextInt(ws.size)))
        .mkString(" "))).toDF("doc_id", "text")
    val merges = TextAnalysis.trainBpeFastBytes(docs, rounds = 60)
    assert(merges.size === 60)

    // REFERENCE: the applyBpeMerge column chain over hex-pair byte symbols
    val wdf = ws.toDF("word")
    var v = wdf
      .withColumn("h", hex(encode(col("word"), "UTF-8")))
      .withColumn("syms", concat_ws(" ", expr(
        "transform(sequence(1, CAST(octet_length(word) AS INT))," +
          " i -> substring(h, 2*i-1, 2))")))
    merges.foreach { case (_, l, r, _, _) =>
      v = v.withColumn("syms", TextAnalysis.applyBpeMerge(col("syms"), l, r))
    }
    v = v.localCheckpoint(true)
    val refSyms = v.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val ids = scala.collection.mutable.LinkedHashMap[String, Int]()
    for ((round, _, _, m, _) <- merges if !ids.contains(m))
      ids += m -> (255 + round.toInt)
    val expected = ws.map { w =>
      w -> refSyms(w).split(" ").toSeq
        .map(s => if (s.length == 2) Integer.parseInt(s, 16) else ids(s))
    }.toMap

    val got = wdf.select(col("word"),
        graft.exprs.functions.bpe_encode_byte_ids(col("word"), merges)
          .as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toList).toMap
    for (w <- ws) assert(got(w) === expected(w).toList, s"word '$w'")
  }

  test("byte kernel: nothing is out-of-alphabet — per-word byte-lossless round trip") {
    import spark.implicits._
    val trainDocs = Seq(
      (1L, "Hello hello WORLD world 3.14 2.71 data-base"),
      (2L, "中文 中文 データ データ mixed MIXED 42! 42!"))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.trainBpeFastBytes(trainDocs, rounds = 30)
    assert(merges.nonEmpty)
    // decode map under the byte id scheme: 0-255 → the byte itself;
    // a re-learned symbol keeps its FIRST round's id, so bind each merged
    // symbol's bytes to that id only
    val idBytes = scala.collection.mutable.HashMap[Int, Array[Byte]]()
    (0 until 256).foreach(b => idBytes(b) = Array(b.toByte))
    val firstIds = scala.collection.mutable.HashMap[String, Int]()
    for ((round, _, _, m, _) <- merges if !firstIds.contains(m)) {
      firstIds(m) = 255 + round.toInt
      idBytes(255 + round.toInt) =
        m.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    }
    val texts = Seq(
      "Hello, WORLD! 3.14159",
      "中文 data 混合テキスト",
      "emoji 🙂 + tabs\tok",
      "1234567890 !@#$%^&*()",
      "MiXeD CaSe unTRAINED wörds")
    val got = texts.toDF("text")
      .select(col("text"),
        graft.exprs.functions.bpe_encode_byte_ids(col("text"), merges)
          .as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    texts.foreach { t =>
      val decoded = got(t).flatMap(idBytes(_)).toArray
      val expected = t.split("\\s+").filter(_.nonEmpty)
        .flatMap(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      assert(java.util.Arrays.equals(decoded, expected),
        s"round trip lost bytes for: $t")
    }
  }

  test("pretok kernel: category runs split apart, bytes preserved") {
    import spark.implicits._
    // no merges: ids are raw byte values, so the pre-tokenizer's word
    // boundaries are directly observable
    def ids(f: (org.apache.spark.sql.Column,
        Seq[(Long, String, String, String, Long)]) =>
        org.apache.spark.sql.Column)(t: String): Seq[Int] =
      Seq(t).toDF("t").select(f(col("t"), Seq.empty).as("ids"))
        .head().getSeq[Int](0)
    val pretok = ids(graft.exprs.functions.bpe_encode_pretok_ids) _
    val ws = ids(graft.exprs.functions.bpe_encode_byte_ids) _
    // splitting "Hello, WORLD! 3.14" by category equals whitespace-
    // splitting its pre-separated form — the pre-tokenizer's contract
    assert(pretok("Hello, WORLD! 3.14") === ws("Hello , WORLD ! 3 . 14"))
    // glued punctuation/digits DO change the whitespace tokenizer's view
    assert(pretok("Hello, WORLD! 3.14") === ws("Hello, WORLD! 3.14"),
      "with no merges both see the same raw bytes")
    // bytes preserved across the split (CJK + latin + digits)
    assert(pretok("中文abc42!") ===
      "中文abc".getBytes("UTF-8").map(_ & 0xff).toSeq ++
        "42".getBytes("UTF-8").map(_ & 0xff) ++
        "!".getBytes("UTF-8").map(_ & 0xff))
  }

  test("empty merge table degrades to per-char ids; chains merge left-to-right non-overlapping") {
    import spark.implicits._
    val none = Seq("abc").toDF("word")
      .select(graft.exprs.functions.bpe_encode_ids(col("word"), Seq.empty)
        .as("ids")).head().getSeq[Int](0)
    assert(none === Seq(0, 1, 2))
    // (a,a)→aa then (aa,aa)→aaaa: 'aaaaa' must merge as [aa][aa]a →
    // [aaaa]a — the doubled-space pass's greedy left-to-right rule
    val merges = Seq(
      (1L, "a", "a", "aa", 5L),
      (2L, "aa", "aa", "aaaa", 2L))
    val out = Seq("aaaaa").toDF("word")
      .select(graft.exprs.functions.bpe_encode_ids(col("word"), merges)
        .as("ids")).head().getSeq[Int](0)
    assert(out === Seq(27, 0), "expected [aaaa=25+2, a=0]")
  }
}
