package graft

import graft.queries.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The GPT-2-complete pre-tokenizer tier (round-10 follow-up #6): the
  * contraction alternation and space-prefix convention behave as
  * specified on contraction-heavy text, the reserved special-token id
  * block sits provably above the merge space and is never emitted by an
  * encoder, and special ids round-trip through pack/decode — EOS/PAD as
  * recoverable sequence framing, BOS/UNK as framing decode rejects as
  * content. The train/tokenize/roundtrip parity itself is oracle-gated
  * (train_bpe_gpt2 / tokenize_bpe_ids_gpt2 / tokenize_roundtrip_gpt2). */
class Gpt2TokenizerSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def merges: Seq[(Long, String, String, String, Long)] =
    SparkEntry.queries("train_bpe_gpt2")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  private def encode(texts: Seq[String]): Seq[Seq[Int]] = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("i", "text")
      .select(col("i"),
        graft.exprs.functions.bpe_encode_gpt2_ids(col("text"), merges)
          .as("ids"))
      .collect().sortBy(_.getLong(0)).map(_.getSeq[Int](1).toSeq).toSeq
  }

  private def decode(ids: Seq[Int]): String =
    graft.exprs.BpeDecode.decodeByteIds(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(ids.toArray),
      graft.exprs.BpeMergeTable.gpt2(merges)).toString

  test("contractions split off, single spaces fold forward, whitespace runs survive") {
    // pre-token boundaries are observable through decode ∘ encode being
    // the identity per document (the tiling property) PLUS the byte
    // values: a contraction-initial apostrophe byte (0x27) right after
    // the host word, a space byte folded into the following word
    val texts = Seq(
      "it's done",
      "we're off, I'll say don't",
      "a  b", // 2-space run: donates its last space forward (lookahead)
      "tail space ")
    val enc = encode(texts)
    texts.zip(enc).foreach { case (t, ids) =>
      assert(decode(ids) === t,
        s"decode∘encode must be the identity on '$t'")
    }
    // the space-prefix convention: " say" is ONE pre-token, so the ids
    // of "x say" minus the ids of "x" start with the 0x20 byte id (or a
    // merge whose symbol starts with the space byte) — check directly on
    // a merge-free pair of letters outside the learned vocabulary
    val Seq(a, b) = encode(Seq("qq", "qq zz"))
    assert(b.take(a.length) === a)
    val tail = decode(b.drop(a.length))
    assert(tail === " zz", s"space must fold into the following run: '$tail'")
  }

  test("special ids: a reserved block above the merge space the encoder never emits") {
    val sp = TextAnalysis.ByteSpecialTokens
    assert(sp.keySet === Set("eos", "pad", "bos", "unk", "mask"))
    assert(sp.values.toSeq.distinct.size === sp.size)
    val maxMergeId = 255 + merges.map(_._1).max.toInt
    sp.values.foreach { id =>
      assert(id > maxMergeId && id <= TextAnalysis.ByteSpecialBlockEnd,
        s"special id $id outside (merge space, block end]")
    }
    // no encoder output may land in the reserved block — over the real
    // corpus AND the contraction-heavy derived texts
    val docs = graft.util.Tables(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(graft.exprs.functions.bpe_encode_gpt2_ids(
        org.apache.spark.sql.functions.replace(
          org.apache.spark.sql.functions.replace(
            col("text"), lit("e "), lit("e's ")),
          lit("n "), lit("n'll ")), merges).as("ids"))
      .select(explode(col("ids")).as("id"))
    val inBlock = docs.filter(col("id") > maxMergeId).count()
    assert(inBlock === 0L, "encoder emitted ids in the reserved block")
  }

  test("special ids round-trip through pack/decode: EOS/PAD recoverable framing, BOS/UNK rejected as content") {
    val sp = TextAnalysis.ByteSpecialTokens
    val (eos, pad) = (sp("eos"), sp("pad"))
    val docs = Seq("it's a fine day", "we'll see, won't we",
      "I've been", "can't stop  won't stop", "she'd go")
    val enc = encode(docs)

    // pack: the alphabet-blind discipline (fixed rows, EOS after every
    // document, pad only on the tail) — driver-side replica of the
    // oracle-gated pack operator, which is not the claim here; the
    // SPECIAL-ID semantics through it are
    val seqLen = 32
    val stream = enc.flatMap(ids => ids :+ eos)
    val rows = stream.grouped(seqLen).map { g =>
      if (g.length == seqLen) g else g ++ Seq.fill(seqLen - g.length)(pad)
    }.toSeq
    assert(rows.forall(_.length == seqLen))
    assert(rows.flatten.count(_ == eos) === docs.length,
      "one EOS per document must survive packing")

    // unpack: strip the tail padding, split at EOS, decode each document
    val flat = rows.flatten
    val unpadded = flat.reverse.dropWhile(_ == pad).reverse
    val perDoc = {
      val out = Seq.newBuilder[Seq[Int]]
      var cur = Seq.newBuilder[Int]
      unpadded.foreach { id =>
        if (id == eos) { out += cur.result(); cur = Seq.newBuilder[Int] }
        else cur += id
      }
      out.result()
    }
    assert(perDoc.length === docs.length)
    perDoc.zip(docs).foreach { case (ids, doc) =>
      assert(decode(ids) === doc,
        "unpacked ids must decode to the exact original document")
    }

    // framing ids are NOT content: decode rejects anything in the
    // reserved block loudly (silently skipping would hide a desync
    // between a packer and its unpacker)
    Seq(sp("bos"), sp("unk"), eos, pad).foreach { id =>
      val e = intercept[IllegalArgumentException] {
        decode(enc.head :+ id)
      }
      assert(e.getMessage.contains(id.toString))
    }
  }
}
