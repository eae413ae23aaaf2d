package graft

import graft.queries.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** The vocab-scale BPE trainer ([[graft.operators.BpeTrainer]] behind
  * `TextAnalysis.trainBpeFast`) promises BIT-parity with the per-round
  * Spark reference trainer (`trainBpeOn`) — same merges, same order, same
  * pre-round pair frequencies, same early stop. This spec proves it at
  * 500+ merges (50× the corpus-trained table) on a synthetic corpus, plus
  * the testdata corpus at the production round count.
  *
  * The fast trainer runs ONE Spark job (the word-frequency aggregate);
  * the reference pays one aggregate + argmax + materialization per merge —
  * which is exactly why the fast path exists, and why this spec is the
  * slowest BPE test in the suite (it runs the reference at 500 rounds). */
class BpeFastTrainerSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** ~120 docs over a 300-word pool (len 4–12): Σ(len−1) across distinct
    * words ≫ 500, so 500 merges are learnable before exhaustion. */
  private def syntheticDocs = {
    val rnd = new scala.util.Random(7)
    val pool = (0 until 300).map { _ =>
      val len = 4 + rnd.nextInt(9)
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }.distinct
    val docs = (0 until 120).map { i =>
      (i.toLong, (0 until 40).map(_ => pool(rnd.nextInt(pool.size)))
        .mkString(" "))
    }
    import spark.implicits._
    docs.toDF("doc_id", "text")
  }

  test("500-merge bit-parity with the per-round Spark reference trainer") {
    val docs = syntheticDocs.cache()
    try {
      val fast = TextAnalysis.trainBpeFast(docs, rounds = 500)
      assert(fast.size >= 500,
        s"synthetic corpus exhausted early (${fast.size} merges) — pool too small")
      val ref = TextAnalysis.trainBpeOn(docs, rounds = 500)
      assert(fast.size === ref.size)
      fast.zip(ref).zipWithIndex.foreach { case ((f, r), i) =>
        assert(f === r, s"divergence at merge $i")
      }
    } finally docs.unpersist()
  }

  test("early exhaustion stops both trainers identically") {
    import spark.implicits._
    // two tiny words: only a handful of merges exist; ask for far more
    val docs = Seq((1L, "abc abc de"), (2L, "abc de de")).toDF("doc_id", "text")
    val fast = TextAnalysis.trainBpeFast(docs, rounds = 50)
    val ref = TextAnalysis.trainBpeOn(docs, rounds = 50)
    assert(fast === ref)
    assert(fast.size < 50, "exhaustion must truncate the merge list")
  }

  test("2000 merges train in one Spark job (vocab-scale shape)") {
    // no per-round Spark reference here (that's the 500-merge parity test
    // above); this pins the SCALE claim — thousands of merges are one
    // word-table aggregate plus driver arithmetic, seconds not hours
    val rnd = new scala.util.Random(11)
    val pool = (0 until 800).map { _ =>
      val len = 6 + rnd.nextInt(14)
      (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }.distinct
    import spark.implicits._
    val docs = (0 until 200).map { i =>
      (i.toLong, (0 until 60).map(_ => pool(rnd.nextInt(pool.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val merges = TextAnalysis.trainBpeFast(docs, rounds = 2000)
    assert(merges.size === 2000, s"pool exhausted at ${merges.size}")
    // structural sanity: learned order, composition, positive counts
    assert(merges.map(_._1) === (1L to 2000L))
    merges.foreach { case (_, l, r, m, c) =>
      assert(l + r === m); assert(c > 0L)
    }
  }

  test("testdata corpus parity at the production round count") {
    val docs = graft.util.Tables(spark, "/root/testdata/sf0.001", "documents")
    val fast = TextAnalysis.trainBpeFast(docs)
    val ref = TextAnalysis.trainBpeOn(docs)
    assert(fast === ref)
  }

  /** Mixed-alphabet pool: latin (both cases), digits, punctuation, CJK —
    * every character class the [a-z] family was blind to. Words stay ≤ 5
    * chars so CJK (3 B/char) keeps byte length within the trainer's
    * 16-byte vocab bound. */
  private def syntheticByteDocs = {
    val rnd = new scala.util.Random(13)
    val chars = "abcdefgXYZ0189.,!?-中文水火日月デタ"
    val pool = (0 until 300).map { _ =>
      val len = 3 + rnd.nextInt(3)
      (0 until len).map(_ => chars(rnd.nextInt(chars.length))).mkString
    }.distinct
    val docs = (0 until 120).map { i =>
      (i.toLong, (0 until 40).map(_ => pool(rnd.nextInt(pool.size)))
        .mkString(" "))
    }
    import spark.implicits._
    docs.toDF("doc_id", "text")
  }

  test("byte alphabet: 500-merge bit-parity on digits + punctuation + case + CJK") {
    val docs = syntheticByteDocs.cache()
    try {
      val fast = TextAnalysis.trainBpeFastBytes(docs, rounds = 500)
      assert(fast.size >= 500,
        s"byte pool exhausted early (${fast.size} merges) — pool too small")
      val ref = TextAnalysis.trainBpeOnBytes(docs, rounds = 500)
      assert(fast.size === ref.size)
      fast.zip(ref).zipWithIndex.foreach { case ((f, r), i) =>
        assert(f === r, s"divergence at merge $i")
      }
      // the alphabet actually widened: some learned symbol must contain a
      // non-[a-z] byte (hex pairs outside 61..7A)
      val azHex = ('a' to 'z').map(c => f"${c.toInt}%02X").toSet
      def syms(m: String) = m.grouped(2).toSeq
      assert(fast.exists(m => syms(m._4).exists(s => !azHex.contains(s))),
        "no non-latin byte ever participated in a merge")
    } finally docs.unpersist()
  }

  test("byte alphabet: testdata corpus parity at the production round count") {
    val docs = graft.util.Tables(spark, "/root/testdata/sf0.001", "documents")
    val fast = TextAnalysis.trainBpeFastBytes(docs)
    val ref = TextAnalysis.trainBpeOnBytes(docs)
    assert(fast === ref)
  }
}
