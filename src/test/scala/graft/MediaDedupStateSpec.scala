package graft

import graft.operators.MediaDedupState
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The cross-drop PERCEPTUAL dedup state (round 17): admitted images'
  * dHashes persist as pre-banded evidence; later drops' verdicts run
  * the banded-hamming join against it (exact = identical hash, near =
  * hamming ≤ MaxHamming); replay is fingerprint-idempotent; compaction
  * preserves verdicts; advisory accounting rides the audit card. */
class MediaDedupStateSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def imgs(r: (Long, Long)*): DataFrame = {
    import spark.implicits._
    r.toSeq.toDF("img_id", "phash")
  }

  private def imgsOpt(r: (Long, Option[Long])*): DataFrame = {
    import spark.implicits._
    r.toSeq.toDF("img_id", "phash")
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-mediastate").toString

  private def verdictMap(df: DataFrame) =
    df.collect().map(r => r.getLong(0) -> r).toMap

  // flip k specific bits of a base hash
  private def flip(base: Long, bits: Int*): Long =
    bits.foldLeft(base)((h, b) => h ^ (1L << b))

  private val A = 0x5a5a5a5a5a5a5a5aL
  private val B = 0x1234567890abcdefL
  private val B2 = 0x7777000077770000L

  test("two-drop admission: exact + near tiers vs state and batch; admitted evidence only") {
    val dir = tmp()
    val h1 = MediaDedupState.admit(spark, dir,
      imgs(0L -> A, 2L -> B), "d1")
    assert(h1.nImgs === 2L && h1.version === 1L)

    // drop 2: 11 = exact copy of A; 13 = A with 3 bits flipped (near,
    // hamming 3 <= 7); 15 = a fresh hash; 17/19 = identical pair within
    // the batch (exact_dup_batch on the larger id); 21 = near-dup of 15
    // WITHIN the batch (4 bits flipped)
    val fresh = 0x0f0f0f0f0f0f0f0fL
    val v = verdictMap(MediaDedupState.verdicts(
      spark, MediaDedupState.load(dir),
      imgs(11L -> A, 13L -> flip(A, 1, 17, 63),
        15L -> fresh, 17L -> B2, 19L -> B2,
        21L -> flip(fresh, 2, 9, 33, 48))))
    def b(id: Long, c: String) = v(id).getBoolean(v(id).fieldIndex(c))
    assert(b(11, "exact_dup_state") && !b(11, "admitted"))
    assert(b(11, "near_dup_state"), "hamming 0 also near-dups (flags " +
      "are independent, the DedupState posture)")
    assert(b(13, "near_dup_state") && !b(13, "exact_dup_state") &&
      !b(13, "admitted"))
    assert(b(15, "admitted"))
    assert(b(17, "admitted") && b(19, "exact_dup_batch") &&
      !b(19, "admitted"), "min-id keeper within the batch")
    assert(b(21, "near_dup_batch") && !b(21, "admitted"),
      "keep-first near pair within the batch")

    // admit persists only admitted evidence; replay is a no-op
    val h2 = MediaDedupState.admit(spark, dir,
      imgs(11L -> A, 13L -> flip(A, 1, 17, 63), 15L -> fresh,
        17L -> B2, 19L -> B2, 21L -> flip(fresh, 2, 9, 33, 48)), "d2")
    assert(h2.nImgs === 4L, "15 and 17 admitted; 11/13/19/21 rejected")
    val replay = MediaDedupState.admit(spark, dir, imgs(99L -> 1L), "d2")
    assert(replay.version === h2.version && replay.nImgs === 4L)

    // the audit card remembers the rejected too
    assert(MediaDedupState.card(spark, h2).count() === 8L)

    // a shifted hash beyond the tolerance admits (hamming 8 > 7)
    val v3 = verdictMap(MediaDedupState.verdicts(spark,
      MediaDedupState.load(dir),
      imgs(25L -> flip(A, 0, 8, 16, 24, 32, 40, 48, 56))))
    assert(v3(25L).getBoolean(v3(25L).fieldIndex("admitted")))
  }

  test("compaction preserves verdicts bit-for-bit; gc reclaims; health trips on deltas") {
    val dir = tmp()
    MediaDedupState.admit(spark, dir, imgs(0L -> A), "d1")
    MediaDedupState.admit(spark, dir, imgs(2L -> B), "d2")
    MediaDedupState.admit(spark, dir, imgs(4L -> 0x13579bdf02468aceL), "d3")
    val probe = imgs(11L -> A, 13L -> flip(B, 5, 6), 15L -> 42L)
    val before = MediaDedupState.verdicts(spark,
      MediaDedupState.load(dir), probe).orderBy("img_id").collect().toSeq

    val hr0 = MediaDedupState.health(MediaDedupState.load(dir),
      maxDeltas = 2)
    assert(hr0.nDeltas === 3 && hr0.compactRecommended)

    val hc = MediaDedupState.compact(spark, dir)
    assert(hc.deltas.size === 1 && hc.nImgs === 3L)
    assert(hc.fingerprints === Set("d1", "d2", "d3"), "ledger survives")
    val after = MediaDedupState.verdicts(spark, hc, probe)
      .orderBy("img_id").collect().toSeq
    assert(after === before)
    assert(!MediaDedupState.health(hc, maxDeltas = 2).compactRecommended)
    assert(MediaDedupState.gc(dir) >= 1, "superseded deltas reclaimed")
    // and the compacted state still answers
    assert(MediaDedupState.verdicts(spark, MediaDedupState.load(dir),
      probe).orderBy("img_id").collect().toSeq === before)
  }

  test("null phash carries no evidence on any tier") {
    val dir = tmp()
    MediaDedupState.admit(spark, dir, imgs(0L -> A), "d1")
    val v = verdictMap(MediaDedupState.verdicts(spark,
      MediaDedupState.load(dir),
      imgsOpt(5L -> None, 7L -> None)))
    Seq(5L, 7L).foreach { id =>
      assert(v(id).getBoolean(v(id).fieldIndex("admitted")),
        "two undecodable images never dup each other")
      assert(!v(id).getBoolean(v(id).fieldIndex("exact_dup_batch")))
    }
  }
}
