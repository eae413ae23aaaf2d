package graft

import graft.operators.PackState
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Persisted cross-drop FFD pack state: drop N+1 continues drop N's open
  * bins (same seq numbering, cross-drop sequences), replay is
  * fingerprint-idempotent, compaction preserves training rows AND future
  * packing, geometry mismatches fail loudly, crash staging is invisible.
  */
class PackStateSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // tiny geometry: L=8, one bucket — hand-checkable bin arithmetic
  private val P = PackState.Params(seqLen = 8, eosId = 98, padId = 99,
    buckets = 1)

  private def rows(r: (Long, Seq[Int])*): DataFrame = {
    import spark.implicits._
    r.toSeq.toDF("doc_id", "token_ids")
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-packstate").toString

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("two drops pack into continued bins; training rows are the sequential replay") {
    val dir = tmp()
    // drop 1: doc 2 (5 ids → n_eff 6) visits first (FFD), opens bin 1
    // (rem 2); doc 0 (3 ids → n_eff 4) doesn't fit → bin 2 (rem 4)
    PackState.pack(spark, dir,
      rows(0L -> Seq(1, 2, 3), 2L -> Seq(4, 5, 6, 7, 8)), "d1", P)
    // drop 2: doc 3 (3 ids → n_eff 4) fits bin 2 exactly; doc 1 (1 id →
    // n_eff 2) fits bin 1 — both CONTINUE drop 1's bins
    val h = PackState.pack(spark, dir,
      rows(1L -> Seq(9), 3L -> Seq(10, 11, 12)), "d2", P)
    assert(h.version === 2L && h.nDocs === 4L)

    val tr = PackState.trainingRows(spark, h)
      .orderBy("bucket", "seq").collect()
    assert(tr.length === 2)
    // seq 1 = doc 2's prefix+EOS then doc 1's (visit order), full row
    assert(tr(0).getLong(1) === 1L && tr(0).getLong(2) === 2L &&
      tr(0).getLong(3) === 8L && tr(0).getLong(4) === 0L)
    assert(tr(0).getString(5) === md5("4,5,6,7,8,98,9,98"))
    // seq 2 = doc 0 then doc 3, also exactly full
    assert(tr(1).getLong(1) === 2L && tr(1).getLong(2) === 2L &&
      tr(1).getLong(3) === 8L && tr(1).getLong(4) === 0L)
    assert(tr(1).getString(5) === md5("1,2,3,98,10,11,12,98"))

    // the post-pack snapshot: both bins consumed to zero, 4 visits
    val b = PackState.bins(spark, h).orderBy("seq").collect()
    assert(b.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 0L), (2L, 0L)))
  }

  test("fingerprint replay is a no-op; over-long docs truncate to a full row") {
    val dir = tmp()
    val h1 = PackState.pack(spark, dir,
      rows(0L -> (1 to 20).toSeq), "d1", P) // 20 ids > L → truncated
    val replay = PackState.pack(spark, dir,
      rows(5L -> Seq(1)), "d1", P) // same fp, different content: no-op
    assert(replay.version === h1.version && replay.nDocs === 1L)
    val tr = PackState.trainingRows(spark, h1).collect()
    assert(tr.length === 1 && tr(0).getLong(3) === 8L)
    assert(tr(0).getString(5) === md5("1,2,3,4,5,6,7,98"))
  }

  test("compaction preserves training rows AND the next pack's behavior") {
    val dirA = tmp()
    val dirB = tmp()
    def packTwo(dir: String): Unit = {
      PackState.pack(spark, dir,
        rows(0L -> Seq(1, 2, 3), 2L -> Seq(4, 5, 6, 7, 8)), "d1", P)
      PackState.pack(spark, dir, rows(1L -> Seq(9)), "d2", P)
      ()
    }
    packTwo(dirA); packTwo(dirB)
    val before = PackState.trainingRows(spark, PackState.load(dirA, P))
      .orderBy("bucket", "seq").collect().toSeq
    val hc = PackState.compact(spark, dirA, P)
    assert(hc.deltas.size === 1 &&
      hc.fingerprints === Set("d1", "d2"))
    assert(PackState.trainingRows(spark, hc)
      .orderBy("bucket", "seq").collect().toSeq === before)
    assert(PackState.gc(dirA, P) === 2)

    // a third drop packs IDENTICALLY into the compacted and the
    // uncompacted twin — the snapshot carried over exactly
    val d3 = rows(5L -> Seq(20, 21, 22))
    PackState.pack(spark, dirA, d3, "d3", P)
    PackState.pack(spark, dirB, d3, "d3", P)
    assert(
      PackState.trainingRows(spark, PackState.load(dirA, P))
        .orderBy("bucket", "seq").collect().toSeq ===
        PackState.trainingRows(spark, PackState.load(dirB, P))
          .orderBy("bucket", "seq").collect().toSeq)
  }

  test("geometry mismatch fails loudly; crash staging is invisible and gc'd") {
    val dir = tmp()
    PackState.pack(spark, dir, rows(0L -> Seq(1)), "d1", P)
    val other = P.copy(seqLen = 16)
    val e = intercept[IllegalArgumentException] {
      PackState.load(dir, other)
    }
    assert(e.getMessage.contains("geometry"))

    val orphan = java.nio.file.Paths.get(dir, "staging-deadbeef")
    java.nio.file.Files.createDirectories(orphan)
    assert(PackState.load(dir, P).nDocs === 1L)
    assert(PackState.gc(dir, P) === 1)
    assert(!java.nio.file.Files.exists(orphan))
  }

  test("buckets untouched by a drop carry their bins forward verbatim") {
    val p2 = P.copy(buckets = 2)
    val dir = tmp()
    // drop 1 fills bucket 0 only (even doc_id % 2 buckets)
    PackState.pack(spark, dir, rows(0L -> Seq(1, 2, 3)), "d1", p2)
    // drop 2 touches bucket 1 only; bucket 0's snapshot must survive
    val h = PackState.pack(spark, dir, rows(1L -> Seq(4)), "d2", p2)
    val b = PackState.bins(spark, h).orderBy("bucket", "seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(b === Seq((0L, 1L, 4L), (1L, 1L, 6L)))
    // and a later drop into bucket 0 still fits its old bin
    val h3 = PackState.pack(spark, dir, rows(2L -> Seq(5, 6, 7)), "d3", p2)
    val tr = PackState.trainingRows(spark, h3)
      .filter("bucket = 0").orderBy("seq").collect()
    assert(tr.length === 1 && tr(0).getLong(2) === 2L,
      "doc 2 (n_eff 4) joins doc 0's bin (rem 4) — one cross-drop row")
  }
}
