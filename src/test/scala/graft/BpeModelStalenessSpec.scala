package graft

import graft.operators.BpeModel
import graft.queries.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths, StandardCopyOption}

/** The tokenizer-artifact staleness contract (round-9 directive 7): a BPE
  * model records the corpus fingerprint it was trained from, versions pin
  * their own fingerprints independently (time travel keeps provenance),
  * the pipeline rebuilds on fingerprint change by construction (the root
  * is fingerprint-keyed), and a stale model sitting at the RIGHT root —
  * a restored backup, a copied tmpdir — is detected against the live
  * corpus and superseded rather than silently served. */
class BpeModelStalenessSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def merges(tag: String) = Seq(
    (1L, "a", tag, "a" + tag, 5L),
    (2L, "a" + tag, "c", "a" + tag + "c", 2L))

  test("save stamps the fingerprint per version; versions keep their own") {
    val dir = Files.createTempDirectory("graft-bpefp").toString
    val v1 = BpeModel.save(spark, merges("b"), dir, Some("fp-A"))
    val v2 = BpeModel.save(spark, merges("d"), dir, Some("fp-B"))
    assert(BpeModel.fingerprintOf(dir, v1) === Some("fp-A"))
    assert(BpeModel.fingerprintOf(dir, v2) === Some("fp-B"))
    // fingerprint files are invisible to the parquet reader
    assert(BpeModel.loadVersion(spark, dir, v1) === merges("b"))
    assert(BpeModel.loadVersion(spark, dir, v2) === merges("d"))
    // a version saved without one reports None (unknown, not fresh)
    val v3 = BpeModel.save(spark, merges("e"), dir)
    assert(BpeModel.fingerprintOf(dir, v3) === None)
  }

  /** A private corpus dir the spec can overwrite. */
  private def corpusDir(seed: Int): String = {
    val dir = Files.createTempDirectory("graft-bpecorpus").toString
    graft.util.Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") % 3 === seed)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("pipeline rebuilds on corpus change and heals a stale model at the keyed root") {
    val dir = corpusDir(0)
    val docs = graft.util.Tables(spark, dir, "documents")
    val want = TextAnalysis.trainBpeFast(docs)
    assert(TextAnalysis.persistedMerges(spark, dir) === want)
    val root = TextAnalysis.bpeModelRoot(spark, dir).get
    val v1 = BpeModel.versions(root).last
    assert(BpeModel.fingerprintOf(root, v1).nonEmpty,
      "the pipeline must stamp its artifacts")

    // corpus OVERWRITTEN in place (different rows, new mtime): the keyed
    // root changes, so the pipeline trains fresh — never serves v1
    graft.util.Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") % 3 === 1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val wantNew = TextAnalysis.trainBpeFast(
      graft.util.Tables(spark, dir, "documents"))
    assert(TextAnalysis.persistedMerges(spark, dir) === wantNew)
    val rootNew = TextAnalysis.bpeModelRoot(spark, dir).get
    assert(rootNew !== root, "a changed corpus must key a different root")

    // a STALE model planted at the CORRECT root (restored backup shape):
    // its fingerprint disagrees with the live corpus, so persistedMerges
    // must supersede it with a freshly-trained version, not serve it
    BpeModel.save(spark, merges("z"), rootNew, Some("fp-stale-backup"))
    assert(TextAnalysis.persistedMerges(spark, dir) === wantNew,
      "a mismatched-fingerprint latest version must not be served")
    val latest = BpeModel.versions(rootNew).last
    assert(BpeModel.fingerprintOf(rootNew, latest) !== Some("fp-stale-backup"))
  }
}
