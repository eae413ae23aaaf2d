package graft

import graft.operators.SearchIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted lexical index lifecycle: build → save → load answers match
  * the ad-hoc search_tfidf query bit-for-bit (the oracle also gates the
  * query entry), the driver-side bucket mirror agrees with the engine's
  * xxhash64, the postings scan statically prunes to the query terms'
  * buckets, and — round 9 — the INCREMENTAL contract: appendDocs makes an
  * upserted index answer exactly like a fresh build over the union (df
  * and corpus totals are query-time-exact, so there is no stale-IDF
  * window), compact round-trips the answers while collapsing batches and
  * collecting orphans, and the staleness fingerprints surface. */
class SearchIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val Terms = Seq("vector", "stream", "window", "merge")

  private def docs = graft.util.Tables(spark, sfDir, "documents")
    .select(col("doc_id"), col("text"))

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft-searchspec").toString

  private def answers(idx: SearchIndex): (Seq[(Long, Long)], Seq[(Long, Long)]) = (
    SearchIndex.search(idx, Terms, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq,
    SearchIndex.searchBm25(idx, Terms, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)

  private lazy val saved: (SearchIndex, String) = {
    val dir = tmp()
    SearchIndex.build(docs).save(dir, fingerprint = Some("fp-full"))
    (SearchIndex.load(spark, dir), dir)
  }

  test("save/load round-trips postings, totals, and fingerprint") {
    val (idx, dir) = saved
    assert(idx.nDocs === docs.filter(col("text").isNotNull).count())
    assert(idx.nTokens === docs.filter(col("text").isNotNull)
      .select(explode(split(col("text"), "\\s+"))).count())
    assert(idx.postings.count() > 0)
    assert(idx.sourceFps === Seq("fp-full"))
    val batches = new java.io.File(s"$dir/postings")
      .listFiles().filter(_.getName.startsWith("batch="))
    assert(batches.length === 1)
    val buckets = batches.head.listFiles()
      .filter(_.getName.startsWith("tbucket="))
    assert(buckets.nonEmpty && buckets.length <= SearchIndex.TokenBuckets)
  }

  test("driver-side bucket mirror equals the engine's xxhash64 for every token") {
    val (idx, _) = saved
    // any disagreement would make search() read the wrong partition and
    // silently drop postings — assert the mirror over the REAL vocabulary
    val mism = idx.postings
      .select(col("token"), col("tbucket"),
        pmod(xxhash64(col("token")), lit(SearchIndex.TokenBuckets.toLong))
          .as("expect"))
      .filter(col("tbucket") =!= col("expect")).count()
    assert(mism === 0L)
  }

  test("search answers match the ad-hoc search_tfidf query exactly") {
    val (idx, _) = saved
    val adHoc = SparkEntry.queries("search_tfidf")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val served = SearchIndex.search(idx, Terms, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served === adHoc)
  }

  test("the postings scan prunes to the query terms' buckets AND the active batches") {
    val (idx, _) = saved
    val q = SearchIndex.search(idx, Seq("vector"), 5)
    val scans = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("postings"))
    assert(scans.nonEmpty)
    assert(scans.exists(s =>
      s.contains("PartitionFilters") && s.contains("tbucket") &&
        s.contains("batch")),
      s"tbucket+batch filters must reach PartitionFilters:\n${scans.mkString("\n")}")
    // the positional column exists for search_phrase ONLY — the scorers
    // must not pay its bytes: column pruning has to drop it at the scan
    assert(scans.forall(s => !s.contains("pos:")),
      s"positions leaked into a scorer's ReadSchema:\n${scans.mkString("\n")}")
    val bm = SearchIndex.searchBm25(idx, Seq("vector"), 5)
    val bmScans = bm.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("postings"))
    assert(bmScans.nonEmpty && bmScans.forall(s => !s.contains("pos:")),
      s"positions leaked into bm25's ReadSchema:\n${bmScans.mkString("\n")}")
  }

  test("appendDocs: upserted index answers EXACTLY like a fresh build over the union") {
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val dir = tmp()
    SearchIndex.build(half1).save(dir, fingerprint = Some("fp-h1"))
    val n = SearchIndex.appendDocs(spark, dir, half2,
      fingerprint = Some("fp-h2"))
    assert(n === half2.filter(col("text").isNotNull).count())

    val upserted = SearchIndex.load(spark, dir)
    assert(upserted.sourceFps.sorted === Seq("fp-h1", "fp-h2"))
    val fresh = SearchIndex.build(docs)
    assert(upserted.nDocs === fresh.nDocs)
    assert(upserted.nTokens === fresh.nTokens)
    // no stale-IDF window: df/totals are query-time-exact, so TF-IDF and
    // BM25 must be BIT-identical to the never-upserted index
    assert(answers(upserted) === answers(fresh))
  }

  test("compact: one batch, answers unchanged, superseded and orphan batches collected") {
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val dir = tmp()
    SearchIndex.build(half1).save(dir)
    SearchIndex.appendDocs(spark, dir, half2)
    // simulate a CRASHED append: postings batch on disk, no meta commit —
    // must be invisible now and garbage-collected by compact
    docs.limit(3).filter(col("text").isNotNull)
      .select(lit("zzz").as("token"), lit(0L).as("tbucket"),
        col("doc_id"), lit(1L).as("cnt"), lit(1L).as("dl"),
        lit("borphan0000000000").as("batch"))
      .write.mode("append").partitionBy("batch", "tbucket")
      .parquet(s"$dir/postings")
    val before = answers(SearchIndex.load(spark, dir))
    assert(SearchIndex.load(spark, dir).postings
      .filter(col("token") === "zzz").count() === 0L,
      "an uncommitted batch must be invisible to readers")

    SearchIndex.compact(spark, dir)
    val after = SearchIndex.load(spark, dir)
    assert(answers(after) === before)
    val batches = new java.io.File(s"$dir/postings")
      .listFiles().filter(_.getName.startsWith("batch="))
    assert(batches.length === 1, "compact must leave exactly one batch dir")
    assert(new java.io.File(s"$dir/meta").listFiles()
      .count(f => f.isDirectory && !f.getName.startsWith(".")) === 1)
    // a second compact is a no-op round-trip
    SearchIndex.compact(spark, dir)
    assert(answers(SearchIndex.load(spark, dir)) === before)
  }

  test("save into a dir already holding an index fails fast") {
    val dir = tmp()
    SearchIndex.build(docs.limit(10)).save(dir)
    val before = SearchIndex.load(spark, dir).nDocs
    // a second save would commit a second batch whose shared doc_ids
    // double-count — the API refuses instead of silently corrupting
    val e = intercept[IllegalArgumentException] {
      SearchIndex.build(docs.limit(20)).save(dir)
    }
    assert(e.getMessage.contains("appendDocs"))
    assert(SearchIndex.load(spark, dir).nDocs === before,
      "the refused save must leave the index untouched")
  }

  test("appendDocs: overlapping doc_ids rejected; interleaved-but-disjoint ids append") {
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    val dir = tmp()
    SearchIndex.build(evens).save(dir)
    // id ranges INTERSECT (interleaved) but share no doc_id: the exact
    // check runs and passes — range overlap alone must not reject
    SearchIndex.appendDocs(spark, dir, odds)
    val after = SearchIndex.load(spark, dir)
    assert(after.nDocs === docs.filter(col("text").isNotNull).count())
    // re-appending already-indexed doc_ids aborts with nothing written
    val e = intercept[IllegalArgumentException] {
      SearchIndex.appendDocs(spark, dir, docs.limit(5))
    }
    assert(e.getMessage.contains("doc_id"))
    val unchanged = SearchIndex.load(spark, dir)
    assert(unchanged.nDocs === after.nDocs)
    assert(new java.io.File(s"$dir/meta").listFiles()
      .count(f => f.isDirectory && !f.getName.startsWith(".")) === 2,
      "the aborted append must not commit a batch")
    assert(answers(unchanged) === answers(after))
  }

  test("compact supersedes EVERY committed batch: a resurrected superseded batch stays dead") {
    import java.nio.file.{Files, Path, Paths}
    def copyTree(src: Path, dst: Path): Unit = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(src)) { st =>
        st.iterator().asScala.foreach { p =>
          val t = dst.resolve(src.relativize(p).toString)
          if (Files.isDirectory(p)) Files.createDirectories(t)
          else { Files.createDirectories(t.getParent); Files.copy(p, t) }
        }
      }
    }
    val dir = tmp()
    SearchIndex.build(docs.filter(col("doc_id") % 2 === 0)).save(dir)
    SearchIndex.appendDocs(spark, dir, docs.filter(col("doc_id") % 2 === 1))
    val backup = Paths.get(tmp(), "bak")
    copyTree(Paths.get(dir), backup)
    val b0 = new java.io.File(s"$dir/meta").listFiles()
      .filter(f => f.isDirectory && !f.getName.startsWith("."))
      .map(_.getName).min
    SearchIndex.compact(spark, dir) // → C1 supersedes {B0, B1}, gc both
    val expected = answers(SearchIndex.load(spark, dir))
    // simulate the round-9 hazard: a PRIOR compact crashed mid-gc,
    // leaving a superseded batch (meta + postings) next to its
    // superseding one — restore B0 from the backup
    copyTree(backup.resolve("meta").resolve(b0),
      Paths.get(dir, "meta", b0))
    copyTree(backup.resolve("postings").resolve(s"batch=$b0"),
      Paths.get(dir, "postings", s"batch=$b0"))
    assert(answers(SearchIndex.load(spark, dir)) === expected,
      "a superseded batch must stay invisible even when resurrected on disk")
    val committedBefore = new java.io.File(s"$dir/meta").listFiles()
      .filter(f => f.isDirectory && !f.getName.startsWith("."))
      .map(_.getName).toSet // {C1, B0}
    SearchIndex.compact(spark, dir)
    // the new meta must supersede BOTH C1 and the already-superseded B0 —
    // with that, NO gc deletion order can ever un-supersede B0
    val metaDirs = new java.io.File(s"$dir/meta").listFiles()
      .filter(f => f.isDirectory && !f.getName.startsWith("."))
    assert(metaDirs.length === 1)
    val superseded = spark.read.parquet(metaDirs.head.toString)
      .select("supersedes").head().getSeq[String](0).toSet
    assert(superseded === committedBefore,
      s"compact must supersede every committed batch, got $superseded")
    assert(answers(SearchIndex.load(spark, dir)) === expected)
  }

  test("staleness contract: a grown corpus is DETECTABLE against the index's fingerprints") {
    val dir = tmp()
    SearchIndex.build(docs.limit(50)).save(dir, fingerprint = Some("fp-old"))
    val idx = SearchIndex.load(spark, dir)
    // the caller's side of the contract (ensureSearchIndex does exactly
    // this comparison via its cache key): a corpus whose fingerprint is
    // not among the index's source fingerprints means the artifact is
    // stale — serve-or-rebuild is an explicit decision, never silent
    val currentFp = "fp-new-after-growth"
    assert(!idx.sourceFps.contains(currentFp))
    assert(idx.sourceFps === Seq("fp-old"))
  }

  test("searchPhrase: order-sensitive, overlapping matches count, repeated terms fold") {
    import org.apache.spark.sql.SparkSession
    val sparkS = spark
    import sparkS.implicits._
    val d = Seq(
      (1L, "new york is not york new"),
      (2L, "a a a b"),
      (3L, "x new york y new york"),
      (4L, "york new only")).toDF("doc_id", "text")
    val dir = tmp()
    SearchIndex.build(d).save(dir)
    val idx = SearchIndex.load(spark, dir)
    def res(terms: Seq[String]) = SearchIndex.searchPhrase(idx, terms, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // order matters: "new york" ≠ "york new"
    assert(res(Seq("new", "york")) === Seq((3L, 2L), (1L, 1L)))
    assert(res(Seq("york", "new")) === Seq((1L, 1L), (4L, 1L)))
    // overlapping starts count; repeated phrase terms reuse one array
    assert(res(Seq("a", "a")) === Seq((2L, 2L)))
    assert(res(Seq("a", "a", "a")) === Seq((2L, 1L)))
    // a term absent from the corpus empties the result, not errors
    assert(res(Seq("new", "zzz")) === Seq.empty)
  }

  test("deleteDocs: answers bit-identical to a fresh build without the deleted docs") {
    val dir = tmp()
    SearchIndex.build(docs).save(dir)
    // delete docs that actually RANK for the query terms, so the test
    // would catch a delete that only half-applies
    val victims = answers(SearchIndex.load(spark, dir))._1
      .take(3).map(_._1)
    val n = SearchIndex.deleteDocs(spark, dir, victims)
    assert(n === victims.length.toLong)
    val after = SearchIndex.load(spark, dir)
    val fresh = SearchIndex.build(docs.filter(!col("doc_id").isin(victims: _*)))
    assert(after.nDocs === fresh.nDocs)
    assert(after.nTokens === fresh.nTokens)
    // df/nDocs/avgdl recompute net of tombstones → every score
    // bit-identical to an index that never held the deleted docs
    assert(answers(after) === answers(fresh))
    assert(SearchIndex.searchPhrase(after, Seq("the"), 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      SearchIndex.searchPhrase(fresh, Seq("the"), 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // deleting the same ids again (or unknown ids) commits nothing
    assert(SearchIndex.deleteDocs(spark, dir, victims) === 0L)
    assert(SearchIndex.deleteDocs(spark, dir, Seq(-999L)) === 0L)
    assert(answers(SearchIndex.load(spark, dir)) === answers(fresh))
  }

  test("deleteDocs then appendDocs: a deleted doc_id is legally re-indexable") {
    val dir = tmp()
    SearchIndex.build(docs).save(dir)
    val original = answers(SearchIndex.load(spark, dir))
    val victim = original._1.head._1
    assert(SearchIndex.deleteDocs(spark, dir, Seq(victim)) === 1L)
    assert(!answers(SearchIndex.load(spark, dir))._1.exists(_._1 == victim))
    // the tombstone is scoped to the victim's SOURCE batch, so the
    // overlap guard admits the re-append into a new batch…
    SearchIndex.appendDocs(spark, dir, docs.filter(col("doc_id") === victim))
    // …and the restored index answers exactly like the never-deleted one
    assert(answers(SearchIndex.load(spark, dir)) === original)
  }

  test("compact after delete: dead postings physically dropped, tombstones collected") {
    val dir = tmp()
    SearchIndex.build(docs).save(dir)
    val victims = answers(SearchIndex.load(spark, dir))._1.take(2).map(_._1)
    SearchIndex.deleteDocs(spark, dir, victims)
    val before = answers(SearchIndex.load(spark, dir))
    SearchIndex.compact(spark, dir)
    assert(answers(SearchIndex.load(spark, dir)) === before)
    // the physical drop: no surviving postings row carries a deleted id
    val rawAfter = spark.read.parquet(s"$dir/postings")
      .filter(col("doc_id").isin(victims: _*)).count()
    assert(rawAfter === 0L, "compact must physically drop tombstoned postings")
    val tombRoot = new java.io.File(s"$dir/tombstones")
    assert(!tombRoot.exists() || tombRoot.listFiles().isEmpty,
      "compact must collect the applied tombstone batches")
    assert(new java.io.File(s"$dir/meta").listFiles()
      .count(f => f.isDirectory && !f.getName.startsWith(".")) === 1)
  }

  test("crash safety: tombstone pairs without a committed meta are invisible") {
    val sparkS = spark
    import sparkS.implicits._
    val dir = tmp()
    SearchIndex.build(docs).save(dir)
    val before = answers(SearchIndex.load(spark, dir))
    val victim = before._1.head._1
    val srcBatch = SearchIndex.load(spark, dir).postings
      .filter(col("doc_id") === victim)
      .select("batch").head().getString(0)
    // simulate deleteDocs dying AFTER the pairs write, BEFORE the meta
    // commit: the orphan tombstone dir must not delete anything
    Seq((srcBatch, victim)).toDF("batch", "doc_id")
      .write.parquet(s"$dir/tombstones/borphantomb000000")
    assert(answers(SearchIndex.load(spark, dir)) === before,
      "an uncommitted tombstone must be invisible to readers")
    SearchIndex.compact(spark, dir)
    assert(answers(SearchIndex.load(spark, dir)) === before)
    val tombRoot = new java.io.File(s"$dir/tombstones")
    assert(!tombRoot.exists() || tombRoot.listFiles().isEmpty,
      "compact must collect orphan tombstone dirs")
  }

  test("bm25 ranks by saturated tf + length normalization (sane, not degenerate)") {
    val (idx, _) = saved
    val bm = SearchIndex.searchBm25(idx, Terms, 20).collect()
    assert(bm.nonEmpty)
    // scores strictly ordered desc by construction of the sort
    val scores = bm.map(_.getLong(1)).toSeq
    assert(scores === scores.sorted(Ordering[Long].reverse))
    assert(scores.head > 0L)
  }
}
