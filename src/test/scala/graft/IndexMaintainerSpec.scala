package graft

import graft.core.EventData
import graft.operators.{PqIndex, SearchIndex}
import graft.storage.ParquetLogBackend
import graft.streaming.{IndexMaintainer, LiveSearchServer, LogStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The WRITE half of the live index loop (round-10 follow-up #2): an
  * event appended to the EVENT LOG becomes searchable through
  * [[LiveSearchServer]] with no manual appendDocs call anywhere, and the
  * exactly-once discipline — epoch-keyed batch ids through appendDocs'
  * idempotent re-entry — means a replayed micro-batch can never change
  * df/nDocs. */
class IndexMaintainerSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docs = graft.util.Tables(spark, sfDir, "documents")
    .select(col("doc_id"), col("text"))

  test("event log → maintainSearch → LiveSearchServer: searchable with no manual index call") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val logDir = tmp("graft-maintlog")
    val idxDir = tmp("graft-maintidx")
    val backend = ParquetLogBackend.create(spark, logDir, compactThreshold = 2)
    backend.append(EventData("doc", """{"text":"alpha beta gamma"}"""))
    backend.append(EventData("doc", """{"text":"alpha delta"}"""))

    val maintainer = IndexMaintainer.maintainSearch(
      LogStream.readStream(spark, logDir)
        .select(col("version").as("doc_id"),
          get_json_object(col("payload"), "$.text").as("text")),
      "doc_id", "text", idxDir, tmp("graft-maintckpt"))
    try {
      maintainer.processAllAvailable()
      // the maintainer BOOTSTRAPPED the index from the stream's first epoch
      val idx = SearchIndex.load(spark, idxDir)
      assert(idx.nDocs === 2L)
      assert(idx.nTokens === 5L)

      val results =
        new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Long, Long)]]()
      val server = new LiveSearchServer(spark, idxDir, "tfidf")
      val mem = MemoryStream[(Long, String)]
      val serveQ = server.serve(
          mem.toDF().toDF("q_id", "q"), "q_id", "q", topK = 5) { out =>
        out.collect().foreach { r =>
          results.put(r.getLong(0),
            r.getSeq[Long](1).zip(r.getSeq[Long](2)).toSeq)
        }
      }
      try {
        mem.addData((1L, "delta"))
        serveQ.processAllAvailable()
        assert(results.get(1L).map(_._1) === Seq(2L),
          "the log's second event must be served by doc_id = version")

        // an event appended to the LOG mid-stream becomes searchable
        // end-to-end: log commit → maintainer epoch → live refresh
        backend.append(EventData("doc", """{"text":"epsilon zeta"}"""))
        backend.append(EventData("doc", """{"text":"epsilon eta"}"""))
        maintainer.processAllAvailable()
        mem.addData((2L, "epsilon"))
        serveQ.processAllAvailable()
        assert(results.get(2L).map(_._1).sorted === Seq(3L, 4L),
          "a log append must be served with no manual index call")
        // and the served scores ARE the batch operator's over the grown index
        val batchNow = SearchIndex.search(
            SearchIndex.load(spark, idxDir), Seq("epsilon"), 5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(results.get(2L) === batchNow)
      } finally { serveQ.stop(); server.close() }
    } finally { maintainer.stop(); backend.close() }
  }

  test("exactly-once: a replayed epoch batch id changes nothing; a half-written attempt redoes cleanly") {
    val dir = tmp("graft-e1idx")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    SearchIndex.build(half1).save(dir)

    // first delivery commits; the REPLAY (same epoch id) is a no-op —
    // df/nDocs cannot double-count however many times the batch retries
    val n1 = SearchIndex.appendDocs(spark, dir, half2,
      batchId = Some("eabc123.7"))
    assert(n1 === half2.filter(col("text").isNotNull).count())
    val totals = (SearchIndex.load(spark, dir).nDocs,
      SearchIndex.load(spark, dir).nTokens)
    assert(SearchIndex.appendDocs(spark, dir, half2,
      batchId = Some("eabc123.7")) === 0L)
    val after = SearchIndex.load(spark, dir)
    assert((after.nDocs, after.nTokens) === totals)
    val fresh = SearchIndex.build(docs)
    assert(after.nDocs === fresh.nDocs && after.nTokens === fresh.nTokens)

    // half-written attempt: postings on disk under the epoch id, meta
    // never committed (the crash window) — the redo collects the orphan
    // and commits exactly once
    val dir2 = tmp("graft-e1idx2")
    SearchIndex.build(half1).save(dir2)
    half2.limit(3).filter(col("text").isNotNull)
      .select(lit("zzz").as("token"), lit(0L).as("tbucket"),
        col("doc_id"), lit(1L).as("cnt"), lit(1L).as("dl"),
        lit("ecrash.0").as("batch"))
      .write.mode("append").partitionBy("batch", "tbucket")
      .parquet(s"$dir2/postings")
    SearchIndex.appendDocs(spark, dir2, half2, batchId = Some("ecrash.0"))
    val healed = SearchIndex.load(spark, dir2)
    assert(healed.nDocs === fresh.nDocs && healed.nTokens === fresh.nTokens)
    assert(healed.postings.filter(col("token") === "zzz").count() === 0L,
      "the redo must not resurrect the crashed attempt's rows")
  }

  test("maintainSearch compactEvery: batches fold under the live maintainer, answers preserved, replay-after-compact safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = docs.filter(col("text").isNotNull)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val idxDir = tmp("graft-compidx")
    val ckpt = tmp("graft-compckpt")
    val mem = MemoryStream[(Long, String)]
    val q = IndexMaintainer.maintainSearch(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      idxDir, ckpt, compactEvery = 3)
    try {
      // 6 epochs of appends: without compaction that is 6 batches; the
      // threshold folds them so the committed count stays < 2×threshold
      all.grouped((all.length + 5) / 6).foreach { g =>
        mem.addData(g: _*)
        q.processAllAvailable()
      }
      val metaDirs = new java.io.File(s"$idxDir/meta").listFiles()
        .count(f => f.isDirectory && !f.getName.startsWith("."))
      assert(metaDirs <= 3,
        s"compactEvery must fold the per-epoch batches, got $metaDirs")
      val idx = SearchIndex.load(spark, idxDir)
      val fresh = SearchIndex.build(docs)
      assert(idx.nDocs === fresh.nDocs && idx.nTokens === fresh.nTokens)
      assert(SearchIndex.search(idx, Seq("vector", "stream"), 10)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
        SearchIndex.search(fresh, Seq("vector", "stream"), 10)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)

      // the replay-after-compact hazard shape, and why the marker layer
      // exists: compact FOLDED AWAY per-epoch meta dirs (the first
      // idempotence layer), so at least one epoch has marker-present +
      // meta-absent — a replay of that epoch consults the marker and
      // skips; without it, appendDocs would re-append into the overlap
      // guard and wedge the stream
      val markers = new java.io.File(s"$ckpt/graft-epochs").listFiles()
        .map(_.getName).toSeq
      assert(markers.nonEmpty, "epochs must leave markers")
      val key = {
        val md = java.security.MessageDigest.getInstance("MD5")
        md.update(ckpt.getBytes("UTF-8"))
        md.digest().map("%02x".format(_)).mkString.take(8)
      }
      val folded = markers.filter(ep => !java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(idxDir, "meta", s"e$key.$ep")))
      assert(folded.nonEmpty,
        "compact must have folded at least one marked epoch's meta — " +
          "the window the marker layer covers")
    } finally q.stop()
  }

  test("tombstone-aware maintenance end-to-end: interleaved appends, library+CLI deletes, inline compactions, crash replay — converges to fresh-build scores") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = docs.filter(col("text").isNotNull)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val groups = all.grouped((all.length + 3) / 4).toSeq
    val idxDir = tmp("graft-tombidx")
    val ckpt = tmp("graft-tombckpt")
    val mem = MemoryStream[(Long, String)]
    def start() = IndexMaintainer.maintainSearch(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      idxDir, ckpt, compactEvery = 2)
    val deleted = scala.collection.mutable.ArrayBuffer.empty[Long]
    var q = start()
    try {
      // epoch 1: appends, then a LIBRARY takedown between epochs
      mem.addData(groups(0): _*); q.processAllAvailable()
      val d1 = groups(0).take(2).map(_._1)
      assert(SearchIndex.deleteDocs(spark, idxDir, d1) === d1.length.toLong)
      deleted ++= d1
      // epoch 2: appends → committed count hits the threshold → the
      // INLINE COMPACT folds the TOMBSTONED index (dead postings must
      // physically drop, tombstone batches collect)
      mem.addData(groups(1): _*); q.processAllAvailable()
      assert(SearchIndex.load(spark, idxDir).postings
        .filter(col("doc_id").isin(d1: _*)).count() === 0L,
        "the inline compact must physically drop tombstoned postings")
      // a CLI takedown (the path an operator actually runs) mid-stream
      val d2 = groups(1).take(1).map(_._1)
      Console.withOut(new java.io.PrintStream(
          new java.io.ByteArrayOutputStream())) {
        graft.cli.Main.main(Array("delete", idxDir) ++ d2.map(_.toString))
      }
      deleted ++= d2
      // epochs 3–4: more appends; epoch 4 folds the CLI tombstone in a
      // second inline compact
      mem.addData(groups(2): _*); q.processAllAvailable()
      mem.addData(groups(3): _*); q.processAllAvailable()

      // CRASH REPLAY: drop the last epoch's commit from the checkpoint
      // and restart — Structured Streaming re-delivers that epoch into
      // foreachBatch; the done marker must skip it, so nothing
      // double-appends into the tombstoned, twice-compacted index
      q.stop()
      val lastCommit = new java.io.File(s"$ckpt/commits").listFiles()
        .filter(_.getName.forall(_.isDigit)).maxBy(_.getName.toInt)
      assert(lastCommit.delete())
      // the local checksum FS shadows every file with .<name>.crc — a
      // stale one makes the replayed commit's rename read as a
      // concurrent-query fence, so the crash simulation drops both
      new java.io.File(lastCommit.getParentFile,
        s".${lastCommit.getName}.crc").delete()
      q = start()
      q.processAllAvailable()

      // convergence: the maintained index — appends + two takedown paths
      // + two inline compactions + a replayed epoch — scores EXACTLY
      // like a fresh build over the surviving docs (the deleteDocs
      // bit-identity contract, end to end; scores are quantized BIGINTs,
      // so equality is exact)
      val idx = SearchIndex.load(spark, idxDir)
      val survivors = all.filterNot(t => deleted.contains(t._1))
      val fresh = SearchIndex.build(survivors.toDF("doc_id", "text"))
      assert(idx.nDocs === fresh.nDocs)
      assert(idx.nTokens === fresh.nTokens)
      val terms = Seq("vector", "stream", "data", "query")
      val gotTfidf = SearchIndex.search(idx, terms, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val wantTfidf = SearchIndex.search(fresh, terms, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(gotTfidf === wantTfidf)
      assert(gotTfidf.nonEmpty)
      val gotBm = SearchIndex.searchBm25(idx, terms, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val wantBm = SearchIndex.searchBm25(fresh, terms, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(gotBm === wantBm)
      assert(!gotTfidf.exists(t => deleted.contains(t._1)) &&
        !gotBm.exists(t => deleted.contains(t._1)),
        "a deleted doc must never be served")
    } finally q.stop()
  }

  test("maintainVectors: stream upserts probe after commit; a marked epoch is skipped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.util.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))

    val idxDir = tmp("graft-vecmaint")
    PqIndex.build(half, m = 8, kCodes = 16, coarseK = 4).save(idxDir)
    val before = PqIndex.load(spark, idxDir).codes.count()

    val ckpt = tmp("graft-vecmaintckpt")
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = IndexMaintainer.maintainVectors(
      mem.toDF().toDF("vec_id", "v"), "vec_id", "v", idxDir, ckpt)
    try {
      mem.addData(rest.toSeq: _*)
      q.processAllAvailable()
      val idx = PqIndex.load(spark, idxDir)
      assert(idx.codes.count() === before + rest.length)
      assert(idx.coarse.assignments.count() === before + rest.length,
        "codes and raw cells must grow together")
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(ckpt, "graft-epochs", "0")))
    } finally q.stop()

    // a replayed (already-done) epoch appends nothing: pre-mark epoch 0
    // of a FRESH query identity, then deliver data into it
    val idxDir2 = tmp("graft-vecmaint2")
    PqIndex.build(half, m = 8, kCodes = 16, coarseK = 4).save(idxDir2)
    val ckpt2 = tmp("graft-vecmaintckpt2")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(ckpt2, "graft-epochs", "0"))
    val mem2 = MemoryStream[(Long, Seq[Double])]
    val q2 = IndexMaintainer.maintainVectors(
      mem2.toDF().toDF("vec_id", "v"), "vec_id", "v", idxDir2, ckpt2)
    try {
      mem2.addData(rest.toSeq: _*)
      q2.processAllAvailable()
      assert(PqIndex.load(spark, idxDir2).codes.count() === before,
        "a done-marked epoch must append nothing (replay semantics)")
    } finally q2.stop()
  }

  test("maintainVectors compactEvery: per-cell file counts stay bounded under a long epoch run, probes invariant") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.util.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq

    def run(compactEvery: Int): String = {
      val idxDir = tmp(s"graft-veccomp$compactEvery")
      PqIndex.build(half, m = 8, kCodes = 16, coarseK = 4).save(idxDir)
      val mem = MemoryStream[(Long, Seq[Double])]
      val q = IndexMaintainer.maintainVectors(
        mem.toDF().toDF("vec_id", "v"), "vec_id", "v",
        idxDir, tmp("graft-veccompckpt"), compactEvery = compactEvery)
      try {
        // 6 micro-batch epochs of small appends
        rest.grouped((rest.length + 5) / 6).foreach { g =>
          mem.addData(g: _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      idxDir
    }
    val compacted = run(compactEvery = 2)
    val uncompacted = run(compactEvery = 0)

    def maxFilesPerCell(dir: String, rel: String): Int =
      new java.io.File(s"$dir/$rel").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
    // without the cadence each epoch leaves new files in its cells; the
    // inline compact folds them to ~one per cell
    assert(maxFilesPerCell(compacted, "pq_codes") <
      maxFilesPerCell(uncompacted, "pq_codes"),
      "inline compaction must fold the per-epoch small files")
    assert(maxFilesPerCell(compacted, "pq_codes") <= 2)
    assert(maxFilesPerCell(compacted, "cells") <= 2)

    // compaction is content-preserving: both runs answer identically
    val qv = emb.filter(col("vec_id") === rest.head._1)
      .select(lit(990001L).as("q_id"), col("v").as("qv"))
    def answers(dir: String) =
      PqIndex.probeAll(PqIndex.load(spark, dir), qv,
          nProbe = 2, topK = 5, rerank = 10)
        .orderBy("rank").collect()
        .map(r => (r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(answers(compacted) === answers(uncompacted),
      "an in-loop compaction must not change any probe answer")
    assert(PqIndex.load(spark, compacted).codes.count() ===
      half.count() + rest.length)
  }

  test("maintainVectors driftEvery: a drifting stream surfaces a tripped verdict through the report channel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.util.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq

    val idxDir = tmp("graft-vecdrift")
    PqIndex.build(half, m = 8, kCodes = 16, coarseK = 4).save(idxDir)
    val reports = new java.util.concurrent.ConcurrentLinkedQueue[
      graft.operators.IvfIndex.DriftReport]()
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = IndexMaintainer.maintainVectors(
      mem.toDF().toDF("vec_id", "v"), "vec_id", "v",
      idxDir, tmp("graft-vecdriftckpt"),
      driftEvery = 1, onDrift = reports.add(_))
    try {
      // epoch 1: stationary upsert — the report channel says ok
      mem.addData(rest.map { case (id, v) => (id + 1000000L, v) }: _*)
      q.processAllAvailable()
      assert(reports.size === 1)
      assert(reports.peek().verdict === "ok",
        "a stationary upsert must report ok through the channel")

      // epoch 2: off-distribution upsert — the maintainer itself surfaces
      // the rebuild signal, nobody ran rebalance or snapshotted anything
      mem.addData(rest.map { case (id, v) =>
        (id + 2000000L, v.map(_ - 8.0)) }: _*)
      q.processAllAvailable()
      val last = reports.toArray(
        Array.empty[graft.operators.IvfIndex.DriftReport]).last
      assert(last.verdict === "rebuild",
        s"the drifting stream must trip the verdict, got ${last.verdict}")
      assert(last.baselineResidNorm.isDefined,
        "the verdict must be judged against the PERSISTED baseline")
    } finally q.stop()
  }

  test("maintainVectors rebuildOnDrift: a tripped verdict heals INLINE — the channel sees the signal, then the post-rebuild ok") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.util.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq

    val idxDir = tmp("graft-vecheal")
    PqIndex.build(half, m = 8, kCodes = 16, coarseK = 4).save(idxDir)
    val reports = new java.util.concurrent.ConcurrentLinkedQueue[
      graft.operators.IvfIndex.DriftReport]()
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = IndexMaintainer.maintainVectors(
      mem.toDF().toDF("vec_id", "v"), "vec_id", "v",
      idxDir, tmp("graft-vechealckpt"),
      driftEvery = 1, onDrift = reports.add(_), rebuildOnDrift = true)
    try {
      // epoch 1: off-distribution upsert — the check trips, the heal
      // runs inline, and BOTH reports land on the channel in order
      mem.addData(rest.map { case (id, v) =>
        (id + 2000000L, v.map(_ - 8.0)) }: _*)
      q.processAllAvailable()
      val afterHeal = reports.toArray(
        Array.empty[graft.operators.IvfIndex.DriftReport]).toSeq
      assert(afterHeal.map(_.verdict) === Seq("rebuild", "ok"),
        s"signal then heal, got ${afterHeal.map(_.verdict)}")

      // epoch 2: a MIX-PRESERVING upsert onto the rebuilt index (the
      // rebuilt corpus is bimodal — original + shifted — and the
      // corpus-weighted gap metric moves with the cluster mix, so a
      // stationary batch must preserve it): the fresh baseline judges
      // it ok, no second rebuild fires
      mem.addData(rest.map { case (id, v) => (id + 3000000L, v) } ++
        rest.map { case (id, v) => (id + 4000000L, v.map(_ - 8.0)) }: _*)
      q.processAllAvailable()
      val all = reports.toArray(
        Array.empty[graft.operators.IvfIndex.DriftReport]).toSeq
      assert(all.map(_.verdict) === Seq("rebuild", "ok", "ok"),
        s"steady state after the heal, got ${all.map(_.verdict)}")
      // content survived the inline rebuild generation end-to-end
      val n = PqIndex.load(spark, idxDir).codes.count()
      assert(n === half.count() + 3L * rest.size)
    } finally q.stop()
  }

  test("maintainVectors crash replay: started-without-done scrubs the partial append, exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.util.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val idxDir = tmp("graft-veccrash")
    PqIndex.build(half, m = 8, kCodes = 16, coarseK = 4).save(idxDir)
    val before = PqIndex.load(spark, idxDir).codes.count()

    // simulate epoch 0 crashing MID-APPEND on a prior attempt: the
    // started marker exists, no done marker, and a PREFIX of the epoch's
    // rows already landed in the index
    val ckpt = tmp("graft-veccrashckpt")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(ckpt, "graft-epochs", ".started-0"))
    val partial = rest.take(10)
    PqIndex.appendVectors(spark, idxDir,
      partial.toSeq.toDF("vec_id", "v"))
    assert(PqIndex.load(spark, idxDir).codes.count() === before + 10)

    // the replay delivers the FULL epoch; the maintainer must scrub the
    // partial state first, then redo — each id lands exactly once
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = IndexMaintainer.maintainVectors(
      mem.toDF().toDF("vec_id", "v"), "vec_id", "v", idxDir, ckpt)
    try {
      mem.addData(rest.toSeq: _*)
      q.processAllAvailable()
      val idx = PqIndex.load(spark, idxDir)
      assert(idx.codes.count() === before + rest.length,
        "the scrubbed redo must not duplicate the crashed prefix")
      assert(idx.codes.groupBy("vec_id").count()
        .filter(col("count") > 1).count() === 0L,
        "no vec_id may appear twice after a crash replay")
      assert(idx.coarse.assignments.count() === before + rest.length,
        "raw cells must match codes after the scrub")
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(ckpt, "graft-epochs", "0")))
    } finally q.stop()
  }

  test("maintainPackState: streamed batches pack exactly like sequential batch packs; training rows continue bins across epochs") {
    import graft.operators.PackState
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val P = PackState.Params(seqLen = 8, eosId = 98, padId = 99, buckets = 1)
    val dir = tmp("graft-packstream")
    val ckpt = tmp("graft-packstream-ckpt")

    val mem = MemoryStream[(Long, List[Int])]
    val q = IndexMaintainer.maintainPackState(
      mem.toDF().toDF("doc_id", "token_ids"), "doc_id", "token_ids",
      dir, ckpt, P, compactEvery = 3)
    try {
      mem.addData((0L, List(1, 2, 3)), (2L, List(4, 5, 6, 7, 8)))
      q.processAllAvailable()
      assert(PackState.load(dir, P).nDocs === 2L)

      // the second epoch's docs must land in the FIRST epoch's open bins
      mem.addData((1L, List(9)), (3L, List(10, 11, 12)))
      q.processAllAvailable()
      val h2 = PackState.load(dir, P)
      assert(h2.nDocs === 4L && h2.deltas.size === 2)
      val streamed = PackState.trainingRows(spark, h2)
        .orderBy("bucket", "seq").collect().toSeq

      // twin state packed as sequential batch calls
      val dir2 = tmp("graft-packbatch")
      PackState.pack(spark, dir2,
        Seq((0L, List(1, 2, 3)), (2L, List(4, 5, 6, 7, 8)))
          .toDF("doc_id", "token_ids"), "b1", P)
      PackState.pack(spark, dir2,
        Seq((1L, List(9)), (3L, List(10, 11, 12)))
          .toDF("doc_id", "token_ids"), "b2", P)
      val batched = PackState
        .trainingRows(spark, PackState.load(dir2, P))
        .orderBy("bucket", "seq").collect().toSeq
      assert(streamed === batched)
      assert(streamed.length === 2, "epoch 2 fills epoch 1's bins")

      // third epoch reaches compactEvery=3 → folds to one delta,
      // training rows preserved, ledger intact
      mem.addData((5L, List(20, 21)))
      q.processAllAvailable()
      val h3 = PackState.load(dir, P)
      assert(h3.nDocs === 5L && h3.deltas.size === 1,
        "inline compaction folded the contribution deltas")
      assert(h3.fingerprints.size === 3, "ledger survives the fold")
    } finally q.stop()
  }

  test("maintainScrubbedPackState: scrub -> tokenize -> pack per epoch equals the sequential treated batches; a mid-stream admit scrubs the very next batch") {
    import graft.operators.{DedupState, PackState}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val P = PackState.Params(seqLen = 8, eosId = 98, padId = 99, buckets = 1)
    // a deterministic stand-in tokenizer: one id per whitespace token
    // (its length), the deployment-supplied stage the maintainer takes
    val tok: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      d => d.select(col("doc_id"),
        expr("transform(split(text, '\\\\s+'), t -> length(t))")
          .cast("array<int>").as("token_ids"))
    val chunk = (1 to DedupState.SpanTokens).map(i => s"w$i").mkString(" ")
    val stateDir = tmp("graft-scrubpack-state")
    DedupState.admit(spark, stateDir,
      Seq((0L, chunk + " trailing tail")).toDF("doc_id", "text"), "d1")

    val dir = tmp("graft-scrubpack")
    val ckpt = tmp("graft-scrubpack-ckpt")
    val mem = MemoryStream[(Long, String)]
    val q = IndexMaintainer.maintainScrubbedPackState(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      stateDir, tok, dir, ckpt, P)
    try {
      // epoch 1: doc 10 embeds the admitted chunk (scrubbed to 2 tokens),
      // doc 12 is clean
      val e1 = Seq(10L -> (chunk + " aa bbb"), 12L -> "x yy zzz")
      mem.addData(e1: _*)
      q.processAllAvailable()
      assert(PackState.load(dir, P).nDocs === 2L)

      // a SECOND chunk admitted MID-STREAM must scrub the next epoch
      val chunk2 = (1 to DedupState.SpanTokens).map(i => s"v$i").mkString(" ")
      DedupState.admit(spark, stateDir,
        Seq((2L, chunk2 + " more tail")).toDF("doc_id", "text"), "d2")
      val e2 = Seq(14L -> (chunk2 + " cc"), 16L -> "p qq")
      mem.addData(e2: _*)
      q.processAllAvailable()
      val streamed = PackState
        .trainingRows(spark, PackState.load(dir, P))
        .orderBy("bucket", "seq").collect().toSeq

      // twin: the sequential treated batches against the same states
      val dir2 = tmp("graft-scrubpack-b")
      val st1 = DedupState.load(stateDir) // both chunks admitted by now —
      // rebuild the PER-EPOCH states the stream actually saw
      val stateDir2 = tmp("graft-scrubpack-state2")
      DedupState.admit(spark, stateDir2,
        Seq((0L, chunk + " trailing tail")).toDF("doc_id", "text"), "d1")
      def treated(st: DedupState.Handle, rows: Seq[(Long, String)]) =
        tok(DedupState.spanScrub(spark, st, rows.toDF("doc_id", "text"))
          .select(col("doc_id"), col("scrubbed_text").as("text")))
      PackState.pack(spark, dir2,
        treated(DedupState.load(stateDir2), e1), "b1", P)
      DedupState.admit(spark, stateDir2,
        Seq((2L, chunk2 + " more tail")).toDF("doc_id", "text"), "d2")
      PackState.pack(spark, dir2,
        treated(DedupState.load(stateDir2), e2), "b2", P)
      val batched = PackState
        .trainingRows(spark, PackState.load(dir2, P))
        .orderBy("bucket", "seq").collect().toSeq
      assert(streamed === batched)
      // the treatment actually bit: doc 10 contributed 2 real ids + EOS,
      // not SpanTokens + 2; doc 14 contributed 1 + EOS
      val contrib = PackState.contrib(spark, PackState.load(dir, P))
        .select(col("doc_id"), size(col("ids_doc")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(contrib(10L) === 3 && contrib(14L) === 2)
      assert(st1.nDocs === 2L)
    } finally q.stop()
  }

  test("maintainMediaState: streamed hash drops admit exactly like sequential batch admits; near-dup re-uploads reject mid-stream") {
    import graft.operators.MediaDedupState
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("graft-mediastream")
    val ckpt = tmp("graft-mediastream-ckpt")
    val A = 0x5a5a5a5a5a5a5a5aL
    val B = 0x1234567890abcdefL
    val nearA = A ^ 7L // 3 bits flipped: hamming 3 <= 7
    val fresh = 0x0f0f0f0f0f0f0f0fL

    val mem = MemoryStream[(Long, Long)]
    val q = IndexMaintainer.maintainMediaState(
      mem.toDF().toDF("img_id", "phash"), "img_id", "phash",
      dir, ckpt, compactEvery = 3)
    try {
      mem.addData((0L, A), (2L, B))
      q.processAllAvailable()
      assert(MediaDedupState.load(dir).nImgs === 2L)

      // exact re-upload (4≡0) and near re-encode (6~0) reject
      // mid-stream with no restart; the fresh image admits
      mem.addData((4L, A), (6L, nearA), (8L, fresh))
      q.processAllAvailable()
      val h2 = MediaDedupState.load(dir)
      assert(h2.nImgs === 3L && h2.deltas.size === 2)

      // third epoch reaches compactEvery=3 → folds; ledger survives
      mem.addData((10L, 0x7777000077770000L))
      q.processAllAvailable()
      val h3 = MediaDedupState.load(dir)
      assert(h3.nImgs === 4L && h3.deltas.size === 1)
      assert(h3.fingerprints.size === 3)

      // streamed state row-identical to sequential batch admits
      val dir2 = tmp("graft-mediabatch")
      MediaDedupState.admit(spark, dir2,
        Seq((0L, A), (2L, B)).toDF("img_id", "phash"), "b1")
      MediaDedupState.admit(spark, dir2,
        Seq((4L, A), (6L, nearA), (8L, fresh))
          .toDF("img_id", "phash"), "b2")
      MediaDedupState.admit(spark, dir2,
        Seq((10L, 0x7777000077770000L)).toDF("img_id", "phash"), "b3")
      assert(MediaDedupState.rows(spark, h3)
        .orderBy("img_id").collect().toSeq ===
        MediaDedupState.rows(spark, MediaDedupState.load(dir2))
          .orderBy("img_id").collect().toSeq)
    } finally q.stop()
  }

  test("maintainDedupState: streamed drops admit exactly like sequential batch admits; compaction cadence preserves content and ledger") {
    import graft.operators.DedupState
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("graft-dedupstream")
    val ckpt = tmp("graft-dedupstream-ckpt")
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val other = "one two three four five six seven eight nine ten"
    val novel = "totally novel other content tokens appear right here now"
    val last = "yet another brand new document with distinct words inside"

    val mem = MemoryStream[(Long, String)]
    val q = IndexMaintainer.maintainDedupState(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      dir, ckpt, compactEvery = 3)
    try {
      mem.addData((0L, base), (2L, other))
      q.processAllAvailable()
      assert(DedupState.load(dir).nDocs === 2L)

      // exact dup (4≡0) and near dup (6~0) of STATE content reject
      // mid-stream; the novel doc admits
      mem.addData((4L, base), (6L, near), (8L, novel))
      q.processAllAvailable()
      val h2 = DedupState.load(dir)
      assert(h2.nDocs === 3L)
      assert(h2.deltas.size === 2)

      // third delta reaches compactEvery=3 → the maintainer folds to one
      mem.addData((10L, last))
      q.processAllAvailable()
      val h3 = DedupState.load(dir)
      assert(h3.nDocs === 4L)
      assert(h3.deltas.size === 1, "inline compaction folded the deltas")
      assert(h3.fingerprints.size === 3, "ledger survives the fold")

      // the streamed state is row-identical to sequential batch admits
      // over the same drops
      val dir2 = tmp("graft-dedupbatch")
      DedupState.admit(spark, dir2,
        Seq((0L, base), (2L, other)).toDF("doc_id", "text"), "b1")
      DedupState.admit(spark, dir2,
        Seq((4L, base), (6L, near), (8L, novel)).toDF("doc_id", "text"), "b2")
      DedupState.admit(spark, dir2,
        Seq((10L, last)).toDF("doc_id", "text"), "b3")
      val streamed = DedupState.rows(spark, h3)
        .orderBy("doc_id").collect().toSeq
      val batched = DedupState.rows(spark, DedupState.load(dir2))
        .orderBy("doc_id").collect().toSeq
      assert(streamed === batched)
    } finally q.stop()
  }

  test("JSONL drop directory → clean stream → dedup state, end to end: later shards dedup against earlier ones with no batch job anywhere") {
    import graft.operators.DedupState
    val in = tmp("graft-dropdir")
    val state = tmp("graft-dropstate")
    val ckpt = tmp("graft-dropckpt")
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    def shard(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(in, name),
        rows.map { case (id, t) =>
          s"""{"doc_id": $id, "text": "$t", "lang": "en", """ +
            s""""source": "crawl", "n_chars": ${t.length}}"""
        }.mkString("\n").getBytes("UTF-8"))

    shard("part-0.json", Seq(
      0L -> base, 2L -> "one two three four five six seven eight nine"))
    val q = IndexMaintainer.maintainDedupState(
      graft.sources.CorpusJsonl.readCleanStream(spark, in),
      "doc_id", "text", state, ckpt)
    try {
      q.processAllAvailable()
      assert(DedupState.load(state).nDocs === 2L)
      // a LATER shard landing in the drop dir: its exact copy of shard
      // 0's content and a near-copy both reject; the novel doc admits
      shard("part-1.json", Seq(
        4L -> base,
        6L -> "alpha beta gamma delta epsilon zeta eta theta iota lambda",
        8L -> "fresh novel content tokens that appear nowhere else"))
      q.processAllAvailable()
      val h = DedupState.load(state)
      assert(h.nDocs === 3L)
      assert(DedupState.rows(spark, h).select("doc_id")
        .collect().map(_.getLong(0)).toSet === Set(0L, 2L, 8L))
    } finally q.stop()
  }
}
