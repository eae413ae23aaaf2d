package graft

import graft.operators.{IvfIndex, PqIndex, SearchIndex}
import graft.streaming.{LiveAnnServer, LiveIvfServer, LiveSearchServer}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The LIVE-refresh serving contract (round-9 follow-up #2) and the
  * snapshot lifecycle contract (#5):
  *  - documents appended to a persisted search index MID-STREAM are
  *    served as soon as their batch commits — no restart — and every
  *    answer equals the batch operator's over the index state the server
  *    had refreshed to;
  *  - vectors upserted into a persisted PQ index mid-stream are probed
  *    after their files commit;
  *  - [[SearchIndex.snapshot]] persists exactly one plan per handle and
  *    `close()` removes it from the cache manager — N streams share one
  *    snapshot instead of leaking one cached plan per construction. */
class LiveServeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def docs = graft.util.Tables(spark, sfDir, "documents")
    .select(col("doc_id"), col("text"))

  test("LiveSearchServer: appendDocs mid-stream is served after commit, without restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-livesearch").toString
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    SearchIndex.build(half1).save(dir)

    def batchAnswer(): Seq[(Long, Long)] =
      SearchIndex.search(SearchIndex.load(spark, dir),
          Seq("vector", "stream"), 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val beforeAppend = batchAnswer()
    val results =
      new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Long, Long)]]()
    val server = new LiveSearchServer(spark, dir, "tfidf")
    val mem = MemoryStream[(Long, String)]
    val q = server.serve(
        mem.toDF().toDF("q_id", "q"), "q_id", "q", topK = 5) { out =>
      out.collect().foreach { r =>
        results.put(r.getLong(0),
          r.getSeq[Long](1).zip(r.getSeq[Long](2)).toSeq)
      }
    }
    try {
      mem.addData((1L, "vector stream"))
      q.processAllAvailable()
      assert(results.get(1L) === beforeAppend,
        "pre-append answers must equal batch search over the half index")

      SearchIndex.appendDocs(spark, dir, half2)
      val afterAppend = batchAnswer()
      // nDocs changed → idf changed → scores must differ: the equality
      // below can only hold if the server actually refreshed
      assert(afterAppend !== beforeAppend,
        "test corpus must make the append observable")

      mem.addData((2L, "vector stream"))
      q.processAllAvailable()
      assert(results.get(2L) === afterAppend,
        "post-append answers must serve the appended docs WITHOUT restart")
    } finally { q.stop(); server.close() }
  }

  test("LiveSearchServer: deleteDocs mid-stream stops serving the doc after its batch commits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-livedel").toString
    SearchIndex.build(docs).save(dir)

    def batchAnswer(): Seq[(Long, Long)] =
      SearchIndex.search(SearchIndex.load(spark, dir),
          Seq("vector", "stream"), 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val before = batchAnswer()
    val victim = before.head._1 // the top-ranked doc: its absence is loud
    val results =
      new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Long, Long)]]()
    val server = new LiveSearchServer(spark, dir, "tfidf")
    val mem = MemoryStream[(Long, String)]
    val q = server.serve(
        mem.toDF().toDF("q_id", "q"), "q_id", "q", topK = 5) { out =>
      out.collect().foreach { r =>
        results.put(r.getLong(0),
          r.getSeq[Long](1).zip(r.getSeq[Long](2)).toSeq)
      }
    }
    try {
      mem.addData((1L, "vector stream"))
      q.processAllAvailable()
      assert(results.get(1L) === before)
      assert(results.get(1L).exists(_._1 == victim))

      assert(SearchIndex.deleteDocs(spark, dir, Seq(victim)) === 1L)
      val after = batchAnswer()
      assert(!after.exists(_._1 == victim))

      mem.addData((2L, "vector stream"))
      q.processAllAvailable()
      assert(results.get(2L) === after,
        "a delete landing mid-stream must stop being served after its " +
          "tombstone batch commits — scores net of the deleted doc")
      assert(!results.get(2L).exists(_._1 == victim))
    } finally { q.stop(); server.close() }
  }

  test("LiveSearchServer filtered serving: filter-then-rank with full-index statistics; two tenants in one micro-batch; mid-stream visibility change") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-livesearchfilt").toString
    SearchIndex.build(docs).save(dir)
    val server = new LiveSearchServer(spark, dir, "tfidf")
    def allowedMod(m: Int) =
      docs.filter(col("doc_id") % m === 0).select("doc_id")

    // the semantic contract: topK over the allowed set = rank EVERY
    // allowed doc by the full-index scorer, take topK (NOT post-filter
    // of the unfiltered topK, which under-fills)
    def bruteFiltered(q: String, m: Int): Seq[(Long, Long)] = {
      val all = SearchIndex.answerWithSnapshot(
        SearchIndex.load(spark, dir).snapshot("tfidf"),
        Seq((99L, q)).toDF("q_id", "q"), topK = 1000000)
        .collect().head
      all.getSeq[Long](1).zip(all.getSeq[Long](2))
        .filter(_._1 % m == 0).take(5).toSeq
    }
    val f3 = server.answerFiltered(
      Seq((1L, "vector stream")).toDF("q_id", "q"), "q_id", "q", 5,
      allowedMod(3)).collect().head
    assert(f3.getSeq[Long](1).zip(f3.getSeq[Long](2)).toSeq ===
      bruteFiltered("vector stream", 3))
    assert(f3.getSeq[Long](1).forall(_ % 3 == 0))

    // keyed: both tenants in ONE call, each equal to its own filtered
    // answer
    def allowedKeyed() =
      allowedMod(3).withColumn("tenant", lit("t3"))
        .unionByName(allowedMod(5).withColumn("tenant", lit("t5")))
        .select("tenant", "doc_id")
    val keyed = server.answerFilteredKeyed(
      Seq((13L, "vector stream", "t3"), (15L, "vector stream", "t5"))
        .toDF("q_id", "q", "tenant"),
      "q_id", "q", "tenant", 5, allowedKeyed())
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Long](1).zip(r.getSeq[Long](2)).toSeq).toMap
    assert(keyed(13L) === bruteFiltered("vector stream", 3))
    assert(keyed(15L) === bruteFiltered("vector stream", 5))
    assert(keyed(13L) !== keyed(15L))

    // serveFilteredKeyedBy: the allowed source re-reads per micro-batch —
    // a tenant's visibility change between batches changes its next
    // answers
    val current = new java.util.concurrent.atomic.AtomicInteger(3)
    val results =
      new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Long, Long)]]()
    val mem = MemoryStream[(Long, String, String)]
    val q = server.serveFilteredKeyedBy(
        mem.toDF().toDF("q_id", "q", "tenant"), "q_id", "q", "tenant", 5,
        () => allowedMod(current.get()).withColumn("tenant", lit("t"))
          .select("tenant", "doc_id")) { out =>
      out.collect().foreach { r =>
        results.put(r.getLong(0),
          r.getSeq[Long](1).zip(r.getSeq[Long](2)).toSeq)
      }
    }
    try {
      mem.addData((21L, "vector stream", "t"))
      q.processAllAvailable()
      assert(results.get(21L) === bruteFiltered("vector stream", 3))
      current.set(5)
      mem.addData((22L, "vector stream", "t"))
      q.processAllAvailable()
      assert(results.get(22L) === bruteFiltered("vector stream", 5))
      assert(results.get(22L) !== results.get(21L))
    } finally { q.stop(); server.close() }
  }

  test("LiveAnnServer: appendVectors mid-stream is probed after commit, without restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.util.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-liveann").toString
    PqIndex.build(half, m = 8, kCodes = 16, coarseK = 4).save(dir)

    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("v")).head().getSeq[Double](0)
    // query ids OUTSIDE the indexed vec_id space: the n_id ≠ q_id
    // self-filter must bite identically for the batch and stream calls
    def batchAnswer(qid: Long): Seq[(Int, Long)] =
      PqIndex.probeAll(PqIndex.load(spark, dir),
          Seq((qid, qv)).toDF("q_id", "qv"), nProbe = 4, topK = 5,
          rerank = 50)
        .collect().map(r => (r.getInt(2), r.getLong(1))).toSeq.sorted

    val before = batchAnswer(1000001L)
    val results =
      new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Int, Long)]]()
    val server = new LiveAnnServer(spark, dir, nProbe = 4, topK = 5,
      rerank = 50)
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = server.serve(
        mem.toDF().toDF("q_id", "qv"), "q_id", "qv") { out =>
      out.collect().groupBy(_.getLong(0)).foreach { case (qid, rows) =>
        results.put(qid,
          rows.map(r => (r.getInt(2), r.getLong(1))).toSeq.sorted)
      }
    }
    try {
      mem.addData((1000001L, qv))
      q.processAllAvailable()
      assert(results.get(1000001L) === before)

      PqIndex.appendVectors(spark, dir, rest)
      val after = batchAnswer(1000002L)
      assert(after !== before, "the upsert must change the neighborhood")

      mem.addData((1000002L, qv)) // same vector, new query id
      q.processAllAvailable()
      assert(results.get(1000002L) === after,
        "post-upsert probes must see the appended vectors WITHOUT restart")
    } finally { q.stop(); server.close() }
  }

  test("LiveAnnServer: a generation swap (rebalance) mid-stream is served, answers preserved") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.util.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-livegen").toString
    // coarseK = 2: rebalance under a 30% cap is guaranteed to commit at
    // least one NEW GENERATION (whole-dir swap) while the server is live
    PqIndex.build(emb, m = 8, kCodes = 16, coarseK = 2).save(dir)
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("v")).head().getSeq[Double](0)
    def batchAnswer(qid: Long): Seq[(Int, Long)] =
      PqIndex.probeAll(PqIndex.load(spark, dir),
          Seq((qid, qv)).toDF("q_id", "qv"),
          nProbe = 16, topK = 5, rerank = 300)
        .collect().map(r => (r.getInt(2), r.getLong(1))).toSeq.sorted

    val before = batchAnswer(2000001L)
    val results =
      new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Int, Long)]]()
    val server = new LiveAnnServer(spark, dir, nProbe = 16, topK = 5,
      rerank = 300)
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = server.serve(
        mem.toDF().toDF("q_id", "qv"), "q_id", "qv") { out =>
      out.collect().groupBy(_.getLong(0)).foreach { case (qid, rows) =>
        results.put(qid,
          rows.map(r => (r.getInt(2), r.getLong(1))).toSeq.sorted)
      }
    }
    try {
      mem.addData((2000001L, qv))
      q.processAllAvailable()
      assert(results.get(2000001L) === before)

      // commit one-or-more new generations under the running server
      assert(IvfIndex.rebalance(spark, dir, maxFrac = 0.3,
        maxSplits = 8).splits >= 1)
      mem.addData((2000002L, qv))
      q.processAllAvailable()
      // deep-rerank exhaustive answers are split-invariant, so serving
      // the NEW generation must reproduce them (and the old generation's
      // files no longer exist — only a refreshed handle can answer)
      assert(results.get(2000002L) === batchAnswer(2000002L))
      assert(results.get(2000002L) === before.map {
        case (rk, id) => (rk, id) })
    } finally { q.stop(); server.close() }
  }

  test("LiveAnnServer: removeVectors mid-stream stops probing the removed vector after its swap commits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.util.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-liverm").toString
    PqIndex.build(emb, m = 8, kCodes = 16, coarseK = 4).save(dir)
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("v")).head().getSeq[Double](0)
    def batchAnswer(qid: Long): Seq[(Int, Long)] =
      PqIndex.probeAll(PqIndex.load(spark, dir),
          Seq((qid, qv)).toDF("q_id", "qv"), nProbe = 16, topK = 5,
          rerank = 100)
        .collect().map(r => (r.getInt(2), r.getLong(1))).toSeq.sorted

    val before = batchAnswer(3000001L)
    val victim = before.head._2 // the top neighbor: its absence is loud
    val results =
      new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Int, Long)]]()
    val server = new LiveAnnServer(spark, dir, nProbe = 16, topK = 5,
      rerank = 100)
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = server.serve(
        mem.toDF().toDF("q_id", "qv"), "q_id", "qv") { out =>
      out.collect().groupBy(_.getLong(0)).foreach { case (qid, rows) =>
        results.put(qid,
          rows.map(r => (r.getInt(2), r.getLong(1))).toSeq.sorted)
      }
    }
    try {
      mem.addData((3000001L, qv))
      q.processAllAvailable()
      assert(results.get(3000001L) === before)
      assert(results.get(3000001L).exists(_._2 == victim))

      // the takedown: a staged-generation swap lands under the server
      assert(IvfIndex.removeVectors(spark, dir, Seq(victim)) === 1L)
      val after = batchAnswer(3000002L)
      assert(!after.exists(_._2 == victim))

      mem.addData((3000002L, qv))
      q.processAllAvailable()
      assert(results.get(3000002L) === after,
        "a removal landing mid-stream must stop being probed after its " +
          "generation commits — the fingerprint sees the swap")
      assert(!results.get(3000002L).exists(_._2 == victim))
    } finally { q.stop(); server.close() }
  }

  test("LiveSearchServer bm25 + phrase modes answer like the batch operators") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-livemodes").toString
    SearchIndex.build(docs).save(dir)
    val idx = SearchIndex.load(spark, dir)

    val bmBatch = SearchIndex.searchBm25(idx, Seq("vector", "stream"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bm = new LiveSearchServer(spark, dir, "bm25")
    try {
      val got = bm.answer(Seq((1L, "vector stream")).toDF("q_id", "q"),
          "q_id", "q", 5)
        .collect().map(r =>
          r.getSeq[Long](1).zip(r.getSeq[Long](2)).toSeq).head
      assert(got === bmBatch)
    } finally bm.close()

    val phBatch = SearchIndex.searchPhrase(idx, Seq("the", "query"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ph = new LiveSearchServer(spark, dir, "phrase")
    try {
      val out = ph.answer(Seq((1L, "the query")).toDF("q_id", "q"),
          "q_id", "q", 5).collect()
      val got =
        if (out.isEmpty) Seq.empty
        else out.head.getSeq[Long](1).zip(out.head.getSeq[Long](2)).toSeq
      assert(got === phBatch)
    } finally ph.close()
  }

  test("snapshot lifecycle: N streams share one handle; close() uncaches it") {
    import org.apache.spark.storage.StorageLevel
    val dir = java.nio.file.Files
      .createTempDirectory("graft-snaplife").toString
    SearchIndex.build(docs.limit(60)).save(dir)
    val idx = SearchIndex.load(spark, dir)
    val snap = idx.snapshot("tfidf")
    try {
      assert(snap.df.storageLevel !== StorageLevel.NONE,
        "snapshot() must persist its relation")
      // N stream constructions from ONE snapshot add NO cached plans:
      // the builder no longer persists internally, so the only persisted
      // relation is the handle's own
      val mkStream = () => {
        import spark.implicits._
        implicit val sqlCtx = spark.sqlContext
        val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
        graft.streaming.StreamOps.searchStream(
          mem.toDF().toDF("ts", "q_id", "q"), "ts", "q_id", "q",
          snap, topK = 3, windowLen = "10 seconds", delay = "5 seconds")
      }
      val streams = (1 to 3).map(_ => mkStream())
      assert(streams.size === 3)
      val cspark = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      val cm = cspark.sharedState.cacheManager
      assert(cm.lookupCachedData(
          snap.df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
        .isDefined, "the one shared snapshot must be the cached plan")
    } finally snap.close()
    assert(snap.df.storageLevel === org.apache.spark.storage.StorageLevel.NONE,
      "close() must unpersist the snapshot")
    val cspark = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    assert(cspark.sharedState.cacheManager.lookupCachedData(
        snap.df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
      .isEmpty, "no cached plan may outlive its handle")
  }

  test("LiveAnnServer serves an OPQ-rotated index; rerank cosines stay raw-space") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.util.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val d = 64
    val r = graft.operators.OpqRotation.fit(emb, m = 8, kCodes = 16)
    val rot = emb.select(col("vec_id"),
      graft.operators.OpqRotation.rotate(col("v"), r, d).as("v"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-liveopq").toString
    PqIndex.build(rot, m = 8, kCodes = 16, coarseK = 4).save(dir)
    // serving pattern: rotate the incoming query stream with the SAME
    // column transform the corpus used — composable, no server changes
    val results = new java.util.concurrent.ConcurrentHashMap[
      Long, Seq[(Long, Double)]]()
    val server = new LiveAnnServer(spark, dir, nProbe = 4, topK = 5,
      rerank = 50)
    val mem = MemoryStream[(Long, Seq[Double])]
    val rotatedStream = mem.toDF().toDF("q_id", "qv")
      .select(col("q_id"),
        graft.operators.OpqRotation.rotate(col("qv"), r, d).as("qv"))
    val q = server.serve(rotatedStream, "q_id", "qv") { out =>
      out.collect().groupBy(_.getLong(0)).foreach { case (qid, rows) =>
        results.put(qid,
          rows.map(x => (x.getLong(1), x.getDouble(3))).toSeq.sortBy(_._1))
      }
    }
    try {
      val raw = emb.as[(Long, Seq[Double])].collect().toMap
      mem.addData((9000001L, raw(3L)), (9000002L, raw(7L)))
      q.processAllAvailable()
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        val num = a.zip(b).map(p => p._1 * p._2).sum
        num / (math.sqrt(a.map(x => x * x).sum) *
          math.sqrt(b.map(x => x * x).sum))
      }
      Seq(9000001L -> 3L, 9000002L -> 7L).foreach { case (qid, src) =>
        val got = results.get(qid)
        assert(got != null && got.nonEmpty)
        got.foreach { case (nId, c) =>
          assert(math.abs(c - cos(raw(src), raw(nId))) < 1e-9,
            s"served cosine must equal raw-space cosine for ($qid,$nId)")
        }
      }
    } finally { q.stop(); server.close() }
  }

  // ---------------------------------------- filtered serving (round 14)

  test("LiveAnnServer.serveFiltered: filtered answers equal batch adcProbeFiltered before/after an upsert and after a delete (PQ tier)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.util.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-livefilt-pq").toString
    PqIndex.build(half, m = 8, kCodes = 16, coarseK = 4).save(dir)
    // the metadata predicate, pre-materialized as an allowed-id relation
    val allowed = emb.filter(col("vec_id") % 3 === 0).select("vec_id")
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("v")).head().getSeq[Double](0)
    def batchAnswer(qid: Long): Seq[(Int, Long)] =
      PqIndex.adcProbeFiltered(PqIndex.load(spark, dir),
          Seq((qid, qv)).toDF("q_id", "qv"), allowed,
          nProbe = 4, topK = 5, rerank = 50)
        .collect().map(r => (r.getInt(2), r.getLong(1))).toSeq.sorted
    val results =
      new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Int, Long)]]()
    val server = new LiveAnnServer(spark, dir, nProbe = 4, topK = 5,
      rerank = 50)
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = server.serveFiltered(
        mem.toDF().toDF("q_id", "qv"), "q_id", "qv", allowed) { out =>
      out.collect().groupBy(_.getLong(0)).foreach { case (qid, rows) =>
        results.put(qid,
          rows.map(r => (r.getInt(2), r.getLong(1))).toSeq.sorted)
      }
    }
    try {
      val before = batchAnswer(5000001L)
      assert(before.nonEmpty)
      // every served id satisfies the predicate
      assert(before.forall(_._2 % 3 == 0))
      mem.addData((5000001L, qv))
      q.processAllAvailable()
      assert(results.get(5000001L) === before)

      // upsert: the odd half lands — filtered answers must see the new
      // allowed vectors without restart
      PqIndex.appendVectors(spark, dir, rest)
      val after = batchAnswer(5000002L)
      assert(after !== before, "the upsert must change the neighborhood")
      mem.addData((5000002L, qv))
      q.processAllAvailable()
      assert(results.get(5000002L) === after)

      // delete the best allowed neighbor: it must never be served again
      val victim = after.head._2
      assert(IvfIndex.removeVectors(spark, dir, Seq(victim)) === 1L)
      val afterDelete = batchAnswer(5000003L)
      assert(!afterDelete.exists(_._2 == victim))
      mem.addData((5000003L, qv))
      q.processAllAvailable()
      assert(results.get(5000003L) === afterDelete)
      assert(!results.get(5000003L).exists(_._2 == victim),
        "a tombstoned vector must never be served")
    } finally { q.stop(); server.close() }
  }

  test("LiveIvfServer.serveFiltered: filtered answers equal batch probeFiltered before/after an upsert and after a delete (IVF tier)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.util.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-livefilt-ivf").toString
    IvfIndex.build(half, k = 4).save(dir)
    val allowed = emb.filter(col("vec_id") % 3 === 0).select("vec_id")
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("v")).head().getSeq[Double](0)
    def batchAnswer(qid: Long): Seq[(Int, Long)] =
      IvfIndex.probeFiltered(IvfIndex.load(spark, dir),
          Seq((qid, qv)).toDF("q_id", "qv"), allowed,
          nProbe = 4, topK = 5)
        .collect().map(r => (r.getInt(2), r.getLong(1))).toSeq.sorted
    val results =
      new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Int, Long)]]()
    val server = new LiveIvfServer(spark, dir, nProbe = 4, topK = 5)
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = server.serveFiltered(
        mem.toDF().toDF("q_id", "qv"), "q_id", "qv", allowed) { out =>
      out.collect().groupBy(_.getLong(0)).foreach { case (qid, rows) =>
        results.put(qid,
          rows.map(r => (r.getInt(2), r.getLong(1))).toSeq.sorted)
      }
    }
    try {
      val before = batchAnswer(6000001L)
      assert(before.nonEmpty && before.forall(_._2 % 3 == 0))
      mem.addData((6000001L, qv))
      q.processAllAvailable()
      assert(results.get(6000001L) === before)

      IvfIndex.appendVectors(spark, dir, rest)
      val after = batchAnswer(6000002L)
      assert(after !== before)
      mem.addData((6000002L, qv))
      q.processAllAvailable()
      assert(results.get(6000002L) === after)

      val victim = after.head._2
      assert(IvfIndex.removeVectors(spark, dir, Seq(victim)) === 1L)
      val afterDelete = batchAnswer(6000003L)
      assert(!afterDelete.exists(_._2 == victim))
      mem.addData((6000003L, qv))
      q.processAllAvailable()
      assert(results.get(6000003L) === afterDelete)
      assert(!results.get(6000003L).exists(_._2 == victim),
        "a tombstoned vector must never be served")
    } finally { q.stop(); server.close() }
  }

  test("serveFilteredBy: an allowed-set change between micro-batches changes the very next batch's answers, on BOTH tiers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.util.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("v")).head().getSeq[Double](0)
    def allowedMod(m: Int) =
      emb.filter(col("vec_id") % m === 0).select("vec_id")
    // the refreshable filter source: what serveFilteredBy re-reads at
    // the top of every micro-batch
    val current = new java.util.concurrent.atomic.AtomicInteger(3)

    // PQ tier
    val pqDir = java.nio.file.Files
      .createTempDirectory("graft-livefby-pq").toString
    PqIndex.build(emb, m = 8, kCodes = 16, coarseK = 4).save(pqDir)
    def pqBatch(qid: Long, m: Int): Seq[(Int, Long)] =
      PqIndex.adcProbeFiltered(PqIndex.load(spark, pqDir),
          Seq((qid, qv)).toDF("q_id", "qv"), allowedMod(m),
          nProbe = 4, topK = 5, rerank = 50)
        .collect().map(r => (r.getInt(2), r.getLong(1))).toSeq.sorted
    val pqResults =
      new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Int, Long)]]()
    val pqServer = new LiveAnnServer(spark, pqDir, nProbe = 4, topK = 5,
      rerank = 50)
    val pqMem = MemoryStream[(Long, Seq[Double])]
    val pq = pqServer.serveFilteredBy(
        pqMem.toDF().toDF("q_id", "qv"), "q_id", "qv",
        () => allowedMod(current.get())) { out =>
      out.collect().groupBy(_.getLong(0)).foreach { case (qid, rows) =>
        pqResults.put(qid,
          rows.map(r => (r.getInt(2), r.getLong(1))).toSeq.sorted)
      }
    }
    try {
      pqMem.addData((7000001L, qv))
      pq.processAllAvailable()
      assert(pqResults.get(7000001L) === pqBatch(7000001L, 3))
      assert(pqResults.get(7000001L).forall(_._2 % 3 == 0))
      // flip the predicate BETWEEN batches: the very next batch obeys it
      current.set(5)
      pqMem.addData((7000002L, qv))
      pq.processAllAvailable()
      assert(pqResults.get(7000002L) === pqBatch(7000002L, 5))
      assert(pqResults.get(7000002L).forall(_._2 % 5 == 0))
      assert(pqResults.get(7000002L) !== pqResults.get(7000001L),
        "the filter change must be visible in the answers")
    } finally { pq.stop(); pqServer.close() }

    // IVF tier, same discipline
    current.set(3)
    val ivfDir = java.nio.file.Files
      .createTempDirectory("graft-livefby-ivf").toString
    IvfIndex.build(emb, k = 4).save(ivfDir)
    def ivfBatch(qid: Long, m: Int): Seq[(Int, Long)] =
      IvfIndex.probeFiltered(IvfIndex.load(spark, ivfDir),
          Seq((qid, qv)).toDF("q_id", "qv"), allowedMod(m),
          nProbe = 4, topK = 5)
        .collect().map(r => (r.getInt(2), r.getLong(1))).toSeq.sorted
    val ivfResults =
      new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Int, Long)]]()
    val ivfServer = new LiveIvfServer(spark, ivfDir, nProbe = 4, topK = 5)
    val ivfMem = MemoryStream[(Long, Seq[Double])]
    val ivf = ivfServer.serveFilteredBy(
        ivfMem.toDF().toDF("q_id", "qv"), "q_id", "qv",
        () => allowedMod(current.get())) { out =>
      out.collect().groupBy(_.getLong(0)).foreach { case (qid, rows) =>
        ivfResults.put(qid,
          rows.map(r => (r.getInt(2), r.getLong(1))).toSeq.sorted)
      }
    }
    try {
      ivfMem.addData((8000001L, qv))
      ivf.processAllAvailable()
      assert(ivfResults.get(8000001L) === ivfBatch(8000001L, 3))
      current.set(5)
      ivfMem.addData((8000002L, qv))
      ivf.processAllAvailable()
      assert(ivfResults.get(8000002L) === ivfBatch(8000002L, 5))
      assert(ivfResults.get(8000002L).forall(_._2 % 5 == 0))
      assert(ivfResults.get(8000002L) !== ivfResults.get(8000001L))
    } finally { ivf.stop(); ivfServer.close() }
  }

  test("serveFilteredKeyedBy: two tenants in ONE micro-batch get disjoint correctly-filtered topKs, equal to per-tenant filtered probes, on BOTH tiers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.util.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("v")).head().getSeq[Double](0)
    def allowedMod(m: Int) =
      emb.filter(col("vec_id") % m === 0).select("vec_id")
    // tenant t3 sees the mod-3 ids, tenant t5 the mod-5 ids
    def allowedKeyed() =
      allowedMod(3).withColumn("tenant", lit("t3"))
        .unionByName(allowedMod(5).withColumn("tenant", lit("t5")))
        .select("tenant", "vec_id")

    // PQ tier
    val pqDir = java.nio.file.Files
      .createTempDirectory("graft-livekey-pq").toString
    PqIndex.build(emb, m = 8, kCodes = 16, coarseK = 4).save(pqDir)
    def pqBatch(qid: Long, m: Int): Seq[(Int, Long)] =
      PqIndex.adcProbeFiltered(PqIndex.load(spark, pqDir),
          Seq((qid, qv)).toDF("q_id", "qv"), allowedMod(m),
          nProbe = 4, topK = 5, rerank = 50)
        .collect().map(r => (r.getInt(2), r.getLong(1))).toSeq.sorted
    val pqResults =
      new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Int, Long)]]()
    val pqServer = new LiveAnnServer(spark, pqDir, nProbe = 4, topK = 5,
      rerank = 50)
    val pqMem = MemoryStream[(Long, Seq[Double], String)]
    val pq = pqServer.serveFilteredKeyedBy(
        pqMem.toDF().toDF("q_id", "qv", "tenant"), "q_id", "qv", "tenant",
        () => allowedKeyed()) { out =>
      out.collect().groupBy(_.getLong(0)).foreach { case (qid, rows) =>
        pqResults.put(qid,
          rows.map(r => (r.getInt(2), r.getLong(1))).toSeq.sorted)
      }
    }
    try {
      // BOTH tenants in the SAME micro-batch
      pqMem.addData((9000003L, qv, "t3"), (9000005L, qv, "t5"))
      pq.processAllAvailable()
      assert(pqResults.get(9000003L) === pqBatch(9000003L, 3),
        "tenant t3's answers must equal its per-tenant filtered probe")
      assert(pqResults.get(9000005L) === pqBatch(9000005L, 5),
        "tenant t5's answers must equal its per-tenant filtered probe")
      assert(pqResults.get(9000003L).forall(_._2 % 3 == 0))
      assert(pqResults.get(9000005L).forall(_._2 % 5 == 0))
      assert(pqResults.get(9000003L).map(_._2) !==
        pqResults.get(9000005L).map(_._2),
        "the tenants' allowed sets differ, so must their topKs")
    } finally { pq.stop(); pqServer.close() }

    // IVF tier, same discipline
    val ivfDir = java.nio.file.Files
      .createTempDirectory("graft-livekey-ivf").toString
    IvfIndex.build(emb, k = 4).save(ivfDir)
    def ivfBatch(qid: Long, m: Int): Seq[(Int, Long)] =
      IvfIndex.probeFiltered(IvfIndex.load(spark, ivfDir),
          Seq((qid, qv)).toDF("q_id", "qv"), allowedMod(m),
          nProbe = 4, topK = 5)
        .collect().map(r => (r.getInt(2), r.getLong(1))).toSeq.sorted
    val ivfResults =
      new java.util.concurrent.ConcurrentHashMap[Long, Seq[(Int, Long)]]()
    val ivfServer = new LiveIvfServer(spark, ivfDir, nProbe = 4, topK = 5)
    val ivfMem = MemoryStream[(Long, Seq[Double], String)]
    val ivf = ivfServer.serveFilteredKeyedBy(
        ivfMem.toDF().toDF("q_id", "qv", "tenant"), "q_id", "qv", "tenant",
        () => allowedKeyed()) { out =>
      out.collect().groupBy(_.getLong(0)).foreach { case (qid, rows) =>
        ivfResults.put(qid,
          rows.map(r => (r.getInt(2), r.getLong(1))).toSeq.sorted)
      }
    }
    try {
      ivfMem.addData((9100003L, qv, "t3"), (9100005L, qv, "t5"))
      ivf.processAllAvailable()
      assert(ivfResults.get(9100003L) === ivfBatch(9100003L, 3))
      assert(ivfResults.get(9100005L) === ivfBatch(9100005L, 5))
      assert(ivfResults.get(9100003L).forall(_._2 % 3 == 0))
      assert(ivfResults.get(9100005L).forall(_._2 % 5 == 0))
      assert(ivfResults.get(9100003L).map(_._2) !==
        ivfResults.get(9100005L).map(_._2))
    } finally { ivf.stop(); ivfServer.close() }
  }
}
