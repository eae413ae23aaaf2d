package graft

import graft.core.EventData
import graft.storage.ParquetLogBackend
import graft.streaming.{LogStream, StreamOps, VersionHub}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Mirrors EventSchema for MemoryStream's product encoder. Top-level on
  * purpose: nested inside the suite, Spark's generated encoder code fails
  * to compile (outer-pointer capture) and silently falls back to
  * interpreted mode — fine for a test, but the CompileException noise in
  * the log would mask real codegen regressions. */
final case class Ev(
    version: Long, version_previous: Long, timestamp: Long,
    label: String, payload: String, checksum: Long)

/** Structured Streaming surface: log readStream + hub notification
  * (SURVEY.md §2.5 T1-T5) and the event-time extension operators. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def ev(v: Long, ts: Long, label: String) =
    Ev(v, v - 1, ts, label, s"""{"v":$v}""", 0L)

  test("log readStream + foreachBatch publishes high-watermark to the hub") {
    val dir = Files.createTempDirectory("graftstream").toString
    val backend = ParquetLogBackend.create(spark, dir, compactThreshold = 2)
    // two appends → first compaction creates segments/ before the stream starts
    backend.append(EventData("a", """{"x":1}"""))
    backend.append(EventData("b", """{"x":2}"""))

    val hub = new VersionHub
    val sub = hub.subscribe()
    val q = LogStream.notify(
      LogStream.readStream(spark, dir), hub,
      Files.createTempDirectory("graftckpt").toString)
    try {
      // the hub is at-most-once with a capacity-1 drop-on-full mailbox
      // (broadcast.go:24-28 semantics): if processAllAvailable splits into
      // two micro-batches, the second publish is LEGALLY dropped. The
      // documented consumer pattern is notification → re-read the log, so
      // that is what the test asserts — not exact per-version delivery.
      q.processAllAvailable()
      val n1 = sub.poll(5000)
      assert(n1.exists(v => v >= 1L && v <= 2L), s"notification: $n1")
      assert(backend.version == 2L)
      // drain any second-batch publish so phase 2 starts with an empty
      // mailbox (a stale value would otherwise occupy the capacity-1 box
      // and legally drop the phase-2 notification)
      while (sub.poll(200).nonEmpty) {}
      // more appends crossing the compaction threshold → next micro-batch
      backend.append(EventData("c", """{"x":3}"""))
      backend.append(EventData("d", """{"x":4}"""))
      q.processAllAvailable()
      val n2 = sub.poll(5000)
      assert(n2.exists(v => v >= 3L && v <= 4L), s"notification: $n2")
      assert(backend.version == 4L)
    } finally {
      q.stop()
      backend.close()
    }
  }

  test("timer compaction makes appends visible well before compactThreshold") {
    val dir = Files.createTempDirectory("graftstream").toString
    // threshold intentionally unreachable; only the 250ms timer compacts
    val backend = ParquetLogBackend.create(
      spark, dir, compactThreshold = 1000, compactIntervalMs = 250)
    backend.append(EventData("seed", """{"x":0}"""))
    val deadline = System.nanoTime() + 10000000000L
    while (!Files.exists(java.nio.file.Paths.get(dir, "segments"))
        && System.nanoTime() < deadline)
      Thread.sleep(50)
    val hub = new VersionHub
    val sub = hub.subscribe()
    val q = LogStream.notify(
      LogStream.readStream(spark, dir), hub,
      Files.createTempDirectory("graftckpt").toString)
    try {
      q.processAllAvailable()
      assert(sub.poll(5000).contains(1L))
      backend.append(EventData("live", """{"x":1}"""))
      // the streaming query must see version 2 without 999 more appends:
      // poll until the timer has compacted and the source picked it up
      var seen = false
      val end = System.nanoTime() + 10000000000L
      while (!seen && System.nanoTime() < end) {
        q.processAllAvailable()
        seen = sub.poll(200).contains(2L)
      }
      assert(seen, "append stayed invisible to the stream (no timer compaction)")
    } finally {
      q.stop()
      backend.close()
    }
  }

  test("appendSink lands each micro-batch as one atomic multi-append") {
    import org.apache.spark.sql.functions.col
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graftsink").toString
    val backend = ParquetLogBackend.create(spark, dir, compactIntervalMs = 0)
    val log = new graft.core.EventLog(backend)
    val in = MemoryStream[(String, String)]
    val q = LogStream.appendSink(
      in.toDF().select(col("_1").as("label"), col("_2").as("payload")),
      log, Files.createTempDirectory("graftsinkckpt").toString)
    try {
      in.addData(("alpha", """{"i":1}"""), ("beta", """{"i":2}"""))
      q.processAllAvailable()
      assert(log.version == 2L)
      val batch1 = log.scan(1L).select("version_previous", "timestamp").collect()
      // one atomic multi-append: shared timestamp, contiguous chain
      assert(batch1.map(_.getLong(1)).distinct.length == 1)
      in.addData(("gamma", """{"i":3}"""))
      q.processAllAvailable()
      assert(log.version == 3L)
      assert(log.scan(3L).select("label").head().getString(0) == "gamma")
    } finally {
      q.stop()
      log.close()
    }
  }

  test("transactional appends replay idempotently across reopen and rotation") {
    val dir = Files.createTempDirectory("grafttxn").toString
    var backend = ParquetLogBackend.create(
      spark, dir, compactThreshold = 1000, compactIntervalMs = 0)
    var log = new graft.core.EventLog(backend)
    val r1 = log.appendMultiTxn("q1", 0L,
      Seq(EventData("a", """{"i":1}"""), EventData("b", """{"i":2}""")))
    // same (queryId, batchId) → recorded result, no new versions
    val replay = log.appendMultiTxn("q1", 0L,
      Seq(EventData("a", """{"i":1}"""), EventData("b", """{"i":2}""")))
    assert(replay == r1)
    assert(log.version == 2L)
    val r2 = log.appendMultiTxn("q1", 1L, Seq(EventData("c", """{"i":3}""")))
    assert(r2.versionFirst == 3L && log.version == 3L)
    // an independent query's ledger is independent
    val other = log.appendMultiTxn("q2", 0L, Seq(EventData("d", """{"i":4}""")))
    assert(other.versionFirst == 4L)
    log.close()

    // reopen: the ledger is rebuilt from the tags on the commit lines
    backend = ParquetLogBackend.open(spark, dir, compactIntervalMs = 0)
    log = new graft.core.EventLog(backend)
    val replay2 = log.appendMultiTxn("q1", 1L, Seq(EventData("c", """{"i":3}""")))
    assert(replay2 == r2 && log.version == 4L)

    // compaction rotates the commit log away — the condensed txn markers
    // must keep replay detection durable
    backend.compact()
    log.close()
    backend = ParquetLogBackend.open(spark, dir, compactIntervalMs = 0)
    log = new graft.core.EventLog(backend)
    val replay3 = log.appendMultiTxn("q1", 1L, Seq(EventData("c", """{"i":3}""")))
    assert(replay3.version == 3L && log.version == 4L)
    // a batchId BELOW the latest recorded one has no recorded range left —
    // refusing beats silently returning another batch's versions
    intercept[IllegalStateException] {
      log.appendMultiTxn("q1", 0L, Seq(EventData("a", """{"i":1}""")))
    }
    assert(log.checkIntegrity().count() == 0L)
    log.close()
  }

  test("appendSink replays a crashed micro-batch without duplicate versions") {
    import org.apache.spark.sql.functions.col
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graftsink2").toString
    val ckpt = Files.createTempDirectory("graftsink2ckpt").toString
    val backend = ParquetLogBackend.create(spark, dir, compactIntervalMs = 0)
    val log = new graft.core.EventLog(backend)
    val in = MemoryStream[(String, String)]
    val src = in.toDF().select(col("_1").as("label"), col("_2").as("payload"))
    val q = LogStream.appendSink(src, log, ckpt)
    try {
      in.addData(("alpha", """{"i":1}"""), ("beta", """{"i":2}"""))
      q.processAllAvailable()
      assert(log.version == 2L)
    } finally q.stop()
    // Simulate a crash between the log append and Spark's batch commit:
    // drop the epoch-0 commit marker so the restarted query re-runs batch 0
    // against the SAME source offsets.
    Files.delete(java.nio.file.Paths.get(ckpt, "commits", "0"))
    Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".0.crc"))
    val q2 = LogStream.appendSink(src, log, ckpt)
    try {
      q2.processAllAvailable()
      assert(log.version == 2L) // replay appended nothing
      assert(log.checkIntegrity().count() == 0L)
      // and the stream keeps making progress after the replay
      in.addData(("gamma", """{"i":3}"""))
      q2.processAllAvailable()
      assert(log.version == 3L)
    } finally {
      q2.stop()
      log.close()
    }
  }

  test("windowed counts with watermark over an event stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // two 10-minute windows: ts 0..599 and 600..1199
    mem.addData(ev(1, 10, "a"), ev(2, 20, "a"), ev(3, 30, "b"), ev(4, 700, "a"))
    val q = LogStream.windowedCounts(mem.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("wincounts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("wincounts")
        .selectExpr("unix_timestamp(win_start)", "label", "n")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == Set((0L, "a", 2L), (0L, "b", 1L), (600L, "a", 1L)))
    } finally q.stop()
  }

  test("streaming exact dedup keeps first occurrence, expires by watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val q = StreamOps
      .dedupExact(mem.toDF().toDF("ts", "text"), "ts", "text", "10 seconds")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      mem.addData((ts(10), "aaa"), (ts(11), "bbb"), (ts(12), "aaa"))
      q.processAllAvailable() // one aaa + one bbb emitted
      mem.addData((ts(13), "aaa")) // within the dedup window → dropped
      q.processAllAvailable()
      assert(spark.table("sdedup").select("text").collect()
        .map(_.getString(0)).sorted.toSeq === Seq("aaa", "bbb"))
      // advance the watermark far past aaa's event time + delay: the
      // hash's state is expired, a re-occurrence is a NEW document
      mem.addData((ts(100), "ccc"))
      q.processAllAvailable()
      mem.addData((ts(101), "aaa"))
      q.processAllAvailable()
      assert(spark.table("sdedup").select("text").collect()
        .map(_.getString(0)).sorted.toSeq
        === Seq("aaa", "aaa", "bbb", "ccc"))
    } finally q.stop()
  }

  test("stream-static enrichment broadcasts the dim per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(ev(1, 10, "a"), ev(2, 20, "b"), ev(3, 30, "zz"))
    val dim = Seq(("a", "alpha"), ("b", "beta")).toDF("label", "pretty")
    val q = LogStream.enrich(mem.toDF(), dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("enriched").select("version", "pretty")
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got == Map(1L -> Some("alpha"), 2L -> Some("beta"), 3L -> None))
    } finally q.stop()
  }

  test("labelStats keeps custom state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = LogStream.labelStats(mem.toDF())
      .writeStream.format("memory").queryName("labelstats")
      .outputMode("update").start()
    try {
      mem.addData(ev(1, 10, "a"), ev(2, 11, "a"), ev(7, 12, "a"), ev(3, 12, "b"))
      q.processAllAvailable()
      // batch 2: label a sees an out-of-order version (5 < state's last 7) —
      // cross-batch so the check is independent of within-group row order
      mem.addData(ev(5, 14, "a"))
      q.processAllAvailable()
      val last = spark.table("labelstats")
        .groupBy("label").agg(
          org.apache.spark.sql.functions.max("n").as("n"),
          org.apache.spark.sql.functions.max("lastVersion").as("lastVersion"),
          org.apache.spark.sql.functions.max("regressions").as("regressions"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(last("a") == ((4L, 7L, 1L))) // 4 events, max v7, one regression
      assert(last("b") == ((1L, 3L, 0L)))
    } finally q.stop()
  }

  test("session windows close after the inactivity gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // label a: events at 0s and 60s (one session, gap 5m), then 1000s (new session)
    mem.addData(ev(1, 0, "a"), ev(2, 60, "a"), ev(3, 1000, "a"))
    val q = LogStream.sessionCounts(mem.toDF(), gap = "5 minutes")
      .writeStream.format("memory").queryName("sesscounts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sesscounts")
        .selectExpr("unix_timestamp(sess_start)", "unix_timestamp(sess_end)", "n")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((0L, 360L, 2L), (1000L, 1300L, 1L)))
    } finally q.stop()
  }

  test("streaming decontamination drops benchmark-overlapping docs statelessly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq("alpha beta gamma delta epsilon").toDF("text")
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.decontaminateStream(
        mem.toDF().toDF("doc_id", "text"), "text", bench, "text")
      .writeStream.format("memory").queryName("decontam")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "alpha beta gamma totally new suffix"), // shares a 3-gram
        (2L, "completely unrelated clean words here"),
        (3L, "beta gamma delta another overlap case"), // interior 3-gram
        (4L, null)) // no shingles ⇒ CANNOT be contaminated ⇒ must survive
      q.processAllAvailable()
      val kept = spark.table("decontam").collect().map(_.getLong(0)).toSet
      assert(kept === Set(2L, 4L), s"clean + null-text docs survive: $kept")
    } finally q.stop()
  }

  test("streaming decontamination takes a capacity knob and refuses huge ones") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq("alpha beta gamma delta epsilon").toDF("text")
    // the literal-bitmap path has a documented embed ceiling: beyond it
    // the user must take the batch mask-relation join instead
    intercept[IllegalArgumentException] {
      StreamOps.decontaminateStream(
        Seq((1L, "x")).toDF("doc_id", "text"), "text", bench, "text",
        bits = 1L << 28)
    }
    // and the floor: 16 bits passes the power-of-16 shape but would
    // allocate zero 32-bit words — must fail fast, not AIOOBE later
    intercept[IllegalArgumentException] {
      StreamOps.decontaminateStream(
        Seq((1L, "x")).toDF("doc_id", "text"), "text", bench, "text",
        bits = 16L)
    }
    // at the ceiling itself the knob works end-to-end
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.decontaminateStream(
        mem.toDF().toDF("doc_id", "text"), "text", bench, "text",
        bits = StreamOps.MaxStreamBloomBits)
      .writeStream.format("memory").queryName("decontam24")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "alpha beta gamma totally new suffix"),
        (2L, "completely unrelated clean words here"))
      q.processAllAvailable()
      val kept = spark.table("decontam24").collect().map(_.getLong(0)).toSet
      assert(kept === Set(2L))
    } finally q.stop()
  }

  test("cleanStream composes gate, dedup, and decontamination") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq("alpha beta gamma delta epsilon").toDF("text")
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // 22 varied words incl. stopwords: passes every gate signal
    val clean = "the quick brown fox jumps over lazy dogs and then some " +
      "more words appear here today while the sun shines bright above"
    val q = StreamOps.cleanStream(
        mem.toDF().toDF("ts", "doc_id", "text"),
        "ts", "text", bench, "text", "10 seconds")
      .writeStream.format("memory").queryName("cleanstream")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts(1), 1L, clean),
        (ts(2), 2L, clean), // exact dup within the watermark: dropped
        (ts(3), 3L, "too short to pass"), // gate: n_words < 20
        (ts(4), 4L, Seq.fill(30)("word").mkString(" ")), // gate: top_frac
        (ts(5), 5L, clean + " alpha beta gamma")) // contaminated
      q.processAllAvailable()
      val kept = spark.table("cleanstream").collect()
        .map(_.getLong(1)).toSet
      assert(kept === Set(1L), s"only the first clean doc survives: $kept")
    } finally q.stop()
  }

  test("cleanStream→appendSink recovers a mid-backlog crash exactly-once") {
    // The COMPOSED recovery path: graft micro-batch source (admission
    // control) → cleanStream (gate + stateful dedup + decontamination) →
    // appendSink (transactional appends), killed with an uncommitted
    // micro-batch and a 30-event backlog, then restarted on the same
    // checkpoint. The output log must come back gap-free and
    // duplicate-free, with dedup state intact across the restart.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graftcrashsrc").toString
    val outDir = Files.createTempDirectory("graftcrashout").toString
    val ckpt = Files.createTempDirectory("graftcrashckpt").toString
    val srcB = ParquetLogBackend.create(spark, srcDir, compactIntervalMs = 0)
    val outLog = new graft.core.EventLog(
      ParquetLogBackend.create(spark, outDir, compactIntervalMs = 0))
    val bench = Seq("alpha beta gamma delta epsilon").toDF("text")
    val clean = "the quick brown fox jumps over lazy dogs and then some " +
      "more words appear here today while the sun shines bright above"
    def textFor(i: Int): String = (i % 4) match {
      case 1 if i == 21 => clean + " extra token1" // dup of PRE-crash doc 1
      case 1 => clean + s" extra token$i" // unique survivor
      case 2 if i == 22 => clean + " extra token1" // also dups pre-crash
      case 2 => clean + s" extra token${i - 1}" // dup of the previous one
      case 3 => clean + " alpha beta gamma" // contaminated
      case _ => "too short" // fails the n_words gate
    }
    def payloadFor(i: Int) = s"""{"id":$i,"text":"${textFor(i)}"}"""
    def startQ() = {
      val src = spark.readStream.format("graft")
        .option("maxVersionsPerTrigger", 5L).load(srcDir)
        .select(col("version").as("doc_id"),
          col("timestamp").cast("timestamp").as("ts"),
          get_json_object(col("payload"), "$.text").as("text"),
          col("payload"))
      val cleaned = StreamOps.cleanStream(
          src, "ts", "text", bench, "text", "10 minutes")
        .select(lit("kept").as("label"), col("payload"), col("doc_id"))
      LogStream.appendSink(cleaned, outLog, ckpt, orderBy = Seq("doc_id"))
    }
    try {
      srcB.appendMulti((1 to 10).map(i => EventData("doc", payloadFor(i))))
      val q = startQ()
      try q.processAllAvailable() finally q.stop()
      // crash simulation: the LAST micro-batch's commit marker never hit
      // disk, so the restart must re-run it (appendMultiTxn replay) …
      val commits = java.nio.file.Paths.get(ckpt, "commits")
      val last = {
        import scala.jdk.CollectionConverters._
        Files.list(commits).iterator().asScala
          .map(_.getFileName.toString).filter(_.forall(_.isDigit))
          .map(_.toLong).max
      }
      Files.delete(commits.resolve(last.toString))
      Files.deleteIfExists(commits.resolve(s".$last.crc"))
      // … while a backlog accumulated during the outage
      srcB.appendMulti((11 to 40).map(i => EventData("doc", payloadFor(i))))
      val q2 = startQ()
      try q2.processAllAvailable() finally q2.stop()

      val out = outLog.scan(1L)
        .select("version", "payload").collect()
        .map(r => (r.getLong(0),
          r.getString(1).replaceAll(""".*"id":(\d+).*""", "$1").toLong))
      // survivors: i % 4 == 1 minus doc 21 (its text duplicates doc 1 from
      // BEFORE the crash — only recovered dedup state can know that)
      val expected = (1 to 40).filter(_ % 4 == 1).filterNot(_ == 21)
      assert(out.map(_._2).sorted.toSeq === expected.map(_.toLong),
        "kept exactly the gated/deduped/clean survivors, no replays")
      assert(out.map(_._1).sorted.toSeq === (1L to expected.length),
        "output versions are dense — no gaps, no duplicate appends")
      assert(outLog.checkIntegrity().count() === 0L)
    } finally {
      srcB.close()
      outLog.close()
    }
  }

  test("streaming pack offsets continue across micro-batches per bucket") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val q = StreamOps.packSequences(
        mem.toDF().toDF("ts", "doc_id", "text"),
        "ts", "doc_id", "text", buckets = 4, budget = 100)
      .writeStream.format("memory").queryName("packseq")
      .outputMode("append").start()
    try {
      // bucket 0: docs 0 (30 toks) then 4 (80 toks); bucket 1: doc 1
      mem.addData((ts(1), 0L, words(30)), (ts(2), 4L, words(80)),
        (ts(1), 1L, words(250)))
      q.processAllAvailable()
      // second micro-batch must resume bucket 0 at offset 110
      mem.addData((ts(3), 8L, words(15)))
      q.processAllAvailable()
      val got = spark.table("packseq").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
      assert(got(0L) === ((0L, 0L, 0L, 0L, 1L)))
      // doc 4 starts at 30, ends at token 109: straddles sequences 0 and 1
      assert(got(4L) === ((0L, 30L, 0L, 1L, 2L)))
      // doc 1 alone fills sequences 0..2 of its own bucket
      assert(got(1L) === ((1L, 0L, 0L, 2L, 3L)))
      // batch 2, bucket 0 resumes at 110 (sequence 1)
      assert(got(8L) === ((0L, 110L, 1L, 1L, 1L)))
    } finally q.stop()
  }

  test("streaming minhash near-dup flags live-bucket matches, expires state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // the DedupCapSpec near-dup pair: 28 of 29 shingles shared — known to
    // collide in at least one LSH band under the shared minhash family
    val stem = (0 until 30).map(i => s"tok$i").mkString(" ")
    val q = StreamOps.dedupNearMinhash(
        mem.toDF().toDF("ts", "doc_id", "text"),
        "ts", "doc_id", "text", "10 seconds")
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      mem.addData((ts(10), 1L, s"$stem kappa"))
      q.processAllAvailable()
      mem.addData((ts(11), 2L, s"$stem lambda"),
        (ts(11), 3L, "totally different content entirely unrelated words"))
      q.processAllAvailable()
      val hits = spark.table("neardup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(hits.nonEmpty, "near-dup pair must collide in some live band")
      assert(hits.forall { case (a, b, s) => a == 1L && b == 2L && s >= 0.5 },
        s"only (1, 2) may be flagged: ${hits.mkString(", ")}")
      val n0 = spark.table("neardup").count()
      // push the watermark past every bucket's last activity + delay, with
      // a second batch so the timed-out groups are actually swept
      mem.addData((ts(100), 8L, "zz yy xx ww vv uu"))
      q.processAllAvailable()
      mem.addData((ts(150), 9L, "pp qq rr ss tt"))
      q.processAllAvailable()
      // identical to doc 1, but its buckets expired: a NEW bucket, no hit
      mem.addData((ts(151), 4L, s"$stem kappa"))
      q.processAllAvailable()
      assert(spark.table("neardup").count() === n0,
        "expired state must not produce hits")
    } finally q.stop()
  }

  test("clusterLabelsStream partition agrees with batch connected components") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    def stem(tag: String) = (0 until 30).map(i => s"$tag$i").mkString(" ")
    // two near-dup cliques + two singletons; group A arrives in DESCENDING
    // id order so the eventual min (20) forces a re-label of 21 and 22
    val corpus: Seq[(Long, String)] = Seq(
      22L -> s"${stem("a")} x22", 21L -> s"${stem("a")} x21",
      20L -> s"${stem("a")} x20",
      5L -> s"${stem("b")} y5", 30L -> s"${stem("b")} y30",
      7L -> "completely different words about fish and rivers here",
      9L -> "another unrelated text on metallurgy and furnaces today")

    val q = StreamOps.clusterLabelsStream(
        mem.toDF().toDF("ts", "doc_id", "text"),
        "ts", "doc_id", "text", "10 minutes")
      .writeStream.format("memory").queryName("clabels")
      .outputMode("append").start()
    try {
      // replay across three micro-batches, all inside the watermark
      mem.addData(corpus.take(2).map { case (id, t) => (ts(10), id, t) }: _*)
      q.processAllAvailable()
      mem.addData(corpus.slice(2, 5).map { case (id, t) => (ts(11), id, t) }: _*)
      q.processAllAvailable()
      mem.addData(corpus.drop(5).map { case (id, t) => (ts(12), id, t) }: _*)
      q.processAllAvailable()
      val streamed = spark.table("clabels").groupBy("doc_id")
        .agg(min("cluster").as("cluster")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

      // batch ground truth: same minhash family + banding, pairwise-link
      // buckets at the same threshold, transitive closure via the batch CC
      val sigs = corpus.toDF("doc_id", "text")
        .select(col("doc_id"),
          graft.exprs.functions.minhash12(split(col("text"), "\\s+")).as("sig"))
        .as[(Long, Seq[Long])].collect()
      val pairs = (for {
        band <- 0 until 3
        bucket <- sigs.groupBy(_._2.slice(band * 4, band * 4 + 4)).values
        Array(a, b) <- bucket.sortBy(_._1).combinations(2)
        if a._2.zip(b._2).count { case (x, y) => x == y } / 12.0 >= 0.5
      } yield (a._1, b._1)).distinct
      val batch = graft.operators.ConnectedComponents
        .run(corpus.map(_._1).toDF("doc_id"), pairs.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      assert(streamed.keySet === corpus.map(_._1).toSet,
        "every replayed doc must receive a membership label")
      assert(streamed === batch,
        s"stream/batch partition mismatch: $streamed vs $batch")
      // the replay really exercised both shapes
      assert(batch(21L) === 20L && batch(30L) === 5L && batch(7L) === 7L)
    } finally q.stop()
  }

  test("reconcileClusterLabels converges a cross-bucket chain split to batch CC") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // Construct a CHAIN (A~B, B~C, A≁C) whose two links land in DIFFERENT
    // band buckets — the one shape clusterLabelsStream documents as
    // splittable. B's token set is A ∪ C, so sig_B[k] = min(sig_A[k],
    // sig_C[k]) positionwise: B agrees with A on ~half the rows and with
    // C on the rest, while A and C (disjoint token sets) agree on ~none.
    // The triple is SEARCHED against the pinned hash family (first trial
    // satisfying the bucket predicate — deterministic), not hand-tuned.
    // ~3.5% of trials satisfy the predicate (each link needs a full
    // 4-row band to favor one side: (1/16 per band) × 3 bands, squared),
    // so 600 trials make a miss a ~10⁻⁹ event — one tiny Spark job
    val thr = 0.4
    val trials = (0 until 600).map { t =>
      val a = (0 until 8).map(i => s"a${t}x$i").mkString(" ")
      val c = (0 until 8).map(i => s"c${t}x$i").mkString(" ")
      (t, a, s"$a $c", c)
    }
    val sigRows = trials
      .flatMap { case (t, a, b, c) =>
        Seq((t, 0, a), (t, 1, b), (t, 2, c)) }
      .toDF("trial", "role", "text")
      .select(col("trial"), col("role"),
        graft.exprs.functions.minhash12(split(col("text"), "\\s+")).as("sig"))
      .as[(Int, Int, Seq[Long])].collect()
      .groupBy(_._1).view.mapValues(rs =>
        rs.sortBy(_._2).map(_._3)).toMap
    def bands(x: Seq[Long], y: Seq[Long]): Set[Int] =
      (0 until 3).filter(b =>
        x.slice(b * 4, b * 4 + 4) == y.slice(b * 4, b * 4 + 4)).toSet
    def agree(x: Seq[Long], y: Seq[Long]): Double =
      x.zip(y).count { case (p, q) => p == q } / 12.0
    val pick = trials.find { case (t, _, _, _) =>
      val Seq(sa, sb, sc) = sigRows(t).toSeq
      bands(sa, sb).nonEmpty && bands(sb, sc).nonEmpty &&
        bands(sa, sc).isEmpty &&
        agree(sa, sb) >= thr && agree(sb, sc) >= thr && agree(sa, sc) < thr
    }
    assert(pick.isDefined, "no chain triple found against the hash family")
    val (_, textA, textB, textC) = pick.get
    val (idA, idB, idC) = (100L, 200L, 300L)

    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = StreamOps.clusterLabelsStream(
        mem.toDF().toDF("ts", "doc_id", "text"),
        "ts", "doc_id", "text", "10 minutes", simThreshold = thr)
      .writeStream.format("memory").queryName("chainlabels")
      .outputMode("append").start()
    try {
      Seq((idA, textA), (idB, textB), (idC, textC)).zipWithIndex.foreach {
        case ((id, t), i) => mem.addData((ts(10 + i), id, t))
          q.processAllAvailable()
      }
      val streamed = spark.table("chainlabels").groupBy("doc_id")
        .agg(min("cluster").as("cluster")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the documented split: A~B merged in one bucket, B~C in another —
      // C cannot learn A's label through the stream alone
      assert(streamed(idB) === idA, "A~B must merge in their shared bucket")
      assert(streamed(idC) === idB,
        s"the chain must SPLIT across buckets (got $streamed) — " +
          "if this merged, the corpus no longer exercises the reconcile")

      // the reconcile: batch CC over the changelog converges the chain…
      val reconciled = StreamOps.reconcileClusterLabels(
          spark.table("chainlabels"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // …to exactly the batch components over the verified link set
      val batch = graft.operators.ConnectedComponents
        .run(Seq(idA, idB, idC).toDF("doc_id"),
          Seq((idA, idB), (idB, idC)).toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reconciled === batch)
      assert(reconciled === Map(idA -> idA, idB -> idA, idC -> idA))
    } finally q.stop()
  }

  test("perplexityStream scores bit-identically to the batch bigram LM") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val model = graft.queries.TextAnalysis.bigramNllTable(spark, sfDir)
    val batch = SparkEntry.queries("text_perplexity_bigram")(spark, sfDir)
      .select("doc_id", "n_bigrams", "nll_scaled", "avg_nll").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.perplexityStream(
        mem.toDF().toDF("doc_id", "text"), "text", model)
      .select("doc_id", "n_bigrams", "nll_scaled", "avg_nll")
      .writeStream.format("memory").queryName("ppstream")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("ppstream").collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      // batch emits only docs with >= 2 tokens (its size filter); the
      // stream scores everything — compare on the batch's universe
      batch.foreach { case (d, v) =>
        assert(got.get(d).contains(v), s"doc $d: ${got.get(d)} != $v")
      }
      assert((got.keySet -- batch.keySet)
        .forall(d => got(d)._1 == 0L), "extra docs must be bigram-free")
    } finally q.stop()
  }

  test("dsirScoreStream scores bit-identically to the batch DSIR weights") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val model = graft.queries.TextAnalysis.dsirTable(spark, sfDir)
    val batch = SparkEntry.queries("dsir_weights")(spark, sfDir)
      .select("doc_id", "n_feats", "weight_scaled").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(batch.nonEmpty)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.dsirScoreStream(
        mem.toDF().toDF("doc_id", "text"), "text", model)
      .select("doc_id", "n_feats", "weight_scaled")
      .writeStream.format("memory").queryName("dsirstream")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("dsirstream").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // on the training corpus every bucket is seen by construction, so
      // the stream's seen-only scoring must reproduce the batch inner
      // join bit-for-bit, n_feats included
      batch.foreach { case (d, v) =>
        assert(got.get(d).contains(v), s"doc $d: ${got.get(d)} != $v")
      }
    } finally q.stop()
  }

  test("capPerSourceStream admits first-N per source across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val q = StreamOps.capPerSourceStream(
        mem.toDF().toDF("ts", "doc_id", "source"),
        "ts", "doc_id", "source", cap = 2L)
      .writeStream.format("memory").queryName("capsrc")
      .outputMode("append").start()
    try {
      mem.addData((ts(1), 1L, "web"), (ts(1), 2L, "web"),
        (ts(1), 10L, "books"))
      q.processAllAvailable()
      // the counter must survive into the next micro-batch
      mem.addData((ts(2), 3L, "web"), (ts(2), 11L, "books"),
        (ts(2), 12L, "books"))
      q.processAllAvailable()
      val kept = spark.table("capsrc").collect()
        .map(r => r.getLong(0)).toSet
      assert(kept === Set(1L, 2L, 10L, 11L),
        s"web capped at 2 (doc 3 dropped), books at 2 (doc 12 dropped): $kept")
    } finally q.stop()
  }

  test("splitStream and mixStream assign identically to their batch queries") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val batchSplit = SparkEntry.queries("split_corpus")(spark, sfDir)
      .select("doc_id", "bucket", "split").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val batchMix = SparkEntry.queries("mix_corpus")(spark, sfDir)
      .select("doc_id", "copy_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // one MemoryStream per query: the source is single-consumer (a
    // commit from one query trims batches the other may not have read)
    val memS = MemoryStream[(Long, String)]
    val memM = MemoryStream[(Long, String)]
    val sq = StreamOps.splitStream(
        memS.toDF().toDF("doc_id", "source"), "doc_id")
      .writeStream.format("memory").queryName("splitst")
      .outputMode("append").start()
    val mq = StreamOps.mixStream(
        memM.toDF().toDF("doc_id", "source"), "doc_id",
        lit(1) + expr("CAST(substring(source, 4) AS INT) % 4"))
      .writeStream.format("memory").queryName("mixst")
      .outputMode("append").start()
    try {
      memS.addData(docs: _*)
      memM.addData(docs: _*)
      sq.processAllAvailable(); mq.processAllAvailable()
      val gotSplit = spark.table("splitst")
        .select("doc_id", "bucket", "split").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      assert(gotSplit === batchSplit)
      val gotMix = spark.table("mixst")
        .select("doc_id", "copy_idx").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(gotMix === batchMix)
    } finally { sq.stop(); mq.stop() }
  }

  test("clusterLabelsStream: the final partition is arrival-order invariant") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def stem(tag: String) = (0 until 30).map(i => s"$tag$i").mkString(" ")
    val corpus: Seq[(Long, String)] = Seq(
      11L -> s"${stem("p")} a11", 4L -> s"${stem("p")} a4",
      9L -> s"${stem("p")} a9",
      30L -> s"${stem("q")} b30", 2L -> s"${stem("q")} b2",
      17L -> "unrelated solitary content entirely different")
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

    def replay(order: Seq[(Long, String)], name: String): Map[Long, Long] = {
      val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
      val q = StreamOps.clusterLabelsStream(
          mem.toDF().toDF("ts", "doc_id", "text"),
          "ts", "doc_id", "text", "10 minutes")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        // one doc per micro-batch: the strictest interleaving
        order.zipWithIndex.foreach { case ((id, t), i) =>
          mem.addData((ts(10 + i), id, t))
          q.processAllAvailable()
        }
        spark.table(name).groupBy("doc_id")
          .agg(org.apache.spark.sql.functions.min("cluster").as("c"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      } finally q.stop()
    }

    val expected = Map(11L -> 4L, 4L -> 4L, 9L -> 4L,
      30L -> 2L, 2L -> 2L, 17L -> 17L)
    assert(replay(corpus, "inv1") === expected)
    assert(replay(corpus.reverse, "inv2") === expected,
      "reversed arrival must converge to the same min-label partition")
    assert(replay(corpus.sortBy(_._1), "inv3") === expected,
      "ascending-id arrival must converge too")
  }

  test("packTokenIdsStream emits fixed-length id rows; pad only on timeout flush") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    // an EMPTY merge model: ids are pure char ids (a=0 … z=25) — the pack
    // mechanics under test are independent of learned merges
    val modelDir =
      java.nio.file.Files.createTempDirectory("graft-packstream").toString
    graft.operators.BpeModel.save(spark,
      Seq.empty[(Long, String, String, String, Long)], modelDir)

    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val q = StreamOps.packTokenIdsStream(
        mem.toDF().toDF("ts", "doc_id", "text"),
        "ts", "doc_id", "text", modelDir,
        buckets = 2, seqLen = 8, eosId = 98, padId = 99,
        delay = "10 seconds")
      .writeStream.format("memory").queryName("packids")
      .outputMode("append").start()
    try {
      // bucket 0: doc 0 "abc abc" → 6 ids + EOS = 7 (< 8: held in state)
      mem.addData((ts(10), 0L, "abc abc"))
      q.processAllAvailable()
      assert(spark.table("packids").count() === 0, "partial must not emit")
      // doc 2 (bucket 0) "dd" → +3 = 10 → one COMPLETED row, 2 held
      // doc 1 (bucket 1) "abcdefgh" → 8 + EOS = 9 → one completed, 1 held
      mem.addData((ts(11), 2L, "dd"), (ts(11), 1L, "abcdefgh"))
      q.processAllAvailable()
      val full = spark.table("packids").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getSeq[Int](4)))
      assert(full.length === 2, s"got ${full.toSeq}")
      val b0 = full.find(_._1 == 0L).get
      assert(b0 === ((0L, 0L, 8L, 0L, Seq(0, 1, 2, 0, 1, 2, 98, 3))),
        "arrival-order concat, EOS inside, NO pad on a completed row")
      assert(full.find(_._1 == 1L).get._5 === (0 to 7).toSeq)

      // watermark sweep: bucket 0 expires → its tail [3, EOS] flushes PADDED
      mem.addData((ts(100), 1L, "zz"))
      q.processAllAvailable()
      mem.addData((ts(150), 1L, "yy"))
      q.processAllAvailable()
      val tail = spark.table("packids").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getSeq[Int](4)))
        .find(r => r._1 == 0L && r._2 == 1L)
      assert(tail.contains((0L, 1L, 2L, 6L,
        Seq(3, 98) ++ Seq.fill(6)(99))), s"tail flush: $tail")
    } finally q.stop()
  }

  test("classifyQualityStream scores bit-identically to the batch classifier") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val model = graft.queries.TextAnalysis.nbQualityModelTable(spark, sfDir)
    val batch = SparkEntry.queries("classify_quality_nb")(spark, sfDir)
      .select("doc_id", "n_tokens", "score_scaled", "pred").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.classifyQualityStream(
        mem.toDF().toDF("doc_id", "text"), "text", model)
      .select("doc_id", "n_tokens", "score_scaled", "pred")
      .writeStream.format("memory").queryName("nbstream")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("nbstream").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
        .toMap
      assert(got === batch)
      // both classes actually occur, or the parity proves nothing
      assert(got.values.map(_._3).toSet === Set(0, 1))
    } finally q.stop()
  }

  test("anomalyStream z-scores bit-identically to the batch query") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val batch = SparkEntry.queries("events_anomaly")(spark, sfDir)
      .select("event_id", "z", "is_outlier").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap

    val e = graft.util.Tables(spark, sfDir, "events")
      .withColumn("v100", round(col("value") * 100).cast("long"))
    val baseline = graft.queries.EventLogQueries.anomalyBaseline(e)
    val rows = e.select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq

    val mem = MemoryStream[(Long, String, Double)]
    val q = StreamOps.anomalyStream(
        mem.toDF().toDF("event_id", "event_type", "value"),
        "value", baseline)
      .select("event_id", "z", "is_outlier")
      .writeStream.format("memory").queryName("anomstream")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("anomstream").collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
      assert(got === batch)
      assert(got.values.exists(_._2), "corpus must contain real outliers")
    } finally q.stop()
  }

  test("searchStream serves the persisted index with batch-identical scores") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files
      .createTempDirectory("graft-searchstream").toString
    graft.operators.SearchIndex.build(
      graft.util.Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))).save(dir)
    val idx = graft.operators.SearchIndex.load(spark, dir)

    val batch = graft.operators.SearchIndex
      .search(idx, Seq("vector", "stream"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val snap = idx.snapshot("tfidf")
    val q = StreamOps.searchStream(
        mem.toDF().toDF("ts", "q_id", "q"),
        "ts", "q_id", "q", snap, topK = 5,
        windowLen = "10 seconds", delay = "5 seconds")
      .writeStream.format("memory").queryName("searchstream")
      .outputMode("append").start()
    try {
      mem.addData((ts(3), 7L, "vector stream"))
      q.processAllAvailable()
      mem.addData((ts(60), 999L, "window")) // advance past the window
      q.processAllAvailable()
      mem.addData((ts(120), 998L, "merge")) // and flush the second one
      q.processAllAvailable()
      val got = spark.table("searchstream")
        .filter(col("q_id") === 7L)
        .select("top_ids", "top_scores").collect()
      assert(got.length === 1)
      val served = got.head.getSeq[Long](0)
        .zip(got.head.getSeq[Long](1)).toSeq
      assert(served === batch, s"$served != $batch")
    } finally { q.stop(); snap.close() }
  }

  test("searchStream bm25 mode matches the batch searchBm25 bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files
      .createTempDirectory("graft-searchstreambm").toString
    graft.operators.SearchIndex.build(
      graft.util.Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))).save(dir)
    val idx = graft.operators.SearchIndex.load(spark, dir)
    val batch = graft.operators.SearchIndex
      .searchBm25(idx, Seq("vector", "stream"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val snap = idx.snapshot("bm25")
    val q = StreamOps.searchStream(
        mem.toDF().toDF("ts", "q_id", "q"),
        "ts", "q_id", "q", snap, topK = 5,
        windowLen = "10 seconds", delay = "5 seconds")
      .writeStream.format("memory").queryName("searchstreambm")
      .outputMode("append").start()
    try {
      mem.addData((ts(3), 7L, "vector stream"))
      q.processAllAvailable()
      mem.addData((ts(60), 999L, "window"))
      q.processAllAvailable()
      val got = spark.table("searchstreambm")
        .filter(col("q_id") === 7L)
        .select("top_ids", "top_scores").collect()
      assert(got.length === 1)
      val served = got.head.getSeq[Long](0)
        .zip(got.head.getSeq[Long](1)).toSeq
      assert(served === batch, s"$served != $batch")
    } finally { q.stop(); snap.close() }
  }

  test("searchPhraseStream matches batch searchPhrase bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft-phrasestream").toString
    graft.operators.SearchIndex.build(Seq(
        (1L, "new york is not york new"),
        (2L, "x new york y new york"),
        (3L, "unrelated text entirely"),
        (4L, "york new only")).toDF("doc_id", "text")).save(dir)
    val idx = graft.operators.SearchIndex.load(spark, dir)
    def batch(terms: Seq[String]) = graft.operators.SearchIndex
      .searchPhrase(idx, terms, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val snap = idx.snapshot("phrase")
    val q = StreamOps.searchPhraseStream(
        mem.toDF().toDF("ts", "q_id", "q"),
        "ts", "q_id", "q", snap, topK = 5,
        windowLen = "10 seconds", delay = "5 seconds")
      .writeStream.format("memory").queryName("phrasestream")
      .outputMode("append").start()
    try {
      mem.addData((ts(3), 7L, "new york"), (ts(3), 8L, "york new"))
      q.processAllAvailable()
      mem.addData((ts(60), 999L, "flush"))
      q.processAllAvailable()
      def served(qid: Long) = {
        val r = spark.table("phrasestream").filter(col("q_id") === qid)
          .select("top_ids", "top_counts").collect()
        assert(r.length === 1)
        r.head.getSeq[Long](0).zip(r.head.getSeq[Long](1)).toSeq
      }
      assert(served(7L) === batch(Seq("new", "york")))
      assert(served(8L) === batch(Seq("york", "new")))
    } finally { q.stop(); snap.close() }
  }

  test("packTokenIdsStream: seq ids and partial buffers survive a restart") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graftpacksrc").toString
    val outDir = Files.createTempDirectory("graftpackout").toString
    val ckpt = Files.createTempDirectory("graftpackckpt").toString
    val modelDir = Files.createTempDirectory("graftpackmodel").toString
    graft.operators.BpeModel.save(spark,
      Seq.empty[(Long, String, String, String, Long)], modelDir)
    val srcB = ParquetLogBackend.create(spark, srcDir, compactIntervalMs = 0)

    // doc i: i%2 picks the bucket (doc_id = version = i), text = 5 chars
    // of a single letter → ids are 5 copies of (letter - 'a') + EOS = 6
    def textFor(i: Int): String = ("" + ('a' + (i % 26)).toChar) * 5
    def startQ() = {
      val src = spark.readStream.format("graft")
        .option("maxVersionsPerTrigger", 3L).load(srcDir)
        .select(col("version").as("doc_id"),
          col("timestamp").cast("timestamp").as("ts"),
          get_json_object(col("payload"), "$.t").as("text"))
      StreamOps.packTokenIdsStream(src, "ts", "doc_id", "text", modelDir,
          buckets = 2, seqLen = 8, eosId = 98, padId = 99,
          delay = "10 minutes")
        .toDF()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    def appendDocs(r: Range): Unit = srcB.appendMulti(
      r.map(i => EventData("doc", s"""{"t":"${textFor(i)}"}""")))

    try {
      appendDocs(1 to 4)
      val q1 = startQ()
      try q1.processAllAvailable() finally q1.stop()
      appendDocs(5 to 10)
      val q2 = startQ()
      try q2.processAllAvailable() finally q2.stop()

      val got = spark.read.parquet(outDir)
        .select("bucket", "seq_id", "n_real", "n_pad", "ids").collect()
        .map(r => ((r.getLong(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3), r.getSeq[Int](4).toList))).toMap

      // simulate the packer over all 10 docs in version order per bucket
      val expected = (0 to 1).flatMap { b =>
        val stream = (1 to 10).filter(_ % 2 == b).flatMap(i =>
          List.fill(5)(('a' + (i % 26)).toChar - 'a') :+ 98)
        stream.grouped(8).filter(_.length == 8).zipWithIndex.map {
          case (ids, s) => (b.toLong, s.toLong) -> ((8L, 0L, ids.toList))
        }
      }.toMap
      assert(got === expected,
        "completed rows across the restart must be the single uninterrupted " +
          s"pack stream per bucket: got ${got.keys.toSeq.sorted}")
    } finally srcB.close()
  }

  test("annProbeStream reproduces the batch ADC probe over a persisted index") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val emb = graft.util.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val built = graft.operators.PqIndex.build(emb, m = 8, kCodes = 16)
    // through the FULL persisted lifecycle: the serving tier loads, never builds
    val dir = java.nio.file.Files.createTempDirectory("graft-annstream").toString
    built.save(dir)
    val idx = graft.operators.PqIndex.load(spark, dir)

    val qRows = emb.filter(col("vec_id") < 6)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val batch = graft.operators.PqIndex
      .adcProbe(idx, qRows, nProbe = 2, topK = 5)
      .orderBy("q_id", "rank")
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(2)).map(r =>
        (r.getLong(1), r.getDouble(3))).toSeq).toMap

    val qLocal = qRows.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val mem = MemoryStream[(java.sql.Timestamp, Long, Seq[Double])]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val q = StreamOps.annProbeStream(
        mem.toDF().toDF("ts", "q_id", "qv"),
        "ts", "q_id", "qv", idx, nProbe = 2, topK = 5,
        windowLen = "10 seconds", delay = "5 seconds")
      .writeStream.format("memory").queryName("annstream")
      .outputMode("append").start()
    try {
      mem.addData(qLocal.map { case (id, v) => (ts(3), id, v) }: _*)
      q.processAllAvailable()
      // advance the watermark past the window so the aggregate emits
      mem.addData((ts(60), 999L, qLocal.head._2))
      q.processAllAvailable()
      val got = spark.table("annstream")
        .filter(col("q_id") < 6)
        .select("q_id", "top_ids", "top_scores").collect()
        .map(r => r.getLong(0) ->
          r.getSeq[Long](1).zip(r.getSeq[Double](2)).toSeq).toMap
      assert(got.keySet === batch.keySet)
      // ids, ORDER, and bit-identical scores — stream serves exactly what
      // the batch probe computes
      batch.foreach { case (qid, exp) =>
        assert(got(qid) == exp, s"query $qid: ${got(qid)} != $exp")
      }
    } finally q.stop()
  }

  test("tokenizeBpeStream matches batch tokenize_bpe_ids via the persisted model") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    // persist the trainer's real output as the model artifact the stream loads
    val merges = SparkEntry.queries("train_bpe")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    assert(merges.nonEmpty)
    val modelDir =
      java.nio.file.Files.createTempDirectory("graft-bpestream").toString
    graft.operators.BpeModel.save(spark, merges, modelDir)

    val batch = SparkEntry.queries("tokenize_bpe_ids")(spark, sfDir)
      .select("doc_id", "n_ids", "ids_md5").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.tokenizeBpeStream(
        mem.toDF().toDF("doc_id", "text"), "text", modelDir)
      .select(col("doc_id"),
        col("n_ids"),
        md5(concat_ws(",", col("token_ids").cast("array<string>")))
          .as("ids_md5"))
      .writeStream.format("memory").queryName("bpeids")
      .outputMode("append").start()
    try {
      val (h1, h2) = docs.splitAt(docs.length / 2)
      mem.addData(h1: _*)
      q.processAllAvailable()
      mem.addData(h2: _*)
      q.processAllAvailable()
      val got = spark.table("bpeids").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      // batch drops wordless docs at its posexplode; the stream emits an
      // empty id array for them — that is the only allowed asymmetry
      val extra = got.keySet -- batch.keySet
      assert(extra.forall(d => got(d)._1 == 0L), s"unexplained extra: $extra")
      batch.foreach { case (d, v) =>
        assert(got.get(d).contains(v), s"doc $d: ${got.get(d)} != $v")
      }
    } finally q.stop()
  }

  test("tokenizeBpeBytesStream matches batch tokenize_bpe_ids_bytes via the persisted model") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val merges = SparkEntry.queries("train_bpe_bytes")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    assert(merges.nonEmpty)
    val modelDir =
      java.nio.file.Files.createTempDirectory("graft-bpebstream").toString
    graft.operators.BpeModel.save(spark, merges, modelDir)

    val batch = SparkEntry.queries("tokenize_bpe_ids_bytes")(spark, sfDir)
      .select("doc_id", "n_ids", "ids_md5").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.tokenizeBpeBytesStream(
        mem.toDF().toDF("doc_id", "text"), "text", modelDir)
      .select(col("doc_id"),
        col("n_ids"),
        md5(concat_ws(",", col("token_ids").cast("array<string>")))
          .as("ids_md5"))
      .writeStream.format("memory").queryName("bpebyteids")
      .outputMode("append").start()
    try {
      val (h1, h2) = docs.splitAt(docs.length / 2)
      mem.addData(h1: _*)
      q.processAllAvailable()
      mem.addData(h2: _*)
      q.processAllAvailable()
      val got = spark.table("bpebyteids").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      // batch drops wordless docs at its posexplode; the stream emits an
      // empty id array for them — the only allowed asymmetry
      val extra = got.keySet -- batch.keySet
      assert(extra.forall(d => got(d)._1 == 0L), s"unexplained extra: $extra")
      batch.foreach { case (d, v) =>
        assert(got.get(d).contains(v), s"doc $d: ${got.get(d)} != $v")
      }
    } finally q.stop()
  }

  test("tokenizeBpeGpt2Stream matches batch tokenize_bpe_ids_gpt2 via the persisted model") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val merges = SparkEntry.queries("train_bpe_gpt2")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    assert(merges.nonEmpty)
    val modelDir =
      java.nio.file.Files.createTempDirectory("graft-bpegstream").toString
    graft.operators.BpeModel.save(spark, merges, modelDir)

    val batch = SparkEntry.queries("tokenize_bpe_ids_gpt2")(spark, sfDir)
      .select("doc_id", "n_ids", "ids_md5").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // the batch entry runs over the contraction-derived corpus — feed the
    // stream the SAME derivation (the engine-identical replace chain,
    // incl. round 12's double-space injection that keeps the whitespace
    // lookahead under the gate)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).replace("e ", "e's ").replace("n ", "n'll ")
          .replace("s ", "s  "))).toSeq

    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.tokenizeBpeGpt2Stream(
        mem.toDF().toDF("doc_id", "text"), "text", modelDir)
      .select(col("doc_id"),
        col("n_ids"),
        md5(concat_ws(",", col("token_ids").cast("array<string>")))
          .as("ids_md5"))
      .writeStream.format("memory").queryName("bpegpt2ids")
      .outputMode("append").start()
    try {
      val (h1, h2) = docs.splitAt(docs.length / 2)
      mem.addData(h1: _*)
      q.processAllAvailable()
      mem.addData(h2: _*)
      q.processAllAvailable()
      val got = spark.table("bpegpt2ids").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      // batch drops pre-token-less docs at its posexplode; the stream
      // emits an empty id array for them — the only allowed asymmetry
      val extra = got.keySet -- batch.keySet
      assert(extra.forall(d => got(d)._1 == 0L), s"unexplained extra: $extra")
      batch.foreach { case (d, v) =>
        assert(got.get(d).contains(v), s"doc $d: ${got.get(d)} != $v")
      }
    } finally q.stop()
  }

  test("packTokenIdsStream bytes alphabet: byte ids, byte EOS, pack invariants hold") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val modelDir =
      java.nio.file.Files.createTempDirectory("graft-packbytes").toString
    val merges = graft.queries.TextAnalysis.trainBpeFastBytes(
      Seq((1L, "Hi! Hi! 42 42 ok ok")).toDF("doc_id", "text"), rounds = 5)
    graft.operators.BpeModel.save(spark, merges, modelDir)
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val q = StreamOps.packTokenIdsStream(
        mem.toDF().toDF("ts", "doc_id", "text"),
        "ts", "doc_id", "text", modelDir,
        buckets = 1, seqLen = 8, eosId = 264, padId = 265,
        delay = "5 seconds", alphabet = "bytes")
      .writeStream.format("memory").queryName("packbytes")
      .outputMode("append").start()
    try {
      mem.addData((ts(1), 0L, "Hi! 42"), (ts(2), 0L, "Hi! 42"),
        (ts(3), 0L, "Hi! 42"))
      q.processAllAvailable()
      val rows = spark.table("packbytes").collect()
      assert(rows.nonEmpty, "enough ids must complete at least one row")
      rows.foreach { r =>
        val ids = r.getSeq[Int](4)
        assert(ids.size === 8)
        assert(r.getLong(3) === 0L, "completed rows are never padded")
        assert(ids.forall(id => (id >= 0 && id < 256) ||
          (id > 255 && id <= 255 + merges.size) || id == 264),
          s"non-byte-alphabet id in $ids")
        assert(ids.contains(264) || ids.forall(_ != 265),
          "EOS must frame documents; PAD only on flushed tails")
      }
    } finally q.stop()
  }

  test("corpusReportStream emits the per-window data card on watermark close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, String, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val q = StreamOps.corpusReportStream(
      mem.toDF().toDF("ts", "text", "source", "lang"),
      "ts", "text", "source", "lang", "10 seconds", "5 seconds")
      .writeStream.format("memory").queryName("scard")
      .outputMode("append").start()
    try {
      // window [0, 10): web/en has an exact-dup pair + a distinct doc;
      // books/en has one doc
      mem.addData(
        (ts(1), "aa bb cc", "web", "en"),
        (ts(2), "aa bb cc", "web", "en"),
        (ts(3), "dd ee", "web", "en"),
        (ts(4), "ff gg hh ii", "books", "en"))
      q.processAllAvailable()
      // nothing emits until the watermark passes the window end
      assert(spark.table("scard").count() === 0)
      mem.addData((ts(30), "zz", "web", "en"))
      q.processAllAvailable()
      val rows = spark.table("scard")
        .selectExpr("unix_timestamp(win_start)", "source", "lang",
          "n_docs", "n_tokens", "min_toks", "max_toks", "sum_chars",
          "n_unique_approx")
        .collect()
      val exact = rows.map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7))).toSet
      assert(exact == Set(
        (0L, "web", "en", 3L, 8L, 2L, 3L, 21L),
        (0L, "books", "en", 1L, 4L, 4L, 4L, 11L)),
        s"got $exact")
      // the dup-pressure column is HLL-approximate BY CONTRACT — bound it
      // (true distincts: web/en 2, books/en 1), don't pin implementation
      // bits that a Spark upgrade may shift
      rows.foreach { r =>
        val (src, nDocs, uniq) = (r.getString(1), r.getLong(3), r.getLong(8))
        assert(uniq >= 1 && uniq <= nDocs,
          s"$src n_unique_approx=$uniq outside [1, $nDocs]")
      }
    } finally q.stop()
  }

  test("spanDedupStream flags exactly the repeated chunks on a controlled corpus") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val span = (1 to 16).map(i => s"tok$i").mkString(" ")
    val other = (101 to 116).map(i => s"tok$i").mkString(" ")
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = StreamOps.spanDedupStream(
        mem.toDF().toDF("ts", "doc_id", "text"), "ts", "doc_id", "text")
      .writeStream.format("memory").queryName("spanflags")
      .outputMode("append").start()
    try {
      val t = new java.sql.Timestamp(1000L)
      mem.addData((t, 1L, span), (t, 2L, other))
      q.processAllAvailable()
      assert(spark.table("spanflags").count() === 0L,
        "first occurrences must not flag")
      // doc 3 repeats doc 1's span; doc 4 holds the same span TWICE
      // (within-doc repeats count, the batch n_occurrences semantics)
      mem.addData((t, 3L, span), (t, 4L, s"$span $span"))
      q.processAllAvailable()
      val flags = spark.table("spanflags")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(flags.toSeq === Seq(3L, 4L, 4L))
    } finally q.stop()
  }

  test("spanDedupStream: Bloom shard state survives a checkpoint restart") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graftspansrc").toString
    val outDir = Files.createTempDirectory("graftspanout").toString
    val ckpt = Files.createTempDirectory("graftspanckpt").toString
    val srcB = ParquetLogBackend.create(spark, srcDir, compactIntervalMs = 0)
    val span = (1 to 16).map(i => s"tok$i").mkString(" ")
    def startQ() = {
      val src = spark.readStream.format("graft").load(srcDir)
        .select(col("version").as("doc_id"),
          col("timestamp").cast("timestamp").as("ts"),
          get_json_object(col("payload"), "$.t").as("text"))
      StreamOps.spanDedupStream(src, "ts", "doc_id", "text")
        .toDF()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    try {
      // first run sees the span ONCE — no flag, but the Bloom remembers
      srcB.append(EventData("doc", s"""{"t":"$span"}"""))
      val q1 = startQ()
      try q1.processAllAvailable() finally q1.stop()
      // restart from the checkpoint: the re-occurrence must flag, which
      // only happens if the shard's bitmap state survived the restart
      srcB.append(EventData("doc", s"""{"t":"$span"}"""))
      val q2 = startQ()
      try q2.processAllAvailable() finally q2.stop()
      val flags = spark.read.parquet(outDir)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(flags === Seq(2L),
        "exactly the post-restart re-occurrence must flag")
    } finally srcB.close()
  }

  test("spanDedupStream: replayed corpus flags a SUPERSET of the batch duplicated-chunk set") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val docs = graft.util.Tables(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (new java.sql.Timestamp(1000L), r.getLong(0), r.getString(1)))
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = StreamOps.spanDedupStream(
        mem.toDF().toDF("ts", "doc_id", "text"), "ts", "doc_id", "text")
      .writeStream.format("memory").queryName("spanflags2")
      .outputMode("append").start()
    try {
      // two micro-batches: duplicates must be caught across batch
      // boundaries through the persisted shard state, not just within one
      val (h1, h2) = docs.splitAt(docs.length / 2)
      mem.addData(h1.toIndexedSeq); q.processAllAvailable()
      mem.addData(h2.toIndexedSeq); q.processAllAvailable()
      val flagged = spark.table("spanflags2")
        .select("chunk_hash").distinct().collect()
        .map(_.getString(0)).toSet
      val batchDups = SparkEntry.queries("dedup_span_exact")(spark, sfDir)
        .select("chunk_hash").collect().map(_.getString(0)).toSet
      assert(batchDups.nonEmpty, "testdata has duplicated spans")
      val missed = batchDups.diff(flagged)
      assert(missed.isEmpty,
        s"no-false-negative contract broken: ${missed.take(3)}")
    } finally q.stop()
  }

  test("keywordScanStream: per-doc counts equal the driver automaton") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val keywords = Seq("aa", "ab", "stream")
    val docs = Seq((1L, "aaab streaming"), (2L, "nothing"), (3L, "aa aa"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.keywordScanStream(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", keywords)
      .writeStream.format("memory").queryName("kwscan")
      .outputMode("append").start()
    try {
      mem.addData(docs.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("kwscan")
        .as[(Long, String, Long)].collect().toSet
      val table = new graft.exprs.KeywordTable(keywords)
      val want = (for {
        (id, text) <- docs
        (kw, i) <- keywords.zipWithIndex
      } yield (id, kw, table.scan(text)(i).toLong)).toSet
      assert(got === want)
      assert(got.contains((1L, "aa", 2L))) // overlap inside "aaab"
    } finally q.stop()
  }

  test("FuzzyJoin.matchStream: streamed probes match the batch matchJoin pair set") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val part = graft.util.Tables(spark, sfDir, "part")
    val catalog = part.select(col("p_name")).distinct()
    // dirty probes: names minus their last character (the
    // fuzzy_match_catalog derivation), plus shorts to hit that block
    val probes = part.select(
        col("p_name").substr(lit(1), length(col("p_name")) - 1).as("dirty"))
      .distinct().as[String].collect() ++ Seq("ab", "zz")
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val q = graft.operators.FuzzyJoin.matchStream(
        mem.toDF().toDF("ts", "dirty"), "ts", "dirty",
        catalog, "p_name", q = 2, k = 1)
      .writeStream.format("memory").queryName("fuzzymatches")
      .outputMode("append").start()
    try {
      val t0 = new java.sql.Timestamp(1000L)
      val (h1, h2) = probes.splitAt(probes.length / 2)
      mem.addData(h1.map((t0, _)).toIndexedSeq); q.processAllAvailable()
      mem.addData(h2.map((t0, _)).toIndexedSeq); q.processAllAvailable()
      // sentinel far in the future closes the window for append emission
      mem.addData(Seq((new java.sql.Timestamp(10000000L), "zzzzzzzz")))
      q.processAllAvailable()
      val got = spark.table("fuzzymatches")
        .select("probe", "candidate", "dist")
        .as[(String, String, Long)].collect().toSet
      val want = graft.operators.FuzzyJoin.matchJoin(
          probes.toSeq.toDF("dirty"), "dirty", catalog, "p_name", q = 2, k = 1)
        .as[(String, String, Long)].collect().toSet
      assert(want.nonEmpty)
      assert(got === want)
    } finally q.stop()
  }

  test("FuzzyJoin.matchStream: a catalog dir mutated mid-stream keeps serving the construction-time snapshot consistently") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._
    val catDir = java.nio.file.Files
      .createTempDirectory("graft-fuzzycat").toString
    Seq("alpha", "bravo", "carol").toDF("name")
      .write.mode("overwrite").parquet(catDir)
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val q = graft.operators.FuzzyJoin.matchStream(
        mem.toDF().toDF("ts", "dirty"), "ts", "dirty",
        spark.read.parquet(catDir), "name", q = 2, k = 1)
      .writeStream.format("memory").queryName("fuzzysnap")
      .outputMode("append").start()
    try {
      val t0 = new java.sql.Timestamp(1000L)
      mem.addData(Seq((t0, "alphx")))
      q.processAllAvailable()
      // MUTATE the catalog dir wholesale mid-stream: before the freeze,
      // the probe-side df literal (collected once) and the per-batch
      // catalog prefix plan would now rank against DIFFERENT gram orders
      // and could silently drop true pairs; with it, both sides keep the
      // construction-time snapshot
      Seq("delta", "echos").toDF("name")
        .write.mode("overwrite").parquet(catDir)
      mem.addData(Seq((t0, "bravx"), (t0, "deltx")))
      q.processAllAvailable()
      mem.addData(Seq((new java.sql.Timestamp(10000000L), "zzzzzzzz")))
      q.processAllAvailable()
      val got = spark.table("fuzzysnap")
        .select("probe", "candidate", "dist")
        .as[(String, String, Long)].collect().toSet
      // pre- AND post-mutation probes resolve against the ORIGINAL
      // catalog (one consistent order — no false negative on bravx)...
      assert(got === Set(("alphx", "alpha", 1L), ("bravx", "bravo", 1L)),
        s"construction-time snapshot must keep serving consistently: $got")
      // ...and the mutated catalog is not half-consulted: deltx (a match
      // only in the NEW catalog) produced nothing, rather than a torn
      // mix of old ranks with new rows
      assert(!got.exists(_._1 == "deltx"))
    } finally q.stop()
  }

  test("CorpusJsonl.ingestStream: drop-dir shards grow the table exactly-once, rejects quarantine, restart never double-counts") {
    import org.apache.spark.sql.functions._
    val in = java.nio.file.Files
      .createTempDirectory("graft-jsonlintake").toString
    val table = java.nio.file.Files
      .createTempDirectory("graft-jsonltable").toString + "/t"
    val rej = java.nio.file.Files
      .createTempDirectory("graft-jsonlrej").toString + "/r"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-jsonlckpt").toString
    def drop(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("\n").getBytes("UTF-8"))
    def doc(i: Int) =
      s"""{"doc_id": $i, "text": "t$i", "lang": "en", "source": "s", "n_chars": 2}"""
    drop("s1.json", Seq(doc(1), doc(2)))
    var (q1, q2) = graft.sources.CorpusJsonl.ingestStream(
      spark, in, table, rej, ckpt)
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      assert(spark.read.parquet(table).count() === 2L)
      // shard 2 lands mid-stream with one malformed line
      drop("s2.json", Seq(doc(3), "garbage line"))
      q1.processAllAvailable(); q2.processAllAvailable()
      assert(spark.read.parquet(table)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
        Seq(1L, 2L, 3L))
      assert(spark.read.json(rej).count() === 1L)
    } finally { q1.stop(); q2.stop() }
    // restart on the same checkpoints: nothing re-ingests; a shard
    // dropped after the restart lands exactly once
    val (q3, q4) = graft.sources.CorpusJsonl.ingestStream(
      spark, in, table, rej, ckpt)
    try {
      q3.processAllAvailable(); q4.processAllAvailable()
      assert(spark.read.parquet(table).count() === 3L,
        "a restart must not double-ingest committed shards")
      drop("s3.json", Seq(doc(4)))
      q3.processAllAvailable(); q4.processAllAvailable()
      assert(spark.read.parquet(table).count() === 4L)
      assert(spark.read.json(rej).count() === 1L)
    } finally { q3.stop(); q4.stop() }
  }

  test("decontaminateSemanticStream: ingest-side hits are bit-identical to the batch entry's pre-aggregation hits") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val e = graft.util.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val bench = e.filter(col("vec_id") % 16 === 7)
    val corpusRows = e.filter(col("vec_id") % 16 =!= 7)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    // batch truth: the decontaminate_semantic hit set BEFORE aggregation
    val tau = 0.3 // sf0.001 is small; a lower tau keeps the set non-trivial
    val nrm = graft.queries.Similarity.norm(col("v"))
    val want = e.filter(col("vec_id") % 16 =!= 7)
      .withColumn("nrm", nrm)
      .crossJoin(broadcast(bench
        .select(col("vec_id").as("b_id"), col("v").as("bv"))
        .withColumn("bn", graft.queries.Similarity.norm(col("bv")))))
      .withColumn("cosine", graft.queries.Similarity.cosinePre(
        col("v"), col("bv"), col("nrm"), col("bn")))
      .filter(col("cosine") >= tau)
      .select("vec_id", "b_id", "cosine")
      .as[(Long, Long, Double)].collect().toSet
    assert(want.nonEmpty, "the fixture must produce hits at this tau")
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.StreamOps.decontaminateSemanticStream(
        mem.toDF().toDF("vec_id", "v"), "vec_id", "v",
        bench, "vec_id", "v", tau)
      .writeStream.format("memory").queryName("semdecon")
      .outputMode("append").start()
    try {
      val (h1, h2) = corpusRows.splitAt(corpusRows.length / 2)
      mem.addData(h1: _*); q.processAllAvailable()
      mem.addData(h2: _*); q.processAllAvailable()
      val got = spark.table("semdecon")
        .as[(Long, Long, Double)].collect().toSet
      assert(got === want,
        "stream hits must equal the batch hit set bit-for-bit")
    } finally q.stop()
    // the plan-literal ceiling refuses oversized benchmarks loudly
    val big = spark.range(5000).select(col("id").as("vec_id"),
      array_repeat(lit(1.0), 4).as("v"))
    val ex = intercept[IllegalArgumentException] {
      graft.streaming.StreamOps.decontaminateSemanticStream(
        mem.toDF().toDF("vec_id", "v"), "vec_id", "v",
        big, "vec_id", "v", tau)
    }
    assert(ex.getMessage.contains("plan-literal ceiling"))
  }

  test("FuzzyJoin.matchStream takes the DELETION path on a degenerate-alphabet catalog and matches batch matchJoin") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._
    // zero-padded numeric ids — the exact corpus family the round-12
    // adaptive batch path exists for; round 13 gives it a streaming answer
    val catalog = (0 until 400).map(i => f"ID#$i%08d")
    val probes = catalog.take(80).map(_.dropRight(1)) ++ Seq("zz")
    // the persisted snapshot must record the deletion generator
    val snap = graft.operators.FuzzyJoin.ensureSnapshot(
      catalog.toDF("s").distinct(), 2, 1)
    val gen = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(snap, "generator")), "UTF-8")
    assert(gen === "deletions",
      "the numeric-id catalog must choose the deletion generator")
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(snap, "sigs")),
      "the catalog signature index is computed once, at construction")
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val q = graft.operators.FuzzyJoin.matchStream(
        mem.toDF().toDF("ts", "dirty"), "ts", "dirty",
        catalog.toDF("name"), "name", q = 2, k = 1)
      .writeStream.format("memory").queryName("fuzzydel")
      .outputMode("append").start()
    try {
      val t0 = new java.sql.Timestamp(1000L)
      val (h1, h2) = probes.splitAt(probes.length / 2)
      mem.addData(h1.map((t0, _)).toIndexedSeq); q.processAllAvailable()
      mem.addData(h2.map((t0, _)).toIndexedSeq); q.processAllAvailable()
      mem.addData(Seq((new java.sql.Timestamp(10000000L), "zzzzzzzz")))
      q.processAllAvailable()
      val got = spark.table("fuzzydel")
        .select("probe", "candidate", "dist")
        .as[(String, String, Long)].collect().toSet
      val want = graft.operators.FuzzyJoin.matchJoin(
          probes.toDF("dirty"), "dirty", catalog.toDF("name"), "name",
          q = 2, k = 1)
        .as[(String, String, Long)].collect().toSet
      assert(want.nonEmpty)
      assert(got === want,
        "streamed deletion-path pairs must equal batch matchJoin")
    } finally q.stop()
  }

  test("FuzzyJoin.matchStream gram-literal ceiling: past it the catalog falls back to deletions; k past the deletion budget refuses loudly") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions._
    // 257-char alphabet, all 257² two-char strings → 66049 distinct
    // 2-grams, just past the 65536 plan-literal ceiling
    val chars = (0 until 257).map(i => (0x4E00 + i).toChar)
    val names = (for (i <- 0 until 257; j <- 0 until 257)
      yield s"${chars(i)}${chars(j)}").toDF("s").distinct()
    val snap = graft.operators.FuzzyJoin.ensureSnapshot(names, 2, 1)
    val gen = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(snap, "generator")), "UTF-8")
    assert(gen === "deletions",
      "a past-ceiling catalog must fall back to the deletion generator")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.FuzzyJoin.ensureSnapshot(names, 2, 3)
    }
    assert(ex.getMessage.contains("plan-literal ceiling"),
      s"k=3 past the ceiling must refuse with the batch pointer: $ex")
  }

  test("prioritySampleStream: the closed window's sample equals batch sample_priority bit-for-bit") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val batch = SparkEntry.queries("sample_priority")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(batch.size === 50)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    val t0 = new java.sql.Timestamp(1000L)
    val mem = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val q = StreamOps.prioritySampleStream(
        mem.toDF().toDF("ts", "doc_id", "n_chars"),
        "ts", "doc_id", "n_chars", k = 50)
      .writeStream.format("memory").queryName("priosample")
      .outputMode("append").start()
    try {
      // two micro-batches into ONE window: mergeability must make the
      // split invisible (the global top-(k+1) from partial top-(k+1)s)
      val (h1, h2) = docs.splitAt(docs.length / 2)
      mem.addData(h1.map { case (id, nc) => (t0, id, nc) }.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(h2.map { case (id, nc) => (t0, id, nc) }.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(Seq((new java.sql.Timestamp(10000000L), 999999L, 1L)))
      q.processAllAvailable()
      val got = spark.table("priosample")
        .filter(col("doc_id") =!= 999999L)
        .select("doc_id", "w", "rank", "priority", "w_est")
        .as[(Long, Double, Long, Double, Double)].collect().toSet
      assert(got === batch,
        "the streamed window sample must be bit-identical to the batch entry")
    } finally q.stop()
  }

  test("mixTemperatureStream: the frozen profile reproduces the batch audit's kept counts exactly") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    // the batch audit IS the profile: per-source thresholds + expected
    // kept counts
    val audit = SparkEntry.queries("mix_temperature")(spark, sfDir)
      .select("source", "thr", "n_kept").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val thresholds = audit.map(a => a._1 -> a._2).toMap
    val wantKept = audit.map(a => a._1 -> a._3).toMap

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.mixTemperatureStream(
        mem.toDF().toDF("doc_id", "source"), "doc_id", "source",
        thresholds)
      .writeStream.format("memory").queryName("mixtemp")
      .outputMode("append").start()
    try {
      val (h1, h2) = docs.splitAt(docs.length / 2)
      mem.addData(h1: _*); q.processAllAvailable()
      mem.addData(h2: _*); q.processAllAvailable()
      val got = spark.table("mixtemp").groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === wantKept.filter(_._2 > 0),
        "streamed per-source kept counts must equal the batch audit")
      // an unprofiled source drops rather than silently passing
      mem.addData(Seq((999999L, "never-profiled-source")))
      q.processAllAvailable()
      assert(spark.table("mixtemp")
        .filter(col("source") === "never-profiled-source").count() === 0L)
    } finally q.stop()
  }

  test("sessionizeStream: closed sessions equal the batch events_sessionize entry") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val ev = graft.util.Tables(spark, sfDir, "events")
      .select("ts", "user_id").as[(Long, Long)].collect()
    val mem = MemoryStream[(Long, Long)]
    val q = StreamOps.sessionizeStream(
        mem.toDF().toDF("ts", "user_id"), "ts", "user_id")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      val (h1, h2) = ev.splitAt(ev.length / 2)
      mem.addData(h1.toIndexedSeq); q.processAllAvailable()
      mem.addData(h2.toIndexedSeq); q.processAllAvailable()
      // a far-future sentinel (dummy user) drives the watermark past
      // every real session so append mode flushes them all
      val sentinelTs = ev.map(_._1).max + 365L * 24 * 3600 * 1000000000L
      mem.addData(Seq((sentinelTs, -1L))); q.processAllAvailable()
      val got = spark.table("sessions")
        .filter(col("user_id") =!= -1L)
        .select("user_id", "t_start", "t_end", "n_events")
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(s => (s._2, s._3, s._4)).toSeq).toMap
      val want = SparkEntry.queries("events_sessionize")(spark, sfDir)
        .select("user_id", "t_start", "t_end", "n_events")
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(s => (s._2, s._3, s._4)).toSeq).toMap
      assert(got.keySet === want.keySet)
      want.foreach { case (u, sessions) =>
        assert(got(u) === sessions, s"user $u sessions differ")
      }
    } finally q.stop()
  }

  test("heavyHittersStream: candidates are a superset of batch heavy hitters; counts are sound lower bounds") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val texts = graft.util.Tables(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select("text").collect().map(_.getString(0))
    val capacity = 64
    val shards = 8
    val mem = MemoryStream[String]
    val q = StreamOps.heavyHittersStream(
        mem.toDF().toDF("text"), "text", capacity, shards)
      .writeStream.format("memory").queryName("hhcands")
      .outputMode("update").start()
    try {
      // split across micro-batches so candidates must survive through state
      val (h1, h2) = texts.splitAt(texts.length / 2)
      mem.addData(h1.toIndexedSeq); q.processAllAvailable()
      mem.addData(h2.toIndexedSeq); q.processAllAvailable()
      // last emission per (shard, token) is the current buffer view
      val cands = spark.table("hhcands")
        .groupBy("shard", "token")
        .agg(max("lower_bound").as("lb"))
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      val truth = texts.flatMap(_.split("\\s+")).filterNot(_.isEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = truth.values.sum
      // survivor guarantee: freq > n/(capacity+1) must be held somewhere
      val mustSurvive = truth.filter(_._2 > n.toDouble / (capacity + 1)).keys
      val missing = mustSurvive.filterNot(cands.contains)
      assert(missing.isEmpty, s"lost heavy hitters: ${missing.take(5)}")
      // every emitted count is a lower bound on the true count
      // (max over emissions is still an MG count, hence still a bound)
      cands.foreach { case (tok, lb) =>
        assert(lb <= truth.getOrElse(tok, 0L),
          s"MG count must undercount: $tok lb=$lb true=${truth.get(tok)}")
      }
    } finally q.stop()
  }
}
