package graft

import graft.core._
import graft.storage.{EventLogBackend, InMemoryBackend, ParquetLogBackend}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Behavioral parity suite run against BOTH backends, mirroring the
  * reference's backend-matrix harness (eventlog/eventlog_test.go:424-461).
  */
class EventLogBehaviorSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def backends: Seq[(String, () => EventLogBackend)] = Seq(
    "inmem" -> (() => new InMemoryBackend(spark, Map("name" -> "testlog"))),
    "parquet" -> { () =>
      val dir = Files.createTempDirectory("graftlog").toString
      ParquetLogBackend.create(spark, dir, Map("name" -> "testlog"),
        compactThreshold = 3) // low threshold → exercises segment+tail union
    })

  private def withLog(f: (String, EventLog) => Unit): Unit =
    backends.foreach { case (name, mk) =>
      val log = new EventLog(mk())
      try f(name, log) finally log.close()
    }

  private def ev(i: Int) = EventData(s"label_$i", s"""{"i": $i}""")

  private def scanRows(log: EventLog, from: Long, reverse: Boolean = false,
      limit: Option[Int] = None, skipFirst: Boolean = false): Seq[Row] =
    log.scan(from, reverse, limit, skipFirst)
      .select("version", "version_previous", "version_next", "label", "payload")
      .collect().toSeq

  // ≙ TestAppendRead (eventlog_test.go:22-114)
  test("append + scan: version chain, minified payloads, both backends") {
    withLog { (name, log) =>
      assert(log.version == 0L, name)
      assert(log.versionInitial == 0L, name)
      val r1 = log.append(ev(1))
      val r2 = log.append(ev(2))
      val r3 = log.append(ev(3))
      assert(r1.version == 1L && r1.versionPrevious == 0L, name)
      assert(r2.version == 2L && r2.versionPrevious == 1L, name)
      assert(r3.version == 3L && r3.versionPrevious == 2L, name)
      assert(log.version == 3L && log.versionInitial == 1L, name)

      val rows = scanRows(log, 1L)
      assert(rows.map(_.getLong(0)) == Seq(1L, 2L, 3L), name)
      assert(rows.map(_.getLong(1)) == Seq(0L, 1L, 2L), name) // prev chain
      assert(rows.map(_.getLong(2)) == Seq(2L, 3L, 0L), name) // next, 0=head
      assert(rows.map(_.getString(4)) ==
        Seq("""{"i":1}""", """{"i":2}""", """{"i":3}"""), name) // minified
    }
  }

  test("reverse scan walks back from the given version") {
    withLog { (name, log) =>
      (1 to 5).foreach(i => log.append(ev(i)))
      val rows = scanRows(log, 4L, reverse = true)
      assert(rows.map(_.getLong(0)) == Seq(4L, 3L, 2L, 1L), name)
    }
  }

  test("limit and skip_first compose for cursor pagination") {
    withLog { (name, log) =>
      (1 to 6).foreach(i => log.append(ev(i)))
      // page 1: from initial, n=3 → versions 1..3
      val p1 = scanRows(log, 1L, limit = Some(3))
      assert(p1.map(_.getLong(0)) == Seq(1L, 2L, 3L), name)
      // page 2: resume at last-seen with skip_first → 4..6
      val p2 = scanRows(log, p1.last.getLong(0), limit = Some(3), skipFirst = true)
      assert(p2.map(_.getLong(0)) == Seq(4L, 5L, 6L), name)
    }
  }

  // ≙ empty-log / out-of-bounds scans (eventlog_test.go:339-390)
  test("scan of empty log or out-of-bounds version throws ErrInvalidVersion") {
    withLog { (name, log) =>
      intercept[Errors.ErrInvalidVersion](log.scan(1L))
      log.append(ev(1))
      intercept[Errors.ErrInvalidVersion](log.scan(0L))
      intercept[Errors.ErrInvalidVersion](log.scan(2L))
    }
  }

  // ≙ TestAppendCheck OCC (eventlog_test.go:305-335)
  test("OCC: appendCheck commits on matching version, rejects stale") {
    withLog { (name, log) =>
      val r1 = log.appendCheck(0L, ev(1))
      assert(r1.version == 1L, name)
      intercept[Errors.ErrMismatchingVersions](log.appendCheck(0L, ev(2)))
      assert(log.version == 1L, name) // rejected append left no trace
      val r2 = log.appendCheck(1L, ev(2))
      assert(r2.version == 2L, name)
    }
  }

  test("tryAppend retries through version races") {
    withLog { (name, log) =>
      log.append(ev(1))
      // stale assumed version 0; transaction sees the synced fresh version
      var seen = List.empty[Long]
      val r = log.tryAppend(0L, { assumed =>
        seen ::= assumed
        EventData("retry", s"""{"assumed": $assumed}""")
      })
      assert(r.version == 2L, name)
      assert(seen.contains(1L), name) // re-synced to the real latest
    }
  }

  // ≙ AppendMulti atomicity + one timestamp (eventlog.go:174-197)
  test("appendMulti: atomic, shared timestamp, empty input is a no-op") {
    withLog { (name, log) =>
      val r0 = log.appendMulti(Seq.empty)
      assert(r0.version == 0L, name)
      val r = log.appendMulti(Seq(ev(1), ev(2), ev(3)))
      assert(r.versionFirst == 1L && r.version == 3L && r.versionPrevious == 0L, name)
      val ts = log.toDF.select("timestamp").collect().map(_.getLong(0)).distinct
      assert(ts.length == 1, name) // one commit timestamp for all three
      // atomic failure: one invalid event in the batch → nothing committed
      intercept[Errors.ErrInvalidPayload](
        log.appendMulti(Seq(ev(4), EventData("x", "not json"))))
      assert(log.version == 3L, name)
    }
  }

  // ≙ validation corpus at the facade (eventlog_test.go:217-301)
  test("append rejects invalid payloads, labels, and oversized payloads") {
    withLog { (name, log) =>
      intercept[Errors.ErrInvalidPayload](log.append(EventData("x", "{}")))
      intercept[Errors.ErrInvalidPayload](log.append(EventData("x", "[1]")))
      intercept[Errors.ErrLabelContainsIllegalChars](
        log.append(EventData("bad label!", """{"x":0}""")))
      assert(log.version == 0L, name)
    }
    // payload size limit is backend-enforced (reference inmem.go:52-57)
    val small = new EventLog(new InMemoryBackend(spark, payloadLimit = 16))
    try {
      small.append(EventData("ok", """{"x":0}"""))
      intercept[Errors.ErrPayloadSizeLimitExceeded](
        small.append(EventData("big", """{"xxxxxxxxxxx": 12345}""")))
    } finally small.close()
  }

  test("metadata round-trip (eventlog_test.go:162-174)") {
    withLog { (name, log) =>
      assert(log.metadata == Map("name" -> "testlog"), name)
    }
  }

  test("integrity audit passes on a healthy log, both backends") {
    withLog { (name, log) =>
      (1 to 10).foreach(i => log.append(ev(i)))
      assert(log.checkIntegrity().count() == 0L, name)
    }
  }

  test("parquet backend: recovery after close preserves log and sequencer") {
    val dir = Files.createTempDirectory("graftrec").toString
    val log = new EventLog(ParquetLogBackend.create(
      spark, dir, Map("k" -> "v"), compactThreshold = 2))
    (1 to 5).foreach(i => log.append(ev(i)))
    log.close()

    val reopened = new EventLog(ParquetLogBackend.open(spark, dir))
    try {
      assert(reopened.version == 5L)
      assert(reopened.metadata == Map("k" -> "v"))
      val rows = scanRows(reopened, 1L)
      assert(rows.map(_.getLong(0)) == (1L to 5L))
      // sequencer resumes: next append continues the chain
      val r = reopened.append(ev(6))
      assert(r.version == 6L && r.versionPrevious == 5L)
      assert(reopened.checkIntegrity().count() == 0L)
    } finally reopened.close()
  }

  test("parquet backend: commit log rotates at compaction, bounded by the tail") {
    val dir = Files.createTempDirectory("graftrot").toString
    val log = new EventLog(ParquetLogBackend.create(spark, dir,
      compactThreshold = 2))
    try {
      (1 to 10).foreach(i => log.append(ev(i)))
      // every 2nd append compacts + rotates: commits.jsonl holds only the
      // commits past the segment watermark (here: none), not all history
      val lines = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(dir, "commits.jsonl"))
      assert(lines.size() <= 1, s"commit log not rotated: ${lines.size()} lines")
      assert(log.toDF.count() == 10L) // nothing lost
      assert(log.checkIntegrity().count() == 0L)
    } finally log.close()
    // rotation must not break recovery
    val reopened = new EventLog(ParquetLogBackend.open(spark, dir))
    try {
      assert(reopened.version == 10L)
      assert(reopened.append(ev(11)).version == 11L)
    } finally reopened.close()
  }

  test("subscription: appends publish high-watermark versions") {
    withLog { (name, log) =>
      val sub = log.subscribe()
      log.append(ev(1))
      assert(sub.poll(2000).contains(1L), name)
      log.append(ev(2))
      assert(sub.poll(2000).contains(2L), name)
      sub.close()
    }
  }
}
