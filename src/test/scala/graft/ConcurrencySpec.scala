package graft

import graft.core.{EventData, EventLog}
import graft.storage.{InMemoryBackend, ParquetLogBackend}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** Sequencer under contention: the single-writer critical section must keep
  * the chain dense and the integrity invariants intact no matter how many
  * threads append concurrently (the reference guards this with its write
  * mutex, file.go:396-407). */
class ConcurrencySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def hammer(log: EventLog, threads: Int, perThread: Int): Unit = {
    val pool = Executors.newFixedThreadPool(threads)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(threads)
    (0 until threads).foreach { t =>
      pool.execute { () =>
        start.await()
        try (0 until perThread).foreach { i =>
          log.append(EventData(s"t${t}_$i", s"""{"t":$t,"i":$i}"""))
        } finally done.countDown()
      }
    }
    start.countDown()
    assert(done.await(120, TimeUnit.SECONDS))
    pool.shutdown()
  }

  test("64 threads x 50 appends: dense chain, zero integrity violations (inmem)") {
    val log = new EventLog(new InMemoryBackend(spark))
    try {
      hammer(log, threads = 64, perThread = 50)
      assert(log.version == 64L * 50)
      assert(log.checkIntegrity().count() == 0L)
    } finally log.close()
  }

  test("16 threads x 25 appends through fsync + concurrent compaction (parquet)") {
    val dir = Files.createTempDirectory("graftconc").toString
    val log = new EventLog(ParquetLogBackend.create(spark, dir,
      compactThreshold = 64)) // compactions interleave with appends
    try {
      hammer(log, threads = 16, perThread = 25)
      assert(log.version == 16L * 25)
      assert(log.checkIntegrity().count() == 0L)
      // every committed row present exactly once across segments + tail
      assert(log.toDF.select("version").distinct().count() == 16L * 25)
    } finally log.close()
  }

  test("concurrent OCC writers all eventually commit via tryAppend") {
    val log = new EventLog(new InMemoryBackend(spark))
    try {
      val pool = Executors.newFixedThreadPool(8)
      val done = new CountDownLatch(8)
      (0 until 8).foreach { t =>
        pool.execute { () =>
          try (0 until 10).foreach { i =>
            log.tryAppend(log.version,
              a => EventData(s"occ_t$t", s"""{"i":$i,"assumed":$a}"""),
              maxRetries = 1000)
          } finally done.countDown()
        }
      }
      assert(done.await(120, TimeUnit.SECONDS))
      pool.shutdown()
      assert(log.version == 80L)
      assert(log.checkIntegrity().count() == 0L)
    } finally log.close()
  }
}
