package graft

import graft.core.{EventData, EventLog}
import graft.storage.ParquetLogBackend
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Segment file-count hygiene: timer compaction writes one small parquet
  * file per interval, so at scale the file COUNT (not bytes) would drown
  * scan planning. coalesceSegments rewrites the directory crash-safely;
  * open() rolls back an interrupted swap.
  */
class SegmentCoalesceSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def parquetFiles(dir: String): Int = {
    val p = Paths.get(dir, "segments")
    if (!Files.exists(p)) 0
    else scala.util.Using.resource(Files.list(p))(
      _.filter(_.toString.endsWith(".parquet")).count().toInt)
  }

  test("coalesceSegments shrinks file count, preserves every event") {
    val dir = Files.createTempDirectory("graftseg").toString
    val b = ParquetLogBackend.create(spark, dir, compactIntervalMs = 0)
    val log = new EventLog(b)
    try {
      // 6 explicit compactions → 6 segment files
      (1 to 6).foreach { i =>
        (1 to 5).foreach(j => log.append(EventData("e", s"""{"i":$i,"j":$j}""")))
        b.compact()
      }
      assert(parquetFiles(dir) == 6)
      b.coalesceSegments()
      assert(parquetFiles(dir) == 1)
      assert(log.version == 30L)
      assert(log.scan(1L).count() == 30L)
      assert(log.checkIntegrity().isEmpty)
    } finally log.close()
  }

  test("open() rolls an interrupted swap back to segments.old") {
    val dir = Files.createTempDirectory("graftseg").toString
    val b = ParquetLogBackend.create(spark, dir, compactIntervalMs = 0)
    val log = new EventLog(b)
    (1 to 10).foreach(i => log.append(EventData("e", s"""{"i":$i}""")))
    b.compact()
    log.close()
    // simulate a crash mid-swap: segments moved aside, staging half-written
    Files.move(Paths.get(dir, "segments"), Paths.get(dir, "segments.old"),
      StandardCopyOption.ATOMIC_MOVE)
    Files.createDirectories(Paths.get(dir, "segments.rewrite"))
    Files.writeString(
      Paths.get(dir, "segments.rewrite", "part-junk.parquet"), "not parquet")

    val reopened = new EventLog(ParquetLogBackend.open(spark, dir))
    try {
      assert(reopened.version == 10L)
      assert(reopened.scan(1L).count() == 10L)
      assert(!Files.exists(Paths.get(dir, "segments.old")))
      assert(!Files.exists(Paths.get(dir, "segments.rewrite")))
    } finally reopened.close()
  }

  test("compact() auto-coalesces past the file-count threshold") {
    val dir = Files.createTempDirectory("graftseg").toString
    // threshold 4: the 5th single-file compaction triggers the rewrite
    val backend = ParquetLogBackend.create(spark, dir,
      compactIntervalMs = 0, maxSegmentFiles = 4)
    val log = new EventLog(backend)
    try {
      (1 to 6).foreach { i =>
        log.append(EventData("e", s"""{"i":$i}"""))
        backend.compact()
      }
      assert(parquetFiles(dir) <= 4)
      assert(log.scan(1L).count() == 6L)
    } finally log.close()
  }

  test("open() sweeps scratch dirs from crashed compactions") {
    val dir = Files.createTempDirectory("graftseg").toString
    val b = ParquetLogBackend.create(spark, dir, compactIntervalMs = 0)
    val log = new EventLog(b)
    log.append(EventData("e", """{"i":1}"""))
    log.close()
    // a compact() that died between the segment write and the atomic move
    val stranded = Paths.get(dir, "segments.write-deadbeef")
    Files.createDirectories(stranded)
    Files.writeString(stranded.resolve("part-0.parquet"), "junk")
    val reopened = ParquetLogBackend.open(spark, dir, compactIntervalMs = 0)
    try {
      assert(!Files.exists(stranded), "crashed-compaction scratch must be swept")
      assert(reopened.snapshot().count() == 1L)
    } finally reopened.close()
  }
}
