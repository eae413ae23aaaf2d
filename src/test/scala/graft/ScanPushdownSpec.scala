package graft

import graft.core.{EventData, EventLog}
import graft.storage.ParquetLogBackend
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Plan-quality guards: the properties that keep scans fast at scale must
  * hold in the physical plan, not just in intent. */
class ScanPushdownSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("scan version predicate reaches the parquet segment scan") {
    val dir = Files.createTempDirectory("graftpush").toString
    val log = new EventLog(ParquetLogBackend.create(spark, dir,
      compactThreshold = 10))
    try {
      (1 to 40).foreach(i => log.append(EventData(s"l$i", s"""{"i":$i}""")))
      val p = plan(log.scan(25L))
      // version >= 25 must appear as a parquet PushedFilters entry — this is
      // what lets the vectorized reader skip whole row groups / files via
      // min-max stats instead of decoding the full log.
      assert(p.contains("PushedFilters:") &&
        p.contains("GreaterThanOrEqual(version,25)"), p.take(2000))
    } finally log.close()
  }

  test("scan plans contain no global single-partition sort of the log") {
    val dir = Files.createTempDirectory("graftpush2").toString
    val log = new EventLog(ParquetLogBackend.create(spark, dir,
      compactThreshold = 10))
    try {
      (1 to 40).foreach(i => log.append(EventData(s"l$i", s"""{"i":$i}""")))
      // version_next derivation must be arithmetic (dense versions), never a
      // window over the whole log
      val p = plan(log.scan(1L))
      assert(!p.contains("Window"), p.take(2000))
    } finally log.close()
  }

  test("tryAppendMulti retries through version races") {
    val log = new EventLog(
      new graft.storage.InMemoryBackend(spark))
    try {
      log.append(EventData("seed", """{"s":1}"""))
      val r = log.tryAppendMulti(0L, assumed => Seq(
        EventData("m1", s"""{"assumed":$assumed}"""),
        EventData("m2", s"""{"assumed":$assumed}""")))
      assert(r.versionFirst == 2L && r.version == 3L)
    } finally log.close()
  }
}
