package graft

import graft.core.{EventData, EventLog}
import graft.storage.ParquetLogBackend
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** CLI create/check flows (the serving commands are covered by HttpApiSpec;
  * here: directory lifecycle + integrity exit paths). */
class CliSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("create then version on a fresh directory") {
    val dir = Files.createTempDirectory("graftcli").toString
    graft.cli.Main.main(Array("create", dir, "-m", "env:test"))
    val log = new EventLog(ParquetLogBackend.open(spark, dir))
    try {
      assert(log.version == 0L)
      assert(log.metadata == Map("env" -> "test"))
      log.append(EventData("e", """{"a":1}"""))
      assert(log.version == 1L)
    } finally log.close()
    // check passes on the healthy log
    graft.cli.Main.main(Array("check", dir, "--quiet"))
  }
}
