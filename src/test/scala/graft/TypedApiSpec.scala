package graft

import graft.core.{Event, EventData, EventLog}
import graft.storage.InMemoryBackend
import org.scalatest.funsuite.AnyFunSuite

/** Typed Dataset surface: scanTyped decodes into the Event case class with
  * the same chain semantics as the DataFrame scan. */
class TypedApiSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("snapshotAt time-travels to any historical version") {
    val log = new EventLog(new InMemoryBackend(spark))
    try {
      (1 to 5).foreach(i => log.append(EventData(s"l$i", s"""{"i": $i}""")))
      assert(log.snapshotAt(3L).count() == 3L)
      assert(log.snapshotAt(3L).agg(org.apache.spark.sql.functions.max("version"))
        .head().getLong(0) == 3L)
      assert(log.snapshotAt(5L).count() == 5L)
      intercept[graft.core.Errors.ErrInvalidVersion](log.snapshotAt(6L))
      intercept[graft.core.Errors.ErrInvalidVersion](log.snapshotAt(0L))
    } finally log.close()
  }

  test("scanTyped yields Events with derived chain links") {
    val log = new EventLog(new InMemoryBackend(spark))
    try {
      (1 to 3).foreach(i => log.append(EventData(s"l$i", s"""{"i": $i}""")))
      val evs: Seq[Event] = log.scanTyped(1L).collect().toSeq
      assert(evs.map(_.version) == Seq(1L, 2L, 3L))
      assert(evs.map(_.versionPrevious) == Seq(0L, 1L, 2L))
      assert(evs.map(_.versionNext) == Seq(2L, 3L, 0L))
      assert(evs.map(_.payloadJson) ==
        Seq("""{"i":1}""", """{"i":2}""", """{"i":3}"""))
      val rev = log.scanTyped(3L, reverse = true, limit = Some(2)).collect()
      assert(rev.map(_.version).toSeq == Seq(3L, 2L))
    } finally log.close()
  }
}
