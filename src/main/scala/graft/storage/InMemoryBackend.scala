package graft.storage

import graft.core.EventSchema
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Volatile in-memory backend ≙ reference eventlog/inmem (inmem.go:33-50).
  * Dev/test scale: the whole log lives on the driver; `snapshot()` hands it
  * to Spark via createDataFrame. */
final class InMemoryBackend(
    spark: SparkSession,
    override val metadata: Map[String, String] = Map.empty,
    override val payloadLimit: Int = EventSchema.DefaultPayloadLimit)
    extends SequencedBackend {

  private val store = ArrayBuffer.empty[StoredEvent]

  // persist runs under the sequencer lock, but readers call snapshot()
  // from arbitrary threads (e.g. HTTP scans) — guard the buffer itself.
  // Txn tags need no storage here: the in-memory ledger in SequencedBackend
  // lives exactly as long as this volatile log does.
  override protected def persist(
      events: Seq[StoredEvent], tag: Option[CommitTag]): Unit =
    store.synchronized { store ++= events }

  override def snapshot(): DataFrame = {
    // immutable copy = snapshot isolation
    val rows = store.synchronized(store.toList).map(_.toRow)
    spark.createDataFrame(rows.asJava, EventSchema.schema)
  }

  override def close(): Unit = store.synchronized(store.clear())
}
