package graft.streaming

import graft.core.{EventData, EventLog}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured Streaming surface over a persistent log directory.
  *
  * The reference's subscription (serve.go:381-463 + broadcast.go) delivers
  * only high-watermark version numbers; consumers re-scan to catch up. The
  * Spark-native equivalent is a `readStream` over the segment directory —
  * each micro-batch is the newly compacted slice of the log — with
  * `foreachBatch` publishing the batch's max version to a [[VersionHub]].
  * Micro-batch granularity (vs per-append) is allowed by the contract:
  * notifications are at-most-once and carry only the watermark
  * (broadcast.go:24-28), so coalescing is indistinguishable to a correct
  * consumer.
  */
/** Per-label running state carried across micro-batches by [[LogStream.labelStats]]. */
final case class LabelStats(
    label: String, n: Long, lastVersion: Long, regressions: Long)

object LogStream {

  /** Streaming view of a [[graft.storage.ParquetLogBackend]] directory,
    * via the `graft` DataSource V2 ([[graft.sources.GraftDataSource]]):
    * offsets are log VERSIONS, so micro-batches are exact version ranges
    * (exactly-once across restarts), commit-log-tail events are visible
    * without waiting for a compaction, and planning never lists the
    * segment directory. */
  def readStream(spark: SparkSession, logDir: String): DataFrame =
    spark.readStream.format("graft").load(logDir)

  /** Wire a streaming log into a hub: every micro-batch publishes its max
    * version (the reference's per-append broadcast, coarsened to
    * micro-batches). Returns the query for lifecycle control. */
  def notify(
      stream: DataFrame,
      hub: VersionHub,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val row = batch.agg(max("version")).head()
        if (!row.isNullAt(0)) hub.publish(row.getLong(0))
      }
      .start()

  /** Streaming SINK: append a stream of (label, payload) rows into an
    * [[EventLog]]. Each micro-batch lands as ONE atomic multi-append — one
    * fsync, one contiguous version range, shared timestamp (the engine's
    * bulk-ingest shape, ~50x the per-event append rate). The collect is
    * inherent, not a bottleneck: the log's sequencer + fsync'd commit log
    * are a single-writer surface by design (≙ the reference server's one
    * writer goroutine), and micro-batches bound the driver memory.
    *
    * EXACTLY-ONCE: each batch commits via [[EventLog.appendMultiTxn]] tagged
    * (queryId, batchId); the tag rides the same fsync'd commit line as the
    * data, so a crashed-and-replayed micro-batch finds its recorded version
    * range and appends nothing — no duplicate versions, across restarts.
    * `queryId` defaults to the checkpoint directory, which already IS the
    * stable per-query identity; override it only if checkpoints move.
    *
    * Ordering: rows arrive in partition order, which for a multi-partition
    * source is unrelated to event order — pass `orderBy` (e.g. an event-time
    * column) to fix the within-batch version order; cross-batch order is
    * micro-batch order by construction. */
  def appendSink(
      stream: DataFrame,
      log: EventLog,
      checkpointDir: String,
      orderBy: Seq[String] = Seq.empty,
      queryId: Option[String] = None): StreamingQuery = {
    val qid = queryId.getOrElse(s"appendSink:$checkpointDir")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ordered =
          if (orderBy.isEmpty) batch
          else batch.orderBy(orderBy.map(col): _*)
        val events = ordered.select(col("label"), col("payload")).collect()
          .map(r => EventData(r.getString(0), r.getString(1))).toSeq
        if (events.nonEmpty) log.appendMultiTxn(qid, batchId, events)
        ()
      }
      .start()
  }

  /** Event-time tumbling/sliding window counts per label with a watermark —
    * the standard streaming aggregation shape (extension surface; the
    * reference has no event-time processing, SURVEY.md §2.5). `timestamp`
    * is unix seconds in the log schema. */
  def windowedCounts(
      stream: DataFrame,
      window_ : String = "10 minutes",
      slide: Option[String] = None,
      watermark: String = "30 minutes"): DataFrame = {
    val ts = stream.withColumn("event_time", timestamp_seconds(col("timestamp")))
      .withWatermark("event_time", watermark)
    val w = slide.fold(window(col("event_time"), window_))(s =>
      window(col("event_time"), window_, s))
    ts.groupBy(w.as("win"), col("label"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col("label"), col("n"))
  }

  /** Stream-static enrichment: join the event stream against a static
    * (batch) dimension on `label`. The static side is broadcast per
    * micro-batch when it fits — the standard pattern for decorating a
    * change stream with reference data without restarting the query. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String = "label"): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Running per-label statistics kept in the state store across
    * micro-batches — the custom-state shape
    * (`KeyValueGroupedDataset.flatMapGroupsWithState`) for semantics the
    * built-in windows can't express: here, total count + last-seen version
    * + count of version regressions (out-of-order arrivals) per label,
    * emitted on every update. */
  def labelStats(stream: DataFrame): Dataset[LabelStats] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream.select(col("label"), col("version"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (label: String, rows: Iterator[(String, Long)],
         state: GroupState[LabelStats]) =>
          val prev = state.getOption.getOrElse(LabelStats(label, 0L, 0L, 0L))
          var (n, last, regress) = (prev.n, prev.lastVersion, prev.regressions)
          rows.foreach { case (_, v) =>
            n += 1
            if (v < last) regress += 1
            last = math.max(last, v)
          }
          val next = LabelStats(label, n, last, regress)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** Session windows per label with an inactivity gap — stateful streaming
    * the built-in way (`session_window`), no custom state store logic. */
  def sessionCounts(
      stream: DataFrame,
      gap: String = "5 minutes",
      watermark: String = "30 minutes"): DataFrame =
    stream.withColumn("event_time", timestamp_seconds(col("timestamp")))
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap).as("sess"), col("label"))
      .agg(count(lit(1)).as("n"))
      .select(col("sess.start").as("sess_start"), col("sess.end").as("sess_end"),
        col("label"), col("n"))
}
