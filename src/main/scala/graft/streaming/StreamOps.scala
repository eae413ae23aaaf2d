package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming transforms for a continuously-ingesting training-data
  * pipeline (the streaming counterparts of the batch `queries/` operators). */
object StreamOps {

  /** Streaming exact dedup: keep the FIRST document per content hash,
    * emitting survivors immediately (append mode, no watermark hold-back).
    *
    * State is BOUNDED by the watermark: a hash's dedup state expires once
    * the watermark passes its event time + `delay`, so state size tracks
    * the ingest rate × window, not corpus history — the property that
    * makes this runnable forever at 100 TB/day, where an unbounded
    * `dropDuplicates` would grow state with every distinct document ever
    * seen. Within-delay duplicates are dropped exactly; re-occurrences
    * farther apart than `delay` re-emit (cross-window dedup is the batch
    * dedup_exact/dedup_clusters job's responsibility downstream).
    *
    * @param docs    streaming DataFrame with an event-time and a text column
    * @param tsCol   event-time column (becomes the watermark column)
    * @param textCol document text column (hashed with md5, same keeper
    *                definition as the batch dedup_exact)
    * @param delay   watermark delay, e.g. "10 minutes"
    */
  def dedupExact(
      docs: DataFrame, tsCol: String, textCol: String, delay: String): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")
}
