package graft.streaming

import java.util.concurrent.{ArrayBlockingQueue, CopyOnWriteArrayList, TimeUnit}
import scala.jdk.CollectionConverters._

/** In-process change-feed hub ≙ reference internal/broadcast
  * (broadcast.go:19-67): publishes the latest committed version to all
  * subscribers with NON-BLOCKING sends — a slow subscriber's mailbox being
  * full means that update is dropped for it, never that the writer blocks.
  * The delivery contract is therefore at-most-once; consumers reconcile by
  * re-scanning the log from their cursor (broadcast.go:24-28).
  */
final class VersionHub {
  private val subs = new CopyOnWriteArrayList[VersionSubscription]()

  /** Fan out a new high-watermark version; never blocks. */
  def publish(version: Long): Unit =
    subs.iterator().asScala.foreach(_.offer(version))

  def subscribe(): VersionSubscription = {
    val s = new VersionSubscription(this)
    subs.add(s)
    s
  }

  private[streaming] def remove(s: VersionSubscription): Unit = subs.remove(s)

  def close(): Unit = {
    subs.iterator().asScala.foreach(_.markClosed())
    subs.clear()
  }

  def subscriberCount: Int = subs.size()
}

/** One subscriber mailbox: capacity 1, drop-newest-on-full (the exact
  * semantics of Go's `select { case ch <- v: default: }`). */
final class VersionSubscription private[streaming] (hub: VersionHub) {
  private val box = new ArrayBlockingQueue[java.lang.Long](1)
  @volatile private var closed = false

  // wakes a blocked poll on close so consumers (e.g. a WS writer thread
  // parked for the 30s ping interval) release their thread immediately;
  // versions are never negative, so the sentinel can't collide
  private val Poison = java.lang.Long.valueOf(Long.MinValue)

  private[streaming] def offer(v: Long): Unit =
    if (!closed) box.offer(v) // false (dropped) when the consumer lags

  /** Blocking poll with timeout; None on timeout or after close. */
  def poll(timeoutMs: Long): Option[Long] = {
    val v =
      if (closed) box.poll()
      else box.poll(timeoutMs, TimeUnit.MILLISECONDS)
    Option(v).filter(_ ne Poison).map(_.longValue())
  }

  def isClosed: Boolean = closed
  private[streaming] def markClosed(): Unit = {
    closed = true
    box.offer(Poison) // no-op when a real value is pending — also fine
  }

  def close(): Unit = {
    markClosed()
    hub.remove(this)
  }
}
