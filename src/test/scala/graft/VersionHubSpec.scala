package graft

import graft.streaming.VersionHub
import org.scalatest.funsuite.AnyFunSuite

/** Delivery semantics ≙ reference internal/broadcast/broadcast.go:19-67. */
class VersionHubSpec extends AnyFunSuite {

  test("publish fans out to all subscribers") {
    val hub = new VersionHub
    val a = hub.subscribe()
    val b = hub.subscribe()
    hub.publish(7L)
    assert(a.poll(1000).contains(7L))
    assert(b.poll(1000).contains(7L))
    hub.close()
  }

  test("slow subscriber drops updates instead of blocking the writer") {
    val hub = new VersionHub
    val s = hub.subscribe()
    hub.publish(1L) // fills the capacity-1 mailbox
    hub.publish(2L) // dropped (select{default:} semantics)
    hub.publish(3L) // dropped
    assert(s.poll(100).contains(1L))
    assert(s.poll(100).isEmpty) // 2 and 3 were never queued
    hub.close()
  }

  test("closed subscription receives nothing; unsubscribe is immediate") {
    val hub = new VersionHub
    val s = hub.subscribe()
    s.close()
    assert(hub.subscriberCount == 0)
    hub.publish(5L)
    assert(s.poll(100).isEmpty)
  }

  test("consumers reconcile by re-scanning: watermark is enough to catch up") {
    // at-most-once contract: after a drop, the NEXT delivered watermark
    // covers everything missed (versions are dense).
    val hub = new VersionHub
    val s = hub.subscribe()
    hub.publish(1L)
    hub.publish(2L) // dropped
    assert(s.poll(100).contains(1L))
    hub.publish(9L) // later watermark arrives after the consumer drained
    assert(s.poll(100).contains(9L)) // cursor 1 → re-scan (1, 9] catches up
    hub.close()
  }
}
