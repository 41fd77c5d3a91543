package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Idle-state TTL semantics (NEXT.md item 10) under the virtual clock:
  * eviction fires exactly at ttl past the last activity, activity re-arms
  * the timer, and evicted keys restart from zero. */
class TtlSpec extends SparkSuite {

  private val Ttl = 1000L

  private def harness = new VirtualClockHarness[String, Int, Long, (String, Long, Boolean)](
    GroupStateTimeout.ProcessingTimeTimeout(),
    StreamOps.ttlAggregateFn[String, Int, Long](Ttl, 0L, (a, i) => a + i))

  test("idle key evicts after ttl and emits its final aggregate") {
    val h = harness
    assert(h.input("a", 1, 2) === Seq(("a", 3L, false)))
    assert(h.timerOf("a").contains(Ttl)) // armed at now(0) + ttl
    // not yet due
    assert(h.advanceTo(Ttl - 1).isEmpty)
    assert(h.stateOf("a").contains(3L))
    // due: terminal record, state gone
    assert(h.advanceTo(Ttl) === Seq(("a", 3L, true)))
    assert(h.stateOf("a").isEmpty && h.timerOf("a").isEmpty)
  }

  test("activity re-arms the timer (sliding idle window)") {
    val h = harness
    h.input("a", 1)
    h.advanceTo(600)
    h.input("a", 10) // re-arms to 600 + ttl
    assert(h.timerOf("a").contains(600 + Ttl))
    assert(h.advanceTo(Ttl).isEmpty) // original deadline passes silently
    assert(h.advanceTo(600 + Ttl) === Seq(("a", 11L, true)))
  }

  test("keys evict independently; evicted keys restart from zero") {
    val h = harness
    h.input("a", 1)
    h.advanceTo(500)
    h.input("b", 5)
    val evicted = h.advanceTo(1400) // a due at 1000, b at 1500
    assert(evicted === Seq(("a", 1L, true)))
    assert(h.activeKeys === Seq("b"))
    // a returns after eviction: fresh accumulator
    assert(h.input("a", 7) === Seq(("a", 7L, false)))
    assert(h.advanceTo(1500) === Seq(("b", 5L, true)))
  }

  test("update-mode records flow on every data batch, eviction is terminal") {
    val h = harness
    assert(h.input("a", 1) === Seq(("a", 1L, false)))
    assert(h.input("a", 2) === Seq(("a", 3L, false)))
    assert(h.input("a", 3) === Seq(("a", 6L, false)))
    assert(h.advanceTo(Ttl) === Seq(("a", 6L, true)))
  }

  test("runningAggWithTtl runs the same core on a batch Dataset") {
    import spark.implicits._
    // batch surface: no timers fire, but the aggregate path is identical
    val out = StreamOps.runningAggWithTtl[Long, (Long, Int), Long](
      Seq((1L, 10), (1L, 20), (2L, 5)).toDS(), _._1, Ttl, 0L)((a, e) => a + e._2)
      .collect().toSet
    assert(out === Set((1L, 30L, false), (2L, 5L, false)))
  }
}
