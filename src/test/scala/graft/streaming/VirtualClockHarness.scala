package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, TestGroupState}

import scala.collection.mutable

/** Virtual-clock driver for `keyedProcess`-style functions — the Spark
  * analog of the reference's keyed-operator test harness with a manual
  * TimeService (flink-streaming-java KeyedOneInputStreamOperatorTestHarness
  * + TestProcessingTimeService), built on Spark's public
  * [[TestGroupState]].
  *
  * Why it exists: a real streaming query only fires processing-time timers
  * when a micro-batch runs, and `processAllAvailable` never runs one after
  * the sources drain — so TTL eviction is untestable end-to-end with a
  * MemoryStream (NEXT.md item 10). The harness replays the exact
  * GroupState contract instead: per-key state, per-key timers, and the
  * documented clear-unless-reset timeout semantics, under a clock the test
  * advances explicitly.
  *
  * With `EventTimeTimeout` the virtual clock is the WATERMARK: use
  * [[advanceWatermarkTo]] (the analog of the reference harness's
  * processWatermark) and timers fire against it, mirroring
  * flink-cep's within-pruning on watermark advance.
  */
final class VirtualClockHarness[K, I, S, O](
    timeoutConf: GroupStateTimeout,
    fn: (K, Iterator[I], GroupState[S]) => Iterator[O]) {

  private val eventTime = timeoutConf == GroupStateTimeout.EventTimeTimeout()

  private var clockMs = 0L
  private val states = mutable.LinkedHashMap.empty[K, S]
  private val timers = mutable.LinkedHashMap.empty[K, Long]

  def now: Long = clockMs
  def stateOf(k: K): Option[S] = states.get(k)
  def timerOf(k: K): Option[Long] = timers.get(k)
  def activeKeys: Seq[K] = states.keys.toSeq

  private def invoke(k: K, it: Iterator[I], timedOut: Boolean): Seq[O] = {
    val st = TestGroupState.create[S](
      states.get(k) match {
        case Some(s) => Optional.of(s)
        case None    => Optional.empty[S]()
      },
      timeoutConf, clockMs,
      if (eventTime) Optional.of(clockMs) else Optional.empty[Long](),
      timedOut)
    val out = fn(k, it, st).toVector
    if (st.isRemoved) { states.remove(k); timers.remove(k) }
    else {
      if (st.isUpdated) states(k) = st.get
      // GroupState contract: the timeout is cleared on every invocation
      // unless the function set it again during this call
      if (st.getTimeoutTimestampMs.isPresent)
        timers(k) = st.getTimeoutTimestampMs.get
      else timers.remove(k)
    }
    out
  }

  /** Deliver a batch of events for one key at the current clock. */
  def input(k: K, events: I*): Seq[O] =
    invoke(k, events.iterator, timedOut = false)

  /** Advance the clock; fire (in key insertion order) every timer that is
    * now due, invoking `fn` with an empty iterator and hasTimedOut=true —
    * what a micro-batch at `toMs` would do. Returns all timeout outputs. */
  def advanceTo(toMs: Long): Seq[O] = {
    require(toMs >= clockMs, "clock cannot go backwards")
    clockMs = toMs
    val due = timers.collect { case (k, t) if t <= clockMs => k }.toSeq
    due.flatMap(k => invoke(k, Iterator.empty, timedOut = true))
  }

  /** Event-time alias for [[advanceTo]]: advance the watermark and fire
    * due event-time timers. Only meaningful under EventTimeTimeout. */
  def advanceWatermarkTo(wmMs: Long): Seq[O] = {
    require(eventTime, "advanceWatermarkTo requires EventTimeTimeout")
    advanceTo(wmMs)
  }
}
