package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-time OVER windows — one peer-correct core for all four
  * frame shapes of the reference's row-time over aggregates:
  *
  *  - `ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW`
  *    (RowTimeUnboundedRowsOver: each row accumulates then emits its own
  *    result, ties processed in arrival order)
  *  - `RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW`
  *    (RowTimeUnboundedRangeOver.processElementsWithSameTimestamp: ALL
  *    rows with the same rowtime accumulate first, then every peer emits
  *    the same result)
  *  - `ROWS BETWEEN <n> PRECEDING AND CURRENT ROW`
  *    (RowTimeBoundedRowsOver: per-row accumulate + retract the row that
  *    left the n+1 frame)
  *  - `RANGE BETWEEN <interval> PRECEDING AND CURRENT ROW`
  *    (RowTimeBoundedRangeOver.onTimer:195-231: retract rows with
  *    `ts < rowTs − range`, accumulate all same-rowtime peers, emit the
  *    shared result to each peer)
  *
  * Late-row contract, also from the reference:
  *  - unbounded frames drop a row iff its rowtime is at or below the
  *    watermark AT ARRIVAL (RowTimeUnboundedOver.processElement:117
  *    `timestamp > curWatermark` guard);
  *  - bounded frames drop a row iff its rowtime is at or below the key's
  *    last emitted rowtime (RowTimeBoundedRangeOver.processElement:125
  *    `triggeringTs > lastTriggeringTs` — `lastTriggeringTs` is the last
  *    FIRED timer, so a row older than the watermark but newer than the
  *    key's last emission is still accepted).
  *
  * Emission is watermark-driven: rows stay pending until the watermark
  * passes their rowtime, then emit in rowtime order (stable for ties =
  * arrival order, like the reference's per-timestamp JLists). Over a
  * batch Dataset the watermark is +inf and every row is final — the same
  * batch/stream unification as the rest of StreamOps.
  *
  * State per key = aggregate accumulators + the retained frame (bounded
  * frames only — O(n) / O(range · rate)) + pending rows above the
  * watermark (bounded by the watermark delay). Keyed, watermark-pruned:
  * scales horizontally like every stateful op here.
  *
  * Exercised by four verbatim OverWindowITCase ports
  * (OverWindowITCasePortSpec) driven through [[overFn]] with the test's
  * exact watermark sequence, and end-to-end over MemoryStream via the
  * StreamOps wrappers.
  */
object OverWindows {

  /** Retractable aggregate over a Double-projected column — the
    * GeneratedAggregations accumulate/retract contract
    * (AggregateUtil-generated functions in the reference). `retract` is
    * only invoked by bounded frames; non-retractable aggregates (max/min)
    * may throw there and still work on unbounded frames. */
  final case class Agg(zero: Double, add: (Double, Double) => Double,
      retract: (Double, Double) => Double) extends Serializable

  object Agg {
    val sum: Agg = Agg(0.0, _ + _, _ - _)
    val count: Agg = Agg(0.0, (a, _) => a + 1, (a, _) => a - 1)
    /** LargerThanCount-style conditional count (the ITCases' LTCNT). */
    def countIf(p: Double => Boolean): Agg = Agg(0.0,
      (a, v) => if (p(v)) a + 1 else a,
      (a, v) => if (p(v)) a - 1 else a)
    /** Unbounded-frame-only (no retraction, like the reference's
      * non-retractable max). */
    val max: Agg = Agg(Double.NegativeInfinity, math.max,
      (_, _) => throw new UnsupportedOperationException(
        "max is not retractable: bounded frames need a retractable accumulator"))
    val min: Agg = Agg(Double.PositiveInfinity, math.min,
      (_, _) => throw new UnsupportedOperationException(
        "min is not retractable: bounded frames need a retractable accumulator"))
  }

  sealed trait Frame extends Serializable
  case object UnboundedRows extends Frame
  case object UnboundedRange extends Frame
  final case class BoundedRows(precedingRows: Int) extends Frame
  final case class BoundedRange(precedingMicros: Long) extends Frame

  /** (lastTriggeringTs, accumulators, retained frame (ts, v) rows —
    * bounded frames only, pending (ts, row) above the watermark). */
  type OverState[I] = (Long, Seq[Double], Seq[(Long, Double)], Seq[(Long, I)])

  private def initState[I](aggs: Seq[Agg]): OverState[I] =
    (Long.MinValue, aggs.map(_.zero), Seq.empty, Seq.empty)

  /** The state-transition function, extracted so VirtualClockHarness can
    * drive it with an explicit watermark sequence (the conformance ports)
    * and [[eventTimeOverAgg]] can wire it into flatMapGroupsWithState. */
  def overFn[K, I](frame: Frame, aggs: Seq[Agg], ts: I => Long,
      v: I => Double): (K, Iterator[I], GroupState[OverState[I]]) =>
        Iterator[(K, I, Seq[Double])] = {
    val unbounded = frame == UnboundedRows || frame == UnboundedRange
    (k, it, state) => {
      val (lastTrig0, accs0, frame0, pending0) =
        state.getOption.getOrElse(initState[I](aggs))
      // None = batch execution (no watermark): nothing is late, all final
      val wmMs: Option[Long] =
        try Some(state.getCurrentWatermarkMs())
        catch { case _: UnsupportedOperationException => None }
      val wmUs: Long = wmMs match {
        case None => Long.MaxValue
        case Some(ms) =>
          if (ms >= Long.MaxValue / 1000L) Long.MaxValue else ms * 1000L
      }
      val accepted = it.filter { i =>
        val t = ts(i)
        wmMs.isEmpty || (if (unbounded) t > wmUs else t > lastTrig0)
      }
      val pending = pending0 ++ accepted.map(i => (ts(i), i))
      val (readyRaw, still) = pending.partition(_._1 <= wmUs)
      val ready = readyRaw.sortBy(_._1) // stable: ties keep arrival order
      val accs = accs0.toArray
      var frameRows = frame0
      var lastTrig = lastTrig0
      val out = Vector.newBuilder[(K, I, Seq[Double])]
      def accumulate(x: Double): Unit = {
        var a = 0
        while (a < accs.length) { accs(a) = aggs(a).add(accs(a), x); a += 1 }
      }
      def retractRow(x: Double): Unit = {
        var a = 0
        while (a < accs.length) { accs(a) = aggs(a).retract(accs(a), x); a += 1 }
      }
      var idx = 0
      while (idx < ready.size) {
        val t = ready(idx)._1
        var end = idx
        while (end < ready.size && ready(end)._1 == t) end += 1
        val group = ready.slice(idx, end)
        frame match {
          case UnboundedRows =>
            group.foreach { case (_, i) =>
              accumulate(v(i)); out += ((k, i, accs.toVector))
            }
          case UnboundedRange =>
            group.foreach { case (_, i) => accumulate(v(i)) }
            val snap = accs.toVector
            group.foreach { case (_, i) => out += ((k, i, snap)) }
          case BoundedRows(n) =>
            group.foreach { case (_, i) =>
              accumulate(v(i)); frameRows :+= ((t, v(i)))
              if (frameRows.size > n + 1) {
                retractRow(frameRows.head._2); frameRows = frameRows.tail
              }
              out += ((k, i, accs.toVector))
            }
          case BoundedRange(r) =>
            val (evict, keep) = frameRows.partition(_._1 < t - r)
            evict.foreach { case (_, x) => retractRow(x) }
            frameRows = keep
            group.foreach { case (_, i) =>
              accumulate(v(i)); frameRows :+= ((t, v(i)))
            }
            val snap = accs.toVector
            group.foreach { case (_, i) => out += ((k, i, snap)) }
        }
        lastTrig = t
        idx = end
      }
      state.update((lastTrig, accs.toVector, frameRows, still))
      // re-arm so the next watermark advance flushes the remaining buffer
      if (still.nonEmpty && wmMs.isDefined)
        state.setTimeoutTimestamp(wmMs.get + 1)
      out.result().iterator
    }
  }

  /** Multi-aggregate streaming OVER: `(key, row, aggregateResults)` per
    * input row, in final (rowtime) order per key. `ts` is event time in
    * epoch micros; input must carry a watermark when streaming. */
  def eventTimeOverAgg[K: Encoder, I](ds: Dataset[I], key: I => K,
      ts: I => Long, v: I => Double, frame: Frame, aggs: Seq[Agg])(
      implicit stateEnc: Encoder[OverState[I]],
      outEnc: Encoder[(K, I, Seq[Double])]): Dataset[(K, I, Seq[Double])] =
    ds.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
      overFn(frame, aggs, ts, v))
}
