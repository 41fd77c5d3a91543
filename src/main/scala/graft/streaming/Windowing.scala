package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom trigger + evictor windowing (reference:
  * flink-streaming-java windowing/triggers/ — CountTrigger, DeltaTrigger,
  * PurgingTrigger — and windowing/evictors/ — CountEvictor, TimeEvictor,
  * DeltaEvictor — composed over GlobalWindows by WindowOperator).
  *
  * Spark has no trigger/evictor surface (its windows are
  * watermark-driven), so this is the library re-expression over keyed
  * state, mirroring the reference's composition exactly:
  *
  *  - a [[Trigger]] decides per element whether the window FIREs (emit)
  *    and whether it purges (clear the buffer) — `PurgingTrigger(t)` ≡
  *    the same trigger with `purge = true`;
  *  - an [[Evictor]] trims the buffer just before emission
  *    (evictBefore);
  *  - the window function sees the evicted buffer in arrival order.
  *
  * The reference's two countWindow overloads are direct compositions
  * (KeyedStream.java:642,664):
  *  - `countWindow(n)` = CountTrigger(n, purge) — [[StreamOps.countWindow]]
  *    keeps that O(1)-state fast path;
  *  - `countWindow(size, slide)` = CountTrigger(slide, no purge) +
  *    CountEvictor(size) — [[countSlideWindow]].
  *
  * Scale: state per key = the retained buffer, bounded by the evictor
  * (count/time bound) for the standard compositions; keys shard across
  * the state store as with every keyed operator here.
  */
object Windowing {

  sealed trait TriggerResult
  case object Continue extends TriggerResult
  case object Fire extends TriggerResult
  case object FireAndPurge extends TriggerResult

  /** Per-element trigger decision. `count` = elements since last purge
    * (current element included); `ref` = DeltaTrigger's stored data
    * point — the element that caused the previous fire, or the window's
    * first element before any fire (DeltaTrigger.java keeps exactly this
    * reference in its ValueState). */
  trait Trigger[I] extends Serializable {
    def onElement(e: I, count: Long, ref: Option[I]): TriggerResult
  }

  object Triggers {
    /** CountTrigger.java: fire every `n` elements. `purge` = wrapped in
      * PurgingTrigger (tumbling); without it the buffer carries over
      * (sliding compositions). */
    def count[I](n: Long, purge: Boolean = true): Trigger[I] = {
      require(n > 0)
      (e: I, cnt: Long, lf: Option[I]) =>
        if (cnt % n == 0) { if (purge) FireAndPurge else Fire } else Continue
    }

    /** DeltaTrigger.java: fire when `delta(reference, current)` exceeds
      * `threshold`; the reference is the last firing element (or the
      * window's first element before any fire). */
    def delta[I](threshold: Double, deltaFn: (I, I) => Double,
        purge: Boolean = true): Trigger[I] =
      (e: I, cnt: Long, ref: Option[I]) => ref match {
        case Some(prev) if deltaFn(prev, e) > threshold =>
          if (purge) FireAndPurge else Fire
        case _ => Continue
      }

    /** ContinuousEventTimeTrigger.java: periodic EARLY firings at aligned
      * `interval` boundaries. The reference registers a chain of
      * event-time timers at `ts - ts % interval + interval`
      * (ContinuousEventTimeTrigger.java:71); element-driven keyed state
      * has no timer callbacks, so the trigger fires when the current
      * element's time reaches the first aligned boundary past the
      * reference element (the last firing element, else the window's
      * first). An event-time gap spanning several boundaries fires once —
      * the reference's intermediate timer fires would each re-emit the
      * identical buffer. */
    def continuousEventTime[I](ts: I => Long, intervalMicros: Long,
        purge: Boolean = false): Trigger[I] = {
      require(intervalMicros > 0)
      (e: I, cnt: Long, ref: Option[I]) => ref match {
        case Some(prev) =>
          val boundary =
            ts(prev) - Math.floorMod(ts(prev), intervalMicros) + intervalMicros
          if (ts(e) >= boundary) { if (purge) FireAndPurge else Fire }
          else Continue
        case None => Continue
      }
    }

    /** ContinuousProcessingTimeTrigger.java analog: the same periodic
      * firing against a PROCESSING-time attribute. Spark's keyed state has
      * no per-element wall-clock callbacks; the idiomatic mapping is an
      * ingest-time column stamped at the source (`current_timestamp()` on
      * read), which is the machine-clock reading the reference trigger
      * uses. */
    def continuousProcessingTime[I](ingestTs: I => Long,
        intervalMicros: Long, purge: Boolean = false): Trigger[I] =
      continuousEventTime(ingestTs, intervalMicros, purge)
  }

  /** Buffer trim applied before emission (Evictor.evictBefore). */
  trait Evictor[I] extends Serializable {
    def evict(buf: Seq[I]): Seq[I]
  }

  object Evictors {
    /** CountEvictor.java: keep the last `n` elements. */
    def count[I](n: Int): Evictor[I] = { buf: Seq[I] => buf.takeRight(n) }

    /** TimeEvictor.java: keep elements within `windowMicros` of the
      * buffer's max timestamp. */
    def time[I](ts: I => Long, windowMicros: Long): Evictor[I] =
      (buf: Seq[I]) =>
        if (buf.isEmpty) buf
        else { val hi = buf.map(ts).max; buf.filter(ts(_) >= hi - windowMicros) }

    /** DeltaEvictor.java: evicts when getDelta(e, last) >= threshold, i.e.
      * keeps only elements strictly below the threshold — elements exactly
      * at the threshold are evicted. */
    def delta[I](threshold: Double, deltaFn: (I, I) => Double): Evictor[I] =
      (buf: Seq[I]) =>
        if (buf.isEmpty) buf
        else { val last = buf.last; buf.filter(e => deltaFn(e, last) < threshold) }
  }

  /** GlobalWindows + trigger [+ evictor] + window function: buffers per
    * key, consults the trigger per element in arrival order, applies the
    * evictor on fire and emits `emit(key, evictedBuffer)`. Works on batch
    * Datasets identically (one pass per group, no flush at end — exactly
    * the reference: GlobalWindows never fire without a trigger). */
  /** @param retain cap on retained elements per key for non-purging
    *               triggers. The reference's evicting WindowOperator
    *               retains the FULL buffer (a documented Flink scale
    *               hazard); bounded compositions (count/time evictors)
    *               should set the cap that makes retention O(cap). */
  def triggeredWindow[K: Encoder, I, O: Encoder](
      ds: Dataset[I], key: I => K, trigger: Trigger[I],
      evictor: Option[Evictor[I]] = None,
      retain: Option[Int] = None)(
      emit: (K, Seq[I]) => O)(
      implicit stateEnc: Encoder[(Seq[I], Option[I], Long, Option[I])])
      : Dataset[O] =
    ds.groupByKey(key)
      .flatMapGroupsWithState[(Seq[I], Option[I], Long, Option[I]), O](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (k: K, it: Iterator[I],
          state: GroupState[(Seq[I], Option[I], Long, Option[I])]) =>
        var (buf, lastFired, cnt, firstElem) = state.getOption.getOrElse(
          (Seq.empty[I], Option.empty[I], 0L, Option.empty[I]))
        val out = scala.collection.mutable.ArrayBuffer.empty[O]
        it.foreach { e =>
          // the window's true first element, tracked SEPARATELY from the
          // buffer: with a retain cap, buf.head is merely the oldest
          // RETAINED element, and using it as DeltaTrigger's reference
          // silently re-based the delta after every truncation
          // (review r16)
          if (buf.isEmpty) firstElem = Some(e)
          buf = buf :+ e
          retain.foreach(r => if (buf.size > r) buf = buf.takeRight(r))
          cnt += 1
          // DeltaTrigger's reference: last firing element, else the
          // window's first element (only meaningful when e isn't it)
          val ref = lastFired.orElse(if (cnt > 1) firstElem else None)
          trigger.onElement(e, cnt, ref) match {
            case Continue => ()
            case fire =>
              val window = evictor.fold(buf)(_.evict(buf))
              out += emit(k, window)
              lastFired = Some(e)
              if (fire == FireAndPurge) {
                buf = Seq.empty; cnt = 0; firstElem = None
              }
          }
        }
        state.update((buf, lastFired, cnt, firstElem))
        out.iterator
    }

  /** The reference's sliding count window `countWindow(size, slide)`
    * (KeyedStream.java:664): emit the last `size` elements every `slide`
    * elements. Retention is capped at size+slide — the elements any
    * future window can still reference — so state stays O(size+slide)
    * per key where the reference retains everything. */
  def countSlideWindow[K: Encoder, I, O: Encoder](
      ds: Dataset[I], key: I => K, size: Int, slide: Int)(
      emit: (K, Seq[I]) => O)(
      implicit stateEnc: Encoder[(Seq[I], Option[I], Long, Option[I])])
      : Dataset[O] =
    triggeredWindow(ds, key,
      Triggers.count[I](slide, purge = false),
      Some(Evictors.count[I](size)),
      retain = Some(size + slide))(emit)
}
