package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming re-expression of the reference's DataStream /
  * streaming-Table surface (SURVEY.md §2.6, §2.11):
  *
  *  - watermarks: `assignTimestampsAndWatermarks` with bounded
  *    out-of-orderness (DataStream.java:888,
  *    BoundedOutOfOrdernessTimestampExtractor.java) → [[withEventTime]].
  *    Punctuated watermarks have no Spark analog (documented gap).
  *  - group windows TUMBLE/HOP/SESSION (windows.scala:162-468,
  *    DataStreamGroupWindowAggregate.scala:48) → [[tumble]]/[[hop]]/
  *    [[session]] column builders usable in `groupBy` on both batch and
  *    streaming frames (Spark unifies the two engines the reference keeps
  *    separate).
  *  - streaming distinct (`DataStream`-side dedup with state TTL) →
  *    [[dedup]] (dropDuplicates bounded by watermark state eviction).
  *  - interval join (KeyedStream.java:414 intervalJoin,
  *    TimeBoundedStreamJoin.scala:55) → [[intervalJoin]]: stream-stream
  *    equi-join with a time-range predicate; watermarks bound state.
  *  - keyed process function with state + timers (KeyedProcessFunction
  *    .java:52 processElement:71/onTimer:85) → [[keyedProcess]] over
  *    `flatMapGroupsWithState` (timers ≈ GroupStateTimeout).
  *  - count windows (KeyedStream.java:642 countWindow) → [[countWindow]]:
  *    no Spark primitive; emulated with a counting state buffer.
  *
  * Scale notes: all stateful ops are keyed — state lives in the
  * executor-local state store partitioned by key hash, so a 1000-executor
  * cluster shards state horizontally. Watermark-based eviction (or explicit
  * processing-time timeouts for unbounded patterns) keeps per-key state
  * bounded; nothing here buffers unboundedly.
  */
object StreamOps {

  /** Current watermark in event-time micros, or +infinity when the
    * operator runs over a batch Dataset. Batch `flatMapGroupsWithState`
    * (MapGroupsExec) has no watermark — `getCurrentWatermarkMs` throws
    * `SparkUnsupportedOperationException` — and the correct batch
    * semantics of every watermark-gated operator here is "all rows are
    * final" (the reference's batch/stream unification makes the same
    * choice: a bounded input's watermark jumps to +inf at end of input).
    * With everything final, the `pending`/`ahead` buffers are empty, so
    * the `setTimeoutTimestamp` calls (equally unsupported in batch) are
    * never reached. */
  private def watermarkMicrosOrMax(state: GroupState[_]): Long =
    try state.getCurrentWatermarkMs() * 1000L
    catch { case _: UnsupportedOperationException => Long.MaxValue }

  /** Event-time assignment with bounded out-of-orderness: the Spark
    * equivalent of `assignTimestampsAndWatermarks(new
    * BoundedOutOfOrdernessTimestampExtractor(delay))`. */
  def withEventTime(df: DataFrame, tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)

  /** Newline-delimited text over a TCP socket
    * (StreamExecutionEnvironment.socketTextStream →
    * flink-streaming-java functions/source/SocketTextStreamFunction.java:46:
    * read until delimiter, strip trailing `\r` when the delimiter is
    * `\n`). Spark's built-in socket source has the same record framing
    * (line-oriented, CRLF-tolerant); one column `value: string`. The
    * reference's `maxNumRetries` reconnect loop maps to the *query's*
    * restart policy rather than the source (a failed epoch replays from
    * the checkpoint). Exercised over loopback in SocketSpec. */
  def socketTextStream(spark: org.apache.spark.sql.SparkSession,
      hostname: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", hostname).option("port", port).load()

  /** TUMBLE window key (windows.scala Tumble DSL). */
  def tumble(ts: Column, size: String): Column = window(ts, size)

  /** HOP (sliding) window key (windows.scala Slide DSL). */
  def hop(ts: Column, size: String, slide: String): Column =
    window(ts, size, slide)

  /** SESSION window key with merge-on-gap semantics
    * (MergingWindowAssigner.java). */
  def session(ts: Column, gap: String): Column = session_window(ts, gap)

  /** Streaming distinct rows by key columns; requires a prior watermark for
    * state eviction (Flink: distinct + idle-state retention,
    * queryConfig.scala:72). */
  def dedup(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Streaming dedup with WATERMARK-BOUNDED state over arbitrary key
    * columns (dropDuplicatesWithinWatermark): unlike [[dedup]], the
    * event-time column need NOT be part of the key — fingerprint-only
    * exact dedup at ingest, with each key's state evicted once the
    * watermark passes its first-seen time plus the delay. Two copies
    * farther apart than the delay BOTH survive: that bounded-state trade
    * is what keeps streaming exact-dedup viable at 100 TB key
    * cardinality (plain [[dedup]] keys-seen state grows without bound
    * unless the event-time column is part of the key). */
  def dedupWithinWatermark(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicatesWithinWatermark(cols)

  /** Streaming incremental dedup gate — the STREAMING twin of qp15's
    * broadcast-Bloom decontamination: per-shard Bloom filters ride
    * keyed state (shard = hash of the fingerprint, so every copy of a
    * fingerprint meets the same filter — no false negatives), and each
    * arriving document is tagged maybe_seen BEFORE its fingerprint is
    * inserted. Unlike [[dedupWithinWatermark]] there is NO retention
    * horizon: a duplicate is flagged however far apart the copies
    * arrive — the bounded-memory trade is the geometry's false-positive
    * rate, not eviction. State is one fixed 128 KiB bit array per shard
    * (shards spread across executors; size the geometry to expected
    * keys ÷ shards — Udafs.BloomBits scaladoc). Within a micro-batch,
    * documents are processed in id order (deterministic: a dup pair
    * arriving in one batch flags the higher id). */
  def bloomGate(ds: Dataset[(Long, String)], shards: Int = 16)(
      implicit stateEnc: Encoder[Array[Long]],
      outEnc: Encoder[(Long, String, Boolean)])
      : Dataset[(Long, String, Boolean)] = {
    import graft.functions.Udafs
    ds.groupByKey(r => Udafs.bloomShard(r._2, shards))(Encoders.scalaInt)
      .flatMapGroupsWithState[Array[Long], (Long, String, Boolean)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(bloomGateFn)
  }

  /** The [[bloomGate]] state function — exposed so the split-invariance
    * property (PropertySpec) can drive it through the harness. */
  def bloomGateFn: (Int, Iterator[(Long, String)],
      GroupState[Array[Long]]) => Iterator[(Long, String, Boolean)] =
    (_: Int, it: Iterator[(Long, String)],
     state: GroupState[Array[Long]]) => {
      import graft.functions.Udafs
      val buf = state.getOption.getOrElse(Udafs.bloomEmpty())
      val out = it.toVector.sortBy(_._1).map { case (id, fp) =>
        val seen = Udafs.bloomContains(buf, fp)
        Udafs.bloomAdd(buf, fp)
        (id, fp, seen)
      }
      state.update(buf)
      out.iterator
    }

  /** Incremental sequence packing for a streaming ingest — the
    * stream-side complement of the batch export packing (qp17): per-key
    * running TOKEN OFFSETS that continue across micro-batches, the
    * cumulative count riding keyed state (one long per key — bounded).
    * Batch export fixes a global hash order; an unbounded ingest has no
    * final order, so each key's documents take consecutive offsets in
    * (arrival-batch, id) order — deterministic given the batch cuts,
    * and any prefix's offsets equal a batch run over that prefix in the
    * same per-key order (StreamingPipelineSpec). Input rows are
    * (key, id, n_tok); output appends the assigned tok_offset. */
  def packStream[K: Encoder](ds: Dataset[(K, Long, Long)])(
      implicit stateEnc: Encoder[Long],
      outEnc: Encoder[(K, Long, Long, Long)])
      : Dataset[(K, Long, Long, Long)] =
    ds.groupByKey(_._1).flatMapGroupsWithState[Long, (K, Long, Long, Long)](
      OutputMode.Append(), GroupStateTimeout.NoTimeout())(packStreamFn[K])

  /** The [[packStream]] state function — exposed so the split-invariance
    * property (PropertySpec) can drive it through the harness. */
  def packStreamFn[K]: (K, Iterator[(K, Long, Long)],
      GroupState[Long]) => Iterator[(K, Long, Long, Long)] =
    (k: K, it: Iterator[(K, Long, Long)], state: GroupState[Long]) => {
      var off = state.getOption.getOrElse(0L)
      val out = it.toVector.sortBy(_._2).map { case (_, id, n) =>
        val o = off; off += n; (k, id, n, o)
      }
      state.update(off)
      out.iterator
    }

  /** Streaming Top-N per key (the blink-planner TopN operator the 1.6
    * reference's streaming SQL lacks — rank-by-value with incremental
    * updates): keyed state holds the CURRENT top-n (value desc, id asc
    * tie-break), and a micro-batch emits the key's full re-stamped
    * top-n ONLY when the batch changed it (set or order) — the
    * update-stream contract a retracting sink consumes. The input is an
    * UPDATE stream keyed by id: a re-arriving id REPLACES its stored
    * value (within one micro-batch, where the iterator order is
    * partition-dependent, the max value wins — the deterministic
    * choice), so an id occupies at most ONE rank slot. State is n rows
    * per key, bounded; rows below the current n-th never enter state,
    * so an update that LOWERS an id's value can only reposition it
    * among the retained rows — a previously-discarded row is never
    * restored (the blink UpdatableTopNFunction trade). */
  def streamingTopNFn[K](n: Int): (K, Iterator[(K, Long, Double)],
      GroupState[Vector[(Double, Long)]]) =>
      Iterator[(K, Int, Long, Double)] =
    (k: K, it: Iterator[(K, Long, Double)],
     state: GroupState[Vector[(Double, Long)]]) => {
      val prev = state.getOption.getOrElse(Vector.empty)
      val batch = it.toVector.groupMapReduce(_._2)(_._3)(math.max)
      val merged = (prev.iterator.map { case (v, id) => (id, v) }.toMap
          ++ batch)
        .iterator.map { case (id, v) => (v, id) }.toVector
        .sortBy { case (v, id) => (-v, id) }
        .take(n)
      if (merged == prev) Iterator.empty
      else {
        state.update(merged)
        merged.iterator.zipWithIndex.map { case ((v, id), i) =>
          (k, i + 1, id, v)
        }
      }
    }

  /** [[streamingTopNFn]] over a (key, id, value) input. */
  def streamingTopN[K: Encoder](ds: Dataset[(K, Long, Double)], n: Int)(
      implicit stateEnc: Encoder[Vector[(Double, Long)]],
      outEnc: Encoder[(K, Int, Long, Double)])
      : Dataset[(K, Int, Long, Double)] =
    ds.groupByKey(_._1).flatMapGroupsWithState[Vector[(Double, Long)],
      (K, Int, Long, Double)](
      OutputMode.Update(), GroupStateTimeout.NoTimeout())(
      streamingTopNFn[K](n))

  /** Deterministic INJECTIVE string key of an arbitrary payload for
    * same-timestamp ordering: VALUE-based even for (nested) arrays and
    * for case classes/tuples CONTAINING arrays, whose default
    * hashCode/toString are identity-based and would reintroduce
    * run-to-run nondeterminism for binary/embedding payloads. Leaf
    * renderings escape the structural delimiters, so string-bearing
    * shapes cannot collide (Array("a,b") != Array("a","b")). */
  /** Code-point comparison for tiebreak strings — matches Spark's
    * BINARY (UTF-8 byte) string collation, so the batch window's
    * escaped-JSON `_det` ordering (TemporalSql) and this pre-order
    * crown the SAME winner even for supplementary-plane characters:
    * Java's default String order compares UTF-16 code units, where a
    * surrogate pair (U+10000+) sorts BELOW U+E000..U+FFFF — the
    * opposite of byte order (round-11 review catch). */
  private[graft] val codePointOrdering: Ordering[String] = (a, b) => {
    var i = 0; var j = 0; var r = 0
    while (r == 0 && i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      r = Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    if (r != 0) r else Integer.compare(a.length - i, b.length - j)
  }

  private def detString(v: Any): String = v match {
    case null => "\\0"
    case a: Array[_] => a.map(detString).mkString("[", ",", "]")
    case p: Product =>
      p.productIterator.map(detString).mkString("(", ",", ")")
    case other => String.valueOf(other)
      .replace("\\", "\\\\").replace(",", "\\,")
      .replace("[", "\\[").replace("]", "\\]")
      .replace("(", "\\(").replace(")", "\\)")
  }

  /** Keyed state of [[temporalJoin]]: buffered version rows (sorted by
    * ts; bounded — pruned to one at-or-before the watermark plus the
    * in-flight window) and facts awaiting the watermark. */
  case class TemporalJoinState[F, V](versions: Vector[(Long, V)],
      pending: Vector[(Long, F)])

  /** Event-time TEMPORAL JOIN (the 1.7-era TemporalRowTimeJoin the 1.6
    * reference lacks — flink-table's temporal table functions): enrich
    * each fact with the version row that was current AT THE FACT'S
    * EVENT TIME. Generalizes [[eventTimeAsofJoin]] (Double payloads,
    * one pre-tagged stream, inner-only) to arbitrary payload types, two
    * separate inputs, the left-outer Option form, and a batch
    * degradation that IS the as-of join (oracled as qj3). Versions buffer in keyed state; a fact waits until the
    * watermark passes its timestamp (after which no older-stamped
    * version can still arrive), then joins against the LATEST version
    * with ts ≤ fact.ts (same-ts versions: last arrival wins, the
    * last-write-wins convention). Versions behind the newest
    * at-or-before-watermark one are pruned — no future fact can select
    * them — so state per key is ONE current version plus the in-flight
    * window: bounded at any history length. Facts already behind the
    * watermark on arrival emit immediately against current state (the
    * deterministic late-data analog; compose with [[tagLate]] to drop
    * them instead). Emits `None` for facts preceding every version
    * (left-outer form; filter for the inner join). */
  def temporalJoinFn[K, F, V]: (K, Seq[(K, Long, F)], Seq[(K, Long, V)],
      GroupState[TemporalJoinState[F, V]]) =>
      Iterator[(K, Long, F, Option[V])] =
    (k: K, facts: Seq[(K, Long, F)], versions: Seq[(K, Long, V)],
     state: GroupState[TemporalJoinState[F, V]]) => {
      // batch execution has no watermark: treat it as +∞ — every fact
      // is ripe and the operator degrades to the batch as-of join
      val wm = try state.getCurrentWatermarkMs()
        catch { case _: UnsupportedOperationException => Long.MaxValue }
      val st = state.getOption
        .getOrElse(TemporalJoinState[F, V](Vector.empty, Vector.empty))
      // stable sort: among equal timestamps the later arrival sorts
      // later, and lookup takes the last qualifying row. ACROSS
      // micro-batches that is true arrival order; WITHIN one batch the
      // iterator order is partition-dependent, so same-ts rows of one
      // batch are pre-ordered by a deterministic payload key — the
      // resolution is then identical under any partitioning
      val incoming = versions.map(v => (v._2, v._3))
        .sortBy { case (ts, v) => (ts, detString(v)) }(
          Ordering.Tuple2(Ordering.Long, codePointOrdering))
      val vs = (st.versions ++ incoming).sortBy(_._1)
      val all = st.pending ++ facts.map(f => (f._2, f._3))
      val (ripe, wait) = all.partition(_._1 <= wm)
      def lookup(t: Long): Option[V] = {
        var res: Option[V] = None
        vs.foreach { case (ts, v) => if (ts <= t) res = Some(v) }
        res
      }
      val out = ripe.sortBy(_._1).map { case (t, f) => (k, t, f, lookup(t)) }
      val lastIdx = vs.lastIndexWhere(_._1 <= wm)
      val pruned = if (lastIdx <= 0) vs else vs.drop(lastIdx)
      if (wait.isEmpty && pruned.isEmpty) state.remove()
      else {
        state.update(TemporalJoinState(pruned, wait))
        // flush pending facts when the watermark passes the earliest
        // one, even if the key never sees data again
        if (wait.nonEmpty) state.setTimeoutTimestamp(wait.map(_._1).min)
      }
      out.iterator
    }

  /** Union row of [[temporalJoin]] (the watermark column `et` must
    * survive into the stateful operator, so it is part of the row). */
  case class TemporalEvent[K, F, V](k: K, ts: Long, fact: Option[F],
      ver: Option[V], et: java.sql.Timestamp)

  /** [[temporalJoinFn]] wired over two inputs (facts = (key, ts, fact),
    * versions = (key, ts, version); ts in epoch millis). The wrapper
    * derives the event-time watermark from the union's own ts column
    * with `delay` out-of-orderness — callers pass raw streams. On batch
    * inputs the same call degrades to the as-of join. */
  def temporalJoin[K: Encoder, F, V](facts: Dataset[(K, Long, F)],
      versions: Dataset[(K, Long, V)], delay: String = "0 milliseconds")(
      implicit stEnc: Encoder[TemporalJoinState[F, V]],
      outEnc: Encoder[(K, Long, F, Option[V])],
      tagEnc: Encoder[(K, Long, Option[F], Option[V])],
      evEnc: Encoder[TemporalEvent[K, F, V]])
      : Dataset[(K, Long, F, Option[V])] = {
    val tagged =
      facts.map(f => (f._1, f._2, Option(f._3), Option.empty[V]))
        .union(versions.map(v => (v._1, v._2, Option.empty[F],
          Option(v._3))))
    tagged.toDF("k", "ts", "fact", "ver")
      .withColumn("et", expr("timestamp_millis(ts)"))
      .withWatermark("et", delay)
      .as[TemporalEvent[K, F, V]]
      .groupByKey(_.k)
      .flatMapGroupsWithState[TemporalJoinState[F, V],
        (K, Long, F, Option[V])](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k: K, it: Iterator[TemporalEvent[K, F, V]],
         st: GroupState[TemporalJoinState[F, V]]) =>
          val buf = it.toVector
          temporalJoinFn[K, F, V](k,
            buf.flatMap(e => e.fact.map(f => (e.k, e.ts, f))),
            buf.flatMap(e => e.ver.map(v => (e.k, e.ts, v))), st)
      }
  }

  /** Interval (time-bounded) stream-stream inner join:
    * `right.ts ∈ [left.ts + lower, left.ts + upper]` on an equi-key.
    * Both inputs must carry watermarks. Mirrors
    * `a.intervalJoin(b).between(lower, upper)` (KeyedStream.java:448). */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      lower: String, upper: String): DataFrame =
    left.join(right,
      expr(s"$leftKey = $rightKey AND " +
        s"$rightTs BETWEEN $leftTs - INTERVAL $lower AND $leftTs + INTERVAL $upper"))

  /** Outer interval join (the reference's outer TimeBoundedStreamJoin /
    * windowed outer joins, which 1.6 could only express time-bounded):
    * [[intervalJoin]] with left/right/full outer semantics. Spark emits
    * the null-padded side once the watermark guarantees no match can
    * arrive — both inputs MUST carry watermarks, and the time-range
    * predicate is what bounds the join state (unbounded streaming outer
    * joins without a time bound stay impossible, same as the
    * reference). */
  def intervalJoinOuter(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      lower: String, upper: String,
      joinType: String): DataFrame = {
    require(Seq("left_outer", "right_outer", "full_outer").contains(joinType),
      s"outer join type expected, got $joinType")
    left.join(right,
      expr(s"$leftKey = $rightKey AND " +
        s"$rightTs BETWEEN $leftTs - INTERVAL $lower AND $leftTs + INTERVAL $upper"),
      joinType)
  }

  /** Keyed process function: per-key state + timeout timers, the analog of
    * `KeyedProcessFunction.processElement/onTimer`. The `fn` receives
    * (key, new events iterator, state handle) and emits zero or more
    * outputs; set a timeout on the state handle to get onTimer-style
    * callbacks (fn is invoked with an empty iterator on timeout).
    */
  def keyedProcess[K: Encoder, I, S: Encoder, O: Encoder](
      ds: Dataset[I], key: I => K,
      timeout: GroupStateTimeout = GroupStateTimeout.EventTimeTimeout(),
      mode: OutputMode = OutputMode.Append())(
      fn: (K, Iterator[I], GroupState[S]) => Iterator[O]): Dataset[O] =
    ds.groupByKey(key).flatMapGroupsWithState[S, O](mode, timeout)(fn)

  /** Two-input keyed process with SHARED per-key state (reference:
    * `a.connect(b).keyBy(...).process(CoProcessFunction)` —
    * KeyedCoProcessOperator, processElement1/processElement2 over the
    * same keyed state). Both sides are tagged into one union and
    * processed per key per micro-batch; `fn` sees the key, this batch's
    * elements from each side, and the state handle (set a timeout for
    * onTimer-style callbacks, as in [[keyedProcess]]). The reference
    * makes no cross-input ordering guarantee; here side A's batch
    * elements precede side B's within an invocation. */
  def connectProcess[K: Encoder, A, B, S: Encoder, O: Encoder](
      left: Dataset[A], right: Dataset[B], keyA: A => K, keyB: B => K,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout(),
      mode: OutputMode = OutputMode.Append())(
      fn: (K, Seq[A], Seq[B], GroupState[S]) => Iterator[O])(
      implicit tagEnc: Encoder[(Option[A], Option[B])]): Dataset[O] = {
    val tagged = left.map(a => (Option(a), Option.empty[B]))
      .union(right.map(b => (Option.empty[A], Option(b))))
    tagged
      .groupByKey((t: (Option[A], Option[B])) =>
        t._1.map(keyA).getOrElse(keyB(t._2.get)))
      .flatMapGroupsWithState[S, O](mode, timeout) {
        (k: K, it: Iterator[(Option[A], Option[B])], state: GroupState[S]) =>
          val buf = it.toVector
          fn(k, buf.flatMap(_._1), buf.flatMap(_._2), state)
      }
  }

  /** Side-output routing (OutputTag / split-select,
    * SingleOutputStreamOperator.java:409): Spark has no in-plan multi-way
    * split, so the pattern is N filtered branches of one DataFrame — with
    * a shared `persist`/upstream source the scan is shared per micro-batch
    * via exchange reuse. Tags map to disjoint-or-not predicates; rows
    * matching no predicate land under `defaultTag` if given. */
  def sideOutputs(df: DataFrame, routes: Map[String, Column],
      defaultTag: Option[String] = None): Map[String, DataFrame] = {
    val tagged = routes.map { case (tag, pred) => tag -> df.where(pred) }
    defaultTag match {
      case Some(tag) =>
        // coalesce each predicate to false: a NULL-valued predicate
        // fails its own route's filter AND !pred under three-valued
        // logic, so without the coalesce such rows vanished from every
        // branch instead of landing under defaultTag (review r16)
        val noneMatch = routes.values
          .map(p => !coalesce(p, lit(false))).reduce(_ && _)
        tagged + (tag -> df.where(noneMatch))
      case None => tagged
    }
  }

  /** ONE-PASS multi-way split for STREAMING sinks — the closest Spark
    * gets to the reference's in-plan OutputTag routing
    * (SingleOutputStreamOperator.java:409): [[sideOutputs]]' N filtered
    * branches each re-read the source when written separately, so this
    * form routes through `foreachBatch`, CACHES each micro-batch once,
    * and feeds every route's sink from the cached frame — one source
    * scan per epoch, N cheap filters, exactly the cost profile of the
    * reference's tagged side outputs. Routes see the batch and its
    * epoch for idempotent sinks ([[TxnSink.exactlyOnce]] composes). */
  def splitSinks(df: DataFrame, routes: Seq[(Column, (DataFrame, Long) => Unit)],
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = df.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        batch.persist()
        try routes.foreach { case (pred, sink) =>
          sink(batch.where(pred), epoch)
        } finally { batch.unpersist(); () }
      }
    checkpoint.foreach(w.option("checkpointLocation", _))
    w.start()
  }

  /** Dynamic-gap session windows (DynamicEventTimeSessionWindows — the
    * assigner whose gap is a function of the element, with no Spark
    * analog): each element proposes the window [ts, ts+gap) and overlapping
    * windows merge, so a session's extension horizon is max(ts_i + gap_i)
    * over ALL merged elements — not just the last one (an early event with
    * a large gap keeps the session open past later small-gap events). An
    * event at ts >= horizon starts a new session. Batch formulation (one
    * sorted scan per key); the streaming twin buffers in keyed state like
    * eventTimeRunningSum. */
  def dynamicGapSessions[K: Encoder, I](
      ds: Dataset[I], key: I => K, ts: I => Long, gapFor: I => Long)(
      implicit outEnc: Encoder[(K, Long, Long, Int)]): Dataset[(K, Long, Long, Int)] =
    ds.groupByKey(key).flatMapGroups { (k: K, it: Iterator[I]) =>
      val sorted = it.toVector.sortBy(ts)
      if (sorted.isEmpty) Iterator.empty
      else {
        val out = Vector.newBuilder[(K, Long, Long, Int)]
        var start = ts(sorted.head)
        var horizon = ts(sorted.head) + gapFor(sorted.head)
        var lastTs = ts(sorted.head)
        var n = 1
        sorted.tail.foreach { e =>
          if (ts(e) >= horizon) {
            out += ((k, start, lastTs, n))
            start = ts(e); n = 0; horizon = Long.MinValue
          }
          horizon = math.max(horizon, ts(e) + gapFor(e))
          lastTs = ts(e); n += 1
        }
        out += ((k, start, lastTs, n))
        out.result().iterator
      }
    }

  /** Streaming twin of [[dynamicGapSessions]]
    * (DynamicEventTimeSessionWindows): per key, buffer (ts, gap) pairs in
    * state and emit a session once the watermark passes its horizon
    * `max(ts_i + gap_i)` over the merged elements — beyond that point no
    * event can extend or merge into it (an extender would need
    * ts < horizon, which the watermark now excludes). Batch input
    * (watermark = +inf) emits everything — exact parity with the batch
    * operator.
    *
    * @return (key, startTs, endTs, count) per closed session
    */
  def eventTimeDynamicGapSessions[K: Encoder, I](
      ds: Dataset[I], key: I => K, ts: I => Long, gapFor: I => Long)(
      implicit stateEnc: Encoder[Seq[(Long, Long)]],
      outEnc: Encoder[(K, Long, Long, Int)]): Dataset[(K, Long, Long, Int)] =
    ds.groupByKey(key).flatMapGroupsWithState[
      Seq[(Long, Long)], (K, Long, Long, Int)](
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      (k: K, it: Iterator[I], state: GroupState[Seq[(Long, Long)]]) =>
        val buf = (state.getOption.getOrElse(Seq.empty) ++
          it.map(i => (ts(i), gapFor(i)))).sortBy(identity)
        val wm = watermarkMicrosOrMax(state)
        val out = Vector.newBuilder[(K, Long, Long, Int)]
        val keep = Vector.newBuilder[(Long, Long)]
        var cur = Vector.empty[(Long, Long)]
        var horizon = Long.MinValue // session end = max(ts + gap) so far
        def flush(): Unit =
          if (cur.nonEmpty) {
            // final iff the watermark already excludes any extender
            if (horizon <= wm)
              out += ((k, cur.head._1, cur.last._1, cur.size))
            else cur.foreach(keep += _)
            cur = Vector.empty; horizon = Long.MinValue
          }
        buf.foreach { e =>
          if (cur.nonEmpty && e._1 >= horizon) flush()
          cur = cur :+ e
          horizon = math.max(horizon, e._1 + e._2)
        }
        flush() // tail session: same watermark finality test
        val remaining = keep.result()
        // drop the key's state row entirely when nothing carries over —
        // update(empty) left one empty row per key forever (the only
        // stateful op here that did; review r16)
        if (remaining.nonEmpty) {
          state.update(remaining)
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        } else state.remove()
        out.result().iterator
    }

  /** Streaming event-time OVER aggregate (reference:
    * RowTimeUnboundedOver.scala — per-row running aggregate ordered by
    * rowtime, emitted once the watermark passes the row). Spark has no
    * streaming window functions (SURVEY.md §7.4), so this is the stateful
    * emulation: per key, buffer rows above the watermark, and on every
    * batch/timeout emit the now-final rows in event-time order with the
    * running accumulator. State per key = accumulator + not-yet-final rows
    * (bounded by the watermark delay). Input must carry a watermark.
    *
    * @param ts  event time in epoch micros
    * @return (key, tsMicros, value, runningAgg) rows in final order
    */
  def eventTimeRunningSum[K: Encoder, I](
      ds: Dataset[I], key: I => K, ts: I => Long, value: I => Double)(
      implicit stateEnc: Encoder[OverWindows.OverState[I]],
      midEnc: Encoder[(K, I, Seq[Double])],
      outEnc: Encoder[(K, Long, Double, Double)]): Dataset[(K, Long, Double, Double)] =
    OverWindows.eventTimeOverAgg(ds, key, ts, value,
        OverWindows.UnboundedRows, Seq(OverWindows.Agg.sum))
      .map { case (k, i, aggs) => (k, ts(i), value(i), aggs.head) }

  /** Streaming event-time-ordered emission (reference: DataStreamSort /
    * RowTimeSortProcessFunction — streaming sort is only legal on a time
    * attribute ascending): buffers rows above the watermark per key and
    * releases them in event-time order once final. The degenerate
    * [[eventTimeRunningSum]] without an aggregate. */
  /** [[eventTimeSorted]]'s state transition, extracted for the verbatim
    * SortITCase port (SortITCasePortSpec). Late rows — rowtime at or
    * below the key's last emitted rowtime — are dropped
    * (RowTimeSortProcessFunction.processElement `rowtime >
    * lastTriggeringTs` guard), which is what keeps the emitted stream
    * globally rowtime-sorted; ties order by `value`, the plan's
    * secondary sort field (RowTimeSortProcessFunction.onTimer
    * `Collections.sort(inputs, rowComparator)`). */
  def eventTimeSortedFn[K, I](ts: I => Long, value: I => Double):
      (K, Iterator[I], GroupState[(Long, Seq[(Long, Double)])]) =>
        Iterator[(K, Long, Double)] = { (k, it, state) =>
    val (lastTrig0, buf0) =
      state.getOption.getOrElse((Long.MinValue, Seq.empty[(Long, Double)]))
    val buf = buf0 ++ it.map(i => (ts(i), value(i))).filter(_._1 > lastTrig0)
    val wmMicros = watermarkMicrosOrMax(state)
    val (ready, pending) = buf.partition(_._1 <= wmMicros)
    val out = ready.sortBy(r => r).map { case (t0, v) => (k, t0, v) }
    state.update((out.lastOption.map(_._2).getOrElse(lastTrig0), pending))
    if (pending.nonEmpty)
      state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
    out.iterator
  }

  def eventTimeSorted[K: Encoder, I](
      ds: Dataset[I], key: I => K, ts: I => Long, value: I => Double)(
      implicit stateEnc: Encoder[(Long, Seq[(Long, Double)])],
      outEnc: Encoder[(K, Long, Double)]): Dataset[(K, Long, Double)] =
    ds.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
      eventTimeSortedFn(ts, value))

  /** Streaming bounded OVER aggregate, `ROWS <n> PRECEDING` frame
    * (reference: RowTimeBoundedRowsOver.scala — per-row aggregate over the
    * last n+1 rows in event-time order, emitted once the watermark passes).
    * State per key = pending rows above the watermark plus the last n
    * finalized values (the frame tail) — O(n + watermark-delay) bounded.
    */
  def eventTimeRowsFrameSum[K: Encoder, I](
      ds: Dataset[I], key: I => K, ts: I => Long, value: I => Double,
      precedingRows: Int)(
      implicit stateEnc: Encoder[OverWindows.OverState[I]],
      midEnc: Encoder[(K, I, Seq[Double])],
      outEnc: Encoder[(K, Long, Double, Double)]): Dataset[(K, Long, Double, Double)] = {
    require(precedingRows >= 0)
    OverWindows.eventTimeOverAgg(ds, key, ts, value,
        OverWindows.BoundedRows(precedingRows), Seq(OverWindows.Agg.sum))
      .map { case (k, i, aggs) => (k, ts(i), value(i), aggs.head) }
  }

  /** Streaming bounded OVER aggregate, `RANGE <interval> PRECEDING` frame
    * (reference: RowTimeBoundedRangeOver.scala:254 — per-row aggregate
    * over rows whose event time lies in [rowTs − range, rowTs], emitted
    * once the watermark passes the row). The time-based twin of
    * [[eventTimeRowsFrameSum]]: the retained frame tail is evicted by
    * TIMESTAMP (older than the newest finalized row's ts − range) instead
    * of by count. State per key = pending rows above the watermark + the
    * frame-tail (ts, value) pairs within the range horizon — bounded by
    * range/event-rate, exactly the reference's state contract.
    *
    * @param rangeMicros frame width in event-time micros, both ends
    *                    inclusive (SQL RANGE BETWEEN ... AND CURRENT ROW)
    * @return (key, tsMicros, value, frameSum) in final order
    */
  def eventTimeRangeFrameSum[K: Encoder, I](
      ds: Dataset[I], key: I => K, ts: I => Long, value: I => Double,
      rangeMicros: Long)(
      implicit stateEnc: Encoder[OverWindows.OverState[I]],
      midEnc: Encoder[(K, I, Seq[Double])],
      outEnc: Encoder[(K, Long, Double, Double)]): Dataset[(K, Long, Double, Double)] = {
    require(rangeMicros >= 0)
    OverWindows.eventTimeOverAgg(ds, key, ts, value,
        OverWindows.BoundedRange(rangeMicros), Seq(OverWindows.Agg.sum))
      .map { case (k, i, aggs) => (k, ts(i), value(i), aggs.head) }
  }

  /** Streaming as-of join — the streaming twin of
    * `graft.operators.AsofOps.asofJoin` (reference analog: the event-time
    * interval join with an unbounded lower bound, which the reference's
    * TimeBoundedStreamJoin cannot express without retaining infinite
    * state; the as-of reformulation CAN, because only the latest
    * watermark-covered build row matters).
    *
    * One tagged input stream (`isBuild`) carries both sides plus a
    * watermark. A probe row finalizes once the watermark passes its event
    * time — under bounded out-of-orderness every build at-or-before it has
    * then arrived — and emits the latest build at-or-before its timestamp
    * (inclusive, like the batch operator; unmatched probes drop = inner).
    * State per key = pending rows above the watermark + ONE retained
    * build (the latest at-or-below the watermark): any older build can
    * never be the answer for any future probe, so state is bounded by the
    * watermark horizon regardless of stream length.
    *
    * @return (key, probeTs, probeValue, buildTs, buildValue)
    */
  def eventTimeAsofJoin[K: Encoder, I](
      ds: Dataset[I], key: I => K, ts: I => Long, value: I => Double,
      isBuild: I => Boolean)(
      implicit stateEnc: Encoder[(Seq[(Long, Double)], Seq[(Long, Double)])],
      outEnc: Encoder[(K, Long, Double, Long, Double)]):
      Dataset[(K, Long, Double, Long, Double)] =
    ds.groupByKey(key).flatMapGroupsWithState[
      (Seq[(Long, Double)], Seq[(Long, Double)]),
      (K, Long, Double, Long, Double)](
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      (k: K, it: Iterator[I],
          state: GroupState[(Seq[(Long, Double)], Seq[(Long, Double)])]) =>
        val (builds0, probes0) = state.getOption.getOrElse((Seq.empty, Seq.empty))
        val incoming = it.toVector
        val builds = (builds0 ++ incoming.filter(isBuild(_))
          .map(i => (ts(i), value(i)))).sortBy(r => r)
        val probes = probes0 ++ incoming.filterNot(isBuild(_))
          .map(i => (ts(i), value(i)))
        val wmMicros = watermarkMicrosOrMax(state)
        val (ready, pending) = probes.partition(_._1 <= wmMicros)
        val out = ready.sortBy(r => r).flatMap { case (pt, pv) =>
          builds.takeWhile(_._1 <= pt).lastOption
            .map { case (bt, bv) => (k, pt, pv, bt, bv) }
        }
        val (covered, ahead) = builds.partition(_._1 <= wmMicros)
        state.update((covered.takeRight(1) ++ ahead, pending))
        if (pending.nonEmpty || ahead.nonEmpty)
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        out.iterator
    }

  /** Late-data side output (reference: WindowedStream.sideOutputLateData,
    * WindowedStream.java:178 — WindowOperator.java:356-434 routes
    * watermark-late rows to an OutputTag instead of silently dropping
    * them). Tags every row against the operator-observed watermark:
    * `(true, row)` = late (a downstream watermark-gated aggregate would
    * drop it), `(false, row)` = on time. Batch input has no watermark →
    * nothing is late.
    *
    * The input must carry `withWatermark` for the tag to be meaningful in
    * streaming; Spark evaluates the watermark at batch start, exactly the
    * horizon its stateful operators use for dropping. Split the result
    * with [[sideOutputLateData]]. */
  def tagLate[K: Encoder, I](ds: Dataset[I], key: I => K, ts: I => Long)(
      implicit stateEnc: Encoder[Long],
      tagEnc: Encoder[(Boolean, I)]): Dataset[(Boolean, I)] =
    ds.groupByKey(key).flatMapGroupsWithState[Long, (Boolean, I)](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: K, it: Iterator[I], state: GroupState[Long]) =>
        val wm = try state.getCurrentWatermarkMs() * 1000L
          catch { case _: UnsupportedOperationException => Long.MinValue }
        it.map(i => (ts(i) < wm, i)).toVector.iterator
    }

  /** [[tagLate]] split into (onTime, late) branches — the late rows are
    * the side output a reference job would consume from the OutputTag. */
  def sideOutputLateData[K: Encoder, I: Encoder](ds: Dataset[I], key: I => K,
      ts: I => Long)(implicit stateEnc: Encoder[Long],
      tagEnc: Encoder[(Boolean, I)]): (Dataset[I], Dataset[I]) = {
    val tagged = tagLate(ds, key, ts)
    (tagged.filter((t: (Boolean, I)) => !t._1).map(_._2),
      tagged.filter((t: (Boolean, I)) => t._1).map(_._2))
  }

  /** Idle-state TTL core (reference: StreamQueryConfig
    * .withIdleStateRetentionTime, queryConfig.scala — every stateful
    * operator evicts state for keys idle longer than the retention time):
    * a per-key running aggregate that emits updates on data and a terminal
    * `(key, acc, evicted=true)` record when the key sits idle for `ttlMs`
    * of processing time, removing its state.
    *
    * Exposed as a bare `keyedProcess`-signature function so it can be
    * driven by a virtual-clock harness (the reference tests TTL with a
    * manual TimeService test harness; Spark's analog is TestGroupState —
    * a real streaming query cannot fire processing-time timers under
    * `processAllAvailable` without new data arriving).
    *
    * Timer contract (per GroupState scaladoc): the timeout is cleared on
    * every invocation unless set again, so the function re-arms on each
    * data batch. */
  def ttlAggregateFn[K, I, A](ttlMs: Long, zero: A, add: (A, I) => A):
      (K, Iterator[I], GroupState[A]) => Iterator[(K, A, Boolean)] =
    (k: K, it: Iterator[I], state: GroupState[A]) =>
      if (state.hasTimedOut) {
        val acc = state.get
        state.remove()
        Iterator.single((k, acc, true))
      } else {
        val acc = it.foldLeft(state.getOption.getOrElse(zero))(add)
        state.update(acc)
        state.setTimeoutDuration(ttlMs)
        Iterator.single((k, acc, false))
      }

  /** [[ttlAggregateFn]] wired into a streaming/batch Dataset via
    * [[keyedProcess]] with ProcessingTimeTimeout + Update mode. */
  def runningAggWithTtl[K: Encoder, I, A: Encoder](
      ds: Dataset[I], key: I => K, ttlMs: Long, zero: A)(add: (A, I) => A)(
      implicit outEnc: Encoder[(K, A, Boolean)]): Dataset[(K, A, Boolean)] =
    keyedProcess[K, I, A, (K, A, Boolean)](ds, key,
      GroupStateTimeout.ProcessingTimeTimeout(), OutputMode.Update())(
      ttlAggregateFn(ttlMs, zero, add))

  /** Broadcast-state pattern (DataStream.broadcast(MapStateDescriptor) +
    * KeyedBroadcastProcessFunction): a control/lookup table joined into the
    * stream. In Spark the static side is broadcast into every task of each
    * micro-batch — re-read per batch when the source supports it, which is
    * the reference's "refreshable control stream" use case. */
  def broadcastJoin(stream: DataFrame, control: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(broadcast(control), keys, "left")

  /** Broadcast MAP state updated by a control STREAM (the reference's
    * full KeyedBroadcastProcessFunction contract: processBroadcastElement
    * updates a MapState replicated to every task; processElement reads
    * it). The rules map lives driver-side across micro-batches — control
    * streams are low-volume by definition (the reference replicates them
    * to every parallel instance for the same reason) — and is shipped
    * into each batch's tasks via closure broadcast. Recovery: replay the
    * control stream (rule updates are last-write-wins idempotent) or
    * snapshot [[BroadcastRules.current]] with the checkpoint. */
  final class BroadcastRules[K, R] extends Serializable {
    @volatile private var map: Map[K, R] = Map.empty
    def current: Map[K, R] = map
    private[StreamOps] def apply(updates: Seq[(K, R)]): Unit =
      synchronized { map ++= updates }
  }

  /** foreachBatch body wiring a tagged control+data union through the
    * broadcast-state pattern: control elements of the batch update
    * `rules` FIRST (reference processBroadcastElement ordering within a
    * batch is likewise unspecified vs data — we give control priority),
    * then every data element is processed DISTRIBUTED against the
    * updated map (shipped to tasks by closure broadcast; only the
    * low-volume control side ever touches the driver). Outputs of each
    * batch go to `sink` as a Dataset. Use with
    * `union.writeStream.foreachBatch(broadcastProcess(...))` where
    * `union = control.map(c => (Some(c), None)) union data.map(d =>
    * (None, Some(d)))` (the [[connectProcess]] tagging). */
  def broadcastProcess[C, D, K, R, O](
      rules: BroadcastRules[K, R],
      toRule: C => (K, R),
      process: (D, Map[K, R]) => IterableOnce[O])(
      sink: Dataset[O] => Unit)(
      implicit cEnc: Encoder[C], dEnc: Encoder[D], oEnc: Encoder[O]):
      (Dataset[(Option[C], Option[D])], Long) => Unit =
    (batch: Dataset[(Option[C], Option[D])], _: Long) => {
      val ctrl = batch.flatMap(_._1.toSeq).collect() // control side: tiny
      rules(ctrl.map(toRule).toSeq)
      val snapshot = rules.current
      sink(batch.flatMap(_._2.toSeq).flatMap(d => process(d, snapshot)))
    }

  /** Ordered async I/O (AsyncDataStream.orderedWait, AsyncDataStream
    * .java:102): per-partition pipelined lookups with up to `parallelism`
    * requests in flight, emitting results in input order. The async client
    * is created per partition via `mkClient` (e.g. an HTTP/DB handle). */
  def asyncMapOrdered[I, O: Encoder, C](ds: Dataset[I], parallelism: Int)(
      mkClient: () => C)(fn: (C, I) => O): Dataset[O] =
    ds.mapPartitions { it =>
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      import java.util.concurrent.Executors
      if (!it.hasNext) Iterator.empty
      else {
        val pool = Executors.newFixedThreadPool(parallelism)
        // The drain-to-empty path below misses early termination (limit/
        // take, task failure, an exception from fn) — tie pool shutdown to
        // task completion so no partition ever leaks its threads.
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        val client = mkClient()
        val inFlight = scala.collection.mutable.Queue.empty[Future[O]]
        def fill(): Unit =
          while (inFlight.size < parallelism && it.hasNext) {
            val elem = it.next() // pull on the caller thread — the source
            inFlight.enqueue(Future(fn(client, elem))) // iterator isn't thread-safe
          }
        fill()
        new Iterator[O] {
          def hasNext: Boolean = inFlight.nonEmpty
          def next(): O = {
            val f = inFlight.dequeue()
            fill()
            val r = Await.result(f, Duration.Inf)
            if (inFlight.isEmpty) pool.shutdown()
            r
          }
        }
      }
    }

  /** Unordered async I/O (AsyncDataStream.unorderedWait,
    * AsyncDataStream.java:147): like [[asyncMapOrdered]] but results
    * emit in COMPLETION order — lower latency when lookup latencies
    * vary (a slow request no longer head-of-line-blocks the fast ones
    * behind it), at the cost of input order within the partition. */
  def asyncMapUnordered[I, O: Encoder, C](ds: Dataset[I], parallelism: Int)(
      mkClient: () => C)(fn: (C, I) => O): Dataset[O] =
    ds.mapPartitions { it =>
      import java.util.concurrent.{ExecutorCompletionService, Executors}
      if (!it.hasNext) Iterator.empty
      else {
        val pool = Executors.newFixedThreadPool(parallelism)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
        val cs = new ExecutorCompletionService[O](pool)
        val client = mkClient()
        var inFlight = 0
        def fill(): Unit =
          while (inFlight < parallelism && it.hasNext) {
            val elem = it.next()
            cs.submit(() => fn(client, elem))
            inFlight += 1
          }
        fill()
        new Iterator[O] {
          def hasNext: Boolean = inFlight > 0
          def next(): O = {
            // first COMPLETED, not first submitted; unwrap the
            // ExecutionException so fn's own failure surfaces exactly
            // like asyncMapOrdered's rethrow (review r16)
            val r =
              try cs.take().get()
              catch {
                case e: java.util.concurrent.ExecutionException =>
                  // cancel the still-running siblings — the failure
                  // aborts the task, nothing should keep computing
                  pool.shutdownNow()
                  val c = e.getCause
                  throw (if (c != null) c else e)
              }
            inFlight -= 1
            fill()
            if (inFlight == 0) pool.shutdown()
            r
          }
        }
      }
    }

  /** Per-key tumbling COUNT window (KeyedStream.countWindow(n)): buffers a
    * running (count, aggregate) in keyed state and emits every `n`
    * elements. `zero`/`add`/`emit` define the aggregate. State is O(1) per
    * key. Works on batch Datasets too (single group pass).
    */
  def countWindow[K: Encoder, I, A: Encoder, O: Encoder](
      ds: Dataset[I], key: I => K, n: Int, zero: A)(
      add: (A, I) => A)(
      emit: (K, A) => O)(implicit tupleEnc: Encoder[(Long, A)]): Dataset[O] = {
    require(n > 0, "count window size must be positive")
    ds.groupByKey(key).flatMapGroupsWithState[(Long, A), O](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (k: K, it: Iterator[I], state: GroupState[(Long, A)]) =>
        var (cnt, acc) = state.getOption.getOrElse((0L, zero))
        val out = scala.collection.mutable.ArrayBuffer.empty[O]
        it.foreach { e =>
          cnt += 1; acc = add(acc, e)
          if (cnt == n) { out += emit(k, acc); cnt = 0; acc = zero }
        }
        state.update((cnt, acc))
        out.iterator
    }
  }

  /** Queryable state (reference: KeyedStream.asQueryableState,
    * KeyedStream.java:1004 / QueryableStateStream — a keyed stream's
    * latest value per key becomes externally queryable by key through the
    * QueryableStateClient): Spark's in-memory sink in Complete mode IS
    * that state snapshot — the streaming aggregation's result table,
    * registered under `name`, refreshed atomically per micro-batch and
    * readable by ANY thread via `spark.table(name)` while the query runs.
    *
    * `keyed` must be an aggregated (update/complete-capable) frame whose
    * first column is the key — exactly the reference's contract that
    * queryable state exposes keyed AGGREGATING state (asQueryableState
    * with a ReducingStateDescriptor).
    *
    * Returns the running query plus a `lookup(key)` client. At cluster
    * scale the same pattern swaps `format("memory")` for a key-value
    * `foreachBatch` upsert (see [[TxnSink]]); memory-sink keeps the
    * single-process contract the reference's client test harness uses.
    */
  final case class QueryableState(
      query: org.apache.spark.sql.streaming.StreamingQuery,
      spark: org.apache.spark.sql.SparkSession, name: String) {
    @volatile private var cachedEpoch: Long = Long.MinValue
    @volatile private var cached: Map[Any, org.apache.spark.sql.Row] = Map.empty
    private[streaming] var snapshotsBuilt: Int = 0 // observability for specs

    /** Point lookup by key — the QueryableStateClient.getKvState analog.
      * The epoch's result table is materialized ONCE into a driver-side
      * hash map and reused until the next micro-batch commits, so repeated
      * lookups are O(1) map probes, not per-call table scans (anything
      * that fits the memory sink fits the map; the cluster-scale swap is
      * a KV-store upsert via foreachBatch — see [[TxnSink]]). */
    def lookup(key: Any): Option[org.apache.spark.sql.Row] = {
      val epoch = Option(query.lastProgress).map(_.batchId).getOrElse(-1L)
      if (epoch != cachedEpoch) synchronized {
        if (epoch != cachedEpoch) {
          cached = spark.table(name).collect()
            .iterator.map(r => r.get(0) -> r).toMap
          snapshotsBuilt += 1
          cachedEpoch = epoch
        }
      }
      cached.get(key)
    }
  }

  def asQueryableState(keyed: DataFrame, name: String): QueryableState = {
    val q = keyed.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .start()
    QueryableState(q, keyed.sparkSession, name)
  }
}
