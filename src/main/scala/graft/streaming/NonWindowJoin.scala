package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's NON-WINDOWED streaming outer joins — eager
  * null-padded emission with RETRACTIONS and NO watermark or time bound
  * (flink-table runtime/join/NonWindowLeftRightJoin.scala:42 and
  * NonWindowFullJoin.scala:40, over the shared NonWindowOuterJoin.scala:78
  * preservedJoin / :111 retractJoin protocol; Flink 1.6 is the release
  * that introduced them). Spark's own stream-stream outer joins are
  * watermark-bounded — they hold the null-padded row back until the
  * watermark proves no match can arrive. The reference instead emits
  * `(l, null)` IMMEDIATELY and RETRACTS it when the first matching right
  * row shows up, producing a retract stream (change-tagged rows whose
  * running multiset is the join's current result).
  *
  * Mapping: both sides are change-tagged into one keyed stream and run
  * through `flatMapGroupsWithState`; per key the state is each side's
  * distinct-row multiset (the reference's MapState[Row, cnt]). Per
  * arriving element:
  *   - its own side's count updates first (updateCurrentSide);
  *   - it joins every other-side row at that row's multiplicity;
  *   - an OUTER side with no matches null-pads itself (preservedJoin);
  *   - when the arriving side's total count crosses 0→1 the OTHER outer
  *     side's null-padded rows are retracted (first match exists now);
  *     crossing 1→0 on a retraction restores them (retractJoin — the
  *     reference's approxiRecordNumInState 0/1/2-valued test).
  *
  * Output is `(isInsert, Option[L], Option[R])`. Within one micro-batch
  * the per-key element order is not deterministic across input
  * partitions, so the emitted CHANGE SEQUENCE can differ run to run —
  * but the materialized multiset after any batch is order-invariant
  * (the same guarantee the reference's parallel channels give; its
  * ITCases assert the RetractingSink's materialized state, as do ours).
  *
  * Scale: one hash Exchange per side into the stateful operator, and
  * O(1) output buffering — a hot key holding N distinct other-side
  * rows emits its O(N) rows per arriving element LAZILY (the memory
  * ceiling is the key's state, never its output; the reference streams
  * the same expansion through its collector,
  * NonWindowOuterJoin.scala:84-101). State
  * is retained forever per the reference's default contract, with the
  * reference's StreamQueryConfig retention available as `idleTtlMs` at
  * the reference's own PER-ROW granularity: each row carries an expiry
  * stamp refreshed on its own arrival (MapState[Row, (cnt, expiry)] —
  * NonWindowJoin.scala:95-100), rows past their stamp are swept while
  * iterating the other side (after joining once more — the "clear
  * after join" order) and by the per-key idle timer, so a key kept hot
  * by one side does not retain the other side's stale rows. Expiry is
  * SILENT — no retraction of previously emitted results. Ops note:
  * pair `idleTtlMs` with a trigger interval
  * (`.trigger(Trigger.ProcessingTime(...))`) — a ProcessingTimeTimeout
  * query under the default as-fast-as-possible trigger re-triggers
  * empty micro-batches continuously to serve its timers. State is
  * PRODUCT-encoded (map columns of concrete row types): its schema is
  * visible to Spark's StateSchemaCompatibilityChecker, which raises its
  * own named error on layout change across checkpoints — the property
  * the CEP drivers need [[CepStateEnvelope]] for, at codegen'd encode
  * cost instead of per-key kryo.
  *
  * `"inner"` is also accepted — the reference's NonWindowInnerJoin,
  * the retract-correct inner join for retract-stream INPUTS (no
  * null-padding; a plain Spark join already covers append inputs).
  *
  * Deliberately NOT a batch query surface: on bounded inputs a plain
  * `df.join(..., "full_outer")` is the right plan (codegen'd SMJ/HJ —
  * measured ~2-3× faster than pushing rows through this typed stateful
  * operator and netting its change stream), so the library routes batch
  * outer joins to Spark joins and reserves this operator for the
  * streaming semantics Spark cannot express. Verified by the
  * reference's own stream JoinITCases (NonWindowJoinSpec), like every
  * streaming-only operator. */
object NonWindowJoin {

  /** Per-key two-side state: distinct row → (multiplicity, expiry).
    * The expiry stamp is the reference's PER-ROW retention granularity
    * (MapState[Row, JTuple2[cnt, expiredTime]] — NonWindowJoin.scala:
    * 95-100): refreshed when the row itself re-arrives, `-1` when
    * retention is off. Expired rows are swept lazily while iterating
    * the other side (AFTER joining once more — the reference's "clear
    * after join" order) and by the idle timer. */
  final case class SideState[L, R](lefts: Map[L, (Long, Long)],
      rights: Map[R, (Long, Long)])

  private[streaming] def outerFlags(joinType: String): (Boolean, Boolean) =
    joinType match {
      // "inner" is the reference's NonWindowInnerJoin — needed (over a
      // plain Spark join) only when the INPUTS are retract streams
      // (upstream aggregates): a retracted input row must retract its
      // previously emitted pairs. No null-padding on either side.
      case "inner"       => (false, false)
      case "left_outer"  => (true, false)
      case "right_outer" => (false, true)
      case "full_outer"  => (true, true)
      case other => throw new IllegalArgumentException(
        "join type expected (inner/left_outer/right_outer/full_outer), " +
          s"got $other")
    }

  /** `n` lazy copies of `v` — the multiplicity expansion, O(1) memory
    * (the reference streams the same expansion through its collector —
    * NonWindowOuterJoin.scala:84-101 has no per-key output buffer). */
  private def repeatIt[T](n: Long, v: T): Iterator[T] = new Iterator[T] {
    private var i = 0L
    def hasNext: Boolean = i < n
    def next(): T = { i += 1; v }
  }

  /** The per-key state-transition function — change-tagged elements
    * (exactly one side set) in, change-tagged joined rows out. Exposed
    * for harness-level conformance drives (retract-stream INPUTS, the
    * upstream-aggregate shape of the reference's
    * testLeftJoinWithRetractionInput).
    *
    * Emission is LAZY per element: a hot key whose state holds N
    * distinct other-side rows yields its O(N) output rows one at a
    * time instead of materializing them (the operator's memory ceiling
    * is the key's STATE, never its output). Protocol order holds —
    * each element's own-side count updates eagerly when the element is
    * pulled, before any of its emissions are produced — and the final
    * state write rides output-iterator exhaustion, the contract
    * Spark's FlatMapGroupsWithStateExec commits state under (its
    * CompletionIterator applies GroupState changes after the returned
    * iterator drains). */
  def joinFn[K, L, R](joinType: String):
      (K, Iterator[(Boolean, Option[L], Option[R])],
        GroupState[SideState[L, R]]) =>
        Iterator[(Boolean, Option[L], Option[R])] =
    joinFn(joinType, None)

  /** [[joinFn]] with the reference's PER-ROW idle-state retention:
    * when `idleTtlMs` is set, each row's expiry stamp refreshes on its
    * own arrival, and rows past their stamp are swept while iterating
    * the other side — AFTER joining them once more, the reference's
    * "clear after join" order (NonWindowOuterJoin.scala:92-95) — so a
    * key kept hot by one side no longer retains the other side's stale
    * rows. Pair with [[guardedFn]] carrying the same ttl: its timer
    * sweep drops only rows past their stamps. */
  def joinFn[K, L, R](joinType: String, idleTtlMs: Option[Long]):
      (K, Iterator[(Boolean, Option[L], Option[R])],
        GroupState[SideState[L, R]]) =>
        Iterator[(Boolean, Option[L], Option[R])] = {
    val (leftOuter, rightOuter) = outerFlags(joinType)
    val cleaning = idleTtlMs.isDefined
    val ttl = idleTtlMs.getOrElse(0L)
    (_: K, it: Iterator[(Boolean, Option[L], Option[R])],
        state: GroupState[SideState[L, R]]) => {
      var st = state.getOption.getOrElse(SideState[L, R](Map.empty, Map.empty))
      var lTotal = st.lefts.valuesIterator.map(_._1).sum
      var rTotal = st.rights.valuesIterator.map(_._1).sum
      val nowMs = if (cleaning) state.getCurrentProcessingTimeMs() else 0L
      val newExp = if (cleaning) nowMs + ttl else -1L
      type Out = (Boolean, Option[L], Option[R])
      val core: Iterator[Out] = it.flatMap { case (c, lo, ro) =>
        if (lo.isDefined) {
          val l = lo.get
          val old = st.lefts.get(l).map(_._1).getOrElse(0L)
          val now = if (c) old + 1 else old - 1
          st = st.copy(lefts =
            if (now <= 0) st.lefts - l
            else st.lefts.updated(l, (now, newExp)))
          lTotal += (if (c) 1L else -1L)
          val recordNum = math.min(lTotal, 2L)
          var matched = 0L
          var sweptCnt = 0L
          val swept = List.newBuilder[R]
          // snapshot: the next element is only pulled after this
          // element's iterator exhausts, but pin the map anyway
          val rights = st.rights
          val pairs: Iterator[Out] = rights.iterator.flatMap {
            case (r, (n, exp)) =>
              matched += n
              if (cleaning && nowMs >= exp) { swept += r; sweptCnt += n }
              val pre: Iterator[Out] =
                if (rightOuter && c && recordNum == 1)
                  repeatIt(n, (false, Option.empty[L], Option(r)))
                else Iterator.empty
              val post: Iterator[Out] =
                if (rightOuter && !c && recordNum == 0)
                  repeatIt(n, (true, Option.empty[L], Option(r)))
                else Iterator.empty
              pre ++ repeatIt(n, (c, Option(l), Option(r))) ++ post
          }
          // `++`'s by-name tail: `matched`/`swept` read once pairs drain
          pairs ++ {
            val ex = swept.result()
            if (ex.nonEmpty) {
              st = st.copy(rights = st.rights -- ex); rTotal -= sweptCnt
            }
            if (matched == 0 && leftOuter)
              Iterator.single((c, Option(l), Option.empty[R]))
            else Iterator.empty[Out]
          }
        } else {
          val r = ro.get
          val old = st.rights.get(r).map(_._1).getOrElse(0L)
          val now = if (c) old + 1 else old - 1
          st = st.copy(rights =
            if (now <= 0) st.rights - r
            else st.rights.updated(r, (now, newExp)))
          rTotal += (if (c) 1L else -1L)
          val recordNum = math.min(rTotal, 2L)
          var matched = 0L
          var sweptCnt = 0L
          val swept = List.newBuilder[L]
          val lefts = st.lefts
          val pairs: Iterator[Out] = lefts.iterator.flatMap {
            case (l, (n, exp)) =>
              matched += n
              if (cleaning && nowMs >= exp) { swept += l; sweptCnt += n }
              val pre: Iterator[Out] =
                if (leftOuter && c && recordNum == 1)
                  repeatIt(n, (false, Option(l), Option.empty[R]))
                else Iterator.empty
              val post: Iterator[Out] =
                if (leftOuter && !c && recordNum == 0)
                  repeatIt(n, (true, Option(l), Option.empty[R]))
                else Iterator.empty
              pre ++ repeatIt(n, (c, Option(l), Option(r))) ++ post
          }
          pairs ++ {
            val ex = swept.result()
            if (ex.nonEmpty) {
              st = st.copy(lefts = st.lefts -- ex); lTotal -= sweptCnt
            }
            if (matched == 0 && rightOuter)
              Iterator.single((c, Option.empty[L], Option(r)))
            else Iterator.empty[Out]
          }
        }
      }
      core ++ {
        // runs once per invocation, when the output drains: commit state
        if (st.lefts.isEmpty && st.rights.isEmpty) state.remove()
        else state.update(st)
        Iterator.empty[Out]
      }
    }
  }

  /** Timer-sweep for [[SideState]]: keep only rows whose expiry stamp
    * is still ahead of the firing time (`-1` stamps — written with
    * retention off — count as expired under an armed timer: the legacy
    * whole-key drop). `None` = nothing survives. */
  def sweepSideState[L, R](s: SideState[L, R],
      now: Long): Option[SideState[L, R]] = {
    val l2 = s.lefts.filter { case (_, (_, exp)) => exp > now }
    val r2 = s.rights.filter { case (_, (_, exp)) => exp > now }
    if (l2.isEmpty && r2.isEmpty) None else Some(SideState(l2, r2))
  }

  /** Timer-sweep for [[NESideState]]: like [[sweepSideState]], also
    * dropping swept rows' joinCnt entries (the reference's
    * expireOutTimeRow overload removes them in the same pass —
    * NonWindowOuterJoinWithNonEquiPredicates.scala:156-157). */
  def sweepNESideState[L, R](s: NESideState[L, R],
      now: Long): Option[NESideState[L, R]] = {
    val l2 = s.lefts.filter { case (_, (_, exp)) => exp > now }
    val r2 = s.rights.filter { case (_, (_, exp)) => exp > now }
    if (l2.isEmpty && r2.isEmpty) None
    else Some(NESideState(l2, r2,
      s.leftJoinCnt.filter { case (l, _) => l2.contains(l) },
      s.rightJoinCnt.filter { case (r, _) => r2.contains(r) }))
  }

  /** Two-side state for the NON-EQUI variant: row multisets plus, per
    * OUTER-preserved distinct row, the multiplicity of condition-matching
    * other-side rows (the reference's joinCntState —
    * NonWindowOuterJoinWithNonEquiPredicates.scala:59). */
  final case class NESideState[L, R](lefts: Map[L, (Long, Long)],
      rights: Map[R, (Long, Long)], leftJoinCnt: Map[L, Long],
      rightJoinCnt: Map[R, Long])

  /** [[joinFn]] with a residual non-equi predicate inside the OUTER join
    * condition (evaluated after the key equality, NEVER pushed as a
    * filter — the SQL outer-join contract). The first/last-match
    * transitions can no longer read the arriving side's total: each
    * preserved row tracks its own matched multiplicity (joinCnt), which
    * flips its null-padded row at 0→1 and 1→0
    * (retractJoinWithNonEquiPreds, NonWindowOuterJoinWithNonEquiPredicates
    * .scala:89). One deliberate divergence: the reference seeds a full
    * join's joinCnt from its output-row count, which also counts the
    * null-pad flips it just emitted (observable only under retract
    * INPUTS); this implementation seeds it with the matched-pair
    * multiplicity alone. */
  def joinFnNonEqui[K, L, R](joinType: String, cond: (L, R) => Boolean):
      (K, Iterator[(Boolean, Option[L], Option[R])],
        GroupState[NESideState[L, R]]) =>
        Iterator[(Boolean, Option[L], Option[R])] =
    joinFnNonEqui(joinType, cond, None)

  /** [[joinFnNonEqui]] with the reference's PER-ROW retention (see the
    * ttl overload of [[joinFn]]). One granularity choice beyond the
    * reference: the lazy in-iteration sweep also drops the swept row's
    * joinCnt entry (the reference leaves it for its timer sweep to
    * collect — expireOutTimeRow removes both together); dropping
    * eagerly leaks nothing and a re-inserted row re-seeds its count. */
  def joinFnNonEqui[K, L, R](joinType: String, cond: (L, R) => Boolean,
      idleTtlMs: Option[Long]):
      (K, Iterator[(Boolean, Option[L], Option[R])],
        GroupState[NESideState[L, R]]) =>
        Iterator[(Boolean, Option[L], Option[R])] = {
    val (leftOuter, rightOuter) = outerFlags(joinType)
    val cleaning = idleTtlMs.isDefined
    val ttl = idleTtlMs.getOrElse(0L)
    (_: K, it: Iterator[(Boolean, Option[L], Option[R])],
        state: GroupState[NESideState[L, R]]) => {
      var st = state.getOption.getOrElse(
        NESideState[L, R](Map.empty, Map.empty, Map.empty, Map.empty))
      val nowMs = if (cleaning) state.getCurrentProcessingTimeMs() else 0L
      val newExp = if (cleaning) nowMs + ttl else -1L
      type Out = (Boolean, Option[L], Option[R])
      val core: Iterator[Out] = it.flatMap { case (c, lo, ro) =>
        if (lo.isDefined) {
          val l = lo.get
          val old = st.lefts.get(l).map(_._1).getOrElse(0L)
          val now = if (c) old + 1 else old - 1
          st = st.copy(lefts =
            if (now <= 0) st.lefts - l
            else st.lefts.updated(l, (now, newExp)))
          if (!c && now <= 0) st = st.copy(leftJoinCnt = st.leftJoinCnt - l)
          var matched = 0L
          val swept = List.newBuilder[R]
          val rights = st.rights
          val pairs: Iterator[Out] = if (rightOuter) {
            // each distinct r is visited once per element, so joinCnt
            // updates accumulate locally and land in ONE state rebuild
            // (a per-row st.copy would allocate O(matching rows) states);
            // the rebuild happens in the by-name tail below, after the
            // lazy pair emission drains
            val jcNew = scala.collection.mutable.HashMap.empty[R, Long]
            val jcOld = st.rightJoinCnt
            rights.iterator.flatMap { case (r, (n, exp)) =>
              if (cleaning && nowMs >= exp) swept += r
              if (cond(l, r)) {
                val jc = jcOld.getOrElse(r, 0L)
                jcNew.update(r, if (c) jc + 1 else jc - 1)
                matched += n
                val pre: Iterator[Out] =
                  if (c && jc == 0)
                    repeatIt(n, (false, Option.empty[L], Option(r)))
                  else Iterator.empty
                val post: Iterator[Out] =
                  if (!c && jc == 1)
                    repeatIt(n, (true, Option.empty[L], Option(r)))
                  else Iterator.empty
                pre ++ repeatIt(n, (c, Option(l), Option(r))) ++ post
              } else Iterator.empty[Out]
            } ++ {
              if (jcNew.nonEmpty)
                st = st.copy(rightJoinCnt = st.rightJoinCnt ++ jcNew)
              Iterator.empty[Out]
            }
          } else rights.iterator.flatMap { case (r, (n, exp)) =>
            if (cleaning && nowMs >= exp) swept += r
            if (cond(l, r)) {
              matched += n
              repeatIt(n, (c, Option(l), Option(r)))
            } else Iterator.empty[Out]
          }
          pairs ++ {
            val ex = swept.result()
            if (ex.nonEmpty) st = st.copy(rights = st.rights -- ex,
              rightJoinCnt = st.rightJoinCnt -- ex)
            // `matched` includes rows swept in THIS pass (they joined
            // once more before expiring — the clear-after-join order),
            // whose retractions will never arrive: a preserved row
            // seeded while matches expire under it keeps an inflated
            // joinCnt, so its null-pad re-emission can stay suppressed
            // after the last live match retracts. Reference-faithful:
            // preservedJoin seeds from the same pre-expiry scan
            // (NonWindowOuterJoinWithNonEquiPredicates.scala:89 with
            // the expire sweep folded into the joined iteration) —
            // pinned by the "seeding counts rows swept in the same
            // pass" harness test. Expiry is SILENT by contract, so the
            // suppressed null-pad is the same class of staleness as
            // every other unretracted pre-expiry emission.
            if (leftOuter && c && now == 1)
              st = st.copy(leftJoinCnt = st.leftJoinCnt.updated(l, matched))
            if (matched == 0 && leftOuter)
              Iterator.single((c, Option(l), Option.empty[R]))
            else Iterator.empty[Out]
          }
        } else {
          val r = ro.get
          val old = st.rights.get(r).map(_._1).getOrElse(0L)
          val now = if (c) old + 1 else old - 1
          st = st.copy(rights =
            if (now <= 0) st.rights - r
            else st.rights.updated(r, (now, newExp)))
          if (!c && now <= 0) st = st.copy(rightJoinCnt = st.rightJoinCnt - r)
          var matched = 0L
          val swept = List.newBuilder[L]
          val lefts = st.lefts
          val pairs: Iterator[Out] = if (leftOuter) {
            val jcNew = scala.collection.mutable.HashMap.empty[L, Long]
            val jcOld = st.leftJoinCnt
            lefts.iterator.flatMap { case (l, (n, exp)) =>
              if (cleaning && nowMs >= exp) swept += l
              if (cond(l, r)) {
                val jc = jcOld.getOrElse(l, 0L)
                jcNew.update(l, if (c) jc + 1 else jc - 1)
                matched += n
                val pre: Iterator[Out] =
                  if (c && jc == 0)
                    repeatIt(n, (false, Option(l), Option.empty[R]))
                  else Iterator.empty
                val post: Iterator[Out] =
                  if (!c && jc == 1)
                    repeatIt(n, (true, Option(l), Option.empty[R]))
                  else Iterator.empty
                pre ++ repeatIt(n, (c, Option(l), Option(r))) ++ post
              } else Iterator.empty[Out]
            } ++ {
              if (jcNew.nonEmpty)
                st = st.copy(leftJoinCnt = st.leftJoinCnt ++ jcNew)
              Iterator.empty[Out]
            }
          } else lefts.iterator.flatMap { case (l, (n, exp)) =>
            if (cleaning && nowMs >= exp) swept += l
            if (cond(l, r)) {
              matched += n
              repeatIt(n, (c, Option(l), Option(r)))
            } else Iterator.empty[Out]
          }
          pairs ++ {
            val ex = swept.result()
            if (ex.nonEmpty) st = st.copy(lefts = st.lefts -- ex,
              leftJoinCnt = st.leftJoinCnt -- ex)
            // `matched` counts same-pass swept rows too — see the
            // mirrored left-arrival site for the reference-faithful
            // inflation rationale
            if (rightOuter && c && now == 1)
              st = st.copy(rightJoinCnt = st.rightJoinCnt.updated(r, matched))
            if (matched == 0 && rightOuter)
              Iterator.single((c, Option.empty[L], Option(r)))
            else Iterator.empty[Out]
          }
        }
      }
      core ++ {
        if (st.lefts.isEmpty && st.rights.isEmpty) state.remove()
        else state.update(st)
        Iterator.empty[Out]
      }
    }
  }

  /** Shared Dataset scaffolding: ONE tagging pass per side (a second
    * null-key flatMap over each source would re-scan it every
    * micro-batch). The group key is (Option[K], salt): real keys ride
    * salt 0; SQL-null keys — stateless, order-free, interaction-free —
    * are SALTED across [[NullKeySalt]] groups so a high-null-fraction
    * input doesn't serialize through one reducer, and the wrapper
    * handles any None group without ever creating state (see the class
    * doc for the PRODUCT-encoded state rationale). */
  private[streaming] val NullKeySalt = 64
  private def runJoin[K, L, R, S](left: Dataset[L], right: Dataset[R],
      lk: L => Option[K], rk: R => Option[K],
      leftOuter: Boolean, rightOuter: Boolean, idleTtlMs: Option[Long],
      fn: (Option[K], Iterator[(Boolean, Option[L], Option[R])],
        GroupState[S]) => Iterator[(Boolean, Option[L], Option[R])],
      sweep: (S, Long) => Option[S])(
      implicit tagE: Encoder[((Option[K], Int), Boolean, Option[L], Option[R])],
      kE: Encoder[(Option[K], Int)],
      outE: Encoder[(Boolean, Option[L], Option[R])],
      se: Encoder[S]): Dataset[(Boolean, Option[L], Option[R])] = {
    idleTtlMs.foreach(ttl => require(ttl > 0,
      s"idleTtlMs must be positive, got $ttl — a non-positive duration " +
        "would fail inside the running query's first stateful batch"))
    val nSalt = NullKeySalt // primitive capture: the lambdas must not
                            // close over this (non-serializable) object
    val tl = left.map { l =>
      val k = lk(l)
      val salt = if (k.isDefined) 0 else (l.hashCode & 0x7fffffff) % nSalt
      ((k, salt), true, Option(l), Option.empty[R])
    }
    val tr = right.map { r =>
      val k = rk(r)
      val salt = if (k.isDefined) 0 else (r.hashCode & 0x7fffffff) % nSalt
      ((k, salt), true, Option.empty[L], Option(r))
    }
    val timeoutConf =
      if (idleTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val g = guardedFn[K, L, R, S](leftOuter, rightOuter, idleTtlMs, fn,
      sweep)
    tl.union(tr).groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (k: (Option[K], Int),
            rows: Iterator[((Option[K], Int), Boolean, Option[L], Option[R])],
            st: GroupState[S]) =>
          g(k._1, rows.map(t => (t._2, t._3, t._4)), st))
  }

  /** The per-key wrapper [[runJoin]] installs around the transition fn:
    * the stateless None-key (SQL-null) group, idle-state retention
    * (the reference's queryConfig retention — expiry is SILENT, no
    * retraction of previously emitted results, exactly like
    * expireOutTimeRow), and the idle-timer re-arm on live keys. The
    * timer fires the PER-ROW `sweep` (the reference's expireOutTimeRow
    * loop): survivors keep their state and re-arm; an emptied key is
    * removed. Omitting `sweep` keeps the legacy whole-key drop —
    * correct only for transition fns that do not stamp rows. */
  private[streaming] def guardedFn[K, L, R, S](leftOuter: Boolean,
      rightOuter: Boolean, idleTtlMs: Option[Long],
      fn: (Option[K], Iterator[(Boolean, Option[L], Option[R])],
        GroupState[S]) => Iterator[(Boolean, Option[L], Option[R])],
      sweep: (S, Long) => Option[S] = null):
      (Option[K], Iterator[(Boolean, Option[L], Option[R])],
        GroupState[S]) => Iterator[(Boolean, Option[L], Option[R])] =
    (k, els, st) => {
      if (st.hasTimedOut) {
        if (sweep == null) st.remove()
        else {
          val now = st.getCurrentProcessingTimeMs()
          st.getOption.flatMap(sweep(_, now)) match {
            case Some(s2) =>
              st.update(s2)
              idleTtlMs.foreach(ttl => st.setTimeoutDuration(ttl))
            case None => st.remove()
          }
        }
        Iterator.empty
      } else {
        val out =
          if (k.isDefined) fn(k, els, st)
          else els.flatMap {
            case (c, Some(l), _) if leftOuter =>
              Iterator((c, Option(l), Option.empty[R]))
            case (c, _, Some(r)) if rightOuter =>
              Iterator((c, Option.empty[L], Option(r)))
            case _ => Iterator.empty
          }
        // fn emits lazily and commits its state write when its output
        // drains — so the idle-timer re-arm must ride the SAME
        // exhaustion (a by-name `++` tail evaluates after `out`,
        // including fn's own commit tail, is exhausted)
        out ++ {
          idleTtlMs.foreach(ttl =>
            if (st.exists) st.setTimeoutDuration(ttl))
          Iterator.empty[(Boolean, Option[L], Option[R])]
        }
      }
    }

  /** Dataset surface for APPEND inputs (a Spark source stream is
    * append-only; retract-stream inputs arise from upstream aggregates
    * and drive [[joinFn]] directly). Key functions return Option —
    * `None` is a SQL-null join key, which never matches anything: such
    * rows never create state and, when their side is outer-preserved,
    * surface as one immediate null-padded insert. */
  def unboundedOuterJoin[K, L, R](left: Dataset[L], right: Dataset[R],
      lk: L => Option[K], rk: R => Option[K], joinType: String,
      idleTtlMs: Option[Long] = None)(
      implicit tagE: Encoder[((Option[K], Int), Boolean, Option[L], Option[R])],
      kE: Encoder[(Option[K], Int)],
      outE: Encoder[(Boolean, Option[L], Option[R])],
      se: Encoder[SideState[L, R]]):
      Dataset[(Boolean, Option[L], Option[R])] = {
    val (leftOuter, rightOuter) = outerFlags(joinType)
    val fn = joinFn[Option[K], L, R](joinType, idleTtlMs)
    runJoin[K, L, R, SideState[L, R]](left, right, lk, rk,
      leftOuter, rightOuter, idleTtlMs, fn, sweepSideState[L, R])
  }

  /** [[unboundedOuterJoin]] with a residual non-equi predicate inside
    * the join condition (`ON a = d AND b <= h` — the `b <= h` part).
    * Null-key rows still bypass; key-matching rows that fail `cond`
    * null-pad exactly like the reference's setNullCheck outer contract. */
  def unboundedOuterJoin[K, L, R](left: Dataset[L], right: Dataset[R],
      lk: L => Option[K], rk: R => Option[K], joinType: String,
      cond: (L, R) => Boolean,
      idleTtlMs: Option[Long])(
      implicit tagE: Encoder[((Option[K], Int), Boolean, Option[L], Option[R])],
      kE: Encoder[(Option[K], Int)],
      outE: Encoder[(Boolean, Option[L], Option[R])],
      se: Encoder[NESideState[L, R]]):
      Dataset[(Boolean, Option[L], Option[R])] = {
    val (leftOuter, rightOuter) = outerFlags(joinType)
    val fn = joinFnNonEqui[Option[K], L, R](joinType, cond, idleTtlMs)
    runJoin[K, L, R, NESideState[L, R]](left, right, lk, rk,
      leftOuter, rightOuter, idleTtlMs, fn, sweepNESideState[L, R])
  }

  /** Non-equi overload with retention off (the reference's default). */
  def unboundedOuterJoin[K, L, R](left: Dataset[L], right: Dataset[R],
      lk: L => Option[K], rk: R => Option[K], joinType: String,
      cond: (L, R) => Boolean)(
      implicit tagE: Encoder[((Option[K], Int), Boolean, Option[L], Option[R])],
      kE: Encoder[(Option[K], Int)],
      outE: Encoder[(Boolean, Option[L], Option[R])],
      se: Encoder[NESideState[L, R]]):
      Dataset[(Boolean, Option[L], Option[R])] =
    unboundedOuterJoin(left, right, lk, rk, joinType, cond, None)
}
