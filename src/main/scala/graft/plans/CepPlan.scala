package graft.plans

import graft.streaming.Cep

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, Expression, GenericInternalRow, Predicate, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** CEP as a *planned* operator — the SURVEY §7.3 "revisit if CEP becomes a
  * planned operator" path, i.e. preference order (c) from the build plan:
  * custom `LogicalPlan` + `SparkStrategy` + physical `SparkPlan`, the same
  * machinery Spark uses for MATCH_RECOGNIZE-class operators it doesn't
  * have (reference: flink-cep CEPOperatorUtils builds a one-input stream
  * transformation; here the planner owns the data movement instead).
  *
  * Why plan it rather than wrap `flatMapGroups` (the library path in
  * [[graft.streaming.Cep]])?
  *  - The physical node *declares* `ClusteredDistribution(key)` +
  *    `(key, ts, tie)` child ordering; `EnsureRequirements` then inserts
  *    exactly one hash shuffle and one sort — and can elide either when an
  *    upstream operator already provides it (bucketed source, prior
  *    window), which a Dataset-level groupByKey can never do.
  *  - The NFA streams over each key run without materializing the group:
  *    memory is bounded by open partial matches (within-pruned), not by
  *    group size — the difference between OOM and not on a hot key with
  *    10^8 events.
  *  - Predicates stay Catalyst expressions, evaluated code-gen'd via
  *    `Predicate.create`, not opaque lambdas behind an encoder boundary.
  *
  * Supported subset: begin/next/followedBy + negative steps
  * (notFollowedBy/notNext before any non-head step, and TERMINAL — notNext
  * always, notFollowedBy with within, via the SAME [[Cep.NegGate]] the
  * library drivers run) + within + the full after-match matrix
  * (NoSkip/SkipPastLastEvent/SkipToFirst/SkipToLast, via the SAME
  * [[Cep.SkipQueue]] the library drivers run) — the planned twin of the
  * library NFA's non-quantified core; quantified steps stay on the
  * library path ([[GroupCepPlan]] plans quantified sub-groups).
  */
object CepPlan {

  /** Logical node. All expressions arrive resolved (built from `df.col`),
    * so the node itself is resolved on construction; `outputAttrs` is a
    * constructor field (not derived per-call) to keep exprIds stable under
    * plan transforms. `negPreds(i)` bans events before step i matches
    * (notFollowedBy; notNext when `negNextOnly(i)`). */
  final case class CepMatchPlan(
      keyExpr: Expression, tsExpr: Expression, tieExpr: Expression,
      stepNames: Seq[String], stepPreds: Seq[Expression],
      stepStrict: Seq[Boolean], negPreds: Seq[Option[Expression]],
      negNextOnly: Seq[Boolean], skip: Cep.AfterMatchSkip,
      withinMicros: Option[Long],
      negLast: Option[Expression], negLastNextOnly: Boolean,
      anchorStart: Boolean, anchorEnd: Boolean,
      outputAttrs: Seq[Attribute], child: LogicalPlan) extends UnaryNode {
    override def output: Seq[Attribute] = outputAttrs
    // the physical operator re-emits every child column per matched step,
    // so the whole child row is "referenced" — keeps ColumnPruning from
    // inserting a Project that would shift field ordinals under us
    override def references: AttributeSet = AttributeSet(child.output)
    override def producedAttributes: AttributeSet = AttributeSet(outputAttrs)
    override protected def withNewChildInternal(newChild: LogicalPlan) =
      copy(child = newChild)
  }

  /** Planner rule: one-to-one translation, child planned by Spark. */
  object CepStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case p: CepMatchPlan =>
        CepExec(p.keyExpr, p.tsExpr, p.tieExpr, p.stepNames, p.stepPreds,
          p.stepStrict, p.negPreds, p.negNextOnly, p.skip, p.withinMicros,
          p.negLast, p.negLastNextOnly, p.anchorStart, p.anchorEnd,
          p.outputAttrs, planLater(p.child)) :: Nil
      case _ => Nil
    }
  }

  /** Physical operator. Declares distribution + ordering requirements and
    * runs the shared NFA ([[Cep.advance]]) over each sorted key run. */
  /** `anchorStart`/`anchorEnd` are the SQL:2016 ^/$ partition anchors as
    * NFA-level gates (batch + NoSkip + no terminal negation — enforced by
    * [[matchPattern]]): start = the head predicate additionally requires
    * arrival ordinal 0 (the per-key-run EventId counter the operator
    * already allocates), end = completed matches pend in a one-event
    * buffer that any LATER event in the run discards, so only matches
    * ending on the run's final row survive to the end-of-run flush.
    * Both are O(1) state — no boundary-flag window pass over the input. */
  final case class CepExec(
      keyExpr: Expression, tsExpr: Expression, tieExpr: Expression,
      stepNames: Seq[String], stepPreds: Seq[Expression],
      stepStrict: Seq[Boolean], negPreds: Seq[Option[Expression]],
      negNextOnly: Seq[Boolean], skip: Cep.AfterMatchSkip,
      withinMicros: Option[Long],
      negLast: Option[Expression], negLastNextOnly: Boolean,
      anchorStart: Boolean, anchorEnd: Boolean,
      outputAttrs: Seq[Attribute], child: SparkPlan) extends UnaryExecNode {

    override def output: Seq[Attribute] = outputAttrs
    override def producedAttributes: AttributeSet = AttributeSet(outputAttrs)
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(keyExpr)) :: Nil
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(Seq(
      SortOrder(keyExpr, Ascending), SortOrder(tsExpr, Ascending),
      SortOrder(tieExpr, Ascending)))
    override protected def withNewChildInternal(newChild: SparkPlan) =
      copy(child = newChild)

    /** Hot-key diagnostics (CEP is sequential per key, so one viral key
      * serializes its task — same as the reference's keyed CEP operator,
      * which at least exposes backpressure metrics; these are our
      * equivalent). Each task reports ITS max, so the UI's per-task max
      * is the global hottest key; the driver-side total is a sum of
      * per-task maxes (read the max, not the sum). Mitigation for a
      * genuinely hot key is within-horizon truncation — ENGINE.md §2.11. */
    override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
      "numMatches" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of matches"),
      "maxKeyEvents" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "max events in one key run (per task)"),
      "maxKeyPartials" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext,
          "max concurrent partial matches (per task)"))

    override protected def doExecute(): RDD[InternalRow] = {
      val childOutput = child.output
      val nCols = childOutput.size
      val nSteps = stepNames.size
      val colTypes = childOutput.map(_.dataType)
      val (kE, tsE, tieE) = (keyExpr, tsExpr, tieExpr)
      val (names, preds, strict, within) =
        (stepNames, stepPreds, stepStrict, withinMicros)
      val (negs, negNext, skipStrat) = (negPreds, negNextOnly, skip)
      val (negL, negLNext) = (negLast, negLastNextOnly)
      val outTypes = outputAttrs.map(_.dataType).toArray
      val numMatches = longMetric("numMatches")
      val maxKeyEvents = longMetric("maxKeyEvents")
      val maxKeyPartials = longMetric("maxKeyPartials")

      child.execute().mapPartitions({ rows =>
        val keyEval = BindReferences.bindReference(kE, childOutput)
        val tsEval = BindReferences.bindReference(tsE, childOutput)
        val bound = preds.map { p =>
          val bp = Predicate.create(p, childOutput); bp.initialize(0); bp
        }
        val negBound = negs.map(_.map { p =>
          val bp = Predicate.create(p, childOutput); bp.initialize(0); bp
        })
        val negLastBound = negL.map { p =>
          val bp = Predicate.create(p, childOutput); bp.initialize(0); bp
        }
        // The NFA runs over ARRIVAL-TAGGED rows — (row, per-key-run
        // ordinal) — the reference's SharedBuffer EventId identity
        // (sharedbuffer/EventId.java), so two value-identical rows at one
        // timestamp are distinct computation states. Events arrive sorted
        // per key run, so a local counter (reset per key) suffices — no
        // state, unlike the streaming driver's cross-batch counter.
        type T = (InternalRow, Long)
        val (aStart, aEnd) = (anchorStart, anchorEnd)
        // ^ anchor: a match may only OPEN on the run's first row — the
        // arrival ordinal the NFA rows already carry makes this a pure
        // predicate conjunct, no extra operator state
        var pat = Cep.Pattern.begin[T](names.head)(w =>
          (!aStart || w._2 == 0L) && bound.head.eval(w._1))
        for (i <- 1 until nSteps) {
          negBound(i).foreach { nb =>
            pat = if (negNext(i)) pat.notNext(s"!${names(i)}")(w => nb.eval(w._1))
                  else pat.notFollowedBy(s"!${names(i)}")(w => nb.eval(w._1))
          }
          pat = if (strict(i)) pat.next(names(i))(w => bound(i).eval(w._1))
                else pat.followedBy(names(i))(w => bound(i).eval(w._1))
        }
        // terminal negation (a ban guarding the Final transition) — run
        // by the SAME Cep.NegGate the library drivers use
        negLastBound.foreach { nb =>
          pat = if (negLNext) pat.notNext("!end")(w => nb.eval(w._1))
                else pat.notFollowedBy("!end")(w => nb.eval(w._1))
        }
        within.foreach(w => pat = pat.within(w))
        val pattern = pat
        val nameVec = names.toVector
        val tsOf: T => Long =
          w => tsEval.eval(w._1).asInstanceOf[Long]
        val lastIdx = nSteps - 1
        val lastLooping = pattern.steps.last.looping
        val proj = UnsafeProjection.create(outTypes)

        new Iterator[InternalRow] {
          private val queue = new scala.collection.mutable.Queue[InternalRow]
          private var curKey: Any = null
          private var haveKey = false
          // per-key-run arrival counter (EventId allocator)
          private var arrSeq = 0L
          // per-key 1-based match ordinal in emission order
          // (MATCH_NUMBER — same semantics as the library drivers'
          // MatchCounter and GroupCepExec's matchSeq)
          private var matchSeq = 0L
          // hot-key diagnostics: task-local maxima, reported as deltas so
          // the task's metric value IS its max (driver sums task maxes)
          private var repEvents = 0L
          private var repPartials = 0L
          private def bumpEvents(v: Long): Unit =
            if (v > repEvents) { maxKeyEvents.add(v - repEvents); repEvents = v }
          private def bumpPartials(v: Long): Unit =
            if (v > repPartials) {
              maxKeyPartials.add(v - repPartials); repPartials = v
            }
          private var keyEvents = 0L
          private var partials = Vector.empty[Cep.Partial[T]]
          // deferred-emission queue (reference skip semantics); fresh per
          // key run, null on the NoSkip fast path
          private var skipQ: Cep.SkipQueue[T] = null
          // terminal-negation gate; fresh per key run, null when the
          // pattern doesn't end in a negation
          private var gate: Cep.NegGate[T] = null
          // $ anchor: matches completed at the CURRENT row pend here; a
          // later row in the same run discards them (their last event was
          // not the partition tail), the end-of-run flush emits survivors
          private var tailPend: Vector[Vector[Vector[T]]] = Vector.empty

          // a confirmed match emits now (NoSkip) or joins the skip queue
          private def feedMatch(m: Vector[Vector[T]]): Unit =
            if (skipQ == null) emit(curKey, m) else skipQ.add(Vector(m))

          // drain the skip queue with gate entries as live blockers,
          // handing skip-pruning survivors back to the gate
          private def drainQ(): Unit = if (skipQ != null) {
            if (gate == null || gate.isEmpty)
              partials = skipQ.drain(partials, m => emit(curKey, m))
            else {
              val merged = skipQ.drain(partials ++ gate.toState,
                m => emit(curKey, m))
              partials = merged.filterNot(_.negPending)
              gate.prunedTo(merged)
            }
          }

          private def emit(key: Any, groups: Vector[Vector[T]]): Unit = {
            val vals = new Array[Any](2 + nSteps * nCols)
            vals(0) = key
            matchSeq += 1
            vals(1) = matchSeq
            var s = 0
            while (s < nSteps) {
              if (groups(s).nonEmpty) {
                val r = groups(s).head._1
                var c = 0
                while (c < nCols) {
                  vals(2 + s * nCols + c) = r.get(c, colTypes(c)); c += 1
                }
              }
              s += 1
            }
            numMatches.add(1)
            queue += proj(new GenericInternalRow(vals)).copy()
          }

          /** end-of-run flush: a satisfied greedy final run completes;
            * the terminal-negation gate resolves (notFollowedBy confirms,
            * notNext never can); end of the key's input then releases
            * every deferred match (no live partial blocks any more). */
          private def flush(): Unit = {
            if (gate != null) gate.flushEnd(feedMatch)
            if (aEnd) {
              tailPend.foreach(m => feedMatch(m))
              tailPend = Vector.empty
            }
            if (lastLooping) partials.foreach { p =>
              if (p.stepIdx == lastIdx && p.runOpen &&
                p.groups.last.size >= pattern.steps(lastIdx).minReps &&
                // $ anchor: a satisfied greedy run still only counts if
                // its last TAKEN event is the run's final row
                (!aEnd || p.groups.last.lastOption.exists(_._2 == arrSeq - 1))) {
                if (skipQ == null) emit(curKey, p.groups)
                else skipQ.add(Vector(p.groups))
              }
            }
            partials = Vector.empty
            if (skipQ != null)
              skipQ.drain(Vector.empty, m => emit(curKey, m))
          }

          private def pump(): Unit = {
            while (queue.isEmpty && rows.hasNext) {
              val raw = rows.next()
              val tsVal = tsEval.eval(raw)
              // a NULL event time has no position in the stream order —
              // skip the row (unboxing would silently feed it at epoch 0,
              // corrupting matches and within-pruning)
              if (tsVal != null) {
                // copy only rows the NFA can retain: a row is stored only
                // when it opens a partial (step-0 match) or joins an
                // existing one, so with no partials open only step-0
                // matters; otherwise any step match may be stored. Rows
                // failing this still close runs / kill partials but are
                // never stored, so the reused child buffer passes through
                // uncopied.
                var retainable = bound(0).eval(raw)
                if (!retainable && partials.nonEmpty) {
                  var i = 1
                  while (!retainable && i < nSteps) {
                    if (bound(i).eval(raw)) retainable = true
                    i += 1
                  }
                }
                val row = if (retainable) raw.copy() else raw
                val k = keyEval.eval(row)
                if (!haveKey || !java.util.Objects.equals(k, curKey)) {
                  if (haveKey) flush()
                  // curKey outlives this row: detach buffer-backed values
                  // (string keys off an UNCOPIED row alias the reused
                  // child buffer)
                  curKey = k match {
                    case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
                    case other => other
                  }
                  haveKey = true
                  arrSeq = 0L
                  keyEvents = 0L
                  matchSeq = 0L
                  if (skipStrat != Cep.NoSkip)
                    skipQ = new Cep.SkipQueue[T](skipStrat, nameVec, tsOf)
                  if (pattern.terminalNot.isDefined)
                    gate = new Cep.NegGate[T](
                      pattern.terminalNot.get, pattern.terminalNotNext,
                      pattern.withinMs)
                }
                val t = tsVal.asInstanceOf[Long]
                // $ anchor: this row proves any pending match did NOT end
                // on the partition tail (fresh runs enter with the buffer
                // already empty — flush emitted the previous run's)
                if (aEnd) tailPend = Vector.empty
                val w: T = (row, arrSeq)
                arrSeq += 1
                keyEvents += 1
                bumpEvents(keyEvents)
                if (gate != null) {
                  // advanceTime: horizon-ripe entries confirm (nfb) or
                  // drop (notNext); then the event decides the rest
                  gate.onTime(t, feedMatch, (_, _) => ())
                  gate.onEvent(w, feedMatch)
                }
                val (next, matches) = Cep.advance(pattern, partials, w, t)
                partials = next
                bumpPartials(partials.size.toLong)
                if (aEnd) tailPend = matches // pend until the tail is known
                else if (gate != null) gate.add(matches, t, tsOf)
                else if (skipQ == null) matches.foreach(m => emit(curKey, m))
                else skipQ.add(matches)
                drainQ()
              }
            }
            if (queue.isEmpty && !rows.hasNext && haveKey) {
              flush(); haveKey = false
            }
          }

          override def hasNext: Boolean = { pump(); queue.nonEmpty }
          override def next(): InternalRow = { pump(); queue.dequeue() }
        }
      }, preservesPartitioning = true)
    }
  }

  /** Register the strategy on a session (idempotent). For spark-submit
    * deployments, `spark.sql.extensions=graft.plans.CepExtensions` does the
    * same via the extensions API. */
  def register(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraStrategies.contains(CepStrategy))
      exp.extraStrategies = exp.extraStrategies :+ CepStrategy
  }

  /** Build a planned CEP match over `df`.
    *
    * @param steps (name, predicate, strict) — strict=false ⇒ followedBy
    *              (relaxed contiguity); the first step's flag is ignored.
    * @param notBefore step name → (banned predicate, nextOnly): a
    *              notFollowedBy (nextOnly=false) or notNext (true)
    *              condition guarding entry into that step — the partial
    *              dies if the banned event arrives before the step
    *              matches, exactly the library DSL's
    *              `.notFollowedBy(..).followedBy(step)`. Not allowed on
    *              the head step (a pattern cannot begin with a negation).
    * @param skip after-match strategy, shared semantics with the library
    *              drivers via [[Cep.SkipQueue]].
    * @param notAtEnd TERMINAL negation — (banned predicate, nextOnly):
    *              the pattern ends in notFollowedBy (nextOnly=false,
    *              requires `withinMicros`: the match emits at the window
    *              horizon if no banned event arrived — the funnel shape
    *              "A not followed by B within w") or notNext (true: the
    *              single next event decides). Same [[Cep.NegGate]]
    *              semantics as the library drivers.
    * @return one row per match: `key`, then every child column per step as
    *         `<step>_<col>` (first event of the step's group, null where a
    *         step matched nothing).
    */
  def matchPattern(df: DataFrame, key: Column, ts: Column, tie: Column,
      steps: Seq[(String, Column, Boolean)],
      withinMicros: Option[Long] = None,
      notBefore: Map[String, (Column, Boolean)] = Map.empty,
      skip: Cep.AfterMatchSkip = Cep.NoSkip,
      notAtEnd: Option[(Column, Boolean)] = None,
      anchorStart: Boolean = false, anchorEnd: Boolean = false): DataFrame = {
    require(steps.nonEmpty, "at least one pattern step")
    require(!notBefore.contains(steps.head._1),
      "a pattern cannot begin with notFollowedBy/notNext")
    // anchors interact with deferred emission: a skip queue would consume
    // anchor-rejected candidates and a terminal-negation gate re-times
    // emission past the tail check — both reject rather than approximate
    require(!(anchorStart || anchorEnd) || skip == Cep.NoSkip,
      "^/$ anchors require the default NoSkip strategy")
    require(!anchorEnd || notAtEnd.isEmpty,
      "$ anchor cannot combine with terminal negation")
    notAtEnd.foreach { case (_, nextOnly) =>
      require(nextOnly || withinMicros.isDefined,
        "NotFollowedBy is not supported as a last part of a Pattern! " +
          "(without within)")
    }
    val unknown = notBefore.keySet -- steps.map(_._1).toSet
    require(unknown.isEmpty, s"notBefore names unknown steps: $unknown")
    val spark = df.sparkSession
    register(spark)
    val child = GraftSqlShim.analyzed(df)
    // resolve attribute names against the analyzed child up front, so the
    // node enters the analyzer already resolved (its output types depend
    // on the key expression's type)
    def resolve(c: Column): Expression =
      GraftSqlShim.expr(c).transform {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          child.output.find(_.name == u.name).getOrElse(throw new
              IllegalArgumentException(s"column ${u.name} not in ${child.output}"))
      }
    val keyE = resolve(key)
    // reject keys without value equality on the evaluated path (the
    // shared PlanKeys contract; MATCH_RECOGNIZE only ever routes a
    // single atomic PARTITION BY column here)
    PlanKeys.requireValueEqualityKey(keyE)
    // match_number = 1-based per-key match ordinal in emission order
    // (the GroupCepExec twin): MATCH_NUMBER() queries route planned
    // without the routing decision changing semantics
    val outAttrs = AttributeReference("key", keyE.dataType)() +:
      AttributeReference("match_number", LongType, nullable = false)() +:
      steps.flatMap { case (name, _, _) =>
        child.output.map(a =>
          AttributeReference(s"${name}_${a.name}", a.dataType, nullable = true)())
      }
    GraftSqlShim.ofRows(spark, CepMatchPlan(
      keyE, resolve(ts), resolve(tie),
      steps.map(_._1), steps.map(s => resolve(s._2)), steps.map(_._3),
      steps.map(s => notBefore.get(s._1).map(n => resolve(n._1))),
      steps.map(s => notBefore.get(s._1).exists(_._2)), skip,
      withinMicros, notAtEnd.map(n => resolve(n._1)),
      notAtEnd.exists(_._2), anchorStart, anchorEnd, outAttrs, child))
  }
}

/** `spark.sql.extensions` entry point for cluster deployments. */
class CepExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => CepPlan.CepStrategy)
    ext.injectPlannerStrategy(_ => GroupCepPlan.GroupCepStrategy)
  }
}
