package graft.plans

import graft.streaming.GroupCep
import graft.streaming.GroupCep.GPattern

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BasePredicate, BindReferences, Expression, GenericInternalRow, Predicate, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Pattern GROUPS through the planned-operator path — the [[CepPlan]]
  * machinery (custom LogicalPlan + SparkStrategy + SparkPlan declaring
  * ClusteredDistribution + (key, ts, tie) ordering) driving the
  * [[GroupCep]] epsilon-NFA instead of the linear one (reference:
  * flink-cep GroupPattern through the same CEPOperatorUtils
  * transformation as plain patterns).
  *
  * Why the planned path matters at scale (same argument as [[CepPlan]]):
  * one Exchange + one Sort that EnsureRequirements can elide when the
  * child already provides them, sorted-run streaming instead of
  * groupByKey's full-group buffering, and leaf predicates evaluated as
  * code-gen'd Catalyst `Predicate`s rather than lambdas behind an encoder
  * boundary.
  *
  * Supported subset: leaves (followedBy/next/followedByAny), one or
  * more quantified sub-groups with times/optional/consecutive/
  * allowCombinations, `until` stop conditions on quantified groups,
  * negative elements (notFollowedBy/notNext, anywhere a sibling may
  * follow), and within — the full planned twin of the GroupCep core.
  * Round 11 adds the SQL:2016 reluctant compositions: pattern-level
  * reluctant selection (immediate or deferred), ^/$ anchor gates
  * (buffer-to-run-end, gate before preference selection), and the
  * after-match skip queue — all through [[GroupCep.GroupRunEmitter]],
  * the same object the library drivers run, so planned and library
  * routes share one source of truth for the evaluation order.
  */
object GroupCepPlan {

  /** Public pattern spec: a sequence of elements, each a leaf step, a
    * quantified sub-group, or a negative condition. `strict` ⇒ `next`
    * contiguity to the previous element, `any` ⇒ `followedByAny`; default
    * relaxed `followedBy`. The first element's contiguity flags are
    * ignored (pattern start). `GGroupSpec.until` attaches the reference's
    * stop condition: an event matching it kills every in-group branch
    * outright. `GNotSpec` is notFollowedBy (notNext when `nextOnly`) —
    * the branch dies if the banned event arrives before the following
    * element takes. */
  sealed trait GSpec
  final case class GLeafSpec(name: String, pred: Column,
      strict: Boolean = false, any: Boolean = false) extends GSpec
  final case class GGroupSpec(elems: Seq[GSpec], min: Int = 1, max: Int = 1,
      optional: Boolean = false, consecutive: Boolean = false,
      combinations: Boolean = false, strict: Boolean = false,
      any: Boolean = false, until: Option[Column] = None,
      relMark: Boolean = false) extends GSpec
  final case class GNotSpec(name: String, pred: Column,
      nextOnly: Boolean = false) extends GSpec
  /** Alternation `(b1 | b2 | ...)`: exactly one branch matches, leftmost
    * preferred under reluctant selection (round 11 — alternation joins
    * the planned twin; quantify it by wrapping in a [[GGroupSpec]]). */
  final case class GAltSpec(branches: Seq[Seq[GSpec]],
      strict: Boolean = false, any: Boolean = false) extends GSpec

  /** Serializable skeleton shipped to executors: structure only, leaf/
    * guard predicates referenced by index into the plan's expression
    * list (`untilIdx` -1 = none). */
  sealed trait Skel extends Serializable
  final case class LeafSkel(name: String, predIdx: Int, strict: Boolean,
      any: Boolean) extends Skel
  final case class GroupSkel(elems: Seq[Skel], min: Int, max: Int,
      optional: Boolean, consecutive: Boolean, combinations: Boolean,
      strict: Boolean, any: Boolean, untilIdx: Int = -1,
      relMark: Boolean = false) extends Skel
  final case class NotSkel(name: String, predIdx: Int,
      nextOnly: Boolean) extends Skel
  final case class AltSkel(branches: Seq[Seq[Skel]], strict: Boolean,
      any: Boolean) extends Skel

  /** Logical node; resolved on construction (expressions come from
    * `df.col` against the analyzed child), `outputAttrs` fixed to keep
    * exprIds stable under plan transforms. */
  final case class GroupCepMatchPlan(
      keyExpr: Expression, tsExpr: Expression, tieExpr: Expression,
      skeleton: Seq[Skel], leafPreds: Seq[Expression],
      stepNames: Seq[String], withinMicros: Option[Long],
      reluctant: Boolean, anchorHead: Boolean, anchorTail: Boolean,
      skip: graft.streaming.Cep.AfterMatchSkip, sqlGreedy: Boolean,
      allRows: Boolean,
      outputAttrs: Seq[Attribute], child: LogicalPlan) extends UnaryNode {
    override def output: Seq[Attribute] = outputAttrs
    // every child column is re-emitted per matched step — see CepMatchPlan
    override def references: AttributeSet = AttributeSet(child.output)
    override def producedAttributes: AttributeSet = AttributeSet(outputAttrs)
    override protected def withNewChildInternal(newChild: LogicalPlan) =
      copy(child = newChild)
  }

  object GroupCepStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case p: GroupCepMatchPlan =>
        GroupCepExec(p.keyExpr, p.tsExpr, p.tieExpr, p.skeleton, p.leafPreds,
          p.stepNames, p.withinMicros, p.reluctant, p.anchorHead,
          p.anchorTail, p.skip, p.sqlGreedy, p.allRows, p.outputAttrs,
          planLater(p.child)) :: Nil
      case _ => Nil
    }
  }

  /** Rebuild the GPattern from the skeleton with bound predicates — runs
    * once per partition; pattern compilation is cheap next to the scan.
    * The pattern runs over ARRIVAL-TAGGED rows (row, per-key-run ordinal)
    * — the SharedBuffer EventId identity, same as CepExec: events arrive
    * key-sorted, so a local counter suffices. */
  private def buildPattern(skel: Seq[Skel],
      bound: IndexedSeq[BasePredicate]): GPattern[(InternalRow, Long)] = {
    type T = (InternalRow, Long)
    def build(elems: Seq[Skel]): GPattern[T] = {
      var p: GPattern[T] = null
      elems.foreach {
        case l: LeafSkel =>
          val f: T => Boolean = w => bound(l.predIdx).eval(w._1)
          p = if (p == null) GPattern.begin(l.name)(f)
          else if (l.strict) p.next(l.name)(f)
          else if (l.any) p.followedByAny(l.name)(f)
          else p.followedBy(l.name)(f)
        case g: GroupSkel =>
          val sub = build(g.elems)
          p = if (p == null) GPattern.begin(sub)
          else if (g.strict) p.next(sub)
          else if (g.any) p.followedByAny(sub)
          else p.followedBy(sub)
          if (g.min != 1 || g.max != 1)
            p = if (g.min == g.max) p.times(g.min) else p.times(g.min, g.max)
          if (g.optional) p = p.optional
          if (g.consecutive) p = p.consecutive
          if (g.combinations) p = p.allowCombinations
          if (g.relMark) p = p.markReluctant
          if (g.untilIdx >= 0) {
            val f: T => Boolean = w => bound(g.untilIdx).eval(w._1)
            p = p.until(f)
          }
        case n: NotSkel =>
          val f: T => Boolean = w => bound(n.predIdx).eval(w._1)
          p = if (n.nextOnly) p.notNext(n.name)(f)
              else p.notFollowedBy(n.name)(f)
        case a: AltSkel =>
          val alts = a.branches.map(build)
          p = if (p == null) GPattern.begin(alts)
          else if (a.strict) p.next(alts)
          else if (a.any) p.followedByAny(alts)
          else p.followedBy(alts)
      }
      p
    }
    build(skel)
  }

  /** Predicate indices whose match can be CAPTURED by a branch (leaf
    * steps) — negative/until guards only kill branches, so rows matching
    * only guards never need the defensive copy in the exec's scan. */
  private def capturingIdx(skel: Seq[Skel]): Set[Int] = skel.flatMap {
    case l: LeafSkel => Seq(l.predIdx)
    case g: GroupSkel => capturingIdx(g.elems)
    case a: AltSkel => a.branches.flatMap(capturingIdx)
    case _: NotSkel => Seq.empty
  }.toSet

  /** Physical operator: shared [[GroupCep.advance]] NFA over each sorted
    * key run. Output: `key`, then per step its capture COUNT and every
    * child column of the step's first captured event (null if none). */
  final case class GroupCepExec(
      keyExpr: Expression, tsExpr: Expression, tieExpr: Expression,
      skeleton: Seq[Skel], leafPreds: Seq[Expression],
      stepNames: Seq[String], withinMicros: Option[Long],
      reluctant: Boolean, anchorHead: Boolean, anchorTail: Boolean,
      skip: graft.streaming.Cep.AfterMatchSkip, sqlGreedy: Boolean,
      allRows: Boolean,
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

    /** Hot-key diagnostics — same semantics as CepExec's: each task
      * reports ITS maxima (read the per-task max in the UI; the driver
      * total sums task maxes). Mitigation: ENGINE.md §2.11. */
    override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
      "numMatches" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of matches"),
      "maxKeyEvents" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "max events in one key run (per task)"),
      "maxKeyBranches" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext,
          "max concurrent branches (per task)"))

    override protected def doExecute(): RDD[InternalRow] = {
      val childOutput = child.output
      val nCols = childOutput.size
      val nSteps = stepNames.size
      val colTypes = childOutput.map(_.dataType)
      val (kE, tsE) = (keyExpr, tsExpr)
      val (skel, preds, names, within) =
        (skeleton, leafPreds, stepNames, withinMicros)
      val (rel, aHead, aTail, skipStrat, sqlG, aRows) =
        (reluctant, anchorHead, anchorTail, skip, sqlGreedy, allRows)
      val outTypes = outputAttrs.map(_.dataType).toArray
      val numMatches = longMetric("numMatches")
      val maxKeyEvents = longMetric("maxKeyEvents")
      val maxKeyBranches = longMetric("maxKeyBranches")

      child.execute().mapPartitions({ rows =>
        val keyEval = BindReferences.bindReference(kE, childOutput)
        val tsEval = BindReferences.bindReference(tsE, childOutput)
        val bound = preds.map { p =>
          val bp = Predicate.create(p, childOutput); bp.initialize(0); bp
        }.toIndexedSeq
        var pat = buildPattern(skel, bound)
        within.foreach(w => pat = pat.within(w))
        if (rel) pat = pat.reluctant
        if (sqlG) pat = pat.greedySelect
        // anchors need every candidate buffered to the end of the key
        // run — force DEFERRED selection so advance's in-flight
        // shortest-per-start kill stays off (the emitter gates first);
        // greedy selection is already deferred
        if ((aHead || aTail) && rel) pat = pat.deferredReluctant
        // rows are tagged with per-key arrival ordinals below — mark
        // the pattern so the dedup-skip fast path applies (see
        // Compiled.noEpsilonDup)
        val compiled = GroupCep.compile(pat.withArrivalIdentity)
        val tsOf: ((InternalRow, Long)) => Long =
          w => tsEval.eval(w._1).asInstanceOf[Long]
        // only leaf-step matches can be captured; not/until guard rows
        // merely kill branches and never need the defensive copy
        val capturing = capturingIdx(skel).toArray.sorted
        val nCapturing = capturing.length
        val proj = UnsafeProjection.create(outTypes)
        // ALL ROWS: map each capture slot to its declared step index
        // (several slots can share a step name under alternation)
        val slotStep: Array[Int] =
          if (aRows) Array.tabulate(compiled.slotCount)(
            s => names.indexOf(compiled.stepNameOf(s)))
          else null
        // unreachable from the MatchRecognize gate (distinct flat
        // PVars), but a future caller with a slot name missing from
        // stepNames should get a named error, not perStep(-1)
        if (slotStep != null) require(slotStep.forall(_ >= 0),
          "ALL ROWS emission requires every capture slot's step name " +
            s"in stepNames: ${(0 until compiled.slotCount)
              .filter(slotStep(_) < 0)
              .map(compiled.stepNameOf).distinct.mkString(", ")} missing")

        new Iterator[InternalRow] {
          private val queue = new scala.collection.mutable.Queue[InternalRow]
          private var curKey: Any = null
          private var haveKey = false
          // per-key-run arrival counter (EventId allocator)
          private var arrSeq = 0L
          // per-key 1-based match ordinal (MATCH_NUMBER)
          private var matchSeq = 0L
          // hot-key diagnostics: task-local maxima reported as deltas so
          // the task's metric value IS its max
          private var repEvents = 0L
          private var repBranches = 0L
          private var keyEvents = 0L
          private def bumpEvents(v: Long): Unit =
            if (v > repEvents) { maxKeyEvents.add(v - repEvents); repEvents = v }
          private def bumpBranches(v: Long): Unit =
            if (v > repBranches) {
              maxKeyBranches.add(v - repBranches); repBranches = v
            }
          private var done = false
          // NFA driver generic over the capture representation: the
          // exec's output is (count, first event) per step, which
          // [[GroupCep.groupFirsts]] reads straight off the run
          // encoding — so under strict contiguity the span-compressed
          // [[GroupCep.SpanCaps]] branches never materialize a
          // per-event capture vector at all (O(#runs) per branch
          // instead of O(match length); the round-12 greedy/deferred
          // capture-churn fix, now on the planned route too).
          private final class Runner[C](
              ops: GroupCep.CapOps[(InternalRow, Long), C]) {
            private var confs =
              Vector.empty[GroupCep.Conf[(InternalRow, Long), C]]
            private var emitter = newEmitter()
            private def newEmitter() =
              new GroupCep.GroupRunEmitter[(InternalRow, Long), C](
                compiled, tsOf, skipStrat, aHead, aTail, tagOf = _._2, ops)
            private def doEmit(m: C): Unit = {
              numMatches.add(1); matchSeq += 1
              if (aRows)
                emitAll(curKey, matchSeq, ops.runs(m),
                  GroupCep.groupFirsts(compiled, m, ops))
              else
                emit(curKey, matchSeq, GroupCep.groupFirsts(compiled, m, ops))
            }
            /** One event through the NFA + emission policy; returns the
              * live branch count (hot-key metric). */
            def advanceRow(w: (InternalRow, Long), ts: Long): Int = {
              val (next, matches) =
                GroupCep.advanceC(compiled, confs, w, ts, canStart = true, ops)
              confs = emitter.step(next, matches, doEmit)
              confs.size
            }
            /** End of key run: anchored candidates gate + select,
              * deferred resolver/skip-queue entries release. */
            def flush(lastTag: Long): Unit = emitter.finish(lastTag, doEmit)
            def reset(): Unit = { confs = Vector.empty; emitter = newEmitter() }
          }
          // per-key-run emission policy (anchor gates / reluctant
          // resolver / skip queue) — ONE emitter shared with the
          // library drivers, reset per key run. Arrival tags ARE run
          // positions, so SpanOps needs no event buffer — and with
          // groupFirsts/run-walk emission (ALL ROWS included: the
          // per-row output derives from slot runs alone), nothing
          // ever calls eventAt.
          private val runner: Runner[_] =
            if (compiled.strictSpans)
              new Runner(new GroupCep.SpanOps[(InternalRow, Long)](
                _._2.toInt,
                i => throw new IllegalStateException(
                  s"GroupCepExec never materializes captures (pos $i)")))
            else new Runner(GroupCep.vecOps[(InternalRow, Long)])
          private def flushKey(): Unit =
            if (haveKey) runner.flush(arrSeq - 1)

          /** ALL ROWS PER MATCH: one output row per captured event, in
            * capture order — (key, match ordinal, step index of the
            * row's variable, 1-based ordinal within that variable's
            * captures so far) plus the per-match final block (count +
            * first-row columns per step), from which the router derives
            * RUNNING counts / positional measures as CASE expressions.
            * The per-row pair derives from the SLOT RUNS alone (no
            * captured events are read), so the span representation
            * stays unmaterialized even here. */
          private def emitAll(key: Any, matchNum: Long,
              runs: Iterator[GroupCep.CapRun[(InternalRow, Long)]],
              firsts: scala.collection.Map[String,
                (Long, (InternalRow, Long))]): Unit = {
            val vals = new Array[Any](4 + nSteps * (1 + nCols))
            vals(0) = key
            vals(1) = matchNum
            var s = 0
            while (s < nSteps) {
              firsts.get(names(s)) match {
                case Some((cnt, (r, _))) =>
                  vals(4 + s * (1 + nCols)) = cnt
                  var c = 0
                  while (c < nCols) {
                    vals(5 + s * (1 + nCols) + c) = r.get(c, colTypes(c))
                    c += 1
                  }
                case None =>
                  vals(4 + s * (1 + nCols)) = 0L
              }
              s += 1
            }
            val perStep = new Array[Long](nSteps)
            runs.foreach { run =>
              val si = slotStep(run.slot)
              var k = 0
              while (k < run.count) {
                perStep(si) += 1
                vals(2) = si
                vals(3) = perStep(si)
                queue += proj(new GenericInternalRow(vals)).copy()
                k += 1
              }
            }
          }

          private def emit(key: Any, matchNum: Long,
              firsts: scala.collection.Map[String,
                (Long, (InternalRow, Long))]): Unit = {
            val vals = new Array[Any](2 + nSteps * (1 + nCols))
            vals(0) = key
            vals(1) = matchNum
            var s = 0
            while (s < nSteps) {
              firsts.get(names(s)) match {
                case Some((cnt, (r, _))) =>
                  vals(2 + s * (1 + nCols)) = cnt
                  var c = 0
                  while (c < nCols) {
                    vals(3 + s * (1 + nCols) + c) = r.get(c, colTypes(c))
                    c += 1
                  }
                case None =>
                  vals(2 + s * (1 + nCols)) = 0L
              }
              s += 1
            }
            queue += proj(new GenericInternalRow(vals)).copy()
          }

          private def pump(): Unit = {
            while (queue.isEmpty && !done) {
              if (!rows.hasNext) {
                // end of input: release the final key run's deferred
                // emissions (anchored gate+select / resolver / queue)
                flushKey()
                done = true
              } else {
                val raw = rows.next()
                val tsVal = tsEval.eval(raw)
                // NULL event time has no stream position — skip (see CepExec)
                if (tsVal != null) {
                  // copy only rows the NFA can capture: any leaf match may be
                  // stored in a branch; non-matching rows only close strict
                  // runs / serve ignore edges and pass through uncopied
                  var retainable = false
                  var i = 0
                  while (!retainable && i < nCapturing) {
                    if (bound(capturing(i)).eval(raw)) retainable = true
                    i += 1
                  }
                  val row = if (retainable) raw.copy() else raw
                  val k = keyEval.eval(row)
                  if (!haveKey || !java.util.Objects.equals(k, curKey)) {
                    // a key switch flushes the finished run's deferred
                    // emissions, then resets the branch set + emitter
                    flushKey()
                    arrSeq = 0L
                    keyEvents = 0L
                    matchSeq = 0L
                    runner.reset()
                    curKey = k match {
                      case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
                      case other => other
                    }
                    haveKey = true
                  }
                  val w = (row, arrSeq)
                  arrSeq += 1
                  keyEvents += 1
                  bumpEvents(keyEvents)
                  val nBranches =
                    runner.advanceRow(w, tsVal.asInstanceOf[Long])
                  bumpBranches(nBranches.toLong)
                }
              }
            }
          }

          override def hasNext: Boolean = { pump(); queue.nonEmpty }
          override def next(): InternalRow = { pump(); queue.dequeue() }
        }
      }, preservesPartitioning = true)
    }
  }

  /** Register the strategy on a session (idempotent); also injected by
    * [[CepExtensions]] for `spark.sql.extensions` deployments. */
  def register(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraStrategies.contains(GroupCepStrategy))
      exp.extraStrategies = exp.extraStrategies :+ GroupCepStrategy
  }

  /** Build a planned group-pattern match over `df`.
    *
    * @return one row per match: `key`, then per step `<step>_count` and
    *         every child column as `<step>_<col>` (first captured event of
    *         the step's group, null where the step captured nothing).
    */
  def matchGroupPattern(df: DataFrame, key: Column, ts: Column, tie: Column,
      elems: Seq[GSpec], withinMicros: Option[Long] = None,
      reluctant: Boolean = false,
      anchorHead: Boolean = false, anchorTail: Boolean = false,
      skip: graft.streaming.Cep.AfterMatchSkip =
        graft.streaming.Cep.NoSkip,
      sqlGreedy: Boolean = false,
      allRows: Boolean = false): DataFrame = {
    require(elems.nonEmpty, "at least one pattern element")
    require(!(sqlGreedy && reluctant),
      "sqlGreedy excludes the pattern-level reluctant mode " +
        "(per-quantifier polarity rides GGroupSpec.relMark)")
    if (anchorHead || anchorTail) {
      // the planned anchors are the reluctant-selection composition
      // (plain anchored group patterns post-filter on boundary flags in
      // the library path); gate-before-selection needs deferral.
      // Round 11: non-default skip composes (gate → select → skip —
      // the queue runs over the selected candidates at run end)
      require(reluctant || sqlGreedy,
        "planned ^/$ anchors require a selection mode (reluctant or " +
          "sqlGreedy) — gate-before-selection needs deferral")
    }
    // mirror the selection modes' GPattern contracts at PLAN time (the
    // executor-side build would only fail per task): >= 1 SEMANTIC
    // quantified element; with several (or greedy selection), sibling-
    // only nesting and strict contiguity — the ranking's preconditions
    if (reluctant || sqlGreedy) {
      def quantCount(es: Seq[GSpec]): Int = es.map {
        case g: GGroupSpec =>
          (if (g.min != g.max || g.max > 1 || g.optional) 1 else 0) +
            quantCount(g.elems)
        case a: GAltSpec => a.branches.map(quantCount).sum
        case _ => 0
      }.sum
      def nested(es: Seq[GSpec]): Boolean = es.exists {
        case g: GGroupSpec =>
          val self = g.min != g.max || g.max > 1 || g.optional
          (self && quantCount(g.elems) > 0) || nested(g.elems)
        case a: GAltSpec => a.branches.exists(nested)
        case _ => false
      }
      def allStrict(es: Seq[GSpec]): Boolean = es.zipWithIndex.forall {
        case (g: GGroupSpec, i) =>
          (i == 0 || g.strict) &&
            (g.max <= 1 || g.consecutive) && allStrict(g.elems)
        case (l: GLeafSpec, i) => i == 0 || l.strict
        case (a: GAltSpec, i) =>
          (i == 0 || a.strict) && a.branches.forall(allStrict)
        case _ => true
      }
      val n = quantCount(elems)
      require(n >= 1, (if (sqlGreedy) "a greedy-select"
        else "a reluctant") + " pattern needs at least one quantified " +
        "element (fixed {n} counts and plain variables carry no " +
        "selection choice)")
      if (n > 1 || sqlGreedy) {
        require(!nested(elems),
          "selection-mode quantifiers must be sibling elements")
        require(allStrict(elems),
          "selection modes require strict contiguity " +
            "(strict/consecutive) throughout the pattern")
      }
    }
    // The head/last negation rules hold RECURSIVELY: a nested group whose
    // elems end in a GNotSpec would have its pending negation silently
    // dropped by buildSeq — the reference instead throws
    // MalformedPatternException (Pattern.java notFollowedBy-terminal).
    def validateSeq(es: Seq[GSpec]): Unit = {
      require(es.nonEmpty, "empty pattern group")
      require(!es.head.isInstanceOf[GNotSpec],
        "a pattern (or group) cannot begin with notFollowedBy/notNext")
      require(!es.last.isInstanceOf[GNotSpec],
        "notFollowedBy/notNext must be followed by another pattern element")
      es.foreach {
        case g: GGroupSpec => validateSeq(g.elems)
        case a: GAltSpec => a.branches.foreach(validateSeq)
        case _ => ()
      }
    }
    validateSeq(elems)
    val spark = df.sparkSession
    register(spark)
    val child = GraftSqlShim.analyzed(df)
    def resolve(c: Column): Expression =
      GraftSqlShim.expr(c).transform {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          child.output.find(_.name == u.name).getOrElse(throw new
              IllegalArgumentException(s"column ${u.name} not in ${child.output}"))
      }
    val predsB = Seq.newBuilder[Expression]
    var nPreds = 0
    def skeletonOf(e: GSpec): Skel = e match {
      case a: GAltSpec =>
        AltSkel(a.branches.map(_.map(skeletonOf)), a.strict, a.any)
      case l: GLeafSpec =>
        predsB += resolve(l.pred); nPreds += 1
        LeafSkel(l.name, nPreds - 1, l.strict, l.any)
      case g: GGroupSpec =>
        val inner = g.elems.map(skeletonOf)
        val untilIdx = g.until match {
          case Some(u) => predsB += resolve(u); nPreds += 1; nPreds - 1
          case None => -1
        }
        GroupSkel(inner, g.min, g.max, g.optional,
          g.consecutive, g.combinations, g.strict, g.any, untilIdx,
          g.relMark)
      case n: GNotSpec =>
        predsB += resolve(n.pred); nPreds += 1
        NotSkel(n.name, nPreds - 1, n.nextOnly)
    }
    val skeleton = elems.map(skeletonOf)
    // negative elements capture nothing: they contribute no output slots
    def leafNames(e: GSpec): Seq[String] = e match {
      case l: GLeafSpec => Seq(l.name)
      case g: GGroupSpec => g.elems.flatMap(leafNames)
      case a: GAltSpec => a.branches.flatMap(_.flatMap(leafNames))
      case _: GNotSpec => Seq.empty
    }
    val stepNames = elems.flatMap(leafNames).distinct
    val keyE = resolve(key)
    // reject keys without value equality on the evaluated path (the
    // shared PlanKeys contract — one definition with CepPlan)
    PlanKeys.requireValueEqualityKey(keyE)
    // match_number = 1-based per-key match ordinal in emission order —
    // the SAME ordinal the library drivers produce (batch) and carry in
    // keyed state (streaming), so MATCH_NUMBER() queries route planned
    // without the routing decision changing semantics
    // ALL ROWS adds the per-row pair (step index of the row's variable,
    // 1-based ordinal within that variable's captures) ahead of the
    // shared per-match final block — RUNNING measures derive from the
    // pair + block as plain column expressions (codegen'd CASEs)
    val perRowAttrs =
      if (!allRows) Nil
      else Seq(
        AttributeReference("cls_idx",
          org.apache.spark.sql.types.IntegerType, nullable = false)(),
        AttributeReference("within_ord", LongType, nullable = false)())
    val outAttrs = (AttributeReference("key", keyE.dataType)() +:
      AttributeReference("match_number", LongType, nullable = false)() +:
      perRowAttrs) ++
      stepNames.flatMap { name =>
        AttributeReference(s"${name}_count", LongType, nullable = false)() +:
          child.output.map(a =>
            AttributeReference(s"${name}_${a.name}", a.dataType, nullable = true)())
      }
    GraftSqlShim.ofRows(spark, GroupCepMatchPlan(
      keyE, resolve(ts), resolve(tie), skeleton, predsB.result(), stepNames,
      withinMicros, reluctant, anchorHead, anchorTail, skip, sqlGreedy,
      allRows, outAttrs, child))
  }
}
