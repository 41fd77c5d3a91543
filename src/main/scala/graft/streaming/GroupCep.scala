package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CEP pattern GROUPS (reference: flink-cep GroupPattern.java — patterns
  * whose elements are themselves patterns, quantifiable as a unit:
  * `c (a b){2} d`, `c (a (b c){3}){0,2} e`, …) re-expressed as a
  * recursive epsilon-NFA, conformance-pinned by verbatim ports of
  * flink-cep/src/test/java/.../nfa/GroupITCase.java.
  *
  * Why a second matcher instead of extending [[Cep.advance]]: the linear
  * NFA models a pattern as a flat step vector with per-step quantifiers —
  * its zero-allocation hot path and 15+ ported conformance cases depend on
  * that shape. Groups need loop-back over a SUB-pattern (and nesting), a
  * different state machine. This driver mirrors the reference compiler's
  * state-graph semantics (NFACompiler.java:createGroupPatternState /
  * createLoopingGroupPatternState) directly as a tree walk:
  *
  *  - each element boundary carries a consuming mode: STRICT (`next`, no
  *    ignore edge), TILL_NEXT (`followedBy`, ignore = non-matching events
  *    only — the waiting branch is consumed by its first take), TILL_ANY
  *    (`followedByAny`, ignore = all events — the waiting branch survives
  *    its own takes and can re-fire later; NFACompiler.getIgnoreCondition);
  *  - a group's first step takes the GROUP's mode on entry and the group's
  *    LOOP mode on repetition re-entry (`consecutive()` → STRICT,
  *    `allowCombinations()` → TILL_ANY, default TILL_NEXT;
  *    getInnerIgnoreCondition / isCurrentGroupPatternFirstOfLoop);
  *  - completing a group's last element forks: exit (reps >= min) and/or
  *    loop back (reps < max) — which is why `(a b)+ d` emits every
  *    repetition count, not just the maximal one (GroupITCase
  *    testGroupFollowedByOneOrMore);
  *  - `until` on a quantified group conjoins NOT(until) onto every take
  *    AND ignore edge inside that group (extendWithUntilCondition), so an
  *    until-event kills all in-group branches outright;
  *  - `notFollowedBy` attaches a persistent stop condition to the entry of
  *    the following element (branch dies if the banned event arrives
  *    before that element takes); `notNext` stops only while the branch
  *    has not yet ignored an event (NFACompiler.createMiddleStates).
  */
object GroupCep {

  // consuming modes (Quantifier.ConsumingStrategy)
  final val Strict = 0
  final val TillNext = 1
  final val TillAny = 2

  /** Pattern element: a named step, a quantified sub-pattern, or a
    * negative (stop) condition. `mode` is the boundary contiguity to the
    * PREVIOUS element. */
  sealed trait GElem[E]
  final case class GLeaf[E](name: String, pred: E => Boolean, mode: Int)
      extends GElem[E]
  final case class GGroup[E](elems: Vector[GElem[E]], mode: Int,
      min: Int, max: Int, optional: Boolean, loopMode: Int,
      untilPred: Option[E => Boolean],
      greedy: Boolean = false,
      relMark: Boolean = false) extends GElem[E]
  final case class GNot[E](name: String, pred: E => Boolean,
      nextOnly: Boolean) extends GElem[E]
  /** Alternation `(b1 | b2 | ...)`: exactly one branch matches (SQL:2016
    * MATCH_RECOGNIZE alternation; the reference's 1.7 NFACompiler builds
    * the same fork from Calcite's LogicalMatch). Branch preference is
    * leftmost-first: the NFA forks branches in declaration order, so
    * emission order — and therefore which match an AFTER MATCH SKIP
    * strategy keeps when two branches complete together — follows the
    * SQL:2016 preference order. The builder always wraps a GAlt in a
    * singleton GGroup, so every quantifier composes unchanged. */
  final case class GAlt[E](branches: Vector[Vector[GElem[E]]], mode: Int)
      extends GElem[E]

  /** Builder mirroring the reference's Pattern/GroupPattern surface.
    * Quantifiers apply to the last appended element; a quantified plain
    * step is wrapped into a singleton group (same NFA shape the reference
    * compiles it to). */
  final class GPattern[E] private[GroupCep] (
      val elems: Vector[GElem[E]], val withinMs: Option[Long],
      private[GroupCep] val reluctantSel: Boolean = false,
      private[GroupCep] val deferSel: Boolean = false,
      private[GroupCep] val greedySel: Boolean = false,
      // set by liftG only: events carry unique arrival tags, so no two
      // distinct events ever compare equal — a precondition of the
      // noEpsilonDup dedup skip (value-identity drivers CAN mint equal
      // branches from duplicate input rows and still need the dedup)
      private[GroupCep] val arrivalTagged: Boolean = false) {

    private def append(e: GElem[E]) =
      new GPattern(elems :+ e, withinMs, reluctantSel, deferSel, greedySel,
        arrivalTagged)

    def followedBy(name: String)(pred: E => Boolean): GPattern[E] =
      append(GLeaf(name, pred, TillNext))
    def next(name: String)(pred: E => Boolean): GPattern[E] =
      append(GLeaf(name, pred, Strict))
    def followedByAny(name: String)(pred: E => Boolean): GPattern[E] =
      append(GLeaf(name, pred, TillAny))
    def followedBy(sub: GPattern[E]): GPattern[E] =
      append(GGroup(sub.elems, TillNext, 1, 1, optional = false, TillNext, None))
    def next(sub: GPattern[E]): GPattern[E] =
      append(GGroup(sub.elems, Strict, 1, 1, optional = false, TillNext, None))
    def followedByAny(sub: GPattern[E]): GPattern[E] =
      append(GGroup(sub.elems, TillAny, 1, 1, optional = false, TillNext, None))
    def followedBy(alts: Seq[GPattern[E]]): GPattern[E] =
      append(GroupCep.altGroup(alts, TillNext))
    def next(alts: Seq[GPattern[E]]): GPattern[E] =
      append(GroupCep.altGroup(alts, Strict))
    def followedByAny(alts: Seq[GPattern[E]]): GPattern[E] =
      append(GroupCep.altGroup(alts, TillAny))
    def notFollowedBy(name: String)(pred: E => Boolean): GPattern[E] =
      append(GNot(name, pred, nextOnly = false))
    def notNext(name: String)(pred: E => Boolean): GPattern[E] =
      append(GNot(name, pred, nextOnly = true))

    private def quantified(f: GGroup[E] => GGroup[E]): GPattern[E] = {
      val g = elems.last match {
        case g: GGroup[E] => g
        case l: GLeaf[E] =>
          GGroup[E](Vector(l.copy(mode = TillNext)), l.mode, 1, 1,
            optional = false, TillNext, None)
        case _: GNot[E] =>
          throw new IllegalArgumentException(
            "cannot quantify a notFollowedBy/notNext element")
        case _: GAlt[E] => throw new IllegalStateException(
          "alternation is always group-wrapped by the builder")
      }
      new GPattern(elems.init :+ f(g), withinMs, reluctantSel, deferSel,
        greedySel, arrivalTagged)
    }

    def times(n: Int): GPattern[E] = {
      require(n >= 1, "times(n) requires n >= 1")
      quantified(_.copy(min = n, max = n))
    }
    def times(from: Int, to: Int): GPattern[E] = {
      require(from >= 0 && to >= from && to >= 1,
        "times(from, to) requires 0 <= from <= to, to >= 1")
      quantified(g => g.copy(min = math.max(from, 1), max = to,
        optional = g.optional || from == 0))
    }
    def oneOrMore: GPattern[E] =
      quantified(_.copy(min = 1, max = Int.MaxValue))
    def optional: GPattern[E] = quantified(_.copy(optional = true))
    def consecutive: GPattern[E] = quantified(_.copy(loopMode = Strict))
    def allowCombinations: GPattern[E] = quantified(_.copy(loopMode = TillAny))
    def until(pred: E => Boolean): GPattern[E] =
      quantified(_.copy(untilPred = Some(pred)))
    /** Prefer-longer repetition (reference Pattern.greedy / NFACompiler
      * updateWithGreedyCondition): every transition of the state FOLLOWING
      * the loop is conjoined with NOT(loop take), so a branch that exited
      * the loop dies on any event the loop could have consumed — only the
      * maximal run reaches the rest of the pattern. */
    def greedy: GPattern[E] = quantified { g =>
      require(g.loopMode != TillAny,
        "Option not applicable to FollowedByAny pattern")
      g.copy(greedy = true)
    }
    /** Mark the LAST quantified element RELUCTANT for
      * [[greedySelect]]'s per-quantifier polarity (SQL:2016 mixed
      * `B+ C+?` ranking): a marked quantifier prefers FEWER
      * repetitions where unmarked ones prefer more. Only consulted in
      * greedy-select mode — the all-reluctant [[reluctant]] mode
      * ignores it. */
    def markReluctant: GPattern[E] = quantified(_.copy(relMark = true))
    def within(ms: Long): GPattern[E] =
      new GPattern(elems, Some(ms), reluctantSel, deferSel, greedySel,
        arrivalTagged)

    /** Events carry unique arrival identity WITHOUT [[liftG]] — the
      * planned exec tags rows itself (`(row, arrSeq)`) and marks its
      * pattern here, LAST, right before compile (the transformer
      * methods propagate the flag, but marking late keeps the
      * invariant obvious). See [[Compiled.noEpsilonDup]]. */
    private[graft] def withArrivalIdentity: GPattern[E] =
      new GPattern(elems, withinMs, reluctantSel, deferSel, greedySel,
        arrivalTagged = true)

    /** Force DEFERRED reluctant selection even without alternation —
      * the anchored-batch driver needs every candidate buffered (the
      * first completion may fail an anchor a longer one passes), so the
      * in-advance shortest-per-start kill must not fire. */
    private[graft] def deferredReluctant: GPattern[E] =
      new GPattern(elems, withinMs, reluctantSel, deferSel = true,
        greedySel = greedySel, arrivalTagged = arrivalTagged)

    /** SQL:2016 RELUCTANT selection for the pattern's SINGLE quantified
      * element (the nested twin of [[Cep.Pattern.reluctant]] —
      * MATCH_RECOGNIZE `(A B)+?`): per match start, only the most
      * PREFERRED completion is emitted. Without alternation, preference
      * order equals completion order (candidates from one start differ
      * only in repetition count over a fixed-length body, so fewer reps
      * always completes first) and the drivers emit the first completion
      * per start, killing the longer same-start branches immediately.
      * WITH alternation (round 10 — `(A|BB){1,2}?`, PERMUTE under a
      * reluctant quantifier, or alternation elsewhere in the pattern),
      * branch lengths differ, so a less-preferred candidate can
      * complete FIRST (`(AA|B)+? E`: the B-branch completes before the
      * preferred leftmost AA-branch); the drivers then DEFER each
      * start's emission until no open branch with that start remains
      * and pick by the SQL:2016 lexicographic preference rule
      * ([[GroupCep.prefer]]: at the first diverging consumed slot,
      * exiting the reluctant loop beats staying in it — fewer reps —
      * and otherwise the lower slot id wins — the leftmost
      * alternative). Exact in batch AND streaming (deferred candidates
      * ride keyed state). Requires NoSkip in the drivers. */
    /** Structural validators shared by the two selection modes. A
      * group is a DECISION POINT when its repetition/optionality gives
      * the derivation a choice. */
    private def quantCount(es: Vector[GElem[E]]): Int = es.map {
      case g: GGroup[E] =>
        (if (g.min != g.max || g.max > 1 || g.optional) 1 else 0) +
          quantCount(g.elems)
      case a: GAlt[E] => a.branches.map(quantCount).sum
      case _ => 0
    }.sum
    private def nestedQuant(es: Vector[GElem[E]]): Boolean = es.exists {
      case g: GGroup[E] =>
        val self = g.min != g.max || g.max > 1 || g.optional
        (self && quantCount(g.elems) > 0) || nestedQuant(g.elems)
      case a: GAlt[E] => a.branches.exists(nestedQuant)
      case _ => false
    }
    /** Strict contiguity throughout ⇒ a branch's captures are one
      * contiguous arrival-tag span — the [[SpanCaps]] precondition. */
    private[GroupCep] def allStrictPattern: Boolean = allStrict(elems)
    private def allStrict(es: Vector[GElem[E]]): Boolean =
      es.zipWithIndex.forall {
        case (g: GGroup[E], i) =>
          // loop contiguity only matters when the group can repeat
          (i == 0 || g.mode == Strict) &&
            (g.max <= 1 || g.loopMode == Strict) &&
            allStrict(g.elems)
        case (l: GLeaf[E], i) => i == 0 || l.mode == Strict
        case (al: GAlt[E], i) =>
          (i == 0 || al.mode == Strict) && al.branches.forall(allStrict)
        case (_, _) => true
      }

    def reluctant: GPattern[E] = {
      val n = quantCount(elems)
      require(n >= 1,
        "a reluctant pattern needs at least one quantified element")
      // round 11: SEVERAL quantified elements compose — every one is
      // ranked reluctant and [[GroupCep.prefer]] walks the structural
      // decision lattice ([[Compiled.slotPath]]): alternation levels
      // prefer the leftmost branch, sequence levels prefer the exit —
      // so alternation/PERMUTE compose with multiple quantifiers too
      // (branch preference dominates in-branch loops).
      //
      // PERMANENT structural limit (round 13): a quantifier NESTED
      // inside another quantified group. Three arguments:
      //  1. The slot path is static per slot, but under nesting the
      //     decision a capture represents depends on WHICH outer
      //     repetition it sits in — e.g. in `(A+? B)+?`, "took another
      //     A" can mean continuing iteration i's inner loop or opening
      //     iteration i+1, two decisions the first-divergence walk
      //     cannot tell apart without per-capture iteration ordinals.
      //  2. With ordinals, preference stops being PREFIX-STABLE across
      //     loop-back boundaries (a worse prefix can win on a later
      //     iteration's ordinal), which is the exact property the
      //     in-flight shortest-per-start kill and the dominated-branch
      //     pruning rest on — the machinery that keeps live branches
      //     ~O(starts). Full decision-sequence ranking means buffering
      //     every derivation per start: O(2^reps) worst-case, the 100x
      //     scale-killer this engine exists to avoid.
      //  3. No reference behavior exists to match: the reference's own
      //     MATCH_RECOGNIZE (Calcite-fronted) rejects nested quantifier
      //     rankings too, and its DSL has no reluctance ranking at all
      //     (emission is all-prefixes).
      if (n > 1) {
        require(!nestedQuant(elems),
          "multiple reluctant quantifiers must be sibling elements " +
            "(a quantifier nested inside a quantified group is a " +
            "documented-permanent rejection: per-repetition ranking " +
            "breaks the prefix-stable preference the O(starts) " +
            "selection machinery requires — see the scaladoc)")
        // PERMANENT (round 13): the in-flight shortest-per-start fold
        // is provably safe only under STRICT adjacency — same-start
        // candidates then consume the same event at every capture
        // position, so first-divergence ranking is well-defined and
        // the preferred candidate completes first. Under relaxed
        // contiguity candidates at one capture position hold DIFFERENT
        // events (one skipped, one took), the per-event completion
        // minima stop being monotone, and the kill-at-first-completion
        // proof (round 11) fails — correctness would require buffering
        // every same-start candidate to end-of-run, the O(candidates)
        // memory the anchored driver pays only because anchors are
        // batch-only and rare. SQL MATCH_RECOGNIZE concatenation is
        // strict adjacency, so the SQL surface is unaffected; only the
        // DSL's followedBy+reluctant mix is rejected, by name.
        require(allStrict(elems),
          "multiple reluctant quantifiers require strict contiguity " +
            "(next/consecutive) throughout the pattern — the " +
            "MATCH_RECOGNIZE adjacency; relaxed followedBy is a " +
            "documented-permanent rejection (see the scaladoc)")
      }
      new GPattern(elems, withinMs, reluctantSel = true, deferSel,
        greedySel = false, arrivalTagged = arrivalTagged)
    }

    /** SQL:2016 STRICT GREEDY selection (round 11 — the mode that
      * closes the engine's one documented emission deviation): default
      * SQL quantifiers are GREEDY and a pattern yields ONE match per
      * start — the lexicographically MAXIMAL derivation — where the
      * flink-cep emission this engine otherwise follows reports every
      * satisfied repetition count. Same machinery as [[reluctant]]
      * with the polarity flipped: selection is always DEFERRED (a
      * longer, more-preferred completion arrives after a shorter one),
      * candidates fold through [[GroupCep.prefer]] whose sequence-level
      * rule prefers STAYING in the earlier loop (lower child index),
      * alternation still prefers the leftmost branch, and a strict
      * prefix prefers the LONGER candidate. Dominated open branches
      * prune exactly as for reluctant (the preference is prefix-stable
      * under either polarity). Same structural preconditions: >= 1
      * quantified element, sibling quantifiers only, strict
      * contiguity; incompatible with [[reluctant]] (per-quantifier
      * mixed polarity is the named remaining rejection) and with the
      * DSL's [[greedy]] guard-kill groups (a different, branch-killing
      * mechanism). On an unbounded stream a start resolves only when
      * no branch sharing it remains live (batch resolves at end of
      * input) — `within` horizons bound the wait. */
    def greedySelect: GPattern[E] = {
      require(!reluctantSel,
        "greedySelect and reluctant are mutually exclusive selection " +
          "modes (per-quantifier polarity rides markReluctant instead)")
      def anyGuard(es: Vector[GElem[E]]): Boolean = es.exists {
        case g: GGroup[E] => g.greedy || anyGuard(g.elems)
        case a: GAlt[E] => a.branches.exists(anyGuard)
        case _ => false
      }
      require(quantCount(elems) >= 1,
        "a greedy-select pattern needs at least one quantified element")
      require(!nestedQuant(elems),
        "greedy-select quantifiers must be sibling elements")
      require(!anyGuard(elems),
        "greedySelect does not compose with the DSL's greedy " +
          "guard-kill groups")
      require(allStrict(elems),
        "greedySelect requires strict contiguity (next/consecutive) " +
          "throughout the pattern — the MATCH_RECOGNIZE adjacency")
      new GPattern(elems, withinMs, reluctantSel = false,
        deferSel = false, greedySel = true, arrivalTagged = arrivalTagged)
    }

    private[GroupCep] def validated: GPattern[E] = {
      // recursive: a nested group ending in a negation would silently drop
      // it in compilation — the reference throws MalformedPatternException
      def validateSeq(es: Vector[GElem[E]]): Unit = {
        require(es.nonEmpty, "empty pattern")
        require(!es.head.isInstanceOf[GNot[_]],
          "a pattern (or group) cannot begin with notFollowedBy/notNext")
        require(!es.last.isInstanceOf[GNot[_]],
          "notFollowedBy/notNext must be followed by another pattern element")
        es.foreach {
          case g: GGroup[E] => validateSeq(g.elems)
          case a: GAlt[E] => a.branches.foreach(validateSeq)
          case _ => ()
        }
      }
      validateSeq(elems)
      elems.last match {
        case g: GGroup[E] => require(!g.optional,
          "the final pattern element cannot be optional (nor times(0, n))")
        case _ => ()
      }
      this
    }
  }

  object GPattern {
    def begin[E](name: String)(pred: E => Boolean): GPattern[E] =
      new GPattern(Vector(GLeaf(name, pred, TillNext)), None)
    def begin[E](sub: GPattern[E]): GPattern[E] =
      new GPattern(Vector(GGroup(sub.elems, TillNext, 1, 1,
        optional = false, TillNext, None)), None)
    def begin[E](alts: Seq[GPattern[E]]): GPattern[E] =
      new GPattern(Vector(altGroup(alts, TillNext)), None)
  }

  /** Alternation wrapped in a singleton group, so quantifiers on the
    * alternation reuse the group loop machinery unchanged. */
  private def altGroup[E](alts: Seq[GPattern[E]], mode: Int): GGroup[E] = {
    require(alts.size >= 2, "alternation needs at least two branches")
    alts.foreach(a => require(a.withinMs.isEmpty,
      "within() belongs on the outer pattern, not an alternation branch"))
    GGroup(Vector(GAlt(alts.toVector.map(_.elems), TillNext)), mode, 1, 1,
      optional = false, TillNext, None)
  }

  // ---- compiled form: leaf slots + a parent-linked element tree ----

  private sealed trait Node
  private final case class SNode(slot: Int, mode: Int) extends Node
  private final case class GNode(id: Int, children: Vector[Node], mode: Int,
      min: Int, max: Int, optional: Boolean, loopMode: Int,
      untilIdx: Int, // untilIdx: index into untils, -1 = none
      greedy: Boolean, relMark: Boolean = false) extends Node
  /** Alternation fork: entering it epsilon-enters every branch (in
    * declaration order — leftmost-preference falls out of conf/emission
    * ordering); completing ANY branch completes the node. Branches are
    * min=1/max=1 GNodes so the sibling walk and counter clearing reuse
    * the group machinery untouched. */
  private final case class ANode(branches: Vector[GNode], mode: Int)
      extends Node

  /** A frontier target after an epsilon walk: a slot to wait on (with its
    * consuming mode and group-repetition counters) or pattern completion.
    * `guard` >= 0 names a greedy group whose exit produced this target:
    * while waiting here, any event that loop could have consumed kills
    * the branch (NFACompiler updateWithGreedyCondition — NOT(take)
    * conjoined onto every transition of the loop's sink state). */
  private final case class At(slot: Int, mode: Int, reps: Map[Int, Int],
      guard: Int = -1)

  final class Compiled[E] private[GroupCep] (pattern: GPattern[E])
      extends Serializable {
    private[GroupCep] val withinMs = pattern.withinMs
    private[GroupCep] val reluctantSel = pattern.reluctantSel
    private[GroupCep] val greedySel = pattern.greedySel
    /** Strict contiguity throughout the pattern: batch drivers may run
      * range-compressed [[SpanCaps]] captures (round 12) — every open
      * branch either takes an event or dies, so its captures form one
      * contiguous arrival-tag span and materialization-by-range is
      * exact. Relaxed boundaries (ignore edges) keep the exact vector. */
    private[graft] val strictSpans: Boolean = pattern.allStrictPattern
    /** No epsilon walk can mint two IDENTICAL branches: with every
      * element a required leaf/group (no alternation forks, no
      * optional/min-0 entry skips, no TillAny re-fires), each target of
      * one succ call sits on a distinct slot and distinct source
      * branches always differ in captures — so the per-event outConfs
      * dedup pass (a tuple key + hash insert per branch per event) is
      * provably a no-op and is skipped. Completions keep their dedup:
      * they are rare and the reasoning there is subtler. */
    private[graft] val noEpsilonDup: Boolean = {
      def ok(el: GElem[E]): Boolean = el match {
        case l: GLeaf[E] => l.mode != TillAny
        case g: GGroup[E] => !g.optional && g.min >= 1 &&
          g.mode != TillAny && g.loopMode != TillAny && g.elems.forall(ok)
        case _: GNot[E] => true
        case _: GAlt[E] => false
      }
      // value-identity drivers (un-lifted patterns) can mint EQUAL
      // branches from duplicate input rows — only arrival-tagged
      // events make "distinct sources stay distinct" hold
      pattern.arrivalTagged && pattern.elems.forall(ok)
    }
    /** Test seam (ADVICE r13): run the per-event branch dedup even when
      * [[noEpsilonDup]] would skip it, so the differential property
      * (PropertySpec) can assert the skip's precondition directly —
      * identical branch evolution and match sequences with the pass
      * forced on vs skipped. Never set outside tests. */
    @transient private[graft] var forceEpsilonDedup: Boolean = false
    @transient private val slotNames = Vector.newBuilder[String]
    @transient private val slotPreds = Vector.newBuilder[E => Boolean]
    @transient private val untilsB = Vector.newBuilder[E => Boolean]
    // per-slot stop conditions (notFollowedBy persistent / notNext fresh-only)
    @transient private val stopsFollowB = scala.collection.mutable.Map
      .empty[Int, List[E => Boolean]]
    @transient private val stopsNextB = scala.collection.mutable.Map
      .empty[Int, List[E => Boolean]]
    @transient private val slotUntilB = scala.collection.mutable.Map.empty[Int, Int]
    private var nSlots = 0
    private var nGroups = 0
    @transient private val parentB = scala.collection.mutable.Map.empty[Node, Node]

    /** Builds the node for an element; `untilIdx` = innermost enclosing
      * group's until (reference: getTakeCondition consults only
      * currentGroupPattern — the innermost group). */
    private def build(e: GElem[E], untilIdx: Int): Node = e match {
      case GLeaf(name, pred, mode) =>
        val s = nSlots; nSlots += 1
        slotNames += name; slotPreds += pred
        if (untilIdx >= 0) slotUntilB(s) = untilIdx
        SNode(s, mode)
      case g: GGroup[E] =>
        val id = nGroups; nGroups += 1
        val gUntil = g.untilPred match {
          case Some(p) => untilsB += p; untilsCount += 1; untilsCount - 1
          case None => -1
        }
        // this group's until scopes over its DIRECT slots; a nested group
        // re-scopes to its own (possibly absent) until — the reference's
        // currentGroupPattern is the innermost group, with no fallthrough
        val children = buildSeq(g.elems, gUntil)
        val node = GNode(id, children, g.mode, g.min, g.max, g.optional,
          g.loopMode, gUntil, g.greedy, g.relMark)
        children.foreach(parentB(_) = node)
        node
      case a: GAlt[E] =>
        val branches = a.branches.map { bes =>
          val bid = nGroups; nGroups += 1
          val children = buildSeq(bes, untilIdx)
          val bn = GNode(bid, children, a.mode, 1, 1, optional = false,
            TillNext, untilIdx, greedy = false)
          children.foreach(parentB(_) = bn)
          bn
        }
        val node = ANode(branches, a.mode)
        branches.foreach(parentB(_) = node)
        node
      case _: GNot[E] =>
        throw new IllegalStateException("GNot handled in buildSeq")
    }
    private var untilsCount = 0

    /** Builds a sibling sequence, converting GNot elements into stop
      * conditions on the entry slots of the following elements (walking
      * through optional elements like getCurrentNotCondition). */
    private def buildSeq(elems: Vector[GElem[E]], untilIdx: Int): Vector[Node] = {
      val nodes = Vector.newBuilder[Node]
      var pendingNots = List.empty[(E => Boolean, Boolean)]
      elems.foreach {
        case GNot(_, pred, nextOnly) =>
          pendingNots ::= (pred, nextOnly)
        case e =>
          val n = build(e, untilIdx)
          nodes += n
          if (pendingNots.nonEmpty) {
            firstSlots(n).foreach { s =>
              pendingNots.foreach { case (pred, nextOnly) =>
                if (nextOnly) stopsNextB(s) = pred :: stopsNextB.getOrElse(s, Nil)
                else stopsFollowB(s) = pred :: stopsFollowB.getOrElse(s, Nil)
              }
            }
            // nots stay pending only across optional elements
            if (!isOptional(n)) pendingNots = Nil
          }
      }
      nodes.result()
    }

    private def isOptional(n: Node): Boolean = n match {
      case _: SNode => false
      case g: GNode => g.optional || g.min == 0
      // an alternation can epsilon-skip iff some branch is all-optional
      case a: ANode => a.branches.exists(_.children.forall(isOptional))
    }
    private def firstSlots(n: Node): Vector[Int] = n match {
      case SNode(s, _) => Vector(s)
      case g: GNode =>
        val out = Vector.newBuilder[Int]
        var scanning = true
        g.children.foreach { c =>
          if (scanning) { out ++= firstSlots(c); scanning = isOptional(c) }
        }
        out.result()
      case a: ANode => a.branches.flatMap(firstSlots)
    }

    private val realRoot: GNode = {
      val children = buildSeq(pattern.elems, -1)
      val r = GNode(nGroups, children, TillNext, 1, 1, optional = false,
        TillNext, -1, greedy = false)
      nGroups += 1
      children.foreach(parentB(_) = r)
      r
    }
    private val parents: Map[Node, Node] = parentB.toMap
    private val names = slotNames.result()
    private val preds = slotPreds.result()
    private val untils = untilsB.result()
    private val stopsFollow = stopsFollowB.toMap
    private val stopsNext = stopsNextB.toMap
    private val slotUntil = slotUntilB.toMap
    private val slotNodes: Map[Int, SNode] = {
      def collect(n: Node): Vector[SNode] = n match {
        case s: SNode => Vector(s)
        case g: GNode => g.children.flatMap(collect)
        case a: ANode => a.branches.flatMap(collect)
      }
      collect(realRoot).map(s => s.slot -> s).toMap
    }

    /** Slot → structural path from the root, one (parentIsAlt,
      * childIdx) entry per tree level — the decision lattice
      * [[prefer]] ranks against. Two diverging slots share a path
      * prefix; the FIRST differing entry names the decision that
      * separated the candidates:
      *  - an ALTERNATION level → the LOWER branch index wins (SQL:2016
      *    leftmost preference — and it dominates any loop decision
      *    deeper in the branch, so a reluctant quantifier INSIDE a
      *    later branch cannot outrank an earlier branch);
      *  - a SEQUENCE level → the HIGHER child index wins: the
      *    candidate that exited/skipped the earlier subtree took the
      *    reluctant choice. Sound because every skippable/repeatable
      *    element under `reluctantSel` is reluctant-quantified (mixed
      *    greedy rejects) and NESTED quantifiers reject — so inside
      *    any quantified group progression is deterministic and
      *    sequence-level divergences always rank a reluctant
      *    exit-vs-stay/skip-vs-take decision. */
    private[GroupCep] val slotPath
        : Map[Int, Vector[(Boolean, Int, Boolean)]] = {
      // entry = (parentIsAlt, childIdx, rel): `rel` is the RELUCTANT
      // polarity of the decision of entering/staying in this child —
      // under all-reluctant selection every sequence decision is
      // reluctant; under greedy selection (round 11) only children
      // carrying [[GGroup.relMark]] are, the rest prefer staying (the
      // SQL:2016 default-greedy/marked-reluctant mix)
      def isQuant(g: GNode): Boolean =
        g.min != g.max || g.max > 1 || g.optional || g.min == 0
      def relOf(n: Node): Boolean =
        if (!greedySel) true
        else n match {
          case g: GNode => isQuant(g) && g.relMark
          case _ => false
        }
      val b = Map.newBuilder[Int, Vector[(Boolean, Int, Boolean)]]
      def walk(n: Node, path: Vector[(Boolean, Int, Boolean)]): Unit =
        n match {
          case SNode(s, _) => b += s -> path
          case g: GNode =>
            g.children.zipWithIndex.foreach { case (c, i) =>
              walk(c, path :+ ((false, i, relOf(c)))) }
          case a: ANode =>
            a.branches.zipWithIndex.foreach { case (br, i) =>
              walk(br, path :+ ((true, i, false))) }
        }
      walk(realRoot, Vector.empty)
      b.result()
    }
    /** Slot → polarity of its innermost enclosing quantified group —
      * [[prefer]]'s strict-prefix rule: the continuation is more
      * repetitions of THAT loop, so reluctant ⇒ the shorter candidate
      * wins, greedy ⇒ the longer. */
    private[GroupCep] val slotEncRel: Map[Int, Boolean] = {
      def isQuant(g: GNode): Boolean =
        g.min != g.max || g.max > 1 || g.optional || g.min == 0
      val b = Map.newBuilder[Int, Boolean]
      def walk(n: Node, enc: Boolean): Unit = n match {
        case SNode(s, _) => b += s -> enc
        case g: GNode =>
          val e2 = if (!isQuant(g)) enc
                   else if (greedySel) g.relMark else true
          g.children.foreach(walk(_, e2))
        case a: ANode => a.branches.foreach(walk(_, enc))
      }
      walk(realRoot, enc = !greedySel)
      b.result()
    }
    /** Reluctant + any alternation anywhere ⇒ completion order no longer
      * equals preference order: drivers must defer per-start selection
      * (see [[GPattern.reluctant]]). */
    private[GroupCep] val reluctantDeferred: Boolean = reluctantSel && {
      def hasAlt(n: Node): Boolean = n match {
        case _: SNode => false
        case g: GNode => g.children.exists(hasAlt)
        case _: ANode => true
      }
      pattern.deferSel || realRoot.children.exists(hasAlt)
    }
    /** Any deferred per-start selection — the drivers' resolver
      * trigger: deferred reluctant (alternation/anchors) or GREEDY
      * selection, which is ALWAYS deferred (a longer, more-preferred
      * completion arrives after a shorter one by construction). */
    private[GroupCep] val selDeferred: Boolean =
      reluctantDeferred || greedySel
    /** ONE quantified element and no alternation ⇒ same-start
      * candidates differ only in that element's repetition count, so
      * candidate LENGTH decides preference in O(1) (shorter under
      * reluctant, longer under greedy) — [[prefer]]'s fast path, worth
      * it because greedy selection folds a candidate per possible
      * match end and the full walk is O(match length) each. */
    /** Polarity of THE quantifier when [[singleQuantNoAlt]] — set
      * during its walk (meaningful only when that flag holds).
      * Declared BEFORE the val whose initializer assigns it. */
    private[GroupCep] var singleQuantPrefersShorter: Boolean = true
    private[GroupCep] val singleQuantNoAlt: Boolean = {
      var quants = 0; var alt = false
      def walk(n: Node): Unit = n match {
        case _: SNode => ()
        case g: GNode =>
          if (g.min != g.max || g.max > 1 || g.optional || g.min == 0) {
            quants += 1
            singleQuantPrefersShorter = if (greedySel) g.relMark else true
          }
          g.children.foreach(walk)
        case a: ANode => alt = true; a.branches.foreach(walk)
      }
      realRoot.children.foreach(walk)
      quants == 1 && !alt
    }

    private def declMode(n: Node): Int = n match {
      case SNode(_, m) => m
      case g: GNode => g.mode
      case a: ANode => a.mode
    }
    /** Group ids strictly inside `g` (their counters reset on re-entry). */
    private def clearInside(g: GNode, reps: Map[Int, Int]): Map[Int, Int] = {
      def ids(n: Node): Vector[Int] = n match {
        case _: SNode => Vector.empty
        case gg: GNode => gg.id +: gg.children.flatMap(ids)
        case a: ANode => a.branches.flatMap(ids)
      }
      val inside = g.children.flatMap(ids)
      if (inside.isEmpty) reps else reps -- inside
    }

    /** Epsilon-enter an element with the boundary mode `mode`:
      * group entry resets its counters and may also skip it entirely.
      * `guard` carries a greedy group id whose exit led here (the target
      * slots are that loop's sink state). */
    private def enter(n: Node, mode: Int, reps: Map[Int, Int],
        out: scala.collection.mutable.Builder[At, Vector[At]], done: () => Unit,
        guard: Int): Unit = n match {
      case SNode(s, _) => out += At(s, mode, reps, guard)
      case g: GNode =>
        val r = clearInside(g, reps).updated(g.id, 0)
        enter(g.children.head, mode, r, out, done, guard)
        if (g.optional || g.min == 0)
          continueAfter(g, reps, out, done,
            if (g.greedy) g.id else guard)
      case a: ANode =>
        // fork: one epsilon branch per alternative, declaration order
        a.branches.foreach(b => enter(b, mode, reps, out, done, guard))
    }

    /** Epsilon-walk after completing element `n`: next sibling, or close a
      * repetition of the parent group (exit and/or loop-back forks), or
      * complete the pattern at the root. Exiting a GREEDY group stamps its
      * id as the guard on everything downstream of the exit — the sink
      * state whose transitions the reference conjoins with NOT(take). */
    private def continueAfter(n: Node, reps: Map[Int, Int],
        out: scala.collection.mutable.Builder[At, Vector[At]], done: () => Unit,
        guard: Int): Unit =
      parents.get(n) match {
        case None => done() // n is the root
        case Some(a: ANode) =>
          // completing any branch completes the alternation
          continueAfter(a, reps, out, done, guard)
        case Some(_: SNode) =>
          throw new IllegalStateException("a leaf cannot be a parent")
        case Some(p: GNode) =>
          val idx = p.children.indexWhere(_ eq n)
          if (idx < p.children.size - 1) {
            val sib = p.children(idx + 1)
            enter(sib, declMode(sib), reps, out, done, guard)
          } else if (p.id == realRoot.id) {
            done()
          } else {
            val r = reps.getOrElse(p.id, 0) + 1
            if (r >= p.min)
              continueAfter(p, reps - p.id, out, done,
                if (p.greedy) p.id else guard)
            if (r < p.max) {
              // unbounded loops: saturate the counter at p.min — both
              // future threshold reads (r' >= min always once reached;
              // r' < MaxValue always) are preserved, the reps map stops
              // churning allocations on every repetition, and succ
              // results become cacheable by (slot, reps) — see
              // [[SuccCache]]
              val rStore =
                if (p.max == Int.MaxValue && r > p.min) p.min else r
              val base = clearInside(p, reps)
              val r2 = if (base.getOrElse(p.id, -1) == rStore) base
                       else base.updated(p.id, rStore)
              enter(p.children.head, p.loopMode, r2, out, done, guard)
            }
          }
      }

    private[GroupCep] def succ(slot: Int,
        reps: Map[Int, Int]): (Vector[At], Boolean) = {
      val out = Vector.newBuilder[At]
      var complete = false
      continueAfter(slotNodes(slot), reps, out, () => complete = true, -1)
      (out.result(), complete)
    }
    /** [[succ]] is pure in (slot, reps) and — with the saturating rep
      * counters — the key space is bounded by the pattern structure for
      * unbounded loops, so the epsilon walk (child scans, clearInside
      * vectors, map churn) runs once per distinct key instead of once
      * per branch per event. LARGE FINITE quantifiers (`B{1,50000}`)
      * cannot saturate (the counter must reach max to close the loop),
      * so their key space is O(max) — the insert guard caps retention
      * and lets the tail of such patterns fall back to direct
      * computation (the pre-cache cost) instead of growing per-task
      * memory without bound. Each task deserializes its own Compiled
      * copy, so the map sees no real contention; ConcurrentHashMap just
      * makes sharing safe. */
    @transient private lazy val succCache = new java.util.concurrent
      .ConcurrentHashMap[(Int, Map[Int, Int]), (Vector[At], Boolean)]
    private val SuccCacheMax = 4096
    private[GroupCep] def succCached(slot: Int,
        reps: Map[Int, Int]): (Vector[At], Boolean) = {
      val k = (slot, reps)
      var v = succCache.get(k)
      if (v == null) {
        v = succ(slot, reps)
        if (succCache.size < SuccCacheMax) succCache.put(k, v)
      }
      v
    }
    private[GroupCep] lazy val startFrontier: Vector[At] = {
      val out = Vector.newBuilder[At]
      val first = realRoot.children.head
      enter(first, declMode(first), Map.empty, out, () => (), -1)
      out.result()
    }
    /** Greedy group id → its loop take condition (the disjunction of its
      * entry slots' predicates — NFACompiler's getTakeCondition operand of
      * updateWithGreedyCondition). */
    private val greedyGuards: Map[Int, Vector[Int]] = {
      def collect(n: Node): Vector[GNode] = n match {
        case _: SNode => Vector.empty
        case g: GNode => (if (g.greedy) Vector(g) else Vector.empty) ++
          g.children.flatMap(collect)
        case a: ANode => a.branches.flatMap(collect)
      }
      collect(realRoot).map(g => g.id -> firstSlots(g)).toMap
    }
    private[GroupCep] def guardHit(guard: Int, e: E): Boolean =
      guard >= 0 && greedyGuards(guard).exists(s => preds(s)(e))
    private[GroupCep] def predOf(s: Int): E => Boolean = preds(s)
    private[graft] def slotCount: Int = preds.length
    private[GroupCep] def nameOf(s: Int): String = names(s)
    /** Step name of a capture slot — the planned exec's ALL ROWS mode
      * maps each captured event's slot to its declared step index. */
    private[graft] def stepNameOf(s: Int): String = nameOf(s)
    private[GroupCep] def stopsFollowOf(s: Int): List[E => Boolean] =
      stopsFollow.getOrElse(s, Nil)
    private[GroupCep] def stopsNextOf(s: Int): List[E => Boolean] =
      stopsNext.getOrElse(s, Nil)
    private[GroupCep] def untilOf(s: Int): Option[E => Boolean] =
      slotUntil.get(s).map(untils)
    def stepNames: Vector[String] = names.distinct
  }

  def compile[E](pattern: GPattern[E]): Compiled[E] =
    new Compiled(pattern.validated)

  /** An in-flight branch: waiting on `slot` with consuming mode `mode`;
    * `fresh` = has not ignored an event since arriving (notNext window);
    * `guard` >= 0 = this branch exited that greedy group and dies on any
    * event its loop could have consumed (prefer-longer semantics).
    * `captured` is the branch's capture sequence in representation `C`
    * (see [[CapOps]]): the exact per-event vector, or the round-12
    * range-compressed [[SpanCaps]] runs for strict-contiguity batch
    * scans. */
  final case class Conf[E, C](slot: Int, mode: Int, reps: Map[Int, Int],
      captured: C, startTs: Long, fresh: Boolean,
      guard: Int = -1)

  /** The exact-capture branch type the streaming drivers persist in
    * keyed state (field-for-field the pre-round-12 GConf, so derived
    * state encoders keep their layout). */
  type GConf[E] = Conf[E, Vector[(Int, E)]]

  /** One run of a range-compressed capture sequence: `count` consecutive
    * captures into `slot`, with the run's first and last events retained
    * (everything any consumer needs: counts, FIRST() rows, skip-queue
    * boundaries, anchor tags). The reference's SharedBuffer stores the
    * same idea as per-step event-pointer chains
    * (flink-cep/src/main/java/.../nfa/SharedBuffer.java:71). */
  final case class CapRun[E](slot: Int, count: Int, first: E, last: E)

  /** Range-compressed captures: under STRICT contiguity a branch takes
    * every event from its first capture to its last, so the capture
    * sequence is fully described by run-length-encoded slots — O(#runs)
    * = O(pattern structure) per branch instead of O(match length).
    * Materializing the full per-event vector (library `toGroups`) needs
    * the key run's event array, which the batch drivers hold; equality
    * (branch dedup) is exact under contiguity: same first tag + same
    * runs ⇒ identical capture vectors (the closed/open split below is
    * deterministic in the append sequence, so structural equality
    * remains exact).
    *
    * The LAST run is held OPEN as flat fields instead of inside the
    * vector: the hot loop (every in-loop branch extends its current
    * run once per event) then allocates ONE small object per append —
    * a `Vector.updated` path-copy per event per branch was the
    * dominant allocation of the qc34-class greedy scans. `openSlot`
    * is -1 only for the empty capture. */
  final case class SpanCaps[E](closed: Vector[CapRun[E]], openSlot: Int,
      openCount: Int, openFirst: E, openLast: E, length: Int) {
    def runs: Vector[CapRun[E]] =
      if (openSlot < 0) closed
      else closed :+ CapRun(openSlot, openCount, openFirst, openLast)
  }

  /** Capture-sequence operations, the seam between the shared NFA /
    * emitters and the two representations. All per-event hot-path ops
    * (`append`, `length`) are O(1)-ish in both; the preference /
    * domination walks ride `runs`, which is O(match length) for the
    * exact vector but O(#quantifier transitions) for [[SpanCaps]] — the
    * round-12 fix for greedy/deferred selection's capture churn. */
  private[graft] sealed trait CapOps[E, C] extends Serializable {
    def empty: C
    def append(c: C, slot: Int, e: E): C
    def length(c: C): Int
    def isEmpty(c: C): Boolean
    def head(c: C): E
    def headOpt(c: C): Option[E]
    def last(c: C): E
    def runs(c: C): Iterator[CapRun[E]]
    /** Max of `f` over EVERY captured event. The vector path must walk
      * all elements — the streaming driver sorts only within each
      * micro-batch, so a cross-batch late event can put the max strictly
      * inside a compressed run; [[SpanCaps]] (batch-only, globally
      * ts-ordered runs) folds first/last per run, O(#runs). */
    def maxOver(c: C, f: E => Long): Long
    /** Cheap structural discriminator for match dedup (slots only). */
    def slotsKey(c: C): Any
    /** Full per-event capture vector — the library emission shape. */
    def toVector(c: C): Vector[(Int, E)]
  }

  private object VecOpsInst extends CapOps[Any, Vector[(Int, Any)]] {
    def empty: Vector[(Int, Any)] = Vector.empty
    def append(c: Vector[(Int, Any)], slot: Int, e: Any) = c :+ (slot -> e)
    def length(c: Vector[(Int, Any)]): Int = c.length
    def isEmpty(c: Vector[(Int, Any)]): Boolean = c.isEmpty
    def head(c: Vector[(Int, Any)]): Any = c.head._2
    def headOpt(c: Vector[(Int, Any)]): Option[Any] = c.headOption.map(_._2)
    def last(c: Vector[(Int, Any)]): Any = c.last._2
    def runs(c: Vector[(Int, Any)]): Iterator[CapRun[Any]] =
      new Iterator[CapRun[Any]] {
        private var i = 0
        def hasNext: Boolean = i < c.length
        def next(): CapRun[Any] = {
          val s = c(i)._1; val first = c(i)._2
          var j = i + 1
          while (j < c.length && c(j)._1 == s) j += 1
          val r = CapRun[Any](s, j - i, first, c(j - 1)._2)
          i = j
          r
        }
      }
    def slotsKey(c: Vector[(Int, Any)]): Any = c.map(_._1)
    def maxOver(c: Vector[(Int, Any)], f: Any => Long): Long = {
      var m = Long.MinValue
      c.foreach { p => val t = f(p._2); if (t > m) m = t }
      m
    }
    def toVector(c: Vector[(Int, Any)]): Vector[(Int, Any)] = c
  }
  private[graft] def vecOps[E]: CapOps[E, Vector[(Int, E)]] =
    VecOpsInst.asInstanceOf[CapOps[E, Vector[(Int, E)]]]

  /** [[SpanCaps]] operations. `posOf`/`eventAt` map captured events to
    * positions in the key run's event array (the arrival tag) — only
    * [[toVector]] consults them, and only under strict contiguity is
    * the position-range expansion valid (which [[Compiled.strictSpans]]
    * gates). Drivers without an event buffer (the planned exec) pass a
    * throwing `eventAt` and never materialize. */
  private[graft] final class SpanOps[E](posOf: E => Int, eventAt: Int => E)
      extends CapOps[E, SpanCaps[E]] {
    private val nil = null.asInstanceOf[E]
    def empty: SpanCaps[E] = SpanCaps(Vector.empty, -1, 0, nil, nil, 0)
    def append(c: SpanCaps[E], slot: Int, e: E): SpanCaps[E] =
      if (c.openSlot == slot)
        // hot path: extend the open run — one allocation
        c.copy(openCount = c.openCount + 1, openLast = e,
          length = c.length + 1)
      else if (c.openSlot < 0) SpanCaps(Vector.empty, slot, 1, e, e, 1)
      else SpanCaps(
        c.closed :+ CapRun(c.openSlot, c.openCount, c.openFirst, c.openLast),
        slot, 1, e, e, c.length + 1)
    def length(c: SpanCaps[E]): Int = c.length
    def isEmpty(c: SpanCaps[E]): Boolean = c.length == 0
    def head(c: SpanCaps[E]): E =
      if (c.closed.nonEmpty) c.closed.head.first else c.openFirst
    def headOpt(c: SpanCaps[E]): Option[E] =
      if (c.length == 0) None else Some(head(c))
    def last(c: SpanCaps[E]): E = c.openLast
    def runs(c: SpanCaps[E]): Iterator[CapRun[E]] = c.runs.iterator
    def slotsKey(c: SpanCaps[E]): Any = c.runs.map(r => (r.slot, r.count))
    def maxOver(c: SpanCaps[E], f: E => Long): Long = {
      // batch-only representation: key runs are globally ts-ordered,
      // so each run's max is at its boundary — first/last suffice
      var m = Long.MinValue
      c.runs.foreach { r =>
        val tl = f(r.last); if (tl > m) m = tl
        val tf = f(r.first); if (tf > m) m = tf
      }
      m
    }
    def toVector(c: SpanCaps[E]): Vector[(Int, E)] =
      if (c.length == 0) Vector.empty
      else {
        val p0 = posOf(c.runs.head.first)
        val b = Vector.newBuilder[(Int, E)]
        b.sizeHint(c.length)
        var i = 0
        c.runs.foreach { r =>
          var k = 0
          while (k < r.count) { b += ((r.slot, eventAt(p0 + i))); i += 1; k += 1 }
        }
        b.result()
      }
  }

  /** One NFA transition over all live branches. Pure; shared by the batch
    * and streaming drivers. Returns surviving branches and completed
    * matches as (slotIdx, event) capture lists in match order. */
  def advance[E](c: Compiled[E], confs: Vector[GConf[E]], e: E,
      ts: Long, canStart: Boolean = true)
      : (Vector[GConf[E]], Vector[Vector[(Int, E)]]) =
    advanceC(c, confs, e, ts, canStart, vecOps[E])

  /** [[advance]] generic over the capture representation `C` — the one
    * NFA every driver (batch vector, batch span-compressed, streaming,
    * planned exec) steps through. */
  private[graft] def advanceC[E, C](c: Compiled[E], confs: Vector[Conf[E, C]],
      e: E, ts: Long, canStart: Boolean, ops: CapOps[E, C])
      : (Vector[Conf[E, C]], Vector[C]) = {
    val alive = c.withinMs match {
      case None => confs
      case Some(w) => confs.filter(p => ts - p.startTs < w)
    }
    val out = Vector.newBuilder[Conf[E, C]]
    val matches = Vector.newBuilder[C]

    // Per-EVENT memo of the slot-keyed predicate evaluations: every
    // live branch waiting on the same slot asks the same questions of
    // the same event (the qc34-class greedy scans hold O(open starts)
    // branches in ONE loop slot), so evaluate each at most once.
    // Long bitmask pairs (evaluated, value) — zero allocation up to 64
    // slots; wider patterns fall back to direct evaluation. Guards
    // (greedy-group ids, not slot-bounded) get a 1-entry cache: every
    // post-loop branch of one pattern shares one guard id in practice.
    val memoizable = c.slotCount <= 64
    var predE, predV, stopFE, stopFV, stopNE, stopNV, untilE, untilV = 0L
    def predM(s: Int): Boolean =
      if (!memoizable) c.predOf(s)(e)
      else {
        val bit = 1L << s
        if ((predE & bit) != 0L) (predV & bit) != 0L
        else {
          val r = c.predOf(s)(e); predE |= bit; if (r) predV |= bit; r
        }
      }
    def stopFM(s: Int): Boolean =
      if (!memoizable) c.stopsFollowOf(s).exists(_(e))
      else {
        val bit = 1L << s
        if ((stopFE & bit) != 0L) (stopFV & bit) != 0L
        else {
          val r = c.stopsFollowOf(s).exists(_(e))
          stopFE |= bit; if (r) stopFV |= bit; r
        }
      }
    def stopNM(s: Int): Boolean =
      if (!memoizable) c.stopsNextOf(s).exists(_(e))
      else {
        val bit = 1L << s
        if ((stopNE & bit) != 0L) (stopNV & bit) != 0L
        else {
          val r = c.stopsNextOf(s).exists(_(e))
          stopNE |= bit; if (r) stopNV |= bit; r
        }
      }
    def untilM(s: Int): Boolean =
      if (!memoizable) c.untilOf(s).exists(_(e))
      else {
        val bit = 1L << s
        if ((untilE & bit) != 0L) (untilV & bit) != 0L
        else {
          val r = c.untilOf(s).exists(_(e))
          untilE |= bit; if (r) untilV |= bit; r
        }
      }
    var guardQ = -2; var guardR = false
    def guardM(g: Int): Boolean =
      g >= 0 && {
        if (g != guardQ) { guardQ = g; guardR = c.guardHit(g, e) }
        guardR
      }

    def fire(conf: Conf[E, C]): Unit = {
      val cap2 = ops.append(conf.captured, conf.slot, e)
      val (targets, complete) = c.succCached(conf.slot, conf.reps)
      if (complete) matches += cap2
      targets.foreach { t =>
        out += Conf(t.slot, t.mode, t.reps, cap2, conf.startTs,
          fresh = true, guard = t.guard)
      }
    }

    alive.foreach { conf =>
      // greedy: a branch past a greedy loop dies on any event that loop
      // could have consumed — NOT(take) on every sink transition
      val greedyKill = guardM(conf.guard)
      val stopped = stopFM(conf.slot) || (conf.fresh && stopNM(conf.slot))
      val untilKill = untilM(conf.slot)
      if (!greedyKill && !stopped && !untilKill) {
        val takes = predM(conf.slot)
        if (takes) {
          fire(conf)
          // TILL_ANY: the waiting branch survives its own take and can
          // re-fire on a later occurrence
          if (conf.mode == TillAny) out += conf.copy(fresh = false)
        } else if (conf.mode != Strict) {
          out += conf.copy(fresh = false) // ignore edge
        } // strict: branch dies
      } // stop/until: branch dies
    }

    // the start state is always active: try to open new branches. A
    // frontier entry past an optional greedy loop carries that loop's
    // guard — the reference conjoins NOT(take) on ALL sink-state
    // transitions (updateWithGreedyCondition), so an event the loop could
    // have consumed must not start a match at the post-loop step.
    // `canStart = false` is the streaming ^ head-anchor gate (round 11):
    // only the key's arrival-0 event may open a branch, so every
    // candidate is partition-head-anchored by construction.
    if (canStart) c.startFrontier.foreach { t =>
      if (!guardM(t.guard) && predM(t.slot))
        fire(Conf(t.slot, t.mode, t.reps, ops.empty, ts, fresh = true))
    }
    var outConfs = {
      val o = out.result()
      if (c.noEpsilonDup && !c.forceEpsilonDedup) o
      else dedupBy(o)(c =>
        (c.slot, c.mode, c.reps, c.startTs, c.fresh, c.guard,
          ops.length(c.captured)))
    }
    var ms = dedupBy(matches.result())(m => (ops.length(m), ops.slotsKey(m)))
    // SQL:2016 reluctant (GPattern.reluctant, single-quantifier
    // contract) WITHOUT alternation: the FIRST completion per start is
    // the shortest and therefore THE match — keep only it among
    // same-event siblings and kill every still-open branch sharing that
    // start, so no later (longer, less preferred) completion can
    // surface. One site covers every driver (batch, streaming state
    // fns, planned GroupCepExec). With alternation the first completion
    // may not be preferred — the drivers defer through
    // [[ReluctantResolver]] instead (reluctantDeferred).
    if (c.reluctantSel && !c.reluctantDeferred && ms.nonEmpty) {
      val byStart = scala.collection.mutable.LinkedHashMap.empty[E, C]
      ms.foreach { m =>
        val s = ops.head(m)
        byStart.get(s) match {
          // several same-start candidates CAN complete on one event
          // under multiple quantifiers (different B/C splits reaching
          // the final element together) — fold by the full preference
          // order, not completion length
          case Some(prev) => byStart(s) = preferC(c, prev, m, ops)
          case _ => byStart(s) = m
        }
      }
      val starts = byStart.keySet
      ms = byStart.values.toVector
      outConfs = outConfs.filterNot(
        p => ops.headOpt(p.captured).exists(starts.contains))
    }
    (outConfs, ms)
  }

  /** Order-preserving dedup that hashes only a cheap structural key and
    * deep-compares solely within same-key buckets. A plain `.distinct`
    * hashes every GConf's full `captured` event vector on every event —
    * O(match length) per branch per event, quadratic along a long
    * `oneOrMore` scan. Epsilon-fork duplicates always share (slot, mode,
    * reps, startTs, length), so the cheap key finds them; buckets are
    * near-always singletons. */
  private def dedupBy[T](xs: Vector[T])(cheap: T => Any): Vector[T] =
    if (xs.length <= 1) xs
    else {
      val buckets = scala.collection.mutable.HashMap.empty[Any, List[T]]
      val b = Vector.newBuilder[T]
      xs.foreach { x =>
        val k = cheap(x)
        val seen = buckets.getOrElse(k, Nil)
        if (!seen.contains(x)) { buckets(k) = x :: seen; b += x }
      }
      b.result()
    }

  /** SQL:2016 lexicographic preference between two SAME-START candidate
    * matches of a reluctant pattern. Walk the consumed-slot sequences;
    * at the first diverging position the two slots' structural paths
    * ([[Compiled.slotPath]]) share a prefix, and their first differing
    * entry names the decision the derivations took differently:
    *  - alternation level → lower branch index wins (leftmost — and
    *    branch preference DOMINATES any reluctant loop inside the
    *    branches: `(A+?|B)` prefers the A branch however many reps it
    *    costs, which a flat group-membership rule would get backwards);
    *  - sequence level → higher child index wins (the candidate that
    *    exited/skipped the earlier reluctant subtree — fewest of the
    *    FIRST quantifier dominates, then the second: the `V B+? C+? E`
    *    ranking).
    * A strict prefix (one candidate completed, the other kept
    * consuming) prefers the SHORTER: with every quantifier reluctant,
    * the continuation can only be more repetitions of some reluctant
    * loop. Returns the preferred candidate. */
  private def preferC[E, C](c: Compiled[E], a: C, b: C,
      ops: CapOps[E, C]): C = {
    val la = ops.length(a); val lb = ops.length(b)
    if ((c.reluctantSel || c.greedySel) && c.singleQuantNoAlt) {
      // single decision point: length IS the preference, by the
      // quantifier's own polarity
      return if (la == lb) a
      else if (c.singleQuantPrefersShorter == (la < lb)) a
      else b
    }
    // walk the two run-length-encoded slot sequences to the first
    // diverging CAPTURE position — O(#runs), not O(match length)
    val ia = ops.runs(a); val ib = ops.runs(b)
    var sa = -1; var ra = 0
    var sb = -1; var rb = 0
    var cont = true
    while (cont) {
      if (ra == 0 && ia.hasNext) { val r = ia.next(); sa = r.slot; ra = r.count }
      if (rb == 0 && ib.hasNext) { val r = ib.next(); sb = r.slot; rb = r.count }
      if (ra > 0 && rb > 0) {
        if (sa != sb) return if (slotWins(c, sa, sb)) a else b
        val k = math.min(ra, rb); ra -= k; rb -= k
      } else cont = false
    }
    // strict prefix: the continuation is more repetitions of the loop
    // enclosing the longer candidate's next slot — reluctant polarity
    // prefers the SHORTER candidate, greedy the LONGER
    if (la == lb) a
    else {
      // the side with input left holds the continuation slot (its
      // current run is the longer candidate's slot at position min(la,lb))
      val contSlot = if (ra > 0) sa else sb
      val contRel = c.slotEncRel.getOrElse(contSlot, !c.greedySel)
      if (contRel == (la < lb)) a else b
    }
  }

  /** The slot-level decision of [[prefer]]: does consuming `sa` at the
    * first diverging position beat consuming `sb`? (See
    * [[Compiled.slotPath]] for the lattice rules.) */
  private def slotWins[E](c: Compiled[E], sa: Int, sb: Int): Boolean = {
    val pa = c.slotPath(sa); val pb = c.slotPath(sb)
    val nd = math.min(pa.length, pb.length)
    var d = 0
    while (d < nd && pa(d) == pb(d)) d += 1
    // two distinct leaves always diverge at a structural level before
    // either path ends (a leaf cannot be another leaf's ancestor); the
    // guard is defensive only
    if (d >= nd) sa < sb
    else if (pa(d)._1) pa(d)._2 < pb(d)._2
    else {
      // sequence level: the decision belongs to the EARLIER subtree
      // (the one the lower-index side stayed in / entered) — its
      // reluctant polarity says whether exiting (higher index) wins
      val aLower = pa(d)._2 < pb(d)._2
      val lowerRel = if (aLower) pa(d)._3 else pb(d)._3
      if (lowerRel) !aLower else aLower
    }
  }

  /** Deferred per-start selection for reluctant patterns WITH
    * alternation ([[Compiled.reluctantDeferred]]): buffers the best
    * candidate per match start (folding with [[prefer]]) and releases a
    * start only when no open branch sharing it remains — at which point
    * the buffered candidate is THE SQL:2016-preferred match. Pending
    * candidates serialize as plain capture vectors, so the streaming
    * driver carries them in [[GStreamState.pending]] across
    * micro-batches exactly like skip-deferred matches. */
  private final class ReluctantResolver[E, C](c: Compiled[E], ts: E => Long,
      ops: CapOps[E, C]) {
    private val best = scala.collection.mutable.LinkedHashMap.empty[E, C]

    def toPending: Vector[C] = best.values.toVector
    def restore(ms: Vector[C]): Unit =
      ms.foreach(m => best(ops.head(m)) = m)

    def add(ms: Vector[C]): Unit = ms.foreach { m =>
      val s = ops.head(m)
      best(s) = best.get(s).map(p => preferC(c, p, m, ops)).getOrElse(m)
    }

    /** Emit every buffered start that no open branch can still extend,
      * in start order (ties by buffer insertion = first completion). */
    def drain(confs: Vector[Conf[E, C]], emit: C => Unit): Unit = {
      if (best.isEmpty) return
      val open = confs.iterator
        .flatMap(p => ops.headOpt(p.captured)).toSet
      val ready = best.keysIterator.filterNot(open.contains).toVector
        .sortBy(e => ts(e))
      ready.foreach { s => emit(best(s)); best -= s }
    }

    /** Drop buffered starts an AFTER MATCH SKIP emission consumed —
      * the same boundary rule [[GroupSkipQueue]] applies to open
      * branches and queued matches. */
    def prune(keep: Long => Boolean): Unit = {
      val dead = best.keysIterator.filterNot(e => keep(ts(e))).toVector
      dead.foreach(best -= _)
    }

    /** Kill open branches that can no longer produce their start's
      * winner: a branch whose captured prefix DIVERGES from the
      * buffered best and loses at the divergence is dominated — every
      * extension diverges at the same position and loses identically
      * (the preference is prefix-stable), so carrying it only breeds
      * dominated candidates. Branches still tracking the best (no
      * divergence yet) must stay: their extensions may beat it. The
      * deferral's cost collapses from O(candidates) to ~O(starts)
      * live branches once each start has a buffered best — dominated
      * branches die the event after they fall behind. Also RELEASES
      * starts sooner (fewer blockers for [[drain]]), with the same
      * winners: pruned branches' completions were all dominated.
      * Round 12: the prefix walk rides the run-length encoding —
      * O(#runs) per branch, not O(match length). */
    def pruneDominated(confs: Vector[Conf[E, C]]): Vector[Conf[E, C]] =
      if (best.isEmpty) confs
      else confs.filter { conf =>
        ops.headOpt(conf.captured).forall { h =>
          best.get(h).forall { m =>
            // keep unless the prefix diverges AND loses there
            val ip = ops.runs(conf.captured); val im = ops.runs(m)
            var sp = -1; var rp = 0
            var sm = -1; var rm = 0
            var keep = true
            var cont = true
            while (cont) {
              if (rp == 0 && ip.hasNext) {
                val r = ip.next(); sp = r.slot; rp = r.count
              }
              if (rm == 0 && im.hasNext) {
                val r = im.next(); sm = r.slot; rm = r.count
              }
              if (rp > 0 && rm > 0) {
                if (sp != sm) { keep = slotWins(c, sp, sm); cont = false }
                else { val k = math.min(rp, rm); rp -= k; rm -= k }
              } else cont = false
            }
            keep
          }
        }
      }
  }

  /** Shapes a capture list into step-name → events (capture order). */
  def toGroups[E](c: Compiled[E],
      captured: Vector[(Int, E)]): Map[String, Seq[E]] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Vector[E]]
    c.stepNames.foreach(n => m(n) = Vector.empty)
    captured.foreach { case (s, e) => val n = c.nameOf(s); m(n) = m(n) :+ e }
    // ListMap keeps declaration-order iteration (a plain .toMap would
    // re-hash away the LinkedHashMap order for >4 steps)
    scala.collection.immutable.ListMap(m.toSeq: _*)
  }

  /** Lift a group pattern over arrival-tagged events: every predicate
    * reads through the wrapper, so structural branch dedup then keys on
    * the tag — the reference's SharedBuffer EventId identity, exactly
    * [[Cep.liftPattern]] for the group engine. */
  private def liftElem[E](e: GElem[E]): GElem[(E, Long)] = e match {
    case GLeaf(n, p, m) => GLeaf(n, (w: (E, Long)) => p(w._1), m)
    case g: GGroup[E] => GGroup(g.elems.map(liftElem[E]), g.mode, g.min,
      g.max, g.optional, g.loopMode,
      g.untilPred.map(up => (w: (E, Long)) => up(w._1)), g.greedy,
      g.relMark)
    case GNot(n, p, no) => GNot(n, (w: (E, Long)) => p(w._1), no)
    case a: GAlt[E] => GAlt(a.branches.map(_.map(liftElem[E])), a.mode)
  }
  private[streaming] def liftG[E](p: GPattern[E]): GPattern[(E, Long)] =
    new GPattern(p.elems.map(liftElem[E]), p.withinMs, p.reluctantSel,
      p.deferSel, p.greedySel, arrivalTagged = true)

  /** Un-tag a capture map, preserving declaration order. */
  private def unliftGroups[E](groups: Map[String, Seq[(E, Long)]]):
      Map[String, Seq[E]] =
    scala.collection.immutable.ListMap(groups.toSeq
      .map { case (n, g) => n -> g.map(_._1) }: _*)

  /** Per-key-run emission policy unifying the batch drivers and the
    * PLANNED [[graft.plans.GroupCepPlan.GroupCepExec]] operator — ONE
    * source of truth for the SQL:2016 evaluation order (anchor-gate,
    * then preference-select, then after-match skip):
    *  - anchors set ⇒ every candidate buffers to the end of the key run
    *    (the first completion per start may fail an anchor a longer
    *    candidate passes), then the gates filter on arrival tags, the
    *    most-preferred gate-passing candidate per start wins, and
    *    emission is start-ordered — requires the pattern compiled with
    *    [[GPattern.deferredReluctant]] so [[advance]]'s in-flight
    *    shortest-per-start kill stays off;
    *  - deferred reluctant (alternation) ⇒ [[ReluctantResolver]];
    *  - non-default skip ⇒ [[GroupSkipQueue]] (composing with the
    *    resolver when both apply);
    *  - otherwise matches emit as [[advance]] produces them.
    * `tagOf` supplies the arrival ordinal consulted by the anchor
    * gates. Call [[step]] after each advance (it returns the possibly
    * skip-pruned branch set) and [[finish]] once at end of the run. */
  private[graft] final class GroupRunEmitter[E, C](
      c: Compiled[E], ts: E => Long, skip: Cep.AfterMatchSkip,
      anchorHead: Boolean, anchorTail: Boolean, tagOf: E => Long,
      ops: CapOps[E, C]) {
    private val anchored = anchorHead || anchorTail
    if (anchored) {
      require((c.reluctantSel && c.reluctantDeferred) || c.greedySel,
        "anchor gates need DEFERRED selection (compile a reluctant " +
          "pattern with deferredReluctant; greedy selection always " +
          "defers) — the gate-then-select order cannot run on " +
          "in-flight-killed candidates")
    }
    // anchored: per start, the most-preferred candidate STILL able to
    // pass the gates — O(starts) memory, not O(candidates). The ^ gate
    // is decidable at completion (head tag 0: filter at add). The $
    // gate folds VERSIONED by each candidate's last captured tag:
    // events arrive in tag order, so a newly completed candidate ends
    // at-or-after every buffered one, and a buffered candidate ending
    // EARLIER is already dead (the run now provably extends past it) —
    // replace it; equal ends compete on [[preferC]]. Equivalent to
    // buffering every candidate and gate-then-select at run end, which
    // is what O(views x errors) per key would have cost at 100x scale.
    private val aBest =
      if (anchored) scala.collection.mutable.LinkedHashMap
        .empty[E, (Long, C)]
      else null
    private val rr =
      if (!anchored && c.selDeferred) new ReluctantResolver[E, C](c, ts, ops)
      else null
    // round 11: anchors × skip composes — the SQL:2016 evaluation
    // order is gate, then select, then skip, so under anchors the
    // queue only runs at [[finish]], over the gate-passing selected
    // candidates (no live branch can block: the run has ended)
    private val sq =
      if (skip != Cep.NoSkip) new GroupSkipQueue[E, C](skip, c, ts, ops, rr)
      else null

    def step(confs: Vector[Conf[E, C]], ms: Vector[C],
        emit: C => Unit): Vector[Conf[E, C]] =
      if (anchored) {
        ms.foreach { m =>
          if (!anchorHead || tagOf(ops.head(m)) == 0L) {
            val s0 = ops.head(m)
            if (anchorTail) {
              val lt = tagOf(ops.last(m))
              aBest.get(s0) match {
                case Some((plt, p)) if plt == lt =>
                  aBest(s0) = (lt, preferC(c, p, m, ops))
                case Some((plt, _)) if plt > lt => () // defensive: tag order
                case _ => aBest(s0) = (lt, m)
              }
            } else aBest(s0) = (0L,
              aBest.get(s0).map(p => preferC(c, p._2, m, ops)).getOrElse(m))
          }
        }
        confs
      }
      else if (rr != null && sq != null) {
        rr.add(ms)
        // domination can only change when a fold just ran — skipping
        // the scan on quiet events keeps its cost proportional to
        // completions, not to run length (missing a prune is only a
        // perf, never a correctness, matter)
        val live = if (ms.isEmpty) confs else rr.pruneDominated(confs)
        rr.drain(live, m => sq.add(Vector(m)))
        sq.drain(live, emit)
      } else if (rr != null) {
        rr.add(ms)
        val live = if (ms.isEmpty) confs else rr.pruneDominated(confs)
        rr.drain(live, emit)
        live
      }
      else if (sq == null) { ms.foreach(emit); confs }
      else { sq.add(ms); sq.drain(confs, emit) }

    /** End of the key run; `lastTag` = the run's highest arrival tag
      * (only consulted by the $ gate). */
    def finish(lastTag: Long, emit: C => Unit): Unit =
      if (anchored) {
        val selected = aBest.iterator.collect {
          case (_, (lt, m)) if !anchorTail || lt == lastTag => m
        }.toVector
          .sortBy(m => (ts(ops.head(m)), tagOf(ops.head(m))))
        if (sq == null) selected.foreach(emit)
        else {
          // skip runs LAST: over the selected matches in start order
          // (under $ every match ends at the partition tail, so PAST
          // LAST ROW collapses to the earliest start — the boundary
          // rule, not an arbitrary pick)
          sq.add(selected)
          sq.drain(Vector.empty, emit)
        }
      } else {
        if (rr != null) rr.drain(Vector.empty,
          m => if (sq != null) sq.add(Vector(m)) else emit(m))
        if (sq != null) sq.drain(Vector.empty, emit)
      }
  }

  /** Per-step-name capture summary straight off the run encoding —
    * (count, first captured event) per name in capture order, exactly
    * the planned [[graft.plans.GroupCepPlan.GroupCepExec]] output shape,
    * with NO materialization of the full capture vector. */
  private[graft] def groupFirsts[E, C](c: Compiled[E], m: C,
      ops: CapOps[E, C])
      : scala.collection.mutable.LinkedHashMap[String, (Long, E)] = {
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, (Long, E)]
    ops.runs(m).foreach { r =>
      val n = c.nameOf(r.slot)
      acc.get(n) match {
        case Some((cnt, first)) => acc(n) = (cnt + r.count, first)
        case None => acc(n) = (r.count.toLong, r.first)
      }
    }
    acc
  }

  /** One key's bounded scan: the shared NFA + after-match skip queue —
    * generic over the capture representation (the span-compressed path
    * is picked by callers when [[Compiled.strictSpans]]). */
  private def runKeyCore[K, E2, O, C](k: K, events: Vector[E2],
      ts: E2 => Long, compiled: Compiled[E2], skip: Cep.AfterMatchSkip,
      finish: (K, Map[String, Seq[E2]]) => O,
      stats: Cep.HotKeyStats, ops: CapOps[E2, C]): Vector[O] = {
    var confs = Vector.empty[Conf[E2, C]]
    val outs = Vector.newBuilder[O]
    // reluctant + non-default skip composes since round 10; the emitter
    // owns the resolver/skip-queue interplay (see [[GroupRunEmitter]])
    val em = new GroupRunEmitter[E2, C](compiled, ts, skip,
      anchorHead = false, anchorTail = false, tagOf = _ => 0L, ops)
    def emitOut(m: C): Unit =
      outs += finish(k, toGroups(compiled, ops.toVector(m)))
    var maxConfs = 0
    events.foreach { e =>
      val (next, ms) = advanceC(compiled, confs, e, ts(e), canStart = true,
        ops)
      if (stats != null && next.size > maxConfs) maxConfs = next.size
      confs = em.step(next, ms, emitOut)
    }
    // end of input: no live branch blocks emission any more
    em.finish(events.size.toLong - 1, emitOut)
    if (stats != null) {
      stats.maxKeyEvents.add(events.size.toLong)
      stats.maxPartials.add(maxConfs.toLong)
    }
    outs.result()
  }

  /** [[runKeyCore]] with the exact-vector representation. */
  private def runKeyBatch[K, E2, O](k: K, events: Vector[E2],
      ts: E2 => Long, compiled: Compiled[E2], skip: Cep.AfterMatchSkip,
      finish: (K, Map[String, Seq[E2]]) => O,
      stats: Cep.HotKeyStats = null): Vector[O] =
    runKeyCore(k, events, ts, compiled, skip, finish, stats, vecOps[E2])

  /** Span ops over an arrival-tagged key run: positions ARE the tags
    * (the drivers zipWithIndex), so materialization indexes the run. */
  private def spanOpsFor[E](events: Vector[(E, Long)])
      : CapOps[(E, Long), SpanCaps[(E, Long)]] =
    new SpanOps[(E, Long)](_._2.toInt, i => events(i))

  /** Test seam: ONE key run under an EXPLICIT capture representation.
    * The representation choice is a pure optimization — the vec-vs-span
    * equivalence property (PropertySpec) drives random strict patterns
    * through both and asserts identical match sequences, which the
    * drivers' automatic `strictSpans` routing is not directly testable
    * for (they pick one representation). */
  /** Test seam: whether the lifted form of `pattern` takes the
    * [[Compiled.noEpsilonDup]] dedup skip — the differential property
    * asserts its patterns actually exercise the skip. */
  private[graft] def noEpsilonDupForTest[E](pattern: GPattern[E]): Boolean =
    compile(liftG(pattern)).noEpsilonDup

  private[graft] def runKeyRepForTest[E](events: Vector[E], ts: E => Long,
      pattern: GPattern[E], skip: Cep.AfterMatchSkip, useSpans: Boolean,
      forceDedup: Boolean = false): Vector[Map[String, Seq[E]]] = {
    val compiled = compile(liftG(pattern))
    compiled.forceEpsilonDedup = forceDedup
    require(!useSpans || compiled.strictSpans,
      "span representation requires an all-strict pattern")
    val wrapped = events.zipWithIndex.map { case (e, i) => (e, i.toLong) }
    val fin = (_: Unit, g: Map[String, Seq[(E, Long)]]) => unliftGroups(g)
    if (useSpans)
      runKeyCore[Unit, (E, Long), Map[String, Seq[E]], SpanCaps[(E, Long)]](
        (), wrapped, w => ts(w._1), compiled, skip, fin, null,
        spanOpsFor(wrapped))
    else
      runKeyCore[Unit, (E, Long), Map[String, Seq[E]],
        Vector[(Int, (E, Long))]](
        (), wrapped, w => ts(w._1), compiled, skip, fin, null,
        vecOps[(E, Long)])
  }

  /** One key's bounded scan for RELUCTANT patterns under ^/\$ PARTITION
    * ANCHORS (batch only — the [[Cep.matchBatchGroups]] anchored twin):
    * every candidate match is buffered to end of input (no in-scan
    * selection: the first completion per start may FAIL an anchor that
    * a longer same-start candidate passes), then the anchor gates
    * filter on the arrival tags (head ⇒ first captured row is tag 0,
    * tail ⇒ last captured row is the partition's last tag), and the
    * most-preferred GATE-PASSING candidate per start emits — anchors
    * participate in matching BEFORE preference selection, the SQL:2016
    * order. */
  private def runKeyAnchoredReluctant[K, E, O](k: K,
      events: Vector[(E, Long)], ts: ((E, Long)) => Long,
      compiled: Compiled[(E, Long)], anchorHead: Boolean,
      anchorTail: Boolean, skip: Cep.AfterMatchSkip,
      finish: (K, Map[String, Seq[(E, Long)]]) => O): Vector[O] =
    if (compiled.strictSpans)
      runKeyAnchoredCore(k, events, ts, compiled, anchorHead, anchorTail,
        skip, finish, spanOpsFor(events))
    else
      runKeyAnchoredCore(k, events, ts, compiled, anchorHead, anchorTail,
        skip, finish, vecOps[(E, Long)])

  private def runKeyAnchoredCore[K, E, O, C](k: K,
      events: Vector[(E, Long)], ts: ((E, Long)) => Long,
      compiled: Compiled[(E, Long)], anchorHead: Boolean,
      anchorTail: Boolean, skip: Cep.AfterMatchSkip,
      finish: (K, Map[String, Seq[(E, Long)]]) => O,
      ops: CapOps[(E, Long), C]): Vector[O] = {
    var confs = Vector.empty[Conf[(E, Long), C]]
    val em = new GroupRunEmitter[(E, Long), C](compiled, ts, skip,
      anchorHead, anchorTail, tagOf = _._2, ops)
    events.foreach { e =>
      val (next, ms) = advanceC(compiled, confs, e, ts(e), canStart = true,
        ops)
      confs = em.step(next, ms, _ => ())
    }
    val outs = Vector.newBuilder[O]
    em.finish(events.size.toLong - 1,
      m => outs += finish(k, toGroups(compiled, ops.toVector(m))))
    outs.result()
  }

  /** Pure single-key batch run over in-order events — the property-test
    * seam onto the batch drivers (compile + arrival tags + the
    * [[GroupRunEmitter]] end-of-input flush), exactly what
    * [[matchBatchGroups]] does per key without a Dataset/session. */
  private[graft] def runKeyEvents[E, O](events: Vector[E], ts: E => Long,
      pattern: GPattern[E], skip: Cep.AfterMatchSkip = Cep.NoSkip,
      anchorHead: Boolean = false, anchorTail: Boolean = false)(
      finish: Map[String, Seq[E]] => O): Vector[O] = {
    val wrapped = events.zipWithIndex.map { case (e, i) => (e, i.toLong) }
    if (anchorHead || anchorTail) {
      val compiled = compile(liftG(pattern.deferredReluctant))
      runKeyAnchoredReluctant[Unit, E, O]((), wrapped, w => ts(w._1),
        compiled, anchorHead, anchorTail, skip,
        (_, groups) => finish(unliftGroups(groups)))
    } else {
      val compiled = compile(liftG(pattern))
      if (compiled.strictSpans)
        runKeyCore[Unit, (E, Long), O, SpanCaps[(E, Long)]]((), wrapped,
          w => ts(w._1), compiled, skip,
          (_, groups) => finish(unliftGroups(groups)), null,
          spanOpsFor(wrapped))
      else
        runKeyBatch[Unit, (E, Long), O]((), wrapped, w => ts(w._1), compiled,
          skip, (_, groups) => finish(unliftGroups(groups)))
    }
  }

  /** Run a group pattern over a batch Dataset: one event-time-sorted scan
    * per key (the [[Cep.matchBatchGroups]] twin for group patterns).
    * `skip` runs the reference's deferred-emission after-match machinery
    * with the same semantics as [[Cep.SkipQueue]], over group captures.
    * `arrivalIds` (DEFAULT) runs the reference's SharedBuffer EventId
    * identity: value-identical events at one timestamp are distinct
    * branch states, like the linear drivers since round 8. */
  def matchBatchGroups[K, E, O: Encoder](ds: Dataset[E], key: E => K,
      ts: E => Long, pattern: GPattern[E],
      tie: E => Long = (_: E) => 0L,
      skip: Cep.AfterMatchSkip = Cep.NoSkip,
      arrivalIds: Boolean = true,
      stats: Cep.HotKeyStats = null,
      anchorHead: Boolean = false,
      anchorTail: Boolean = false)(
      finish: (K, Map[String, Seq[E]]) => O)(
      implicit ke: Encoder[K]): Dataset[O] =
    if (anchorHead || anchorTail) {
      // the reluctant × anchors composition (see runKeyAnchoredReluctant);
      // round 11: non-default skip composes too (gate → select → skip),
      // and so does GREEDY selection (already deferred — the gate
      // filters candidates, then the greedy preference selects)
      require(arrivalIds, "anchor gates need arrival identity")
      val compiled = compile(liftG(
        if (pattern.greedySel) pattern else pattern.deferredReluctant))
      require(compiled.reluctantSel || compiled.greedySel,
        "anchor gates are a selection-mode composition (reluctant or " +
          "greedySelect); plain anchored group patterns post-filter on " +
          "boundary flags instead")
      ds.groupByKey(key).flatMapGroups { (k: K, it: Iterator[E]) =>
        val wrapped = it.toVector.sortBy(e => (ts(e), tie(e)))
          .zipWithIndex.map { case (e, i) => (e, i.toLong) }
        runKeyAnchoredReluctant[K, E, O](k, wrapped, w => ts(w._1),
          compiled, anchorHead, anchorTail, skip,
          (kk, groups) => finish(kk, unliftGroups(groups))).iterator
      }
    } else if (!arrivalIds) {
      val compiled = compile(pattern)
      ds.groupByKey(key).flatMapGroups { (k: K, it: Iterator[E]) =>
        runKeyBatch(k, it.toVector.sortBy(e => (ts(e), tie(e))), ts,
          compiled, skip, finish, stats).iterator
      }
    } else {
      val compiled = compile(liftG(pattern))
      ds.groupByKey(key).flatMapGroups { (k: K, it: Iterator[E]) =>
        val wrapped = it.toVector.sortBy(e => (ts(e), tie(e)))
          .zipWithIndex.map { case (e, i) => (e, i.toLong) }
        // strict contiguity ⇒ range-compressed captures (round 12):
        // O(#runs) per branch instead of O(match length)
        if (compiled.strictSpans)
          runKeyCore[K, (E, Long), O, SpanCaps[(E, Long)]](k, wrapped,
            w => ts(w._1), compiled, skip,
            (kk, groups) => finish(kk, unliftGroups(groups)),
            stats, spanOpsFor(wrapped)).iterator
        else
          runKeyBatch[K, (E, Long), O](k, wrapped, w => ts(w._1), compiled,
            skip,
            (kk, groups) => finish(kk, unliftGroups(groups)),
            stats).iterator
      }
    }

  /** [[Cep.SkipQueue]]'s semantics over group captures: completed
    * matches wait in a start-ordered queue until no earlier-started
    * branch is live; each emission prunes both the open branches and the
    * still-queued matches by the strategy's boundary (SkipPastLastEvent:
    * start <= last captured event; SkipToFirst/Last(step): start </>= the
    * named LEAF's first/last captured event, no pruning on an empty
    * group). */
  private final class GroupSkipQueue[E, C](skip: Cep.AfterMatchSkip,
      c: Compiled[E], ts: E => Long, ops: CapOps[E, C],
      rr: ReluctantResolver[E, C] = null) {
    private var pending = Vector.empty[C]

    /** Deferred matches still waiting on a live earlier branch — carried
      * across micro-batches by the streaming driver's [[GStreamState]]. */
    def toPending: Vector[C] = pending
    def restore(ms: Vector[C]): Unit = pending = ms

    private def startOf(m: C): Long =
      if (ops.isEmpty(m)) Long.MinValue else ts(ops.head(m))

    def add(matches: Vector[C]): Unit =
      if (matches.nonEmpty)
        pending = (pending ++ matches).sortBy(startOf)

    def drain(confs: Vector[Conf[E, C]],
        emit: C => Unit): Vector[Conf[E, C]] = {
      var cs = confs
      var minStart =
        if (cs.isEmpty) Long.MaxValue else cs.iterator.map(_.startTs).min
      while (pending.nonEmpty && startOf(pending.head) <= minStart) {
        val m = pending.head
        pending = pending.tail
        emit(m)
        skip match {
          case Cep.SkipPastLastEvent =>
            // boundary = MAX captured ts (the reference's
            // SkipPastLastStrategy prunes by the max event id) — NOT
            // ts(last): the streaming driver sorts only within each
            // micro-batch, so a cross-batch late event can leave the
            // max before the final capture; under-pruning there would
            // leak extra matches. O(length) on the streaming vector
            // path, O(#runs) on the batch span path.
            val boundary = ops.maxOver(m, ts)
            cs = cs.filter(_.startTs > boundary)
            pending = pending.filter(startOf(_) > boundary)
            if (rr != null) rr.prune(_ > boundary)
          case Cep.SkipToFirst(name) =>
            // first captured event of the named leaf = first run with
            // that name
            ops.runs(m).find(r => c.nameOf(r.slot) == name).foreach { r =>
              val b = ts(r.first)
              cs = cs.filter(_.startTs >= b)
              pending = pending.filter(startOf(_) >= b)
              if (rr != null) rr.prune(_ >= b)
            }
          case Cep.SkipToLast(name) =>
            // last captured event of the named leaf = last run with
            // that name
            var lastRun: CapRun[E] = null
            ops.runs(m).foreach { r =>
              if (c.nameOf(r.slot) == name) lastRun = r
            }
            if (lastRun != null) {
              val b = ts(lastRun.last)
              cs = cs.filter(_.startTs >= b)
              pending = pending.filter(startOf(_) >= b)
              if (rr != null) rr.prune(_ >= b)
            }
          case Cep.NoSkip => ()
        }
        minStart =
          if (cs.isEmpty) Long.MaxValue else cs.iterator.map(_.startTs).min
      }
      cs
    }
  }

  /** The per-key state-transition function behind [[matchStream]], exposed
    * so a TestGroupState harness can drive the timeout path directly (the
    * reference tests within-pruning via NFA watermark advance in
    * flink-cep/.../nfa/NFATest.java; Spark's analog is TestGroupState).
    *
    * When the pattern has `within`, idle keys are pruned by event-time
    * timers: on timeout, branches whose within horizon has passed the
    * watermark are dropped and the timer re-arms on the oldest survivor
    * (reference: flink-cep/.../nfa/NFA.java advanceTime pruning). Without
    * this, a key that goes quiet would retain partial branches forever. */
  def matchStreamFn[K, E, O](compiled: Compiled[E], ts: E => Long,
      tie: E => Long, finish: (K, Map[String, Seq[E]]) => O):
      (K, Iterator[E], GroupState[Vector[GConf[E]]]) => Iterator[O] = {
    require(!compiled.selDeferred,
      "deferred-selection patterns (reluctant × alternation, greedy " +
        "selection) — use matchStreamSkipFn/matchStream (GStreamState " +
        "carries the deferred candidates)")
    (k: K, it: Iterator[E], state: GroupState[Vector[GConf[E]]]) =>
      if (state.hasTimedOut) {
        val w = compiled.withinMs.get
        val wm = state.getCurrentWatermarkMs()
        val live = state.getOption.getOrElse(Vector.empty)
          .filter(c => wm - c.startTs < w)
        if (live.isEmpty) state.remove()
        else {
          state.update(live)
          state.setTimeoutTimestamp(live.map(_.startTs).min + w + 1)
        }
        Iterator.empty
      } else {
        var confs = state.getOption.getOrElse(Vector.empty)
        val outs = Vector.newBuilder[O]
        it.toVector.sortBy(e => (ts(e), tie(e))).foreach { e =>
          val (next, ms) = advance(compiled, confs, e, ts(e))
          confs = next
          ms.foreach(m => outs += finish(k, toGroups(compiled, m)))
        }
        if (confs.isEmpty) state.remove()
        else {
          state.update(confs)
          compiled.withinMs.foreach { w =>
            val target = confs.map(_.startTs).min + w + 1
            state.setTimeoutTimestamp(
              math.max(target, state.getCurrentWatermarkMs() + 1))
          }
        }
        outs.result().iterator
      }
  }

  /** Streaming keyed state for [[matchStreamSkipFn]]: the open branches
    * plus the completed matches still deferred by the after-match skip
    * queue (they wait for every earlier-started live branch to resolve,
    * which can take more micro-batches). `pending` non-empty implies
    * `confs` non-empty — with no live branch the drain empties the queue.
    *
    * STATE-FORMAT NOTE: this layout has changed across generations
    * (`pendingSel` was added as a third field in the reluctant-resolver
    * round). Since round 13 every Dataset-level streaming driver
    * persists its state through [[CepStateEnvelope]] — a (version INT,
    * kryo BINARY) row whose version column is readable against any
    * checkpoint generation — so restoring state written by a different
    * format generation raises the named [[CepStateVersionException]]
    * instead of an opaque KryoException (layout change) or a silent
    * wrong resume (semantic change with unchanged layout). Bump
    * [[CepStateCodec.GroupVersion]] whenever this class or its meaning
    * changes (versions are PER FAMILY — the linear engine's
    * [[CepStateCodec.ArrivalVersion]] is independent); the recovery
    * posture stays the standard Spark one — restart from a fresh
    * checkpoint after reprocessing. */
  final case class GStreamState[E](confs: Vector[GConf[E]],
      pending: Vector[Vector[(Int, E)]],
      pendingSel: Vector[Vector[(Int, E)]] = Vector.empty)

  /** [[matchStreamFn]] plus the after-match skip machinery — the
    * [[GroupSkipQueue]] the batch path runs, its deferred matches carried
    * across micro-batches in [[GStreamState]] (the streaming analog of the
    * linear driver storing completed partials in state). NoSkip runs the
    * queue-free immediate path. */
  def matchStreamSkipFn[K, E, O](compiled: Compiled[E], ts: E => Long,
      tie: E => Long, skip: Cep.AfterMatchSkip,
      finish: (K, Map[String, Seq[E]]) => O,
      stats: Cep.HotKeyStats = null,
      canStart: E => Boolean = null):
      (K, Iterator[E], GroupState[GStreamState[E]]) => Iterator[O] =
    (k: K, it: Iterator[E], state: GroupState[GStreamState[E]]) => {
      val st = state.getOption.getOrElse(GStreamState[E](Vector.empty,
        Vector.empty))
      val outs = Vector.newBuilder[O]
      // streaming keeps the EXACT capture vectors: the deferred
      // candidates / queued matches ride keyed state across
      // micro-batches and must materialize without the batch drivers'
      // key-run event array
      val ops = vecOps[E]
      // see runKeyBatch: immediate reluctant selection feeds the queue
      // directly; the deferred (alternation) resolver releases into it
      val rr = if (compiled.selDeferred)
                 new ReluctantResolver[E, Vector[(Int, E)]](compiled, ts, ops)
               else null
      val sq = if (skip == Cep.NoSkip) null
               else new GroupSkipQueue[E, Vector[(Int, E)]](skip, compiled,
                 ts, ops, rr)
      if (sq != null) sq.restore(st.pending)
      if (rr != null) rr.restore(st.pendingSel)
      def emit(m: Vector[(Int, E)]): Unit =
        outs += finish(k, toGroups(compiled, m))
      // resolver releases feed the skip queue when one is active (the
      // reluctant + skip composition), else emit directly
      def release(m: Vector[(Int, E)]): Unit =
        if (sq != null) sq.add(Vector(m)) else emit(m)
      var confs = st.confs
      if (state.hasTimedOut) {
        // watermark advance: expired branches die, which may release
        // deferred matches whose only blockers they were
        val w = compiled.withinMs.get
        val wm = state.getCurrentWatermarkMs()
        confs = confs.filter(c => wm - c.startTs < w)
        if (rr != null) rr.drain(confs, release)
        if (sq != null) confs = sq.drain(confs, emit)
      } else {
        // a branch may have expired on the timer between batches
        if (sq != null) confs = sq.drain(confs, emit)
        val sorted = it.toVector.sortBy(e => (ts(e), tie(e)))
        var maxConfs = 0
        sorted.foreach { e =>
          val (next, ms) = advance(compiled, confs, e, ts(e),
            canStart == null || canStart(e))
          confs = next
          if (stats != null && confs.size > maxConfs) maxConfs = confs.size
          if (rr != null) {
            rr.add(ms)
            if (ms.nonEmpty) confs = rr.pruneDominated(confs)
            rr.drain(confs, release)
            if (sq != null) confs = sq.drain(confs, emit)
          }
          else if (sq == null) ms.foreach(emit)
          else { sq.add(ms); confs = sq.drain(confs, emit) }
        }
        if (stats != null) {
          stats.maxKeyEvents.add(sorted.size.toLong)
          stats.maxPartials.add(maxConfs.toLong)
        }
      }
      // end-of-batch: prune dominated branches ONCE per batch (the
      // per-event prune is gated on completions; a branch can first
      // diverge-and-lose on a quiet event under relaxed contiguity) so
      // a decided start's release never waits past the current batch
      if (rr != null && !state.hasTimedOut) {
        confs = rr.pruneDominated(confs)
        rr.drain(confs, release)
        if (sq != null) confs = sq.drain(confs, emit)
      }
      val rrPending = if (rr == null) Vector.empty[Vector[(Int, E)]]
                      else rr.toPending
      val sqPending = if (sq == null) Vector.empty[Vector[(Int, E)]]
                      else sq.toPending
      if (confs.isEmpty && rrPending.isEmpty && sqPending.isEmpty)
        state.remove()
      else {
        state.update(GStreamState(confs, sqPending, rrPending))
        compiled.withinMs.foreach { w =>
          val target = confs.map(_.startTs).min + w + 1
          state.setTimeoutTimestamp(
            math.max(target, state.getCurrentWatermarkMs() + 1))
        }
      }
      outs.result().iterator
    }

  /** Streaming keyed state for the arrival-identity group driver: the
    * per-key cross-batch arrival counter plus the skip-capable state over
    * arrival-tagged events ([[Cep.ArrivalState]]'s group twin). */
  final case class GArrivalState[E](nextSeq: Long,
      inner: GStreamState[(E, Long)],
      matchSeq: Long = 0L, carry: Vector[E] = Vector.empty)

  /** [[GroupState]] view exposing the inner [[GStreamState]] of a
    * [[GArrivalState]]; `update` re-attaches the advanced counter (plus
    * the match ordinal and PREV carry, read at update time). A key that
    * has emitted a match or holds a carry persists an empty state row
    * instead of being removed — the ordinal and the predecessor row must
    * survive quiet periods (see [[Cep.ArrivalState]]). */
  private final class GArrivalView[E](u: GroupState[GArrivalState[E]],
      newSeq: Long, counter: Cep.MatchCounter = null,
      carry: () => Vector[E] = () => Vector.empty,
      persistSeq: Boolean = false)
      extends GroupState[GStreamState[(E, Long)]] {
    def exists: Boolean = u.exists
    def get: GStreamState[(E, Long)] = u.get.inner
    def getOption: Option[GStreamState[(E, Long)]] = u.getOption.map(_.inner)
    def update(s: GStreamState[(E, Long)]): Unit =
      u.update(GArrivalState(newSeq, s,
        if (counter == null) 0L else counter.n, carry()))
    // the arrival counter may safely restart when nothing survives
    // (identity only disambiguates events LIVE branches reference), but
    // a ^-anchored pattern gives tag 0 ABSOLUTE meaning (the
    // partition's first-EVER event) — dropping the counter would let a
    // later batch re-tag from 0 and a mid-partition event wrongly open
    // an "anchored" branch. Same persistSeq contract as the linear
    // engine's ArrivalStateView (Cep.scala), same inherent state price.
    def remove(): Unit =
      if ((counter != null && counter.n > 0L) || carry().nonEmpty ||
          (persistSeq && newSeq > 0L))
        update(GStreamState(Vector.empty, Vector.empty))
      else u.remove()
    def hasTimedOut: Boolean = u.hasTimedOut
    def setTimeoutDuration(ms: Long): Unit = u.setTimeoutDuration(ms)
    def setTimeoutDuration(d: String): Unit = u.setTimeoutDuration(d)
    def setTimeoutTimestamp(ms: Long): Unit = u.setTimeoutTimestamp(ms)
    def setTimeoutTimestamp(ms: Long, d: String): Unit =
      u.setTimeoutTimestamp(ms, d)
    def setTimeoutTimestamp(t: java.sql.Date): Unit = u.setTimeoutTimestamp(t)
    def setTimeoutTimestamp(t: java.sql.Date, d: String): Unit =
      u.setTimeoutTimestamp(t, d)
    def getCurrentWatermarkMs(): Long = u.getCurrentWatermarkMs()
    def getCurrentProcessingTimeMs(): Long = u.getCurrentProcessingTimeMs()
  }

  /** Arrival-identity streaming driver: tags each batch's events with
    * consecutive per-key ordinals (counter carried in state) and runs
    * [[matchStreamSkipFn]] over the lifted pattern — the group twin of
    * [[Cep.matchStreamGroupsArrivalFn]]. */
  def matchStreamArrivalFn[K, E, O](pattern: GPattern[E], ts: E => Long,
      tie: E => Long, skip: Cep.AfterMatchSkip,
      finish: (K, Map[String, Seq[E]]) => O,
      stats: Cep.HotKeyStats = null,
      anchorHead: Boolean = false):
      (K, Iterator[E], GroupState[GArrivalState[E]]) => Iterator[O] =
    matchStreamNumberedArrivalFn(pattern, ts, tie, skip, null,
      (kk: K, _: Long, groups: Map[String, Seq[E]]) => finish(kk, groups),
      stats, numbered = false, anchorHead = anchorHead)

  /** [[matchStreamArrivalFn]] plus the round-9 SQL extras (the group
    * twin of [[Cep.matchStreamGroupsNumberedArrivalFn]]): finish receives
    * the 1-based cross-batch per-key match ordinal (streaming
    * MATCH_NUMBER()), and `pre(carriedRows, event)` — when non-null —
    * transforms each event with the key's previous rows visible, its
    * carry persisted in [[GArrivalState.carry]] (streaming PREV()). */
  def matchStreamNumberedArrivalFn[K, E, O](pattern: GPattern[E],
      ts: E => Long, tie: E => Long, skip: Cep.AfterMatchSkip,
      pre: (Vector[E], E) => (Vector[E], E),
      finish: (K, Long, Map[String, Seq[E]]) => O,
      stats: Cep.HotKeyStats = null, numbered: Boolean = true,
      anchorHead: Boolean = false):
      (K, Iterator[E], GroupState[GArrivalState[E]]) => Iterator[O] = {
    val compiled = compile(liftG(pattern))
    (k: K, it: Iterator[E], state: GroupState[GArrivalState[E]]) => {
      val st = state.getOption
      var seq = st.map(_.nextSeq).getOrElse(0L)
      val counter = new Cep.MatchCounter(st.map(_.matchSeq).getOrElse(0L))
      var carry = st.map(_.carry).getOrElse(Vector.empty[E])
      val inner = matchStreamSkipFn[K, (E, Long), O](compiled,
        w => ts(w._1), _._2, skip,
        (kk, groups) => finish(kk, counter.next(), unliftGroups(groups)),
        stats,
        // ^ gate: only the key's first-EVER event (cross-batch arrival
        // tag 0) may open a branch
        canStart = if (anchorHead) (w: (E, Long)) => w._2 == 0L else null)
      val sorted = it.toVector.sortBy(e => (ts(e), tie(e)))
      val preApplied = if (pre == null) sorted else sorted.map { e =>
        val (c2, e2) = pre(carry, e); carry = c2; e2
      }
      val tagged = preApplied.map { e => val w = (e, seq); seq += 1; w }
      inner(k, tagged.iterator, new GArrivalView[E](state, seq,
        if (numbered || pre != null) counter else null, () => carry,
        persistSeq = anchorHead))
    }
  }

  /** Streaming twin: branches persist in keyed state across micro-batches.
    * Events must arrive in event-time order per key within a batch (sort
    * applied); cross-batch late events are not re-ordered — feed through
    * [[StreamOps.eventTimeSorted]] first when that matters.
    *
    * `skip` runs the batch path's [[GroupSkipQueue]] semantics; deferred
    * matches ride keyed state until their blocking branches resolve.
    * Event identity is the reference's SharedBuffer EventId semantics
    * (arrival identity, [[GArrivalState]]'s cross-batch counter), like
    * the batch driver; use [[matchStreamFn]]/[[matchStreamSkipFn]]
    * directly for value identity.
    *
    * Patterns with `within` require a watermarked input (`withWatermark`
    * upstream): expiry of idle keys' partial branches rides event-time
    * timers, bounding state. Patterns without `within` keep partials
    * indefinitely — exactly the reference's semantics. */
  def matchStream[K, E, O: Encoder](ds: Dataset[E], key: E => K,
      ts: E => Long, pattern: GPattern[E],
      tie: E => Long = (_: E) => 0L,
      skip: Cep.AfterMatchSkip = Cep.NoSkip,
      stats: Cep.HotKeyStats = null,
      anchorHead: Boolean = false)(
      finish: (K, Map[String, Seq[E]]) => O)(
      implicit ke: Encoder[K]): Dataset[O] = {
    compile(pattern) // validate eagerly
    val timeoutConf =
      if (pattern.withinMs.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    implicit val senc: Encoder[CepStateEnvelope] = CepStateCodec.envelopeEncoder
    ds.groupByKey(key).flatMapGroupsWithState[CepStateEnvelope, O](
      OutputMode.Append(), timeoutConf)(
      CepStateCodec.versionedFn("GroupCep.GArrivalState",
        CepStateCodec.GroupVersion,
        matchStreamArrivalFn(pattern, ts, tie, skip, finish, stats,
          anchorHead = anchorHead)))
  }

  /** [[matchStream]] with the cross-batch per-key match ordinal in
    * `finish` (streaming MATCH_NUMBER()) and an optional carried-rows
    * transform `pre` (streaming PREV()); the group twin of
    * [[Cep.matchStreamGroupsNumbered]]. */
  def matchStreamNumbered[K, E, O: Encoder](ds: Dataset[E], key: E => K,
      ts: E => Long, pattern: GPattern[E],
      tie: E => Long = (_: E) => 0L,
      skip: Cep.AfterMatchSkip = Cep.NoSkip,
      pre: (Vector[E], E) => (Vector[E], E) = null,
      stats: Cep.HotKeyStats = null,
      anchorHead: Boolean = false)(
      finish: (K, Long, Map[String, Seq[E]]) => O)(
      implicit ke: Encoder[K]): Dataset[O] = {
    compile(pattern) // validate eagerly
    val timeoutConf =
      if (pattern.withinMs.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    implicit val senc: Encoder[CepStateEnvelope] = CepStateCodec.envelopeEncoder
    ds.groupByKey(key).flatMapGroupsWithState[CepStateEnvelope, O](
      OutputMode.Append(), timeoutConf)(
      CepStateCodec.versionedFn("GroupCep.GArrivalState",
        CepStateCodec.GroupVersion,
        matchStreamNumberedArrivalFn(pattern, ts, tie, skip, pre, finish,
          stats, anchorHead = anchorHead)))
  }
}
