package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Complex-event-processing subset: the reference's CEP pattern DSL
  * (flink-cep Pattern.java:123-474 — begin/next/followedBy/where/within,
  * CEP.pattern CEP.java:38, NFA engine nfa/NFA.java) re-expressed as a tiny
  * NFA run inside `flatMapGroupsWithState` — Spark has no MATCH_RECOGNIZE,
  * so the pattern engine is a library operator over keyed state, exactly as
  * SURVEY.md §7 plans it.
  *
  * Supported subset (documented; the reference's full DSL includes
  * optional/greedy/times and skip strategies):
  *  - `begin(name)(pred)` — pattern start
  *  - `.next(name)(pred)` — strict contiguity (STRICT in NFA.java)
  *  - `.followedBy(name)(pred)` — relaxed contiguity, first occurrence
  *  - `.within(ms)` — time-to-live for partial matches (Pattern.java:474)
  *  - after-match: every start event opens its own partial (noSkip).
  *
  * Events are processed in event-time order per group (batch: one sorted
  * scan; streaming: sorted within each micro-batch, partials carried in
  * state — in-order delivery across batches is assumed, matching Flink's
  * ascending-timestamp sources).
  *
  * Scale: state per key = open partial matches only (bounded by `within`
  * pruning); keys shard across the cluster's state store.
  */
object Cep {

  final case class Step[E](name: String, pred: E => Boolean, strict: Boolean)

  final class Pattern[E] private[Cep] (
      val steps: Vector[Step[E]], val withinMs: Option[Long])
    extends Serializable {
    /** Strict contiguity: the very next event must match. */
    def next(name: String)(pred: E => Boolean): Pattern[E] =
      new Pattern(steps :+ Step(name, pred, strict = true), withinMs)
    /** Relaxed contiguity: non-matching events in between are skipped. */
    def followedBy(name: String)(pred: E => Boolean): Pattern[E] =
      new Pattern(steps :+ Step(name, pred, strict = false), withinMs)
    /** Partial matches older than `ms` (vs the current event) are pruned. */
    def within(ms: Long): Pattern[E] = new Pattern(steps, Some(ms))
  }

  object Pattern {
    def begin[E](name: String)(pred: E => Boolean): Pattern[E] =
      new Pattern(Vector(Step(name, pred, strict = true)), None)
  }

  /** An in-flight partial match: events bound to steps 0..events.size-1. */
  final case class Partial[E](startTs: Long, events: Vector[E])

  /** Core NFA transition: feed one event, return surviving partials and any
    * completed matches (as step-aligned event vectors). Pure — shared by
    * the batch and streaming drivers below.
    */
  def advance[E](pattern: Pattern[E], partials: Vector[Partial[E]],
      e: E, ts: Long): (Vector[Partial[E]], Vector[Vector[E]]) = {
    val alive = partials.filter(p =>
      pattern.withinMs.forall(w => ts - p.startTs <= w))
    val out = Vector.newBuilder[Partial[E]]
    val matches = Vector.newBuilder[Vector[E]]
    alive.foreach { p =>
      val step = pattern.steps(p.events.size)
      if (step.pred(e)) {
        val adv = p.copy(events = p.events :+ e)
        if (adv.events.size == pattern.steps.size) matches += adv.events
        else out += adv
        // followedBy = first occurrence only: the partial is consumed.
      } else if (!step.strict) {
        out += p // relaxed: skip this event, keep waiting
      } // strict non-match: partial dies
    }
    if (pattern.steps.head.pred(e)) {
      if (pattern.steps.size == 1) matches += Vector(e)
      else out += Partial(ts, Vector(e))
    }
    (out.result(), matches.result())
  }

  /** Run a pattern over a batch Dataset: one event-time-sorted scan per
    * key. `finish` shapes (key, step-name → event) into the output row. */
  def matchBatch[K, E, O: Encoder](ds: Dataset[E], key: E => K,
      ts: E => Long, pattern: Pattern[E])(
      finish: (K, Map[String, E]) => O)(implicit ke: Encoder[K]): Dataset[O] =
    ds.groupByKey(key).flatMapGroups { (k: K, it: Iterator[E]) =>
      runSorted(k, it, key, ts, pattern, Vector.empty, finish)._1.iterator
    }

  /** Run a pattern over a streaming Dataset: partials persist in keyed
    * state across micro-batches. */
  def matchStream[K, E, O: Encoder](ds: Dataset[E], key: E => K,
      ts: E => Long, pattern: Pattern[E])(
      finish: (K, Map[String, E]) => O)(
      implicit ke: Encoder[K], se: Encoder[Vector[Partial[E]]]): Dataset[O] =
    ds.groupByKey(key).flatMapGroupsWithState[Vector[Partial[E]], O](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) { (k, it, state) =>
      val partials = state.getOption.getOrElse(Vector.empty)
      val (outs, remaining) = runSorted(k, it, key, ts, pattern, partials, finish)
      state.update(remaining)
      outs.iterator
    }

  private def runSorted[K, E, O](k: K, it: Iterator[E], key: E => K,
      ts: E => Long, pattern: Pattern[E], init: Vector[Partial[E]],
      finish: (K, Map[String, E]) => O): (Vector[O], Vector[Partial[E]]) = {
    val names = pattern.steps.map(_.name)
    var partials = init
    val outs = Vector.newBuilder[O]
    it.toVector.sortBy(ts).foreach { e =>
      val (next, matches) = advance(pattern, partials, e, ts(e))
      partials = next
      matches.foreach(m => outs += finish(k, names.zip(m).toMap))
    }
    (outs.result(), partials)
  }
}
