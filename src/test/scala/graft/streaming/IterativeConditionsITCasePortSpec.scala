package graft.streaming

import graft.SparkSuite
import graft.streaming.Cep._

/** Verbatim ports of the reference's IterativeConditionsITCase (flink-cep
  * nfa/IterativeConditionsITCase.java) — iterative conditions over
  * quantified steps, looping STARTS, and cross-step dependencies
  * (testIterativeWithPrevPatternDependency was ported in round 5; the
  * other six land here). SubEvent subtyping maps to the `foo` name
  * prefix the tests actually select on. compareMaps compares matches
  * order-insensitively, so matches are multisets of value multisets.
  */
class IterativeConditionsITCasePortSpec extends SparkSuite {

  private case class IE(id: Int, name: String, price: Double)

  // the file's shared fixture (IterativeConditionsITCase.java:48-57)
  private val s1 = IE(40, "start", 1.0)
  private val s2 = IE(40, "start", 2.0)
  private val s3 = IE(40, "start", 3.0)
  private val s4 = IE(40, "start", 4.0)
  private val m1 = IE(41, "foo1", 1.0)
  private val m2 = IE(42, "foo2", 2.0)
  private val m3 = IE(43, "foo3", 3.0)
  private val m4 = IE(43, "foo4", 1.0)
  private val nextOne = IE(44, "next-one", 1.0)
  private val endE = IE(46, "end", 1.0)

  private def run(p: Pattern[IE], events: Seq[(IE, Long)]):
      Seq[Seq[(String, Double)]] =
    Cep.runMatches(p, events)._1
      .map(_.flatten.map(e => (e.name, e.price)).sorted)

  private def multiset[T](xs: Seq[T]): Map[T, Int] =
    xs.groupBy(identity).view.mapValues(_.size).toMap

  private def vals(es: IE*): Seq[(String, Double)] =
    es.map(e => (e.name, e.price)).sorted

  // ---- testIterativeWithBranchingPattern (:60/:75) — a sum bound over
  // the captured run gates each extension
  private def branching(eager: Boolean): Seq[Seq[(String, Double)]] = {
    val base = Pattern.begin[IE]("start")(_.name == "start")
      .followedByIter("middle") { (e, ctx) =>
        e.name.startsWith("foo") &&
          ctx("middle").map(_.price).sum + e.price < 5.0
      }
    val looped = if (eager) base.oneOrMore.relaxed.allPrefixes
                 else base.oneOrMore.allowCombinations
    run(looped.followedBy("end")(_.name == "end"), Seq(
      s1 -> 1L, m1 -> 2L, m2 -> 3L, s2 -> 4L, m3 -> 5L, m4 -> 5L,
      nextOne -> 6L, endE -> 8L))
  }

  test("port: iterative condition over eager oneOrMore (IterativeConditionsITCase testIterativeWithBranchingPatternEager)") {
    assert(multiset(branching(eager = true)) === multiset(Seq(
      vals(s1, endE, m1, m2, m4),
      vals(s1, endE, m2, m1),
      vals(s1, endE, m1),
      vals(s2, endE, m3, m4),
      vals(s2, endE, m3))))
  }

  test("port: iterative condition over combinations (IterativeConditionsITCase testIterativeWithBranchingPatternCombinations)") {
    assert(multiset(branching(eager = false)) === multiset(Seq(
      vals(s1, endE, m1, m2, m4),
      vals(s1, endE, m2, m1),
      vals(s1, endE, m3, m1),
      vals(s2, endE, m3, m4),
      vals(s1, endE, m4, m1),
      vals(s1, endE, m1),
      vals(s2, endE, m3))))
  }

  // ---- testIterativeWithLoopingStarting (:164/:179) — the PATTERN HEAD
  // is an iterative zeroOrMore; a looping start inherits relaxed
  // continuity (the reference's documented default)
  private def loopingStart(eager: Boolean): Seq[Seq[(String, Double)]] = {
    val base = Pattern.beginIter[IE]("start") { (e, ctx) =>
      e.name == "start" && ctx("start").map(_.price).sum + e.price < 5.0
    }
    val looped = if (eager) base.oneOrMore.relaxed.allPrefixes.optional
                 else base.oneOrMore.allowCombinations.optional
    run(looped.followedBy("end")(_.name == "end"), Seq(
      s1 -> 1L, s2 -> 2L, s3 -> 3L, endE -> 4L))
  }

  test("port: iterative looping start eager (IterativeConditionsITCase testIterativeWithLoopingStartingEager)") {
    assert(multiset(loopingStart(eager = true)) === multiset(Seq(
      vals(s1, s2, endE), vals(s1, endE), vals(s2, endE), vals(s3, endE),
      vals(endE))))
  }

  test("port: iterative looping start combinations (IterativeConditionsITCase testIterativeWithLoopingStartingCombination)") {
    assert(multiset(loopingStart(eager = false)) === multiset(Seq(
      vals(s1, s2, endE), vals(s1, s3, endE), vals(s1, endE),
      vals(s2, endE), vals(s3, endE), vals(endE))))
  }

  // ---- testIterativeWithABACPattern (:295) — A-B-A-C: the second A run
  // is gated by ITS OWN captured sum, independent of the first A
  test("port: ABAC with iterative middle2 (IterativeConditionsITCase testIterativeWithABACPattern)") {
    val p = Pattern.begin[IE]("start")(_.name == "start")
      .followedByAny("middle1")(_.name.startsWith("foo"))
      .followedByIter("middle2") { (e, ctx) =>
        e.name == "start" && ctx("middle2").map(_.price).sum + e.price <= 5.0
      }.oneOrMore.relaxed.allPrefixes
      .followedBy("end")(_.name == "end")
    val got = run(p, Seq(
      s1 -> 1L, m1 -> 2L, s2 -> 2L, s3 -> 2L, m2 -> 2L,
      s4 -> 2L, m3 -> 2L, m4 -> 2L, endE -> 4L))
    assert(multiset(got) === multiset(Seq(
      vals(s1, s2, s3, m1, endE),
      vals(s1, m1, s2, endE),
      vals(s1, m2, s4, endE),
      vals(s2, m2, s4, endE),
      vals(s3, m2, s4, endE))))
  }

  // ---- testIterativeWithPrevPatternDependencyAfterBranching (:365) —
  // the END condition sums the events captured by the looping START
  test("port: end condition reads the start run (IterativeConditionsITCase testIterativeWithPrevPatternDependencyAfterBranching)") {
    val p = Pattern.begin[IE]("start")(_.name == "start")
      .oneOrMore.relaxed.allPrefixes
      .followedByAny("middle1")(_.name.startsWith("foo"))
      .followedByIter("end") { (e, ctx) =>
        e.name == "end" && ctx("start").map(_.price).sum >= 2.0
      }
    val got = run(p, Seq(
      s1 -> 1L, s2 -> 2L, m1 -> 4L, s3 -> 5L, m2 -> 6L, endE -> 7L))
    assert(multiset(got) === multiset(Seq(
      vals(s1, s2, m1, endE),
      vals(s2, m1, endE),
      vals(s1, s2, m2, endE),
      vals(s1, s2, s3, m2, endE),
      vals(s2, s3, m2, endE),
      vals(s2, m2, endE),
      vals(s3, m2, endE))))
  }
}
