package graft.streaming

import graft.SparkSuite

/** The MATCH_RECOGNIZE text surface compiles onto the library NFA: the
  * same patterns expressed as SQL text and as the DSL must agree, and
  * the clause grammar (quantifiers, AFTER MATCH, WITHIN, undefined
  * variables) must carry its documented semantics. */
class MatchRecognizeSpec extends SparkSuite {
  import spark.implicits._

  private lazy val events = Seq(
    // user 1: view, click, error, error
    (1L, 10L, "view", 1L), (2L, 20L, "click", 1L),
    (3L, 30L, "error", 1L), (4L, 40L, "error", 1L),
    // user 2: view then view then error
    (10L, 10L, "view", 2L), (11L, 20L, "view", 2L), (12L, 30L, "error", 2L)
  ).toDF("event_id", "ts", "event_type", "user_id")

  test("V S* E equals the DSL's followedBy (first error per view)") {
    val got = MatchRecognize(events,
      """PARTITION BY user_id
        |ORDER BY ts, event_id
        |MEASURES V.event_id AS v_id, E.event_id AS e_id
        |PATTERN (V S* E)
        |DEFINE V AS event_type = 'view',
        |       S AS event_type <> 'error',
        |       E AS event_type = 'error'""".stripMargin)
      .as[(Long, Long, Long)].collect().toSet
    // every view matches its FIRST subsequent error, like followedBy
    assert(got === Set((1L, 1L, 3L), (2L, 10L, 12L), (2L, 11L, 12L)))
  }

  test("quantifier {2,3} emits every satisfied length (library semantics)") {
    val df = Seq(
      (1L, 10L, "error", 1L), (2L, 20L, "error", 1L), (3L, 30L, "error", 1L)
    ).toDF("event_id", "ts", "event_type", "user_id")
    val got = MatchRecognize(df,
      """PARTITION BY user_id
        |ORDER BY ts
        |MEASURES FIRST(E.event_id) AS first_id, LAST(E.event_id) AS last_id,
        |  COUNT(E.*) AS n
        |PATTERN (E{2,3})
        |DEFINE E AS event_type = 'error'""".stripMargin)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 1L, 2L, 2L), (1L, 1L, 3L, 3L), (1L, 2L, 3L, 2L)))
  }

  test("AFTER MATCH SKIP PAST LAST ROW yields non-overlapping matches") {
    val got = MatchRecognize(events,
      """PARTITION BY user_id
        |ORDER BY ts, event_id
        |MEASURES V.event_id AS v_id, E.event_id AS e_id
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (V S* E)
        |DEFINE V AS event_type = 'view',
        |       S AS event_type <> 'error',
        |       E AS event_type = 'error'""".stripMargin)
      .as[(Long, Long, Long)].collect().toSet
    // user 2's second view is absorbed by the first match's skip
    assert(got === Set((1L, 1L, 3L), (2L, 10L, 12L)))
  }

  test("WITHIN prunes partials past the horizon") {
    val got = MatchRecognize(events,
      """PARTITION BY user_id
        |ORDER BY ts, event_id
        |MEASURES V.event_id AS v_id, E.event_id AS e_id
        |PATTERN (V S* E)
        |WITHIN INTERVAL '15' SECOND
        |DEFINE V AS event_type = 'view',
        |       S AS event_type <> 'error',
        |       E AS event_type = 'error'""".stripMargin)
      .as[(Long, Long, Long)].collect().toSet
    // ts is integral (treated as raw longs): 15 SECOND = 15e6 — all fit;
    // nothing pruned here, just the parse path. The timestamp-typed
    // pruning runs in qc10 against the DuckDB oracle.
    assert(got === Set((1L, 1L, 3L), (2L, 10L, 12L), (2L, 11L, 12L)))
  }

  test("optional variable and undefined variable (always TRUE)") {
    val df = Seq(
      (1L, 10L, "a", 1L), (2L, 20L, "b", 1L),
      (10L, 10L, "a", 2L), (11L, 20L, "z", 2L), (12L, 30L, "b", 2L)
    ).toDF("event_id", "ts", "event_type", "user_id")
    // M is undefined -> TRUE, optional: A B with and without a middle row
    val got = MatchRecognize(df,
      """PARTITION BY user_id
        |ORDER BY ts
        |MEASURES A.event_id AS a_id, COUNT(M.*) AS m_n, B.event_id AS b_id
        |PATTERN (A M? B)
        |DEFINE A AS event_type = 'a', B AS event_type = 'b'""".stripMargin)
      .as[(Long, Long, Long, Long)].collect().toSet
    // user 1: a b adjacent -> empty M; user 2: a z b -> M captures z
    assert(got === Set((1L, 1L, 0L, 2L), (2L, 10L, 1L, 12L)))
  }

  test("qc10 agrees with qc1 and qc11 agrees with qc4 on sf0.001") {
    assert(run("qc10_match_recognize").collect().toSeq ===
      run("qc1_cep_view_error").collect().toSeq)
    assert(run("qc11_match_recognize_times").collect().toSeq ===
      run("qc4_cep_times_range").collect().toSeq)
  }
}
