package graft.streaming

import graft.{Q, QueryModule}
import java.sql.Timestamp

/** Quantified-CEP conformance on the batch surface: begin("err").times(2)
  * matches every pair of CONSECUTIVE error events per user (strict
  * repetition contiguity) — in SQL, a lag() check that the previous event
  * of the user is also an error.
  */
object CepQuantQuery extends QueryModule {
  import CepQueries.SlimRow

  final case class PairOut(user_id: Long, first_ts: Timestamp, second_ts: Timestamp)

  def all: Seq[Q] = Seq(
    q("qc2_cep_double_error",
      // Window order (ts, event_id) matches the NFA's stream order, so
      // same-timestamp events pair identically in both engines.
      """WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |    lag(CAST(ts AS TIMESTAMP)) OVER w AS pts,
        |    lag(event_type) OVER w AS ptyp
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, pts AS first_ts, ts AS second_ts
        |FROM o WHERE event_type = 'error' AND ptyp = 'error'
        |ORDER BY user_id, first_ts, second_ts""".stripMargin) { (s, d) =>
      import s.implicits._
      val ds = t(s, d, "events")
        .selectExpr("event_id", "ts", "user_id", "event_type")
        .as[SlimRow]
      val pattern = Cep.Pattern.begin[SlimRow]("err")(_.event_type == "error")
        .times(2)
      def micros(t: Timestamp): Long =
        t.getTime * 1000 + (t.getNanos / 1000) % 1000
      Cep.matchBatchGroups(ds, (e: SlimRow) => e.user_id,
        (e: SlimRow) => micros(e.ts), pattern,
        tie = (e: SlimRow) => e.event_id) { (u, m) =>
        val errs = m("err")
        PairOut(u, errs.head.ts, errs(1).ts)
      }.toDF().orderBy("user_id", "first_ts", "second_ts")
    },

    // times(2,3) range quantifier on a FINAL step: every length in [2,3]
    // of CONSECUTIVE errors per start offset is its own match (the
    // reference's eager proceed-to-Final per extension — GreedyITCase
    // testEndWithGreedyTimesRange) — in SQL, gaps-and-islands with one
    // row per (offset, len) where the run has >= len remaining.
    q("qc4_cep_times_range",
      """WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |e AS (SELECT user_id, ts, rn,
        |    rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
        |  FROM o WHERE event_type = 'error'),
        |runs AS (SELECT user_id, grp, COUNT(*) AS len, MIN(rn) AS rn0
        |  FROM e GROUP BY 1, 2),
        |pos AS (SELECT e.user_id, e.ts AS first_ts, e.rn, e.grp,
        |    (r.len - (e.rn - r.rn0)) AS remain
        |  FROM e JOIN runs r ON r.user_id = e.user_id AND r.grp = e.grp),
        |m AS (SELECT user_id, first_ts, grp, rn + l.len - 1 AS last_rn
        |  FROM pos CROSS JOIN (VALUES (2), (3)) AS l(len)
        |  WHERE remain >= l.len)
        |SELECT m.user_id AS user_id, m.first_ts, e2.ts AS last_ts
        |FROM m JOIN e e2 ON e2.user_id = m.user_id AND e2.rn = m.last_rn
        |ORDER BY m.user_id, m.first_ts, last_ts""".stripMargin) { (s, d) =>
      import s.implicits._
      val ds = t(s, d, "events")
        .selectExpr("event_id", "ts", "user_id", "event_type")
        .as[SlimRow]
      val pattern = Cep.Pattern.begin[SlimRow]("err")(_.event_type == "error")
        .times(2, 3)
      def micros(t: Timestamp): Long =
        t.getTime * 1000 + (t.getNanos / 1000) % 1000
      Cep.matchBatchGroups(ds, (e: SlimRow) => e.user_id,
        (e: SlimRow) => micros(e.ts), pattern,
        tie = (e: SlimRow) => e.event_id) { (u, m) =>
        val errs = m("err")
        (u, errs.head.ts, errs.last.ts)
      }.toDF("user_id", "first_ts", "last_ts")
        .orderBy("user_id", "first_ts", "last_ts")
    },

    // or-condition + consecutive quantifier (Pattern.or, Pattern.java:219 +
    // consecutive, :368): pairs of CONSECUTIVE events per user where each
    // is an error OR a purchase — the widened-predicate twin of qc2. The
    // SQL oracle widens the lag() check identically.
    q("qc5_cep_or_consecutive",
      """WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |    lag(CAST(ts AS TIMESTAMP)) OVER w AS pts,
        |    lag(event_type) OVER w AS ptyp
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, pts AS first_ts, ts AS second_ts
        |FROM o WHERE event_type IN ('error', 'purchase')
        |  AND ptyp IN ('error', 'purchase')
        |ORDER BY user_id, first_ts, second_ts""".stripMargin) { (s, d) =>
      import s.implicits._
      val ds = t(s, d, "events")
        .selectExpr("event_id", "ts", "user_id", "event_type")
        .as[SlimRow]
      val pattern = Cep.Pattern
        .begin[SlimRow]("bad")(_.event_type == "error")
        .or(_.event_type == "purchase")
        .times(2).consecutive
      def micros(t: Timestamp): Long =
        t.getTime * 1000 + (t.getNanos / 1000) % 1000
      Cep.matchBatchGroups(ds, (e: SlimRow) => e.user_id,
        (e: SlimRow) => micros(e.ts), pattern,
        tie = (e: SlimRow) => e.event_id) { (u, m) =>
        val g = m("bad")
        PairOut(u, g.head.ts, g(1).ts)
      }.toDF("user_id", "first_ts", "second_ts")
        .orderBy("user_id", "first_ts", "second_ts")
    }
  )
}
