package graft.streaming

import graft.{Q, QueryModule}
import java.sql.Timestamp

/** Quantified-CEP conformance on the batch surface: begin("err").times(2)
  * matches every pair of CONSECUTIVE error events per user (strict
  * repetition contiguity) — in SQL, a lag() check that the previous event
  * of the user is also an error.
  */
object CepQuantQuery extends QueryModule {
  import CepQueries.EventRow

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
        .selectExpr("event_id", "ts", "user_id", "event_type", "value")
        .as[EventRow]
      val pattern = Cep.Pattern.begin[EventRow]("err")(_.event_type == "error")
        .times(2)
      def micros(t: Timestamp): Long =
        t.getTime * 1000 + (t.getNanos / 1000) % 1000
      Cep.matchBatchGroups(ds, (e: EventRow) => e.user_id,
        (e: EventRow) => micros(e.ts), pattern,
        tie = (e: EventRow) => e.event_id) { (u, m) =>
        val errs = m("err")
        PairOut(u, errs.head.ts, errs(1).ts)
      }.toDF().orderBy("user_id", "first_ts", "second_ts")
    }
  )
}
