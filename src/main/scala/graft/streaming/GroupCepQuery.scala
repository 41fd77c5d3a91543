package graft.streaming

import graft.{Q, QueryModule}

/** Oracled query for CEP pattern GROUPS ([[GroupCep]] — flink-cep
  * GroupPattern): `signup (view click){1,2} purchase` per user.
  *
  * Why this is SQL-checkable: every boundary in the pattern is relaxed
  * TILL_NEXT (followedBy entry, default loop), so each step binds to the
  * FIRST occurrence after the previous step in the per-user (ts, event_id)
  * order — a deterministic chain. The quantified group forks exit + loop at
  * each repetition, so a signup yields up to TWO matches (1-rep and 2-rep),
  * each an independent first-occurrence chain. The oracle computes the same
  * chains with next-occurrence window minima and joins them explicitly.
  */
object GroupCepQuery extends QueryModule {

  def all: Seq[Q] = Seq(
    q("qc7_cep_group_times",
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
        |  FROM events
        |  WHERE event_type IN ('signup', 'view', 'click', 'purchase')),
        |n AS (SELECT *,
        |    MIN(CASE WHEN event_type = 'view' THEN seq END) OVER w AS next_view,
        |    MIN(CASE WHEN event_type = 'click' THEN seq END) OVER w AS next_click,
        |    MIN(CASE WHEN event_type = 'purchase' THEN seq END) OVER w AS next_purchase
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY seq
        |               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
        |one AS (SELECT g.user_id, g.ts AS start_ts, 1 AS n_reps, p1.ts AS end_ts
        |  FROM n g
        |  JOIN n v1 ON v1.user_id = g.user_id AND v1.seq = g.next_view
        |  JOIN n c1 ON c1.user_id = g.user_id AND c1.seq = v1.next_click
        |  JOIN n p1 ON p1.user_id = g.user_id AND p1.seq = c1.next_purchase
        |  WHERE g.event_type = 'signup'),
        |two AS (SELECT g.user_id, g.ts AS start_ts, 2 AS n_reps, p2.ts AS end_ts
        |  FROM n g
        |  JOIN n v1 ON v1.user_id = g.user_id AND v1.seq = g.next_view
        |  JOIN n c1 ON c1.user_id = g.user_id AND c1.seq = v1.next_click
        |  JOIN n v2 ON v2.user_id = g.user_id AND v2.seq = c1.next_view
        |  JOIN n c2 ON c2.user_id = g.user_id AND c2.seq = v2.next_click
        |  JOIN n p2 ON p2.user_id = g.user_id AND p2.seq = c2.next_purchase
        |  WHERE g.event_type = 'signup')
        |SELECT user_id, start_ts, CAST(n_reps AS BIGINT) AS n_reps, end_ts
        |FROM (SELECT * FROM one UNION ALL SELECT * FROM two)
        |ORDER BY user_id, start_ts, n_reps""".stripMargin) { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.functions.{col, expr}
      // relaxed contiguity everywhere → restricting the scan to the four
      // referenced event types is semantics-preserving and pushes the
      // filter into the parquet scan (same argument as qc1)
      val ds = t(s, d, "events")
        .where("event_type IN ('signup', 'view', 'click', 'purchase')")
        .selectExpr("event_id", "unix_micros(ts) AS tsu", "user_id",
          """CASE event_type WHEN 'signup' THEN 0 WHEN 'view' THEN 1
            |WHEN 'click' THEN 2 ELSE 3 END AS code""".stripMargin)
        .as[(Long, Long, Long, Int)]
      type R = (Long, Long, Long, Int)
      val p = GroupCep.GPattern.begin[R]("s")(_._4 == 0)
        .followedBy(GroupCep.GPattern.begin[R]("v")(_._4 == 1)
          .followedBy("c")(_._4 == 2)).times(1, 2)
        .followedBy("p")(_._4 == 3)
      GroupCep.matchBatchGroups(ds, (e: R) => e._3, (e: R) => e._2, p,
        tie = (e: R) => e._1) { (u, g) =>
        (u, g("s").head._2, g("v").size.toLong, g("p").head._2)
      }.toDF("user_id", "start_us", "n_reps", "end_us")
        .select(col("user_id"),
          expr("timestamp_micros(start_us)").as("start_ts"),
          col("n_reps"),
          expr("timestamp_micros(end_us)").as("end_ts"))
        .orderBy("user_id", "start_ts", "n_reps")
    },

    q("qc8_cep_group_planned",
      // identical semantics to qc7, driven through the PLANNED operator
      // (GroupCepPlan: one Exchange + one Sort, codegen'd leaf predicates)
      // instead of the library groupByKey driver — same oracle chains
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
        |  FROM events
        |  WHERE event_type IN ('signup', 'view', 'click', 'purchase')),
        |n AS (SELECT *,
        |    MIN(CASE WHEN event_type = 'view' THEN seq END) OVER w AS next_view,
        |    MIN(CASE WHEN event_type = 'click' THEN seq END) OVER w AS next_click,
        |    MIN(CASE WHEN event_type = 'purchase' THEN seq END) OVER w AS next_purchase
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY seq
        |               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
        |one AS (SELECT g.user_id, g.ts AS start_ts, 1 AS n_reps, p1.ts AS end_ts
        |  FROM n g
        |  JOIN n v1 ON v1.user_id = g.user_id AND v1.seq = g.next_view
        |  JOIN n c1 ON c1.user_id = g.user_id AND c1.seq = v1.next_click
        |  JOIN n p1 ON p1.user_id = g.user_id AND p1.seq = c1.next_purchase
        |  WHERE g.event_type = 'signup'),
        |two AS (SELECT g.user_id, g.ts AS start_ts, 2 AS n_reps, p2.ts AS end_ts
        |  FROM n g
        |  JOIN n v1 ON v1.user_id = g.user_id AND v1.seq = g.next_view
        |  JOIN n c1 ON c1.user_id = g.user_id AND c1.seq = v1.next_click
        |  JOIN n v2 ON v2.user_id = g.user_id AND v2.seq = c1.next_view
        |  JOIN n c2 ON c2.user_id = g.user_id AND c2.seq = v2.next_click
        |  JOIN n p2 ON p2.user_id = g.user_id AND p2.seq = c2.next_purchase
        |  WHERE g.event_type = 'signup')
        |SELECT user_id, start_ts, CAST(n_reps AS BIGINT) AS n_reps, end_ts
        |FROM (SELECT * FROM one UNION ALL SELECT * FROM two)
        |ORDER BY user_id, start_ts, n_reps""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.functions.col
      import graft.plans.GroupCepPlan.{GGroupSpec, GLeafSpec}
      // same semantics-preserving pre-filter as qc7 (relaxed contiguity)
      val ev = t(s, d, "events")
        .where("event_type IN ('signup', 'view', 'click', 'purchase')")
        .selectExpr("event_id", "ts", "user_id", "event_type")
      graft.plans.GroupCepPlan.matchGroupPattern(ev,
          key = col("user_id"), ts = col("ts"), tie = col("event_id"),
          elems = Seq(
            GLeafSpec("s", col("event_type") === "signup"),
            GGroupSpec(Seq(
              GLeafSpec("v", col("event_type") === "view"),
              GLeafSpec("c", col("event_type") === "click")), min = 1, max = 2),
            GLeafSpec("p", col("event_type") === "purchase")))
        .select(col("key").as("user_id"), col("s_ts").as("start_ts"),
          col("v_count").as("n_reps"), col("p_ts").as("end_ts"))
        .orderBy("user_id", "start_ts", "n_reps")
    })
}
