package graft.operators

import graft.{Det, Q, QueryModule}
import graft.Det._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OVER aggregates and time-window (group-window) aggregations — the batch
  * re-expression of the reference's OVER runtime
  * (DataStreamOverAggregate.scala:45, RowTimeBoundedRowsOver.scala) and
  * TUMBLE/HOP/SESSION group windows (DataStreamGroupWindowAggregate.scala:48,
  * windows.scala:162-468). Spark exceeds the reference in batch (the 1.6
  * streaming SQL had no ROW_NUMBER/RANK/LAG/LEAD — FunctionCatalog.scala:302-462);
  * the streaming twins of the window aggs live in graft.streaming.
  *
  * Scale notes: every OVER partition key here (suppkey/custkey) has bounded
  * per-key cardinality, so the window sort is a partition-local sort after a
  * hash shuffle — no global sort. Time-window aggs are plain hash aggregates
  * on (bucket, key) — fully parallel, partial-agg friendly.
  */
object WindowQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Running sum, ROWS UNBOUNDED PRECEDING (exact decimal accumulation so
    // every prefix is bit-identical cross-engine). lineitem has no unique
    // key — (orderkey, linenumber) pairs repeat — so the window order
    // tie-breaks through l_quantity (rows still tied are interchangeable for
    // a quantity prefix-sum) and the output order tie-breaks through
    // running_qty itself.
    q("qw1_running_sum",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "lineitem")
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            sum(col("l_quantity").cast(Det.DEC)).over(w).cast("double")
              .as("running_qty"))
          .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            col("running_qty"))
    },

    // Top-N per group via row_number (reference's first(n)-after-sortGroup
    // pattern, UnsortedGrouping.java:202).
    q("qw2_topn_per_group",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    // LAG / LEAD / RANK / DENSE_RANK over an event-time ordering.
    q("qw3_lag_lead_rank",
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // Bounded ROWS frame: moving average over the last 3 rows
    // (reference: ProcTime/RowTimeBoundedRowsOver.scala — `ROWS n PRECEDING`).
    q("qw4_moving_avg",
      """SELECT o_custkey, o_orderkey,
        |  (CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) OVER w AS DOUBLE)
        |    / COUNT(*) OVER w) AS mavg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          (sum(col("o_totalprice").cast(Det.DEC)).over(w).cast("double")
            / count(lit(1)).over(w)).as("mavg"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // TUMBLE group window (reference: windows.scala Tumble DSL;
    // DataSetTumbleTimeWindowAggReduceGroupFunction). Epoch-aligned 1h
    // buckets == DuckDB time_bucket.
    q("qw5_tumble",
      s"""SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS w_start,
         |  event_type, COUNT(*) AS n, ${DSUM("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("w_start"), col("event_type"))
    },

    // HOP (sliding) group window, 1h size / 30m slide: each row belongs to
    // two overlapping windows (reference: Slide DSL, windows.scala:254).
    q("qw6_hop",
      s"""WITH b AS (
         |  SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS tb, value
         |  FROM events),
         |x AS (
         |  SELECT tb AS w_start, value FROM b
         |  UNION ALL
         |  SELECT tb - INTERVAL '30 minutes' AS w_start, value FROM b)
         |SELECT w_start, COUNT(*) AS n, ${DSUM("value")} AS sum_value
         |FROM x GROUP BY w_start ORDER BY w_start""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("w_start"), col("n"), col("sum_value"))
        .orderBy(col("w_start"))
    },

    // SESSION group window, 10-minute gap, per user (reference: Session DSL
    // windows.scala:335; merging assigner MergingWindowAssigner.java).
    // Oracle = classic gaps-and-islands; session start = first event ts.
    // The gap boundary is INCLUSIVE on the merge side (adversarial-
    // fixture check): an event arriving EXACTLY gap after its
    // predecessor extends the session in Spark's session_window AND in
    // the reference (TimeWindow.intersects uses <=), so the oracle
    // breaks only on strictly-greater gaps — the benign fixture's
    // second-granular timestamps never landed on the exact boundary,
    // hiding the >= off-by-one.
    q("qw7_session",
      s"""WITH g AS (
         |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         |    CASE WHEN CAST(ts AS TIMESTAMP)
         |      - lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts)
         |      > INTERVAL '10 minutes' THEN 1 ELSE 0 END AS brk
         |  FROM events),
         |sess AS (
         |  SELECT user_id, ts, value,
         |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM g)
         |SELECT user_id, MIN(ts) AS s_start, COUNT(*) AS n_events,
         |  ${DSUM("value")} AS sum_value
         |FROM sess GROUP BY user_id, sid
         |ORDER BY user_id, s_start""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .groupBy(session_window(col("ts"), "10 minutes").as("sw"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"), col("sw.start").as("s_start"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("s_start"))
    },

    // Exact DISTINCT aggregation inside a time window (distinct users per
    // hour) — reference: DistinctAccumulator within group windows.
    q("qw9_window_distinct",
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS w_start,
        |  COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .select(col("window.start").as("w_start"), col("n_users"),
          col("n_events"))
        .orderBy(col("w_start"))
    },

    // Dynamic-gap sessions (DynamicEventTimeSessionWindows): each event
    // proposes [ts, ts+gap) — 2 minutes after an 'error', 10 minutes
    // otherwise — and overlapping windows merge, so the session's
    // extension horizon is the running MAX(ts+gap) over merged elements
    // (not the last element's gap). Computed by
    // StreamOps.dynamicGapSessions; the oracle is gaps-and-islands
    // breaking where ts >= MAX(ts+gap) over all preceding rows (gaps are
    // positive, so a prior session's horizon can never exceed the current
    // session's running max — the partition-wide MAX is safe).
    q("qw10_dynamic_sessions",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |g AS (SELECT user_id, ts,
        |    MAX(epoch_us(ts) + CASE WHEN event_type = 'error'
        |                            THEN 120000000 ELSE 600000000 END)
        |      OVER (PARTITION BY user_id ORDER BY ts
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS horizon
        |  FROM e),
        |b AS (SELECT user_id, ts,
        |    CASE WHEN horizon IS NULL OR epoch_us(ts) < horizon
        |         THEN 0 ELSE 1 END AS brk FROM g),
        |s AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM b)
        |SELECT user_id, MIN(ts) AS s_start, MAX(ts) AS s_end, COUNT(*) AS n
        |FROM s GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val ds = t(s, d, "events")
          .selectExpr("user_id", "ts", "event_type")
          .as[(Long, java.sql.Timestamp, String)]
        def micros(t: java.sql.Timestamp): Long =
          t.getTime * 1000 + (t.getNanos / 1000) % 1000
        graft.streaming.StreamOps.dynamicGapSessions[Long, (Long, java.sql.Timestamp, String)](
          ds, _._1, e => micros(e._2),
          e => if (e._3 == "error") 120000000L else 600000000L)
          .toDF("user_id", "start_us", "end_us", "n")
          .select(col("user_id"),
            expr("timestamp_micros(start_us)").as("s_start"),
            expr("timestamp_micros(end_us)").as("s_end"),
            col("n").cast("long").as("n"))
          .orderBy(col("user_id"), col("s_start"))
    },

    // RANGE frame over a numeric ordering (reference: RANGE INTERVAL
    // PRECEDING — RowTimeBoundedRangeOver.scala): all orders within 1000.0
    // of the current price.
    q("qw8_range_frame",
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_in_range
        |FROM orders ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin) {
      (s, d) =>
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
            expr("""COUNT(*) OVER (PARTITION BY o_orderpriority
                   |  ORDER BY o_totalprice
                   |  RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)""".stripMargin)
              .as("n_in_range"))
          .orderBy(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
    },

    // CUMULATE group window (1h span / 15m step — the Flink-1.13-era
    // windowing TVF, beyond both the 1.6 reference and Spark's built-in
    // window()): each hour emits four GROWING windows [h, h+15m),
    // [h, 30m), [h, 45m), [h, 1h) — the early-firing dashboard shape.
    // Composed as an explode over the steps an event participates in
    // (an event at minute m of its hour lands in windows
    // floor(m/15)+1 .. 4) + one partial-aggregated groupBy — no custom
    // operator, and the explode factor is the step count (≤4), not the
    // row count.
    q("qw11_cumulate",
      s"""WITH b AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, value
         |  FROM events),
         |x AS (SELECT (tsu // 3600000000) * 3600000000 AS hb, g.k AS k,
         |    value
         |  FROM b, UNNEST(generate_series(
         |    ((tsu - (tsu // 3600000000) * 3600000000) // 900000000) + 1,
         |    4)) AS g(k))
         |SELECT make_timestamp(hb) AS w_start,
         |  make_timestamp(hb + k * 900000000) AS w_end,
         |  COUNT(*) AS n, ${DSUM("value")} AS sum_value
         |FROM x GROUP BY hb, k ORDER BY w_start, w_end""".stripMargin) {
      (s, d) =>
      val hourUs = 3600L * 1000000L
      val stepUs = 900L * 1000000L
      t(s, d, "events")
        .withColumn("tsu", unix_micros(col("ts")))
        .withColumn("hb", expr(s"(tsu div $hourUs) * $hourUs"))
        .withColumn("k",
          explode(expr(s"sequence((tsu - hb) div $stepUs + 1, 4)")))
        .groupBy(col("hb"), col("k"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(timestamp_micros(col("hb")).as("w_start"),
          timestamp_micros(col("hb") + col("k") * stepUs).as("w_end"),
          col("n"), col("sum_value"))
        .orderBy(col("w_start"), col("w_end"))
    }
  )
}
