package graft.operators

import graft.{Q, QueryModule}
import org.apache.spark.sql.functions._

/** Oracled queries for the temporal-join operators in [[AsofOps]], over the
  * events table (purchases probe, views build). DuckDB's native ASOF JOIN
  * is the oracle for the as-of join — an independent implementation of the
  * same semantics, so agreement is strong evidence. Determinism: events has
  * no duplicate (user_id, ts) within an event type (verified at sf0.01 and
  * sf0.1), all output columns are raw data values, and event_id is a unique
  * total order key.
  */
object AsofQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    // Each purchase joined to the user's most recent view at-or-before the
    // purchase instant (inner: purchases with no prior view drop).
    q("qj1_asof_join",
      """WITH v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts,
        |  v.ts AS asof_ts, v.value AS asof_value
        |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      AsofOps.asofJoin(purchases, views, "user_id", "ts", Seq("value"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_ts"), col("asof_value"))
        .orderBy(col("event_id"))
    },

    // FORWARD as-of (round 15): each purchase joined to the user's
    // EARLIEST view at-or-after the purchase instant (pandas
    // merge_asof direction='forward'; DuckDB expresses it natively
    // with the inequality flipped — an independent oracle again).
    // Same one-shuffle union+window plan, frame mirrored.
    q("qj6_asof_forward",
      """WITH v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts,
        |  v.ts AS asof_ts, v.value AS asof_value
        |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      AsofOps.asofJoinForward(purchases, views, "user_id", "ts",
          Seq("value"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_ts"), col("asof_value"))
        .orderBy(col("event_id"))
    },

    // NEAREST as-of (round 15): each purchase joined to the user's view
    // CLOSEST in time, either side; equidistant resolves backward. DuckDB
    // has no nearest direction, so the oracle composes its backward and
    // forward ASOF joins with the same integer-micros distance pick — an
    // independent implementation built from two independently-verified
    // primitives. Inner form: users with no views at all drop. All
    // compared values are raw data; the distance math is exact BIGINTs.
    q("qj7_asof_nearest",
      """WITH v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |bk AS (SELECT p.event_id, v.ts AS bts, v.value AS bval
        |  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts),
        |fw AS (SELECT p.event_id, v.ts AS fts, v.value AS fval
        |  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts)
        |SELECT p.event_id, p.user_id, p.ts,
        |  CASE WHEN bts IS NOT NULL AND (fts IS NULL
        |      OR epoch_us(p.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(p.ts))
        |    THEN bts ELSE fts END AS asof_ts,
        |  CASE WHEN bts IS NOT NULL AND (fts IS NULL
        |      OR epoch_us(p.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(p.ts))
        |    THEN bval ELSE fval END AS asof_value
        |FROM p JOIN bk USING (event_id) JOIN fw USING (event_id)
        |WHERE bts IS NOT NULL OR fts IS NOT NULL
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      AsofOps.asofJoinNearest(purchases, views, "user_id", "ts",
          Seq("value"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_ts"), col("asof_value"))
        .orderBy(col("event_id"))
    },

    // TOLERANCE-bounded as-of (round 15, pandas merge_asof tolerance=):
    // the latest view matches only when it is at most 2 days stale;
    // older matches are REJECTED, not replaced — stale features are
    // worse than missing ones. LEFT form exercises the nulling path;
    // the matched time travels as nullable epoch micros (qj5 posture).
    // The oracle post-filters DuckDB's backward ASOF with the same
    // inclusive integer-micros gap rule.
    q("qj8_asof_tolerance",
      """WITH v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts,
        |  CASE WHEN epoch_us(p.ts) - epoch_us(v.ts) <= 172800000000
        |    THEN epoch_us(v.ts) END AS asof_ts_us,
        |  CASE WHEN epoch_us(p.ts) - epoch_us(v.ts) <= 172800000000
        |    THEN v.value END AS asof_value
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      AsofOps.asofJoinWithin(purchases, views, "user_id", "ts",
          Seq("value"), 2L * 86400 * 1000000, leftJoin = true)
        .select(col("event_id"), col("user_id"), col("ts"),
          unix_micros(col("asof_ts")).as("asof_ts_us"), col("asof_value"))
        .orderBy(col("event_id"))
    },

    // Views within the 7 days before each purchase (inclusive bounds),
    // counted by a single RANGE-frame window pass — the batch twin of the
    // streaming interval join, without the per-key quadratic of a
    // key-join-then-filter plan.
    q("qj2_range_count",
      """WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, CAST(COUNT(v.ts) AS BIGINT) AS n_in_range
        |FROM p LEFT JOIN v ON v.user_id = p.user_id
        |  AND v.ts BETWEEN p.ts - INTERVAL 7 DAY AND p.ts
        |GROUP BY p.event_id, p.user_id, p.ts
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      AsofOps.rangeCount(purchases, views, "user_id", "ts",
        7L * 86400 * 1000000)
        .select(col("event_id"), col("user_id"), col("ts"), col("n_in_range"))
        .orderBy(col("event_id"))
    },

    // The STATEFUL temporal-join operator (StreamOps.temporalJoin — the
    // streaming TemporalRowTimeJoin) run in its batch-degradation mode
    // against the same ASOF oracle as qj1: one operator, one semantic,
    // two execution regimes (keyed-state streaming with watermark-gated
    // emission, or this batch as-of). Inner form: facts preceding every
    // version drop.
    q("qj3_temporal_join_operator",
      """WITH v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |  v.value AS asof_value
        |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val ev = t(s, d, "events")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
          col("value"))
        .as[(Long, Long, Double)]
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
          col("event_id"))
        .as[(Long, Long, Long)]
      graft.streaming.StreamOps.temporalJoin[Long, Long, Double](
          purchases, views)
        .filter((r: (Long, Long, Long, Option[Double])) => r._4.isDefined)
        .map(r => (r._3, r._1, r._2, r._4.get))
        .toDF("event_id", "user_id", "ts_us", "asof_value")
        .orderBy("event_id")
    },

    // The SQL-TEXT temporal join surface ([[TemporalSql]] — the
    // SQL:2011 `FOR SYSTEM_TIME AS OF` form users write, executed over
    // the same union+window as-of runtime) against the same DuckDB ASOF
    // oracle family as qj1/qj3: a THIRD independent expression of the
    // point-in-time semantics, one truth.
    q("qj4_temporal_sql",
      """WITH v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts,
        |  v.ts AS version_ts, v.value AS rate
        |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
        .createOrReplaceTempView("qj4_versions")
      ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
        .createOrReplaceTempView("qj4_facts")
      TemporalSql(s,
        """SELECT f.event_id, f.user_id, f.ts,
          |  v.ts AS version_ts, v.value AS rate
          |FROM qj4_facts f
          |JOIN qj4_versions FOR SYSTEM_TIME AS OF f.ts AS v
          |  ON f.user_id = v.user_id
          |ORDER BY f.event_id""".stripMargin)
    },

    // The LEFT form of the SQL-text surface: facts preceding every
    // version (or with no version at all) survive with NULLs — DuckDB's
    // ASOF LEFT JOIN is the independent oracle. The matched version
    // time travels as nullable epoch micros (the qj3 posture: a NULL
    // timestamp column would hash as NaT on the driver's pandas side,
    // where only None/NaN count as null).
    q("qj5_temporal_sql_left",
      """WITH v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts,
        |  epoch_us(v.ts) AS version_ts_us, v.value AS rate
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
        .createOrReplaceTempView("qj5_versions")
      ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
        .createOrReplaceTempView("qj5_facts")
      TemporalSql(s,
        """SELECT f.event_id, f.user_id, f.ts,
          |  unix_micros(v.ts) AS version_ts_us, v.value AS rate
          |FROM qj5_facts f
          |LEFT JOIN qj5_versions FOR SYSTEM_TIME AS OF f.ts AS v
          |  ON f.user_id = v.user_id
          |ORDER BY f.event_id""".stripMargin)
    }
  )
}
