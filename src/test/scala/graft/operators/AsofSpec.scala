package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantics of the union-and-window as-of join / range count on hand-built
  * edge cases: inclusive equality, latest-wins, per-key isolation, inner vs
  * left unmatched handling, inclusive range bounds. */
class AsofSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val build = Seq(
    (1L, ts("2024-01-01 10:00:00"), 10.0),
    (1L, ts("2024-01-01 12:00:00"), 12.0),
    (2L, ts("2024-01-01 11:00:00"), 21.0)
  ).toDF("user_id", "ts", "value")

  private lazy val probe = Seq(
    (100L, 1L, ts("2024-01-01 11:00:00")), // between the two builds -> 10.0
    (101L, 1L, ts("2024-01-01 12:00:00")), // equal ts -> inclusive, 12.0
    (102L, 2L, ts("2024-01-01 10:30:00")), // before any build on key 2
    (103L, 3L, ts("2024-01-01 12:00:00")) // key with no build rows
  ).toDF("event_id", "user_id", "ts")

  test("asofJoin picks latest build at-or-before probe ts, inner drops unmatched") {
    val out = AsofOps.asofJoin(probe, build, "user_id", "ts", Seq("value"))
      .orderBy("event_id")
      .select("event_id", "asof_value").as[(Long, Double)].collect()
    assert(out === Seq((100L, 10.0), (101L, 12.0)))
  }

  test("asofJoinForward picks earliest build at-or-after probe ts, inner drops unmatched") {
    // 100 @11:00 -> next build 12:00 (12.0); 101 @12:00 -> inclusive,
    // 12.0; 102 @10:30 on key 2 -> 11:00 (21.0); 103 on key 3 -> drops;
    // 105 @09:00 on key 1 has TWO future builds (10:00 and 12:00) and
    // must take the EARLIEST (10.0) — the case that separates
    // "earliest at-or-after" from "any/latest after"
    val early = Seq((105L, 1L, ts("2024-01-01 09:00:00")))
      .toDF("event_id", "user_id", "ts")
    val out = AsofOps.asofJoinForward(probe.unionByName(early), build,
        "user_id", "ts", Seq("value"))
      .orderBy("event_id")
      .select("event_id", "asof_value").as[(Long, Double)].collect()
    assert(out === Seq((100L, 12.0), (101L, 12.0), (102L, 21.0), (105L, 10.0)))
  }

  test("asofJoinForward left keeps unmatched probes; probe AFTER every build drops in inner") {
    // a probe after the last build on its key has no forward match —
    // the mirror of backward's before-any-build case
    val late = Seq((104L, 1L, ts("2024-01-01 13:00:00")))
      .toDF("event_id", "user_id", "ts")
    assert(AsofOps.asofJoinForward(late, build, "user_id", "ts",
      Seq("value")).count() === 0L)
    val row = AsofOps.asofJoinForward(late, build, "user_id", "ts",
      Seq("value"), leftJoin = true).collect().head
    assert(row.getAs[Long]("event_id") === 104L)
    assert(row.isNullAt(row.fieldIndex("asof_value")))
    // match timestamp carries the build row's own ts
    val m = AsofOps.asofJoinForward(probe, build, "user_id", "ts",
      Seq("value")).where($"event_id" === 100L).collect().head
    assert(m.getAs[java.sql.Timestamp]("asof_ts") ===
      ts("2024-01-01 12:00:00"))
  }

  test("asofJoinNearest picks the closer side, resolves exact ties backward") {
    // key 1 builds at 10:00 (10.0) and 12:00 (12.0):
    //   110 @10:30 -> closer to 10:00 (30m vs 90m) -> 10.0
    //   111 @11:30 -> closer to 12:00 (30m) -> 12.0
    //   112 @11:00 -> EXACT tie (60m both sides) -> backward -> 10.0
    //   113 @09:00 -> only forward matches exist -> 10.0
    //   114 @13:00 -> only backward matches exist -> 12.0
    //   115 on key 3 -> no builds -> drops (inner)
    val p = Seq(
      (110L, 1L, ts("2024-01-01 10:30:00")),
      (111L, 1L, ts("2024-01-01 11:30:00")),
      (112L, 1L, ts("2024-01-01 11:00:00")),
      (113L, 1L, ts("2024-01-01 09:00:00")),
      (114L, 1L, ts("2024-01-01 13:00:00")),
      (115L, 3L, ts("2024-01-01 11:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = AsofOps.asofJoinNearest(p, build, "user_id", "ts", Seq("value"))
      .orderBy("event_id")
      .select("event_id", "asof_value").as[(Long, Double)].collect()
    assert(out === Seq((110L, 10.0), (111L, 12.0), (112L, 10.0),
      (113L, 10.0), (114L, 12.0)))
    // left form keeps the no-build probe with nulls
    val left = AsofOps.asofJoinNearest(p, build, "user_id", "ts",
      Seq("value"), leftJoin = true).where($"event_id" === 115L)
      .collect().head
    assert(left.isNullAt(left.fieldIndex("asof_value")))
    // equal-ts build matches at distance 0 (inclusive both directions)
    val eq = AsofOps.asofJoinNearest(
      Seq((116L, 1L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts"),
      build, "user_id", "ts", Seq("value")).collect().head
    assert(eq.getAs[Double]("asof_value") === 12.0)
  }

  test("asofJoinWithin rejects stale matches, keeps exact-boundary ones") {
    // key 1 builds at 10:00 and 12:00; tolerance 90 minutes:
    //   120 @11:00 -> 10:00 is 60m stale -> within, 10.0
    //   121 @11:30 -> 10:00 is exactly 90m stale -> INCLUSIVE, 10.0
    //   122 @11:45 -> 10:00 is 105m stale -> rejected (no fallback)
    //   123 @13:29 -> 12:00 within -> 12.0
    val p = Seq(
      (120L, 1L, ts("2024-01-01 11:00:00")),
      (121L, 1L, ts("2024-01-01 11:30:00")),
      (122L, 1L, ts("2024-01-01 11:45:00")),
      (123L, 1L, ts("2024-01-01 13:29:00"))
    ).toDF("event_id", "user_id", "ts")
    val tol = 90L * 60 * 1000000
    val inner = AsofOps.asofJoinWithin(p, build, "user_id", "ts",
        Seq("value"), tol)
      .orderBy("event_id")
      .select("event_id", "asof_value").as[(Long, Double)].collect()
    assert(inner === Seq((120L, 10.0), (121L, 10.0), (123L, 12.0)))
    // left form NULLS the rejected match instead of dropping the probe
    val left = AsofOps.asofJoinWithin(p, build, "user_id", "ts",
        Seq("value"), tol, leftJoin = true).orderBy("event_id").collect()
    assert(left.length === 4)
    val r122 = left.find(_.getAs[Long]("event_id") == 122L).get
    assert(r122.isNullAt(r122.fieldIndex("asof_ts")))
    assert(r122.isNullAt(r122.fieldIndex("asof_value")))
  }

  test("asofJoin left keeps unmatched probes with null payload") {
    val out = AsofOps.asofJoin(probe, build, "user_id", "ts", Seq("value"),
        leftJoin = true)
      .orderBy("event_id")
      .select("event_id", "asof_value").collect()
    assert(out.length === 4)
    assert(out.filter(_.isNullAt(1)).map(_.getLong(0)).toSeq === Seq(102L, 103L))
  }

  test("asofJoin preserves probe columns and match timestamp") {
    val row = AsofOps.asofJoin(probe, build, "user_id", "ts", Seq("value"))
      .where($"event_id" === 100L).collect().head
    assert(row.getAs[java.sql.Timestamp]("ts") === ts("2024-01-01 11:00:00"))
    assert(row.getAs[java.sql.Timestamp]("asof_ts") === ts("2024-01-01 10:00:00"))
    assert(row.getAs[Long]("user_id") === 1L)
  }

  test("asofJoin returns the matched row's NULL payload, not an older row's value") {
    // build: key 1 has a non-null value at 10:00 and a NULL value at 11:00;
    // a probe at 11:30 matches the 11:00 row, whose payload is NULL — the
    // per-column-last formulation would leak 10.0 from the older row here.
    val b = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(10.0), Some("a")),
      (1L, ts("2024-01-01 11:00:00"), None, Some("b"))
    ).toDF("user_id", "ts", "value", "tag2")
    val p = Seq((200L, 1L, ts("2024-01-01 11:30:00")))
      .toDF("event_id", "user_id", "ts")
    val row = AsofOps.asofJoin(p, b, "user_id", "ts", Seq("value", "tag2"))
      .collect().head
    assert(row.getAs[java.sql.Timestamp]("asof_ts") === ts("2024-01-01 11:00:00"))
    assert(row.isNullAt(row.fieldIndex("asof_value")),
      "NULL payload on the matched row must stay NULL")
    assert(row.getAs[String]("asof_tag2") === "b",
      "all asof_* columns must come from the same matched build row")
  }

  test("rangeCount counts builds in [probe-window, probe], inclusive ends") {
    val out = AsofOps.rangeCount(probe, build, "user_id", "ts",
        2L * 3600 * 1000000) // 2h window
      .orderBy("event_id")
      .select("event_id", "n_in_range").as[(Long, Long)].collect()
    // 100: build@10:00 within [09:00,11:00] -> 1
    // 101: builds@10:00 (exactly window edge) and @12:00 (equal ts) -> 2
    // 102: no build at-or-before on key 2 within window -> 0
    // 103: no builds on key 3 -> 0
    assert(out === Seq((100L, 1L), (101L, 2L), (102L, 0L), (103L, 0L)))
  }

  test("oracled queries produce deterministic nonempty output on sf0.001") {
    val j1 = run("qj1_asof_join").collect()
    val j2 = run("qj2_range_count").collect()
    assert(j1.nonEmpty && j2.nonEmpty)
    // as-of invariant: matched view ts <= purchase ts
    assert(run("qj1_asof_join")
      .where(col("asof_ts") > col("ts")).count() === 0)
  }
}
