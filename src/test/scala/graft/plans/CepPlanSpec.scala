package graft.plans

import graft.SparkSuite
import graft.streaming.Cep
import org.apache.spark.sql.functions._

/** The planned CEP operator must agree with the library NFA (same
  * `Cep.advance` core, different driver) and must get its shuffle + sort
  * from the planner, not from Dataset-level operations. */
final case class E(event_id: Long, ts: java.sql.Timestamp,
    event_type: String, user_id: Long)

class CepPlanSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val events = Seq(
    // user 1: view -> click -> error (relaxed match), then another error
    (1L, ts("2024-01-01 10:00:00"), "view", 1L),
    (2L, ts("2024-01-01 10:10:00"), "click", 1L),
    (3L, ts("2024-01-01 10:20:00"), "error", 1L),
    (4L, ts("2024-01-01 10:30:00"), "error", 1L),
    // user 2: view then error 2h later (within-pruned for 1h pattern)
    (5L, ts("2024-01-01 09:00:00"), "view", 2L),
    (6L, ts("2024-01-01 11:00:01"), "error", 2L),
    // user 3: error with no preceding view
    (7L, ts("2024-01-01 09:00:00"), "error", 3L)
  ).toDF("event_id", "ts", "event_type", "user_id")

  private val hourMicros = 3600L * 1000 * 1000

  private def planned = CepPlan.matchPattern(events,
    key = col("user_id"), ts = col("ts"), tie = col("event_id"),
    steps = Seq(
      ("view", col("event_type") === "view", false),
      ("error", col("event_type") === "error", false)),
    withinMicros = Some(hourMicros))

  test("planned operator matches the library NFA result") {
    val got = planned
      .select($"key", $"view_event_id", $"error_event_id")
      .as[(Long, Long, Long)].collect().toSet

    val pattern = Cep.Pattern.begin[E]("view")(_.event_type == "view")
      .followedBy("error")(_.event_type == "error")
      .within(hourMicros)
    val lib = Cep.matchBatch(events.as[E], (e: E) => e.user_id,
      (e: E) => e.ts.getTime * 1000, pattern,
      tie = (e: E) => e.event_id) { (u, m) =>
      (u, m("view").event_id, m("error").event_id)
    }.collect().toSet

    assert(got === lib)
    // user 1's single view matches only the FIRST error (followedBy =
    // first occurrence); user 2 is within-pruned; user 3 never starts
    assert(got === Set((1L, 1L, 3L)))
  }

  test("rows with NULL event time are skipped, not fed at epoch 0") {
    // a null-ts error for user 1 would (if unboxed to 0L) sort first and
    // never match, OR complete a bogus match at epoch 0 — it must simply
    // be ignored
    val withNull = events.unionByName(Seq(
      (8L, null.asInstanceOf[java.sql.Timestamp], "error", 1L)
    ).toDF("event_id", "ts", "event_type", "user_id"))
    val got = CepPlan.matchPattern(withNull,
      key = col("user_id"), ts = col("ts"), tie = col("event_id"),
      steps = Seq(
        ("view", col("event_type") === "view", false),
        ("error", col("event_type") === "error", false)),
      withinMicros = Some(hourMicros))
      .select($"key", $"view_event_id", $"error_event_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 1L, 3L)), "null-ts row must not affect matches")
  }

  test("string keys survive uncopied gap rows (buffer aliasing guard)") {
    // key boundary occurs on a row that matches NO step predicate (so the
    // row is not copied); the retained key must not alias the reused
    // child-row buffer
    val df = Seq(
      ("u1", 1L, "view"), ("u1", 2L, "error"),
      ("u2", 3L, "other"), // uncopied row opens key u2
      ("u2", 4L, "view"), ("u2", 5L, "error")
    ).toDF("k", "ts", "event_type")
    val got = CepPlan.matchPattern(df,
      key = col("k"), ts = col("ts"), tie = col("ts"),
      steps = Seq(
        ("view", col("event_type") === "view", false),
        ("error", col("event_type") === "error", false)))
      .select($"key", $"view_ts", $"error_ts")
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("u1", 1L, 2L), ("u2", 4L, 5L)))
  }

  test("planner inserts exactly one hash shuffle and one sort below CepExec") {
    val df = planned
    df.collect() // materialize the AQE final plan
    // AQE prints initial + final plans; assert on the final section only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("Cep user_id")) // our node, not flagged invalid (!Cep)
    assert(!p.contains("!Cep"))
    assert(p.contains("Exchange hashpartitioning(user_id"))
    assert(p.contains("Sort [user_id"))
    assert("Exchange ".r.findAllIn(p).size === 1) // exactly one shuffle
  }

  test("strict next dies on an intervening event, relaxed survives") {
    val strict = CepPlan.matchPattern(events.where($"user_id" === 1L),
      key = col("user_id"), ts = col("ts"), tie = col("event_id"),
      steps = Seq(
        ("view", col("event_type") === "view", false),
        ("error", col("event_type") === "error", true))) // strict next
    // view(1) -> click(2) kills the strict partial; no match for user 1
    assert(strict.count() === 0)
  }

  test("output carries full child rows per step with step-prefixed names") {
    val row = planned.collect().head
    assert(row.getAs[Long]("key") === 1L)
    assert(row.getAs[String]("view_event_type") === "view")
    assert(row.getAs[java.sql.Timestamp]("error_ts") === ts("2024-01-01 10:20:00"))
  }

  test("planned operator agrees with qc1 library pipeline on sf0.001 events") {
    val ev = graft.Engine.table(spark, sf, "events")
      .selectExpr("event_id", "ts", "user_id", "event_type")
    val got = CepPlan.matchPattern(ev,
        key = col("user_id"), ts = col("ts"), tie = col("event_id"),
        steps = Seq(
          ("view", col("event_type") === "view", false),
          ("error", col("event_type") === "error", false)),
        withinMicros = Some(hourMicros))
      .groupBy($"key".as("user_id"), $"view_ts".as("start_ts"))
      .agg(min($"error_ts").as("end_ts"))
      .select("user_id", "start_ts", "end_ts")
      .collect().toSet
    val lib = run("qc1_cep_view_error").collect().toSet
    assert(got.nonEmpty && got === lib)
  }
}
