package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Verbatim ports of the reference's stream Table-API group-window
  * ITCases (flink-table runtime/stream/table/GroupWindowITCase.scala) —
  * event-time tumbling + all four sliding alignments. Data fixtures and
  * expected lists are copied unchanged (the unused double/float/bigdec
  * payload columns of `data2` are omitted; no ported query references
  * them). Timestamps in expected strings use Flink's
  * `java.sql.Timestamp.toString` trimming (".0", ".01", ".005") — [[ts]]
  * reproduces it.
  *
  * Alignment notes: Spark's `window(ts, size, slide)` generates the same
  * epoch-aligned window set as the reference's
  * `TimeWindow.getWindowStartWithOffset`, including negative starts
  * (the 1969-12-31 23:59:59.995 window below). For slide > size —
  * Flink's non-overlapping "panes with gaps", which Spark's window()
  * rejects — the equivalent declarative plan is a tumbling window of
  * the SLIDE period with a pre-aggregation filter keeping only rows
  * inside the leading `size`-wide pane (SlidingEventTimeWindows
  * .assignWindows yields no window for the gap rows, which is exactly
  * the filter).
  *
  * WeightedAvg is the original's UDAGG (JavaUserDefinedAggFunctions
  * .WeightedAvg: sum(v·w) / sum(w), Long floor division); CountDistinct
  * is collect_set size (no streaming COUNT DISTINCT in Spark — same
  * trick as the SqlITCase ports in ITCaseSpec).
  */
class GroupWindowITCasePortSpec extends SparkSuite {
  import spark.implicits._

  // GroupWindowITCase.data — (long=rowtime ms, int, string)
  private val data = Seq(
    (1L, 1, "Hi"),
    (2L, 2, "Hello"),
    (4L, 2, "Hello"),
    (8L, 3, "Hello world"),
    (16L, 3, "Hello world"))

  // GroupWindowITCase.data2 — rowtime/int/string projection
  private val data2 = Seq(
    (1L, 1, "Hi"),
    (2L, 2, "Hallo"),
    (3L, 2, "Hello"),
    (4L, 5, "Hello"),
    (7L, 3, "Hello"),
    (8L, 3, "Hello world"),
    (16L, 4, "Hello world"),
    (32L, 4, null.asInstanceOf[String]))

  private val Flush = (1000000L, 0, "zzz_flush")

  /** Flink Timestamp.toString: trailing-zero-trimmed fraction, >=1 digit. */
  private def ts(t: java.sql.Timestamp): String = {
    val base = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(t.getTime))
    val trimmed = base.replaceAll("0+$", "")
    if (trimmed.endsWith(".")) trimmed + "0" else trimmed
  }

  private def runWindowed(rows: Seq[(Long, Int, String)],
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      name: String): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Int, String)]
    val df = build(input.toDF().toDF("l", "i", "s")
      .withColumn("rowtime", timestamp_millis($"l"))
      .withWatermark("rowtime", "0 milliseconds"))
    val q = df.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      input.addData(rows: _*); q.processAllAvailable()
      input.addData(Flush); q.processAllAvailable() // source-close watermark analog
      spark.table(name).collect().toSeq
    } finally { q.stop(); spark.sql(s"DROP VIEW IF EXISTS $name") }
  }

  // ---- testEventTimeTumblingWindow (GroupWindowITCase.scala:170)
  // Tumble 5ms, groupBy(w, string): count, avg(int), weightAvg(long,int),
  // weightAvg(int,int), min, max, sum, w.start, w.end, countDistinct(long)
  test("GroupWindowITCase testEventTimeTumblingWindow port") {
    val got = runWindowed(data, df => df
      .groupBy(window($"rowtime", "5 milliseconds"), $"s")
      .agg(
        expr("count(s) as cnt"),
        expr("sum(i) div count(i) as avg_i"), // Flink INT avg = floor div
        expr("sum(l * i) div sum(i) as wavg_l"),
        expr("sum(cast(i as bigint) * i) div sum(i) as wavg_i"),
        expr("min(i) as min_i"), expr("max(i) as max_i"),
        expr("sum(i) as sum_i"),
        expr("size(collect_set(l)) as cd")), "gw_tumble")
      .filter(_.getString(1) != "zzz_flush")
      .map { r =>
        val w = r.getStruct(0)
        Seq(r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getInt(6), r.getInt(7), r.getLong(8),
          ts(w.getTimestamp(0)), ts(w.getTimestamp(1)), r.getInt(9))
          .mkString(",")
      }
    val expected = Seq(
      "Hello world,1,3,8,3,3,3,3,1970-01-01 00:00:00.005,1970-01-01 00:00:00.01,1",
      "Hello world,1,3,16,3,3,3,3,1970-01-01 00:00:00.015,1970-01-01 00:00:00.02,1",
      "Hello,2,2,3,2,2,2,4,1970-01-01 00:00:00.0,1970-01-01 00:00:00.005,2",
      "Hi,1,1,1,1,1,1,1,1970-01-01 00:00:00.0,1970-01-01 00:00:00.005,1")
    assert(got.sorted == expected.sorted)
  }

  // ---- testAllEventTimeSlidingGroupWindowOverTime (GroupWindowITCase.scala:241)
  // Slide 5ms every 2ms, groupBy(w) only: count, w.start, w.end,
  // w.rowtime (= end - 1ms)
  test("GroupWindowITCase testAllEventTimeSlidingGroupWindowOverTime port") {
    val got = runWindowed(data2, df => df
      .groupBy(window($"rowtime", "5 milliseconds", "2 milliseconds"))
      .agg(expr("count(i) as cnt")), "gw_slide_all")
      .filter(_.getStruct(0).getTimestamp(0).getTime < 1000L) // drop flush windows
      .map { r =>
        val w = r.getStruct(0)
        val end = w.getTimestamp(1)
        Seq(r.getLong(1), ts(w.getTimestamp(0)), ts(end),
          ts(new java.sql.Timestamp(end.getTime - 1))).mkString(",")
      }
    val expected = Seq(
      "1,1970-01-01 00:00:00.008,1970-01-01 00:00:00.013,1970-01-01 00:00:00.012",
      "1,1970-01-01 00:00:00.012,1970-01-01 00:00:00.017,1970-01-01 00:00:00.016",
      "1,1970-01-01 00:00:00.014,1970-01-01 00:00:00.019,1970-01-01 00:00:00.018",
      "1,1970-01-01 00:00:00.016,1970-01-01 00:00:00.021,1970-01-01 00:00:00.02",
      "2,1969-12-31 23:59:59.998,1970-01-01 00:00:00.003,1970-01-01 00:00:00.002",
      "2,1970-01-01 00:00:00.006,1970-01-01 00:00:00.011,1970-01-01 00:00:00.01",
      "3,1970-01-01 00:00:00.002,1970-01-01 00:00:00.007,1970-01-01 00:00:00.006",
      "3,1970-01-01 00:00:00.004,1970-01-01 00:00:00.009,1970-01-01 00:00:00.008",
      "4,1970-01-01 00:00:00.0,1970-01-01 00:00:00.005,1970-01-01 00:00:00.004",
      "1,1970-01-01 00:00:00.028,1970-01-01 00:00:00.033,1970-01-01 00:00:00.032",
      "1,1970-01-01 00:00:00.03,1970-01-01 00:00:00.035,1970-01-01 00:00:00.034",
      "1,1970-01-01 00:00:00.032,1970-01-01 00:00:00.037,1970-01-01 00:00:00.036")
    assert(got.sorted == expected.sorted)
  }

  private def slidingKeyed(size: String, slide: String, name: String):
      Seq[String] =
    runWindowed(data2, df => df
      .groupBy(window($"rowtime", size, slide), $"s")
      .agg(expr("count(i) as cnt")), name)
      .filter(r => r.getString(1) != "zzz_flush")
      .map { r =>
        val w = r.getStruct(0)
        Seq(String.valueOf(r.getString(1)), r.getLong(2),
          ts(w.getTimestamp(0)), ts(w.getTimestamp(1))).mkString(",")
      }

  // ---- testEventTimeSlidingGroupWindowOverTimeOverlappingFullPane (:280)
  test("GroupWindowITCase sliding 10ms every 5ms (overlapping full pane) port") {
    val got = slidingKeyed("10 milliseconds", "5 milliseconds", "gw_slide_fp")
    val expected = Seq(
      "Hallo,1,1969-12-31 23:59:59.995,1970-01-01 00:00:00.005",
      "Hallo,1,1970-01-01 00:00:00.0,1970-01-01 00:00:00.01",
      "Hello world,1,1970-01-01 00:00:00.0,1970-01-01 00:00:00.01",
      "Hello world,1,1970-01-01 00:00:00.005,1970-01-01 00:00:00.015",
      "Hello world,1,1970-01-01 00:00:00.01,1970-01-01 00:00:00.02",
      "Hello world,1,1970-01-01 00:00:00.015,1970-01-01 00:00:00.025",
      "Hello,1,1970-01-01 00:00:00.005,1970-01-01 00:00:00.015",
      "Hello,2,1969-12-31 23:59:59.995,1970-01-01 00:00:00.005",
      "Hello,3,1970-01-01 00:00:00.0,1970-01-01 00:00:00.01",
      "Hi,1,1969-12-31 23:59:59.995,1970-01-01 00:00:00.005",
      "Hi,1,1970-01-01 00:00:00.0,1970-01-01 00:00:00.01",
      "null,1,1970-01-01 00:00:00.025,1970-01-01 00:00:00.035",
      "null,1,1970-01-01 00:00:00.03,1970-01-01 00:00:00.04")
    assert(got.sorted == expected.sorted)
  }

  // ---- testEventTimeSlidingGroupWindowOverTimeOverlappingSplitPane (:320)
  test("GroupWindowITCase sliding 5ms every 4ms (overlapping split pane) port") {
    val got = slidingKeyed("5 milliseconds", "4 milliseconds", "gw_slide_sp")
    val expected = Seq(
      "Hallo,1,1970-01-01 00:00:00.0,1970-01-01 00:00:00.005",
      "Hello world,1,1970-01-01 00:00:00.004,1970-01-01 00:00:00.009",
      "Hello world,1,1970-01-01 00:00:00.008,1970-01-01 00:00:00.013",
      "Hello world,1,1970-01-01 00:00:00.012,1970-01-01 00:00:00.017",
      "Hello world,1,1970-01-01 00:00:00.016,1970-01-01 00:00:00.021",
      "Hello,2,1970-01-01 00:00:00.0,1970-01-01 00:00:00.005",
      "Hello,2,1970-01-01 00:00:00.004,1970-01-01 00:00:00.009",
      "Hi,1,1970-01-01 00:00:00.0,1970-01-01 00:00:00.005",
      "null,1,1970-01-01 00:00:00.028,1970-01-01 00:00:00.033",
      "null,1,1970-01-01 00:00:00.032,1970-01-01 00:00:00.037")
    assert(got.sorted == expected.sorted)
  }

  /** slide > size: tumble by the SLIDE period, keep only rows inside the
    * leading `sizeMs`-wide pane, report the window as [start, start+size). */
  private def sparsePanes(sizeMs: Long, slideMs: Long, name: String):
      Seq[String] =
    runWindowed(data2, df => df
      .filter($"l" % slideMs < sizeMs)
      .groupBy(window($"rowtime", s"$slideMs milliseconds"), $"s")
      .agg(expr("count(i) as cnt")), name)
      .filter(r => r.getString(1) != "zzz_flush")
      .map { r =>
        val w = r.getStruct(0)
        val start = w.getTimestamp(0)
        Seq(String.valueOf(r.getString(1)), r.getLong(2), ts(start),
          ts(new java.sql.Timestamp(start.getTime + sizeMs))).mkString(",")
      }

  // ---- testEventTimeSlidingGroupWindowOverTimeNonOverlappingFullPane (:357)
  test("GroupWindowITCase sliding 5ms every 10ms (non-overlapping full pane) port") {
    val got = sparsePanes(5L, 10L, "gw_slide_nofp")
    val expected = Seq(
      "Hallo,1,1970-01-01 00:00:00.0,1970-01-01 00:00:00.005",
      "Hello,2,1970-01-01 00:00:00.0,1970-01-01 00:00:00.005",
      "Hi,1,1970-01-01 00:00:00.0,1970-01-01 00:00:00.005",
      "null,1,1970-01-01 00:00:00.03,1970-01-01 00:00:00.035")
    assert(got.sorted == expected.sorted)
  }

  // ---- testEventTimeSlidingGroupWindowOverTimeNonOverlappingSplitPane (:388)
  test("GroupWindowITCase sliding 3ms every 10ms (non-overlapping split pane) port") {
    val got = sparsePanes(3L, 10L, "gw_slide_nosp")
    val expected = Seq(
      "Hallo,1,1970-01-01 00:00:00.0,1970-01-01 00:00:00.003",
      "Hi,1,1970-01-01 00:00:00.0,1970-01-01 00:00:00.003",
      "null,1,1970-01-01 00:00:00.03,1970-01-01 00:00:00.033")
    assert(got.sorted == expected.sorted)
  }

  /** Session-window runner with the reference's 10ms-delayed watermark
    * (TimestampAndWatermarkWithOffset(10L)) and MULTI-BATCH feeding, so
    * the out-of-order rows of the fixtures arrive in a LATER micro-batch
    * than the sessions they bridge — merge-under-lateness runs through
    * the streaming session state, not just in-batch sorting. */
  private def runSession(batches: Seq[Seq[(Long, Int, String)]],
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      name: String): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Int, String)]
    val df = build(input.toDF().toDF("l", "i", "s")
      .withColumn("rowtime", timestamp_millis($"l"))
      .withWatermark("rowtime", "10 milliseconds"))
    val q = df.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      input.addData(Flush); q.processAllAvailable()
      spark.table(name).collect().toSeq
    } finally { q.stop(); spark.sql(s"DROP VIEW IF EXISTS $name") }
  }

  // ---- testEventTimeSessionGroupWindowOverTime (GroupWindowITCase.scala:98)
  // Session gap 5ms, groupBy(w, string): count, avg(int),
  // weightAvg(long,int), weightAvg(int,int), countDistinct(long).
  // The 4L row arrives in a SECOND batch (the reference's out-of-order
  // collection) and bridges the provisional [1,7) and [8,13) Hello
  // sessions into one [1,13) — count 4, avg 15/4=3 floor.
  test("GroupWindowITCase testEventTimeSessionGroupWindowOverTime port") {
    val got = runSession(
      Seq(Seq((1L, 1, "Hello"), (2L, 2, "Hello"), (8L, 8, "Hello"),
        (9L, 9, "Hello World")),
        Seq((4L, 4, "Hello"), (16L, 16, "Hello"))),
      df => df
        .groupBy(session_window($"rowtime", "5 milliseconds"), $"s")
        .agg(
          expr("count(i) as cnt"),
          expr("sum(i) div count(i) as avg_i"),
          expr("sum(l * i) div sum(i) as wavg_l"),
          expr("sum(cast(i as bigint) * i) div sum(i) as wavg_i"),
          expr("size(collect_set(l)) as cd")), "gw_session")
      .filter(_.getString(1) != "zzz_flush")
      .map { r =>
        Seq(r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getInt(6)).mkString(",")
      }
    val expected = Seq(
      "Hello World,1,9,9,9,1",
      "Hello,1,16,16,16,1",
      "Hello,4,3,5,5,4")
    assert(got.sorted == expected.sorted)
  }

  // ---- SqlITCase.testDistinctAggWithMergeOnEventTimeSessionGroupWindow
  // (runtime/stream/sql/SqlITCase.scala:57) — COUNT(DISTINCT b) +
  // SESSION_END over gap-5ms sessions; the 4L row triggers the merge of
  // [1,2] with [8,10] and the distinct set dedups ACROSS the merge.
  test("SqlITCase testDistinctAggWithMergeOnEventTimeSessionGroupWindow port") {
    val got = runSession(
      Seq(Seq((1L, 2, "Hello"), (2L, 2, "Hello"), (8L, 2, "Hello"),
        (10L, 3, "Hello"), (9L, 9, "Hello World")),
        Seq((4L, 1, "Hello"), (16L, 16, "Hello"))),
      df => df
        .groupBy(session_window($"rowtime", "5 milliseconds"), $"s")
        .agg(expr("size(collect_set(i)) as cd")), "gw_session_distinct")
      .filter(_.getString(1) != "zzz_flush")
      .map { r =>
        val w = r.getStruct(0)
        Seq(r.getString(1), r.getInt(2), ts(w.getTimestamp(1))).mkString(",")
      }
    val expected = Seq(
      "Hello World,1,1970-01-01 00:00:00.014",
      "Hello,1,1970-01-01 00:00:00.021",
      "Hello,3,1970-01-01 00:00:00.015")
    assert(got.sorted == expected.sorted)
  }

  // ---- the BATCH GroupWindowITCase remainder (flink-table
  // runtime/batch/table/GroupWindowITCase.scala). Its fixture:
  // (long=rowtime ms, int, double, float, bigdec, string); the two
  // @Test(expected = UnsupportedOperationException) cases
  // (testAllEventTimeTumblingWindowOverCount /
  // testAllEventTimeSlidingGroupWindowOverCount — NON-GROUPED count
  // windows) are N/A: they assert a REFERENCE limitation; the
  // equivalent Spark plans below simply work.

  private val batchData = Seq(
    (1L, 1, 1d, "Hi"), (2L, 2, 2d, "Hallo"), (3L, 2, 2d, "Hello"),
    (7L, 3, 3d, "Hello"), (4L, 5, 5d, "Hello"),
    (16L, 4, 4d, "Hello world"), (8L, 3, 3d, "Hello world"))

  test("batch GroupWindowITCase testEventTimeTumblingGroupWindowOverCount port") {
    import org.apache.spark.sql.expressions.Window
    // 2-row tumbling count window per string in rowtime order; only
    // COMPLETE pairs emit (Hello's third row and Hi's single row drop).
    // Reference expected (int/double portions; the bigdec column carries
    // the same values as double): Hello: sum 7, cnt 2, max 5, min 2,
    // int-avg 3 (integer division), double-avg 3.5; Hello world: 7,2,4,3
    val df = batchData.toDF("long", "int", "double", "string")
    val got = df
      .withColumn("rn",
        row_number().over(Window.partitionBy($"string").orderBy($"long")) - 1)
      .groupBy($"string", ($"rn" / 2).cast("int").as("w"))
      .agg(count($"int").as("cnt"), sum($"int").as("si"),
        max($"int").as("mxi"), min($"int").as("mni"),
        (sum($"int") / count($"int")).cast("int").as("avgi"),
        sum($"double").as("sd"), max($"double").as("mxd"),
        min($"double").as("mnd"), avg($"double").as("avgd"))
      .where($"cnt" === 2)
      .select($"string", $"si", $"cnt", $"mxi", $"mni", $"avgi",
        $"sd", $"mxd", $"mnd", $"avgd")
      .collect().map(_.mkString(",")).toSeq.sorted
    assert(got === Seq(
      "Hello world,7,2,4,3,3,7.0,4.0,3.0,3.5",
      "Hello,7,2,5,2,3,7.0,5.0,2.0,3.5").sorted)
  }

  test("batch GroupWindowITCase testAllEventTimeTumblingWindowOverTime port") {
    // non-grouped 5ms tumble: sums 10 (rows 1-4), 6 (7,8), 4 (16);
    // w.rowtime = end - 1ms
    val df = batchData.toDF("long", "int", "double", "string")
      .withColumn("rowtime", timestamp_millis($"long"))
    val got = df.groupBy(window($"rowtime", "5 milliseconds"))
      .agg(sum($"int").as("si"))
      .select($"si", $"window.start", $"window.end")
      .collect().map(r => Seq(r.getLong(0), ts(r.getTimestamp(1)),
        ts(r.getTimestamp(2))).mkString(",")).toSeq.sorted
    assert(got === Seq(
      "10,1970-01-01 00:00:00.0,1970-01-01 00:00:00.005",
      "6,1970-01-01 00:00:00.005,1970-01-01 00:00:00.01",
      "4,1970-01-01 00:00:00.015,1970-01-01 00:00:00.02").sorted)
  }

  test("batch GroupWindowITCase testAllEventTimeSessionGroupWindow port") {
    // non-grouped session, 2ms gap: {1..4}->[1,6), {7,8}->[7,10),
    // {16}->[16,18)
    val df = batchData.toDF("long", "int", "double", "string")
      .withColumn("rowtime", timestamp_millis($"long"))
    val got = df.groupBy(session_window($"rowtime", "2 milliseconds"))
      .agg(count($"string").as("cnt"))
      .select($"cnt", $"session_window.start", $"session_window.end")
      .collect().map(r => Seq(r.getLong(0), ts(r.getTimestamp(1)),
        ts(r.getTimestamp(2))).mkString(",")).toSeq.sorted
    assert(got === Seq(
      "4,1970-01-01 00:00:00.001,1970-01-01 00:00:00.006",
      "2,1970-01-01 00:00:00.007,1970-01-01 00:00:00.01",
      "1,1970-01-01 00:00:00.016,1970-01-01 00:00:00.018").sorted)
  }

  test("batch GroupWindowITCase testEventTimeSessionGroupWindow port") {
    // grouped session, 3ms gap (reference :183): per-string sessions
    val df = batchData.toDF("long", "int", "double", "string")
      .withColumn("rowtime", timestamp_millis($"long"))
    val got = df.groupBy($"string", session_window($"rowtime", "3 milliseconds"))
      .agg(sum($"int").as("si"))
      .select($"string", $"si", $"session_window.start")
      .collect().map(r => Seq(r.getString(0), r.getLong(1),
        ts(r.getTimestamp(2))).mkString(",")).toSeq.sorted
    // Hello: rows at 3,4,7 chain within 3ms -> one session sum 10;
    // Hallo@2: 2; Hi@1: 1; Hello world: 8 and 16 separate
    assert(got === Seq(
      "Hallo,2,1970-01-01 00:00:00.002",
      "Hello,10,1970-01-01 00:00:00.003",
      "Hello world,3,1970-01-01 00:00:00.008",
      "Hello world,4,1970-01-01 00:00:00.016",
      "Hi,1,1970-01-01 00:00:00.001").sorted)
  }

  test("batch GroupWindowITCase testMultiGroupWindow port") {
    // two chained tumbling windows: 2ms on rowtime, then 6ms on the
    // first window's rowtime (= end - 1ms)
    val df = batchData.toDF("long", "int", "double", "string")
      .withColumn("rowtime", timestamp_millis($"long"))
    val first = df
      .groupBy($"string", window($"rowtime", "2 milliseconds"))
      .agg(count($"int").as("cnt"))
      .select($"string", $"cnt",
        (unix_millis($"window.end") - 1).as("tms"))
      .select($"string", $"cnt", expr("timestamp_millis(tms)").as("time"))
    val got = first
      .groupBy($"string", window($"time", "6 milliseconds"))
      .agg(sum($"cnt").as("cnt"))
      .select($"string", $"cnt", $"window.end")
      .collect().map(r => Seq(r.getString(0), r.getLong(1),
        ts(r.getTimestamp(2))).mkString(",")).toSeq.sorted
    assert(got === Seq(
      "Hallo,1,1970-01-01 00:00:00.006",
      "Hello world,1,1970-01-01 00:00:00.012",
      "Hello world,1,1970-01-01 00:00:00.018",
      "Hello,1,1970-01-01 00:00:00.012",
      "Hello,2,1970-01-01 00:00:00.006",
      "Hi,1,1970-01-01 00:00:00.006").sorted)
  }
}
