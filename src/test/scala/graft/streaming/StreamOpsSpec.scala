package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Click(user: Long, kind: String, ts: Timestamp, value: Double)

class StreamOpsSpec extends SparkSuite {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("streaming tumble agg with watermark (append mode emits closed windows)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Click]
    val agg = StreamOps.withEventTime(input.toDF(), "ts", "10 minutes")
      .groupBy(StreamOps.tumble(col("ts"), "1 hour"), col("kind"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("tumble_out").start()
    try {
      input.addData(
        Click(1, "view", t("2024-01-01 00:10:00"), 1.0),
        Click(2, "view", t("2024-01-01 00:40:00"), 2.0),
        Click(3, "click", t("2024-01-01 00:50:00"), 5.0))
      q.processAllAvailable()
      // advance watermark past 01:00 + 10m so the 00:00 window closes
      input.addData(Click(4, "view", t("2024-01-01 02:00:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("tumble_out")
        .select(col("window.start").cast("string"), col("kind"), col("n"), col("v"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(rows == Set(
        ("2024-01-01 00:00:00", "view", 2L, 3.0),
        ("2024-01-01 00:00:00", "click", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming CUMULATE windows: growing per-hour windows emit as " +
      "the watermark passes each step") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Click]
    // qw11's composition on a stream: explode each event into the steps
    // it participates in, stamp each with that step's window END, and
    // tumble on the end-stamp — append mode then emits each growing
    // window exactly when the watermark passes its end.
    val agg = input.toDF()
      .withColumn("tsu", unix_micros(col("ts")))
      .withColumn("hb", expr("(tsu div 3600000000) * 3600000000"))
      .withColumn("k",
        explode(expr("sequence((tsu - hb) div 900000000 + 1, 4)")))
      .withColumn("wend",
        timestamp_micros(col("hb") + col("k") * lit(900000000L)))
      .withWatermark("wend", "0 seconds")
      .groupBy(window(col("wend"), "15 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("cumulate_out").start()
    try {
      input.addData(
        Click(1, "view", t("2024-01-01 00:10:00"), 1.0),
        Click(2, "view", t("2024-01-01 00:40:00"), 2.0),
        Click(3, "click", t("2024-01-01 00:50:00"), 5.0))
      q.processAllAvailable()
      input.addData(Click(4, "view", t("2024-01-01 02:00:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("cumulate_out")
        .select(col("window.start").cast("string"), col("n"), col("v"))
        .as[(String, Long, Double)].collect().toSet
      // growing windows of hour 0: [00:00,00:15) holds e1; [..,00:30)
      // still e1; [..,00:45) e1+e2; [..,01:00) all three. The hour-2
      // advancer's own growing windows up to the watermark close too
      // (its 03:00 window stays open: wm == end, not past it).
      assert(rows == Set(
        ("2024-01-01 00:15:00", 1L, 1.0),
        ("2024-01-01 00:30:00", 1L, 1.0),
        ("2024-01-01 00:45:00", 2L, 3.0),
        ("2024-01-01 01:00:00", 3L, 8.0),
        ("2024-01-01 02:15:00", 1L, 1.0),
        ("2024-01-01 02:30:00", 1L, 1.0),
        ("2024-01-01 02:45:00", 1L, 1.0)))
    } finally q.stop()
  }

  test("streaming Top-N: incremental per-key rank updates, silent when " +
      "the top set is unchanged") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val h = new VirtualClockHarness[String, (String, Long, Double),
      Vector[(Double, Long)], (String, Int, Long, Double)](
      GroupStateTimeout.NoTimeout(), StreamOps.streamingTopNFn[String](3))
    // first batch establishes the top-3
    assert(h.input("k", ("k", 1L, 5.0), ("k", 2L, 9.0), ("k", 3L, 7.0))
      == Seq(("k", 1, 2L, 9.0), ("k", 2, 3L, 7.0), ("k", 3, 1L, 5.0)))
    // a row below the current 3rd changes nothing and emits nothing
    assert(h.input("k", ("k", 4L, 1.0)).isEmpty)
    // a new contender re-stamps the whole top-3
    assert(h.input("k", ("k", 5L, 8.0))
      == Seq(("k", 1, 2L, 9.0), ("k", 2, 5L, 8.0), ("k", 3, 3L, 7.0)))
    // state holds exactly the top-3, nothing below
    assert(h.stateOf("k") == Some(Vector((9.0, 2L), (8.0, 5L), (7.0, 3L))))
    // ties rank by id ascending
    assert(h.input("k", ("k", 0L, 9.0))
      == Seq(("k", 1, 0L, 9.0), ("k", 2, 2L, 9.0), ("k", 3, 5L, 8.0)))
    // an id re-arriving with a CHANGED value occupies ONE slot: the
    // update REPLACES the stored value instead of adding a second entry
    assert(h.input("k", ("k", 2L, 6.0))
      == Seq(("k", 1, 0L, 9.0), ("k", 2, 5L, 8.0), ("k", 3, 2L, 6.0)))
    assert(h.stateOf("k") == Some(Vector((9.0, 0L), (8.0, 5L), (6.0, 2L))))
    // duplicate id WITHIN a batch: the max value wins (deterministic
    // under any partition-dependent iterator order)
    assert(h.input("k", ("k", 7L, 5.0), ("k", 7L, 6.5))
      == Seq(("k", 1, 0L, 9.0), ("k", 2, 5L, 8.0), ("k", 3, 7L, 6.5)))
  }

  test("streaming Top-N over a real update-mode query") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val q = StreamOps.streamingTopN(input.toDS(), 2)
      .writeStream.outputMode("update")
      .format("memory").queryName("topn_out").start()
    try {
      input.addData(("a", 1L, 3.0), ("a", 2L, 5.0), ("b", 9L, 1.0))
      q.processAllAvailable()
      val n1 = spark.table("topn_out").count()
      assert(n1 == 3) // a: 2 rows, b: 1 row
      input.addData(("a", 3L, 4.0)) // displaces id 1 from a's top-2
      q.processAllAvailable()
      val rows = spark.table("topn_out")
        .as[(String, Int, Long, Double)].collect()
      // the second batch re-emitted a's full top-2
      assert(rows.length == 5)
      val latestA = rows.drop(3).filter(_._1 == "a").sortBy(_._2)
      assert(latestA.toSeq ==
        Seq(("a", 1, 2L, 5.0), ("a", 2, 3L, 4.0)))
    } finally q.stop()
  }

  test("streaming session windows merge on gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Click]
    val agg = StreamOps.withEventTime(input.toDF(), "ts", "5 minutes")
      .groupBy(StreamOps.session(col("ts"), "10 minutes"), col("user"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      input.addData(
        Click(1, "a", t("2024-01-01 00:00:00"), 0),
        Click(1, "a", t("2024-01-01 00:05:00"), 0), // merges (gap 5 < 10)
        Click(1, "a", t("2024-01-01 00:30:00"), 0)) // new session
      q.processAllAvailable()
      input.addData(Click(2, "a", t("2024-01-01 03:00:00"), 0)) // close all
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select(col("session_window.start").cast("string"), col("user"), col("n"))
        .as[(String, Long, Long)].collect().toSet
      assert(rows == Set(
        ("2024-01-01 00:00:00", 1L, 2L),
        ("2024-01-01 00:30:00", 1L, 1L)))
    } finally q.stop()
  }

  test("streaming dedup drops repeated keys within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Click]
    val out = StreamOps.dedup(
      StreamOps.withEventTime(input.toDF(), "ts", "1 hour"),
      Seq("user", "kind"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      input.addData(
        Click(1, "view", t("2024-01-01 00:00:00"), 1.0),
        Click(1, "view", t("2024-01-01 00:01:00"), 2.0),
        Click(1, "click", t("2024-01-01 00:02:00"), 3.0))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("watermark-bounded dedup: duplicates inside the delay drop, state then evicts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Click]
    // key is (user, kind) WITHOUT the event-time column — state per key
    // evicts once the watermark passes first-seen + 10 minutes
    val out = StreamOps.dedupWithinWatermark(
      StreamOps.withEventTime(input.toDF(), "ts", "10 minutes"),
      Seq("user", "kind"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_wm_out").start()
    try {
      input.addData(Click(1, "view", t("2024-01-01 00:00:00"), 1.0))
      q.processAllAvailable()
      // a copy 5 min later (inside the delay) drops; the unrelated key
      // advances the watermark to 00:50
      input.addData(
        Click(1, "view", t("2024-01-01 00:05:00"), 2.0),
        Click(2, "click", t("2024-01-01 01:00:00"), 3.0))
      q.processAllAvailable()
      assert(spark.table("dedup_wm_out").count() == 2)
      // user 1's state expired (watermark 00:50 > first-seen + 10 min):
      // a late third copy SURVIVES — the documented bounded-state trade
      input.addData(Click(1, "view", t("2024-01-01 01:05:00"), 4.0))
      q.processAllAvailable()
      assert(spark.table("dedup_wm_out").count() == 3)
    } finally q.stop()
  }

  test("splitSinks: one cached pass per epoch feeds every route's sink") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val input = MemoryStream[Click]
    val views = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val clicks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = StreamOps.splitSinks(input.toDF(), Seq(
      (col("kind") === "view", (b: org.apache.spark.sql.DataFrame, e: Long) =>
        b.select("user").collect().foreach(r => views.synchronized {
          views += ((r.getLong(0), e)) }): Unit),
      (col("kind") === "click", (b: org.apache.spark.sql.DataFrame, e: Long) =>
        b.select("user").collect().foreach(r => clicks.synchronized {
          clicks += ((r.getLong(0), e)) }): Unit)))
    try {
      input.addData(
        Click(1, "view", t("2024-01-01 00:00:00"), 1.0),
        Click(2, "click", t("2024-01-01 00:01:00"), 2.0),
        Click(3, "view", t("2024-01-01 00:02:00"), 3.0))
      q.processAllAvailable()
      input.addData(Click(4, "click", t("2024-01-01 00:03:00"), 4.0))
      q.processAllAvailable()
      assert(views.map(_._1).toSet == Set(1L, 3L))
      assert(clicks.map(_._1).toSet == Set(2L, 4L))
      // epochs flowed through (idempotent sinks can key on them)
      assert(clicks.map(_._2).distinct.size == 2)
    } finally q.stop()
  }

  test("interval join matches events within the time bound") {
    implicit val sqlCtx = spark.sqlContext
    val orders = MemoryStream[Click]
    val ships = MemoryStream[Click]
    val joined = StreamOps.intervalJoin(
      StreamOps.withEventTime(orders.toDF().toDF("o_user", "o_kind", "o_ts", "o_v"), "o_ts", "1 hour"),
      StreamOps.withEventTime(ships.toDF().toDF("s_user", "s_kind", "s_ts", "s_v"), "s_ts", "1 hour"),
      "o_user", "s_user", "o_ts", "s_ts", "'0' MINUTE", "'30' MINUTE")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ij_out").start()
    try {
      orders.addData(Click(1, "order", t("2024-01-01 00:00:00"), 0))
      ships.addData(
        Click(1, "ship", t("2024-01-01 00:20:00"), 0), // within 30m
        Click(1, "ship", t("2024-01-01 00:50:00"), 0)) // outside
      q.processAllAvailable()
      val got = spark.table("ij_out")
        .select(col("o_user"), col("s_ts").cast("string"))
        .as[(Long, String)].collect().toSeq
      assert(got == Seq((1L, "2024-01-01 00:20:00")))
    } finally q.stop()
  }

  test("broadcastProcess: control stream updates rules applied to later batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val tagEnc: org.apache.spark.sql.Encoder[(Option[(String, Double)], Option[(String, Double)])] =
      ExpressionEncoder()
    val control = MemoryStream[(String, Double)] // (kind, threshold)
    val data = MemoryStream[(String, Double)] // (kind, value)
    val union = control.toDS().map(c => (Option(c), Option.empty[(String, Double)]))
      .union(data.toDS().map(d => (Option.empty[(String, Double)], Option(d))))
    val rules = new StreamOps.BroadcastRules[String, Double]
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val q = union.writeStream.foreachBatch(
      StreamOps.broadcastProcess[(String, Double), (String, Double),
        String, Double, (String, Double)](
        rules,
        toRule = c => (c._1, c._2),
        process = (d, r) =>
          if (d._2 > r.getOrElse(d._1, 0.0)) Seq(d) else Nil) {
        ds => out.synchronized { out ++= ds.collect() }; ()
      }).start()
    try {
      control.addData(("a", 5.0))
      q.processAllAvailable()
      data.addData(("a", 3.0), ("a", 7.0), ("b", 1.0))
      q.processAllAvailable()
      // rule for a = 5 → only 7.0 passes; no rule for b → default 0 → 1.0
      assert(out.toSet === Set(("a", 7.0), ("b", 1.0)))
      control.addData(("b", 10.0)) // rule update changes later batches
      q.processAllAvailable()
      data.addData(("b", 5.0), ("b", 11.0))
      q.processAllAvailable()
      assert(out.toSet === Set(("a", 7.0), ("b", 1.0), ("b", 11.0)))
    } finally q.stop()
  }

  test("connectProcess shares keyed state between two inputs (CoProcessFunction)") {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val tagEnc: org.apache.spark.sql.Encoder[(Option[(Long, Double)], Option[(Long, Double)])] =
      ExpressionEncoder()
    // control stream sets a per-key threshold; data stream emits values
    // above the latest threshold for its key (default 0.0) — the classic
    // CoProcessFunction composition, driven per-key via shared state
    val control = Seq((1L, 5.0), (2L, 100.0)).toDS()
    val data = Seq((1L, 3.0), (1L, 7.0), (2L, 50.0), (3L, 1.0)).toDS()
    val out = StreamOps.connectProcess[Long, (Long, Double), (Long, Double),
      Double, (Long, Double)](
      control, data, _._1, _._1)(
      (k, ctrl, rows, state) => {
        ctrl.lastOption.foreach(c => state.update(c._2))
        val threshold = state.getOption.getOrElse(0.0)
        rows.filter(_._2 > threshold).iterator
      }).collect().toSet
    // key 1: threshold 5 → only 7.0; key 2: threshold 100 → nothing;
    // key 3: no control → default 0 → 1.0 passes
    assert(out === Set((1L, 7.0), (3L, 1.0)))
  }

  test("left-outer interval join emits unmatched rows null-padded after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val orders = MemoryStream[Click]
    val ships = MemoryStream[Click]
    val joined = StreamOps.intervalJoinOuter(
      StreamOps.withEventTime(orders.toDF().toDF("o_user", "o_kind", "o_ts", "o_v"), "o_ts", "10 minutes"),
      StreamOps.withEventTime(ships.toDF().toDF("s_user", "s_kind", "s_ts", "s_v"), "s_ts", "10 minutes"),
      "o_user", "s_user", "o_ts", "s_ts", "'0' MINUTE", "'30' MINUTE",
      "left_outer")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ijo_out").start()
    try {
      orders.addData(
        Click(1, "matched", t("2024-01-01 00:00:00"), 0),
        Click(2, "unmatched", t("2024-01-01 00:00:00"), 0))
      ships.addData(Click(1, "ship", t("2024-01-01 00:20:00"), 0))
      q.processAllAvailable()
      // push both watermarks far past the join window so user 2's
      // null-padded row becomes final
      orders.addData(Click(9, "late-driver", t("2024-01-01 06:00:00"), 0))
      ships.addData(Click(9, "late-driver", t("2024-01-01 06:00:00"), 0))
      q.processAllAvailable()
      ships.addData(Click(9, "x", t("2024-01-01 07:00:00"), 0))
      q.processAllAvailable()
      val got = spark.table("ijo_out")
        .select($"o_user", $"o_kind", $"s_kind")
        .as[(Long, String, Option[String])].collect()
        .filter(r => r._1 == 1L || r._1 == 2L).toSet
      assert(got.contains((1L, "matched", Some("ship"))))
      assert(got.contains((2L, "unmatched", None)),
        s"unmatched left row must surface null-padded, got $got")
    } finally q.stop()
  }

  test("windowed stream-stream join pairs events in the same tumbling window") {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[Click]
    val r = MemoryStream[Click]
    def bucketed(m: MemoryStream[Click], prefix: String) =
      StreamOps.withEventTime(m.toDF(), "ts", "10 minutes")
        .select(col("user").as(s"${prefix}_user"), col("kind").as(s"${prefix}_kind"),
          window(col("ts"), "1 hour").as(s"${prefix}_w"))
    val joined = bucketed(l, "l").join(bucketed(r, "r"),
      expr("l_user = r_user AND l_w = r_w"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("wj_out").start()
    try {
      l.addData(Click(1, "view", t("2024-01-01 00:10:00"), 0))
      r.addData(
        Click(1, "buy", t("2024-01-01 00:50:00"), 0), // same window
        Click(1, "buy", t("2024-01-01 01:10:00"), 0)) // next window
      l.addData(Click(9, "view", t("2024-01-01 06:00:00"), 0)) // advance wm
      r.addData(Click(9, "buy", t("2024-01-01 06:00:00"), 0))
      q.processAllAvailable()
      val got = spark.table("wj_out")
        .select(col("l_user"), col("l_w.start").cast("string"))
        .as[(Long, String)].collect().toSet
      assert(got.contains((1L, "2024-01-01 00:00:00")))
      assert(!got.exists { case (u, w) => u == 1L && w == "2024-01-01 01:00:00" })
    } finally q.stop()
  }

  test("unbounded stream-stream inner join matches rows across epochs without watermarks") {
    // SURVEY §2.4 row 49: the reference's unbounded streaming inner join
    // (both sides' state retained forever). Spark supports exactly this
    // shape for INNER equi-joins — no watermark, no time bound, state
    // unbounded (the same state contract the reference has; OUTER
    // variants are the ones that require watermarks in both engines).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val left = MemoryStream[(Long, String)]
    val right = MemoryStream[(Long, String)]
    val joined = left.toDF().toDF("k", "lv")
      .join(right.toDF().toDF("rk", "rv"), expr("k = rk"))
    assert(joined.isStreaming)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("unbounded_join_out").start()
    try {
      left.addData((1L, "l1")); q.processAllAvailable()
      // the match arrives EPOCHS later — left state must still hold row 1
      right.addData((1L, "r1")); q.processAllAvailable()
      left.addData((2L, "l2")); right.addData((2L, "r2"))
      q.processAllAvailable()
      // and again: no watermark ever evicts the epoch-1 left row
      right.addData((1L, "r3")); q.processAllAvailable()
      val got = spark.table("unbounded_join_out")
        .select($"k", $"lv", $"rv").as[(Long, String, String)]
        .collect().toSet
      assert(got == Set((1L, "l1", "r1"), (2L, "l2", "r2"), (1L, "l1", "r3")))
    } finally q.stop()
  }

  test("countWindow emits every n elements per key (streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Click]
    val out = StreamOps.countWindow(input.toDS(), (c: Click) => c.user, 2, 0.0)(
      (acc, c) => acc + c.value)((k, acc) => (k, acc))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cw_out").start()
    try {
      input.addData(
        Click(1, "a", t("2024-01-01 00:00:00"), 1.0),
        Click(1, "a", t("2024-01-01 00:01:00"), 2.0),
        Click(1, "a", t("2024-01-01 00:02:00"), 4.0)) // 3rd buffers
      q.processAllAvailable()
      input.addData(Click(1, "a", t("2024-01-01 00:03:00"), 8.0)) // completes 2nd window
      q.processAllAvailable()
      val got = spark.table("cw_out").as[(Long, Double)].collect().toSeq
      assert(got == Seq((1L, 3.0), (1L, 12.0)))
    } finally q.stop()
  }

  test("event-time running sum (streaming OVER emulation) emits in order past watermark") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val stEnc: org.apache.spark.sql.Encoder[OverWindows.OverState[Click]] =
      ExpressionEncoder()
    implicit val midEnc: org.apache.spark.sql.Encoder[(Long, Click, Seq[Double])] =
      ExpressionEncoder()
    def us(s: String) = Timestamp.valueOf(s).getTime * 1000L
    val input = MemoryStream[Click]
    val withWm = StreamOps.withEventTime(input.toDF(), "ts", "10 minutes")
      .as[Click]
    val out = StreamOps.eventTimeRunningSum[Long, Click](
      withWm, _.user, c => c.ts.getTime * 1000L, _.value)
    val q = out.toDF().toDF("user", "ts_us", "v", "running")
      .writeStream.outputMode("append")
      .format("memory").queryName("over_out").start()
    try {
      // out-of-order arrivals within the watermark delay
      input.addData(
        Click(1, "a", t("2024-01-01 00:05:00"), 2.0),
        Click(1, "a", t("2024-01-01 00:01:00"), 1.0))
      q.processAllAvailable()
      input.addData(Click(1, "a", t("2024-01-01 01:00:00"), 8.0)) // advances wm
      q.processAllAvailable()
      input.addData(Click(2, "a", t("2024-01-01 03:00:00"), 0.0)) // advance wm
      q.processAllAvailable()
      // timeout fires on the batch after the watermark passes 01:00
      input.addData(Click(2, "a", t("2024-01-01 04:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("over_out").as[(Long, Long, Double, Double)]
        .collect().filter(_._1 == 1L).sortBy(_._2)
      // running sums follow EVENT time (1.0 at 00:01 before 2.0 at 00:05)
      assert(got.map(r => (r._2, r._4)).toSeq == Seq(
        (us("2024-01-01 00:01:00"), 1.0),
        (us("2024-01-01 00:05:00"), 3.0),
        (us("2024-01-01 01:00:00"), 11.0)))
    } finally q.stop()
  }

  test("eventTimeSorted releases out-of-order rows in event-time order") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val stEnc: org.apache.spark.sql.Encoder[(Long, Seq[(Long, Double)])] =
      ExpressionEncoder()
    val input = MemoryStream[Click]
    val withWm = StreamOps.withEventTime(input.toDF(), "ts", "10 minutes").as[Click]
    val out = StreamOps.eventTimeSorted[Long, Click](
      withWm, _.user, c => c.ts.getTime * 1000L, _.value)
    val q = out.toDF().toDF("user", "ts_us", "v")
      .writeStream.outputMode("append")
      .format("memory").queryName("sorted_out").start()
    try {
      input.addData( // arrival order scrambled vs event time
        Click(1, "a", t("2024-01-01 00:03:00"), 3.0),
        Click(1, "a", t("2024-01-01 00:01:00"), 1.0),
        Click(1, "a", t("2024-01-01 00:02:00"), 2.0))
      q.processAllAvailable()
      input.addData(Click(2, "a", t("2024-01-01 05:00:00"), 0.0))
      q.processAllAvailable()
      input.addData(Click(2, "a", t("2024-01-01 09:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("sorted_out").where($"user" === 1)
        .select($"v").as[Double].collect().toSeq
      assert(got == Seq(1.0, 2.0, 3.0)) // event-time order, not arrival
    } finally q.stop()
  }

  test("event-time ROWS-2-PRECEDING frame sum matches the batch window") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val stEnc: org.apache.spark.sql.Encoder[OverWindows.OverState[Click]] =
      ExpressionEncoder()
    implicit val midEnc: org.apache.spark.sql.Encoder[(Long, Click, Seq[Double])] =
      ExpressionEncoder()
    val clicks = Seq(
      Click(1, "a", t("2024-01-01 00:01:00"), 1.0),
      Click(1, "a", t("2024-01-01 00:02:00"), 2.0),
      Click(1, "a", t("2024-01-01 00:03:00"), 4.0),
      Click(1, "a", t("2024-01-01 00:04:00"), 8.0))
    val input = MemoryStream[Click]
    val withWm = StreamOps.withEventTime(input.toDF(), "ts", "10 minutes").as[Click]
    val out = StreamOps.eventTimeRowsFrameSum[Long, Click](
      withWm, _.user, c => c.ts.getTime * 1000L, _.value, precedingRows = 2)
    val q = out.toDF().toDF("user", "ts_us", "v", "fsum")
      .writeStream.outputMode("append")
      .format("memory").queryName("frame_out").start()
    try {
      input.addData(clicks: _*)
      q.processAllAvailable()
      input.addData(Click(2, "a", t("2024-01-01 05:00:00"), 0.0))
      q.processAllAvailable()
      input.addData(Click(2, "a", t("2024-01-01 09:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("frame_out").where($"user" === 1)
        .orderBy($"ts_us").select($"fsum").as[Double].collect().toSeq
      // batch-window equivalent: sums over rows [i-2, i]
      assert(got == Seq(1.0, 3.0, 7.0, 14.0))
    } finally q.stop()
  }

  test("streaming dynamic-gap sessions close only past the watermark, match batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val stEnc: org.apache.spark.sql.Encoder[Seq[(Long, Long)]] =
      ExpressionEncoder()
    // per-event gap: 2 minutes for kind "a", 30s otherwise
    def gapOf(c: Click): Long =
      if (c.kind == "a") 120L * 1000000 * 60 / 60 else 30L * 1000000
    val clicks = Seq(
      Click(1, "a", t("2024-01-01 00:00:00"), 0),
      Click(1, "a", t("2024-01-01 00:01:00"), 0), // same session (gap 2m)
      Click(1, "a", t("2024-01-01 00:10:00"), 0)) // new session
    val input = MemoryStream[Click]
    val withWm = StreamOps.withEventTime(input.toDF(), "ts", "1 minute").as[Click]
    val out = StreamOps.eventTimeDynamicGapSessions[Long, Click](
      withWm, _.user, c => c.ts.getTime * 1000, gapOf)
    val q = out.toDF("user", "start_us", "end_us", "n")
      .writeStream.outputMode("append")
      .format("memory").queryName("dyn_sess_out").start()
    try {
      input.addData(clicks: _*)
      q.processAllAvailable()
      // first session [00:00, 00:01] closes once wm > 00:03 (horizon =
      // max(ts+gap));
      // wm after batch 1 = 00:09 → emitted. second session still open.
      val afterFirst = spark.table("dyn_sess_out")
        .as[(Long, Long, Long, Int)].collect().toSet
      assert(afterFirst.map(r => (r._2, r._3, r._4)) ===
        Set((t("2024-01-01 00:00:00").getTime * 1000,
          t("2024-01-01 00:01:00").getTime * 1000, 2)))
      input.addData(Click(2, "b", t("2024-01-01 01:00:00"), 0)) // push wm
      q.processAllAvailable()
      input.addData(Click(2, "b", t("2024-01-01 02:00:00"), 0)) // fire timeout
      q.processAllAvailable()
      val all = spark.table("dyn_sess_out")
        .where($"user" === 1).as[(Long, Long, Long, Int)].collect().toSet
      assert(all.map(_._4) === Set(2, 1), s"second session must close: $all")
      // batch parity: same events through the batch operator
      val batch = StreamOps.dynamicGapSessions[Long, Click](
        clicks.toDS(), _.user, c => c.ts.getTime * 1000, gapOf)
        .collect().toSet
      assert(batch.map(r => (r._2, r._3, r._4)) ===
        all.map(r => (r._2, r._3, r._4)))
    } finally q.stop()
  }

  test("streaming dynamic-gap sessions honor an earlier element's larger gap") {
    // decreasing gaps (the reference-divergence case from
    // DynamicEventTimeSessionWindows): (00:00 gap 10m), (00:01 gap 30s).
    // The session horizon is max(ts+gap) = 00:10, NOT 00:01:30 — so the
    // watermark reaching 00:02 must NOT close it, and an event at 00:05
    // still merges in.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val stEnc: org.apache.spark.sql.Encoder[Seq[(Long, Long)]] =
      ExpressionEncoder()
    def gapOf(c: Click): Long =
      if (c.kind == "a") 600L * 1000000 else 30L * 1000000
    val input = MemoryStream[Click]
    val withWm = StreamOps.withEventTime(input.toDF(), "ts", "1 minute").as[Click]
    val out = StreamOps.eventTimeDynamicGapSessions[Long, Click](
      withWm, _.user, c => c.ts.getTime * 1000, gapOf)
    val q = out.toDF("user", "start_us", "end_us", "n")
      .writeStream.outputMode("append")
      .format("memory").queryName("dyn_sess_merge_out").start()
    try {
      input.addData(
        Click(1, "a", t("2024-01-01 00:00:00"), 0), // horizon 00:10
        Click(1, "b", t("2024-01-01 00:01:00"), 0), // horizon stays 00:10
        Click(2, "b", t("2024-01-01 00:03:00"), 0)) // wm → 00:02
      q.processAllAvailable()
      // wm = 00:02 > last+gap(last) = 00:01:30 but < horizon 00:10:
      // the session must still be open
      assert(spark.table("dyn_sess_merge_out").where($"user" === 1).count() === 0)
      input.addData(Click(1, "b", t("2024-01-01 00:05:00"), 0)) // merges in
      input.addData(Click(2, "b", t("2024-01-01 01:00:00"), 0)) // wm → 00:59
      q.processAllAvailable()
      input.addData(Click(2, "b", t("2024-01-01 02:00:00"), 0)) // fire timeout
      q.processAllAvailable()
      val got = spark.table("dyn_sess_merge_out").where($"user" === 1)
        .as[(Long, Long, Long, Int)].collect().toSet
      assert(got.map(r => (r._2, r._3, r._4)) ===
        Set((t("2024-01-01 00:00:00").getTime * 1000,
          t("2024-01-01 00:05:00").getTime * 1000, 3)))
    } finally q.stop()
  }

  test("event-time RANGE-2min-PRECEDING frame sum matches the batch RANGE window") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val stEnc: org.apache.spark.sql.Encoder[OverWindows.OverState[Click]] =
      ExpressionEncoder()
    implicit val midEnc: org.apache.spark.sql.Encoder[(Long, Click, Seq[Double])] =
      ExpressionEncoder()
    // minute gaps 1,2,3,6 — the 00:06 row's 2-minute frame holds only
    // itself, unlike a ROWS frame which would still reach back
    val clicks = Seq(
      Click(1, "a", t("2024-01-01 00:01:00"), 1.0),
      Click(1, "a", t("2024-01-01 00:02:00"), 2.0),
      Click(1, "a", t("2024-01-01 00:03:00"), 4.0),
      Click(1, "a", t("2024-01-01 00:06:00"), 8.0))
    val input = MemoryStream[Click]
    val withWm = StreamOps.withEventTime(input.toDF(), "ts", "10 minutes").as[Click]
    val out = StreamOps.eventTimeRangeFrameSum[Long, Click](
      withWm, _.user, c => c.ts.getTime * 1000L, _.value,
      rangeMicros = 2L * 60 * 1000 * 1000)
    val q = out.toDF().toDF("user", "ts_us", "v", "fsum")
      .writeStream.outputMode("append")
      .format("memory").queryName("range_frame_out").start()
    try {
      input.addData(clicks: _*)
      q.processAllAvailable()
      input.addData(Click(2, "a", t("2024-01-01 05:00:00"), 0.0))
      q.processAllAvailable()
      input.addData(Click(2, "a", t("2024-01-01 09:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("range_frame_out").where($"user" === 1)
        .orderBy($"ts_us").select($"fsum").as[Double].collect().toSeq
      // RANGE [ts-2min, ts]: 1; 1+2; 1+2+4; 8 (gap exceeds the range)
      assert(got == Seq(1.0, 3.0, 7.0, 8.0))
      // parity with the batch RANGE-frame window (the qw8 shape)
      val batch = clicks.toDF()
        .selectExpr("user", "unix_micros(ts) AS ts_us", "value")
        .selectExpr("user", "ts_us", "value",
          """sum(value) OVER (PARTITION BY user ORDER BY ts_us
            |RANGE BETWEEN 120000000 PRECEDING AND CURRENT ROW) AS fsum"""
            .stripMargin.replace("\n", " "))
        .orderBy($"ts_us").select($"fsum").as[Double].collect().toSeq
      assert(got == batch)
    } finally q.stop()
  }

  test("update-mode rolling keyed agg re-emits per micro-batch (keyBy().sum parity)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Click]
    val agg = input.toDF().groupBy($"user").agg(sum($"value").as("total"))
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("roll_out").start()
    try {
      input.addData(Click(1, "a", t("2024-01-01 00:00:00"), 1.0))
      q.processAllAvailable()
      input.addData(Click(1, "a", t("2024-01-01 00:01:00"), 2.0))
      q.processAllAvailable()
      // update mode appends the refreshed per-key row each batch
      val rows = spark.table("roll_out").as[(Long, Double)].collect().toSeq
      assert(rows == Seq((1L, 1.0), (1L, 3.0)))
    } finally q.stop()
  }

  test("broadcastJoin enriches a stream with a static control table") {
    implicit val sqlCtx = spark.sqlContext
    val control = Seq((1L, "gold"), (2L, "silver")).toDF("user", "tier")
    val input = MemoryStream[Click]
    val out = StreamOps.broadcastJoin(input.toDF(), control, Seq("user"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("bj_out").start()
    try {
      input.addData(
        Click(1, "view", t("2024-01-01 00:00:00"), 1.0),
        Click(3, "view", t("2024-01-01 00:00:01"), 1.0))
      q.processAllAvailable()
      val got = spark.table("bj_out").select($"user", $"tier")
        .as[(Long, Option[String])].collect().toSet
      assert(got == Set((1L, Some("gold")), (3L, None)))
    } finally q.stop()
  }

  test("asyncMapOrdered preserves input order and processes every element") {
    val n = 50
    val ds = spark.range(n).as[Long]
    val out = StreamOps.asyncMapOrdered(ds.coalesce(1), parallelism = 4)(
      () => "client") { (_, i) =>
      // simulate variable-latency lookups
      Thread.sleep((i % 3) * 2)
      i * 10
    }.collect()
    // ordered-wait semantics: output order == input order despite the
    // variable per-element latency
    assert(out.toSeq == (0L until n).map(_ * 10))
  }

  test("asyncMapUnordered emits in completion order (no head-of-line " +
      "blocking) and processes every element") {
    // deterministic interleave: element 0 blocks until element 1's fn
    // has run, then yields a beat — element 1's task must also FINISH
    // (return + completion-queue insert) before 0 completes, and
    // countDown happens mid-fn, so without the pause a loaded box can
    // let 0 slip into the queue first (observed once under full-suite
    // parallel load)
    AsyncUnorderedHolder.reset()
    val out = StreamOps.asyncMapUnordered(
      spark.range(2).as[Long].coalesce(1), parallelism = 2)(
      () => "client") { (_, i) =>
      if (i == 0L) { AsyncUnorderedHolder.latch.await(); Thread.sleep(200) }
      else AsyncUnorderedHolder.latch.countDown()
      i * 10
    }.collect()
    assert(out.toSeq == Seq(10L, 0L)) // completion order, not input order
    // bulk: every element processed exactly once under variable latency
    val n = 50
    val bulk = StreamOps.asyncMapUnordered(
      spark.range(n).as[Long].coalesce(1), parallelism = 4)(
      () => "client") { (_, i) => Thread.sleep((i % 3) * 2); i * 10 }
      .collect()
    assert(bulk.sorted.toSeq == (0L until n).map(_ * 10))
  }

  test("sideOutputs routes rows into tagged branches with a default") {
    val df = Seq(
      Click(1, "view", t("2024-01-01 00:00:00"), 1.0),
      Click(2, "click", t("2024-01-01 00:01:00"), 2.0),
      Click(3, "error", t("2024-01-01 00:02:00"), 3.0)).toDF()
    val routed = StreamOps.sideOutputs(df,
      Map("views" -> ($"kind" === "view"), "clicks" -> ($"kind" === "click")),
      defaultTag = Some("other"))
    assert(routed("views").count() == 1)
    assert(routed("clicks").count() == 1)
    assert(routed("other").as[Click].head().kind == "error")
  }

  test("sideOutputs: a NULL-valued predicate row lands under defaultTag, not nowhere") {
    // review r16: !NULL is NULL under three-valued logic, so a row
    // whose routing predicate evaluated NULL failed its own route AND
    // the default's !pred conjunction — vanishing from every branch
    val df = Seq((1, Some(150)), (2, Some(50)), (3, None))
      .toDF("id", "amount")
    val routed = StreamOps.sideOutputs(df,
      Map("big" -> ($"amount" > 100)), defaultTag = Some("rest"))
    assert(routed("big").select("id").as[Int].collect().toSet == Set(1))
    assert(routed("rest").select("id").as[Int].collect().toSet == Set(2, 3))
  }

  test("dynamic-gap sessions merge on max(ts+gap) across elements") {
    // gap after "view" is 10s, after "error" is 2s. The horizon is the
    // MAX(ts+gap) over the merged session (DynamicEventTimeSessionWindows
    // merges [ts, ts+gap) windows): the error@10 only proposes [10,12),
    // but view@5 already proposed [5,15), so view@13 still merges in —
    // the last element's small gap does NOT close the session early.
    val events = Seq(
      Click(1, "view", t("2024-01-01 00:00:00"), 0), // horizon 10
      Click(1, "view", t("2024-01-01 00:00:05"), 0), // horizon 15
      Click(1, "error", t("2024-01-01 00:00:10"), 0), // horizon stays 15
      Click(1, "view", t("2024-01-01 00:00:13"), 0), // 13 < 15 → merges; horizon 23
      Click(1, "view", t("2024-01-01 00:00:30"), 0) // 30 >= 23 → new session
    ).toDS()
    def secs(c: Click) = c.ts.getTime / 1000
    val got = StreamOps.dynamicGapSessions[Long, Click](
      events, _.user, secs, c => if (c.kind == "error") 2L else 10L)
      .collect().sortBy(_._2)
    val e = events.collect()
    assert(got.toSeq == Seq(
      (1L, secs(e(0)), secs(e(3)), 4),
      (1L, secs(e(4)), secs(e(4)), 1)))
  }

  test("asQueryableState exposes keyed aggregate state to point lookups") {
    // KeyedStream.asQueryableState contract: the latest aggregated value
    // per key is queryable by key WHILE the stream runs, and reflects
    // later micro-batches
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Click]
    val counts = input.toDF().groupBy(col("user"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
    val qs = StreamOps.asQueryableState(counts, "qstate_counts")
    try {
      input.addData(Click(1, "a", t("2024-01-01 00:00:00"), 2.0),
        Click(1, "a", t("2024-01-01 00:01:00"), 3.0),
        Click(2, "b", t("2024-01-01 00:02:00"), 1.0))
      qs.query.processAllAvailable()
      val r1 = qs.lookup(1L).get
      assert(r1.getAs[Long]("n") === 2L && r1.getAs[Double]("total") === 5.0)
      assert(qs.lookup(99L).isEmpty) // unknown key, like an unknown kvState
      // repeated lookups within one epoch reuse the materialized snapshot
      // (point lookups must not rescan the table per call)
      assert(qs.snapshotsBuilt === 1)
      input.addData(Click(1, "a", t("2024-01-01 00:03:00"), 10.0))
      qs.query.processAllAvailable()
      val r2 = qs.lookup(1L).get // state visible with the new epoch applied
      assert(r2.getAs[Long]("n") === 3L && r2.getAs[Double]("total") === 15.0)
      assert(qs.lookup(2L).get.getAs[Long]("n") === 1L)
      assert(qs.snapshotsBuilt === 2) // one rebuild per committed epoch
    } finally qs.query.stop()
  }

  test("retraction chain (agg→agg) via foreachBatch upsert state (SURVEY §7.4.1)") {
    // count events per user, then count users per event-count — the second
    // aggregate needs retractions (a user moving 1→2 must decrement bucket
    // 1). Flink emits retractions in-stream; here foreachBatch maintains a
    // keyed state table per epoch and recomputes the second level exactly.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Click]
    val state = scala.collection.mutable.Map.empty[Long, Long] // user → count
    val dist = scala.collection.mutable.Map.empty[Long, Long] // count → users
    val q = input.toDF().writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val deltas = batch.groupBy(col("user"))
          .agg(count(lit(1)).as("n")).as[(Long, Long)].collect()
        state.synchronized {
          deltas.foreach { case (u, n) =>
            state.update(u, state.getOrElse(u, 0L) + n) // MERGE-style upsert
          }
          dist.clear()
          state.values.foreach(c => dist.update(c, dist.getOrElse(c, 0L) + 1))
        }
        ()
    }.start()
    try {
      input.addData(Click(1, "a", t("2024-01-01 00:00:00"), 0),
        Click(2, "a", t("2024-01-01 00:00:01"), 0))
      q.processAllAvailable()
      assert(dist.toMap == Map(1L -> 2L)) // both users at count 1
      input.addData(Click(1, "a", t("2024-01-01 00:00:02"), 0))
      q.processAllAvailable()
      // user 1 moved from bucket 1 to bucket 2 — the retraction case
      assert(dist.toMap == Map(1L -> 1L, 2L -> 1L))
    } finally q.stop()
  }

  test("streaming query resumes from checkpoint without duplicating epochs") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_src").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ck").toString
    def writeBatch(n: Int): Unit =
      Seq.tabulate(5)(i => n * 100 + i).toDF("v")
        .coalesce(1).write.mode("append").json(s"$srcDir")
    def startQuery() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL("v INT"))
      .json(srcDir)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .start()
    writeBatch(1)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    writeBatch(2)
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
    val vals = spark.read.parquet(outDir).as[Int].collect().sorted
    // exactly-once across the restart: 10 distinct values, no dupes
    assert(vals.toSeq == (Seq.tabulate(5)(100 + _) ++ Seq.tabulate(5)(200 + _)))
  }

  test("late data beyond the watermark is dropped (allowedLateness semantics)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Click]
    val agg = StreamOps.withEventTime(input.toDF(), "ts", "10 minutes")
      .groupBy(StreamOps.tumble(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      input.addData(Click(1, "a", t("2024-01-01 00:30:00"), 0))
      q.processAllAvailable()
      input.addData(Click(1, "a", t("2024-01-01 05:00:00"), 0)) // wm → 04:50
      q.processAllAvailable()
      // this row's window (00:00) is final — it must be dropped
      input.addData(Click(1, "a", t("2024-01-01 00:45:00"), 0))
      input.addData(Click(1, "a", t("2024-01-01 09:00:00"), 0)) // close 05:00 win
      q.processAllAvailable()
      val rows = spark.table("late_out")
        .select(col("window.start").cast("string"), col("n"))
        .as[(String, Long)].collect().toMap
      assert(rows("2024-01-01 00:00:00") == 1L) // late row not counted
    } finally q.stop()
  }

  test("late rows land in the side output instead of vanishing (sideOutputLateData)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Click]
    val watermarked = StreamOps.withEventTime(input.toDF(), "ts", "10 minutes")
      .as[Click]
    val tagged = StreamOps.tagLate(watermarked,
      (c: Click) => c.user, (c: Click) => c.ts.getTime * 1000)
    val q = tagged.toDF("late", "row").writeStream.outputMode("append")
      .format("memory").queryName("late_tagged").start()
    try {
      input.addData(Click(1, "a", t("2024-01-01 00:30:00"), 0))
      q.processAllAvailable()
      input.addData(Click(1, "a", t("2024-01-01 05:00:00"), 0)) // wm → 04:50
      q.processAllAvailable()
      // below the 04:50 watermark: a windowed agg would drop it silently —
      // here it must surface in the late channel
      input.addData(Click(1, "late", t("2024-01-01 00:45:00"), 0))
      q.processAllAvailable()
      val got = spark.table("late_tagged")
        .select($"late", $"row.kind".as[String])
        .as[(Boolean, String)].collect().toSet
      assert(got.contains((true, "late")), s"late row missing/untagged in $got")
      assert(got.contains((false, "a")))
      assert(!got.contains((true, "a")), "on-time rows must not be tagged late")
    } finally q.stop()
  }

  test("batch input tags nothing late (no watermark = -inf)") {
    val ds = Seq(
      Click(1, "a", t("2024-01-01 00:30:00"), 0),
      Click(1, "b", t("2024-01-01 05:00:00"), 0)).toDS()
    val (onTime, late) = StreamOps.sideOutputLateData(ds,
      (c: Click) => c.user, (c: Click) => c.ts.getTime * 1000)
    assert(late.count() === 0 && onTime.count() === 2)
  }

  test("complete output mode re-emits the full result table (BatchTableSink contract)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Click]
    val agg = input.toDF().groupBy($"kind").agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("complete_out").start()
    try {
      input.addData(Click(1, "view", t("2024-01-01 00:00:00"), 0))
      q.processAllAvailable()
      input.addData(Click(2, "click", t("2024-01-01 00:01:00"), 0))
      q.processAllAvailable()
      // memory sink in complete mode holds the latest full table
      val rows = spark.table("complete_out").as[(String, Long)].collect().toSet
      assert(rows == Set(("view", 1L), ("click", 1L)))
    } finally q.stop()
  }

  test("keyedProcess: stateful running max per key (batch mode)") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val ds = Seq(Click(1, "a", t("2024-01-01 00:00:00"), 3.0),
      Click(1, "a", t("2024-01-01 00:01:00"), 7.0),
      Click(2, "a", t("2024-01-01 00:00:00"), 5.0)).toDS()
    val out = StreamOps.keyedProcess[Long, Click, Double, (Long, Double)](
      ds, _.user, GroupStateTimeout.NoTimeout(), OutputMode.Append()) {
      (k, it, state) =>
        val mx = (state.getOption.toIterator ++ it.map(_.value)).max
        state.update(mx)
        Iterator((k, mx))
    }
    assert(out.collect().toSet == Set((1L, 7.0), (2L, 5.0)))
  }

  test("streaming as-of join matches probes to the latest covered build") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val stEnc: org.apache.spark.sql.Encoder[(Seq[(Long, Double)], Seq[(Long, Double)])] =
      ExpressionEncoder()
    def us(s: String) = Timestamp.valueOf(s).getTime * 1000L
    val input = MemoryStream[Click] // kind "b" = build side, "p" = probe
    val withWm = StreamOps.withEventTime(input.toDF(), "ts", "10 minutes").as[Click]
    val out = StreamOps.eventTimeAsofJoin[Long, Click](
      withWm, _.user, c => c.ts.getTime * 1000L, _.value, _.kind == "b")
    val q = out.toDF().toDF("user", "pts", "pv", "bts", "bv")
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_out").start()
    try {
      input.addData(
        Click(1, "b", t("2024-01-01 00:01:00"), 10.0),
        Click(1, "p", t("2024-01-01 00:05:00"), 1.0),
        Click(1, "b", t("2024-01-01 00:10:00"), 12.0),
        Click(1, "p", t("2024-01-01 00:10:00"), 2.0), // equal ts: inclusive
        Click(1, "p", t("2024-01-01 00:02:00"), 3.0), // out-of-order probe
        Click(2, "p", t("2024-01-01 00:30:00"), 4.0)) // no build: inner-drops
      q.processAllAvailable()
      // advance the watermark far past every probe, then once more so the
      // event-time timer flushes the buffered probes
      input.addData(Click(3, "b", t("2024-01-01 02:00:00"), 0.0))
      q.processAllAvailable()
      input.addData(Click(3, "b", t("2024-01-01 03:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("asof_out").where($"user" === 1L)
        .orderBy($"pts").as[(Long, Long, Double, Long, Double)]
        .collect().toSeq
      assert(got === Seq(
        (1L, us("2024-01-01 00:02:00"), 3.0, us("2024-01-01 00:01:00"), 10.0),
        (1L, us("2024-01-01 00:05:00"), 1.0, us("2024-01-01 00:01:00"), 10.0),
        (1L, us("2024-01-01 00:10:00"), 2.0, us("2024-01-01 00:10:00"), 12.0)))
      assert(spark.table("asof_out").where($"user" === 2L).count() === 0)
    } finally q.stop()
  }

  test("streaming as-of join agrees with the batch operator on sf0.001") {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val stEnc: org.apache.spark.sql.Encoder[(Seq[(Long, Double)], Seq[(Long, Double)])] =
      ExpressionEncoder()
    // batch surface of the same stateful op (single pass, wm = +inf at end)
    val ev = graft.Engine.table(spark, sf, "events")
      .where(col("event_type").isin("view", "purchase"))
      .selectExpr("user_id", "event_type", "ts", "value",
        "event_id") // deterministic columns
    val ds = ev.as[(Long, String, Timestamp, Double, Long)]
    val streamed = StreamOps.eventTimeAsofJoin[Long, (Long, String, Timestamp, Double, Long)](
      ds, _._1, r => r._3.getTime * 1000L + (r._3.getNanos / 1000) % 1000,
      _._4, _._2 == "view")
      .collect().map(r => (r._1, r._2, r._4)).toSet
    val batch = graft.operators.AsofOps.asofJoin(
      ev.where($"event_type" === "purchase")
        .select($"user_id", $"ts", $"value", $"event_id"),
      ev.where($"event_type" === "view").select($"user_id", $"ts", $"value"),
      "user_id", "ts", Seq("value"))
      .select($"user_id",
        (unix_micros($"ts")).as("pts"), unix_micros($"asof_ts").as("bts"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2, r._3)).toSet
    assert(streamed === batch)
  }
}

/** In-JVM latch for the deterministic unordered-async test (objects are
  * not serialized into closures; local mode shares the JVM). */
object AsyncUnorderedHolder {
  @volatile var latch: java.util.concurrent.CountDownLatch = _
  def reset(): Unit =
    latch = new java.util.concurrent.CountDownLatch(1)
}
