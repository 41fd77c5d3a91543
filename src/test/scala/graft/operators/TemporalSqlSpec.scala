package graft.operators

import graft.SparkSuite
import graft.operators.TemporalSql.TemporalSqlError
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The `FOR SYSTEM_TIME AS OF` SQL surface: batch semantics against a
  * hand-computed fixture, tail-clause pass-through, LEFT vs inner form,
  * the streaming route's parity with batch, and the named rejections
  * (processing time, non-equi ON, malformed statements). */
class TemporalSqlSpec extends SparkSuite {
  import spark.implicits._

  private def fixture(): Unit = {
    Seq((1L, 5L, "f5"), (1L, 15L, "f15"), (1L, 35L, "f35"), (2L, 9L, "g9"),
      (3L, 50L, "h50"))
      .toDF("k", "ts", "payload").createOrReplaceTempView("tsql_facts")
    Seq((1L, 10L, 1.0), (1L, 30L, 2.0), (2L, 9L, 3.0))
      .toDF("k", "ts", "rate").createOrReplaceTempView("tsql_vers")
  }

  test("inner form: each fact takes the version current at ITS time; " +
      "facts preceding every version drop") {
    fixture()
    val got = TemporalSql(spark,
      """SELECT f.k, f.ts, f.payload, v.ts AS vts, v.rate
        |FROM tsql_facts f
        |JOIN tsql_vers FOR SYSTEM_TIME AS OF f.ts AS v ON f.k = v.k
        |ORDER BY f.k, f.ts""".stripMargin)
      .as[(Long, Long, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 15L, "f15", 10L, 1.0), // current at 15 is the ts-10 version
      (1L, 35L, "f35", 30L, 2.0),
      (2L, 9L, "g9", 9L, 3.0))) // same-instant version matches (<=)
    // f5 (before every version) and h50 (key with no versions) dropped
  }

  test("LEFT JOIN keeps unmatched facts with a NULL version struct") {
    fixture()
    val got = TemporalSql(spark,
      """SELECT f.k, f.ts, v.rate
        |FROM tsql_facts f
        |LEFT JOIN tsql_vers FOR SYSTEM_TIME AS OF f.ts AS v ON f.k = v.k
        |ORDER BY f.k, f.ts""".stripMargin)
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      (1L, 5L, None), (1L, 15L, Some(1.0)), (1L, 35L, Some(2.0)),
      (2L, 9L, Some(3.0)), (3L, 50L, None)))
  }

  test("tail clauses (WHERE / GROUP BY / ORDER BY) run verbatim over " +
      "the alias structs") {
    fixture()
    val got = TemporalSql(spark,
      """SELECT f.k, COUNT(*) AS n, SUM(v.rate) AS s
        |FROM tsql_facts f
        |JOIN tsql_vers FOR SYSTEM_TIME AS OF f.ts AS v ON f.k = v.k
        |WHERE v.rate >= 1.0
        |GROUP BY f.k
        |ORDER BY f.k""".stripMargin)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 3.0), (2L, 1L, 3.0)))
  }

  test("streaming facts against streaming versions: same answers as " +
      "batch once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val factsIn = MemoryStream[(Long, Long, String)]
    val versIn = MemoryStream[(Long, Long, Double)]
    factsIn.toDF().toDF("k", "ts", "payload")
      .createOrReplaceTempView("tsql_sfacts")
    versIn.toDF().toDF("k", "ts", "rate")
      .createOrReplaceTempView("tsql_svers")
    val joined = TemporalSql(spark,
      """SELECT f.k, f.ts, f.payload, v.rate
        |FROM tsql_sfacts f
        |JOIN tsql_svers FOR SYSTEM_TIME AS OF f.ts AS v ON f.k = v.k""".stripMargin)
    assert(joined.isStreaming)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("tsql_out").start()
    try {
      versIn.addData((1L, 10L, 1.0))
      factsIn.addData((1L, 15L, "f15"))
      q.processAllAvailable()
      versIn.addData((1L, 30L, 2.0))
      factsIn.addData((1L, 35L, "f35"))
      q.processAllAvailable()
      q.processAllAvailable()
      // wm passed 15: f15 resolved against the version current at 15
      assert(spark.table("tsql_out").as[(Long, Long, String, Double)]
        .collect().toSet == Set((1L, 15L, "f15", 1.0)))
      versIn.addData((1L, 100L, 9.0))
      factsIn.addData((1L, 100L, "f100"))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(spark.table("tsql_out").as[(Long, Long, String, Double)]
        .collect().toSet == Set((1L, 15L, "f15", 1.0),
          (1L, 35L, "f35", 2.0)))
    } finally q.stop()
  }

  test("null keys and null times follow SQL comparison semantics on " +
      "both execution paths") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // fact with NULL key and fact with NULL as-of time can match
    // nothing; a NULL-ts version row satisfies no `v.ts <= f.ts`
    Seq((Some(1L), Some(5L), "early"), (Some(1L), Some(15L), "hit"),
      (None, Some(15L), "nullkey"), (Some(1L), None, "nullts"))
      .toDF("k", "ts", "payload").createOrReplaceTempView("tsqn_facts")
    Seq((Some(1L), Some(10L), 1.0), (Some(1L), None, 99.0),
      (None, Some(1L), 77.0))
      .toDF("k", "ts", "rate").createOrReplaceTempView("tsqn_vers")
    val left =
      """SELECT f.payload, v.rate
        |FROM tsqn_facts f
        |LEFT JOIN tsqn_vers FOR SYSTEM_TIME AS OF f.ts AS v ON f.k = v.k
        |""".stripMargin
    val batch = TemporalSql(spark, left)
      .as[(String, Option[Double])].collect().toSet
    // the NULL-ts version (99.0) must never win — "early" precedes
    // every REAL version and stays NULL; unjoinable facts survive LEFT
    assert(batch === Set(("early", None), ("hit", Some(1.0)),
      ("nullkey", None), ("nullts", None)))
    // inner form drops the unjoinables
    assert(TemporalSql(spark, left.replace("LEFT JOIN", "JOIN"))
      .as[(String, Option[Double])].collect().toSet
      === Set(("hit", Some(1.0))))
    // STREAMING facts + versions: the unjoinable facts bypass the keyed
    // state (stateless filter — they emit in their own micro-batch)
    // and union back with a NULL version struct
    val fIn = MemoryStream[(Option[Long], Option[Long], String)]
    val vIn = MemoryStream[(Option[Long], Option[Long], Double)]
    fIn.toDF().toDF("k", "ts", "payload")
      .createOrReplaceTempView("tsqn_sfacts")
    vIn.toDF().toDF("k", "ts", "rate")
      .createOrReplaceTempView("tsqn_svers")
    val q = TemporalSql(spark,
        left.replace("tsqn_facts", "tsqn_sfacts")
          .replace("tsqn_vers", "tsqn_svers"))
      .writeStream.outputMode("append")
      .format("memory").queryName("tsqn_out").start()
    try {
      vIn.addData((Some(1L), Some(10L), 1.0), (Some(1L), None, 99.0))
      fIn.addData((Some(1L), Some(15L), "hit"),
        (None, Some(15L), "nullkey"), (Some(1L), None, "nullts"))
      q.processAllAvailable()
      // push both watermarks so "hit" resolves against the 10-version
      vIn.addData((Some(1L), Some(200L), 2.0))
      fIn.addData((Some(1L), Some(200L), "late"))
      q.processAllAvailable()
      q.processAllAvailable()
      val got = spark.table("tsqn_out")
        .as[(String, Option[Double])].collect().toSet
      assert(got.contains(("nullkey", None))
        && got.contains(("nullts", None))
        && got.contains(("hit", Some(1.0))),
        s"streaming LEFT must keep unjoinables and resolve hit: $got")
    } finally q.stop()
  }

  test("registerVersioned declares the version table's time attribute " +
      "(the DDL posture): no versionTimeCol parameter needed") {
    Seq((1L, 5L, "f5"), (1L, 15L, "f15"))
      .toDF("k", "ts", "payload").createOrReplaceTempView("tsqv_facts")
    TemporalSql.registerVersioned(spark, "tsqv_vers",
      Seq((1L, 10L, 1.0), (1L, 30L, 2.0)).toDF("k", "valid_from", "rate"),
      timeCol = "valid_from")
    // the version table's time column is NOT named ts — the registry
    // supplies it, so the default-parameter call just works
    val got = TemporalSql(spark,
      """SELECT f.ts, v.valid_from, v.rate
        |FROM tsqv_facts f
        |JOIN tsqv_vers FOR SYSTEM_TIME AS OF f.ts AS v ON f.k = v.k
        |ORDER BY f.ts""".stripMargin)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((15L, 10L, 1.0)))
    // a missing declared column rejects at registration
    assert(intercept[IllegalArgumentException] {
      TemporalSql.registerVersioned(spark, "tsqv_bad",
        Seq((1L, 1L)).toDF("k", "ts"), timeCol = "nope")
    }.getMessage.contains("no column"))
  }

  test("processing-time form rejects with a named error") {
    fixture()
    val e = intercept[TemporalSqlError] {
      TemporalSql(spark,
        """SELECT f.k FROM tsql_facts f
          |JOIN tsql_vers FOR SYSTEM_TIME AS OF PROCTIME() AS v
          |ON f.k = v.k""".stripMargin)
    }
    assert(e.getMessage.contains("processing-time temporal join"))
    val e2 = intercept[TemporalSqlError] {
      TemporalSql(spark,
        """SELECT f.k FROM tsql_facts f
          |JOIN tsql_vers FOR SYSTEM_TIME AS OF CURRENT_TIMESTAMP AS v
          |ON f.k = v.k""".stripMargin)
    }
    assert(e2.getMessage.contains("processing-time temporal join"))
  }

  test("non-equi / disjunctive ON and a wrong-side AS OF reject by name") {
    fixture()
    val e = intercept[TemporalSqlError] {
      TemporalSql(spark,
        """SELECT f.k FROM tsql_facts f
          |JOIN tsql_vers FOR SYSTEM_TIME AS OF f.ts AS v
          |ON f.k < v.k""".stripMargin)
    }
    assert(e.getMessage.contains("equi-predicates"))
    val e2 = intercept[TemporalSqlError] {
      TemporalSql(spark,
        """SELECT f.k FROM tsql_facts f
          |JOIN tsql_vers FOR SYSTEM_TIME AS OF f.ts AS v
          |ON f.k = v.k OR f.ts = v.ts""".stripMargin)
    }
    assert(e2.getMessage.contains("conjunction"))
    val e3 = intercept[TemporalSqlError] {
      TemporalSql(spark,
        """SELECT f.k FROM tsql_facts f
          |JOIN tsql_vers FOR SYSTEM_TIME AS OF v.ts AS v
          |ON f.k = v.k""".stripMargin)
    }
    assert(e3.getMessage.contains("fact side"))
  }

  test("same-timestamp duplicate versions resolve deterministically " +
      "and identically in batch and streaming (ADVICE r10)") {
    implicit val sqlCtx = spark.sqlContext
    val vers = Seq((1L, 10L, 1.0), (1L, 10L, 3.0), (1L, 10L, 2.0))
    // batch: the _det tiebreak (detString of the row JSON) makes the
    // window winner shuffle-order-independent — same answer under
    // adversarial partitionings, and it is the detString MAX (3.0)
    for (parts <- Seq(1, 3, 7)) {
      Seq((1L, 20L, "f20")).toDF("k", "ts", "payload")
        .createOrReplaceTempView("tsqd_facts")
      vers.toDF("k", "ts", "rate").repartition(parts)
        .createOrReplaceTempView("tsqd_vers")
      val got = TemporalSql(spark,
        """SELECT f.payload, v.rate
          |FROM tsqd_facts f
          |JOIN tsqd_vers FOR SYSTEM_TIME AS OF f.ts AS v ON f.k = v.k""".stripMargin)
        .as[(String, Double)].collect().toSeq
      assert(got == Seq(("f20", 3.0)), s"parts=$parts got=$got")
    }
    // streaming, all three versions in ONE micro-batch: the detString
    // pre-order crowns the SAME winner — batch/stream parity on ties
    val fIn = MemoryStream[(Long, Long, String)]
    val vIn = MemoryStream[(Long, Long, Double)]
    fIn.toDF().toDF("k", "ts", "payload")
      .createOrReplaceTempView("tsqd_sfacts")
    vIn.toDF().toDF("k", "ts", "rate")
      .createOrReplaceTempView("tsqd_svers")
    val q = TemporalSql(spark,
      """SELECT f.payload, v.rate
        |FROM tsqd_sfacts f
        |JOIN tsqd_svers FOR SYSTEM_TIME AS OF f.ts AS v ON f.k = v.k""".stripMargin)
      .writeStream.outputMode("append").format("memory")
      .queryName("tsqd_out").start()
    try {
      vIn.addData(vers: _*)
      fIn.addData((1L, 20L, "f20"))
      q.processAllAvailable()
      vIn.addData((1L, 100L, 9.0))
      fIn.addData((1L, 100L, "flush"))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(spark.table("tsqd_out").as[(String, Double)].collect().toSet
        .contains(("f20", 3.0)))
    } finally q.stop()
  }

  test("composite stream keys escape the separator: distinct key " +
      "tuples never collide (ADVICE r10)") {
    implicit val sqlCtx = spark.sqlContext
    val fIn = MemoryStream[(String, String, Long, String)]
    val vIn = MemoryStream[(String, String, Long, Double)]
    fIn.toDF().toDF("k1", "k2", "ts", "payload")
      .createOrReplaceTempView("tsqe_sfacts")
    vIn.toDF().toDF("k1", "k2", "ts", "rate")
      .createOrReplaceTempView("tsqe_svers")
    val q = TemporalSql(spark,
      """SELECT f.payload, v.rate
        |FROM tsqe_sfacts f
        |LEFT JOIN tsqe_svers FOR SYSTEM_TIME AS OF f.ts AS v
        |ON f.k1 = v.k1 AND f.k2 = v.k2""".stripMargin)
      .writeStream.outputMode("append").format("memory")
      .queryName("tsqe_out").start()
    try {
      // unescaped, BOTH version tuples concatenate to the same state
      // key as the fact ("a\u0001b" + "c" vs "a" + "b\u0001c")
      // the colliding tuple carries the LATER ts, so the pre-fix code
      // would crown 7.0; escaped keys keep it in a different state slot
      vIn.addData(("a", "b\u0001c", 6L, 7.0))
      vIn.addData(("a\u0001b", "c", 5L, 1.0))
      fIn.addData(("a\u0001b", "c", 10L, "hit"))
      q.processAllAvailable()
      vIn.addData(("zz", "zz", 100L, 0.0))
      fIn.addData(("zz", "zz", 100L, "flush"))
      q.processAllAvailable()
      q.processAllAvailable()
      val got = spark.table("tsqe_out")
        .as[(String, Option[Double])].collect().toSet
      assert(got.contains(("hit", Some(1.0))) &&
        !got.contains(("hit", Some(7.0))),
        s"escaped keys must join only the exact tuple: $got")
    } finally q.stop()
  }

  test("composite-key escaping is injective for backslash-bearing " +
      "keys (round-11 review catch)") {
    implicit val sqlCtx = spark.sqlContext
    // after backslash-doubling + a SINGLE-backslash separator escape,
    // an embedded separator sits behind an ODD backslash run and the
    // joiner behind an EVEN one — these two tuples collided under the
    // double-backslash escape
    val fIn = MemoryStream[(String, String, Long, String)]
    val vIn = MemoryStream[(String, String, Long, Double)]
    fIn.toDF().toDF("k1", "k2", "ts", "payload")
      .createOrReplaceTempView("tsqb_sfacts")
    vIn.toDF().toDF("k1", "k2", "ts", "rate")
      .createOrReplaceTempView("tsqb_svers")
    val q = TemporalSql(spark,
      """SELECT f.payload, v.rate
        |FROM tsqb_sfacts f
        |LEFT JOIN tsqb_svers FOR SYSTEM_TIME AS OF f.ts AS v
        |ON f.k1 = v.k1 AND f.k2 = v.k2""".stripMargin)
      .writeStream.outputMode("append").format("memory")
      .queryName("tsqb_out").start()
    try {
      vIn.addData(("a\\", "\u0001b", 5L, 7.0))
      fIn.addData(("a\u0001\\", "b", 10L, "hit"))
      q.processAllAvailable()
      vIn.addData(("zz", "zz", 100L, 0.0))
      fIn.addData(("zz", "zz", 100L, "flush"))
      q.processAllAvailable()
      q.processAllAvailable()
      val got = spark.table("tsqb_out")
        .as[(String, Option[Double])].collect().toSet
      assert(got.contains(("hit", None)) &&
        !got.contains(("hit", Some(7.0))),
        s"backslash-bearing tuples must not collide: $got")
    } finally q.stop()
  }

  test("same-ts tiebreak agrees between batch and streaming for " +
      "supplementary-plane payloads (round-11 review catch)") {
    implicit val sqlCtx = spark.sqlContext
    // U+1F600 (surrogate pair) vs U+FFFD: UTF-8 byte order (Spark's
    // binary collation, the batch window) says the emoji sorts LAST;
    // Java's UTF-16 code-unit order says the opposite — the streaming
    // pre-order must use code points so both regimes crown the emoji
    val vers = Seq((1L, 10L, "x\uD83D\uDE00"), (1L, 10L, "x\uFFFD"))
    Seq((1L, 20L, "f")).toDF("k", "ts", "payload")
      .createOrReplaceTempView("tsqs_facts")
    vers.toDF("k", "ts", "tag").createOrReplaceTempView("tsqs_vers")
    val sql =
      """SELECT f.payload, v.tag
        |FROM tsqs_facts f
        |JOIN tsqs_vers FOR SYSTEM_TIME AS OF f.ts AS v ON f.k = v.k"""
        .stripMargin
    val batch = TemporalSql(spark, sql)
      .as[(String, String)].collect().toSeq
    assert(batch == Seq(("f", "x\uD83D\uDE00")), s"batch: $batch")
    val fIn = MemoryStream[(Long, Long, String)]
    val vIn = MemoryStream[(Long, Long, String)]
    fIn.toDF().toDF("k", "ts", "payload")
      .createOrReplaceTempView("tsqs_sfacts")
    vIn.toDF().toDF("k", "ts", "tag")
      .createOrReplaceTempView("tsqs_svers")
    val q = TemporalSql(spark,
        sql.replace("tsqs_facts", "tsqs_sfacts")
          .replace("tsqs_vers", "tsqs_svers"))
      .writeStream.outputMode("append").format("memory")
      .queryName("tsqs_out").start()
    try {
      vIn.addData(vers: _*)
      fIn.addData((1L, 20L, "f"))
      q.processAllAvailable()
      vIn.addData((1L, 100L, "z"))
      fIn.addData((1L, 100L, "flush"))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(spark.table("tsqs_out").as[(String, String)].collect().toSet
        .contains(("f", "x\uD83D\uDE00")))
    } finally q.stop()
  }

    test("identifiers resolve case-insensitively like the rest of SQL: " +
      "AS OF f.TS / explicit TS time column (ADVICE r10)") {
    fixture()
    val got = TemporalSql(spark,
      """SELECT f.k, f.ts, v.rate
        |FROM tsql_facts f
        |JOIN tsql_vers FOR SYSTEM_TIME AS OF f.TS AS v ON f.K = v.k
        |ORDER BY f.k, f.ts""".stripMargin, versionTimeCol = "TS")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 15L, 1.0), (1L, 35L, 2.0), (2L, 9L, 3.0)))
    // a genuinely missing column still rejects by name
    val e = intercept[TemporalSqlError] {
      TemporalSql(spark,
        """SELECT f.k FROM tsql_facts f
          |JOIN tsql_vers FOR SYSTEM_TIME AS OF f.nope AS v
          |ON f.k = v.k""".stripMargin)
    }
    assert(e.getMessage.contains("no column"))
  }

  test("delayMs admits bounded out-of-order version rows (the real-ms " +
      "delay survives the micros-domain inflation; ADVICE r10)") {
    implicit val sqlCtx = spark.sqlContext
    val fIn = MemoryStream[(Long, Long, String)]
    val vIn = MemoryStream[(Long, Long, Double)]
    fIn.toDF().toDF("k", "ts", "payload")
      .createOrReplaceTempView("tsqw_sfacts")
    vIn.toDF().toDF("k", "ts", "rate")
      .createOrReplaceTempView("tsqw_svers")
    // delayMs = 1 real ms = 1000 ts-units of slack: the fact at 20000
    // stays pending past batch 1, so the LATE version at 19500 (behind
    // the fact, ahead of the held-back watermark) still wins the as-of
    val q = TemporalSql(spark,
      """SELECT f.payload, v.rate
        |FROM tsqw_sfacts f
        |JOIN tsqw_svers FOR SYSTEM_TIME AS OF f.ts AS v ON f.k = v.k""".stripMargin,
      None, delayMs = 1L)
      .writeStream.outputMode("append").format("memory")
      .queryName("tsqw_out").start()
    try {
      vIn.addData((1L, 10000L, 1.0))
      fIn.addData((1L, 20000L, "f"))
      q.processAllAvailable()
      vIn.addData((1L, 19500L, 5.0)) // late, within the delay
      q.processAllAvailable()
      vIn.addData((1L, 50000L, 9.0))
      fIn.addData((1L, 50000L, "flush"))
      q.processAllAvailable()
      q.processAllAvailable()
      val got = spark.table("tsqw_out").as[(String, Double)]
        .collect().toSet
      assert(got.contains(("f", 5.0)) && !got.contains(("f", 1.0)),
        s"the in-delay late version must win: $got")
    } finally q.stop()
  }

  test("batch SQL surface equals the qj1 asofJoin runtime on events " +
      "(sf0.001)") {
    val ev = graft.Engine.table(spark, sf, "events")
    ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value"))
      .createOrReplaceTempView("tsql_views")
    ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .createOrReplaceTempView("tsql_purch")
    val viaSql = TemporalSql(spark,
      """SELECT f.event_id, f.user_id, f.ts,
        |  v.ts AS asof_ts, v.value AS asof_value
        |FROM tsql_purch f
        |JOIN tsql_views FOR SYSTEM_TIME AS OF f.ts AS v
        |  ON f.user_id = v.user_id
        |ORDER BY f.event_id""".stripMargin).collect().toSeq
    val viaOp = AsofOps.asofJoin(
        ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts")),
        ev.where(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("value")),
        "user_id", "ts", Seq("value"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_ts"), col("asof_value"))
      .orderBy("event_id").collect().toSeq
    assert(viaSql.map(_.toSeq) == viaOp.map(_.toSeq) && viaOp.nonEmpty)
  }
}
