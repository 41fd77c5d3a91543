package graft.streaming

import graft.SparkSuite
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQueryException, TestGroupState}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** The versioned + schema-fingerprinted envelope the Column-surface
  * unbounded join persists its keyed state through
  * ([[NonWindowJoinSql]] → [[JoinStateCodec]]): roundtrip fidelity,
  * both named restore-time errors raised BEFORE kryo touches the
  * payload, the view's write stamping, and the two end-to-end
  * scenarios the envelope exists for — a checkpointed stop/restart
  * through the Column surface (state written by one query incarnation
  * joins in the next) and a restore against CHANGED input schemas
  * failing by name instead of deserializing garbage. */
class JoinStateCodecSpec extends SparkSuite {
  import spark.implicits._

  private val lSchema = StructType(Seq(
    StructField("a", IntegerType), StructField("l", StringType)))
  private val rSchema = StructType(Seq(
    StructField("d", IntegerType), StructField("r", StringType)))
  private val fp = JoinStateCodec.fingerprint(lSchema, rSchema)

  test("envelope roundtrips generic-Row join state bit-faithfully") {
    val st = NonWindowJoin.SideState[Row, Row](
      lefts = Map(Row(7, "l1") -> ((2L, -1L))),
      rights = Map(Row(7, "r1") -> ((1L, 500L))))
    val env = JoinStateCodec.enc(JoinStateCodec.EquiVersion, fp, st)
    assert(env.version == JoinStateCodec.EquiVersion)
    assert(env.schemaFp == fp)
    val back = JoinStateCodec.dec[NonWindowJoin.SideState[Row, Row]](
      env, JoinStateCodec.EquiVersion, fp, "spec", "ddl")
    assert(back == st)
  }

  test("fingerprint digests one injective DDL over both schemas (constant width per key row)") {
    // the DDL is injective (field names + nullability, unambiguous
    // wrapping); the STORED fingerprint is its 32-char MD5 — the
    // envelope rides once per key in the state store, so a wide
    // input's DDL must not
    assert(JoinStateCodec.fingerprintDdl(lSchema, rSchema).contains("STRUCT"))
    assert(fp.length == 32)
    assert(JoinStateCodec.fingerprint(lSchema, rSchema) == fp)
    assert(JoinStateCodec.fingerprint(rSchema, lSchema) != fp)
    val widened = StructType(lSchema.fields :+ StructField("x", LongType))
    assert(JoinStateCodec.fingerprint(widened, rSchema) != fp)
    assert(JoinStateCodec.fingerprint(widened, rSchema).length == 32)
  }

  test("wrong version and wrong fingerprint raise the named errors before kryo decodes") {
    // corrupt payloads prove the checks run FIRST: a decode attempt
    // would throw a kryo buffer error, not these
    val garbage = Array[Byte](1, 2, 3)
    val vEx = intercept[JoinStateVersionException] {
      JoinStateCodec.dec[AnyRef](
        JoinStateEnvelope(JoinStateCodec.NonEquiVersion, fp, garbage),
        JoinStateCodec.EquiVersion, fp, "equi spec", "ddl")
    }
    assert(vEx.found == JoinStateCodec.NonEquiVersion)
    assert(vEx.expected == JoinStateCodec.EquiVersion)
    assert(vEx.getMessage.contains("equi spec"))
    assert(vEx.getMessage.contains("fresh checkpoint"))
    val otherFp = JoinStateCodec.fingerprint(rSchema, lSchema)
    val sEx = intercept[JoinStateSchemaException] {
      JoinStateCodec.dec[AnyRef](
        JoinStateEnvelope(JoinStateCodec.EquiVersion, otherFp, garbage),
        JoinStateCodec.EquiVersion, fp, "schema spec",
        JoinStateCodec.fingerprintDdl(lSchema, rSchema))
    }
    assert(sEx.found == otherFp)
    assert(sEx.expected == fp)
    assert(sEx.getMessage.contains("schema spec"))
    // the resumed query's full DDL rides the message (the original is
    // not stored — only its digest)
    assert(sEx.getMessage.contains("STRUCT"))
    // version is checked before the fingerprint: both wrong → version
    intercept[JoinStateVersionException] {
      JoinStateCodec.dec[AnyRef](
        JoinStateEnvelope(JoinStateCodec.NonEquiVersion, otherFp, garbage),
        JoinStateCodec.EquiVersion, fp, "both", "ddl")
    }
  }

  test("versionedFn stamps writes and surfaces stale reads through a driver invocation") {
    val fn: (Long, Iterator[Long], GroupState[Vector[Long]]) =>
        Iterator[Long] =
      (_, it, state) => {
        val acc = state.getOption.getOrElse(Vector.empty) ++ it
        state.update(acc)
        acc.iterator
      }
    val wrapped = JoinStateCodec.versionedFn("spec-state",
      JoinStateCodec.EquiVersion, fp, "ddl", fn)
    val fresh = TestGroupState.create[JoinStateEnvelope](
      Optional.empty[JoinStateEnvelope](), GroupStateTimeout.NoTimeout(),
      0L, Optional.empty[Long](), hasTimedOut = false)
    assert(wrapped(1L, Iterator(5L), fresh).toList == List(5L))
    assert(fresh.get.version == JoinStateCodec.EquiVersion)
    assert(fresh.get.schemaFp == fp)
    // a checkpoint whose state predates this build's format: named error
    val staleV = TestGroupState.create[JoinStateEnvelope](
      Optional.of(fresh.get.copy(version = 99)),
      GroupStateTimeout.NoTimeout(), 0L, Optional.empty[Long](),
      hasTimedOut = false)
    intercept[JoinStateVersionException] {
      wrapped(1L, Iterator(6L), staleV).toList
    }
    // a checkpoint written against different input schemas: named error
    val staleFp = TestGroupState.create[JoinStateEnvelope](
      Optional.of(fresh.get.copy(schemaFp = "l STRUCT<other: INT>")),
      GroupStateTimeout.NoTimeout(), 0L, Optional.empty[Long](),
      hasTimedOut = false)
    intercept[JoinStateSchemaException] {
      wrapped(1L, Iterator(7L), staleFp).toList
    }
  }

  test("versionedSweep decodes (checked), sweeps, re-encodes survivors") {
    val st = NonWindowJoin.SideState[Row, Row](
      lefts = Map(Row(1, "keep") -> ((1L, 100L)),
        Row(2, "drop") -> ((1L, 10L))),
      rights = Map.empty)
    val env = JoinStateCodec.enc(JoinStateCodec.EquiVersion, fp, st)
    val sweep = JoinStateCodec.versionedSweep[NonWindowJoin.SideState[Row, Row]](
      "sweep spec", JoinStateCodec.EquiVersion, fp, "ddl",
      NonWindowJoin.sweepSideState[Row, Row])
    val swept = sweep(env, 50L)
    assert(swept.isDefined)
    assert(swept.get.version == JoinStateCodec.EquiVersion)
    assert(swept.get.schemaFp == fp)
    val back = JoinStateCodec.dec[NonWindowJoin.SideState[Row, Row]](
      swept.get, JoinStateCodec.EquiVersion, fp, "sweep spec", "ddl")
    assert(back.lefts.keySet == Set(Row(1, "keep")))
    // everything expired → None (the key drops)
    assert(sweep(env, 1000L).isEmpty)
    // stale envelope fails by name inside the timer path too
    intercept[JoinStateVersionException] {
      sweep(env.copy(version = 99), 50L)
    }
  }

  test("Column-surface join state survives a checkpointed stop/restart through the envelope") {
    // mirror of the typed surface's restart spec: a left row buffered
    // by one query incarnation must pair with a right row arriving in
    // the NEXT — a real checkpoint round-trip through the state store,
    // with the envelope (version, fingerprint, blob) doing the carry
    import scala.jdk.CollectionConverters._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_joinsql_resume").toString
    val in1 = MemoryStream[(Int, String)]
    val in2 = MemoryStream[(Int, String)]
    val got = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Boolean, String, String)]()
    def start() = NonWindowJoinSql.unboundedOuterJoin(
      in1.toDS().toDF("a", "l"), in2.toDS().toDF("d", "r"),
      Seq(col("a")), Seq(col("d")), "left_outer")
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach { row =>
          got.add((row.getAs[Boolean]("change"),
            Option(row.getAs[String]("l")).getOrElse("null"),
            Option(row.getAs[String]("r")).getOrElse("null"))); ()
        }
      }.start()
    val q1 = start()
    try {
      in1.addData((7, "l1"))
      q1.processAllAvailable()
      assert(got.asScala.toSet === Set((true, "l1", "null")))
    } finally q1.stop()
    val q2 = start()
    try {
      in2.addData((7, "r1"))
      q2.processAllAvailable()
      // the restored left pairs: its null-pad retracts, the pair lands
      assert(got.asScala.toSet === Set((true, "l1", "null"),
        (false, "l1", "null"), (true, "l1", "r1")))
    } finally q2.stop()
  }

  test("a checkpoint resumed against changed input schemas fails by the named schema error") {
    // the scenario the fingerprint exists for: same state class, same
    // envelope schema (so Spark's StateSchemaCompatibilityChecker
    // passes), but the Rows INSIDE the blob were written against a
    // different input schema — kryo would deserialize garbage; the
    // envelope raises JoinStateSchemaException on the first state read
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_joinsql_schema").toString
    val in1 = MemoryStream[(Int, String)]
    val in2 = MemoryStream[(Int, String)]
    val sink = (df: org.apache.spark.sql.DataFrame, _: Long) => {
      df.collect(); ()
    }
    val q1 = NonWindowJoinSql.unboundedOuterJoin(
      in1.toDS().toDF("a", "l"), in2.toDS().toDF("d", "r"),
      Seq(col("a")), Seq(col("d")), "left_outer")
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").foreachBatch(sink).start()
    try {
      in1.addData((7, "l1"))
      q1.processAllAvailable()
    } finally q1.stop()
    // incarnation 2 reads a WIDER left schema against the same
    // checkpoint; the restored key's first read must fail by name
    val in1b = MemoryStream[(Int, String, Long)]
    val in2b = MemoryStream[(Int, String)]
    val q2 = NonWindowJoinSql.unboundedOuterJoin(
      in1b.toDS().toDF("a", "l", "extra"), in2b.toDS().toDF("d", "r"),
      Seq(col("a")), Seq(col("d")), "left_outer")
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").foreachBatch(sink).start()
    val ex = intercept[StreamingQueryException] {
      try {
        in2b.addData((7, "r1"))
        q2.processAllAvailable()
      } finally q2.stop()
    }
    val named = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).take(20)
      .collectFirst { case e: JoinStateSchemaException => e }
    assert(named.isDefined,
      s"expected JoinStateSchemaException in the cause chain, got $ex")
    // digests differ; the message carries the RESUMED query's DDL,
    // which includes the new column
    assert(named.get.expected != named.get.found)
    assert(named.get.getMessage.contains("extra"))
  }

  test("a schema-changed resume fails at the FIRST micro-batch even when no pre-change key is touched (eager sentinel)") {
    // VERDICT r15 #4: the per-key envelope checks are lazy, so before
    // the sentinel a resume that only ever received NEW keys ran
    // silently until some pre-change key was touched. The sentinel
    // group (stamped on batch 0, validated every batch) turns that
    // into store-wide fail-at-first-batch: incarnation 2 feeds ONLY
    // key 99 — a key with no checkpointed state, whose own read can
    // raise nothing — and must still fail by the named schema error,
    // raised by the sentinel.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_joinsql_sentinel").toString
    val sink = (df: org.apache.spark.sql.DataFrame, _: Long) => {
      df.collect(); ()
    }
    val in1 = MemoryStream[(Int, String)]
    val in2 = MemoryStream[(Int, String)]
    val q1 = NonWindowJoinSql.unboundedOuterJoin(
      in1.toDS().toDF("a", "l"), in2.toDS().toDF("d", "r"),
      Seq(col("a")), Seq(col("d")), "left_outer")
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").foreachBatch(sink).start()
    try {
      in1.addData((7, "l1"))
      q1.processAllAvailable()
    } finally q1.stop()
    // incarnation 2: WIDER left schema, data only for a never-seen key
    val in1b = MemoryStream[(Int, String, Long)]
    val in2b = MemoryStream[(Int, String)]
    val q2 = NonWindowJoinSql.unboundedOuterJoin(
      in1b.toDS().toDF("a", "l", "extra"), in2b.toDS().toDF("d", "r"),
      Seq(col("a")), Seq(col("d")), "left_outer")
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").foreachBatch(sink).start()
    val ex = intercept[StreamingQueryException] {
      try {
        // data on the RIGHT side (whose checkpointed offset has
        // headroom — the left MemoryStream's batch-0 offset already
        // covers a fresh instance's first element, so left-side data
        // would not trigger a batch at all)
        in2b.addData((99, "r-new"))
        q2.processAllAvailable()
      } finally q2.stop()
    }
    val named = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).take(20)
      .collectFirst { case e: JoinStateSchemaException => e }
    assert(named.isDefined,
      s"expected JoinStateSchemaException in the cause chain, got $ex")
    // the SENTINEL raised it (key 99 has no state to check against)
    assert(named.get.getMessage.contains("sentinel"))
  }

  test("an equi-to-non-equi variant switch across a checkpoint fails at the first batch by the named version error") {
    // the shared-version-space guarantee, now EAGER: incarnation 1
    // checkpoints equi-family sentinel state (version 1); incarnation
    // 2 adds a residual (non-equi family, version 2) and feeds only a
    // never-seen key — the sentinel raises the named version error at
    // the first batch, before any data key's blob is misread.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_joinsql_sentinel_v").toString
    val sink = (df: org.apache.spark.sql.DataFrame, _: Long) => {
      df.collect(); ()
    }
    val in1 = MemoryStream[(Int, String)]
    val in2 = MemoryStream[(Int, String)]
    val q1 = NonWindowJoinSql.unboundedOuterJoin(
      in1.toDS().toDF("a", "l"), in2.toDS().toDF("d", "r"),
      Seq(col("a")), Seq(col("d")), "left_outer")
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").foreachBatch(sink).start()
    try {
      in1.addData((7, "l1"))
      q1.processAllAvailable()
    } finally q1.stop()
    val in1b = MemoryStream[(Int, String)]
    val in2b = MemoryStream[(Int, String)]
    val q2 = NonWindowJoinSql.unboundedOuterJoin(
      in1b.toDS().toDF("a", "l"), in2b.toDS().toDF("d", "r"),
      Seq(col("a")), Seq(col("d")), "left_outer",
      residual = Some(col("l") <= col("r")))
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").foreachBatch(sink).start()
    val ex = intercept[StreamingQueryException] {
      try {
        in2b.addData((99, "r-new")) // right side: offset headroom
        q2.processAllAvailable()
      } finally q2.stop()
    }
    val named = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).take(20)
      .collectFirst { case e: JoinStateVersionException => e }
    assert(named.isDefined,
      s"expected JoinStateVersionException in the cause chain, got $ex")
    assert(named.get.found === JoinStateCodec.EquiVersion)
    assert(named.get.expected === JoinStateCodec.NonEquiVersion)
    assert(named.get.getMessage.contains("sentinel"))
  }
}
