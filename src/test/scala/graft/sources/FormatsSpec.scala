package graft.sources

import graft.{Engine, SparkSuite}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink conformance (SURVEY.md §2.1/§2.2): the reference's format
  * zoo (CsvInputFormat, TextInputFormat, OrcRowInputFormat, JSON schema
  * (de)serialization, BucketingSink/StreamingFileSink) maps to built-in
  * DataFrame readers/writers; these specs prove round-trips with explicit
  * schemas (the reference never infers schemas — neither do we).
  */
class FormatsSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_fmt").toString

  private lazy val sample = Engine.table(spark, sf, "nation")

  test("csv round-trip with explicit schema") {
    val dir = tmp()
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(sample.schema).option("header", "true").csv(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      sample.orderBy("n_nationkey").collect().toSeq)
  }

  test("json round-trip + from_json/to_json expressions") {
    val dir = tmp()
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.schema(sample.schema).json(dir)
    assert(back.count() == sample.count())
    // JsonRowDeserializationSchema equivalent: parse a JSON string column
    val parsed = sample.select(to_json(struct($"n_nationkey", $"n_name")).as("j"))
      .select(from_json($"j", org.apache.spark.sql.types.StructType.fromDDL(
        "n_nationkey INT, n_name STRING")).as("s"))
      .select($"s.n_nationkey", $"s.n_name")
    assert(parsed.orderBy("n_nationkey").as[(Int, String)].collect().toSeq ==
      sample.select($"n_nationkey", $"n_name").orderBy("n_nationkey")
        .as[(Int, String)].collect().toSeq)
  }

  test("orc round-trip preserves schema and rows") {
    val dir = tmp()
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == sample.schema)
    assert(back.count() == sample.count())
  }

  test("text source reads lines (TextInputFormat equivalent)") {
    val dir = tmp()
    sample.select(concat_ws("|", $"n_nationkey", $"n_name")).write
      .mode("overwrite").text(dir)
    val lines = spark.read.text(dir)
    assert(lines.count() == sample.count())
    assert(lines.where($"value".contains("|")).count() == sample.count())
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmp()
    Engine.table(spark, sf, "orders")
      .withColumn("yr", year($"o_orderdate"))
      .write.mode("overwrite").partitionBy("yr").parquet(dir)
    val one = spark.read.parquet(dir).where($"yr" === 1995)
    val plan = one.queryExecution.executedPlan.toString
    assert(one.count() > 0)
    // partition filter must reach the scan, not a post-filter
    assert(plan.contains("PartitionFilters") || !plan.contains("yr = 1995"))
  }

  test("streaming file sink commits atomically per epoch (BucketingSink analog)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp(); val ckpt = tmp()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "v").writeStream
      .format("parquet").option("path", dir)
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(spark.read.parquet(dir).count() == 2)
    } finally q.stop()
  }

  test("TxnSink.exactlyOnce skips replayed epochs (2PC sink contract)") {
    import graft.streaming.TxnSink
    val logDir = tmp()
    val writes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sink = TxnSink.exactlyOnce(new TxnSink.FileCommitLog(logDir)) {
      (_, id) => writes += id
    }
    val df = spark.range(1).toDF()
    sink(df, 0L); sink(df, 1L)
    sink(df, 1L) // replay after simulated failure: must be a no-op
    sink(df, 2L)
    assert(writes.toSeq == Seq(0L, 1L, 2L), "replayed epoch must not rewrite")
    // a fresh sink instance over the same log (query restart) also skips
    val writes2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val restarted = TxnSink.exactlyOnce(new TxnSink.FileCommitLog(logDir)) {
      (_, id) => writes2 += id
    }
    restarted(df, 2L); restarted(df, 3L)
    assert(writes2.toSeq == Seq(3L), "restart must resume from the log")
  }

  test("TxnSink drives a real streaming query through foreachBatch") {
    import graft.streaming.TxnSink
    implicit val sqlCtx = spark.sqlContext
    val logDir = tmp()
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sink = TxnSink.exactlyOnce(new TxnSink.FileCommitLog(logDir)) {
      (df, _) => out.synchronized { out ++= df.as[Long].collect() }; ()
    }
    val q = input.toDS().writeStream.foreachBatch {
      (ds: org.apache.spark.sql.Dataset[Long], id: Long) => sink(ds.toDF(), id)
    }.start()
    try {
      input.addData(1L, 2L); q.processAllAvailable()
      input.addData(3L); q.processAllAvailable()
      assert(out.sorted.toSeq == Seq(1L, 2L, 3L))
      assert(new java.io.File(logDir).list().count(_.endsWith(".committed")) == 2)
    } finally q.stop()
  }

  test("foreachBatch sink gets exactly the epoch's rows (generic sink surface)") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val q = input.toDS().writeStream.foreachBatch {
      (df: org.apache.spark.sql.Dataset[Long], _: Long) =>
        seen.synchronized { seen += df.collect().toSeq.sorted }
        ()
    }.start()
    try {
      input.addData(3L, 1L); q.processAllAvailable()
      input.addData(2L); q.processAllAvailable()
      assert(seen.toSeq == Seq(Seq(1L, 3L), Seq(2L)))
    } finally q.stop()
  }

  test("events.ts normalizes to TimestampType at every scale factor") {
    // the generated parquet has shipped ts as TIMESTAMP(NANOS) in some
    // rounds and as timezone-less TIMESTAMP(MICROS) in others; every
    // downstream unix_micros/watermark call requires TimestampType, so
    // Engine.table must absorb whatever layout the generator writes —
    // this is the early-warning spec for the next drift
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dt = graft.Engine.table(spark, s"/root/testdata/$sf", "events")
        .schema("ts").dataType
      assert(dt == org.apache.spark.sql.types.TimestampType,
        s"$sf events.ts arrived as $dt")
    }
  }
}
