package graft.streaming

import graft.{SparkSuite, TestData}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Verbatim ports of the reference's STREAM AggregateITCase (flink-table
  * runtime/stream/table/AggregateITCase.scala) — retract-stream groupBy
  * aggregations. The reference collects a retract stream and asserts
  * the NET result (StreamITCase.retractedResults); the equivalent
  * Structured Streaming surface is COMPLETE output mode over a memory
  * sink — the final table IS the retracted result set. The two
  * infrastructure cases keep their aggregation semantics:
  * testGroupAggregateWithStateBackend's RocksDB/DataView plumbing is
  * the reference's state-backend harness (our state lives in Spark's
  * HDFSBackedStateStore); testRemoveDuplicateRecordsWithUpsertSink's
  * TestUpsertSink maps to the upsert surface already covered by
  * RelationalSinkSpec — here the net upsert rows are asserted.
  */
class StreamAggregateITCasePortSpec extends SparkSuite {
  import spark.implicits._

  private var nameSeq = 0
  private def complete(data: Seq[(Int, Long, String)])(
      f: DataFrame => DataFrame): Seq[String] = {
    implicit val sqlCtx = spark.sqlContext
    nameSeq += 1
    val name = s"agg_port_$nameSeq"
    val input = MemoryStream[(Int, Long, String)]
    val q = f(input.toDF().toDF("a", "b", "c")).writeStream
      .outputMode("complete").format("memory").queryName(name).start()
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      spark.table(name).collect().map(_.mkString(",")).toSeq.sorted
    } finally q.stop()
  }

  test("stream AggregateITCase testDistinct port") {
    // streaming DISTINCT expressed as its aggregation form (dedup has
    // no complete-mode surface; the net result is identical)
    val got = complete(TestData.t3Rows)(df =>
      df.groupBy($"b").agg(first(lit(null).cast("long")).as("n")))
    assert(got === Seq("1,null", "2,null", "3,null", "4,null", "5,null",
      "6,null").sorted)
  }

  test("stream AggregateITCase testDistinctAfterAggregate port") {
    // 5-tuple fixture keyed by e: counts 5, 7, 3
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Int, Long, Int, String, Long)]
    val q = input.toDF().toDF("a", "b", "c", "d", "e")
      .groupBy($"e").agg(count($"a").as("cnt")).distinct()
      .writeStream.outputMode("complete").format("memory")
      .queryName("agg_distinct_after").start()
    try {
      input.addData(TestData.t5Rows: _*)
      q.processAllAvailable()
      assert(spark.table("agg_distinct_after").collect()
        .map(_.mkString(",")).toSeq.sorted === Seq("1,5", "2,7", "3,3").sorted)
    } finally q.stop()
  }

  test("stream AggregateITCase testNonKeyedGroupAggregate port") {
    val got = complete(TestData.t3Rows)(df =>
      df.agg(sum($"a").as("sa"), sum($"b").as("sb")))
    assert(got === Seq("231,91"))
  }

  test("stream AggregateITCase testGroupAggregate port") {
    val got = complete(TestData.t3Rows)(df =>
      df.groupBy($"b").agg(sum($"a").as("sa")))
    assert(got === Seq("1,1", "2,5", "3,15", "4,34", "5,65", "6,111").sorted)
  }

  test("stream AggregateITCase testDoubleGroupAggregation port") {
    // two CHAINED streaming aggregations: in complete mode the second
    // recomputes from the first's full state each batch (the agg→agg
    // retraction chain); Spark's global-watermark correctness check
    // targets append-mode lateness and does not apply to complete
    // recomputation — disabled for this query like the programming
    // guide describes
    val key = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try {
      val got = complete(TestData.t3Rows)(df =>
        df.groupBy($"b").agg(count($"a").as("cnt"))
          .groupBy($"cnt").agg(count($"b").as("freq")))
      assert(got === Seq("1,1", "2,1", "3,1", "4,1", "5,1", "6,1").sorted)
    } finally spark.conf.set(key, old)
  }

  test("stream AggregateITCase testGroupAggregateWithExpression port") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Int, Long, Int, String, Long)]
    // int avg = floor division like the reference's 'a.avg on ints
    val q = input.toDF().toDF("a", "b", "c", "d", "e")
      .groupBy($"e", ($"b" % 3).as("bmod"))
      .agg(min($"c").as("mc"),
        (sum($"a") / count($"a")).cast("int").as("avga"),
        count($"d").as("cd"))
      .select($"mc", $"e", $"avga", $"cd")
      .writeStream.outputMode("complete").format("memory")
      .queryName("agg_expr").start()
    try {
      input.addData(TestData.t5Rows: _*)
      q.processAllAvailable()
      assert(spark.table("agg_expr").collect()
        .map(_.mkString(",")).toSeq.sorted === Seq(
        "0,1,1,1", "7,1,4,2", "2,1,3,2",
        "3,2,3,3", "1,2,3,3", "14,2,5,1",
        "12,3,5,1", "5,3,4,2").sorted)
    } finally q.stop()
  }

  test("stream AggregateITCase testCollect port (multiset)") {
    graft.functions.Udafs.register(spark)
    // render like Flink's multiset map {element=count, ...}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Int, Long, String)]
    val q = input.toDF().toDF("a", "b", "c")
      .groupBy($"b").agg(expr("graft_multiset(a)").as("ms"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("agg_collect").start()
    try {
      input.addData(TestData.t3Rows: _*)
      q.processAllAvailable()
      val out = spark.table("agg_collect").collect().map { r =>
        val m = r.getMap[Int, Int](1).toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString("{", ", ", "}")
        s"${r.getLong(0)},$m"
      }.toSeq.sorted
      assert(out === Seq(
        "1,{1=1}", "2,{2=1, 3=1}", "3,{4=1, 5=1, 6=1}",
        "4,{7=1, 8=1, 9=1, 10=1}", "5,{11=1, 12=1, 13=1, 14=1, 15=1}",
        "6,{16=1, 17=1, 18=1, 19=1, 20=1, 21=1}").sorted)
    } finally q.stop()
  }

  test("stream AggregateITCase testGroupAggregateWithStateBackend port (CountDistinct + DataViewTestAgg)") {
    // DataViewTestAgg = distinct-c count + sum(b); CountDistinct =
    // distinct c per group — both over keyed streaming state
    val data = Seq((1, 1L, "A"), (2, 2L, "B"), (3, 2L, "B"), (4, 3L, "C"),
      (5, 3L, "C"), (6, 3L, "C"), (7, 4L, "B"), (8, 4L, "A"),
      (9, 4L, "D"), (10, 4L, "E"), (11, 5L, "A"), (12, 5L, "B"))
    val got = complete(data)(df =>
      df.groupBy($"b").agg(
        size(collect_set($"c")).as("cd"),
        (size(collect_set($"c")).cast("long") + sum($"b")).as("dv")))
    assert(got === Seq("1,1,2", "2,1,5", "3,1,10", "4,4,20", "5,2,12").sorted)
  }

  test("stream AggregateITCase testRemoveDuplicateRecordsWithUpsertSink port") {
    val data = Seq((1, 1L, "A"), (2, 2L, "B"), (3, 2L, "B"), (4, 3L, "C"),
      (5, 3L, "C"))
    val got = complete(data)(df =>
      df.groupBy($"c").agg(max($"b").as("mb")))
    // the upsert sink's net state keyed on c
    assert(got === Seq("A,1", "B,2", "C,3").sorted)
  }
}
