package graft.operators

import graft.{SparkSuite, TestData}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Operator ITCases over the canonical fixtures, with expected results
  * transcribed from the reference's integration tests (FIXTURES.md §A/§C):
  * sorted string lists, exactly the `StreamITCase.StringSink` comparison
  * style. Citations point at the reference case each expectation is ported
  * from.
  */
class ITCaseSpec extends SparkSuite {
  import spark.implicits._

  private def sortedStrings(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString(",")).toSeq.sorted

  test("groupBy(b).sum(a) over T3 (AggregateITCase shape)") {
    val got = sortedStrings(
      TestData.t3(spark).groupBy($"b").agg(sum($"a")).select($"b", $"sum(a)"))
    assert(got == Seq("1,1", "2,5", "3,15", "4,34", "5,65", "6,111").sorted)
  }

  test("smallT3 join smallT5 on a (JoinITCase shape)") {
    val got = sortedStrings(
      TestData.smallT3(spark).as("l")
        .join(TestData.smallT5(spark).as("r"), "a")
        .select($"l.c", $"r.d"))
    assert(got == Seq(
      "Hi,Hallo", "Hello,Hallo Welt", "Hello,Hallo Welt wie",
      "Hello world,Hallo Welt wie gehts?", "Hello world,ABC").sorted)
  }

  test("distinct on T3.b (DistinctITCase shape)") {
    val got = sortedStrings(TestData.t3(spark).select($"b").distinct())
    assert(got == Seq("1", "2", "3", "4", "5", "6"))
  }

  test("union + first-n semantics over T3") {
    val t3 = TestData.t3(spark)
    assert(t3.union(TestData.smallT3(spark)).count() == 24)
    assert(t3.union(t3).distinct().count() == 21)
    assert(t3.limit(5).count() == 5)
  }

  // Ported verbatim: SqlITCase.testDistinctAggOnRowTimeTumbleWindow
  // (flink-table runtime/stream/sql/SqlITCase.scala:100-131) — SUM/MIN/COUNT
  // DISTINCT e per a under a 5s tumble with rowtime = b millis. Spark has no
  // streaming distinct aggregate; collect_set + array ops give the exact
  // semantics (state = per-window distinct set, the same as the reference's
  // DistinctAccumulator).
  test("streaming tumble distinct aggs on T5 (SqlITCase:100 port)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Int, Long, Int, String, Long)]
    val df = input.toDF().toDF("a", "b", "c", "d", "e")
      .withColumn("rowtime", timestamp_millis($"b"))
      .withWatermark("rowtime", "0 milliseconds")
      .groupBy(window($"rowtime", "5 seconds"), $"a")
      .agg(collect_set($"e").as("es"))
      .select($"a",
        expr("aggregate(es, 0L, (x, y) -> x + y)").as("sum_dist"),
        array_min($"es").as("min_dist"),
        size($"es").cast("long").as("cnt_dist"))
    val q = df.writeStream.outputMode("append")
      .format("memory").queryName("it_tumble").start()
    try {
      input.addData(TestData.t5Rows: _*)
      q.processAllAvailable()
      input.addData((99, 1000000L, 0, "flush", 99L)) // advance watermark
      q.processAllAvailable()
      val got = spark.table("it_tumble").where($"a" =!= 99)
        .collect().map(_.mkString(",")).toSeq.sorted
      // expected list from SqlITCase.scala:125-130
      assert(got == Seq("1,1,1,1", "2,3,1,2", "3,5,2,2", "4,3,1,2", "5,6,1,3"))
    } finally q.stop()
  }

  // Ported verbatim: SqlITCase.testDistinctAggWithMergeOnEventTimeSessionGroupWindow
  // (SqlITCase.scala:57-98) — merging session windows (gap 5ms) with a
  // distinct count; expected windows/values from SqlITCase.scala:90-95.
  test("streaming merging session windows on the session fixture (SqlITCase:57 port)") {
    implicit val sqlCtx = spark.sqlContext
    val sessionData = Seq(
      (1L, 2, "Hello"), (2L, 2, "Hello"), (8L, 2, "Hello"),
      (10L, 3, "Hello"), (9L, 9, "Hello World"), (4L, 1, "Hello"),
      (16L, 16, "Hello"))
    val input = MemoryStream[(Long, Int, String)]
    val df = input.toDF().toDF("ts", "b", "c")
      .withColumn("rowtime", timestamp_millis($"ts"))
      .withWatermark("rowtime", "10 milliseconds")
      .groupBy(session_window($"rowtime", "5 milliseconds"), $"c")
      .agg(collect_set($"b").as("bs"))
      .select($"c", size($"bs").cast("long").as("cnt_dist"),
        date_format($"session_window.end", "yyyy-MM-dd HH:mm:ss.SSS")
          .as("session_end"))
    val q = df.writeStream.outputMode("append")
      .format("memory").queryName("it_session").start()
    try {
      input.addData(sessionData: _*)
      q.processAllAvailable()
      input.addData((1000000L, 0, "zzz_flush"))
      q.processAllAvailable()
      val got = spark.table("it_session").where($"c" =!= "zzz_flush")
        .collect().map(_.mkString(",")).toSeq.sorted
      // expected from SqlITCase.scala:90-95 (sorted)
      assert(got == Seq(
        "Hello World,1,1970-01-01 00:00:00.014",
        "Hello,1,1970-01-01 00:00:00.021",
        "Hello,3,1970-01-01 00:00:00.015").sorted)
    } finally q.stop()
  }
}
