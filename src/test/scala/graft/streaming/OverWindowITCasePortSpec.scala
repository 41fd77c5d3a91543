package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.streaming.GroupStateTimeout

import scala.collection.mutable

/** Verbatim ports of the reference's rowtime OVER-window ITCases
  * (flink-table runtime/stream/sql/OverWindowITCase.scala):
  *
  *  - testRowTimeBoundedPartitionedRangeOver  (:256)
  *  - testRowTimeBoundedPartitionedRowsOver   (:332)
  *  - testRowTimeUnBoundedPartitionedRangeOver (:523)
  *  - testRowTimeUnBoundedPartitionedRowsOver  (:592)
  *
  * Data + watermark scripts and expected lists are copied unchanged. The
  * original drives an EventTimeSourceFunction whose `Left((ts, row))`
  * emits a timestamped element and `Right(wm)` a watermark, with a final
  * `Long.MaxValue` watermark on source close; here the same script drives
  * [[OverWindows.overFn]] through the VirtualClockHarness — per-key
  * batches per watermark segment, exactly what a micro-batch delivers.
  * LTCNT is the original's LargerThanCount UDAGG; AVG over BIGINT is
  * SUM/COUNT with floor division, as the reference's IntegralAvgAgg.
  */
class OverWindowITCasePortSpec extends SparkSuite {
  import OverWindows._

  private val FinalWm = 1000000000000L // source-close watermark analog

  /** Run a Left/Right script against overFn; returns (key, (tsMs, row),
    * aggResults) in emission order. */
  private def runScript[K, R](frame: Frame, aggs: Seq[Agg],
      value: R => Double,
      script: Seq[Either[(Long, K, R), Long]]): Seq[(K, (Long, R), Seq[Double])] = {
    val h = new VirtualClockHarness[K, (Long, R), OverState[(Long, R)],
      (K, (Long, R), Seq[Double])](
      GroupStateTimeout.EventTimeTimeout(),
      OverWindows.overFn[K, (Long, R)](frame, aggs,
        e => e._1 * 1000L, e => value(e._2))) // ms → micros rowtime
    val out = Seq.newBuilder[(K, (Long, R), Seq[Double])]
    val segment = mutable.LinkedHashMap.empty[K, Vector[(Long, R)]]
    def flush(): Unit = {
      segment.foreach { case (k, evs) => out ++= h.input(k, evs: _*) }
      segment.clear()
    }
    script.foreach {
      case Left((ts, k, r)) =>
        segment(k) = segment.getOrElse(k, Vector.empty) :+ ((ts, r))
      case Right(wm) =>
        flush(); out ++= h.advanceWatermarkTo(wm)
    }
    flush()
    out ++= h.advanceWatermarkTo(FinalWm)
    out.result()
  }

  private def fmt(xs: Any*): String = xs.mkString(",")

  // ---- testRowTimeBoundedPartitionedRangeOver (OverWindowITCase.scala:256)
  // SELECT c, b, LTCNT(a, 4) / COUNT(a) / SUM(a)
  //   OVER (PARTITION BY c ORDER BY rowtime
  //         RANGE BETWEEN INTERVAL '1' SECOND PRECEDING AND CURRENT ROW)
  test("RowTimeBoundedPartitionedRangeOver port: peers share the range frame") {
    type R = (Long, Int) // (a, b); key = c
    val script: Seq[Either[(Long, String, R), Long]] = Seq(
      Left((1500L, "Hello", (1L, 15))),
      Left((1600L, "Hello", (1L, 16))),
      Left((1000L, "Hello", (1L, 1))),
      Left((2000L, "Hello", (2L, 2))),
      Right(1000L),
      Left((2000L, "Hello", (2L, 2))),
      Left((2000L, "Hello", (2L, 3))),
      Left((3000L, "Hello", (3L, 3))),
      Right(2000L),
      Left((4000L, "Hello", (4L, 4))),
      Right(3000L),
      Left((5000L, "Hello", (5L, 5))),
      Right(5000L),
      Left((6000L, "Hello", (6L, 6))),
      Left((6500L, "Hello", (6L, 65))),
      Right(7000L),
      Left((9000L, "Hello", (6L, 9))),
      Left((9500L, "Hello", (6L, 18))),
      Left((9000L, "Hello", (6L, 9))),
      Right(10000L),
      Left((10000L, "Hello World", (7L, 7))),
      Left((11000L, "Hello World", (7L, 17))),
      Left((11000L, "Hello World", (7L, 77))),
      Right(12000L),
      Left((14000L, "Hello World", (7L, 18))),
      Right(14000L),
      Left((15000L, "Hello World", (8L, 8))),
      Right(17000L),
      Left((20000L, "Hello World", (20L, 20))),
      Right(19000L))
    val got = runScript[String, R](
      BoundedRange(1000L * 1000L), // INTERVAL '1' SECOND, in micros
      Seq(Agg.countIf(_ > 4), Agg.count, Agg.sum), _._1.toDouble, script)
      .map { case (c, (_, (_, b)), as) =>
        fmt(c, b, as(0).toLong, as(1).toLong, as(2).toLong) }
    val expected = List(
      "Hello,1,0,1,1", "Hello,15,0,2,2", "Hello,16,0,3,3",
      "Hello,2,0,6,9", "Hello,3,0,6,9", "Hello,2,0,6,9",
      "Hello,3,0,4,9",
      "Hello,4,0,2,7",
      "Hello,5,1,2,9",
      "Hello,6,2,2,11", "Hello,65,2,2,12",
      "Hello,9,2,2,12", "Hello,9,2,2,12", "Hello,18,3,3,18",
      "Hello World,7,1,1,7", "Hello World,17,3,3,21", "Hello World,77,3,3,21",
      "Hello World,18,1,1,7",
      "Hello World,8,2,2,15",
      "Hello World,20,1,1,20")
    assert(got.sorted == expected.sorted)
  }

  // ---- testRowTimeBoundedPartitionedRowsOver (OverWindowITCase.scala:332)
  // SELECT c, a, LTCNT(a, 4) / COUNT(1) / SUM(a)
  //   OVER (PARTITION BY c ORDER BY rowtime ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
  test("RowTimeBoundedPartitionedRowsOver port: per-row 3-row frame") {
    type R = Long // a; key = c (b unused in output)
    val script: Seq[Either[(Long, String, R), Long]] = Seq(
      Left((1L, "Hello", 1L)),
      Left((2L, "Hello", 2L)),
      Left((1L, "Hello", 1L)),
      Left((2L, "Hello", 2L)),
      Left((2L, "Hello", 2L)),
      Left((1L, "Hello", 1L)),
      Left((3L, "Hello World", 7L)),
      Left((1L, "Hello World", 7L)),
      Left((1L, "Hello World", 7L)),
      Right(2L),
      Left((3L, "Hello", 3L)),
      Left((4L, "Hello", 4L)),
      Left((5L, "Hello", 5L)),
      Left((6L, "Hello", 6L)),
      Left((20L, "Hello World", 20L)),
      Right(6L),
      Left((8L, "Hello World", 8L)),
      Left((7L, "Hello World", 7L)),
      Right(20L))
    val got = runScript[String, R](
      BoundedRows(2),
      Seq(Agg.countIf(_ > 4), Agg.count, Agg.sum), _.toDouble, script)
      .map { case (c, (_, a), as) =>
        fmt(c, a, as(0).toLong, as(1).toLong, as(2).toLong) }
    val expected = List(
      "Hello,1,0,1,1", "Hello,1,0,2,2", "Hello,1,0,3,3",
      "Hello,2,0,3,4", "Hello,2,0,3,5", "Hello,2,0,3,6",
      "Hello,3,0,3,7", "Hello,4,0,3,9", "Hello,5,1,3,12",
      "Hello,6,2,3,15",
      "Hello World,7,1,1,7", "Hello World,7,2,2,14", "Hello World,7,3,3,21",
      "Hello World,7,3,3,21", "Hello World,8,3,3,22", "Hello World,20,3,3,35")
    assert(got.sorted == expected.sorted)
  }

  // ---- testRowTimeUnBoundedPartitionedRangeOver (OverWindowITCase.scala:523)
  // SELECT a, b, c, LTCNT(b,4) / SUM(b) / COUNT(b) / AVG(b) / MAX(b) / MIN(b)
  //   OVER (PARTITION BY a ORDER BY rowtime RANGE UNBOUNDED PRECEDING)
  test("RowTimeUnBoundedPartitionedRangeOver port: peers share the running aggregate") {
    type R = (Long, String) // (b, c); key = a
    val script: Seq[Either[(Long, Int, R), Long]] = Seq(
      Left((14000005L, 1, (1L, "Hi"))),
      Left((14000000L, 2, (1L, "Hello"))),
      Left((14000002L, 1, (1L, "Hello"))),
      Left((14000002L, 1, (2L, "Hello"))),
      Left((14000002L, 1, (3L, "Hello world"))),
      Left((14000003L, 2, (2L, "Hello world"))),
      Left((14000003L, 2, (3L, "Hello world"))),
      Right(14000020L),
      Left((14000021L, 1, (4L, "Hello world"))),
      Left((14000022L, 1, (5L, "Hello world"))),
      Left((14000022L, 1, (6L, "Hello world"))),
      Left((14000022L, 1, (7L, "Hello world"))),
      Left((14000023L, 2, (4L, "Hello world"))),
      Left((14000023L, 2, (5L, "Hello world"))),
      Right(14000030L))
    val got = runScript[Int, R](
      UnboundedRange,
      Seq(Agg.countIf(_ > 4), Agg.sum, Agg.count, Agg.max, Agg.min),
      _._1.toDouble, script)
      .map { case (a, (_, (b, c)), as) =>
        val (sum, cnt) = (as(1).toLong, as(2).toLong)
        fmt(a, b, c, as(0).toLong, sum, cnt, sum / cnt, as(3).toLong,
          as(4).toLong) } // AVG over BIGINT = floor division
    val expected = List(
      "1,1,Hello,0,6,3,2,3,1",
      "1,2,Hello,0,6,3,2,3,1",
      "1,3,Hello world,0,6,3,2,3,1",
      "1,1,Hi,0,7,4,1,3,1",
      "2,1,Hello,0,1,1,1,1,1",
      "2,2,Hello world,0,6,3,2,3,1",
      "2,3,Hello world,0,6,3,2,3,1",
      "1,4,Hello world,0,11,5,2,4,1",
      "1,5,Hello world,3,29,8,3,7,1",
      "1,6,Hello world,3,29,8,3,7,1",
      "1,7,Hello world,3,29,8,3,7,1",
      "2,4,Hello world,1,15,5,3,5,1",
      "2,5,Hello world,1,15,5,3,5,1")
    assert(got.sorted == expected.sorted)
  }

  // ---- testRowTimeUnBoundedPartitionedRowsOver (OverWindowITCase.scala:592)
  // Same aggregates, ROWS UNBOUNDED PRECEDING — per-row results, and a
  // mid-stream watermark that sits BELOW already-arrived rowtimes.
  test("RowTimeUnBoundedPartitionedRowsOver port: per-row running aggregate") {
    type R = (Long, String) // (b, c); key = a
    val script: Seq[Either[(Long, Int, R), Long]] = Seq(
      Left((14000005L, 1, (1L, "Hi"))),
      Left((14000000L, 2, (1L, "Hello"))),
      Left((14000002L, 3, (1L, "Hello"))),
      Left((14000003L, 1, (2L, "Hello"))),
      Left((14000004L, 1, (3L, "Hello world"))),
      Left((14000007L, 3, (2L, "Hello world"))),
      Left((14000008L, 2, (2L, "Hello world"))),
      Right(14000010L),
      Left((14000012L, 1, (5L, "Hello world"))),
      Left((14000021L, 1, (6L, "Hello world"))),
      Left((14000023L, 2, (5L, "Hello world"))),
      Right(14000020L),
      Left((14000024L, 3, (5L, "Hello world"))),
      Left((14000026L, 1, (7L, "Hello world"))),
      Left((14000025L, 1, (8L, "Hello world"))),
      Left((14000022L, 1, (9L, "Hello world"))),
      Right(14000030L))
    val got = runScript[Int, R](
      UnboundedRows,
      Seq(Agg.countIf(_ > 4), Agg.sum, Agg.count, Agg.max, Agg.min),
      _._1.toDouble, script)
      .map { case (a, (_, (b, c)), as) =>
        val (sum, cnt) = (as(1).toLong, as(2).toLong)
        fmt(a, b, c, as(0).toLong, sum, cnt, sum / cnt, as(3).toLong,
          as(4).toLong) }
    val expected = List(
      "1,2,Hello,0,2,1,2,2,2",
      "1,3,Hello world,0,5,2,2,3,2",
      "1,1,Hi,0,6,3,2,3,1",
      "2,1,Hello,0,1,1,1,1,1",
      "2,2,Hello world,0,3,2,1,2,1",
      "3,1,Hello,0,1,1,1,1,1",
      "3,2,Hello world,0,3,2,1,2,1",
      "1,5,Hello world,1,11,4,2,5,1",
      "1,6,Hello world,2,17,5,3,6,1",
      "1,9,Hello world,3,26,6,4,9,1",
      "1,8,Hello world,4,34,7,4,9,1",
      "1,7,Hello world,5,41,8,5,9,1",
      "2,5,Hello world,1,8,3,2,5,1",
      "3,5,Hello world,1,8,3,2,5,1")
    assert(got.sorted == expected.sorted)
  }

  // ---- testRowTimeBoundedNonPartitionedRangeOver (OverWindowITCase.scala:392)
  // Same script as the partitioned range test, no PARTITION BY — a single
  // global key (the reference runs it at parallelism 1; at scale this is
  // the same single-task bottleneck a non-keyed OVER always is).
  test("RowTimeBoundedNonPartitionedRangeOver port: global range frame") {
    type R = (Long, Int, String) // (a, b, c); key = ()
    val script: Seq[Either[(Long, Unit, R), Long]] = Seq(
      Left((1500L, (), (1L, 15, "Hello"))),
      Left((1600L, (), (1L, 16, "Hello"))),
      Left((1000L, (), (1L, 1, "Hello"))),
      Left((2000L, (), (2L, 2, "Hello"))),
      Right(1000L),
      Left((2000L, (), (2L, 2, "Hello"))),
      Left((2000L, (), (2L, 3, "Hello"))),
      Left((3000L, (), (3L, 3, "Hello"))),
      Right(2000L),
      Left((4000L, (), (4L, 4, "Hello"))),
      Right(3000L),
      Left((5000L, (), (5L, 5, "Hello"))),
      Right(5000L),
      Left((6000L, (), (6L, 6, "Hello"))),
      Left((6500L, (), (6L, 65, "Hello"))),
      Right(7000L),
      Left((9000L, (), (6L, 9, "Hello"))),
      Left((9500L, (), (6L, 18, "Hello"))),
      Left((9000L, (), (6L, 9, "Hello"))),
      Right(10000L),
      Left((10000L, (), (7L, 7, "Hello World"))),
      Left((11000L, (), (7L, 17, "Hello World"))),
      Left((11000L, (), (7L, 77, "Hello World"))),
      Right(12000L),
      Left((14000L, (), (7L, 18, "Hello World"))),
      Right(14000L),
      Left((15000L, (), (8L, 8, "Hello World"))),
      Right(17000L),
      Left((20000L, (), (20L, 20, "Hello World"))),
      Right(19000L))
    val got = runScript[Unit, R](
      BoundedRange(1000L * 1000L),
      Seq(Agg.count, Agg.sum), _._1.toDouble, script)
      .map { case (_, (_, (_, b, c)), as) =>
        fmt(c, b, as(0).toLong, as(1).toLong) }
    val expected = List(
      "Hello,1,1,1", "Hello,15,2,2", "Hello,16,3,3",
      "Hello,2,6,9", "Hello,3,6,9", "Hello,2,6,9",
      "Hello,3,4,9",
      "Hello,4,2,7",
      "Hello,5,2,9",
      "Hello,6,2,11", "Hello,65,2,12",
      "Hello,9,2,12", "Hello,9,2,12", "Hello,18,3,18",
      "Hello World,7,4,25", "Hello World,17,3,21", "Hello World,77,3,21",
      "Hello World,18,1,7",
      "Hello World,8,2,15",
      "Hello World,20,1,20")
    assert(got.sorted == expected.sorted)
  }

  // ---- testRowTimeBoundedNonPartitionedRowsOver (OverWindowITCase.scala:464)
  // Contains an explicitly-late row (ts 2 after the watermark passed 3)
  // that the bounded rule must DROP: data has 16 rows, expected 15.
  test("RowTimeBoundedNonPartitionedRowsOver port: late row dropped by lastTriggeringTs") {
    type R = (Long, String) // (a, c); key = ()
    val script: Seq[Either[(Long, Unit, R), Long]] = Seq(
      Left((2L, (), (2L, "Hello"))),
      Left((2L, (), (2L, "Hello"))),
      Left((1L, (), (1L, "Hello"))),
      Left((1L, (), (1L, "Hello"))),
      Left((2L, (), (2L, "Hello"))),
      Left((1L, (), (1L, "Hello"))),
      Left((20L, (), (20L, "Hello World"))), // early row
      Right(3L),
      Left((2L, (), (2L, "Hello"))), // late row — must be discarded
      Left((3L, (), (3L, "Hello"))),
      Left((4L, (), (4L, "Hello"))),
      Left((5L, (), (5L, "Hello"))),
      Left((6L, (), (6L, "Hello"))),
      Left((7L, (), (7L, "Hello World"))),
      Right(7L),
      Left((9L, (), (9L, "Hello World"))),
      Left((8L, (), (8L, "Hello World"))),
      Left((8L, (), (8L, "Hello World"))),
      Right(20L))
    val got = runScript[Unit, R](
      BoundedRows(2),
      Seq(Agg.count, Agg.sum), _._1.toDouble, script)
      .map { case (_, (_, (a, c)), as) =>
        fmt(c, a, as(0).toLong, as(1).toLong) }
    val expected = List(
      "Hello,1,1,1", "Hello,1,2,2", "Hello,1,3,3",
      "Hello,2,3,4", "Hello,2,3,5", "Hello,2,3,6",
      "Hello,3,3,7",
      "Hello,4,3,9", "Hello,5,3,12",
      "Hello,6,3,15", "Hello World,7,3,18",
      "Hello World,8,3,21", "Hello World,8,3,23",
      "Hello World,9,3,25",
      "Hello World,20,3,37")
    assert(got.sorted == expected.sorted)
  }

  // ---- testRowTimeUnBoundedNonPartitionedRangeOver (OverWindowITCase.scala:662)
  test("RowTimeUnBoundedNonPartitionedRangeOver port: global peers share the running aggregate") {
    type R = (Int, Long, String) // (a, b, c); key = ()
    val script: Seq[Either[(Long, Unit, R), Long]] = Seq(
      Left((14000005L, (), (1, 1L, "Hi"))),
      Left((14000000L, (), (2, 1L, "Hello"))),
      Left((14000002L, (), (1, 1L, "Hello"))),
      Left((14000002L, (), (1, 2L, "Hello"))),
      Left((14000002L, (), (1, 3L, "Hello world"))),
      Left((14000003L, (), (2, 2L, "Hello world"))),
      Left((14000003L, (), (2, 3L, "Hello world"))),
      Right(14000020L),
      Left((14000021L, (), (1, 4L, "Hello world"))),
      Left((14000022L, (), (1, 5L, "Hello world"))),
      Left((14000022L, (), (1, 6L, "Hello world"))),
      Left((14000022L, (), (1, 7L, "Hello world"))),
      Left((14000023L, (), (2, 4L, "Hello world"))),
      Left((14000023L, (), (2, 5L, "Hello world"))),
      Right(14000030L))
    val got = runScript[Unit, R](
      UnboundedRange,
      Seq(Agg.sum, Agg.count, Agg.max, Agg.min), _._2.toDouble, script)
      .map { case (_, (_, (a, b, c)), as) =>
        val (sum, cnt) = (as(0).toLong, as(1).toLong)
        fmt(a, b, c, sum, cnt, sum / cnt, as(2).toLong, as(3).toLong) }
    val expected = List(
      "2,1,Hello,1,1,1,1,1",
      "1,1,Hello,7,4,1,3,1",
      "1,2,Hello,7,4,1,3,1",
      "1,3,Hello world,7,4,1,3,1",
      "2,2,Hello world,12,6,2,3,1",
      "2,3,Hello world,12,6,2,3,1",
      "1,1,Hi,13,7,1,3,1",
      "1,4,Hello world,17,8,2,4,1",
      "1,5,Hello world,35,11,3,7,1",
      "1,6,Hello world,35,11,3,7,1",
      "1,7,Hello world,35,11,3,7,1",
      "2,4,Hello world,44,13,3,7,1",
      "2,5,Hello world,44,13,3,7,1")
    assert(got.sorted == expected.sorted)
  }

  // ---- testRowTimeUnBoundedNonPartitionedRowsOver (OverWindowITCase.scala:724)
  // Contains an explicitly-late row (ts 14000008 at watermark 14000010)
  // that the unbounded rule must DROP at arrival: data 9 rows, expected 8.
  test("RowTimeUnBoundedNonPartitionedRowsOver port: late row dropped at arrival") {
    type R = (Int, Long, String) // (a, b, c); key = ()
    val script: Seq[Either[(Long, Unit, R), Long]] = Seq(
      Left((14000005L, (), (1, 1L, "Hi"))),
      Left((14000000L, (), (2, 2L, "Hello"))),
      Left((14000002L, (), (3, 5L, "Hello"))),
      Left((14000003L, (), (1, 3L, "Hello"))),
      Left((14000004L, (), (3, 7L, "Hello world"))),
      Left((14000007L, (), (4, 9L, "Hello world"))),
      Left((14000008L, (), (5, 8L, "Hello world"))),
      Right(14000010L),
      Left((14000008L, (), (6, 8L, "Hello world"))), // late — discarded
      Right(14000020L),
      Left((14000021L, (), (6, 8L, "Hello world"))),
      Right(14000030L))
    val got = runScript[Unit, R](
      UnboundedRows,
      Seq(Agg.sum, Agg.count, Agg.max, Agg.min), _._2.toDouble, script)
      .map { case (_, (_, (a, b, c)), as) =>
        val (sum, cnt) = (as(0).toLong, as(1).toLong)
        fmt(a, b, c, sum, cnt, sum / cnt, as(2).toLong, as(3).toLong) }
    val expected = List(
      "2,2,Hello,2,1,2,2,2",
      "3,5,Hello,7,2,3,5,2",
      "1,3,Hello,10,3,3,5,2",
      "3,7,Hello world,17,4,4,7,2",
      "1,1,Hi,18,5,3,7,1",
      "4,9,Hello world,27,6,4,9,1",
      "5,8,Hello world,35,7,5,9,1",
      "6,8,Hello world,43,8,5,9,1")
    assert(got.sorted == expected.sorted)
  }

  // ---- testRowTimeUnBoundedPartitionedRowsOver2 (OverWindowITCase.scala:780)
  // SELECT a, b, c, SUM/COUNT/AVG/MAX/MIN(b) OVER (PARTITION BY a ORDER BY
  //   rowtime ROWS UNBOUNDED PRECEDING) — a three-watermark script whose
  // late rows (behind each watermark) are dropped, with same-timestamp
  // rows emitted in arrival order (stable event-time sort)
  test("RowTimeUnBoundedPartitionedRowsOver2 port: multi-watermark late-row script") {
    type R = (Long, String) // (b, c); key = a
    val script: Seq[Either[(Long, Int, R), Long]] = Seq(
      Left((14000005L, 1, (1L, "Hi"))),
      Left((14000000L, 2, (1L, "Hello"))),
      Left((14000002L, 3, (1L, "Hello"))),
      Left((14000003L, 1, (2L, "Hello"))),
      Left((14000004L, 1, (3L, "Hello world"))),
      Left((14000007L, 3, (2L, "Hello world"))),
      Left((14000008L, 2, (2L, "Hello world"))),
      Right(14000010L),
      // the next 3 elements are late
      Left((14000008L, 1, (4L, "Hello world"))),
      Left((14000008L, 2, (3L, "Hello world"))),
      Left((14000008L, 3, (3L, "Hello world"))),
      Left((14000012L, 1, (5L, "Hello world"))),
      Right(14000020L),
      Left((14000021L, 1, (6L, "Hello world"))),
      // the next 3 elements are late
      Left((14000019L, 1, (6L, "Hello world"))),
      Left((14000018L, 2, (4L, "Hello world"))),
      Left((14000018L, 3, (4L, "Hello world"))),
      Left((14000022L, 2, (5L, "Hello world"))),
      Left((14000022L, 3, (5L, "Hello world"))),
      Left((14000024L, 1, (7L, "Hello world"))),
      Left((14000023L, 1, (8L, "Hello world"))),
      Left((14000021L, 1, (9L, "Hello world"))),
      Right(14000030L))
    val got = runScript[Int, R](UnboundedRows,
      Seq(Agg.sum, Agg.count, Agg.max, Agg.min), _._1.toDouble, script)
      .map { case (a, (_, (b, c)), as) =>
        // AVG over BIGINT = floor division (IntegralAvgAggFunction)
        fmt(a, b, c, as(0).toLong, as(1).toLong,
          as(0).toLong / as(1).toLong, as(2).toLong, as(3).toLong) }
    val expected = List(
      "1,2,Hello,2,1,2,2,2",
      "1,3,Hello world,5,2,2,3,2",
      "1,1,Hi,6,3,2,3,1",
      "2,1,Hello,1,1,1,1,1",
      "2,2,Hello world,3,2,1,2,1",
      "3,1,Hello,1,1,1,1,1",
      "3,2,Hello world,3,2,1,2,1",
      "1,5,Hello world,11,4,2,5,1",
      "1,6,Hello world,17,5,3,6,1",
      "1,9,Hello world,26,6,4,9,1",
      "1,8,Hello world,34,7,4,9,1",
      "1,7,Hello world,41,8,5,9,1",
      "2,5,Hello world,8,3,2,5,1",
      "3,5,Hello world,8,3,2,5,1")
    assert(got.sorted == expected.sorted)
  }
}
