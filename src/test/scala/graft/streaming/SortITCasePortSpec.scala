package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.streaming.GroupStateTimeout

import scala.collection.mutable

/** Verbatim port of the reference's streaming event-time sort ITCase
  * (flink-table runtime/stream/sql/SortITCase.scala:39
  * testEventTimeOrderBy — `SELECT b FROM T1 ORDER BY rowtime, b ASC`).
  * The original asserts the EXACT emission order (StringRowSelectorSink
  * appends in arrival order, assertEquals on the unsorted list); so does
  * this port. Data + watermark script copied unchanged; the script is
  * replayed through [[StreamOps.eventTimeSortedFn]] (the
  * RowTimeSortProcessFunction analog) via the virtual-clock harness,
  * with the source-close Long.MaxValue watermark as a final advance.
  */
class SortITCasePortSpec extends SparkSuite {

  test("SortITCase testEventTimeOrderBy port: exact global emission order") {
    // (rowtime, b) — the query emits only b; ties order by b ASC, which
    // is eventTimeSortedFn's value ordering
    val script: Seq[Either[(Long, Int), Long]] = Seq(
      Left((1500L, 15)),
      Left((1600L, 16)),
      Left((1000L, 1)),
      Left((2000L, 2)),
      Right(1000L),
      Left((2000L, 2)),
      Left((2000L, 3)),
      Left((3000L, 3)),
      Left((2000L, 1)),
      Right(2000L),
      Left((4000L, 4)),
      Right(3000L),
      Left((5000L, 5)),
      Right(5000L),
      Left((6000L, 65)),
      Left((6000L, 6)),
      Left((6000L, 67)),
      Left((6000L, -1)),
      Left((6000L, 6)),
      Right(7000L),
      Left((9000L, 9)),
      Left((8500L, 18)),
      Left((9000L, 7)),
      Right(10000L),
      Left((10000L, 7)),
      Left((11000L, 77)),
      Left((11000L, 17)),
      Right(12000L),
      Left((14000L, 18)),
      Right(14000L),
      Left((15000L, 8)),
      Right(17000L),
      Left((20000L, 20)),
      Right(19000L))

    val h = new VirtualClockHarness[Unit, (Long, Int),
      (Long, Seq[(Long, Double)]), (Unit, Long, Double)](
      GroupStateTimeout.EventTimeTimeout(),
      StreamOps.eventTimeSortedFn[Unit, (Long, Int)](
        e => e._1 * 1000L, _._2.toDouble))
    val out = mutable.ArrayBuffer.empty[(Unit, Long, Double)]
    var segment = Vector.empty[(Long, Int)]
    def flush(): Unit = {
      if (segment.nonEmpty) out ++= h.input((), segment: _*)
      segment = Vector.empty
    }
    script.foreach {
      case Left(e) => segment :+= e
      case Right(wm) => flush(); out ++= h.advanceWatermarkTo(wm)
    }
    flush()
    out ++= h.advanceWatermarkTo(1000000000000L) // source-close watermark

    val expected = List(
      "1", "15", "16",
      "1", "2", "2", "3",
      "3",
      "4",
      "5",
      "-1", "6", "6", "65", "67",
      "18", "7", "9",
      "7", "17", "77",
      "18",
      "8",
      "20")
    assert(out.map(_._3.toInt.toString).toList == expected) // exact order
  }
}
