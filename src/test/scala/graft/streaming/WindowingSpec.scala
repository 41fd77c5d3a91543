package graft.streaming

import graft.SparkSuite
import graft.streaming.Windowing._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Trigger/evictor compositions vs the reference's WindowOperator
  * semantics: CountTrigger tumble parity, the countWindow(size, slide)
  * composition, DeltaTrigger's reference-point contract, and Time/Delta
  * evictors. */
class WindowingSpec extends SparkSuite {
  import spark.implicits._

  private val nums: Seq[(Long, Double)] =
    Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0).map((1L, _))

  test("CountTrigger with purge = tumbling count windows (countWindow(n) parity)") {
    val got = triggeredWindow(nums.toDS(), (r: (Long, Double)) => r._1,
      Triggers.count[(Long, Double)](3))(
      (k, w) => (k, w.map(_._2).sum)).collect().toSeq
    assert(got == Seq((1L, 6.0), (1L, 15.0))) // [1,2,3], [4,5,6]; 7 pending
  }

  test("countSlideWindow(size=3, slide=2) emits the last 3 every 2 (reference overload)") {
    val got = countSlideWindow(nums.toDS(), (r: (Long, Double)) => r._1,
      size = 3, slide = 2)((k, w) => w.map(_._2)).collect().toSeq
    // fires at elements 2,4,6 with the last ≤3 elements each time
    assert(got == Seq(Seq(1.0, 2.0), Seq(2.0, 3.0, 4.0), Seq(4.0, 5.0, 6.0)))
  }

  test("ContinuousEventTimeTrigger fires periodically at aligned interval boundaries") {
    // interval 100: boundaries at 100, 200, 300, ... relative to the
    // aligned time of the last firing element (first element before any
    // fire) — early firings while the global window stays open
    val evs: Seq[(Long, Long)] =
      Seq(0L, 10L, 100L, 150L, 210L, 390L).map((1L, _))
    val got = triggeredWindow(evs.toDS(), (r: (Long, Long)) => r._1,
      Triggers.continuousEventTime[(Long, Long)](_._2, 100L))(
      (k, w) => w.map(_._2)).collect().toSeq
    // fire at ts=100 (first boundary after aligned(0)+100), at ts=210
    // (aligned(100)+100=200), at ts=390 (aligned(210)+100=300); buffer
    // accumulates (no purge) — each early firing sees the full window
    assert(got == Seq(
      Seq(0L, 10L, 100L),
      Seq(0L, 10L, 100L, 150L, 210L),
      Seq(0L, 10L, 100L, 150L, 210L, 390L)))
  }

  test("ContinuousEventTimeTrigger with purge = aligned event-time batches") {
    val evs: Seq[(Long, Long)] =
      Seq(0L, 10L, 100L, 150L, 210L).map((1L, _))
    val got = triggeredWindow(evs.toDS(), (r: (Long, Long)) => r._1,
      Triggers.continuousEventTime[(Long, Long)](_._2, 100L, purge = true))(
      (k, w) => w.map(_._2)).collect().toSeq
    // purge on each aligned firing: [0,10,100] then [150,210]; nothing
    // pending after 210 fires (aligned(100)+100=200 <= 210)
    assert(got == Seq(Seq(0L, 10L, 100L), Seq(150L, 210L)))
  }

  test("DeltaTrigger fires when the delta vs the reference point exceeds the threshold") {
    val vals = Seq(1.0, 1.5, 2.0, 5.0, 5.5, 9.0).map((1L, _))
    val got = triggeredWindow(vals.toDS(), (r: (Long, Double)) => r._1,
      Triggers.delta[(Long, Double)](2.5, (a, b) => b._2 - a._2))(
      (k, w) => w.map(_._2)).collect().toSeq
    // ref=1.0 until 5.0 fires (delta 4.0 > 2.5, purge); then ref=5.0,
    // 9.0 fires (delta 4.0)
    assert(got == Seq(Seq(1.0, 1.5, 2.0, 5.0), Seq(5.5, 9.0)))
  }

  test("TimeEvictor keeps only elements within the window of the newest timestamp") {
    val ev = Evictors.time[(Long, Double)](r => (r._2 * 1000000).toLong, 2000000L)
    assert(ev.evict(Seq((1L, 1.0), (1L, 2.0), (1L, 3.5), (1L, 4.0)))
      == Seq((1L, 2.0), (1L, 3.5), (1L, 4.0)))
  }

  test("DeltaEvictor drops elements too far from the last element") {
    val ev = Evictors.delta[(Long, Double)](1.0, (e, last) => last._2 - e._2)
    // delta >= threshold evicts: 3.0 sits exactly at the 1.0 threshold and
    // goes (DeltaEvictor.java evicts on getDelta >= threshold)
    assert(ev.evict(Seq((1L, 1.0), (1L, 3.0), (1L, 3.5), (1L, 4.0)))
      == Seq((1L, 3.5), (1L, 4.0)))
  }

  test("triggered windows run identically on a real stream across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val out = triggeredWindow(input.toDS(), (r: (Long, Double)) => r._1,
      Triggers.count[(Long, Double)](3))((k, w) => (k, w.map(_._2).sum))
    val q = out.toDF("k", "s").writeStream.outputMode("append")
      .format("memory").queryName("trig_out").start()
    try {
      input.addData((1L, 1.0), (1L, 2.0)) // buffer carries across batches
      q.processAllAvailable()
      input.addData((1L, 3.0), (1L, 4.0))
      q.processAllAvailable()
      input.addData((1L, 5.0), (1L, 6.0))
      q.processAllAvailable()
      val got = spark.table("trig_out").as[(Long, Double)].collect().toSeq
      assert(got == Seq((1L, 6.0), (1L, 15.0)))
    } finally q.stop()
  }
}
