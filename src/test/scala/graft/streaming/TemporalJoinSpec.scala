package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Event-time temporal join: version buffering, as-of lookup at the
  * fact's timestamp, watermark-gated emission, state pruning, and the
  * timer that flushes pending facts on an otherwise-idle key. */
class TemporalJoinSpec extends SparkSuite {
  import spark.implicits._

  private type F = (Long, Long, String)
  private type V = (Long, Long, String)
  private type S = StreamOps.TemporalJoinState[String, String]
  private type O = (Long, Long, String, Option[String])
  implicit val sEnc: Encoder[S] = ExpressionEncoder()

  private def harness() =
    new VirtualClockHarness[Long, (Option[F], Option[V]), S, O](
      GroupStateTimeout.EventTimeTimeout(),
      (k: Long, it: Iterator[(Option[F], Option[V])],
       st: GroupState[S]) => {
        val buf = it.toVector
        StreamOps.temporalJoinFn[Long, String, String](
          k, buf.flatMap(_._1), buf.flatMap(_._2), st)
      })

  private def fact(k: Long, ts: Long, v: String): (Option[F], Option[V]) =
    (Some((k, ts, v)), None)
  private def ver(k: Long, ts: Long, v: String): (Option[F], Option[V]) =
    (None, Some((k, ts, v)))

  test("facts wait for the watermark, join as-of their own timestamp, " +
      "and the version buffer prunes") {
    val h = harness()
    assert(h.input(1L, ver(1, 10, "v1")).isEmpty)
    assert(h.input(1L, fact(1, 15, "f15")).isEmpty) // wm=0: pending
    assert(h.timerOf(1L).contains(15L)) // flush timer at the fact's ts
    assert(h.advanceWatermarkTo(12L).isEmpty) // not ripe yet
    assert(h.advanceWatermarkTo(20L) == Seq((1L, 15L, "f15", Some("v1"))))
    // second version epoch; a fact BETWEEN the versions picks the first
    assert(h.input(1L, ver(1, 30, "v2")).isEmpty)
    assert(h.input(1L, fact(1, 25, "f25")).isEmpty)
    assert(h.advanceWatermarkTo(40L) == Seq((1L, 25L, "f25", Some("v1"))))
    // pruning: v1 is now unreachable (any future fact has ts > 40)
    assert(h.stateOf(1L).map(_.versions) == Some(Vector((30L, "v2"))))
    // a later fact sees only v2
    assert(h.input(1L, fact(1, 50, "f50")).isEmpty)
    assert(h.advanceWatermarkTo(60L) == Seq((1L, 50L, "f50", Some("v2"))))
  }

  test("a fact preceding every version emits None (left-outer form)") {
    val h = harness()
    assert(h.input(2L, ver(2, 10, "v1")).isEmpty)
    assert(h.input(2L, fact(2, 5, "early")).isEmpty)
    assert(h.advanceWatermarkTo(30L) == Seq((2L, 5L, "early", None)))
  }

  test("same-timestamp versions: last arrival wins (last-write-wins)") {
    val h = harness()
    assert(h.input(4L, ver(4, 10, "a")).isEmpty)
    assert(h.input(4L, ver(4, 10, "b")).isEmpty)
    assert(h.input(4L, fact(4, 10, "f")).isEmpty)
    assert(h.advanceWatermarkTo(11L) == Seq((4L, 10L, "f", Some("b"))))
  }

  test("same-timestamp versions WITHIN one batch resolve independently " +
      "of the partition-dependent iterator order") {
    // the micro-batch group iterator carries no arrival order, so the
    // tie must break on a deterministic payload key — both input
    // orders of the same batch must pick the same winner
    val h1 = harness()
    assert(h1.input(5L, ver(5, 10, "a"), ver(5, 10, "b")).isEmpty)
    assert(h1.input(5L, fact(5, 10, "f")).isEmpty)
    val r1 = h1.advanceWatermarkTo(11L)
    val h2 = harness()
    assert(h2.input(5L, ver(5, 10, "b"), ver(5, 10, "a")).isEmpty)
    assert(h2.input(5L, fact(5, 10, "f")).isEmpty)
    val r2 = h2.advanceWatermarkTo(11L)
    assert(r1 == r2)
    // and a LATER batch still beats any within-batch tiebreak
    val h3 = harness()
    assert(h3.input(5L, ver(5, 10, "z"), ver(5, 10, "y")).isEmpty)
    assert(h3.input(5L, ver(5, 10, "a")).isEmpty) // true arrival order
    assert(h3.input(5L, fact(5, 10, "f")).isEmpty)
    assert(h3.advanceWatermarkTo(11L) == Seq((5L, 10L, "f", Some("a"))))
  }

  test("real two-stream run: versions and facts across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val factsIn = MemoryStream[(Long, Long, String)]
    val versIn = MemoryStream[(Long, Long, String)]
    val joined = StreamOps.temporalJoin[Long, String, String](
      factsIn.toDS(), versIn.toDS())
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("temporal_out").start()
    try {
      versIn.addData((7L, 10L, "rate1"))
      factsIn.addData((7L, 15L, "order15"))
      q.processAllAvailable()
      // both watermarks still at 0 after batch 1's data → nothing out yet
      versIn.addData((7L, 100L, "rate2"))
      factsIn.addData((7L, 120L, "order120"))
      q.processAllAvailable()
      q.processAllAvailable()
      // wm advanced past 15: order15 joins the rate current at ts 15
      val got1 = spark.table("temporal_out").as[O].collect().toSet
      assert(got1.contains((7L, 15L, "order15", Some("rate1"))))
      // push both watermarks past 120 so order120 flushes too
      versIn.addData((7L, 300L, "rate3"))
      factsIn.addData((7L, 300L, "order300"))
      q.processAllAvailable()
      q.processAllAvailable()
      val got2 = spark.table("temporal_out").as[O].collect().toSet
      assert(got2.contains((7L, 120L, "order120", Some("rate2"))))
    } finally q.stop()
  }

  test("batch execution degrades to the as-of join") {
    val facts = Seq((1L, 5L, "f5"), (1L, 15L, "f15"), (1L, 35L, "f35"),
      (2L, 9L, "g9")).toDS()
    val vers = Seq((1L, 10L, "v10"), (1L, 30L, "v30"), (2L, 9L, "w9")).toDS()
    val got = StreamOps.temporalJoin[Long, String, String](facts, vers)
      .collect().toSet
    assert(got == Set(
      (1L, 5L, "f5", None), (1L, 15L, "f15", Some("v10")),
      (1L, 35L, "f35", Some("v30")), (2L, 9L, "g9", Some("w9"))))
  }
}
