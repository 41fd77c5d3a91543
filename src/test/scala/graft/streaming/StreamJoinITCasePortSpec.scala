package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Verbatim ports of the reference's stream SQL JoinITCase time-bounded
  * join cases (flink-table runtime/stream/sql/JoinITCase.scala) — the
  * event-time interval join through Spark's stream-stream join with a
  * two-sided time-range condition. Pinned semantics: inclusive BETWEEN
  * boundaries, null keys never join (and ARE preserved null-padded on
  * the outer side), non-equi residual conditions inside the OUTER join
  * condition keep the preserved-row semantics, and null padding emits
  * once the watermark passes the join window.
  */
class StreamJoinITCasePortSpec extends SparkSuite {
  import spark.implicits._

  private val Flush = ("zzz_flush", "flush", 100000000L)

  /** Two watermarked (key, id, rowtime) streams joined by `build`;
    * results collected after a watermark-advancing flush on both. */
  private def runJoin(
      left: Seq[(String, String, Long)], right: Seq[(String, String, Long)],
      name: String)(
      build: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)
        => org.apache.spark.sql.DataFrame): Seq[String] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val l = MemoryStream[(String, String, Long)]
    val r = MemoryStream[(String, String, Long)]
    def prep(s: MemoryStream[(String, String, Long)], kc: String, ic: String,
        tc: String) =
      s.toDF().toDF(kc, ic, s"${tc}_ms")
        .withColumn(tc, timestamp_millis(col(s"${tc}_ms")))
        .withWatermark(tc, "0 seconds")
    val df = build(prep(l, "lkey", "lid", "lrt"), prep(r, "rkey", "rid", "rrt"))
    val q = df.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      l.addData(left: _*); r.addData(right: _*)
      q.processAllAvailable()
      l.addData(Flush); r.addData(Flush)
      q.processAllAvailable()
      // a second flush round lets null padding for rows near the first
      // flush's watermark drain
      l.addData(Flush.copy(_3 = Flush._3 + 1))
      r.addData(Flush.copy(_3 = Flush._3 + 1))
      q.processAllAvailable()
      spark.table(name).collect().map(_.mkString(","))
        .filterNot(_.contains("flush")).toSeq.sorted
    } finally { q.stop(); spark.sql(s"DROP VIEW IF EXISTS $name") }
  }

  // ---- testRowTimeInnerJoin (stream/sql/JoinITCase.scala:135)
  // t1.rt BETWEEN t2.rt - 5s AND t2.rt + 6s, null keys on both sides
  test("stream JoinITCase testRowTimeInnerJoin port") {
    val data1 = Seq(("A", "LEFT0.999", 999L), ("A", "LEFT1", 1000L),
      ("A", "LEFT2", 2000L), ("A", "LEFT3", 3000L), ("B", "LEFT4", 4000L),
      ("A", "LEFT5", 5000L), ("A", "LEFT6", 6000L),
      (null.asInstanceOf[String], "LEFT8", 8000L))
    val data2 = Seq(("A", "RIGHT6", 6000L), ("B", "RIGHT7", 7000L),
      (null.asInstanceOf[String], "RIGHT10", 10000L))
    val got = runJoin(data1, data2, "sj_inner") { (t1, t2) =>
      t1.join(t2, expr(
        """lkey = rkey AND
          |lrt BETWEEN rrt - INTERVAL 5 SECONDS AND rrt + INTERVAL 6 SECONDS
          |""".stripMargin))
        .select($"rkey", $"rid", $"lid")
    }
    assert(got === Seq("A,RIGHT6,LEFT1", "A,RIGHT6,LEFT2", "A,RIGHT6,LEFT3",
      "A,RIGHT6,LEFT5", "A,RIGHT6,LEFT6", "B,RIGHT7,LEFT4").sorted)
  }

  // ---- testRowTimeLeftOuterJoin (:508) — residual non-equi condition
  // (t1.id <> 'L-5') inside the OUTER join condition; unmatched and
  // condition-excluded left rows surface null-padded
  test("stream JoinITCase testRowTimeLeftOuterJoin port") {
    val data1 = Seq(("A", "L-1", 1000L), ("A", "L-2", 2000L),
      ("B", "L-4", 4000L), ("B", "L-5", 5000L), ("A", "L-6", 6000L),
      ("C", "L-7", 7000L), ("A", "L-10", 10000L), ("A", "L-12", 12000L),
      ("A", "L-20", 20000L))
    val data2 = Seq(("A", "R-6", 6000L), ("B", "R-7", 7000L),
      ("D", "R-8", 8000L), ("A", "R-11", 11000L))
    val got = runJoin(data1, data2, "sj_louter") { (t1, t2) =>
      t1.join(t2, expr(
        """lkey = rkey AND
          |lrt BETWEEN rrt - INTERVAL 5 SECONDS AND rrt + INTERVAL 6 SECONDS
          |AND lid <> 'L-5'""".stripMargin), "left_outer")
        .select($"lkey", $"rid", $"lid")
    }
    assert(got === Seq(
      "A,R-6,L-1", "A,R-6,L-2", "A,R-6,L-6", "A,R-6,L-10", "A,R-6,L-12",
      "B,R-7,L-4", "A,R-11,L-6", "A,R-11,L-10", "A,R-11,L-12",
      "B,null,L-5", "C,null,L-7", "A,null,L-20").sorted)
  }
}
