package graft

import graft.streaming.Cep

/** The VERDICT-prescribed measurement for the EventId-multiplicity
  * divergence: time the library CEP patterns with and without
  * `arrivalIds` (the SharedBuffer-parity mode) at sf0.1, warm
  * median-of-3 per side. Run: Test/runMain graft.ArrivalIdsBench
  */
object ArrivalIdsBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(8)
    import spark.implicits._

    type Row4 = (Long, Long, Long, Int)
    val HourMicros = 3600L * 1000 * 1000
    def events(types: String) = Engine.table(spark, sfDir, "events")
      .where(s"event_type IN ($types)")
      .selectExpr("event_id", "unix_micros(ts) AS tsu", "user_id",
        "CAST(event_type = 'view' AS INT) AS is_view")
      .as[(Long, Long, Long, Int)]

    // qc1's pattern (view -> first error within 1h) and qc4's
    // (2-3 consecutive errors) — the relaxed and quantified shapes
    val viewError = Cep.Pattern.begin[Row4]("view")(_._4 == 1)
      .followedBy("error")(_._4 == 0).within(HourMicros)
    val errAll = Engine.table(spark, sfDir, "events")
      .selectExpr("event_id", "unix_micros(ts) AS tsu", "user_id",
        "CAST(event_type = 'error' AS INT) AS is_err")
      .as[(Long, Long, Long, Int)]
    val times23 = Cep.Pattern.begin[Row4]("e")(_._4 == 1).times(2, 3)

    def runPattern(ds: org.apache.spark.sql.Dataset[Row4],
        p: Cep.Pattern[Row4], ids: Boolean): Long =
      Cep.matchBatchGroups(ds, (e: Row4) => e._3, (e: Row4) => e._2, p,
        tie = (e: Row4) => e._1, arrivalIds = ids) { (u, m) => u }.count()

    def median3(f: => Unit): Double = {
      f // warm
      val s = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      s.sorted.apply(1)
    }

    for ((label, ds, p) <- Seq(
        ("qc1_view_error", events("'view', 'error'"), viewError),
        ("qc4_times_range", errAll, times23))) {
      val off = median3(runPattern(ds, p, ids = false))
      val on = median3(runPattern(ds, p, ids = true))
      println(f"ARRIVALIDS $label%-18s off=$off%6.3fs on=$on%6.3fs hit=${(on / off - 1) * 100}%+.1f%%")
    }

    // qc7's GROUP shape (round 8: the group engine took the same parity)
    import graft.streaming.GroupCep
    val grp = GroupCep.GPattern.begin[Row4]("v")(_._4 == 1)
      .followedBy(GroupCep.GPattern.begin[Row4]("c")(_._4 == 2)
        .followedBy("e")(_._4 == 0)).times(1, 2)
    val ve = Engine.table(spark, sfDir, "events")
      .where("event_type IN ('view', 'click', 'error')")
      .selectExpr("event_id", "unix_micros(ts) AS tsu", "user_id",
        "CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 " +
          "ELSE 0 END AS tag")
      .as[(Long, Long, Long, Int)]
    def runGroup(ids: Boolean): Long =
      GroupCep.matchBatchGroups(ve, (e: Row4) => e._3, (e: Row4) => e._2,
        grp, tie = (e: Row4) => e._1, arrivalIds = ids) { (u, _) => u }
        .count()
    val goff = median3(runGroup(ids = false))
    val gon = median3(runGroup(ids = true))
    println(f"ARRIVALIDS qc7_group_shape    off=$goff%6.3fs on=$gon%6.3fs hit=${(gon / goff - 1) * 100}%+.1f%%")
    spark.stop()
  }
}
