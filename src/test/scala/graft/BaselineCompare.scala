package graft

/** Pre-validation of the BENCH-vs-BASELINE contract: for every oracled
  * query whose SQL text vanilla spark.sql can parse, time the engine's
  * DataFrame implementation against spark.sql of the same text on the same
  * data. Prints one line per comparable query: name, engine sec, baseline
  * sec, ratio. Run: Test/runMain graft.BaselineCompare [sfDir]
  *
  * Methodology (same as Bench, for the same reason): each side is run
  * once untimed to absorb first-run Janino/whole-stage-codegen compile
  * and JIT warmup, then timed three times and the MEDIAN reported.
  * Single first-run samples systematically penalize whichever plan
  * generates more code (typed Dataset pipelines compile encoder
  * deserializers the SQL side doesn't) and fabricate ±3× noise flips on
  * this box (ENGINE.md); profiled on qc1 at sf0.1: first run engine
  * 1.20s vs steady-state 0.25s — the plan didn't change, the JIT did.
  *
  * A second comma-separated-names argument restricts the comparison to
  * those queries (fast targeted ratio checks while iterating).
  */
object BaselineCompare {

  /** Loaded ratios above this trigger an AUTOMATIC same-session solo
    * re-measure (the round-16 protocol rule, from VERDICT r15: the
    * greedy-CEP class's sub-0.5s spark.sql baselines swing with JIT
    * heat — qc34 read 1.95× loaded vs 1.09× solo in the SAME session,
    * and the loaded band's ceiling drifted up three rounds straight
    * while the engine side stood still; the ratio protocol, not the
    * engine, was the fragile part). The re-measure runs at the END of
    * the sweep with fresh per-side warmups and a fresh median-of-3;
    * BOTH readings print (`CMP` and `CMP-SOLO`) and both are recorded
    * at round close — a loaded breach whose solo reading is at parity
    * is band noise, not a regression.
    *
    * The in-session solo is NOT the final word (VERDICT r17 #2): it
    * still inherits a JIT-hot baseline DENOMINATOR from the full
    * sweep — r17's qc39 read 2.11× loaded and 1.78× "solo" in the
    * same session (baseline 0.37s, heated by 104 prior queries), but
    * a FRESH-SESSION targeted run read 1.08× (baseline 0.69s) with
    * the engine side identical (0.67–0.75s) across all three
    * readings; only the sub-second denominator moved. So whenever
    * CMP-SOLO fires, the run prints a `CMP-FRESH` directive naming
    * the exact targeted command (`Test/runMain graft.BaselineCompare
    * <sfDir> <names>` — a fresh JVM, the adjudicating reading), and
    * the close protocol records all three: loaded, in-session solo,
    * fresh. */
  val SoloRetryRatio = 1.8
  /** Extra untimed warmups per side for the solo re-measure (the
    * baseline side of a sub-0.5s query needs more than one run before
    * the JIT stops moving the denominator). */
  val SoloWarmups = 2

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(8)
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach(n =>
      Engine.table(spark, sfDir, n).createOrReplaceTempView(n))
    // warmup
    SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    def median3(f: => Unit): Double = {
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      samples.sorted.apply(1)
    }
    val only: Option[Set[String]] =
      args.drop(1).headOption.map(_.split(",").map(_.trim).toSet)
    var engTotal = 0.0; var baseTotal = 0.0
    val measured = Seq.newBuilder[(String, String, Double, Double)]
    SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .filter(kv => only.forall(_.contains(kv._1)))
      .foreach { case (name, sql) =>
      val parsed = try { spark.sql(sql); true }
      catch { case _: Throwable => false }
      if (parsed) {
        try {
          // one untimed run per side: compile + JIT, not plan execution
          spark.sql(sql).count()
          SparkEntry.queries(name)(spark, sfDir).count()
          val b = median3(spark.sql(sql).count())
          val e = median3(SparkEntry.queries(name)(spark, sfDir).count())
          engTotal += e; baseTotal += b
          measured += ((name, sql, e, b))
          println(f"CMP $name%-28s engine=$e%7.2fs baseline=$b%7.2fs ratio=${e / b}%5.2f")
        } catch { case ex: Throwable =>
          println(s"CMP $name RUN-FAIL ${ex.getMessage.take(80)}")
        }
        // query-scoped caches end with the query (the Bench posture):
        // a query's own warm+timed runs share its caches, but caches
        // never accumulate across the sweep — see QueryModule's cache
        // contract
        spark.catalog.clearCache()
      }
    }
    println(f"CMP TOTAL engine=$engTotal%.2f baseline=$baseTotal%.2f ratio=${engTotal / baseTotal}%.2f")

    // The >SoloRetryRatio rule: re-measure every breaching query solo,
    // in this same session, and print both readings.
    val hot = measured.result().filter { case (_, _, e, b) =>
      b > 0 && e / b > SoloRetryRatio }
    hot.foreach { case (name, sql, le, lb) =>
      try {
        (1 to SoloWarmups).foreach { _ =>
          spark.sql(sql).count()
          SparkEntry.queries(name)(spark, sfDir).count()
        }
        val b = median3(spark.sql(sql).count())
        val e = median3(SparkEntry.queries(name)(spark, sfDir).count())
        println(f"CMP-SOLO $name%-23s engine=$e%7.2fs baseline=$b%7.2fs " +
          f"ratio=${e / b}%5.2f (loaded was ${le / lb}%5.2f)")
      } catch { case ex: Throwable =>
        println(s"CMP-SOLO $name RUN-FAIL ${ex.getMessage.take(80)}")
      }
      spark.catalog.clearCache()
    }
    if (hot.isEmpty)
      println(f"CMP-SOLO none (no loaded ratio over $SoloRetryRatio%.1f)")
    else {
      // the adjudicating reading runs in a FRESH JVM (see scaladoc:
      // the in-session solo's denominator is still sweep-heated)
      val names = hot.map(_._1).mkString(",")
      println("CMP-FRESH rerun required to adjudicate: " +
        s"""sbt -batch "Test/runMain graft.BaselineCompare $sfDir $names"""")
    }
    spark.stop()
  }
}
