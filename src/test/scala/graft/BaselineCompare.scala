package graft

/** Pre-validation of the BENCH-vs-BASELINE contract: for every oracled
  * query whose SQL text vanilla spark.sql can parse, time the engine's
  * DataFrame implementation against spark.sql of the same text on the same
  * data. Prints one line per comparable query: name, engine sec, baseline
  * sec, ratio. Run: Test/runMain graft.BaselineCompare [sfDir]
  */
object BaselineCompare {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(8)
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach(n =>
      Engine.table(spark, sfDir, n).createOrReplaceTempView(n))
    // warmup
    SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    var engTotal = 0.0; var baseTotal = 0.0
    SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (name, sql) =>
      val parsed = try { spark.sql(sql); true }
      catch { case _: Throwable => false }
      if (parsed) {
        try {
          val b = time(spark.sql(sql).count())
          val e = time(SparkEntry.queries(name)(spark, sfDir).count())
          engTotal += e; baseTotal += b
          println(f"CMP $name%-28s engine=$e%7.2fs baseline=$b%7.2fs ratio=${e / b}%5.2f")
        } catch { case ex: Throwable =>
          println(s"CMP $name RUN-FAIL ${ex.getMessage.take(80)}")
        }
      }
    }
    println(f"CMP TOTAL engine=$engTotal%.2f baseline=$baseTotal%.2f ratio=${engTotal / baseTotal}%.2f")
    spark.stop()
  }
}
