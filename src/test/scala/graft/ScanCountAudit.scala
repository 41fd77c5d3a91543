package graft

/** Recompute-waste sweep: for EVERY SparkEntry query, count parquet
  * scans per table in the executed plan alongside InMemoryRelation /
  * ReusedExchange / ReusedSubquery occurrences. A query scanning the
  * same table 3+ times with no cache and no reuse is a recompute
  * suspect (the qg9/qg10 class found in r18). Measurement only.
  * Run: Test/runMain graft.ScanCountAudit [sfDir]
  */
object ScanCountAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = Engine.session(8)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(s, sfDir).queryExecution.executedPlan.toString
        val scans = "file:[^\\]\\n]*?([a-z_]+)\\.parquet".r
          .findAllMatchIn(p).map(_.group(1)).toSeq
          .groupBy(identity).map { case (t, xs) => (t, xs.size) }
        val hot = scans.filter(_._2 >= 3)
        val imr = p.linesIterator.count(_.contains("InMemoryRelation"))
        val reuse = p.linesIterator.count(l =>
          l.contains("ReusedExchange") || l.contains("ReusedSubquery"))
        if (hot.nonEmpty)
          println(s"[scan-audit] $name scans=${scans.toSeq.sortBy(-_._2)
            .map { case (t, c) => s"$t:$c" }.mkString(",")} " +
            s"imr=$imr reuse=$reuse")
      } catch { case e: Throwable =>
        println(s"[scan-audit] $name PLAN-FAIL ${e.getClass.getSimpleName}")
      }
      s.catalog.clearCache()
    }
    s.stop()
  }
}
