package graft

/** Ad-hoc plan/latency probe for one query: node counts + warm
  * median-of-3 wall time. Run:
  *   Test/runMain graft.PlanPeek <queryName> [sfDir]
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_pricing_summary")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val s = Engine.session(8)
    def q() = SparkEntry.queries(name)(s, sfDir)
    val p = q().queryExecution.executedPlan.toString
    println(p)
    println("SORTS=" + p.linesIterator.count(_.contains("Sort [")))
    println("EXCH=" + p.linesIterator.count(_.contains("Exchange hashpartitioning")))
    println("WINDOWS=" + p.linesIterator.count(_.trim.startsWith("Window")))
    q().count() // warm: codegen + JIT
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); q().count(); (System.nanoTime() - t0) / 1e9
    }
    println(f"$name median=${ts.sorted.apply(1)}%.3f min=${ts.min}%.3f")
    s.stop()
  }
}
