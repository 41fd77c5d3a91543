package graft

/** Print a query's executed physical plan — the inspection step behind
  * every PlanAudit fact (write the assertion against what the planner
  * actually emits, not what it plausibly might).
  * Run: Test/runMain graft.PlanDump name [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val s = Engine.session(8)
    println(SparkEntry.queries(name)(s, d).queryExecution.executedPlan.toString)
    s.stop()
  }
}
