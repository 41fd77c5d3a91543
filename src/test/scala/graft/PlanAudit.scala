package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val s = Engine.session(8)
    val d = "/root/testdata/sf0.01"
    def plan(name: String): String = {
      val p = SparkEntry.queries(name)(s, d).queryExecution.executedPlan.toString
      println(s"===== $name =====")
      println(p.linesIterator.take(45).mkString("\n")); p
    }
    val q1 = plan("q1_pricing_summary")
    println("q1 pushed filter: " + q1.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    val q9 = plan("q9_revenue_by_nation")
    println("q9 broadcast: " + q9.contains("BroadcastHashJoin"))
    val q22 = plan("q22_topk")
    println("q22 takeOrdered: " + q22.contains("TakeOrderedAndProject"))
    val qe2 = SparkEntry.queries("qe2_knn_brute")(s, d).queryExecution.executedPlan.toString
    println("qe2 broadcast NLJ: " + qe2.contains("BroadcastNestedLoopJoin"))
    println("qe2 whole plan joins: " + qe2.linesIterator.filter(_.contains("Join")).mkString(" | "))
    s.stop()
  }
}
