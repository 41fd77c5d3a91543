package graft
object RouteProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(8)
    val sf = "/root/testdata/sf0.001"
    for (q <- Seq("qc38_mr_greedy_all_rows", "qc39_mr_greedy_exclusion",
        "qc14_match_recognize_all_rows", "qc19_match_recognize_exclusion")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      println(s"[route] $q planned=${plan.contains("GroupCep")} explode=${plan.contains("Generate")}")
    }
    spark.stop()
  }
}
