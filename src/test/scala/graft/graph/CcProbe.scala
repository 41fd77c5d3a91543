package graft.graph

import org.apache.spark.sql.functions._

/** Ad-hoc probe: phase timing of connected components at a given SF.
  * Test/runMain graft.graph.CcProbe [sfDir] */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Engine.session(8)
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val edges = GraphQueries.tradeEdges(spark, sfDir)
    time("edges.count")(println("edges=" + edges.count()))
    val cached = time("edges.cache")(edges.cache())
    time("edges.count cached")(cached.count())
    time("cc-on-cached") {
      val cc = GraphOps.connectedComponents(cached)
      println("vertices=" + cc.count())
    }
    time("cc-again") {
      val cc = GraphOps.connectedComponents(cached)
      println("vertices=" + cc.count())
    }
    spark.stop()
  }
}
