package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-phase timing of the connectedComponents loop internals (replica of
  * GraphOps.connectedComponents with stopwatches — kept in sync with the
  * CURRENT optimized shape: edgesDistinct skip, src-partitioned cache,
  * label seed via self-edge filter). Measurement only.
  * Run: Test/runMain graft.CcRoundProbe [sfDir] [cpus]
  */
object CcRoundProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    val s = Engine.session(cpus)
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.out.println(f"[cc-round] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm
    graft.graph.GraphQueries.all.find(_.name == "qg1_connected_components")
      .get.run(s, "/root/testdata/sf0.001").count()
    s.catalog.clearCache()

    val edges = graft.graph.GraphQueries.tradeEdges(s, sfDir)
    // current shape: entry materialization of the edge pipeline, then
    // edgesDistinct=true — no distinct, just the reversal
    val e0 = timed("edge pipeline localCheckpoint") {
      edges.select(col("src").cast("long"), col("dst").cast("long"))
        .localCheckpoint(eager = true)
    }
    val und = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst"))
    val selfed = timed("selfed cache (edges build + repartition + cache)") {
      val sf = und.unionAll(
        und.select(col("src")).distinct()
          .select(col("src"), col("src").as("dst")))
        .repartition(col("src"))
        .cache()
      sf.count(); sf
    }
    var labels = timed("labels seed (self-edge filter)") {
      val l = selfed.where(col("src") === col("dst"))
        .select(col("src").as("id"), col("src").as("comp"))
      l.count(); l
    }
    var prevSum: java.math.BigDecimal = null
    var done = false
    var i = 0
    while (!done && i < 50) {
      i += 1
      val nbr = selfed.join(labels, selfed("src") === labels("id"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("comp")).as("comp"))
      val ptr = nbr.select(col("id").as("pid"), col("comp").as("pcomp"))
      val r = nbr.join(ptr, nbr("comp") === col("pid"), "left")
        .select(nbr("id"),
          least(nbr("comp"), coalesce(col("pcomp"), nbr("comp"))).as("comp"))
      val next = timed(s"round $i localCheckpoint") {
        r.localCheckpoint(eager = true)
      }
      val sum0 = timed(s"round $i convergence agg") {
        next.agg(sum(col("comp").cast(DecimalType(38, 0)))).first()
          .getDecimal(0)
      }
      done = sum0 == null || (prevSum != null && prevSum.compareTo(sum0) == 0)
      prevSum = sum0
      labels = next
    }
    System.out.println(s"[cc-round] rounds=$i")
    timed("final orderBy+count") {
      labels.select(col("id"), col("comp")).orderBy(col("id")).count()
    }
    selfed.unpersist()
    s.stop()
  }
}
