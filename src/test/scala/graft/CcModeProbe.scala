package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Eager-vs-lazy localCheckpoint A/B for the CC loop: runs the full
  * connectedComponents shape end-to-end N times per mode, interleaved,
  * in one session. Measurement only.
  * Run: Test/runMain graft.CcModeProbe [sfDir] [cpus] [n]
  */
object CcModeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    val n = args.lift(2).map(_.toInt).getOrElse(4)
    val s = Engine.session(cpus)

    def ccOnce(eagerCp: Boolean): Long = {
      val edges = graft.graph.GraphQueries.tradeEdges(s, sfDir)
      val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
        .localCheckpoint(eager = true)
      val und = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .where(col("src") =!= col("dst"))
      val selfed = und.unionAll(
          und.select(col("src")).distinct()
            .select(col("src"), col("src").as("dst")))
        .repartition(col("src")).cache()
      var labels = selfed.where(col("src") === col("dst"))
        .select(col("src").as("id"), col("src").as("comp"))
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
        val next = r.localCheckpoint(eager = eagerCp)
        val sum0 = next.agg(sum(col("comp").cast(DecimalType(38, 0)))).first()
          .getDecimal(0)
        done = sum0 == null || (prevSum != null && prevSum.compareTo(sum0) == 0)
        prevSum = sum0
        labels = next
      }
      val cnt = labels.select(col("id"), col("comp")).orderBy(col("id")).count()
      selfed.unpersist()
      s.catalog.clearCache()
      cnt
    }

    // warm both modes
    ccOnce(eagerCp = true); ccOnce(eagerCp = false)
    val eager = collection.mutable.ArrayBuffer[Double]()
    val lazy0 = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to n) {
      var t0 = System.nanoTime(); ccOnce(eagerCp = true)
      eager += (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); ccOnce(eagerCp = false)
      lazy0 += (System.nanoTime() - t0) / 1e9
    }
    def fmt(xs: Seq[Double]) =
      f"median=${xs.sorted.apply(xs.size / 2)}%.3f min=${xs.min}%.3f " +
        xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(s"[cc-mode] eager ${fmt(eager.toSeq)}")
    println(s"[cc-mode] lazy  ${fmt(lazy0.toSeq)}")
    s.stop()
  }
}
