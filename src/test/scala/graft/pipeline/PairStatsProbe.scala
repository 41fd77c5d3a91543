package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B probe for qp5's verify stage:
  *  A) shipped: inverted-index join (shd.a ⋈ shd.b on shingle surrogate)
  *  B) array_intersect: per-pair set intersection on the dsets arrays
  * Both run the full qp5 pipeline (window + top-5) to completion.
  * Run: Test/runMain graft.pipeline.PairStatsProbe [sfDir] [cpus] [n]
  */
object PairStatsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val s = graft.Engine.session(cpus)
    graft.functions.GraftFunctions.register(s)

    def stage(useArrays: Boolean): DataFrame = {
      val docs = DedupQueries.withShingles(graft.Engine.table(s, sfDir, "documents"))
        .select(col("doc_id"), col("lang"), col("sh")).cache()
      val bands = DedupQueries.bandsOf(docs, Seq(col("lang"))).cache()
      val cand = bands.as("x")
        .join(bands.as("y"),
          col("x.lang") === col("y.lang") && col("x.band") === col("y.band")
            && col("x.bv") === col("y.bv") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.lang").as("lang"), col("x.doc_id").as("doc_a"),
          col("y.doc_id").as("doc_b"))
        .distinct()
      val dsets = docs.select(col("doc_id"),
          array_distinct(expr(
            "transform(sh, x -> unhex(substr(md5(x), 1, 16)))")).as("ds"))
        .cache()
      val pstats =
        if (useArrays) {
          cand
            .join(dsets.select(col("doc_id").as("doc_a"), col("ds").as("da")),
              "doc_a")
            .join(dsets.select(col("doc_id").as("doc_b"), col("ds").as("db")),
              "doc_b")
            .select(col("lang"), col("doc_a"), col("doc_b"),
              size(array_intersect(col("da"), col("db"))).cast("long").as("ni"),
              size(col("da")).cast("long").as("na"),
              size(col("db")).cast("long").as("nb"))
            .where(col("ni") > 0)
        } else {
          val shd = dsets.select(col("doc_id"), explode(col("ds")).as("s"))
          val cnt = dsets.select(col("doc_id"), size(col("ds")).cast("long").as("n"))
          cand
            .join(shd.as("a"), col("doc_a") === col("a.doc_id"))
            .join(shd.as("b"),
              col("doc_b") === col("b.doc_id") && col("a.s") === col("b.s"))
            .groupBy(col("lang"), col("doc_a"), col("doc_b"))
            .agg(count(lit(1)).as("ni"))
            .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
            .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
            .select(col("lang"), col("doc_a"), col("doc_b"), col("ni"),
              col("ca.n").as("na"), col("cb.n").as("nb"))
        }
      val jac = pstats.select(col("lang"), col("doc_a"), col("doc_b"),
        (col("ni").cast("double")
          / (col("na") + col("nb") - col("ni"))).as("jaccard"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      jac.withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 5)
        .orderBy(col("lang"), col("rnk"))
    }

    // result parity check first (same rows, both orders)
    val a = stage(useArrays = false).collect().toSeq
    s.catalog.clearCache()
    val b = stage(useArrays = true).collect().toSeq
    s.catalog.clearCache()
    println(s"[pairstats] parity=${a == b} rowsA=${a.size} rowsB=${b.size}")

    for ((label, ua) <- Seq(("A inverted", false), ("B arrays", true))) {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        stage(ua).count()
        val dt = (System.nanoTime() - t0) / 1e9
        s.catalog.clearCache()
        dt
      }
      println(f"[pairstats] $label median=${ts.sorted.apply(ts.size / 2)}%.3f" +
        f" min=${ts.min}%.3f samples=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    s.stop()
  }
}
