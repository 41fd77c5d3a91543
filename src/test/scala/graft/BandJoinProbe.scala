package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B probe for the LSH band self-join shape shared by qp4/qp5/qp7/qp8:
  *  A) bands.cache() + self-join            (shipped shape)
  *  B) uncached self-join                   (ReusedExchange dedup)
  *  C) bands.repartition(band, bv).cache()  (join-key-partitioned cache)
  * Each variant runs the qp4 pair pipeline to completion (count), cache
  * cleared between samples. Measurement only.
  * Run: Test/runMain graft.pipeline.BandJoinProbe [sfDir] [cpus] [n]
  */
object BandJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val s = graft.Engine.session(cpus)
    graft.functions.GraftFunctions.register(s)

    def bands(): DataFrame = {
      val docs = graft.Engine.table(s, sfDir, "documents")
      DedupQueries.bandsOf(DedupQueries.withShingles(docs))
    }
    def pairs(b: DataFrame): DataFrame =
      b.as("x").join(b.as("y"),
          col("x.band") === col("y.band") && col("x.bv") === col("y.bv")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
        .orderBy(col("doc_a"), col("doc_b"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("A cache", () => pairs(bands().cache())),
      ("B uncached", () => pairs(bands())),
      ("C repart+cache", () => pairs(
        bands().repartition(col("band"), col("bv")).cache())))

    // warm each shape once at the smallest sf
    variants.foreach { case (_, f) => f().count(); s.catalog.clearCache() }
    variants.foreach { case (label, f) =>
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        f().count()
        val dt = (System.nanoTime() - t0) / 1e9
        s.catalog.clearCache()
        dt
      }
      println(f"[band-join] $label median=${ts.sorted.apply(ts.size / 2)}%.3f" +
        f" min=${ts.min}%.3f samples=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    s.stop()
  }
}
