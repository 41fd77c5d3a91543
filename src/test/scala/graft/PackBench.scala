package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the claim behind qp17's distributed two-phase prefix sum: at
  * corpus scale, a single-partition `Window.orderBy` global running sum
  * serializes the whole corpus through one task, while the bucket-
  * partitioned two-phase form keeps every stage parallel. 20M synthetic
  * (id, n_tok) rows (the SkewBench posture: sized so the difference is
  * structural, not noise). Run: Test/runMain graft.PackBench
  */
object PackBench {
  def main(args: Array[String]): Unit = {
    val s = Engine.session(8)
    import s.implicits._
    val n = 20000000L
    val docs = s.range(n)
      .select(col("id"),
        (pmod(col("id") * 2654435761L, lit(97L)) + 5L).as("n_tok"),
        md5(concat(lit("pack|"), col("id").cast("string"))).as("h"))
      .localCheckpoint()

    def time(label: String)(f: => Long): Long = {
      f // warm
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s median ${samples.sorted.apply(1)}%.2fs")
      0L
    }

    // naive: one global ordered window = one task sorts and scans 20M rows
    time("global-window prefix sum") {
      docs.withColumn("off",
          sum("n_tok").over(Window.orderBy("h", "id")
            .rowsBetween(Window.unboundedPreceding, -1)))
        .agg(max("off")).collect()(0).getLong(0)
    }
    // two-phase: bucket-partitioned window + 256-row bases + broadcast
    time("two-phase prefix sum") {
      val bucketed = docs.withColumn("pid", substring(col("h"), 1, 2))
      val wLocal = Window.partitionBy("pid").orderBy("h", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val local = bucketed.withColumn("le", sum("n_tok").over(wLocal))
      val bases = local.groupBy("pid").agg(sum("n_tok").as("pt"))
        .withColumn("base", coalesce(sum("pt").over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("pid", "base")
      local.join(broadcast(bases), Seq("pid"))
        .select((col("base") + col("le") - col("n_tok")).as("off"))
        .agg(max("off")).collect()(0).getLong(0)
    }
    s.stop()
  }
}
