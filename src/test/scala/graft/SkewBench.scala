package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 measurement (VERDICT #7): exercise SkewOps under a real zipf
  * skew and record where salting beats the naive plan — and where it
  * does NOT. Results are quoted in ENGINE.md ("Skew: measured").
  *
  * Scenarios (see doc):
  *   agg-plain / agg-salted   — groupBy sum/count vs saltedSumCount
  *   join-aqe / join-salted-aqe       — non-broadcastable join, AQE on
  *   join-noaqe / join-salted-noaqe   — same with AQE off (the straggler)
  * (hot key = 60% of a 20M-row fact)
  */
object SkewBench {
  private def time(label: String)(f: => Long): Double = {
    f // warm
    val samples = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val med = samples.sorted.apply(1)
    println(f"[skewbench] $label%-18s $med%.2fs")
    med
  }

  def main(args: Array[String]): Unit = {
    val s = Engine.session(8)
    import s.implicits._
    // zipf-ish fact: 60% of rows on key 0, the rest uniform over 100k keys
    val fact = s.range(20000000L)
      .select(
        when(rand(7) < 0.6, 0L).otherwise(pmod(col("id"), lit(100000L)))
          .as("k"),
        (col("id") % 1000).as("v"))
      .localCheckpoint() // freeze: both plans read identical data
    val dim = s.range(100000L)
      .select(col("id").as("k"), md5(col("id").cast("string")).as("payload"))
      .localCheckpoint()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle

    time("agg-plain") {
      fact.groupBy("k").agg(sum($"v"), count(lit(1))).count()
    }
    time("agg-salted") {
      operators.SkewOps.saltedSumCount(fact, Seq("k"), "v").count()
    }

    def joinPlain(): Long = fact.join(dim, Seq("k")).count()
    def joinSalted(): Long =
      operators.SkewOps.saltedJoin(fact, dim, Seq("k")).count()

    time("join-aqe")(joinPlain())
    time("join-salted-aqe")(joinSalted())
    s.conf.set("spark.sql.adaptive.enabled", "false")
    time("join-noaqe")(joinPlain())
    time("join-salted-noaqe")(joinSalted())
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    s.stop()
  }
}
