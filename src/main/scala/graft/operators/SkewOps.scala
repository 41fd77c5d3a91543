package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling building blocks (SURVEY scale mandate): AQE's skew-join
  * splitting covers sort-merge joins automatically; these helpers cover the
  * cases AQE doesn't — skewed aggregation keys and broadcast-averse skewed
  * joins — with the classic salting construction.
  */
object SkewOps {

  /** Two-phase salted SUM/COUNT aggregation: partial aggregate on
    * (key, salt) spreads a hot key over `salts` reducers, final aggregate
    * merges the partials. Equivalent to groupBy(key).agg(sum/count) for
    * any input. */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    val keyRefs = keyCols.map(col)
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(keyRefs :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keyRefs: _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }

  /** Salted join of a skewed left side against a compact right side: left
    * rows get a random salt in [0, salts); the right side is replicated
    * `salts` times so every (key, salt) bucket finds its match. Equivalent
    * to `left.join(right, keys)` with the hot left keys spread across
    * `salts` tasks. Use when the right side is too large to broadcast but
    * small enough to replicate `salts`×. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int = 8): DataFrame = {
    val salted = left.withColumn("__salt",
      (rand(42) * salts).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
