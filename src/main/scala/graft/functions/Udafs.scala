package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** User-defined aggregate surface (SURVEY.md §2.10): the reference's
  * `AggregateFunction[T, ACC]` contract (AggregateFunction.scala:97 —
  * createAccumulator/accumulate/merge/getValue) maps to
  * `org.apache.spark.sql.expressions.Aggregator[IN, BUF, OUT]`. The
  * `retract` method has no Spark analog and is not needed: Structured
  * Streaming recomputes incremental state per key instead of retracting
  * emitted rows.
  *
  * [[MultisetAgg]] reproduces the reference's COLLECT multiset aggregate
  * (CollectAggFunction.scala — SQL COLLECT returns MULTISET, backed by a
  * value→count map). [[WeightedAvgAgg]] is the reference documentation's
  * canonical UDAGG example.
  */
object Udafs {

  /** SQL COLLECT: multiset of ints as a value→count map. */
  class MultisetAgg extends Aggregator[Int, Map[Int, Int], Map[Int, Int]] {
    def zero: Map[Int, Int] = Map.empty
    def reduce(b: Map[Int, Int], a: Int): Map[Int, Int] =
      b.updated(a, b.getOrElse(a, 0) + 1)
    def merge(x: Map[Int, Int], y: Map[Int, Int]): Map[Int, Int] =
      y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0) + v) }
    def finish(b: Map[Int, Int]): Map[Int, Int] = b
    def bufferEncoder: Encoder[Map[Int, Int]] = Encoders.kryo[Map[Int, Int]]
    def outputEncoder: Encoder[Map[Int, Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  case class WeightedIn(value: Double, weight: Double)
  case class WeightedBuf(sum: Double, wsum: Double)

  /** Weighted average — the UDAGG example from the reference docs. */
  class WeightedAvgAgg extends Aggregator[WeightedIn, WeightedBuf, Double] {
    def zero: WeightedBuf = WeightedBuf(0.0, 0.0)
    def reduce(b: WeightedBuf, a: WeightedIn): WeightedBuf =
      WeightedBuf(b.sum + a.value * a.weight, b.wsum + a.weight)
    def merge(x: WeightedBuf, y: WeightedBuf): WeightedBuf =
      WeightedBuf(x.sum + y.sum, x.wsum + y.wsum)
    def finish(b: WeightedBuf): Double =
      if (b.wsum == 0.0) 0.0 else b.sum / b.wsum
    def bufferEncoder: Encoder[WeightedBuf] = Encoders.product[WeightedBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Register both as SQL-callable UDAFs (TableEnvironment.registerFunction
    * equivalent). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_multiset", udaf(new MultisetAgg))
    spark.udf.register("graft_weighted_avg",
      udaf(new WeightedAvgAgg, Encoders.product[WeightedIn]))
  }
}
