package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class UdafSpec extends SparkSuite {
  import spark.implicits._

  test("multiset aggregator counts occurrences per key") {
    Udafs.register(spark)
    val got = Seq((1, 5), (1, 5), (1, 3), (2, 7)).toDF("k", "v")
      .groupBy($"k").agg(expr("graft_multiset(v)").as("ms"))
      .as[(Int, Map[Int, Int])].collect().toMap
    assert(got(1) == Map(5 -> 2, 3 -> 1))
    assert(got(2) == Map(7 -> 1))
  }

  test("weighted average aggregator (typed + SQL registration)") {
    Udafs.register(spark)
    val df = Seq((1.0, 1.0), (3.0, 3.0)).toDF("value", "weight")
    val got = df.agg(expr("graft_weighted_avg(value, weight)")).as[Double].head()
    assert(math.abs(got - 2.5) < 1e-12) // (1*1 + 3*3) / 4
  }

  test("scalar UDF registration surface (ScalarFunction parity)") {
    spark.udf.register("graft_double_it", (x: Long) => x * 2)
    val got = spark.sql("SELECT graft_double_it(21)").as[Long].head()
    assert(got == 42L)
  }

  test("UDTF surface: UDF returning array + explode (TableFunction parity)") {
    spark.udf.register("graft_split_words", (s: String) => s.split(" "))
    val got = Seq("a b c").toDF("s")
      .select(explode(expr("graft_split_words(s)")).as("w"))
      .as[String].collect().toSeq
    assert(got == Seq("a", "b", "c"))
  }
}
