package graft.operators

import graft.{Engine, SparkSuite}
import org.apache.spark.sql.functions._

/** Scale-pattern conformance: join hints (reference JoinHint,
  * DataSet.java:751-820), bucketed co-located joins (no shuffle), and
  * salting equivalence. */
class ScaleSpec extends SparkSuite {
  import spark.implicits._

  test("join hints select the requested physical strategy") {
    val li = Engine.table(spark, sf, "lineitem")
    val o = Engine.table(spark, sf, "orders")
    val merged = li.hint("merge")
      .join(o.hint("merge"), $"l_orderkey" === $"o_orderkey")
    assert(merged.queryExecution.executedPlan.toString
      .contains("SortMergeJoin"))
    val shuffled = li.hint("shuffle_hash")
      .join(o.hint("shuffle_hash"), $"l_orderkey" === $"o_orderkey")
    assert(shuffled.queryExecution.executedPlan.toString
      .contains("ShuffledHashJoin"))
    val bcast = li.join(broadcast(o), $"l_orderkey" === $"o_orderkey")
    assert(bcast.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    // all strategies agree on the result cardinality
    assert(merged.count() == bcast.count())
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Engine.table(spark, sf, "orders")
        .write.mode("overwrite")
        .option("path", s"$wh/orders_b")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      Engine.table(spark, sf, "lineitem")
        .write.mode("overwrite")
        .option("path", s"$wh/lineitem_b")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: no Exchange feeding the join
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"))
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      prev.foreach(v => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
      if (prev.isEmpty)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("salted aggregation equals plain aggregation") {
    val li = Engine.table(spark, sf, "lineitem")
    val salted = SkewOps.saltedSumCount(li, Seq("l_returnflag"), "l_quantity")
      .orderBy($"l_returnflag")
      .as[(String, Double, Long)].collect().toSeq
    val plain = li.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("s"), count(lit(1)).as("c"))
      .orderBy($"l_returnflag")
      .as[(String, Double, Long)].collect().toSeq
    salted.zip(plain).foreach { case ((k1, s1, c1), (k2, s2, c2)) =>
      assert(k1 == k2 && c1 == c2 && math.abs(s1 - s2) < 1e-6)
    }
  }

  test("salted join equals plain join") {
    val li = Engine.table(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_quantity")
    val o = Engine.table(spark, sf, "orders")
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    val plain = li.join(o, Seq("l_orderkey")).count()
    val salted = SkewOps.saltedJoin(li, o, Seq("l_orderkey")).count()
    assert(salted == plain)
  }
}
