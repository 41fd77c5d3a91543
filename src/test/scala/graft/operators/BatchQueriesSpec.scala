package graft.operators

import graft.{Engine, SparkSuite}
import org.apache.spark.sql.functions._

/** Invariant tests over sf0.001 (the DuckDB hash-compare at sf0.01 is the
  * external gate; these are fast structural checks that catch regressions
  * locally per operator). */
class BatchQueriesSpec extends SparkSuite {
  import spark.implicits._

  test("q1 pricing summary: groups cover flag×status, counts add up") {
    val got = run("q1_pricing_summary").collect()
    assert(got.nonEmpty)
    val li = Engine.table(spark, sf, "lineitem")
      .where($"l_shipdate" <= lit("1998-09-02 00:00:00").cast("timestamp"))
    assert(got.map(_.getAs[Long]("count_order")).sum == li.count())
  }

  test("semi + anti join partition the customer table") {
    val semi = run("q12_semi_join").count()
    val anti = run("q13_anti_join").count()
    val all = Engine.table(spark, sf, "customer").count()
    assert(semi + anti == all)
  }

  test("left join keeps all customers; full join covers all nationkeys") {
    assert(run("q10_left_join").count() ==
      Engine.table(spark, sf, "customer").count())
    val nk = run("q11_full_join").select("nationkey").as[Int].collect().toSet
    val cn = Engine.table(spark, sf, "customer").select($"c_nationkey")
      .as[Int].collect().toSet
    val sn = Engine.table(spark, sf, "supplier").select($"s_nationkey")
      .as[Int].collect().toSet
    assert(nk == (cn ++ sn))
  }

  test("rollup emits detail + subtotal + grand-total levels") {
    val got = run("q6_rollup").collect()
    val gids = got.map(_.getAs[Long]("gid")).toSet
    assert(gids == Set(0L, 1L, 3L))
    val grand = got.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_rows") ==
      Engine.table(spark, sf, "lineitem").count())
  }

  test("set ops: intersect ∪ except == distinct left side") {
    val inter = run("q23_intersect").as[Int].collect().toSet
    val exc = run("q24_except").as[Int].collect().toSet
    val cust = Engine.table(spark, sf, "customer")
      .select($"c_nationkey").distinct().as[Int].collect().toSet
    assert((inter ++ exc) == cust && (inter & exc).isEmpty)
  }

  test("sort/limit/offset returns rows 11-30 of the total order") {
    val page = run("q21_sort_limit_offset").collect()
    assert(page.length == 20)
    val all = Engine.table(spark, sf, "orders")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .select($"o_orderkey").as[Long].collect()
    assert(page.map(_.getAs[Long]("o_orderkey")).toSeq ==
      all.slice(10, 30).toSeq)
  }

  test("topk matches full-sort head") {
    val k = run("q22_topk").select("l_orderkey").as[Long].collect().toSeq
    val full = Engine.table(spark, sf, "lineitem")
      .orderBy($"l_extendedprice".desc, $"l_orderkey")
      .select($"l_orderkey").limit(10).as[Long].collect().toSeq
    assert(k == full)
  }

  test("scalar subquery: counts rows strictly above global mean") {
    val li = Engine.table(spark, sf, "lineitem")
    val mean = li.agg(avg($"l_quantity")).as[Double].head()
    val expected = li.where($"l_quantity" > mean).count()
    val got = run("q16_scalar_subquery")
      .agg(sum($"n_above")).as[Long].head()
    assert(got == expected)
  }

  test("argmax picks the highest-price order per priority") {
    val got = run("q5_argmax").collect()
    got.foreach { r =>
      val prio = r.getAs[String]("o_orderpriority")
      val top = r.getAs[Long]("top_order")
      val best = Engine.table(spark, sf, "orders")
        .where($"o_orderpriority" === prio)
        .orderBy($"o_totalprice".desc, $"o_orderkey".desc)
        .select($"o_orderkey").as[Long].head()
      assert(top == best)
    }
  }
}
