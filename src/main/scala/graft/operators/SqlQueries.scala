package graft.operators

import graft.{Q, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL front-end surface (reference: TableEnvironment.sqlQuery,
  * TableEnvironment.scala:646 — SQL parsed by Calcite ↔ here parsed by
  * Catalyst's ANSI parser). Each query is ONE SQL text executed verbatim by
  * both engines: `spark.sql` over temp views of the parquet tables, and
  * DuckDB as the oracle — the strongest possible dialect-parity statement.
  *
  * Covers: multi-join + agg + order/limit (TPC-H Q3 shape), IN +
  * correlated-EXISTS subqueries (SubQueryRemoveRule/decorrelation parity),
  * HAVING with a scalar subquery, and CTE + window function — all of which
  * Catalyst plans via RewritePredicateSubquery/DecorrelateInnerQuery with
  * no custom rules (SURVEY.md §4.1).
  */
object SqlQueries extends QueryModule {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem")

  // Register the views once per session *for the current dir*: repeated
  // registration re-lists the parquet files and dominates sub-second
  // queries, but temp views are session-global — memoizing per (session,
  // dir) would let a dir switch leave stale views behind. Tracking the
  // last-registered dir re-registers exactly when the dir changes.
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  private def sqlBoth(name: String, text: String): Q =
    Q(name, Some(text)) { (s: SparkSession, d: String) =>
      registered.keySet.removeIf(_.sparkContext.isStopped)
      registered.compute(s, (_, prev) => {
        if (prev != d) tables.foreach(n => t(s, d, n).createOrReplaceTempView(n))
        d
      })
      s.sql(text)
    }

  def all: Seq[Q] = Seq(

    sqlBoth("qsql1_shipping_priority",
      """SELECT l_orderkey,
        |  CAST(SUM(CAST((l_extendedprice * (1.0 - l_discount)) AS DECIMAL(30,8))) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin),

    sqlBoth("qsql2_subqueries",
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderkey IN
        |    (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45.0)
        |  AND EXISTS
        |    (SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_acctbal > 0.0)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin),

    sqlBoth("qsql3_having_scalar_subquery",
      """SELECT c_nationkey, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS DOUBLE) AS total_bal
        |FROM customer
        |GROUP BY c_nationkey
        |HAVING COUNT(*) > (SELECT COUNT(*) FROM customer) / 50.0
        |ORDER BY c_nationkey""".stripMargin),

    sqlBoth("qsql4_cte_window",
      """WITH ranked AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice
        |FROM ranked WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin),

    sqlBoth("qsql6_correlated_scalar",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT avg(o2.o_totalprice) FROM orders o2
        |  WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin),

    sqlBoth("qsql5_case_agg_filter",
      """SELECT l_returnflag,
        |  COUNT(CASE WHEN l_quantity >= 25.0 THEN 1 END) AS n_big,
        |  COUNT(CASE WHEN l_quantity < 25.0 THEN 1 END) AS n_small,
        |  CAST(SUM(CAST(CASE WHEN l_discount > 0.05
        |       THEN l_extendedprice ELSE 0.0 END AS DECIMAL(30,8))) AS DOUBLE) AS discounted_rev
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  )
}
