package graft.graph

import graft.{Q, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph queries over the customer–supplier trade graph: vertices are
  * customers (id = 2k) and suppliers (id = 2k+1); an undirected edge links
  * a customer to a supplier they bought ≥ 4 line items from. The DuckDB
  * oracles compute the same answers via recursive CTEs (transitive
  * closure), which is feasible at oracle scale and independent of the
  * iterative DataFrame implementation being checked.
  */
object GraphQueries extends QueryModule {

  private val Threshold = 4

  private val duckEdges =
    s"""edges0 AS (
       |  SELECT c.c_custkey * 2 AS src, su.s_suppkey * 2 + 1 AS dst
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier su ON l.l_suppkey = su.s_suppkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $Threshold),
       |edges AS (SELECT src, dst FROM edges0 UNION SELECT dst, src FROM edges0)""".stripMargin

  /** Edge list (src, dst) as longs — built with three shuffle joins and a
    * count filter; at scale AQE handles the join sizing. */
  private[graft] def tradeEdges(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_custkey"), col("s_suppkey"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= Threshold)
      .select((col("c_custkey") * 2).cast("long").as("src"),
        (col("s_suppkey") * 2 + 1).cast("long").as("dst"))

  def all: Seq[Q] = Seq(

    // Connected components by min-label propagation
    // (reference: flink-gelly library/ConnectedComponents.java).
    q("qg1_connected_components",
      s"""WITH RECURSIVE $duckEdges,
         |verts AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r)
         |SELECT CAST(id AS BIGINT) AS id, CAST(MIN(r) AS BIGINT) AS comp
         |FROM reach GROUP BY id ORDER BY id""".stripMargin) { (s, d) =>
      GraphOps.connectedComponents(s, tradeEdges(s, d))
        .select(col("id"), col("comp"))
        .orderBy(col("id"))
    },

    // Single-source shortest hop counts from the smallest vertex id
    // (reference: library/SingleSourceShortestPaths.java).
    q("qg2_sssp",
      s"""WITH RECURSIVE $duckEdges,
         |paths(id, dist) AS (
         |  SELECT (SELECT MIN(src) FROM edges), 0
         |  UNION
         |  SELECT e.dst, p.dist + 1 FROM paths p
         |    JOIN edges e ON e.src = p.id WHERE p.dist < 30)
         |SELECT CAST(id AS BIGINT) AS id, CAST(MIN(dist) AS DOUBLE) AS dist
         |FROM paths GROUP BY id ORDER BY id""".stripMargin) { (s, d) =>
      val edges = tradeEdges(s, d)
      // smallest vertex id overall (the oracle's MIN(src) ranges over the
      // undirected edge list, i.e. all endpoints)
      val source = edges.agg(least(min(col("src")), min(col("dst"))))
        .first().getLong(0)
      GraphOps.sssp(s, edges, source)
        .select(col("id"), col("dist"))
        .orderBy(col("id"))
    },

    // PageRank (10 iterations, damping 0.85) — no SQL oracle (iterative
    // float fixpoint); GraphSpec checks rank-sum and hub ordering.
    qNoOracle("qg3_pagerank") { (s, d) =>
      GraphOps.pageRank(s, tradeEdges(s, d))
        .select(col("id"), round(col("rank"), 6).as("rank"))
        .orderBy(col("id"))
    }
  )
}
