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

  /** The qualifying (cust, supp) pair CTE — the ONE 4-table join +
    * count-threshold text every oracle edge projection derives from
    * (the DuckDB twin of [[qualifyingPairs]]; review r16: duckEdges,
    * duckCo, duckDirectedEdges and four inline copies each carried
    * their own verbatim copy of this join). */
  private val duckTe =
    s"""te AS (
       |  SELECT c.c_custkey AS cust, su.s_suppkey AS supp
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier su ON l.l_suppkey = su.s_suppkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $Threshold)""".stripMargin

  private val duckEdges =
    s"""$duckTe,
       |edges0 AS (SELECT cust * 2 AS src, supp * 2 + 1 AS dst FROM te),
       |edges AS (SELECT src, dst FROM edges0 UNION SELECT dst, src FROM edges0)""".stripMargin

  /** The qualifying (customer, supplier) trade pairs — the ONE 4-table
    * join + count-threshold chain every graph projection derives from
    * (review r16: tradeEdges and coPurchaseEdges each carried their own
    * copy, so a threshold or join-key change had to land twice). */
  private def qualifyingPairs(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_custkey"), col("s_suppkey"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= Threshold)
      .select(col("c_custkey").as("cust"), col("s_suppkey").as("supp"))

  /** Edge list (src, dst) as longs — built with three shuffle joins and a
    * count filter; at scale AQE handles the join sizing. */
  private[graft] def tradeEdges(s: SparkSession, d: String): DataFrame =
    qualifyingPairs(s, d)
      .select((col("cust") * 2).cast("long").as("src"),
        (col("supp") * 2 + 1).cast("long").as("dst"))

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
      // edgesDistinct: tradeEdges is a groupBy output (distinct pairs) over
      // the bipartite even/odd id split — reversal flips parity, so the
      // undirected union cannot create duplicates (optimization r18)
      GraphOps.connectedComponents(tradeEdges(s, d), edgesDistinct = true)
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
      // materialize the 4-table trade join once: the source aggregate
      // below is its own action, and sssp reads the edge input again —
      // without this the whole join pipeline ran once per consumer
      // (optimization r18, same class as the CC entry materialization)
      val edges = GraphOps.materialize(tradeEdges(s, d))
      // smallest vertex id overall (the oracle's MIN(src) ranges over the
      // undirected edge list, i.e. all endpoints)
      val source = edges.agg(least(min(col("src")), min(col("dst"))))
        .first().getLong(0)
      GraphOps.sssp(edges, source, edgesDistinct = true) // same proof as qg1
        .select(col("id"), col("dist"))
        .orderBy(col("id"))
    },

    // PageRank (10 iterations, damping 0.85), float fixpoint — oracled
    // bit-exactly (round 13): both engines fold the two order-sensitive
    // double sums (per-vertex in-rank gather, dangling mass) left-to-right
    // over src/id-sorted lists (Spark: aggregate∘sort_array∘collect_list;
    // DuckDB: list_reduce over an ordered list aggregate), and every other
    // op is per-row IEEE arithmetic in a fixed expression order — so the
    // 10-iteration compound is deterministic to the last bit and the raw
    // doubles hash-compare. GraphSpec still checks rank-sum + hub ordering.
    q("qg3_pagerank", {
      // each r$i is MATERIALIZED: c/d reference r(i-1) twice, so the
      // default inlining would expand the 10-round chain 2^10-fold
      val deMat = duckDirectedEdges.replaceFirst(
        "de AS \\(", "de AS MATERIALIZED (")
      require(deMat != duckDirectedEdges,
        "duckDirectedEdges header drifted; MATERIALIZED rewrite missed")
      val sb = new StringBuilder(
        s"""WITH $deMat,
           |verts AS MATERIALIZED (SELECT src AS id FROM de UNION SELECT dst FROM de),
           |deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS deg FROM de GROUP BY 1),
           |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
           |r0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM verts)""".stripMargin)
      for (i <- 1 to 10) sb.append(
        s""",
           |c$i AS (SELECT e.dst AS id,
           |    list_reduce(list(r.rank / CAST(d.deg AS DOUBLE) ORDER BY e.src),
           |      (a, b) -> a + b) AS c
           |  FROM de e JOIN r${i - 1} r ON r.id = e.src
           |  JOIN deg d ON d.id = e.src GROUP BY 1),
           |d$i AS (SELECT coalesce(list_reduce(list(r.rank ORDER BY r.id),
           |      (a, b) -> a + b), CAST(0.0 AS DOUBLE)) AS dm
           |  FROM r${i - 1} r LEFT JOIN deg d ON d.id = r.id
           |  WHERE d.id IS NULL),
           |r$i AS MATERIALIZED (SELECT v.id,
           |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
           |      + CAST(0.85 AS DOUBLE) * (coalesce(c$i.c, CAST(0.0 AS DOUBLE))
           |        + (SELECT dm FROM d$i) / (SELECT n FROM nn)) AS rank
           |  FROM verts v LEFT JOIN c$i ON c$i.id = v.id)""".stripMargin)
      sb.append(
        s"""
           |SELECT CAST(id AS BIGINT) AS id, rank FROM r10 ORDER BY id""".stripMargin)
      sb.toString
    }) { (s, d) =>
      GraphOps.pageRank(tradeEdges(s, d), deterministic = true)
        .select(col("id"), col("rank"))
        .orderBy(col("id"))
    },

    // Triangle enumeration (reference: flink-gelly TriangleEnumerator /
    // TriangleListing) over the customer co-purchase projection: an edge
    // joins customers sharing a qualifying supplier; triangles are the
    // classic e1⋈e2⋈e3 with a < b < c (each triangle listed once).
    q("qg4_triangles",
      s"""WITH $duckCo
         |SELECT CAST(e1.a AS BIGINT) AS a, CAST(e1.b AS BIGINT) AS b,
         |  CAST(e2.b AS BIGINT) AS c
         |FROM co e1 JOIN co e2 ON e2.a = e1.b
         |  JOIN co e3 ON e3.a = e1.a AND e3.b = e2.b
         |ORDER BY a, b, c""".stripMargin) { (s, d) =>
      val co = coPurchaseEdges(s, d).cache()
      co.as("e1")
        .join(co.as("e2"), col("e2.a") === col("e1.b"))
        .join(co.as("e3"),
          col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
        .select(col("e1.a").cast("long").as("a"),
          col("e1.b").cast("long").as("b"),
          col("e2.b").cast("long").as("c"))
        .orderBy(col("a"), col("b"), col("c"))
    },

    // Jaccard index per edge (reference: flink-gelly library JaccardIndex):
    // neighborhood overlap of the edge's endpoints in the co-purchase
    // graph. Pure integer-ratio arithmetic — deterministic.
    q("qg5_jaccard_index",
      s"""WITH $duckCo,
         |nbr AS (SELECT a AS v, b AS n FROM co UNION ALL SELECT b, a FROM co),
         |deg AS (SELECT v, COUNT(*) AS d FROM nbr GROUP BY v),
         |inter AS (SELECT e.a, e.b, COUNT(*) AS ni
         |  FROM co e JOIN nbr x ON x.v = e.a JOIN nbr y ON y.v = e.b AND y.n = x.n
         |  GROUP BY e.a, e.b)
         |SELECT CAST(e.a AS BIGINT) AS a, CAST(e.b AS BIGINT) AS b,
         |  (CAST(coalesce(i.ni, 0) AS DOUBLE)
         |     / (da.d + db.d - coalesce(i.ni, 0))) AS jaccard
         |FROM co e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b
         |  LEFT JOIN inter i ON i.a = e.a AND i.b = e.b
         |ORDER BY a, b""".stripMargin) { (s, d) =>
      val co = coPurchaseEdges(s, d).cache()
      val nbr = co.select(col("a").as("v"), col("b").as("n"))
        .unionAll(co.select(col("b").as("v"), col("a").as("n")))
      val deg = nbr.groupBy(col("v")).agg(count(lit(1)).as("d"))
      val inter = co.as("e")
        .join(nbr.as("x"), col("x.v") === col("e.a"))
        .join(nbr.as("y"),
          col("y.v") === col("e.b") && col("y.n") === col("x.n"))
        .groupBy(col("e.a").as("ia"), col("e.b").as("ib"))
        .agg(count(lit(1)).as("ni"))
      co.as("e")
        .join(deg.as("da"), col("da.v") === col("e.a"))
        .join(deg.as("db"), col("db.v") === col("e.b"))
        .join(inter,
          col("ia") === col("e.a") && col("ib") === col("e.b"), "left")
        .select(col("e.a").cast("long").as("a"),
          col("e.b").cast("long").as("b"),
          (coalesce(col("ni"), lit(0L)).cast("double")
            / (col("da.d") + col("db.d") - coalesce(col("ni"), lit(0L))))
            .as("jaccard"))
        .orderBy(col("a"), col("b"))
    },

    // Label propagation (reference: flink-gelly library/LabelPropagation
    // .java) on the co-purchase graph: 4 synchronous iterations, ties to
    // the smallest label — deterministic by construction, so the oracle
    // can unroll the exact same iterations as SQL CTEs.
    q("qg6_label_propagation", {
      val iters = LpaIters
      val sb = new StringBuilder(
        s"""WITH $duckCo,
           |e AS (SELECT a AS src, b AS dst FROM co UNION ALL SELECT b, a FROM co),
           |l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM e)""".stripMargin)
      for (i <- 1 to iters) sb.append(
        s""",
           |c$i AS (SELECT e.dst AS v, l.lbl, COUNT(*) AS c
           |  FROM e JOIN l${i - 1} l ON l.id = e.src GROUP BY 1, 2),
           |l$i AS (SELECT v AS id, lbl FROM (
           |  SELECT v, lbl, row_number() OVER (
           |    PARTITION BY v ORDER BY c DESC, lbl) AS rn FROM c$i)
           |  WHERE rn = 1)""".stripMargin)
      sb.append(
        s"""
           |SELECT CAST(id AS BIGINT) AS id, CAST(lbl AS BIGINT) AS label
           |FROM l$iters ORDER BY id""".stripMargin)
      sb.toString
    }) { (s, d) =>
      val co = coPurchaseEdges(s, d)
      GraphOps.labelPropagation(
          co.select(col("a").as("src"), col("b").as("dst")), LpaIters)
        .select(col("id").cast("long").as("id"),
          col("lbl").cast("long").as("label"))
        .orderBy(col("id"))
    }
    ,

    // Adamic–Adar similarity (reference: flink-gelly library/similarity/
    // AdamicAdar.java) on the co-purchase graph: per vertex pair sharing
    // neighbors, Σ 1/ln(deg(common neighbor)), each term floor-scaled to
    // 10^6 so the aggregate sums exact integers (Det dirty-double rule).
    q("qg7_adamic_adar",
      s"""WITH $duckCo,
         |nbr AS (SELECT a AS v, b AS n FROM co UNION ALL SELECT b, a FROM co),
         |deg AS (SELECT n, COUNT(*) AS d FROM nbr GROUP BY n),
         |w AS (SELECT v, n, CAST(FLOOR(1000000.0 / ln(d)) AS BIGINT) AS w
         |  FROM nbr JOIN deg USING (n) WHERE d > 1)
         |SELECT CAST(x.v AS BIGINT) AS a, CAST(y.v AS BIGINT) AS b,
         |  CAST(SUM(x.w) AS BIGINT) AS score_scaled
         |FROM w x JOIN w y ON x.n = y.n AND x.v < y.v
         |GROUP BY 1, 2 ORDER BY a, b""".stripMargin) { (s, d) =>
      GraphOps.adamicAdar(coPurchaseEdges(s, d))
        .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"),
          col("score_scaled"))
        .orderBy(col("a"), col("b"))
    },

    // HITS hubs and authorities (reference: flink-gelly
    // library/linkanalysis/HITS.java) on the directed customer→supplier
    // trade graph, 3 fixed unnormalized iterations — integer scores are
    // exact in both engines, so the oracle unrolls the same rounds as
    // CTEs (the qg6 pattern).
    q("qg8_hits", {
      val sb = new StringBuilder(
        s"""WITH $duckDirectedEdges,
           |verts AS (SELECT src AS id FROM de UNION SELECT dst FROM de),
           |h0 AS (SELECT id, CAST(1 AS BIGINT) AS hub,
           |  CAST(1 AS BIGINT) AS auth FROM verts)""".stripMargin)
      for (i <- 1 to HitsIters) sb.append(
        s""",
           |a$i AS (SELECT e.dst AS id, CAST(SUM(h.hub) AS BIGINT) AS auth
           |  FROM de e JOIN h${i - 1} h ON h.id = e.src GROUP BY 1),
           |wa$i AS (SELECT v.id, CAST(COALESCE(a$i.auth, 0) AS BIGINT) AS auth
           |  FROM verts v LEFT JOIN a$i ON a$i.id = v.id),
           |hb$i AS (SELECT e.src AS id, CAST(SUM(w.auth) AS BIGINT) AS hub
           |  FROM de e JOIN wa$i w ON w.id = e.dst GROUP BY 1),
           |h$i AS (SELECT v.id, CAST(COALESCE(hb$i.hub, 0) AS BIGINT) AS hub,
           |    wa$i.auth
           |  FROM verts v LEFT JOIN hb$i ON hb$i.id = v.id
           |  JOIN wa$i ON wa$i.id = v.id)""".stripMargin)
      sb.append(
        s"""
           |SELECT CAST(id AS BIGINT) AS id, hub, auth
           |FROM h$HitsIters ORDER BY id""".stripMargin)
      sb.toString
    }) { (s, d) =>
      GraphOps.hits(tradeEdges(s, d), HitsIters)
        .select(col("id"), col("hub"), col("auth"))
        .orderBy(col("id"))
    },

    // Integer-scaled PageRank with bit-exact floor arithmetic — the
    // oracled twin of qg3 (which keeps the reference's float fixpoint,
    // rows-only checked). 3 rounds unrolled as CTEs like qg8.
    q("qg12_pagerank_scaled", {
      val sb = new StringBuilder(
        s"""WITH $duckDirectedEdges,
           |verts AS (SELECT src AS id FROM de UNION SELECT dst FROM de),
           |deg AS (SELECT src AS id, COUNT(*) AS deg FROM de GROUP BY 1),
           |nn AS (SELECT COUNT(*) AS n FROM verts),
           |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank FROM verts)""".stripMargin)
      for (i <- 1 to PrIters) sb.append(
        s""",
           |c$i AS (SELECT e.dst AS id,
           |    CAST(SUM(r.rank // d.deg) AS BIGINT) AS c
           |  FROM de e JOIN r${i - 1} r ON r.id = e.src
           |  JOIN deg d ON d.id = e.src GROUP BY 1),
           |d$i AS (SELECT CAST(COALESCE(SUM(r.rank), 0) AS BIGINT) AS dm
           |  FROM r${i - 1} r LEFT JOIN deg d ON d.id = r.id
           |  WHERE d.id IS NULL),
           |r$i AS (SELECT v.id, CAST(150000 + (85 * (COALESCE(c$i.c, 0)
           |    + (SELECT dm FROM d$i) // (SELECT n FROM nn))) // 100 AS BIGINT) AS rank
           |  FROM verts v LEFT JOIN c$i ON c$i.id = v.id)""".stripMargin)
      sb.append(
        s"""
           |SELECT CAST(id AS BIGINT) AS id, rank FROM r$PrIters
           |ORDER BY id""".stripMargin)
      sb.toString
    }) { (s, d) =>
      GraphOps.pageRankScaled(tradeEdges(s, d), PrIters)
        .select(col("id"), col("rank"))
        .orderBy(col("id"))
    },

    // Triadic census (reference: flink-gelly clustering/undirected/
    // TriadicCensus.java): closed-form triad-class counts from n, m,
    // wedges and triangles — one row, four exact integers.
    q("qg9_triadic_census",
      s"""WITH $duckCo,
         |nbr AS (SELECT a AS v FROM co UNION ALL SELECT b FROM co),
         |deg AS (SELECT v, COUNT(*) AS d FROM nbr GROUP BY v),
         |s AS (SELECT COUNT(*) AS n,
         |  CAST(COALESCE(SUM(d * (d - 1) // 2), 0) AS BIGINT) AS w FROM deg),
         |mm AS (SELECT COUNT(*) AS m FROM co),
         |tri AS (SELECT COUNT(*) AS t FROM co e1
         |  JOIN co e2 ON e2.a = e1.b
         |  JOIN co e3 ON e3.a = e1.a AND e3.b = e2.b)
         |SELECT
         |  CAST(n * (n - 1) * (n - 2) // 6
         |    - (m * (n - 2) - 2 * w + 3 * t) - (w - 3 * t) - t AS BIGINT) AS t0,
         |  CAST(m * (n - 2) - 2 * w + 3 * t AS BIGINT) AS t1,
         |  CAST(w - 3 * t AS BIGINT) AS t2,
         |  CAST(t AS BIGINT) AS t3
         |FROM s, mm, tri""".stripMargin) { (s, d) =>
      // cache: triadicCensus reads its edge input three ways (degree
      // aggregate, edge count, triangle self-join) — uncached, the whole
      // 4-table co-purchase build repeated per consumer (optimization
      // r18; qg4/qg5 already cached for the same reason)
      GraphOps.triadicCensus(coPurchaseEdges(s, d).cache())
    },

    // Local clustering coefficient (reference: clustering/undirected/
    // LocalClusteringCoefficient.java): triangles(v) / C(deg(v), 2) —
    // one double division of exact integers per vertex.
    q("qg10_clustering_coeff",
      s"""WITH $duckCo,
         |nbr AS (SELECT a AS v FROM co UNION ALL SELECT b FROM co),
         |deg AS (SELECT v, COUNT(*) AS d FROM nbr GROUP BY v),
         |tri AS (SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc FROM co e1
         |  JOIN co e2 ON e2.a = e1.b
         |  JOIN co e3 ON e3.a = e1.a AND e3.b = e2.b),
         |tv AS (SELECT ta AS v FROM tri UNION ALL SELECT tb FROM tri
         |  UNION ALL SELECT tc FROM tri),
         |tc AS (SELECT v, COUNT(*) AS t FROM tv GROUP BY v)
         |SELECT CAST(deg.v AS BIGINT) AS v,
         |  CAST(COALESCE(tc.t, 0) AS BIGINT) AS triangles,
         |  CAST(deg.d AS BIGINT) AS degree,
         |  CASE WHEN deg.d >= 2
         |    THEN CAST(COALESCE(tc.t, 0) AS DOUBLE) * 2 / (deg.d * (deg.d - 1))
         |    ELSE 0.0 END AS coeff
         |FROM deg LEFT JOIN tc ON tc.v = deg.v
         |ORDER BY v""".stripMargin) { (s, d) =>
      // cache: the coefficient reads its edge input three ways too
      // (degrees, triangle self-join, per-vertex membership counts) —
      // same recompute class as qg9 (optimization r18)
      GraphOps.localClusteringCoefficient(coPurchaseEdges(s, d).cache())
        .select(col("v"), col("triangles"), col("degree"), col("coeff"))
        .orderBy(col("v"))
    },

    // Graph summarization (reference: library/Summarization.java):
    // contract vertices by group (customer id mod 10) and count the
    // summary edges between groups.
    q("qg11_summarize",
      s"""WITH $duckCo
         |SELECT CAST(LEAST(a % 10, b % 10) AS BIGINT) AS ga,
         |  CAST(GREATEST(a % 10, b % 10) AS BIGINT) AS gb,
         |  COUNT(*) AS n_edges
         |FROM co GROUP BY 1, 2 ORDER BY ga, gb""".stripMargin) { (s, d) =>
      GraphOps.summarize(coPurchaseEdges(s, d), v => v % 10)
        .select(col("ga"), col("gb"), col("n_edges"))
        .orderBy(col("ga"), col("gb"))
    },

    // Vertex degree annotation over the DIRECTED trade graph
    // (reference: flink-gelly asm/degree/annotate/directed/
    // VertexDegrees.java — per-vertex out/in/total). Two partial-agg
    // groupBys + one full-outer join on the vertex key; at 100 TB the
    // degree table is vertex-sized, tiny next to the edge list.
    q("qg13_vertex_degrees",
      s"""WITH $duckDirectedEdges,
         |o AS (SELECT src AS v, COUNT(*) AS out_deg FROM de GROUP BY 1),
         |i AS (SELECT dst AS v, COUNT(*) AS in_deg FROM de GROUP BY 1)
         |SELECT CAST(COALESCE(o.v, i.v) AS BIGINT) AS v,
         |  COALESCE(out_deg, 0) AS out_deg,
         |  COALESCE(in_deg, 0) AS in_deg,
         |  COALESCE(out_deg, 0) + COALESCE(in_deg, 0) AS degree
         |FROM o FULL OUTER JOIN i ON o.v = i.v
         |ORDER BY v""".stripMargin) { (s, d) =>
      val e = tradeEdges(s, d)
      val outD = e.groupBy(col("src").as("v")).agg(count(lit(1)).as("out_deg"))
      val inD = e.groupBy(col("dst").as("v")).agg(count(lit(1)).as("in_deg"))
      outD.join(inD, Seq("v"), "full_outer")
        .select(col("v"),
          coalesce(col("out_deg"), lit(0L)).as("out_deg"),
          coalesce(col("in_deg"), lit(0L)).as("in_deg"))
        .withColumn("degree", col("out_deg") + col("in_deg"))
        .orderBy("v")
    },

    // k-core decomposition (Matula–Beck peeling; beyond the Gelly
    // library) over the parts CO-PURCHASE graph (parts sharing an order
    // — the market-basket projection, ~115 avg degree, so peeling at
    // k=80 cascades for several rounds before stabilizing on a proper
    // nonempty core at both scales). Spark runs the loop to fixpoint
    // with per-round edge-count convergence scalars; the oracle UNROLLS
    // 16 peel blocks — more than the measured 6-round convergence at
    // either scale, and safe because peeling is idempotent after
    // fixpoint, so over-unrolling is exact.
    q("qg14_kcore", {
      val blocks = (1 to KCoreUnroll).map { i =>
        s"""d_$i AS MATERIALIZED (SELECT src, COUNT(*) AS dg
           |  FROM e_${i - 1} GROUP BY src),
           |kp_$i AS MATERIALIZED (SELECT src FROM d_$i WHERE dg >= $KCoreK),
           |e_$i AS MATERIALIZED (SELECT e.src, e.dst FROM e_${i - 1} e
           |  JOIN kp_$i a ON e.src = a.src
           |  JOIN kp_$i b ON e.dst = b.src)""".stripMargin
      }.mkString(",\n")
      s"""WITH pp AS MATERIALIZED (
         |  SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |e_0 AS MATERIALIZED (SELECT p1 AS src, p2 AS dst FROM pp
         |  UNION SELECT p2, p1 FROM pp),
         |$blocks
         |SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS core_deg
         |FROM e_$KCoreUnroll GROUP BY src ORDER BY id""".stripMargin
    }) { (s, d) =>
      GraphOps.kCore(partsCoPurchase(s, d), KCoreK).orderBy("id")
    }
  )

  /** qg14's oracle unrolls this many peel blocks; GraphSpec asserts the
    * engine's measured fixpoint rounds stay within it (over-unrolling
    * is exact — peeling is idempotent after fixpoint — but UNDER-
    * unrolling would silently diverge, so the coupling must fail
    * loudly). */
  val KCoreUnroll = 16
  val KCoreK = 80

  /** qg14's fixture: the parts co-purchase graph (parts sharing an
    * order), directed a < b, distinct. */
  private[graph] def partsCoPurchase(s: SparkSession,
      d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      .distinct()
  }

  private val LpaIters = 4
  private val HitsIters = 3
  private val PrIters = 3

  /** Shared DuckDB CTE: co-purchase projection (a < b, distinct). */
  private val duckCo =
    s"""$duckTe,
       |co AS (SELECT DISTINCT a.cust AS a, b.cust AS b
       |  FROM te a JOIN te b ON a.supp = b.supp AND a.cust < b.cust)""".stripMargin

  /** Directed customer→supplier edge CTE shared by the HITS oracle. */
  private val duckDirectedEdges =
    s"""$duckTe,
       |de AS (SELECT cust * 2 AS src, supp * 2 + 1 AS dst FROM te)""".stripMargin

  /** Customer co-purchase projection of the trade graph: customers linked
    * by a shared qualifying supplier (a < b, distinct). */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val te = qualifyingPairs(s, d)
    te.as("x").join(te.as("y"),
      col("x.supp") === col("y.supp") && col("x.cust") < col("y.cust"))
      .select(col("x.cust").as("a"), col("y.cust").as("b"))
      .distinct()
  }
}
