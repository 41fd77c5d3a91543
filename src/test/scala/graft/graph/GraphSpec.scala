package graft.graph

import graft.SparkSuite
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSuite {
  import spark.implicits._

  // two triangles + a bridge vertex chain + an isolated pair
  private lazy val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), // triangle A
    (10L, 11L), (11L, 12L), (12L, 10L), // triangle B
    (3L, 10L), // bridge joins A and B
    (20L, 21L) // separate component
  ).toDF("src", "dst")

  test("connectedComponents labels components by min vertex id") {
    val comp = GraphOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 10L, 11L, 12L).forall(comp(_) == 1L))
    assert(comp(20L) == 20L && comp(21L) == 20L)
  }

  test("connectedComponents/sssp edgesDistinct fast path matches default, " +
      "and stays correct even when the assertion is false") {
    // the fixture is distinct single-orientation — the assertion holds
    val viaFlag = GraphOps.connectedComponents(edges, edgesDistinct = true)
      .as[(Long, Long)].collect().toMap
    val viaDefault = GraphOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(viaFlag === viaDefault)
    // a LYING caller (duplicates + both orientations) degrades only
    // performance: min-label propagation is duplicate-insensitive
    val messy = edges.unionAll(edges)
      .unionAll(edges.select($"dst".as("src"), $"src".as("dst")))
    val viaLie = GraphOps.connectedComponents(messy, edgesDistinct = true)
      .as[(Long, Long)].collect().toMap
    assert(viaLie === viaDefault)
    val d1 = GraphOps.sssp(edges, 1L, edgesDistinct = true)
      .as[(Long, Double)].collect().toMap
    val d2 = GraphOps.sssp(messy, 1L, edgesDistinct = true)
      .as[(Long, Double)].collect().toMap
    val d0 = GraphOps.sssp(edges, 1L).as[(Long, Double)].collect().toMap
    assert(d1 === d0 && d2 === d0)
  }

  test("sssp computes hop distances and omits unreachable vertices") {
    val dist = GraphOps.sssp(edges, 1L)
      .as[(Long, Double)].collect().toMap
    assert(dist(1L) == 0.0 && dist(2L) == 1.0 && dist(3L) == 1.0)
    assert(dist(10L) == 2.0 && dist(11L) == 3.0)
    assert(!dist.contains(20L))
  }

  test("pageRank: ranks sum to |V| and the bridge hubs rank highest") {
    val pr = GraphOps.pageRank(edges, iters = 15)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(pr.values.sum - pr.size) < 1e-6)
    // edges are directed: 10 is the only vertex with two in-edges (from 12
    // and from the bridge 3) → highest rank; 20 receives nothing → lowest
    assert(pr.maxBy(_._2)._1 == 10L)
    assert(pr.minBy(_._2)._1 == 20L)
  }

  test("labelPropagation: labels stay within the component, dense side wins") {
    val lbl = GraphOps.labelPropagation(edges, iterations = 4)
      .as[(Long, Long)].collect().toMap
    // a vertex's label is always some vertex id of its own component
    val compA = Set(1L, 2L, 3L, 10L, 11L, 12L)
    assert(compA.forall(v => compA.contains(lbl(v))))
    assert(Set(20L, 21L).forall(v => Set(20L, 21L).contains(lbl(v))))
    // deterministic: a second run yields the identical assignment
    val again = GraphOps.labelPropagation(edges, iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(again === lbl)
  }

  test("hits: integer scores match the hand-computed fixpoint rounds") {
    // star: 1→3, 2→3 plus 3→4: hubs 1,2 point at the authority 3
    val star = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = GraphOps.hits(star, iters = 1)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // round 1: auth = in-hub sums (3: 1+1=2, 4: 1), then hub = out-auth
    // sums with NEW auths (1: 2, 2: 2, 3: 1)
    assert(got(3L) === ((1L, 2L)))
    assert(got(1L) === ((2L, 0L)) && got(2L) === ((2L, 0L)))
    assert(got(4L) === ((0L, 1L)))
  }

  test("adamicAdar scores pairs by inverse-log degree of shared neighbors") {
    // 1-3, 2-3 (common neighbor 3, deg 3); 3 also joins 4; 1-2 not linked
    val g = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = GraphOps.adamicAdar(g)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val w3 = math.floor(1e6 / math.log(3)).toLong // deg(3) = 3
    // pairs sharing neighbor 3: (1,2), (1,4), (2,4) — each scores w3
    assert(got === Map((1L, 2L) -> w3, (1L, 4L) -> w3, (2L, 4L) -> w3))
  }

  test("communityDetection assigns one community per dense cluster, deterministically") {
    val lbl = GraphOps.communityDetection(edges, iterations = 4)
      .as[(Long, Long)].collect().toMap
    // labels stay within the component
    val compA = Set(1L, 2L, 3L, 10L, 11L, 12L)
    assert(compA.forall(v => compA.contains(lbl(v))))
    assert(Set(20L, 21L).forall(v => Set(20L, 21L).contains(lbl(v))))
    // each triangle coalesces on one label
    assert(Set(1L, 2L, 3L).map(lbl).size == 1)
    assert(Set(10L, 11L, 12L).map(lbl).size == 1)
    // deterministic across runs
    val again = GraphOps.communityDetection(edges, iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(again === lbl)
  }

  test("scatterGather expresses connected components (vertex-centric API parity)") {
    // min-label propagation as a generic scatter-gather program
    val und = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
    val initial = und.select($"src".as("id")).distinct()
      .withColumn("state", $"id")
    val sg = GraphOps.scatterGather(und, initial, supersteps = 10)(
      msg = identity,
      merge = min,
      update = (state, msg) => least(state, coalesce(msg, state)))
      .as[(Long, Long)].collect().toMap
    val cc = GraphOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(sg === cc)
  }

  test("scatterGather expresses SSSP hop counts") {
    val und = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
    val initial = und.select($"src".as("id")).distinct()
      .withColumn("state",
        when($"id" === 1L, 0.0).otherwise(lit(Double.MaxValue)))
    val sg = GraphOps.scatterGather(und, initial, supersteps = 10)(
      msg = s => when(s < Double.MaxValue, s + 1.0).otherwise(s),
      merge = min,
      update = (state, msg) => least(state, coalesce(msg, state)))
      .where($"state" < Double.MaxValue)
      .as[(Long, Double)].collect().toMap
    val dist = GraphOps.sssp(edges, 1L)
      .as[(Long, Double)].collect().toMap
    assert(sg === dist)
  }

  test("gatherSumApply expresses weighted SSSP (GSA API parity)") {
    // weighted shortest paths: gather = srcDist + edgeWeight, sum = min,
    // apply = least — the canonical GSA program (GSASingleSourceShortestPaths)
    val wEdges = Seq(
      (1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 5.0), // direct 1→3 is longer
      (3L, 4L, 2.0)).toDF("src", "dst", "weight")
    val und = wEdges.union(
      wEdges.select($"dst".as("src"), $"src".as("dst"), $"weight"))
    val initial = und.select($"src".as("id")).distinct()
      .withColumn("state",
        when($"id" === 1L, 0.0).otherwise(lit(Double.MaxValue)))
    val gsa = GraphOps.gatherSumApply(und, initial, supersteps = 6)(
      gather = (s, w) => when(s < Double.MaxValue, s + w).otherwise(s),
      sum = min,
      apply = (state, msg) => least(state, coalesce(msg, state)))
      .as[(Long, Double)].collect().toMap
    // 1→2→3 (2.0) beats the direct 5.0 edge; 4 via 3 = 4.0
    assert(gsa === Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0, 4L -> 4.0))
  }

  test("pregel expresses connected components with conditional sends") {
    // vertex-centric CC: a triplet only sends when the source label beats
    // the destination's (ComputeFunction.sendMessageTo under a condition —
    // NULL send = no message), which also shows vprog leaving the state
    // untouched on an empty inbox
    val und = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
    val initial = und.select($"src".as("id")).distinct()
      .withColumn("state", $"id")
    val pr = GraphOps.pregel(und, initial, supersteps = 10)(
      sendToDst = (srcState, dstState, _) =>
        when(srcState < dstState, srcState), // otherwise NULL → no message
      combine = min,
      vprog = (state, msg) => least(state, coalesce(msg, state)))
      .as[(Long, Long)].collect().toMap
    val cc = GraphOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(pr === cc)
  }

  test("trade-graph edges alternate customer(even) / supplier(odd) ids") {
    val e = GraphQueries.tradeEdges(spark, sf).as[(Long, Long)].collect()
    assert(e.nonEmpty)
    assert(e.forall { case (s2, d2) => s2 % 2 == 0 && d2 % 2 == 1 })
  }

  test("triadic census of an EMPTY graph is exact zeros, not NULLs (review r18)") {
    // the sf0.1 co-purchase graph is empty at the qualifying threshold;
    // the former NULL wedge sum NULL-propagated through every identity
    // and round-tripped the hash gate unseen because the oracle
    // propagated identically — the census now coalesces to an all-zero
    // row and the overflow guard raises rather than wraps
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val row = GraphOps.triadicCensus(empty)
      .as[(Long, Long, Long, Long)].collect()
    assert(row.toSeq == Seq((0L, 0L, 0L, 0L)))
  }

  test("qg14 coupling: kCore fixpoint rounds fit the oracle's unroll depth") {
    // the oracle unrolls a FIXED number of peel blocks; if a fixture
    // ever needs more rounds than that, this must fail loudly here
    // rather than silently diverge at the driver gate (sf0.01 is the
    // driver's verify scale)
    val d = "/root/testdata/sf0.01"
    val (_, rounds) = GraphOps.kCoreWithRounds(
      GraphQueries.partsCoPurchase(spark, d), GraphQueries.KCoreK)
    assert(rounds <= GraphQueries.KCoreUnroll,
      s"oracle unrolls ${GraphQueries.KCoreUnroll} peel blocks but the " +
        s"engine needed $rounds rounds to converge")
  }
}
