package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Graph algorithms as iterative DataFrame joins — the capability slice of
  * the reference's Gelly library (SURVEY.md §2.12): PageRank
  * (flink-gelly library/linkanalysis/PageRank.java), ConnectedComponents
  * (library/ConnectedComponents.java, scatter-gather min-label propagation)
  * and SingleSourceShortestPaths (library/SingleSourceShortestPaths.java).
  *
  * The reference runs these on dedicated iteration operators
  * (runScatterGatherIteration, Graph.java:1730); Spark-first, each
  * iteration is a join + aggregate on DataFrames with the loop on the
  * driver — the standard GraphX/GraphFrames pattern. Every iteration
  * shuffles by vertex id only; an eager `localCheckpoint` per round
  * truncates lineage so plans stay constant-size at any iteration count
  * (crucial at scale — without it the plan tree grows linearly and
  * re-optimization dominates) — see [[materialize]] for why checkpointing
  * beats `.cache()` here.
  *
  * Graphs are (src, dst) edge DataFrames; vertex ids are longs.
  */
object GraphOps {

  /** Per-iteration materialization. Eager localCheckpoint, NOT `.cache()`:
    * a cached round whose plan contains the previous round's cached plan
    * makes `unpersist()` of the old round invalidate-and-rebuild the new
    * round's CacheManager entry (dependent-cache recache), silently
    * recomputing whole iteration chains; and never unpersisting pins every
    * round's blocks for the session lifetime. Checkpointing instead cuts
    * the plan to a LogicalRDD (constant-size lineage at any iteration
    * count), registers nothing in the CacheManager, and the previous
    * round's blocks become GC-reclaimable the moment the driver drops its
    * reference (ContextCleaner unpersists them). */
  private[graph] def materialize(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = true)

  /** Undirected view of an edge list (plus self-loops removed).
    * `dedup = false` skips the `.distinct()` — ONLY for callers that (a)
    * prove the input is already deduplicated with at most one orientation
    * per undirected edge (so the reversed union cannot create duplicates)
    * AND (b) feed a duplicate-insensitive consumer (min-label/min-dist
    * propagation). The distinct is a full 2E-row exchange + aggregate; on
    * an already-distinct input it is a pure pre-loop tax (optimization
    * r18, guide §2.4 "a distinct on data that is already unique"). */
  private def undirect(edges: DataFrame, dedup: Boolean = true): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val u = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst"))
    if (dedup) u.distinct() else u
  }

  /** Min-label propagation with pointer jumping until fixpoint: every
    * vertex ends with the smallest vertex id reachable from it (component
    * id). Each round does one neighbor-min step (labels flow along edges)
    * followed by one pointer jump (`comp ← comp(comp)`, label indirection
    * squares the propagation reach) — the hash-min + path-halving scheme,
    * converging in O(log diameter) rounds instead of O(diameter). On a
    * 1000-executor cluster against a high-diameter graph (web chains, long
    * user journeys) that difference is the whole game: each round is two
    * key-partitioned shuffles, so total work is O(E log d), not O(E d). */
  /** @param edgesDistinct caller-asserted: the input edge list is already
    *   deduplicated and carries at most one orientation per undirected
    *   edge, so `undirect` may skip its full-data `.distinct()` pass
    *   (optimization r18). Min-label propagation is duplicate-INSENSITIVE,
    *   so a wrong assertion degrades only performance, never the result.
    *   Both in-repo callers qualify provably: qg1's tradeEdges is a
    *   groupBy output over a bipartite even/odd id split (reversal flips
    *   parity — orientations cannot collide) and dupClusters' pairs are
    *   DISTINCT with src < dst strict. */
  def connectedComponents(edges: DataFrame,
      maxIter: Int = 50, edgesDistinct: Boolean = false): DataFrame = {
    // Materialize the caller's edge PIPELINE once before fanning out: the
    // selfed construction below reads the edge input four times (two
    // orientation branches + the vertex distinct), and with edgesDistinct
    // there is no exchange at the undirect level for ReuseExchange to
    // share — a caller passing a join/aggregate pipeline (qg1's 4-table
    // trade join; dupClusters' LSH pairs) would recompute its post-shuffle
    // tail once per read (optimization r18, guide §1.2 "don't compute
    // things you throw away" / §3.3 plan-truncation note; measured: the
    // qg1 pre-loop cache build dominated the query at 4x one edge pass)
    val und = undirect(materialize(
        edges.select(col("src").cast("long"), col("dst").cast("long"))),
      dedup = !edgesDistinct)
    // self-edges fold "min over neighbors ∪ self" into ONE aggregate (no
    // left-join back onto the labels), and guarantee every vertex appears
    // in the aggregate output. The cache is REPARTITIONED BY src — the
    // per-round join key — so every round's join reads the cached side
    // with no exchange (optimization r18, guide §2.4 "two operations
    // keyed the same way share one exchange"): one build-time shuffle of
    // E+V rows replaces one per-round shuffle of the same rows, a net
    // win for every graph (rounds >= 2 always — convergence needs one
    // unchanged round).
    val selfed = und.unionAll(
        und.select(col("src")).distinct()
          .select(col("src"), col("src").as("dst")))
      .repartition(col("src"))
      .cache()
    // initial labels = the self-edge rows (exactly one per vertex, by the
    // distinct above) — a FILTER over the cache instead of the former
    // full distinct exchange over it (optimization r18)
    var labels = selfed.where(col("src") === col("dst"))
      .select(col("src").as("id"), col("src").as("comp"))
    var prevSum: java.math.BigDecimal = null
    var done = false
    var i = 0
    // neighbor-min (self-inclusive) then pointer-jump (comp ← comp(comp)):
    // two key-partitioned shuffles per round. Labels move only downward,
    // so the DECIMAL label sum strictly decreases iff any vertex changed —
    // convergence is one cheap scalar aggregate instead of a per-vertex
    // change flag (decimal: a long sum overflows at ~10^10 vertices of
    // ~10^10 ids).
    def round(cur: DataFrame): DataFrame = {
      val nbr = selfed.join(cur, selfed("src") === cur("id"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("comp")).as("comp"))
      val ptr = nbr.select(col("id").as("pid"), col("comp").as("pcomp"))
      nbr.join(ptr, nbr("comp") === col("pid"), "left")
        .select(nbr("id"),
          least(nbr("comp"), coalesce(col("pcomp"), nbr("comp"))).as("comp"))
    }
    // try/finally: a mid-loop job failure must still release the input
    // cache, or the blocks pin for the session lifetime (review r18 —
    // Verify runs every query in ONE session, so a single failed graph
    // query would degrade every later query's memory)
    try {
      while (!done && i < maxIter) {
        i += 1
        // one propagation round per materialization: batching two rounds
        // per checkpoint was measured 2× SLOWER at sf0.1 (the deeper lazy
        // plan defeats exchange reuse on the pointer-jump self-join, which
        // then recomputes the aggregate)
        val next = materialize(round(labels))
        val sum0 = next
          .agg(sum(col("comp").cast(DecimalType(38, 0)))).first()
          .getDecimal(0)
        done = sum0 == null || // empty graph
          (prevSum != null && prevSum.compareTo(sum0) == 0)
        prevSum = sum0
        labels = next
      }
      // the final labels plan is a LogicalRDD with no reference to selfed,
      // so releasing the input cache cannot invalidate the result
      labels
    } finally selfed.unpersist()
  }

  /** Single-source shortest HOP-COUNT paths via iterative relaxation
    * (every edge costs 1.0 — a weight column, if present, is ignored;
    * the scaladoc previously promised weighted paths it never computed,
    * review r16); unreachable vertices are absent from the result.
    *
    * Edges are treated as UNDIRECTED — every edge is traversable both
    * ways (review r18: this was silent). The referenced Gelly
    * SingleSourceShortestPaths runs on DIRECTED graphs; this
    * implementation undirects because the qg2 fixture graph is
    * symmetric. A caller needing directed reachability gets SHORTER
    * distances than the directed truth here — no directed variant is
    * shipped (none of the reference's own test graphs exercise one). */
  def sssp(edges: DataFrame, source: Long,
      maxIter: Int = 50, edgesDistinct: Boolean = false): DataFrame = {
    // same r18 optimizations as connectedComponents: caller-asserted
    // distinctness skips the pre-loop dedup exchange (min-dist relaxation
    // is duplicate-insensitive), the edge pipeline is materialized ONCE
    // before the two orientation reads, and the cache is partitioned by
    // the per-round join key so each relaxation round reads it
    // exchange-free
    val und = undirect(materialize(
        edges.select(col("src").cast("long"), col("dst").cast("long"))),
      dedup = !edgesDistinct)
      .repartition(col("src")).cache()
    var dist = und.sparkSession.range(1)
      .select(lit(source).as("id"), lit(0.0).as("dist"))
    // Convergence in ONE scalar action per round (the CC pattern): the
    // frontier only grows vertices and only lowers distances, so the
    // (count, exact-decimal dist sum) pair changes iff any vertex was
    // added or improved — no second join-and-count action needed. (The
    // source row is always present, so count >= 1 every round; an
    // edgeless graph converges by the unchanged-pair test in round 2.)
    var prevCount = -1L
    var prevSum: java.math.BigDecimal = null
    var done = false
    var i = 0
    try {
      while (!done && i < maxIter) {
        i += 1
        val relaxed = und.join(dist, und("src") === dist("id"))
          .select(col("dst").as("id"), (col("dist") + 1.0).as("dist"))
        val next = materialize(dist.union(relaxed)
          .groupBy(col("id")).agg(min(col("dist")).as("dist")))
        val row = next.agg(count(lit(1)),
          sum(col("dist").cast(DecimalType(38, 8)))).first()
        val (n, s) = (row.getLong(0), row.getDecimal(1))
        done =
          n == prevCount && prevSum != null && prevSum.compareTo(s) == 0
        prevCount = n; prevSum = s
        dist = next
      }
      dist
    } finally und.unpersist()
  }

  /** PageRank with damping 0.85, fixed iteration count (the reference's
    * PageRank.java default behavior on a fixed budget). Dangling mass is
    * redistributed uniformly each round so ranks sum to |V|.
    *
    * `deterministic = true` replaces the two float SUMs (per-vertex
    * in-rank gather, dangling mass) with left folds over src/id-sorted
    * contribution lists, making every rank bit-identical across engines
    * and runs (IEEE double ops are deterministic once operand order is
    * fixed; only aggregation order ever varies). The fold buffers one
    * in-neighborhood per vertex — O(max in-degree) per task versus the
    * default's constant-space partial aggregation — AND folds the
    * GLOBAL dangling mass in one id-sorted list on a single task:
    * O(|dangling|) memory there, strictly worse than the per-vertex
    * buffering (review r18 named it; on the qg3 trade graph every
    * supplier is dangling). Recorded decision: the fold is the
    * CONFORMANCE mode — it exists so the DuckDB oracle can replicate
    * the exact fold order at verification scale — and the default
    * (deterministic = false, constant-space partial float sums) stays
    * the only production mode; a bucketed two-level fold would bound
    * the task but forces the same bucketing into every oracle unroll
    * for a mode that never runs at production scale. */
  def pageRank(edges: DataFrame,
      iters: Int = 10, damping: Double = 0.85,
      deterministic: Boolean = false): DataFrame = {
    // cache partitioned by src — the contribs join key — so each of the
    // `iters` rounds reads the edge cache exchange-free (optimization r18)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst")).distinct()
      .repartition(col("src")).cache()
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().cache()
    val n = vertices.count().toDouble
    val outDeg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).cast("double").as("deg")).cache()
    var ranks = vertices.withColumn("rank", lit(1.0))
    try {
    for (i <- 1 to iters) {
      val withDeg = ranks.join(outDeg, Seq("id"), "left")
      val contribs = withDeg.where(col("deg").isNotNull)
        .join(e, col("id") === e("src"))
        .select(col("dst").as("id"), col("src"),
          (col("rank") / col("deg")).as("c"))
      val danglingMass =
        if (deterministic)
          withDeg.where(col("deg").isNull)
            .agg(aggregate(sort_array(collect_list(struct(col("id"),
              col("rank")))), lit(0.0), (acc, x) => acc + x.getField("rank")))
            .first().getDouble(0)
        else withDeg.where(col("deg").isNull)
          .agg(coalesce(sum(col("rank")), lit(0.0))).first().getDouble(0)
      val inRanks =
        if (deterministic)
          contribs.groupBy(col("id")).agg(
            aggregate(sort_array(collect_list(struct(col("src"), col("c")))),
              lit(0.0), (acc, x) => acc + x.getField("c")).as("inRank"))
        else contribs.groupBy(col("id")).agg(sum(col("c")).as("inRank"))
      val gathered = vertices.join(inRanks, Seq("id"), "left")
      val next = gathered.select(col("id"),
        (lit(1.0 - damping) + lit(damping) *
          (coalesce(col("inRank"), lit(0.0)) + lit(danglingMass / n)))
          .as("rank"))
      ranks = materialize(next)
    }
    ranks
    } finally { e.unpersist(); vertices.unpersist(); outDeg.unpersist() }
  }

  /** Vertex-centric (scatter-gather / Pregel) iteration surface
    * (reference: Graph.runScatterGatherIteration, Graph.java:1730, and
    * runVertexCentricIteration — ScatterFunction.sendMessageToAllNeighbors
    * / GatherFunction.updateVertex): the generic API the concrete
    * algorithms above are specializations of.
    *
    *  - scatter: every vertex sends `msg(state)` along its out-edges
    *  - gather:  per target vertex, messages combine via the `merge`
    *    aggregate expression
    *  - apply:   `update(oldState, mergedMsg)` (mergedMsg NULL when no
    *    messages arrived — Flink vertices simply don't update then)
    *
    * Each superstep = one key-partitioned join + one aggregate, O(E)
    * shuffled bytes; rounds materialize via localCheckpoint like every
    * iteration here. Fixed `supersteps` (the reference's
    * setMaximumNumberOfIterations contract; algorithms needing
    * convergence detection fold it into the state like
    * [[connectedComponents]]'s label sum).
    *
    * @param edges    directed (src, dst) — undirect upstream for
    *                 symmetric propagation
    * @param initial  (id, state) initial vertex states
    */
  def scatterGather(edges: DataFrame, initial: DataFrame,
      supersteps: Int)(
      msg: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      merge: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      update: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)
        => org.apache.spark.sql.Column): DataFrame = {
    // src-partitioned cache: the per-superstep scatter join reads it
    // exchange-free (optimization r18)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src")).cache()
    var verts = materialize(
      initial.select(col("id").cast("long"), col("state")))
    try {
      for (_ <- 1 to supersteps) {
        val msgs = e.join(verts, e("src") === verts("id"))
          .select(col("dst").as("mid"), msg(col("state")).as("m"))
          .groupBy(col("mid")).agg(merge(col("m")).as("msg"))
        verts = materialize(
          verts.join(msgs, verts("id") === col("mid"), "left")
            .select(col("id"), update(col("state"), col("msg")).as("state")))
      }
      verts
    } finally e.unpersist()
  }

  /** Gather-Sum-Apply iteration surface (reference:
    * Graph.runGatherSumApplyIteration, Graph.java:1768 —
    * GatherFunction/SumFunction/ApplyFunction): the GSA decomposition of
    * vertex-centric programs. Differs from [[scatterGather]] only in the
    * hook signatures — `gather` sees the EDGE (source state + edge
    * weight), matching the reference's Neighbor<VV, EV> argument, where
    * scatter-gather's `msg` sees the source state alone.
    *
    *  - gather: per edge, a partial value from (srcState, edgeWeight)
    *  - sum:    aggregate expression combining partials per target vertex
    *  - apply:  `(oldState, summed)` → new state (summed NULL when no
    *            in-edges fired; the reference doesn't update then)
    *
    * Same data movement as [[scatterGather]]: one key-partitioned join +
    * one partial-aggregated `groupBy` per superstep, O(E) shuffled bytes,
    * rounds materialized via localCheckpoint.
    *
    * @param edges (src, dst[, weight]) — a missing weight column gathers
    *              NULL (unweighted graphs ignore it)
    */
  def gatherSumApply(edges: DataFrame,
      initial: DataFrame, supersteps: Int)(
      gather: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)
        => org.apache.spark.sql.Column,
      sum: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      apply: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)
        => org.apache.spark.sql.Column): DataFrame = {
    val w = if (edges.columns.contains("weight")) col("weight")
      else lit(null).cast("double")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      w.as("weight")).repartition(col("src")).cache() // r18: superstep key
    var verts = materialize(
      initial.select(col("id").cast("long"), col("state")))
    try {
      for (_ <- 1 to supersteps) {
        val partials = e.join(verts, e("src") === verts("id"))
          .select(col("dst").as("mid"),
            gather(col("state"), col("weight")).as("g"))
        val msgs = partials.groupBy(col("mid")).agg(sum(col("g")).as("msg"))
        verts = materialize(
          verts.join(msgs, verts("id") === col("mid"), "left")
            .select(col("id"), apply(col("state"), col("msg")).as("state")))
      }
      verts
    } finally e.unpersist()
  }

  /** Pregel / vertex-centric compute surface (reference:
    * Graph.runVertexCentricIteration, Graph.java:1697 — ComputeFunction
    * .sendMessageTo + MessageCombiner): per superstep every EDGE TRIPLET
    * (srcState, dstState, weight) may send a message to its destination
    * (`sendToDst` returning NULL sends nothing — the reference's
    * conditional sendMessageTo), messages combine per vertex via the
    * `combine` aggregate, and `vprog` computes the new state (combined
    * NULL when the inbox is empty — a reference vertex halts then).
    *
    * The triplet join is the one extra shuffle vs [[scatterGather]]
    * (dst state must be co-located with the edge); programs that don't
    * read `dstState` should prefer scatter-gather's cheaper shape. That
    * mirrors the reference's own guidance (vertex-centric is the most
    * general, most expensive model).
    */
  def pregel(edges: DataFrame, initial: DataFrame,
      supersteps: Int)(
      sendToDst: (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
        org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
      combine: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      vprog: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)
        => org.apache.spark.sql.Column): DataFrame = {
    val w = if (edges.columns.contains("weight")) col("weight")
      else lit(null).cast("double")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      w.as("weight")).repartition(col("src")).cache() // r18: triplet src key
    var verts = materialize(
      initial.select(col("id").cast("long"), col("state")))
    try {
      for (_ <- 1 to supersteps) {
        val srcSide = verts.select(col("id").as("sid"),
          col("state").as("srcState"))
        val dstSide = verts.select(col("id").as("did"),
          col("state").as("dstState"))
        val msgs = e.join(srcSide, e("src") === col("sid"))
          .join(dstSide, e("dst") === col("did"))
          .select(col("dst").as("mid"),
            sendToDst(col("srcState"), col("dstState"), col("weight"))
              .as("m"))
          .where(col("m").isNotNull) // NULL = no message sent
          .groupBy(col("mid")).agg(combine(col("m")).as("msg"))
        verts = materialize(
          verts.join(msgs, verts("id") === col("mid"), "left")
            .select(col("id"), vprog(col("state"), col("msg")).as("state")))
      }
      verts
    } finally e.unpersist()
  }

  /** Integer-scaled PageRank (the oracle-able twin of [[pageRank]], same
    * determinism idea as [[hits]]): ranks live as scaled integers
    * (`scale` = 1.0) and every division is an explicit floor — so a SQL
    * engine unrolling the same rounds reproduces the BITS, not just the
    * approximate values. Per round, with integer ops only:
    * c(v) = Σ_{u→v} rank(u) DIV outdeg(u); D = Σ_{dangling} rank(u);
    * rank'(v) = (15·scale) DIV 100 + (85 · (c(v) + D DIV n)) DIV 100.
    * The floor error vs float PageRank is ≤ n·iters ulps of 1/scale —
    * irrelevant for ranking, decisive for cross-engine verification. */
  def pageRankScaled(edges: DataFrame,
      iters: Int = 3, scale: Long = 1000000L): DataFrame = {
    // src-partitioned cache: per-round contribs join reads it
    // exchange-free (optimization r18, same as pageRank)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst")).distinct()
      .repartition(col("src")).cache()
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().cache()
    try {
      val n = vertices.count()
      if (n == 0) { // empty graph: no vertices, and `dangling / n` would
        return vertices.withColumn("rank", lit(scale)) // div0 (review r16)
      }
      val outDeg = e.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("deg")).cache()
      try {
        var ranks = vertices.withColumn("rank", lit(scale))
        val base = scale * 15 / 100
        for (_ <- 1 to iters) {
          val withDeg = ranks.join(outDeg, Seq("id"), "left")
          val contribs = withDeg.where(col("deg").isNotNull)
            .join(e, col("id") === e("src"))
            .select(col("dst").as("cid"), expr("rank DIV deg").as("c"))
          val dangling = withDeg.where(col("deg").isNull)
            .agg(coalesce(sum(col("rank")), lit(0L))).first().getLong(0)
          val dShare = dangling / n // integer floor, matches SQL DIV
          val gathered = vertices.join(
            contribs.groupBy(col("cid")).agg(sum(col("c")).as("cin")),
            vertices("id") === col("cid"), "left")
          ranks = materialize(gathered.select(col("id"),
            (lit(base) +
              expr(s"(85 * (coalesce(cin, 0L) + $dShare)) DIV 100"))
              .as("rank")))
        }
        ranks
      } finally outDeg.unpersist()
    } finally { e.unpersist(); vertices.unpersist() }
  }

  /** HITS hubs-and-authorities (reference: flink-gelly
    * library/linkanalysis/HITS.java) with a FIXED iteration count and NO
    * per-round normalization: starting from hub = auth = 1, each round is
    * auth(v) ← Σ hub(u) over in-edges with the previous hubs, then
    * hub(u) ← Σ auth(v) over out-edges with the NEW authorities — all
    * integer sums, so scores stay exactly representable and bit-identical
    * in any engine (the qg6 determinism pattern; the reference's
    * epsilon-convergent normalized variant is a driver-side rescale away).
    * Each round is two key-partitioned shuffles — O(E) bytes.
    * Scores live in DECIMAL(38,0) THROUGH the iterations and cast to
    * BIGINT only at the end, with a NAMED overflow error (review r18:
    * the former per-round `.cast("long")` failed at the first round
    * whose sum passed Long.MAX — an unnamed ANSI CAST_OVERFLOW deep in
    * an iteration, where decimal-through scoring stays exact to 10^38
    * and the guarded final cast names exactly which score column no
    * longer fits the declared BIGINT output).
    *
    * @param edges directed (src, dst) edge DataFrame
    * @return (id, hub, auth) with BIGINT scores
    */
  def hits(edges: DataFrame, iters: Int = 3): DataFrame = {
    // src-partitioned cache: the auth-gather join (e.src = id) reads it
    // exchange-free each round; the hub-gather join keys by dst and still
    // shuffles — one key has to lose (optimization r18)
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().repartition(col("src")).cache()
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().cache()
    val dec = DecimalType(38, 0)
    val zero = lit(0L).cast(dec)
    var scores = vertices
      .withColumn("hub", lit(1L).cast(dec))
      .withColumn("auth", lit(1L).cast(dec))
    try {
      for (_ <- 1 to iters) {
        // each group has >= 1 row of non-null decimals, so a NULL sum
        // here means exactly one thing: DECIMAL(38,0) overflow — raise
        // it BEFORE the left join, whose own nulls legitimately mean
        // "no in-edges" and coalesce to 0
        val auth = e.join(scores.select(col("id"), col("hub")),
            e("src") === col("id"))
          .groupBy(col("dst").as("aid"))
          .agg(sum(col("hub")).cast(dec).as("auth"))
          .select(col("aid"), decOrError("auth"))
        val withAuth = vertices
          .join(auth, vertices("id") === col("aid"), "left")
          .select(col("id"), coalesce(col("auth"), zero).as("auth"))
        val hub = e.join(withAuth.select(col("id").as("hid"), col("auth")),
            e("dst") === col("hid"))
          .groupBy(col("src").as("sid"))
          .agg(sum(col("auth")).cast(dec).as("hub"))
          .select(col("sid"), decOrError("hub"))
        scores = materialize(withAuth
          .join(hub, withAuth("id") === col("sid"), "left")
          .select(col("id"), coalesce(col("hub"), zero).as("hub"),
            col("auth")))
      }
      scores.select(col("id"), bigintOrError("hub"), bigintOrError("auth"))
    } finally { e.unpersist(); vertices.unpersist() }
  }

  /** Guarded DECIMAL(38,0) → BIGINT projection: values past Long.MAX
    * raise a NAMED error instead of the silent NULL a non-ANSI cast
    * produces (the DuckDB oracle errors loudly on the same overflow —
    * review r18 aligned the engines' failure mode). */
  private def bigintOrError(name: String): org.apache.spark.sql.Column =
    expr(s"""CASE WHEN $name IS NULL OR $name > 9223372036854775807
            |  THEN CAST(raise_error(concat('graft hits/census count `$name`',
            |    ' exceeds BIGINT — the declared output type cannot',
            |    ' represent it (NULL = the DECIMAL(38) intermediate',
            |    ' itself overflowed)')) AS BIGINT)
            |  ELSE CAST($name AS BIGINT) END""".stripMargin).as(name)

  /** NULL-sum guard for a non-empty all-non-null DECIMAL aggregate,
    * where NULL can only mean DECIMAL(38,0) overflow. Under this
    * build's default ANSI mode the sum THROWS before producing NULL,
    * so this is the belt for non-ANSI deployments of the library. */
  private def decOrError(name: String): org.apache.spark.sql.Column =
    expr(s"""CASE WHEN $name IS NULL
            |  THEN CAST(raise_error(concat('graft hits score `$name`',
            |    ' overflowed DECIMAL(38,0)')) AS DECIMAL(38,0))
            |  ELSE $name END""".stripMargin).as(name)

  /** Adamic–Adar similarity (reference: flink-gelly
    * library/similarity/AdamicAdar.java): for vertex pairs sharing
    * neighbors, score = Σ over common neighbors w of 1/ln(deg(w)).
    * Shape: one neighbor-list self-join on the shared vertex + one
    * aggregate — per-pair work proportional to co-neighborhood size, all
    * hash-shuffled on vertex ids (no all-pairs step).
    *
    * Determinism: 1/ln(d) is a computed double, so each TERM is floored
    * at 10^6 scale and the aggregation sums exact integers (the Det
    * "dirty double" rule — a raw double sum would be order-dependent).
    *
    * @param edges undirected edge DataFrame (a, b)
    * @return (a, b, score_scaled) where score_scaled =
    *         Σ floor(1e6 / ln(deg(w))) as BIGINT
    */
  def adamicAdar(edges: DataFrame): DataFrame = {
    val und = undirect(edges.select(col("a").as("src"), col("b").as("dst")))
      .select(col("src").as("v"), col("dst").as("n"))
    val deg = und.groupBy(col("n")).agg(count(lit(1)).as("d"))
    // per-neighbor weight: common neighbor w contributes 1/ln(deg(w));
    // materialized once — both sides of the pair self-join read it.
    // Degree-1 vertices can never be a COMMON neighbor (they have one
    // neighbor), so dropping them is semantics-free and avoids ln(1)=0.
    val weighted = materialize(und.join(deg.where(col("d") > 1), "n")
      .select(col("v"), col("n"),
        floor(lit(1e6) / log(col("d").cast("double"))).cast("long").as("w")))
    weighted.as("x")
      .join(weighted.as("y"),
        col("x.n") === col("y.n") && col("x.v") < col("y.v"))
      .groupBy(col("x.v").as("a"), col("y.v").as("b"))
      .agg(sum(col("x.w")).as("score_scaled"))
  }

  /** Triadic census (reference: flink-gelly library/clustering/undirected/
    * TriadicCensus.java): counts of the four undirected triad classes over
    * all C(n,3) vertex triples — 0/1/2 edges and triangles — derived in
    * closed form from n, m, the wedge count w = Σ C(d,2) and the triangle
    * count t (the same identities the reference uses):
    * T3 = t, T2 = w − 3t, T1 = m(n−2) − 2w + 3t, T0 = C(n,3) − T1 − T2 − T3.
    * One degree aggregate + one triangle join — no per-triple work, all
    * exact integers.
    *
    * @param edges undirected (a, b) with a < b, deduplicated
    * @return single row (t0, t1, t2, t3)
    */
  def triadicCensus(edges: DataFrame): DataFrame = {
    val co = edges.select(col("a").cast("long"), col("b").cast("long"))
    // COALESCE the wedge sum: an EMPTY graph (sum over no rows = NULL)
    // must read as an all-zero census, not NULL-propagate — review r18
    // found the NULLs had silently round-tripped the hash gate because
    // the oracle propagated them identically (the sf0.1 co-purchase
    // graph is empty at the qualifying threshold)
    val stats = endpointDegrees(co).agg(count(lit(1)).as("n"),
      coalesce(sum(expr("d * (d - 1) DIV 2")), lit(0L)).cast("long").as("w"))
    val m = co.agg(count(lit(1)).as("m"))
    val t = triangles(co).agg(count(lit(1)).as("t"))
    // identities computed in DECIMAL(38,0): the BIGINT form died with
    // ANSI ARITHMETIC_OVERFLOW past n ≈ 2.1M vertices (this Spark
    // runs ANSI by default — probed r18) on the n·(n−1)·(n−2)
    // INTERMEDIATE even though the final census still fits BIGINT up
    // to n ≈ 3.8M, and DuckDB overflows at the same point — decimal
    // carries the headroom so every representable census computes;
    // n(n−1)(n−2) is divisible by 6 exactly, so the decimal division
    // is exact; the guarded cast raises a NAMED error only when a
    // count itself exceeds BIGINT.
    stats.crossJoin(m).crossJoin(t)
      .selectExpr(
        "CAST(n AS DECIMAL(38,0)) AS nd",
        "CAST(m AS DECIMAL(38,0)) AS md",
        "CAST(w AS DECIMAL(38,0)) AS wd",
        "CAST(t AS DECIMAL(38,0)) AS td")
      .selectExpr(
        "nd * (nd - 1) * (nd - 2) / 6 - (md * (nd - 2) - 2 * wd + 3 * td)" +
          " - (wd - 3 * td) - td AS t0",
        "md * (nd - 2) - 2 * wd + 3 * td AS t1",
        "wd - 3 * td AS t2",
        "td AS t3")
      .select(bigintOrError("t0"), bigintOrError("t1"),
        bigintOrError("t2"), bigintOrError("t3"))
  }

  /** The a<b triangle enumeration join — ONE definition (review r18:
    * it was pasted verbatim here, in [[localClusteringCoefficient]],
    * and in qg4's listing; a semantics fix must not need three
    * landings). Input: undirected (a, b) with a < b, deduplicated;
    * output one row (ta < tb < tc) per triangle. */
  private[graft] def triangles(co: DataFrame): DataFrame =
    co.as("e1")
      .join(co.as("e2"), col("e2.a") === col("e1.b"))
      .join(co.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("ta"), col("e1.b").as("tb"),
        col("e2.b").as("tc"))

  /** Endpoint-union degree count over an a<b edge list — the second
    * block [[triadicCensus]] and [[localClusteringCoefficient]] had
    * each hand-copied. */
  private[graft] def endpointDegrees(co: DataFrame): DataFrame =
    co.select(col("a").as("v"))
      .unionAll(co.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))

  /** Local clustering coefficient (reference: flink-gelly
    * library/clustering/undirected/LocalClusteringCoefficient.java): per
    * vertex, triangles(v) / C(deg(v), 2). Triangle membership counts and
    * degrees are exact integers; the final coefficient is one double
    * division of exact ints — bit-identical across engines.
    *
    * @param edges undirected (a, b) with a < b, deduplicated
    * @return (v, triangles, degree, coeff) per vertex, coeff = 0 for
    *         degree < 2
    */
  def localClusteringCoefficient(edges: DataFrame): DataFrame = {
    val co = edges.select(col("a").cast("long"), col("b").cast("long"))
    val deg = endpointDegrees(co)
    val tri = triangles(co)
    val perVertex = tri.select(col("ta").as("v"))
      .unionAll(tri.select(col("tb").as("v")))
      .unionAll(tri.select(col("tc").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("tc"))
    deg.join(perVertex, Seq("v"), "left")
      .select(col("v"), coalesce(col("tc"), lit(0L)).as("triangles"),
        col("d").as("degree"),
        when(col("d") >= 2,
          coalesce(col("tc"), lit(0L)).cast("double") * 2
            / (col("d") * (col("d") - 1)))
          .otherwise(0.0).as("coeff"))
  }

  /** Graph summarization (reference: flink-gelly library/Summarization
    * .java): contract vertices by a group value; output the summary
    * edges between groups with multiplicities. One projection + one
    * aggregate — the canonical "schema graph" operation.
    *
    * @param edges undirected (a, b)
    * @param group vertex id → group id column expression
    * @return (ga, gb, n_edges) with ga <= gb
    */
  def summarize(edges: DataFrame,
      group: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    val grouped = edges.select(group(col("a").cast("long")).as("g1"),
      group(col("b").cast("long")).as("g2"))
    grouped.select(least(col("g1"), col("g2")).as("ga"),
        greatest(col("g1"), col("g2")).as("gb"))
      .groupBy(col("ga"), col("gb")).agg(count(lit(1)).as("n_edges"))
  }

  /** Community detection with hop attenuation (reference: flink-gelly
    * library/CommunityDetection.java): label propagation where each label
    * carries a score; a vertex adopts the label with the highest score sum
    * among neighbors (ties to smallest label) and the adopted label's
    * score decays by `delta` per hop. Fixed iteration count and total
    * tie-breaks keep it deterministic (scores stay in exact 0.5 steps for
    * the default delta). */
  def communityDetection(edges: DataFrame,
      iterations: Int = 4, delta: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // src-partitioned cache: the per-round vote join reads it
    // exchange-free (optimization r18). The score sum stays exact at any
    // aggregation order (multiples of 0.5 well inside the double mantissa).
    val und = undirect(edges).repartition(col("src")).cache()
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).withColumn("score", lit(1.0))
    try {
      for (_ <- 1 to iterations) {
        val sums = und.join(labels, und("src") === labels("id"))
          .groupBy(col("dst").as("v"), col("lbl"))
          .agg(sum(col("score")).as("s"), max(col("score")).as("mx"))
        val w = Window.partitionBy(col("v"))
          .orderBy(col("s").desc, col("lbl").asc)
        val next = sums.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("v").as("id"), col("lbl"),
            greatest(col("mx") - delta, lit(0.0)).as("score"))
        labels = materialize(next)
      }
      labels.select(col("id"), col("lbl"))
    } finally und.unpersist()
  }

  /** Synchronous label propagation (community detection — reference:
    * flink-gelly library/LabelPropagation.java), made fully deterministic:
    * a FIXED iteration count (no convergence race) and a total tie-break —
    * each vertex adopts the most frequent neighbor label, ties to the
    * smallest label. Determinism matters twice: the DuckDB oracle unrolls
    * the same iterations as SQL, and synchronous LPA on bipartite-ish
    * graphs oscillates rather than converges, so "run to fixpoint" is not
    * well-defined anyway (the reference caps iterations for the same
    * reason).
    *
    * Each iteration = one edge-join + one (vertex, label) count + one
    * per-vertex argmax window — all hash-shuffles on vertex id, no
    * all-pairs step, so the round cost is O(E) shuffled bytes at any
    * cluster size. */
  def labelPropagation(edges: DataFrame,
      iterations: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // src-partitioned cache, same rationale as communityDetection
    val und = undirect(edges).repartition(col("src")).cache()
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
    try {
      for (i <- 1 to iterations) {
        val counts = und.join(labels, und("src") === labels("id"))
          .groupBy(col("dst").as("v"), col("lbl"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy(col("v"))
          .orderBy(col("c").desc, col("lbl").asc)
        val next = counts.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("v").as("id"), col("lbl"))
        labels = materialize(next)
      }
      labels
    } finally und.unpersist()
  }

  /** k-core decomposition by iterative peeling (Matula–Beck; beyond the
    * reference's Gelly library): repeatedly drop vertices with degree
    * < k until fixpoint — the surviving subgraph is the maximal one
    * where every vertex keeps ≥ k neighbors. Each round is one
    * partial-aggregated degree count + two key-partitioned semi-joins;
    * rounds are data-dependent but small in practice (the convergence
    * scalar is the per-round edge count, the graph-loop pattern).
    * Returns (id, core_deg): the k-core's vertices with their
    * within-core degree. */
  def kCore(edges: DataFrame, k: Int): DataFrame =
    kCoreWithRounds(edges, k)._1

  /** [[kCore]] plus the number of peel rounds it ran to reach fixpoint
    * (the final no-change round included). qg14's DuckDB oracle unrolls
    * a FIXED number of peel blocks, so GraphSpec asserts the measured
    * round count stays within that unroll depth — the coupling fails
    * loudly instead of silently diverging on a slower-converging
    * fixture. */
  def kCoreWithRounds(edges: DataFrame,
      k: Int): (DataFrame, Int) = {
    var e = materialize(undirect(edges))
    var n = e.count()
    var converged = false
    var rounds = 0
    while (!converged && n > 0) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("dg"))
        .where(col("dg") >= k).select(col("src").as("node"))
      val next = materialize(
        e.join(keep, e("src") === keep("node"), "left_semi")
          .join(keep, e("dst") === keep("node"), "left_semi"))
      val m = next.count()
      converged = m == n
      e = next
      n = m
      rounds += 1
    }
    (e.groupBy(col("src").as("id")).agg(count(lit(1)).as("core_deg")),
      rounds)
  }
}
