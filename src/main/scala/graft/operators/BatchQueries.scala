package graft.operators

import graft.{Det, Q, QueryModule}
import graft.Det._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Batch relational operator suite — the DataFrame re-expression of the
  * reference's DataSet/Table batch surface (SURVEY.md §2.3-2.5, §2.7-2.8):
  * projection/filter/case (Calc, DataSetCalc.scala), all join types
  * (DataSet.java:751-1118), group/distinct/rollup aggregation
  * (DataSetAggregate.scala, AggregateUtil.scala), scalar subqueries
  * (DataSetSingleRowJoin.scala), sort/offset/fetch (DataSetSort.scala) and
  * set operations (DataSetUnion/Intersect/Minus.scala).
  *
  * Scale notes: dimension joins broadcast the small side explicitly
  * (`broadcast(nation)` — nation/region are constant-size); fact-fact joins
  * shuffle on their equi-keys and rely on AQE for skew handling. Every
  * aggregation is declarative (`groupBy.agg`) so Catalyst plans map-side
  * partial aggregation; nothing here touches the driver.
  */
object BatchQueries extends QueryModule {

  private val cutoff = "TIMESTAMP '1998-09-02 00:00:00'"

  def all: Seq[Q] = Seq(

    // ---- aggregation ----------------------------------------------------

    // TPC-H Q1 shape: scan → filter(pushed to parquet) → hash agg → sort.
    // Reference: DataSetAggregate.scala:40 + DataSetCalc.scala:44.
    q("q1_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${DSUM("l_quantity")} AS sum_qty,
         |  ${DSUM("l_extendedprice")} AS sum_base_price,
         |  ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${DSUM("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
         |  ${DAVG("l_quantity")} AS avg_qty,
         |  ${DAVG("l_extendedprice")} AS avg_price,
         |  ${DAVG("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= $cutoff
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Plain grouped agg with min/max on timestamps.
    q("q2_orders_by_priority",
      s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
         |  ${DSUM("o_totalprice")} AS sum_price,
         |  MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, d) =>
        t(s, d, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("sum_price"),
            min(col("o_orderdate")).as("first_order"),
            max(col("o_orderdate")).as("last_order"))
          .orderBy(col("o_orderpriority"))
    },

    // DISTINCT aggregates (reference: DistinctAccumulator.scala +
    // AggregateExpandDistinctAggregatesRule; Catalyst expands natively).
    q("q3_distinct_aggs",
      s"""SELECT l_returnflag,
         |  COUNT(DISTINCT l_partkey) AS n_parts,
         |  COUNT(DISTINCT l_suppkey) AS n_supps,
         |  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sum_dist_qty,
         |  COUNT(*) AS n_rows
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            sum_distinct(col("l_quantity").cast(Det.DEC)).cast("double")
              .as("sum_dist_qty"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag"))
    },

    // Statistical aggregates computed from exact decimal sums so both
    // engines produce bit-identical doubles (stddev_samp/var_pop built-ins
    // are order-dependent streaming algorithms — same math, different bits).
    // Reference functions: STDDEV_POP/SAMP, VAR_POP/SAMP
    // (FunctionCatalog.scala:175-185).
    q("q4_stats_aggs", {
      val n = "CAST(COUNT(*) AS DOUBLE)"
      val sx = DSUM("l_extendedprice")
      val sx2 = DSUM("l_extendedprice * l_extendedprice")
      s"""SELECT l_returnflag,
         |  (($sx2 - (($sx * $sx) / $n)) / $n) AS var_pop,
         |  (($sx2 - (($sx * $sx) / $n)) / ($n - 1.0)) AS var_samp,
         |  sqrt(($sx2 - (($sx * $sx) / $n)) / $n) AS stddev_pop,
         |  sqrt(($sx2 - (($sx * $sx) / $n)) / ($n - 1.0)) AS stddev_samp,
         |  ($sx / $n) AS mean_price
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    }) { (s, d) =>
      val n = count(lit(1)).cast("double")
      val sx = dsum(col("l_extendedprice"))
      val sx2 = dsum(col("l_extendedprice") * col("l_extendedprice"))
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          ((sx2 - ((sx * sx) / n)) / n).as("var_pop"),
          ((sx2 - ((sx * sx) / n)) / (n - lit(1.0))).as("var_samp"),
          sqrt((sx2 - ((sx * sx) / n)) / n).as("stddev_pop"),
          sqrt((sx2 - ((sx * sx) / n)) / (n - lit(1.0))).as("stddev_samp"),
          (sx / n).as("mean_price"))
        .orderBy(col("l_returnflag"))
    },

    // Exact percentiles (median/p90), floor-scaled to cents: engines may
    // differ in interpolation rounding at the last ulp, so compare integers.
    q("q31_percentiles",
      """SELECT o_orderpriority,
        |  CAST(floor(quantile_cont(o_totalprice, 0.5) * 100.0) AS BIGINT) AS median_cents,
        |  CAST(floor(quantile_cont(o_totalprice, 0.9) * 100.0) AS BIGINT) AS p90_cents
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, d) =>
        t(s, d, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            floor(expr("percentile(o_totalprice, 0.5)") * 100.0).cast("long")
              .as("median_cents"),
            floor(expr("percentile(o_totalprice, 0.9)") * 100.0).cast("long")
              .as("p90_cents"))
          .orderBy(col("o_orderpriority"))
    },

    // Correlation & covariance from exact decimal sums (same determinism
    // strategy as q4's stddev): corr(qty, price) per return flag.
    q("q32_corr_covar", {
      val n = "CAST(COUNT(*) AS DOUBLE)"
      val sx = DSUM("l_quantity")
      val sy = DSUM("l_extendedprice")
      val sxy = DSUM("l_quantity * l_extendedprice")
      val sx2 = DSUM("l_quantity * l_quantity")
      val sy2 = DSUM("l_extendedprice * l_extendedprice")
      // floor-scaled outputs: the 18+-digit DECIMAL sums round to double
      // differently per engine at the last ulp, so integers at 1e-9/1e-3
      // grids are compared instead of raw doubles
      s"""SELECT l_returnflag,
         |  CAST(floor(((($n * $sxy) - ($sx * $sy))
         |    / (sqrt(($n * $sx2) - ($sx * $sx))
         |       * sqrt(($n * $sy2) - ($sy * $sy)))) * 1000000000.0) AS BIGINT) AS corr_e9,
         |  CAST(floor((($sxy / $n) - (($sx / $n) * ($sy / $n))) * 1000.0) AS BIGINT) AS covar_m3
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    }) { (s, d) =>
      val n = count(lit(1)).cast("double")
      val sx = dsum(col("l_quantity"))
      val sy = dsum(col("l_extendedprice"))
      val sxy = dsum(col("l_quantity") * col("l_extendedprice"))
      val sx2 = dsum(col("l_quantity") * col("l_quantity"))
      val sy2 = dsum(col("l_extendedprice") * col("l_extendedprice"))
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          floor((((n * sxy) - (sx * sy))
            / (sqrt((n * sx2) - (sx * sx)) * sqrt((n * sy2) - (sy * sy))))
            * 1000000000.0).cast("long").as("corr_e9"),
          floor(((sxy / n) - ((sx / n) * (sy / n))) * 1000.0).cast("long")
            .as("covar_m3"))
        .orderBy(col("l_returnflag"))
    },

    // max_by/min_by with struct tie-break (reference minBy/maxBy "first"
    // semantics, KeyedStream.java:849-986, made deterministic here by
    // including the unique key in the ordering struct).
    q("q5_argmax",
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders)
        |SELECT o_orderpriority,
        |  MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS top_order,
        |  MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS bottom_order
        |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, d) =>
        t(s, d, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            max_by(col("o_orderkey"),
              struct(col("o_totalprice"), col("o_orderkey"))).as("top_order"),
            min_by(col("o_orderkey"),
              struct(col("o_totalprice"), col("o_orderkey"))).as("bottom_order"))
          .orderBy(col("o_orderpriority"))
    },

    // ROLLUP + grouping_id (reference: DecomposeGroupingSetRule.scala —
    // Catalyst plans a single Expand instead of a union of aggregates).
    q("q6_rollup",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) {
      (s, d) =>
        t(s, d, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(grouping_id().cast("long").as("gid"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
    },

    // CUBE over two dims with per-cell revenue.
    q("q7_cube",
      s"""SELECT o_orderstatus, o_orderpriority,
         |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
         |  ${DSUM("o_totalprice")} AS sum_price, COUNT(*) AS n_orders
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) {
      (s, d) =>
        t(s, d, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(grouping_id().cast("long").as("gid"),
            dsum(col("o_totalprice")).as("sum_price"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first)
    },

    // COLLECT-style multiset per group, rendered as a sorted CSV string so
    // the hash compare is representation-stable (reference: COLLECT multiset
    // agg, CollectAggFunction.scala).
    q("q8_collect_list",
      """SELECT l_orderkey,
        |  array_to_string(list(l_linenumber ORDER BY l_linenumber), ',') AS line_numbers,
        |  COUNT(*) AS n_lines
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) {
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(
            concat_ws(",", sort_array(collect_list(col("l_linenumber"))))
              .as("line_numbers"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("l_orderkey"))
    },

    // ---- joins ----------------------------------------------------------

    // Multi-way equi-join: two fact-fact shuffle joins + an explicitly
    // broadcast dimension (nation is constant-size at any SF; customer/
    // orders/lineitem shuffle on their keys and AQE re-plans at runtime).
    // Reference: DataSetJoin.scala:51, JoinHint BROADCAST_HASH_*.
    q("q9_revenue_by_nation",
      s"""SELECT n_name,
         |  ${DSUM("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |  JOIN orders   ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation   ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },

    // LEFT OUTER join preserving customers with zero orders
    // (reference: LeftOuterJoinDriver.java / DataSet.java:841).
    q("q10_left_join",
      s"""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
         |  COALESCE(${DSUM("o_totalprice")}, 0.0) AS total_spent
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
        .orderBy(col("c_custkey"))
    },

    // FULL OUTER join of two aggregated sides
    // (reference: FullOuterJoinDriver.java).
    q("q11_full_join",
      """WITH c AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
        |     s AS (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
        |SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin) { (s, d) =>
      val c = t(s, d, "customer").groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val su = t(s, d, "supplier").groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, col("c_nationkey") === col("s_nationkey"), "full")
        .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    },

    // LEFT SEMI join = SQL EXISTS (reference: semi-join via
    // SubQueryRemoveRule, FlinkRuleSets.scala:35-38).
    q("q12_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"),
          "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // LEFT ANTI join = SQL NOT EXISTS.
    q("q13_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // Cross join (reference: CrossDriver.java, NESTEDLOOP_* strategies) —
    // both sides constant-size dimensions.
    q("q14_cross_join",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      t(s, d, "region").crossJoin(t(s, d, "nation"))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // Equi-join with non-equi residual (theta) predicate, aggregated.
    q("q15_theta_join",
      """SELECT s_nationkey, COUNT(*) AS n_pairs
        |FROM supplier JOIN customer
        |  ON c_nationkey = s_nationkey AND c_acctbal > s_acctbal
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin) { (s, d) =>
      t(s, d, "supplier")
        .join(t(s, d, "customer"),
          col("c_nationkey") === col("s_nationkey")
            && col("c_acctbal") > col("s_acctbal"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("s_nationkey"))
    },

    // Scalar-subquery comparison (reference: DataSetSingleRowJoin.scala —
    // planned here as a broadcast cross-join of a 1-row aggregate).
    q("q16_scalar_subquery",
      s"""SELECT l_returnflag, COUNT(*) AS n_above
         |FROM lineitem
         |WHERE l_quantity > (SELECT ${DAVG("l_quantity")} FROM lineitem)
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val li = t(s, d, "lineitem")
      val avgQty = li.agg(davg(col("l_quantity")).as("avg_qty"))
      li.crossJoin(broadcast(avgQty))
        .where(col("l_quantity") > col("avg_qty"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_above"))
        .orderBy(col("l_returnflag"))
    },

    // ---- row-level transforms -------------------------------------------

    // Projection + CASE WHEN + arithmetic (reference: Calc / DataSetCalc).
    q("q17_project_case",
      """SELECT p_partkey, upper(p_brand) AS brand_uc,
        |  CASE WHEN p_size < 10 THEN 'small'
        |       WHEN p_size < 30 THEN 'medium'
        |       ELSE 'large' END AS size_class,
        |  p_retailprice * 1.1 AS price_up
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_uc"),
        when(col("p_size") < 10, "small")
          .when(col("p_size") < 30, "medium")
          .otherwise("large").as("size_class"),
        (col("p_retailprice") * lit(1.1)).as("price_up"))
        .orderBy(col("p_partkey"))
    },

    // Filter predicates: IN / BETWEEN / LIKE / NOT (pushed to parquet scan).
    q("q18_filter_predicates",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderstatus IN ('O','F')
        |  AND o_totalprice BETWEEN 1000.0 AND 200000.0
        |  AND o_orderpriority LIKE '1-%'
        |  AND NOT (o_custkey = 0)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .where(col("o_orderstatus").isin("O", "F")
          && col("o_totalprice").between(1000.0, 200000.0)
          && col("o_orderpriority").like("1-%")
          && !(col("o_custkey") === 0))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // flatMap / UNNEST: split + explode → word frequencies
    // (reference: LogicalUnnestRule.scala; DataStream.flatMap).
    q("q19_explode_words",
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(20)
    },

    // UNION ALL of differently-sourced branches with a tag column
    // (reference: DataSetUnion.scala / DataStream.union).
    q("q20_union_all",
      """SELECT key, kind FROM (
        |  SELECT c_custkey AS key, 'customer' AS kind FROM customer
        |  UNION ALL
        |  SELECT s_suppkey AS key, 'supplier' AS kind FROM supplier)
        |ORDER BY kind, key""".stripMargin) { (s, d) =>
      val a = t(s, d, "customer")
        .select(col("c_custkey").as("key"), lit("customer").as("kind"))
      val b = t(s, d, "supplier")
        .select(col("s_suppkey").as("key"), lit("supplier").as("kind"))
      a.unionAll(b).orderBy(col("kind"), col("key"))
    },

    // ---- sort / limit / top-k -------------------------------------------

    // Total order + OFFSET + FETCH (reference: DataSetSort.scala:36 —
    // Spark range-partitions the sort and plans a global limit).
    q("q21_sort_limit_offset",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20 OFFSET 10""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .offset(10).limit(20)
    },

    // Top-k: Catalyst plans TakeOrderedAndProject (no full sort at scale).
    q("q22_topk",
      """SELECT l_orderkey, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey LIMIT 10""".stripMargin) {
      (s, d) =>
        t(s, d, "lineitem")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"))
          .select(col("l_orderkey"), col("l_extendedprice"))
          .limit(10)
    },

    // ---- set operations -------------------------------------------------

    q("q23_intersect",
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin) {
      (s, d) =>
        t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
          .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
          .orderBy(col("nationkey"))
    },

    q("q24_except",
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin) {
      (s, d) =>
        t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
          .except(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
          .orderBy(col("nationkey"))
    },

    q("q25_union_distinct",
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin) {
      (s, d) =>
        t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
          .union(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
          .distinct()
          .orderBy(col("nationkey"))
    },

    // Multiset variants (reference: DataSetIntersect/Minus with all=true).
    // Both sides floor() before the int cast: DuckDB CAST(double AS INT)
    // ROUNDS (2.6 → 3) where Spark's cast TRUNCATES (2.6 → 2) — identical
    // only because fixture quantities are integral; flooring first makes the
    // cast semantics explicit and engine-independent. The ORDER BY carries
    // an explicit NULLS FIRST (adversarial-fixture check): qty derives from
    // the NULLABLE l_quantity, set ops match NULLs null-safely in both
    // engines, and the two engines' implicit defaults DIFFER (Spark ASC =
    // NULLS FIRST, DuckDB ASC = NULLS LAST) — a surviving NULL row would
    // land at opposite ends of the output.
    q("q26_intersect_all",
      """SELECT qty FROM (
        |  SELECT CAST(floor(l_quantity) AS INTEGER) AS qty FROM lineitem WHERE l_returnflag = 'A'
        |  INTERSECT ALL
        |  SELECT CAST(floor(l_quantity) AS INTEGER) AS qty FROM lineitem WHERE l_returnflag = 'N')
        |ORDER BY qty NULLS FIRST""".stripMargin) { (s, d) =>
      val li = t(s, d, "lineitem")
      li.where(col("l_returnflag") === "A")
        .select(floor(col("l_quantity")).cast("int").as("qty"))
        .intersectAll(li.where(col("l_returnflag") === "N")
          .select(floor(col("l_quantity")).cast("int").as("qty")))
        .orderBy(col("qty").asc_nulls_first)
    },

    q("q27_except_all",
      """SELECT qty FROM (
        |  SELECT CAST(floor(l_quantity) AS INTEGER) AS qty FROM lineitem WHERE l_returnflag = 'A'
        |  EXCEPT ALL
        |  SELECT CAST(floor(l_quantity) AS INTEGER) AS qty FROM lineitem WHERE l_returnflag = 'R')
        |ORDER BY qty NULLS FIRST""".stripMargin) { (s, d) =>
      val li = t(s, d, "lineitem")
      li.where(col("l_returnflag") === "A")
        .select(floor(col("l_quantity")).cast("int").as("qty"))
        .exceptAll(li.where(col("l_returnflag") === "R")
          .select(floor(col("l_quantity")).cast("int").as("qty")))
        .orderBy(col("qty").asc_nulls_first)
    },

    // Null-safe equi-join (IS NOT DISTINCT FROM / <=> — reference
    // FunctionCatalog.scala:319): nullable keys derived via nullif, so NULL
    // keys pair with NULL keys.
    q("q29_nullsafe_join",
      """WITH a AS (SELECT c_custkey, nullif(c_nationkey % 5, 0) AS k FROM customer),
        |     b AS (SELECT s_suppkey, nullif(s_nationkey % 5, 0) AS k FROM supplier)
        |SELECT a.k AS k, COUNT(*) AS n_pairs
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |GROUP BY a.k ORDER BY k NULLS FIRST""".stripMargin) { (s, d) =>
      val a = t(s, d, "customer")
        .select(col("c_custkey"), nullif(col("c_nationkey") % 5, lit(0)).as("k"))
      val b = t(s, d, "supplier")
        .select(col("s_suppkey"), nullif(col("s_nationkey") % 5, lit(0)).as("ak"))
      a.join(b, col("k") <=> col("ak"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("k").asc_nulls_first)
    },

    // posexplode / UNNEST WITH ORDINALITY: token positions per document.
    q("q30_posexplode",
      """SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, tk[i] AS word
        |FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |     generate_series(1, 5) g(i)
        |WHERE len(tk) >= 5 AND doc_id < 50
        |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .where(col("doc_id") < 50)
        .withColumn("tk", split(col("text"), " "))
        .where(size(col("tk")) >= 5)
        .select(col("doc_id"),
          posexplode(expr("slice(tk, 1, 5)")).as(Seq("pos", "word")))
        .orderBy(col("doc_id"), col("pos"))
    },

    // Row-level dedup (reference: DataSet.distinct / DataSetDistinct.scala).
    q("q28_distinct_rows",
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .select(col("o_orderstatus"), col("o_orderpriority"))
        .distinct()
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    }
  )
}
