package graft.functions

import graft.{Q, QueryModule}
import org.apache.spark.sql.functions._

/** Scalar-function conformance queries — one per category of the reference's
  * function catalog (flink-table/.../validate/FunctionCatalog.scala:154-282:
  * string :188-204, math :207-237, temporal :240-249, hashing :276-282,
  * comparison/conditional :154-172). Every function maps to a Spark built-in
  * (codegen'd); the oracle SQL re-expresses the same computation in DuckDB's
  * dialect (regexp_replace needs the 'g' flag there, dayofweek is 0-based,
  * ceil returns DOUBLE, etc.).
  *
  * Transcendentals (exp/ln/sin/...) are wrapped in round(x, 6): JVM Math and
  * C libm may differ in the last ulp, and 6 decimals is tight enough for any
  * analytical use while absorbing that difference (and the half-rounding
  * divergence between Spark's shortest-repr HALF_UP and DuckDB's
  * true-binary-value rounding, which bites at finer scales).
  */
object ScalarQueries extends QueryModule {

  def all: Seq[Q] = Seq(

    q("qs1_string_funcs",
      """SELECT p_partkey,
        |  upper(p_name) AS name_uc,
        |  lower(p_brand) AS brand_lc,
        |  substr(p_name, 1, 12) AS name_prefix,
        |  length(p_name) AS name_len,
        |  lpad(p_brand, 12, '*') AS brand_lpad,
        |  rpad(p_brand, 12, '#') AS brand_rpad,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  replace(p_type, ' ', '_') AS type_us,
        |  instr(p_name, 'a') AS first_a,
        |  reverse(p_brand) AS brand_rev,
        |  repeat(p_brand, 2) AS brand_x2,
        |  translate(p_type, 'aeiou', 'AEIOU') AS type_vowels,
        |  trim(concat('  ', p_brand, '  ')) AS brand_trim,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("name_uc"),
        lower(col("p_brand")).as("brand_lc"),
        substring(col("p_name"), 1, 12).as("name_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        lpad(col("p_brand"), 12, "*").as("brand_lpad"),
        rpad(col("p_brand"), 12, "#").as("brand_rpad"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_type"), " ", "_").as("type_us"),
        instr(col("p_name"), "a").cast("long").as("first_a"),
        reverse(col("p_brand")).as("brand_rev"),
        repeat(col("p_brand"), 2).as("brand_x2"),
        translate(col("p_type"), "aeiou", "AEIOU").as("type_vowels"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("brand_trim"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"))
        .orderBy(col("p_partkey"))
    },

    q("qs2_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  abs(0.0 - l_extendedprice) AS abs_price,
        |  CAST(ceil(l_discount * 100.0) AS BIGINT) AS ceil_disc,
        |  CAST(floor(l_discount * 100.0) AS BIGINT) AS floor_disc,
        |  round(sqrt(l_extendedprice), 2) AS sqrt_price,
        |  round(exp(l_discount), 6) AS exp_disc,
        |  round(ln(l_extendedprice), 6) AS ln_price,
        |  round(log10(l_extendedprice), 6) AS log10_price,
        |  round(pow(1.0 + l_discount, 2.0), 6) AS pow_disc,
        |  CAST(floor(l_quantity) AS INTEGER) % 7 AS qty_mod7,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_disc,
        |  l_extendedprice * 0.1 AS price_tenth,
        |  round(sin(l_discount), 6) AS sin_disc,
        |  round(cos(l_discount), 6) AS cos_disc,
        |  round(tan(l_discount), 6) AS tan_disc,
        |  round(atan(l_discount), 6) AS atan_disc,
        |  round(degrees(l_discount), 6) AS deg_disc,
        |  round(radians(l_quantity), 6) AS rad_qty,
        |  round(pi(), 6) AS pi_val
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount,
        |  l_quantity, l_partkey, l_suppkey""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        abs(lit(0.0) - col("l_extendedprice")).as("abs_price"),
        ceil(col("l_discount") * 100.0).as("ceil_disc"),
        floor(col("l_discount") * 100.0).as("floor_disc"),
        round(sqrt(col("l_extendedprice")), 2).as("sqrt_price"),
        round(exp(col("l_discount")), 6).as("exp_disc"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        round(log10(col("l_extendedprice")), 6).as("log10_price"),
        round(pow(lit(1.0) + col("l_discount"), 2.0), 6).as("pow_disc"),
        // floor before the int cast — DuckDB's double→int cast ROUNDS where
        // Spark's TRUNCATES; flooring first pins one semantics in both
        (floor(col("l_quantity")).cast("int") % 7).as("qty_mod7"),
        signum(col("l_discount") - 0.05).as("sign_disc"),
        (col("l_extendedprice") * 0.1).as("price_tenth"),
        round(sin(col("l_discount")), 6).as("sin_disc"),
        round(cos(col("l_discount")), 6).as("cos_disc"),
        round(tan(col("l_discount")), 6).as("tan_disc"),
        round(atan(col("l_discount")), 6).as("atan_disc"),
        round(degrees(col("l_discount")), 6).as("deg_disc"),
        round(radians(col("l_quantity")), 6).as("rad_qty"),
        round(lit(math.Pi), 6).as("pi_val"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          col("l_discount"), col("l_quantity"), col("l_partkey"),
          col("l_suppkey"))
    },

    // Temporal functions. DuckDB dayofweek is 0-based (Sunday=0), Spark's is
    // 1-based (Sunday=1) → +1 on the oracle side. add-month / diff / trunc /
    // format all use interval arithmetic valid in both engines.
    q("qs3_temporal_funcs",
      """SELECT o_orderkey,
        |  extract(year FROM o_orderdate) AS yr,
        |  extract(month FROM o_orderdate) AS mo,
        |  extract(day FROM o_orderdate) AS dy,
        |  quarter(o_orderdate) AS qtr,
        |  dayofweek(o_orderdate) + 1 AS dow,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M') AS formatted,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  o_orderdate + INTERVAL 1 MONTH AS plus_month,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS days_to_1999,
        |  CASE WHEN o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |       AND TIMESTAMP '1995-01-01 00:00:00' < o_orderdate
        |       THEN TRUE ELSE FALSE END AS in_window
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dy"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm").as("formatted"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 1 MONTH")).as("plus_month"),
        datediff(lit("1999-01-01").cast("date"), col("o_orderdate"))
          .cast("long").as("days_to_1999"),
        (col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp")
          && lit("1995-01-01 00:00:00").cast("timestamp") < col("o_orderdate"))
          .as("in_window"))
        .orderBy(col("o_orderkey"))
    },

    // Hash functions (FunctionCatalog.scala:276-282). md5/sha256 hash the
    // UTF-8 bytes identically in both engines. sha1/sha224/... have no
    // DuckDB twin — covered by unit tests instead.
    q("qs4_hash_funcs",
      """SELECT c_custkey,
        |  md5(c_name) AS md5_name,
        |  sha256(c_name) AS sha256_name,
        |  md5(concat(c_name, '|', c_mktsegment)) AS md5_composite
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        md5(col("c_name")).as("md5_name"),
        sha2(col("c_name"), 256).as("sha256_name"),
        md5(concat(col("c_name"), lit("|"), col("c_mktsegment")))
          .as("md5_composite"))
        .orderBy(col("c_custkey"))
    },

    // Conditional / null-handling operators (IF, CASE, NULLIF, COALESCE,
    // IS [NOT] DISTINCT FROM — FunctionCatalog.scala:154-172, :319-320).
    q("qs5_conditional_funcs",
      """SELECT o_orderkey,
        |  nullif(o_orderstatus, 'O') AS status_or_null,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_filled,
        |  CASE WHEN o_totalprice > 100000.0 THEN 'big' ELSE 'small' END AS bucket,
        |  o_orderstatus IS NOT DISTINCT FROM 'F' AS is_f,
        |  greatest(o_totalprice, 150000.0) AS at_least,
        |  least(o_totalprice, 150000.0) AS at_most,
        |  o_orderpriority IS NULL AS prio_null,
        |  o_orderpriority IS NOT NULL AS prio_not_null
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
          .as("status_filled"),
        when(col("o_totalprice") > 100000.0, "big").otherwise("small")
          .as("bucket"),
        (col("o_orderstatus") <=> lit("F")).as("is_f"),
        greatest(col("o_totalprice"), lit(150000.0)).as("at_least"),
        least(col("o_totalprice"), lit(150000.0)).as("at_most"),
        col("o_orderpriority").isNull.as("prio_null"),
        col("o_orderpriority").isNotNull.as("prio_not_null"))
        .orderBy(col("o_orderkey"))
    },

    // Collection constructors/access (FunctionCatalog.scala:252-265):
    // array/map/struct build + element_at/cardinality, rendered to flat
    // hash-stable columns.
    q("qs6_collection_funcs",
      """SELECT n_nationkey,
        |  ['k', n_name][1] AS first_elem,
        |  len(['k', n_name]) AS arr_len,
        |  array_to_string([n_name, 'x', 'y'], '-') AS arr_join,
        |  struct_extract({'key': n_nationkey, 'name': n_name}, 'name') AS s_name,
        |  (map { 'nk': n_nationkey }['nk'])[1] AS m_val
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      t(s, d, "nation").select(
        col("n_nationkey"),
        // getItem, not element_at: ElementAt-over-CreateArray hits a
        // whole-stage-codegen bug in Spark 4.1.2 ("isNull_1 is not an
        // rvalue") that silently drops the stage to interpreted eval
        array(lit("k"), col("n_name")).getItem(0).as("first_elem"),
        size(array(lit("k"), col("n_name"))).cast("long").as("arr_len"),
        concat_ws("-", array(col("n_name"), lit("x"), lit("y"))).as("arr_join"),
        struct(col("n_nationkey").as("key"), col("n_name").as("name"))
          .getField("name").as("s_name"),
        element_at(map(lit("nk"), col("n_nationkey")), "nk").as("m_val"))
        .orderBy(col("n_nationkey"))
    },

    // Array/collection function catalog over real array data (tokens):
    // sort, distinct, contains, position, min/max, slice, flatten.
    // Dialect alignment (adversarial-fixture check): DuckDB's
    // array_to_string([], sep) is NULL where Spark's array_join([], sep)
    // is '' — the mid_slice CASE pins empty-slice → '' while keeping a
    // NULL input array NULL in both engines (a < 2-token doc's [2:4]
    // slice is empty; the benign fixture never produces one).
    q("qs8_array_funcs",
      """WITH tk AS (SELECT doc_id, string_split(text, ' ')[1:8] AS a
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id,
        |  array_to_string(list_sort(a), ' ') AS sorted_tokens,
        |  CAST(len(list_distinct(a)) AS INTEGER) AS n_distinct,
        |  list_contains(a, 'the') AS has_the,
        |  CAST(coalesce(list_position(a, 'data'), 0) AS INTEGER) AS data_pos,
        |  list_min(a) AS min_tok,
        |  list_max(a) AS max_tok,
        |  CASE WHEN a IS NULL THEN NULL
        |    ELSE coalesce(array_to_string(a[2:4], '|'), '') END AS mid_slice,
        |  array_to_string(flatten([a[1:2], a[3:4]]), ',') AS flat
        |FROM tk ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .where(col("doc_id") < 100)
        .withColumn("a", expr("slice(split(text, ' '), 1, 8)"))
        .select(col("doc_id"),
          array_join(array_sort(col("a")), " ").as("sorted_tokens"),
          size(array_distinct(col("a"))).as("n_distinct"),
          array_contains(col("a"), "the").as("has_the"),
          // coalesce aligns the NULL-ARRAY input (null text) with the
          // oracle's coalesce: Spark's array_position returns 0 for an
          // absent element but NULL for a null array, where the oracle's
          // list_position is NULL for both and coalesces to 0
          coalesce(array_position(col("a"), "data"), lit(0L)).cast("int")
            .as("data_pos"),
          array_min(col("a")).as("min_tok"),
          array_max(col("a")).as("max_tok"),
          array_join(expr("slice(a, 2, 3)"), "|").as("mid_slice"),
          array_join(flatten(array(expr("slice(a, 1, 2)"),
            expr("slice(a, 3, 2)"))), ",").as("flat"))
        .orderBy(col("doc_id"))
    },

    // COLLECT multiset via the Aggregator-based UDAF (reference:
    // CollectAggFunction.scala / SQL COLLECT → MULTISET), rendered as a
    // canonical "value:count" string for the hash compare.
    // NULL alignment (adversarial-fixture check): the UDAF skips NULL
    // inputs (SQL aggregate semantics), string_agg's NULL elements drop
    // on the oracle side, and a group whose EVERY quantity is NULL
    // renders the empty multiset '' in both engines (the COALESCE —
    // string_agg over all-NULLs is NULL where array_join of an empty
    // map is '').
    q("qs7_collect_multiset",
      """WITH c AS (SELECT l_orderkey, CAST(floor(l_quantity) AS INTEGER) AS qty,
        |    COUNT(*) AS n
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_orderkey,
        |  COALESCE(string_agg(qty || ':' || n, ',' ORDER BY qty), '') AS multiset
        |FROM c GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, d) =>
      graft.functions.Udafs.register(s)
      t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(expr("graft_multiset(CAST(floor(l_quantity) AS INT))").as("ms"))
        .select(col("l_orderkey"), expr(
          """array_join(transform(array_sort(map_entries(ms)),
            |  e -> concat(CAST(e.key AS STRING), ':', CAST(e.value AS STRING))), ',')""".stripMargin)
          .as("multiset"))
        .orderBy(col("l_orderkey"))
    },

    // UDTF through a NATIVE Catalyst Generator (reference: TableFunction
    // `Split` from the flink-table UDTF docs — collect() per row): the
    // planner runs graft.functions.SplitRows inside a Generate node like
    // explode, not a UDF-wrapped array. Counted per token so the output
    // is deterministic.
    q("qs9_udtf_split",
      """SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token
        |  FROM documents WHERE doc_id < 100)
        |GROUP BY token ORDER BY n DESC, token LIMIT 30""".stripMargin) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      t(s, d, "documents")
        .where(col("doc_id") < 100)
        .select(expr("graft_split_rows(text, ' ')").as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(30)
    },

    // Mergeable KMV bottom-k distinct sketch (Udafs.KmvAgg): distinct
    // l_partkey per returnflag, estimated from the 64 smallest md5-60bit
    // hashes. DETERMINISTIC (unlike HLL's murmur registers), so the
    // oracle replicates it bit-for-bit: same hex-nibble hash decode as
    // qp6, k-th smallest per group, the same exact-in-double
    // floor(63 · 2^60 / h_k) estimator (63·2^60 has a 6-bit mantissa —
    // exactly representable; the one division and floor are IEEE on both
    // engines).
    q("qs10_kmv_distinct",
      """WITH v AS (SELECT DISTINCT l_returnflag AS flag,
        |    CAST(l_partkey AS VARCHAR) AS pk FROM lineitem),
        |h AS (SELECT DISTINCT flag,
        |    list_aggregate(list_transform(generate_series(1, 15), i ->
        |      CAST(strpos('0123456789abcdef',
        |          substr(md5(pk), CAST(i AS INTEGER), 1)) - 1 AS BIGINT)
        |        * (CAST(1 AS BIGINT) << CAST((15 - i) * 4 AS INTEGER))),
        |      'sum') AS hv
        |  FROM v),
        |r AS (SELECT flag, hv,
        |    row_number() OVER (PARTITION BY flag ORDER BY hv) AS rn,
        |    COUNT(*) OVER (PARTITION BY flag) AS n
        |  FROM h)
        |SELECT flag AS l_returnflag,
        |  CAST(CASE WHEN MAX(n) < 64 THEN MAX(n)
        |    ELSE floor(63.0 * 1152921504606846976.0
        |      / MAX(CASE WHEN rn = 64 THEN hv END)) END AS BIGINT)
        |    AS approx_distinct
        |FROM r GROUP BY flag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      graft.functions.Udafs.register(s)
      t(s, d, "lineitem")
        .selectExpr("l_returnflag", "CAST(l_partkey AS STRING) AS pk")
        .groupBy(col("l_returnflag"))
        .agg(expr("graft_kmv(pk)").as("approx_distinct"))
        .orderBy(col("l_returnflag"))
    },

    // Mergeable QUANTILE sketch (Udafs.KllAgg — the dashboard trio's
    // third seat): per event_type, the sketch is the 64 rows with the
    // smallest md5-60bit(event_id) hashes carrying their `value`s — a
    // deterministic uniform sample whose membership is a pure function
    // of the data, so the DuckDB oracle replicates it bit-for-bit (same
    // hex-nibble hash, bottom-64 by hash, rank over the sample). Median
    // and p90 are rank statistics of the sample; `value` is a raw
    // 2-decimal data column, so the doubles compare exactly.
    // NULL metrics are excluded on BOTH sides (adversarial-fixture
    // check): the sketch skips NULL-valued inputs like every SQL
    // quantile aggregate, and the oracle filters them before sampling.
    q("qs11_kll_quantiles",
      """WITH h AS (SELECT event_type, value AS v,
        |    list_aggregate(list_transform(generate_series(1, 15), i ->
        |      CAST(strpos('0123456789abcdef',
        |          substr(md5(CAST(event_id AS VARCHAR)),
        |            CAST(i AS INTEGER), 1)) - 1 AS BIGINT)
        |        * (CAST(1 AS BIGINT) << CAST((15 - i) * 4 AS INTEGER))),
        |      'sum') AS hv
        |  FROM events WHERE value IS NOT NULL),
        |d AS (SELECT event_type, hv, MIN(v) AS v FROM h GROUP BY 1, 2),
        |r AS (SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        |  FROM d),
        |s AS (SELECT event_type, v FROM r WHERE rn <= 64),
        |o AS (SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY v) AS vr,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM s)
        |SELECT event_type,
        |  MAX(CASE WHEN vr = (n + 1) // 2 THEN v END) AS median_est,
        |  MAX(CASE WHEN vr = CAST(ceil(0.9 * n) AS BIGINT) THEN v END)
        |    AS p90_est
        |FROM o GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, d) =>
      graft.functions.Udafs.register(s)
      t(s, d, "events")
        .selectExpr("event_type", "CAST(event_id AS STRING) AS id", "value")
        .groupBy(col("event_type"))
        .agg(expr("graft_kll(id, value)").as("sample"))
        .selectExpr("event_type",
          "element_at(sample, int((size(sample) + 1) div 2)) AS median_est",
          "element_at(sample, int(ceil(0.9 * size(sample)))) AS p90_est")
        .orderBy(col("event_type"))
    },

    // Theta-framework set operations over KMV bottom-k sketches
    // (Udafs.kmvIntersect/kmvDiff — the round-8 VERDICT #7 item): the
    // distinct part sets of high-quantity (>=45) vs low-quantity (<=5)
    // lineitems, intersected and differenced from their 64-hash sketches.
    // DETERMINISTIC and bit-replicable: both engines restrict to the
    // shared theta (the smaller 64th hash), count matches, and scale
    // with TRUNCATING integer division (BigInt in Scala, HUGEINT `//`
    // in DuckDB — both floor for positive operands).
    q("qs12_kmv_set_ops",
      """WITH v AS (
        |  SELECT CASE WHEN l_quantity >= 45.0 THEN 'hi' ELSE 'lo' END AS flag,
        |    CAST(l_partkey AS VARCHAR) AS pk
        |  FROM lineitem WHERE l_quantity >= 45.0 OR l_quantity <= 5.0),
        |h AS (SELECT DISTINCT flag,
        |    list_aggregate(list_transform(generate_series(1, 15), i ->
        |      CAST(strpos('0123456789abcdef',
        |          substr(md5(pk), CAST(i AS INTEGER), 1)) - 1 AS BIGINT)
        |        * (CAST(1 AS BIGINT) << CAST((15 - i) * 4 AS INTEGER))),
        |      'sum') AS hv
        |  FROM v),
        |r AS (SELECT flag, hv,
        |    row_number() OVER (PARTITION BY flag ORDER BY hv) AS rn,
        |    COUNT(*) OVER (PARTITION BY flag) AS n FROM h),
        |th AS (SELECT MIN(CASE WHEN mx < 64
        |      THEN CAST(1152921504606846976 AS BIGINT) ELSE h64 END) AS theta
        |  FROM (SELECT flag, MAX(n) AS mx,
        |      MAX(CASE WHEN rn = 64 THEN hv END) AS h64 FROM r GROUP BY flag)),
        |sa AS (SELECT hv FROM r WHERE flag = 'hi' AND rn <= 64),
        |sb AS (SELECT hv FROM r WHERE flag = 'lo' AND rn <= 64),
        |ic AS (SELECT COUNT(*) AS c FROM sa JOIN sb USING (hv), th
        |  WHERE sa.hv < theta),
        |ac AS (SELECT COUNT(*) AS c FROM sa, th
        |  WHERE hv < theta AND hv NOT IN (SELECT hv FROM sb)),
        |bc AS (SELECT COUNT(*) AS c FROM sb, th
        |  WHERE hv < theta AND hv NOT IN (SELECT hv FROM sa))
        |SELECT
        |  CAST(CAST(ic.c AS HUGEINT) * 1152921504606846976 // th.theta
        |    AS BIGINT) AS inter_est,
        |  CAST(CAST(ac.c AS HUGEINT) * 1152921504606846976 // th.theta
        |    AS BIGINT) AS hi_only_est,
        |  CAST(CAST(bc.c AS HUGEINT) * 1152921504606846976 // th.theta
        |    AS BIGINT) AS lo_only_est
        |FROM ic, ac, bc, th""".stripMargin) { (s, d) =>
      graft.functions.Udafs.register(s)
      t(s, d, "lineitem")
        .where("l_quantity >= 45.0 OR l_quantity <= 5.0")
        .selectExpr("l_quantity", "CAST(l_partkey AS STRING) AS pk")
        .agg(
          expr("graft_kmv_sketch(CASE WHEN l_quantity >= 45.0 THEN pk END)")
            .as("ska"),
          expr("graft_kmv_sketch(CASE WHEN l_quantity <= 5.0 THEN pk END)")
            .as("skb"))
        .selectExpr(
          "graft_kmv_intersect(ska, skb) AS inter_est",
          "graft_kmv_diff(ska, skb) AS hi_only_est",
          "graft_kmv_diff(skb, ska) AS lo_only_est")
    },

    // Union + Jaccard finishers over the same two sketches: union =
    // merge-and-trim + the qs10 estimator (bit-replicated: 63·2^60 is
    // mantissa-exact, one IEEE division + floor); jaccard = integer
    // counts over the shared theta, one double division.
    q("qs13_kmv_union_jaccard",
      """WITH v AS (
        |  SELECT CASE WHEN l_quantity >= 45.0 THEN 'hi' ELSE 'lo' END AS flag,
        |    CAST(l_partkey AS VARCHAR) AS pk
        |  FROM lineitem WHERE l_quantity >= 45.0 OR l_quantity <= 5.0),
        |h AS (SELECT DISTINCT flag,
        |    list_aggregate(list_transform(generate_series(1, 15), i ->
        |      CAST(strpos('0123456789abcdef',
        |          substr(md5(pk), CAST(i AS INTEGER), 1)) - 1 AS BIGINT)
        |        * (CAST(1 AS BIGINT) << CAST((15 - i) * 4 AS INTEGER))),
        |      'sum') AS hv
        |  FROM v),
        |r AS (SELECT flag, hv,
        |    row_number() OVER (PARTITION BY flag ORDER BY hv) AS rn,
        |    COUNT(*) OVER (PARTITION BY flag) AS n FROM h),
        |th AS (SELECT MIN(CASE WHEN mx < 64
        |      THEN CAST(1152921504606846976 AS BIGINT) ELSE h64 END) AS theta
        |  FROM (SELECT flag, MAX(n) AS mx,
        |      MAX(CASE WHEN rn = 64 THEN hv END) AS h64 FROM r GROUP BY flag)),
        |sa AS (SELECT hv FROM r WHERE flag = 'hi' AND rn <= 64),
        |sb AS (SELECT hv FROM r WHERE flag = 'lo' AND rn <= 64),
        |u AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn,
        |    COUNT(*) OVER () AS n
        |  FROM (SELECT DISTINCT hv
        |        FROM (SELECT hv FROM sa UNION SELECT hv FROM sb))),
        |uest AS (SELECT CAST(CASE WHEN MAX(n) < 64 THEN MAX(n)
        |    ELSE floor(63.0 * 1152921504606846976.0
        |      / MAX(CASE WHEN rn = 64 THEN hv END)) END AS BIGINT)
        |    AS union_est FROM u),
        |ic AS (SELECT COUNT(*) AS c FROM sa JOIN sb USING (hv), th
        |  WHERE sa.hv < theta),
        |uc AS (SELECT COUNT(*) AS c FROM (SELECT DISTINCT hv
        |    FROM (SELECT hv FROM sa UNION SELECT hv FROM sb)), th
        |  WHERE hv < theta)
        |SELECT uest.union_est,
        |  CAST(ic.c AS DOUBLE) / CAST(uc.c AS DOUBLE) AS jaccard_est
        |FROM uest, ic, uc""".stripMargin) { (s, d) =>
      graft.functions.Udafs.register(s)
      t(s, d, "lineitem")
        .where("l_quantity >= 45.0 OR l_quantity <= 5.0")
        .selectExpr("l_quantity", "CAST(l_partkey AS STRING) AS pk")
        .agg(
          expr("graft_kmv_sketch(CASE WHEN l_quantity >= 45.0 THEN pk END)")
            .as("ska"),
          expr("graft_kmv_sketch(CASE WHEN l_quantity <= 5.0 THEN pk END)")
            .as("skb"))
        .selectExpr(
          "graft_kmv_union(ska, skb) AS union_est",
          "graft_kmv_jaccard(ska, skb) AS jaccard_est")
    },

    // Count-Min FREQUENCY sketch (graft_cms): one 4 KiB counter-matrix
    // sketch over all of lineitem, point-estimated for a fixed key list
    // (incl. an absent key — CMS answers those too, with the collision
    // overestimate the w=512 bound predicts). Counters are sums, so the
    // sketch is order-independent and the oracle can restate the exact
    // Carter-Wegman bucket arithmetic in SQL: est(k) = min over hash rows
    // of the total count landing in k's bucket. Bit-exact.
    q("qs14_cms_freq",
      """WITH f AS (SELECT l_partkey AS v, COUNT(*) AS c FROM lineitem
        |    WHERE l_partkey IS NOT NULL GROUP BY 1),
        |ks AS (SELECT * FROM (VALUES (3), (57), (400), (1234), (999999)) t(k)),
        |hp AS (SELECT * FROM (VALUES (0, 1103515245, 12345), (1, 1299709, 7919),
        |    (2, 104729, 271), (3, 97, 31)) t(j, a, b)),
        |est AS (
        |  SELECT ks.k, hp.j, COALESCE(SUM(f.c), 0) AS e
        |  FROM ks CROSS JOIN hp LEFT JOIN f
        |    ON ((CAST(hp.a AS BIGINT)
        |          * (((f.v % 2147483647) + 2147483647) % 2147483647)
        |          + hp.b) % 2147483647) % 512
        |     = ((CAST(hp.a AS BIGINT)
        |          * (((CAST(ks.k AS BIGINT) % 2147483647) + 2147483647)
        |             % 2147483647)
        |          + hp.b) % 2147483647) % 512
        |  GROUP BY 1, 2)
        |SELECT CAST(k AS BIGINT) AS k, CAST(MIN(e) AS BIGINT) AS est
        |FROM est GROUP BY k ORDER BY k""".stripMargin) { (s, d) =>
      graft.functions.Udafs.register(s)
      val sk = t(s, d, "lineitem").agg(expr("graft_cms(l_partkey)").as("sk"))
      val ks = s.createDataFrame(
        java.util.Arrays.asList(Seq(3L, 57L, 400L, 1234L, 999999L)
          .map(org.apache.spark.sql.Row(_)): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType, nullable = false))))
      ks.crossJoin(broadcast(sk))
        .selectExpr("k", "graft_cms_est(sk, k) AS est")
        .orderBy("k")
    },

    // Equi-width HISTOGRAM aggregation — the profiling primitive: pass 1
    // reduces to global (min, max) (a broadcast scalar), pass 2 buckets
    // every row with pure arithmetic and partial-aggregates counts per
    // (group, bucket). Integer-cent arithmetic end to end (prices are
    // DECIMAL(12,2) → ×100 as BIGINT), so bucket edges are exact —
    // no float boundary flips. The last bucket is closed ([.., max]).
    q("qs15_histogram",
      """WITH b AS (SELECT
        |    CAST(CAST(l_extendedprice AS DECIMAL(30,8)) * 100 AS BIGINT)
        |      AS c,
        |    l_returnflag AS flag FROM lineitem),
        |mm AS (SELECT MIN(c) AS lo, MAX(c) AS hi FROM b)
        |SELECT flag,
        |  CAST(least((c - mm.lo) * 10 // (mm.hi - mm.lo + 1), 9)
        |    AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM b CROSS JOIN mm
        |GROUP BY flag, bucket ORDER BY flag, bucket""".stripMargin) {
      (s, d) =>
      val b = t(s, d, "lineitem")
        .select((col("l_extendedprice").cast(graft.Det.DEC) * 100)
          .cast("long").as("c"),
          col("l_returnflag").as("flag"))
      val mm = b.agg(min("c").as("lo"), max("c").as("hi"))
      b.crossJoin(broadcast(mm))
        .select(col("flag"),
          least(expr("(c - lo) * 10 div (hi - lo + 1)"), lit(9L))
            .cast("long").as("bucket"))
        .groupBy("flag", "bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("flag", "bucket")
    }
  )
}
