package graft.operators

import graft.{SparkSuite, TestData}
import org.apache.spark.sql.functions.{count, explode, length, split, sum}

/** Verbatim ports of the reference's batch JoinITCase equi-join remainder
  * (flink-table runtime/batch/table/JoinITCase.scala:49-218, :317-366,
  * :455) — the inner-join family (filters inside/after the join
  * condition, multiple keys over null-keyed fixtures, aggregation over a
  * join, join reordering, disjunctive and expression predicates), the two
  * right-outer variants the outer-join port spec didn't cover, and the
  * UDTF lateral join. Expected lists copied unchanged. Together with
  * OuterJoinITCasePortSpec this closes the file's applicable cases.
  */
class InnerJoinITCasePortSpec extends SparkSuite {
  import spark.implicits._

  private lazy val small3 = TestData.t3Rows.take(3).toDF("a", "b", "c")
  private lazy val full3 = TestData.t3Rows.toDF("a", "b", "c")
  private lazy val t5 = TestData.t5Rows.toDF("d", "e", "f", "g", "h")

  // addNullKey3Tuples / addNullKey5Tuples (JoinITCase.scala:476/:494)
  private lazy val null3 =
    (TestData.t3Rows.map { case (a, b, c) => (Option(a), b, c) } ++
      Seq((None, 999L, "NullTuple"), (None, 999L, "NullTuple")))
      .toDF("a", "b", "c")
  private lazy val null5 =
    (TestData.t5Rows.map { case (d, e, f, g, h) => (Option(d), e, f, g, h) } ++
      Seq((Option.empty[Int], 999L, 999, "NullTuple", 999L),
        (Option.empty[Int], 999L, 999, "NullTuple", 999L)))
      .toDF("d", "e", "f", "g", "h")

  private def strings(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString(",")).toSeq.sorted

  // ---- testInnerJoin (:49)
  test("JoinITCase testInnerJoin port") {
    val got = strings(small3.join(t5, $"b" === $"e").select($"c", $"g"))
    assert(got === Seq("Hi,Hallo", "Hello,Hallo Welt",
      "Hello world,Hallo Welt").sorted)
  }

  // ---- testInnerJoinWithFilter (:64)
  test("JoinITCase testInnerJoinWithFilter port") {
    val got = strings(small3.join(t5, $"b" === $"e" && $"b" < 2)
      .select($"c", $"g"))
    assert(got === Seq("Hi,Hallo"))
  }

  // ---- testInnerJoinWithJoinFilter (:80)
  test("JoinITCase testInnerJoinWithJoinFilter port") {
    val got = strings(full3.join(t5, $"b" === $"e" && $"a" < 6)
      .select($"c", $"g"))
    assert(got === Seq("Hi,Hallo", "Hello,Hallo Welt",
      "Hello world,Hallo Welt", "Hello world, how are you?,Hallo Welt wie",
      "I am fine.,Hallo Welt wie").sorted)
  }

  // ---- testInnerJoinWithNonEquiJoinPredicate (:96)
  test("JoinITCase testInnerJoinWithNonEquiJoinPredicate port") {
    val got = strings(
      full3.join(t5, $"b" === $"e" && $"a" < 6 && $"h" < $"b")
        .select($"c", $"g"))
    assert(got === Seq("Hello world, how are you?,Hallo Welt wie",
      "I am fine.,Hallo Welt wie").sorted)
  }

  // ---- testInnerJoinWithMultipleKeys (:111) — null-keyed rows on both
  // sides never join each other
  test("JoinITCase testInnerJoinWithMultipleKeys port") {
    val got = strings(null3.join(null5, $"a" === $"d" && $"b" === $"h")
      .select($"c", $"g"))
    assert(got === Seq("Hi,Hallo", "Hello,Hallo Welt",
      "Hello world,Hallo Welt wie gehts?", "Hello world,ABC",
      "I am fine.,HIJ", "I am fine.,IJK").sorted)
  }

  // ---- testInnerJoinWithAggregation (:129)
  test("JoinITCase testInnerJoinWithAggregation port") {
    val got = small3.join(t5, $"a" === $"d").agg(count($"g"))
      .as[Long].collect().toSeq
    assert(got === Seq(6L))
  }

  // ---- testInnerJoinWithGroupedAggregation (:146)
  test("JoinITCase testInnerJoinWithGroupedAggregation port") {
    val got = strings(small3.join(t5, $"a" === $"d")
      .groupBy($"a", $"d")
      .agg(sum($"b").as("sb"), count($"g").as("cg"))
      .select($"sb", $"cg"))
    assert(got === Seq("6,3", "4,2", "1,1").sorted)
  }

  // ---- testInnerJoinPushThroughJoin (:164) — the predicate over the
  // outer cross joins onto the inner pair; Catalyst's PushPredicate
  // ThroughJoin is the reference's FlinkFilterJoinRule
  test("JoinITCase testInnerJoinPushThroughJoin port") {
    val ds3 = TestData.t3Rows.take(3).toDF("j", "k", "l")
    val got = strings(small3.crossJoin(t5).join(ds3)
      .where($"a" === $"d" && $"e" === $"k")
      .select($"a", $"f", $"l"))
    assert(got === Seq("2,1,Hello", "2,1,Hello world", "1,0,Hi").sorted)
  }

  // ---- testInnerJoinWithDisjunctivePred (:184)
  test("JoinITCase testInnerJoinWithDisjunctivePred port") {
    val got = strings(full3.join(t5,
      $"a" === $"d" && ($"b" === $"e" || $"b" === $"e" - 10))
      .select($"c", $"g"))
    assert(got === Seq("Hi,Hallo", "Hello,Hallo Welt",
      "I am fine.,IJK").sorted)
  }

  // ---- testInnerJoinWithExpressionPreds (:201)
  test("JoinITCase testInnerJoinWithExpressionPreds port") {
    val got = strings(full3.join(t5,
      $"b" === $"h" + 1 && $"a" - 1 === $"d" + 2).select($"c", $"g"))
    assert(got === Seq("I am fine.,Hallo Welt",
      "Luke Skywalker,Hallo Welt wie gehts?", "Luke Skywalker,ABC",
      "Comment#2,HIJ", "Comment#2,IJK").sorted)
  }

  private val comments = (1 to 15).map(i => s"Comment#$i,null")

  // ---- testRightJoinWithNonEquiJoinPred (:317)
  test("JoinITCase testRightJoinWithNonEquiJoinPred port") {
    val got = strings(null5.join(null3, $"a" === $"d" && $"b" <= $"h",
      "right").select($"c", $"g"))
    val expected = (Seq("Hi,Hallo", "Hello,Hallo Welt",
      "Hello world,Hallo Welt wie gehts?", "Hello world,ABC",
      "Hello world,BCD", "I am fine.,HIJ", "I am fine.,IJK",
      "Hello world, how are you?,null", "Luke Skywalker,null",
      "NullTuple,null", "NullTuple,null") ++ comments).sorted
    assert(got === expected)
  }

  // ---- testRightJoinWithLeftLocalPred (:342) — the local predicate
  // lives in the JOIN CONDITION of a right join, so non-matching RIGHT
  // rows are preserved
  test("JoinITCase testRightJoinWithLeftLocalPred port") {
    val got = strings(null5.join(null3, $"a" === $"d" && $"b" === 2,
      "right").select($"c", $"g"))
    val expected = (Seq("Hello,Hallo Welt", "Hello,Hallo Welt wie",
      "Hello world,Hallo Welt wie gehts?", "Hello world,ABC",
      "Hello world,BCD", "Hi,null", "Hello world, how are you?,null",
      "I am fine.,null", "Luke Skywalker,null",
      "NullTuple,null", "NullTuple,null") ++ comments).sorted
    assert(got === expected)
  }

  // ---- testUDTFJoinOnTuples (:455) — TableFunc2 splits on '#' and
  // emits (word, length); the lateral join is explode + derived column
  test("JoinITCase testUDTFJoinOnTuples port") {
    val ds1 = Seq("hi#world", "how#are#you").toDF("a")
    val got = strings(ds1
      .select($"a", explode(split($"a", "#")).as("name"))
      .withColumn("len", length($"name")))
    assert(got === Seq("hi#world,hi,2", "hi#world,world,5",
      "how#are#you,how,3", "how#are#you,are,3",
      "how#are#you,you,3").sorted)
  }
}
