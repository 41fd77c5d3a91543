package graft.operators

import graft.{SparkSuite, TestData}

/** Verbatim ports of the reference's batch JoinITCase OUTER-join family
  * (flink-table runtime/batch/table/JoinITCase.scala:220-455) — the
  * cases that pin null-key semantics (two NULL-keyed rows on each side
  * never join each other), non-equi predicates inside outer-join
  * conditions, and single-side local predicates in the join condition
  * (NOT pushed as filters — Flink's setNullCheck(true) outer-join
  * contract, which Spark's outer joins share). Expected lists copied
  * unchanged.
  */
class OuterJoinITCasePortSpec extends SparkSuite {
  import spark.implicits._

  // addNullKey3Tuples / addNullKey5Tuples (JoinITCase.scala:476/:494):
  // the canonical fixtures plus two null-keyed rows per side
  private lazy val ds1 =
    (TestData.t3Rows.map { case (a, b, c) => (Option(a), b, c) } ++
      Seq((None, 999L, "NullTuple"), (None, 999L, "NullTuple")))
      .toDF("a", "b", "c")
  private lazy val ds2 =
    (TestData.t5Rows.map { case (d, e, f, g, h) => (Option(d), e, f, g, h) } ++
      Seq((Option.empty[Int], 999L, 999, "NullTuple", 999L),
        (Option.empty[Int], 999L, 999, "NullTuple", 999L)))
      .toDF("d", "e", "f", "g", "h")

  private def strings(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString(",")).toSeq.sorted

  private val comments = (1 to 15).map(i => s"Comment#$i,null")

  // ---- testLeftJoinWithMultipleKeys (:220)
  test("JoinITCase testLeftJoinWithMultipleKeys port") {
    val got = strings(ds1.join(ds2, $"a" === $"d" && $"b" === $"h", "left")
      .select($"c", $"g"))
    val expected = (Seq("Hi,Hallo", "Hello,Hallo Welt",
      "Hello world,Hallo Welt wie gehts?", "Hello world,ABC",
      "Hello world, how are you?,null", "I am fine.,HIJ", "I am fine.,IJK",
      "Luke Skywalker,null", "NullTuple,null", "NullTuple,null")
      ++ comments).sorted
    assert(got === expected)
  }

  // ---- testLeftJoinWithNonEquiJoinPred (:245)
  test("JoinITCase testLeftJoinWithNonEquiJoinPred port") {
    val got = strings(ds1.join(ds2, $"a" === $"d" && $"b" <= $"h", "left")
      .select($"c", $"g"))
    val expected = (Seq("Hi,Hallo", "Hello,Hallo Welt",
      "Hello world,Hallo Welt wie gehts?", "Hello world,ABC",
      "Hello world,BCD", "I am fine.,HIJ", "I am fine.,IJK",
      "Hello world, how are you?,null", "Luke Skywalker,null",
      "NullTuple,null", "NullTuple,null") ++ comments).sorted
    assert(got === expected)
  }

  // ---- testLeftJoinWithLeftLocalPred (:270) — the local predicate lives
  // in the JOIN CONDITION, so non-matching left rows are preserved
  test("JoinITCase testLeftJoinWithLeftLocalPred port") {
    val got = strings(ds1.join(ds2, $"a" === $"d" && $"b" === 2, "left")
      .select($"c", $"g"))
    val expected = (Seq("Hello,Hallo Welt", "Hello,Hallo Welt wie",
      "Hello world,Hallo Welt wie gehts?", "Hello world,ABC",
      "Hello world,BCD", "Hi,null", "Hello world, how are you?,null",
      "I am fine.,null", "Luke Skywalker,null",
      "NullTuple,null", "NullTuple,null") ++ comments).sorted
    assert(got === expected)
  }

  // ---- testRightJoinWithMultipleKeys (:295)
  test("JoinITCase testRightJoinWithMultipleKeys port") {
    val got = strings(ds1.join(ds2, $"a" === $"d" && $"b" === $"h", "right")
      .select($"c", $"g"))
    val expected = Seq("Hi,Hallo", "Hello,Hallo Welt", "null,Hallo Welt wie",
      "Hello world,Hallo Welt wie gehts?", "Hello world,ABC", "null,BCD",
      "null,CDE", "null,DEF", "null,EFG", "null,FGH", "null,GHI",
      "I am fine.,HIJ", "I am fine.,IJK", "null,JKL", "null,KLM",
      "null,NullTuple", "null,NullTuple").sorted
    assert(got === expected)
  }

  // ---- testFullOuterJoinWithMultipleKeys (:367)
  test("JoinITCase testFullOuterJoinWithMultipleKeys port") {
    val got = strings(ds1.join(ds2, $"a" === $"d" && $"b" === $"h", "full")
      .select($"c", $"g"))
    val expected = (Seq("Hi,Hallo", "Hello,Hallo Welt", "null,Hallo Welt wie",
      "Hello world,Hallo Welt wie gehts?", "Hello world,ABC", "null,BCD",
      "null,CDE", "null,DEF", "null,EFG", "null,FGH", "null,GHI",
      "I am fine.,HIJ", "I am fine.,IJK", "null,JKL", "null,KLM",
      "Luke Skywalker,null", "Hello world, how are you?,null",
      "NullTuple,null", "NullTuple,null", "null,NullTuple",
      "null,NullTuple") ++ comments).sorted
    assert(got === expected)
  }

  // ---- testFullJoinWithNonEquiJoinPred (:394)
  test("JoinITCase testFullJoinWithNonEquiJoinPred port") {
    val got = strings(ds1.join(ds2, $"a" === $"d" && $"b" <= $"h", "full")
      .select($"c", $"g"))
    val expected = (Seq(
      "Hi,Hallo", "Hello,Hallo Welt", "Hello world,Hallo Welt wie gehts?",
      "Hello world,ABC", "Hello world,BCD", "I am fine.,HIJ",
      "I am fine.,IJK",
      "Hello world, how are you?,null", "Luke Skywalker,null",
      "NullTuple,null", "NullTuple,null",
      "null,Hallo Welt wie", "null,CDE", "null,DEF", "null,EFG", "null,FGH",
      "null,GHI", "null,JKL", "null,KLM", "null,NullTuple",
      "null,NullTuple") ++ comments).sorted
    assert(got === expected)
  }

  // ---- testFullJoinWithLeftLocalPred (:423)
  test("JoinITCase testFullJoinWithLeftLocalPred port") {
    val got = strings(
      ds1.join(ds2, $"a" === $"d" && $"b" >= 2 && $"h" === 1, "full")
        .select($"c", $"g"))
    val expected = (Seq(
      "Hello,Hallo Welt wie", "Hello world, how are you?,DEF",
      "Hello world, how are you?,EFG", "I am fine.,GHI",
      "Hi,null", "Hello world,null", "Luke Skywalker,null",
      "NullTuple,null", "NullTuple,null",
      "null,Hallo", "null,Hallo Welt", "null,Hallo Welt wie gehts?",
      "null,ABC", "null,BCD", "null,CDE", "null,FGH", "null,HIJ",
      "null,IJK", "null,JKL", "null,KLM", "null,NullTuple",
      "null,NullTuple") ++ comments).sorted
    assert(got === expected)
  }
}
