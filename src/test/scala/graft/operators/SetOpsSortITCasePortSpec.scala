package graft.operators

import graft.{SparkSuite, TestData}

/** Verbatim ports of the reference's batch SetOperatorsITCase (11 cases
  * — union/unionAll n-ary, minus/minusAll, intersect/intersectAll,
  * different-field-name and scalar-expression variants) and batch
  * SortITCase (6 cases — total order asc/desc, mixed directions,
  * offset/fetch). flink-table runtime/batch/table/{SetOperators,Sort}
  * ITCase.scala; expected lists computed from the same canonical
  * 3-tuple fixture.
  */
class SetOpsSortITCasePortSpec extends SparkSuite {
  import spark.implicits._

  private lazy val small3 = TestData.t3Rows.take(3).toDF("a", "b", "c")
  private lazy val full3 = TestData.t3Rows.toDF("a", "b", "c")

  private def strings(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString(",")).toSeq.sorted

  // ---- testUnionAll (:43)
  test("SetOperatorsITCase testUnionAll port") {
    val got = strings(small3.unionAll(
      TestData.t3Rows.take(3).toDF("d", "e", "f")).select($"c"))
    assert(got === Seq("Hi", "Hello", "Hello world",
      "Hi", "Hello", "Hello world").sorted)
  }

  // ---- testUnion (:58) — distinct union
  test("SetOperatorsITCase testUnion port") {
    val got = strings(small3.unionAll(
      TestData.t3Rows.take(3).toDF("d", "e", "f")).distinct().select($"c"))
    assert(got === Seq("Hi", "Hello", "Hello world").sorted)
  }

  // ---- testTernaryUnionAll (:72)
  test("SetOperatorsITCase testTernaryUnionAll port") {
    val got = strings(small3.unionAll(small3).unionAll(small3).select($"c"))
    assert(got === (Seq.fill(3)(Seq("Hi", "Hello", "Hello world")).flatten).sorted)
  }

  // ---- testTernaryUnion (:89)
  test("SetOperatorsITCase testTernaryUnion port") {
    val got = strings(
      small3.unionAll(small3).unionAll(small3).distinct().select($"c"))
    assert(got === Seq("Hi", "Hello", "Hello world").sorted)
  }

  // ---- testMinusAll (:106) — bag semantics: 3x each row minus 2x (1,1,Hi)
  test("SetOperatorsITCase testMinusAll port") {
    val ds2 = Seq((1, 1L, "Hi")).toDF("a", "b", "c")
    val got = strings(small3.unionAll(small3).unionAll(small3)
      .exceptAll(ds2.unionAll(ds2)).select($"c"))
    assert(got === (Seq("Hi") ++ Seq.fill(3)(Seq("Hello", "Hello world")).flatten).sorted)
  }

  // ---- testMinus (:124)
  test("SetOperatorsITCase testMinus port") {
    val ds2 = Seq((1, 1L, "Hi")).toDF("a", "b", "c")
    val got = strings(small3.unionAll(small3).unionAll(small3)
      .except(ds2.unionAll(ds2)).select($"c"))
    assert(got === Seq("Hello", "Hello world").sorted)
  }

  // ---- testMinusDifferentFieldNames (:141) — set ops are positional
  test("SetOperatorsITCase testMinusDifferentFieldNames port") {
    val ds2 = Seq((1, 1L, "Hi")).toDF("d", "e", "f")
    val got = strings(small3.unionAll(small3).unionAll(small3)
      .except(ds2.unionAll(ds2)).select($"c"))
    assert(got === Seq("Hello", "Hello world").sorted)
  }

  // ---- testIntersect (:158) — distinct intersect over a shuffled side
  test("SetOperatorsITCase testIntersect port") {
    val data2 = Seq((1, 1L, "Hi"), (2, 2L, "Hello"), (2, 2L, "Hello"),
      (3, 2L, "Hello world!"))
    val got = strings(small3.intersect(
      scala.util.Random.shuffle(data2).toDF("a", "b", "c")).select($"c"))
    assert(got === Seq("Hi", "Hello").sorted)
  }

  // ---- testIntersectAll (:174) — bag intersect: {1,1,1,2,2} ∩ {1,2,2,2,3}
  test("SetOperatorsITCase testIntersectAll port") {
    val got = Seq(1, 1, 1, 2, 2).toDF("c")
      .intersectAll(Seq(1, 2, 2, 2, 3).toDF("c"))
      .as[Int].collect().toSeq.sorted
    assert(got === Seq(1, 2, 2))
  }

  // ---- testIntersectWithDifferentFieldNames (:191)
  test("SetOperatorsITCase testIntersectWithDifferentFieldNames port") {
    val got = strings(small3.intersect(
      TestData.t3Rows.toDF("e", "f", "g")).select($"c"))
    assert(got === Seq("Hi", "Hello", "Hello world").sorted)
  }

  // ---- testIntersectWithScalarExpression (:207)
  test("SetOperatorsITCase testIntersectWithScalarExpression port") {
    val got = strings(
      small3.select(($"a" + 1).as("a1"), $"b", $"c")
        .intersect(full3.select(($"a" + 1).as("a1"), $"b", $"c")))
    assert(got === Seq("2,1,Hi", "3,2,Hello", "4,2,Hello world").sorted)
  }

  // ---- SortITCase: the expected TOTAL order over the full fixture
  private def ordered(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString(",")).toSeq

  private lazy val asc1 = TestData.t3Rows.sortBy(_._1)

  test("SortITCase testOrderByDesc port") {
    val got = ordered(full3.orderBy($"a".desc))
    assert(got === asc1.reverse.map(t => s"${t._1},${t._2},${t._3}"))
  }

  test("SortITCase testOrderByAsc port") {
    val got = ordered(full3.orderBy($"a".asc))
    assert(got === asc1.map(t => s"${t._1},${t._2},${t._3}"))
  }

  test("SortITCase testOrderByMultipleFieldsDifferentDirections port") {
    val got = ordered(full3.orderBy($"b".asc, $"a".desc))
    val expected = TestData.t3Rows.sortBy(t => (t._2, -t._1))
      .map(t => s"${t._1},${t._2},${t._3}")
    assert(got === expected)
  }

  test("SortITCase testOrderByOffset port") {
    val got = ordered(full3.orderBy($"a".asc).offset(3))
    assert(got === asc1.drop(3).map(t => s"${t._1},${t._2},${t._3}"))
  }

  test("SortITCase testOrderByOffsetAndFetch port") {
    val got = ordered(full3.orderBy($"a".asc).offset(3).limit(5))
    assert(got === asc1.slice(3, 8).map(t => s"${t._1},${t._2},${t._3}"))
  }

  test("SortITCase testOrderByFetch port") {
    val got = ordered(full3.orderBy($"a".asc).limit(5))
    assert(got === asc1.take(5).map(t => s"${t._1},${t._2},${t._3}"))
  }
}
