package graft.streaming

import graft.{SparkSuite, TestData}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Verbatim ports of the reference's STREAM Table-API CalcITCase (15
  * cases — stateless selects/filters/scalar UDFs on append streams) and
  * stream SetOperatorsITCase (flink-table runtime/stream/table/
  * {Calc,SetOperators}ITCase.scala). Every query runs through a real
  * MemoryStream in append mode — the reference's toAppendStream — and
  * compares sorted string results like StreamITCase.StringSink. The
  * three IN-uncorrelated cases use toRetractStream in the reference;
  * their filter semantics are ported verbatim (the retract surface
  * itself is covered by RetractionITCasePortSpec).
  */
class StreamCalcSetOpsITCasePortSpec extends SparkSuite {
  import spark.implicits._

  private val small3 = TestData.t3Rows.take(3)
  private val full3 = TestData.t3Rows

  private var nameSeq = 0

  /** Run a stateless transform over an append MemoryStream. */
  private def streamed(data: Seq[(Int, Long, String)])(
      f: DataFrame => DataFrame): Seq[String] = {
    implicit val sqlCtx = spark.sqlContext
    nameSeq += 1
    val name = s"calc_port_$nameSeq"
    val input = MemoryStream[(Int, Long, String)]
    val q = f(input.toDF().toDF("a", "b", "c")).writeStream
      .outputMode("append").format("memory").queryName(name).start()
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      spark.table(name).collect().map(_.mkString(",")).toSeq.sorted
    } finally q.stop()
  }

  test("stream CalcITCase testSimpleSelectAll / testSimpleSelectAllWithAs port") {
    val expected = Seq("1,1,Hi", "2,2,Hello", "3,2,Hello world").sorted
    assert(streamed(small3)(df => df.select($"a", $"b", $"c")) === expected)
    assert(streamed(small3)(df =>
      df.toDF("x", "y", "z").select($"x", $"y", $"z")) === expected)
  }

  test("stream CalcITCase testSelectStar port (nested tuples)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[((Int, Int), String)]
    val q = input.toDF().toDF("ab", "s").select($"*").writeStream
      .outputMode("append").format("memory").queryName("calc_star").start()
    try {
      input.addData(((1, 1), "one"), ((2, 2), "two"), ((3, 3), "three"))
      q.processAllAvailable()
      val got = spark.table("calc_star").collect().map { r =>
        val t = r.getStruct(0)
        s"(${t.getInt(0)},${t.getInt(1)}),${r.getString(1)}"
      }.toSeq.sorted
      assert(got === Seq("(1,1),one", "(2,2),two", "(3,3),three").sorted)
    } finally q.stop()
  }

  test("stream CalcITCase testSelectFirst port") {
    assert(streamed(small3)(_.select($"a")) === Seq("1", "2", "3"))
  }

  test("stream CalcITCase testSimpleSelectWithNaming port (ProjectMerge)") {
    val got = streamed(full3)(df =>
      df.select($"a".as("x"), $"b".as("y"), $"a".as("z")).select($"x", $"y"))
    val expected = full3.map(t => s"${t._1},${t._2}").sorted
    assert(got === expected)
  }

  test("stream CalcITCase testSimpleFilter port") {
    assert(streamed(small3)(_.filter($"a" === 3)) === Seq("3,2,Hello world"))
  }

  test("stream CalcITCase testAllRejectingFilter / testAllPassingFilter port") {
    assert(streamed(small3)(_.filter(lit(false))) === Seq.empty)
    assert(streamed(small3)(_.filter(lit(true))) ===
      Seq("1,1,Hi", "2,2,Hello", "3,2,Hello world").sorted)
  }

  test("stream CalcITCase testFilterOnIntegerTupleField / testNotEquals port") {
    val even = streamed(full3)(_.filter($"a" % 2 === 0))
    assert(even === full3.filter(_._1 % 2 == 0)
      .map(t => s"${t._1},${t._2},${t._3}").sorted)
    val odd = streamed(full3)(_.filter($"a" % 2 =!= 0))
    assert(odd === full3.filter(_._1 % 2 != 0)
      .map(t => s"${t._1},${t._2},${t._3}").sorted)
  }

  test("stream CalcITCase testUserDefinedFunctionWithParameter port (RichFunc2)") {
    // RichFunc2: jobParam("string.value") + '#' + c, param = "ABC"
    spark.udf.register("graft_rich2", (c: String) => s"ABC#$c")
    val got = streamed(full3)(df =>
      df.where(expr("graft_rich2(c) = 'ABC#Hello'")).select($"c"))
    assert(got === Seq("Hello"))
  }

  test("stream CalcITCase testMultipleUserDefinedFunctions port") {
    // RichFunc1: a + jobParam("int.value", 0) = identity here;
    // RichFunc2 with param "Abc"
    spark.udf.register("graft_rich1", (a: Int) => a)
    spark.udf.register("graft_rich2b", (c: String) => s"Abc#$c")
    val got = streamed(full3)(df => df.where(
      expr("graft_rich2b(c) = 'Abc#Hello' OR (graft_rich1(a) = 3 AND b = 2)"))
      .select($"c"))
    assert(got === Seq("Hello", "Hello world").sorted)
  }

  test("stream CalcITCase testScalarFunctionConstructorWithParams port (Func13)") {
    // Func13(prefix): prefix + '-' + c — three parameterized instances
    val f = (prefix: String) => udf((c: String) => s"$prefix-$c")
    val data = Seq((1, 1L, "Jack#22"), (2, 2L, "John#19"),
      (3, 2L, "Anna#44"), (4, 3L, "nosharp"))
    val got = streamed(data)(df => df.select(
      f("default")($"c"), f("Sunny")($"c"), f("kevin2")($"c")))
    assert(got === Seq(
      "default-Anna#44,Sunny-Anna#44,kevin2-Anna#44",
      "default-Jack#22,Sunny-Jack#22,kevin2-Jack#22",
      "default-John#19,Sunny-John#19,kevin2-John#19",
      "default-nosharp,Sunny-nosharp,kevin2-nosharp").sorted)
  }

  test("stream CalcITCase testMapType port") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Int, Long, String)]
    val q = input.toDF().toDF("a", "b", "c").select(map($"a", $"c"))
      .writeStream.outputMode("append").format("memory")
      .queryName("calc_map").start()
    try {
      input.addData(full3: _*)
      q.processAllAvailable()
      // render as the reference's java.util.Map toString: {k=v}
      val got = spark.table("calc_map").collect().map { r =>
        r.getMap[Int, String](0).map { case (k, v) => s"$k=$v" }
          .mkString("{", ", ", "}")
      }.toSeq.sorted
      val expected = full3.map(t => s"{${t._1}=${t._3}}").sorted
      assert(got === expected)
    } finally q.stop()
  }

  test("stream CalcITCase testUDFWithUnicodeParameter port (SplitUDF)") {
    // SplitUDF: split by whole separator, take index, null past end;
    // deterministic and non-deterministic variants agree on results
    val splitUdf = udf((x: String, sep: String, i: Int) => {
      val parts = x.split(java.util.regex.Pattern.quote(sep), -1)
      if (parts.length > i) parts(i) else null
    })
    val ndSplitUdf = splitUdf.asNondeterministic()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, String)]
    val q = input.toDF().toDF("a", "b", "c").select(
      splitUdf($"a", lit(""), lit(0)).as("a0"),
      ndSplitUdf($"a", lit(""), lit(0)).as("a1"),
      splitUdf($"b", lit("\""), lit(1)).as("b0"),
      ndSplitUdf($"b", lit("\""), lit(1)).as("b1"),
      splitUdf($"c", lit("\\\""), lit(0)).as("c0"),
      ndSplitUdf($"c", lit("\\\""), lit(0)).as("c1"))
      .writeStream.outputMode("append").format("memory")
      .queryName("calc_unicode").start()
    try {
      input.addData(("ab", "c\"d", "e\\\"f"),
        ("xy", "y\"z", "z\\\"z"))
      q.processAllAvailable()
      val got = spark.table("calc_unicode").collect()
        .map(_.mkString(",")).toSeq.sorted
      assert(got === Seq("a,a,d,d,e,e", "x,x,z,z,z,z").sorted)
    } finally q.stop()
  }

  // ---- stream SetOperatorsITCase: the union family on append streams
  test("stream SetOperatorsITCase testUnion port") {
    implicit val sqlCtx = spark.sqlContext
    val in1 = MemoryStream[(Int, Long, String)]
    val in2 = MemoryStream[(Int, Long, String)]
    val q = in1.toDF().toDF("a", "b", "c")
      .unionAll(in2.toDF().toDF("d", "e", "f")).select($"c")
      .writeStream.outputMode("append").format("memory")
      .queryName("setops_union").start()
    try {
      in1.addData(small3: _*); in2.addData(small3: _*)
      q.processAllAvailable()
      assert(spark.table("setops_union").as[String].collect().toSeq.sorted ===
        Seq("Hi", "Hello", "Hello world", "Hi", "Hello", "Hello world").sorted)
    } finally q.stop()
  }

  test("stream SetOperatorsITCase testUnionWithFilter port") {
    implicit val sqlCtx = spark.sqlContext
    val in1 = MemoryStream[(Int, Long, String)]
    val in2 = MemoryStream[(Int, Long, Int, String, Long)]
    val q = in1.toDF().toDF("a", "b", "c")
      .unionAll(in2.toDF().toDF("a", "b", "d", "c", "e")
        .select($"a", $"b", $"c"))
      .filter($"b" < 2).select($"c")
      .writeStream.outputMode("append").format("memory")
      .queryName("setops_union_filter").start()
    try {
      in1.addData(small3: _*)
      in2.addData(TestData.t5Rows: _*)
      q.processAllAvailable()
      assert(spark.table("setops_union_filter").as[String].collect()
        .toSeq.sorted === Seq("Hi", "Hallo").sorted)
    } finally q.stop()
  }

  test("stream SetOperatorsITCase testUnionWithCompositeType port") {
    implicit val sqlCtx = spark.sqlContext
    val in1 = MemoryStream[(Int, (Int, String))]
    val in2 = MemoryStream[((Int, String), Int)]
    val q = in1.toDF().toDF("a", "b")
      .unionAll(in2.toDF().toDF("a", "b").select($"b", $"a"))
      .writeStream.outputMode("append").format("memory")
      .queryName("setops_composite").start()
    try {
      in1.addData((1, (1, "a")), (2, (2, "b")))
      in2.addData(((3, "c"), 3), ((4, "d"), 4))
      q.processAllAvailable()
      val got = spark.table("setops_composite").collect().map { r =>
        val t = r.getStruct(1)
        s"${r.getInt(0)},(${t.getInt(0)},${t.getString(1)})"
      }.toSeq.sorted
      assert(got === Seq("1,(1,a)", "2,(2,b)", "3,(3,c)", "4,(4,d)").sorted)
    } finally q.stop()
  }

  // ---- the IN-uncorrelated trio (reference: toRetractStream) — the
  // filter semantics verbatim; retract machinery covered elsewhere
  test("stream SetOperatorsITCase testInUncorrelated(+Condition/Multi) port") {
    import spark.implicits._
    val dataA = Seq((1, 1L, "Hello"), (2, 2L, "Hello"),
      (3, 3L, "Hello World"), (4, 4L, "Hello")).toDF("a", "b", "c")
    val dataB = Seq((1, "hello"), (2, "co-hello"), (4, "hello"))
      .toDF("x", "y")
    val got1 = dataA.join(dataB.select($"x"), $"a" === $"x", "left_semi")
      .collect().map(_.mkString(",")).toSeq.sorted
    assert(got1 === Seq("1,1,Hello", "2,2,Hello", "4,4,Hello").sorted)

    val dataB2 = Seq((1, "hello"), (1, "Hanoi"), (1, "Hanoi"),
      (2, "Hanoi-1"), (2, "Hanoi-1"), (-1, "Hanoi-1")).toDF("x", "y")
    val sums = dataB2.where($"y".like("%Hanoi%")).groupBy($"y")
      .agg(sum($"x").as("sx")).select($"sx")
    val got2 = dataA.join(sums, $"a" === $"sx", "left_semi")
      .collect().map(_.mkString(",")).toSeq.sorted
    assert(got2 === Seq("2,2,Hello", "3,3,Hello World").sorted)

    // testInWithMultiUncorrelatedCondition: two IN conditions, both
    // must hold — a IN B.x AND b IN C.w
    val dataC = Seq((1L, "Joker"), (1L, "Sanity"), (2L, "Cool"))
      .toDF("w", "z")
    val got3 = dataA
      .join(dataB.select($"x"), $"a" === $"x", "left_semi")
      .join(dataC.select($"w"), $"b" === $"w", "left_semi")
      .collect().map(_.mkString(",")).toSeq.sorted
    assert(got3 === Seq("1,1,Hello", "2,2,Hello").sorted)
  }
}
