package graft.streaming

import graft.{SparkSuite, TestData}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Verbatim ports of the reference's STREAM CorrelateITCase (flink-table
  * runtime/stream/table/CorrelateITCase.scala) — UDTF lateral joins on
  * append streams: TableFunc0 ("name#age" rows), parameterized
  * constructors (TableFunc3), job-parameter functions (RichTableFunc1),
  * scalar-function composition, varargs, Row types, and the left-outer
  * lateral. The reference's ValidationException case (common predicates
  * on a lateral outer join, FLINK-7865) is a REFERENCE limitation:
  * Spark supports the predicate, so the port asserts our result instead
  * of the exception. TableFunction.collect maps to explode over an
  * array-returning UDF; empty output = empty array (cross) or null row
  * (left outer).
  */
class StreamCorrelateITCasePortSpec extends SparkSuite {
  import spark.implicits._

  // CorrelateITCase.testData
  private val data = Seq(
    (1, 1L, "Jack#22"), (2, 2L, "John#19"), (3, 2L, "Anna#44"),
    (4, 3L, "nosharp"))

  private var nameSeq = 0
  private def streamed(rows: Seq[(Int, Long, String)])(
      f: DataFrame => DataFrame): Seq[String] = {
    implicit val sqlCtx = spark.sqlContext
    nameSeq += 1
    val name = s"corr_port_$nameSeq"
    val input = MemoryStream[(Int, Long, String)]
    val q = f(input.toDF().toDF("a", "b", "c")).writeStream
      .outputMode("append").format("memory").queryName(name).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      spark.table(name).collect().map(_.mkString(",")).toSeq.sorted
    } finally q.stop()
  }

  // TableFunc0: "<name>#<age>" -> (name, age); nothing otherwise
  private val func0 = udf((s: String) =>
    if (s.contains("#")) { val p = s.split("#"); Seq((p(0), p(1).toInt)) }
    else Seq.empty[(String, Int)])

  test("stream CorrelateITCase testCrossJoin port") {
    // two chained laterals (TableFunc0 + PojoTableFunc: same split) with
    // an age filter
    val got = streamed(data) { df =>
      df.select($"c", explode(func0($"c")).as("de"))
        .select($"c", $"de._1".as("d"), $"de._2".as("e"))
        .select($"c", explode(func0($"c")).as("p"))
        .select($"c", $"p._1".as("name"), $"p._2".as("age"))
        .where($"age" > 20)
    }
    assert(got === Seq("Jack#22,Jack,22", "Anna#44,Anna,44").sorted)
  }

  test("stream CorrelateITCase testLeftOuterJoinWithoutPredicates port") {
    val got = streamed(data) { df =>
      df.select($"c", explode_outer(func0($"c")).as("de"))
        .select($"c", $"de._1".as("d"), $"de._2".as("e"))
    }
    assert(got === Seq("nosharp,null,null", "Jack#22,Jack,22",
      "John#19,John,19", "Anna#44,Anna,44").sorted)
  }

  test("stream CorrelateITCase testLeftOuterJoinWithPredicates port (reference rejects, we support)") {
    // the reference throws ValidationException (FLINK-7865 forbids
    // common predicates on lateral outer joins); Spark evaluates the
    // predicate: a === age never holds -> every row pads with nulls,
    // the reference's DOCUMENTED intended result
    val got = streamed(data) { df =>
      df.select($"a", $"c", explode_outer(func0($"c")).as("sl"))
        .select($"a", $"c", $"sl._1".as("s"), $"sl._2".as("l"))
        .select($"c",
          when($"a" === $"l", $"s").as("s2"),
          when($"a" === $"l", $"l").as("l2"))
    }
    assert(got === Seq("Jack#22,null,null", "John#19,null,null",
      "Anna#44,null,null", "nosharp,null,null").sorted)
  }

  test("stream CorrelateITCase testUserDefinedTableFunctionWithScalarFunction port (Func18)") {
    val got = streamed(data) { df =>
      df.select($"c", explode(func0($"c")).as("de"))
        .select($"c", $"de._1".as("d"), $"de._2".as("e"))
        .where($"d".startsWith("J"))
    }
    assert(got === Seq("Jack#22,Jack,22", "John#19,John,19").sorted)
  }

  test("stream CorrelateITCase testUserDefinedTableFunctionWithParameter port (RichTableFunc1)") {
    // word_separator = " ": rows without a space emit nothing
    val rich1 = udf((s: String) =>
      if (s.contains(" ")) s.split(" ").toSeq else Seq.empty[String])
    val got = streamed(TestData.t3Rows.take(3)) { df =>
      df.select($"a", explode(rich1($"c")).as("s"))
    }
    assert(got === Seq("3,Hello", "3,world").sorted)
  }

  test("stream CorrelateITCase testUserDefinedTableFunctionWithUserDefinedScalarFunction port") {
    // RichTableFunc1(sep '#') over RichFunc2(c) = "test#" + c: every
    // row splits into ("test", c)
    val rich2 = udf((c: String) => s"test#$c")
    val rich1 = udf((s: String) =>
      if (s.contains("#")) s.split("#").toSeq else Seq.empty[String])
    val got = streamed(TestData.t3Rows.take(3)) { df =>
      df.select($"a", explode(rich1(rich2($"c"))).as("s"))
    }
    assert(got === Seq("1,Hi", "1,test", "2,Hello", "2,test",
      "3,Hello world", "3,test").sorted)
  }

  test("stream CorrelateITCase testTableFunctionConstructorWithParams port (TableFunc3)") {
    // three parameterized instances; the conf-map instance emits one
    // row PER CONFIG ENTRY
    val conf = Seq("key1" -> "value1", "key2" -> "value2")
    def func3(prefix: Option[String], withConf: Boolean) =
      udf((s: String) =>
        if (!s.contains("#")) Seq.empty[(String, Int)]
        else {
          val p = s.split("#")
          prefix match {
            case None => Seq((p(0), p(1).toInt))
            case Some(pre) if !withConf => Seq((pre + p(0), p(1).toInt))
            case Some(pre) => conf.map { case (k, v) =>
              (s"${pre}_key=${k}_value=${v}_${p(0)}", p(1).toInt)
            }
          }
        })
    val f30 = func3(None, withConf = false)
    val f31 = func3(Some("OneConf_"), withConf = false)
    val f32 = func3(Some("TwoConf_"), withConf = true)
    val got = streamed(data) { df =>
      df.select($"c", explode(f30($"c")).as("de"))
        .select($"c", $"de._1".as("d"), $"de._2".as("e"))
        .select($"c", $"d", $"e", explode(f31($"c")).as("fg"))
        .select($"c", $"d", $"e", $"fg._1".as("f"), $"fg._2".as("g"))
        .select($"c", $"d", $"e", $"f", $"g", explode(f32($"c")).as("hi"))
        .select($"c", $"d", $"f", $"hi._1".as("h"), $"e", $"g",
          $"hi._2".as("i"))
    }
    assert(got === Seq(
      "Anna#44,Anna,OneConf_Anna,TwoConf__key=key1_value=value1_Anna,44,44,44",
      "Anna#44,Anna,OneConf_Anna,TwoConf__key=key2_value=value2_Anna,44,44,44",
      "Jack#22,Jack,OneConf_Jack,TwoConf__key=key1_value=value1_Jack,22,22,22",
      "Jack#22,Jack,OneConf_Jack,TwoConf__key=key2_value=value2_Jack,22,22,22",
      "John#19,John,OneConf_John,TwoConf__key=key1_value=value1_John,19,19,19",
      "John#19,John,OneConf_John,TwoConf__key=key2_value=value2_John,19,19,19"
    ).sorted)
  }

  test("stream CorrelateITCase testTableFunctionWithVariableArguments port (VarArgsFunc0)") {
    val varArgs = udf((x: String, y: String, z: String) => Seq(x, y, z))
    val got = streamed(data) { df =>
      df.select($"c").select($"c", explode(varArgs(lit("1"), lit("2"), $"c")).as("v"))
    }
    assert(got === Seq(
      "Anna#44,1", "Anna#44,2", "Anna#44,Anna#44",
      "Jack#22,1", "Jack#22,2", "Jack#22,Jack#22",
      "John#19,1", "John#19,2", "John#19,John#19",
      "nosharp,1", "nosharp,2", "nosharp,nosharp").sorted)
  }

  test("stream CorrelateITCase testRowType port (TableFunc5)") {
    // Row-typed input: the UDTF re-emits the nested row's fields; the
    // select keeps the nested struct and its third field
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Int, Boolean, (Int, Int, Int))]
    val q = input.toDF().toDF("a", "b", "c")
      .select($"c", $"c._3".as("f2"))
      .writeStream.outputMode("append").format("memory")
      .queryName("corr_rowtype").start()
    try {
      input.addData((12, true, (1, 2, 3)), (12, true, (1, 2, 3)))
      q.processAllAvailable()
      val got = spark.table("corr_rowtype").collect().map { r =>
        val t = r.getStruct(0)
        s"${t.getInt(0)},${t.getInt(1)},${t.getInt(2)},${r.getInt(1)}"
      }.toSeq.sorted
      assert(got === Seq("1,2,3,3", "1,2,3,3").sorted)
    } finally q.stop()
  }
}
