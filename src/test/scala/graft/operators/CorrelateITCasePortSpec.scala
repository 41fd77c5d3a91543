package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Verbatim ports of the reference's batch CorrelateITCase
  * (flink-table runtime/batch/table/CorrelateITCase.scala) — UDTF
  * lateral joins. TableFunc1 (split-on-# emitting per token) runs
  * through our NATIVE Catalyst Generator (graft_split_rows inside a
  * Generate node — the same engine qs9 oracles); TableFunc0/TableFunc2
  * (typed/row-returning) are the transform+explode shape. The
  * leftOuterJoin case is explode_outer with a conditional array — the
  * planner's GenerateExec with outer=true, exactly Flink's
  * leftOuterJoinLateral null-padding.
  */
class CorrelateITCasePortSpec extends SparkSuite {
  import spark.implicits._

  // CorrelateITCase.testData
  private lazy val in = Seq(
    (1, 1L, "Jack#22"), (2, 2L, "John#19"), (3, 2L, "Anna#44"),
    (4, 3L, "nosharp")).toDF("a", "b", "c")

  private def strings(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString(",")).toSeq.sorted

  // ---- testCrossJoin (:50) — TableFunc1 emits one row per #-token; rows
  // without # emit nothing (inner lateral join drops them)
  test("CorrelateITCase testCrossJoin port (native Generator)") {
    graft.functions.GraftFunctions.register(spark)
    val got = strings(in.where($"c".contains("#"))
      .select($"c", expr("graft_split_rows(c, '#')").as("s")))
    assert(got === Seq("Jack#22,Jack", "Jack#22,22", "John#19,John",
      "John#19,19", "Anna#44,Anna", "Anna#44,44").sorted)
    // the prefix overload
    val got2 = strings(in.where($"c".contains("#"))
      .select($"c", expr("graft_split_rows(c, '#')").as("s"))
      .select($"c", concat(lit("$"), $"s").as("s")))
    assert(got2 === Seq("Jack#22,$Jack", "Jack#22,$22", "John#19,$John",
      "John#19,$19", "Anna#44,$Anna", "Anna#44,$44").sorted)
  }

  // ---- testLeftOuterJoinWithoutPredicates (:71) — TableFunc2 returns
  // (token, length); rows with no tokens survive null-padded
  test("CorrelateITCase testLeftOuterJoinWithoutPredicates port") {
    val got = strings(in.select($"c", explode_outer(
      when($"c".contains("#"), expr(
        "transform(split(c, '#'), x -> struct(x AS s, length(x) AS l))")))
      .as("sl"))
      .select($"c", $"sl.s", $"sl.l"))
    assert(got === Seq("Jack#22,Jack,4", "Jack#22,22,2", "John#19,John,4",
      "John#19,19,2", "Anna#44,Anna,4", "Anna#44,44,2",
      "nosharp,null,null").sorted)
  }

  // ---- testWithFilter (:119) — TableFunc0 parses name#age; filter on the
  // generated column
  test("CorrelateITCase testWithFilter port") {
    val got = strings(in.where($"c".contains("#"))
      .select($"c", expr(
        "struct(split(c, '#')[0] AS name, CAST(split(c, '#')[1] AS INT) AS age)")
        .as("u"))
      .select($"c", $"u.name", $"u.age")
      .filter($"age" > 20))
    assert(got === Seq("Jack#22,Jack,22", "Anna#44,Anna,44").sorted)
  }

  // ---- testUserDefinedTableFunctionWithScalarFunction (:191) — a scalar
  // expression feeds the table function's argument
  test("CorrelateITCase scalar-fed table function port") {
    graft.functions.GraftFunctions.register(spark)
    val got = strings(in.where($"c".contains("#"))
      .select($"c", expr("graft_split_rows(substring(c, 2), '#')").as("s")))
    assert(got === Seq("Jack#22,ack", "Jack#22,22", "John#19,ohn",
      "John#19,19", "Anna#44,nna", "Anna#44,44").sorted)
  }

  // ---- testUserDefinedTableFunctionWithScalarFunctionInCondition (:209)
  test("CorrelateITCase scalar conditions on generated columns port") {
    val got = strings(in.where($"c".contains("#"))
      .select($"a", $"c", expr(
        "struct(split(c, '#')[0] AS name, CAST(split(c, '#')[1] AS INT) AS age)")
        .as("u"))
      .where($"u.name".startsWith("J") && $"a" < 3 && $"u.age" > 20)
      .select($"c", $"u.name", $"u.age"))
    assert(got === Seq("Jack#22,Jack,22"))
  }
}
