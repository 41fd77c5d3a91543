package graft.sources

import java.sql.DriverManager

import graft.SparkSuite
import graft.streaming.RelationalSink

/** End-to-end JDBC against the in-image EMBEDDED Derby engine: the
  * parallel-range INPUT (the reference JDBCInputFormat's
  * NumericBetweenParametersProvider splits) and the batched OUTPUT
  * (RelationalSink over a real connection). Derby runs in-process, so
  * Spark's executor threads (local mode, one JVM) reach the same
  * database the test populates — no network, no external service. */
class JdbcSourceSpec extends SparkSuite {
  import spark.implicits._

  private def freshDb(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby")
    s"jdbc:derby:${dir.toAbsolutePath}/db;create=true"
  }

  test("parallel-range JDBC input: bounded splits cover the table exactly once") {
    val url = freshDb()
    Class.forName(Jdbc.DerbyDriver)
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE items (id BIGINT PRIMARY KEY, name VARCHAR(32), " +
        "price DOUBLE)")
    val ps = conn.prepareStatement("INSERT INTO items VALUES (?, ?, ?)")
    (0 until 100).foreach { i =>
      ps.setLong(1, i.toLong); ps.setString(2, s"n$i")
      ps.setDouble(3, i * 1.5); ps.addBatch()
    }
    ps.executeBatch(); ps.close(); conn.close()

    val df = Jdbc.readRange(spark, url, "items", "id",
      lowerBound = 0, upperBound = 100, numPartitions = 4)
    // the range really split: four tasks, each a bounded cursor, the
    // union exact — no duplicated and no dropped boundary rows
    assert(df.rdd.getNumPartitions == 4)
    val perPart = df.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
      .collect().toMap
    assert(perPart.size == 4 && perPart.values.forall(_ > 0))
    assert(perPart.values.sum == 100)
    assert(df.selectExpr("CAST(sum(id) AS BIGINT)").as[Long].head() == 4950L)
    assert(df.where("id = 0 OR id = 99").count() == 2)
    // single-cursor form agrees
    assert(Jdbc.read(spark, url, "items").count() == 100)
  }

  test("predicate pushdown: the WHERE clause reaches every split's " +
      "cursor and empties the out-of-range splits") {
    val url = freshDb()
    Class.forName(Jdbc.DerbyDriver)
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE facts (id BIGINT PRIMARY KEY, v DOUBLE)")
    val ps = conn.prepareStatement("INSERT INTO facts VALUES (?, ?)")
    (0 until 100).foreach { i =>
      ps.setLong(1, i.toLong); ps.setDouble(2, i * 2.0); ps.addBatch()
    }
    ps.executeBatch(); ps.close(); conn.close()

    // caller predicate composed as a subquery: splits covering
    // [25,100) intersect it nowhere, so the DATABASE returns them empty
    val df = Jdbc.readRange(spark, url, "facts", "id",
      lowerBound = 0, upperBound = 100, numPartitions = 4,
      predicate = Some("id < 25"))
    assert(df.rdd.getNumPartitions == 4)
    val perPart = df.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
      .collect().toMap
    // split 0 = [*, 25): all 25 rows; splits 1-3: pruned empty
    assert(perPart == Map(0 -> 25, 1 -> 0, 2 -> 0, 3 -> 0))
    assert(df.count() == 25)

    // the Spark-native route: .filter on the plain range read compiles
    // into each split's WHERE (PushedFilters in the JDBC scan node)
    val native = Jdbc.readRange(spark, url, "facts", "id",
      lowerBound = 0, upperBound = 100, numPartitions = 4)
      .where("id < 25")
    val plan = native.queryExecution.executedPlan.toString
    // Derby uppercases identifiers: the pushed filter reads LessThan(ID,25)
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(ID,25)"),
      s"expected a pushed JDBC filter in:\n$plan")
    val nativeParts = native.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
      .collect().toMap
    assert(nativeParts == Map(0 -> 25, 1 -> 0, 2 -> 0, 3 -> 0))
  }

  test("RelationalSink writes through a real JDBC connection (derby round-trip)") {
    val url = freshDb()
    Class.forName(Jdbc.DerbyDriver)
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE out_t (id BIGINT PRIMARY KEY, v VARCHAR(16))")
    conn.close()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("id", "v").repartition(2)
    RelationalSink.writeBatched(df,
      RelationalSink.insertStatement("out_t", Seq("id", "v")),
      batchInterval = 2, () => Jdbc.statements(url))
    val back = Jdbc.read(spark, url, "out_t")
      .as[(Long, String)].collect().toSet
    assert(back == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"),
      (5L, "e")))
  }
}
