package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical reference fixtures, ported verbatim (FIXTURES.md §A):
  * the 3-tuple table (CollectionDataSets.java:56-84) and 5-tuple table
  * (CollectionDataSets.java:98-128) every reference ITCase aggregates and
  * joins over, plus their small variants (:86, :130).
  */
object TestData {

  val t3Rows: Seq[(Int, Long, String)] = Seq(
    (1, 1L, "Hi"), (2, 2L, "Hello"), (3, 2L, "Hello world"),
    (4, 3L, "Hello world, how are you?"), (5, 3L, "I am fine."),
    (6, 3L, "Luke Skywalker"), (7, 4L, "Comment#1"), (8, 4L, "Comment#2"),
    (9, 4L, "Comment#3"), (10, 4L, "Comment#4"), (11, 5L, "Comment#5"),
    (12, 5L, "Comment#6"), (13, 5L, "Comment#7"), (14, 5L, "Comment#8"),
    (15, 5L, "Comment#9"), (16, 6L, "Comment#10"), (17, 6L, "Comment#11"),
    (18, 6L, "Comment#12"), (19, 6L, "Comment#13"), (20, 6L, "Comment#14"),
    (21, 6L, "Comment#15"))

  val t5Rows: Seq[(Int, Long, Int, String, Long)] = Seq(
    (1, 1L, 0, "Hallo", 1L), (2, 2L, 1, "Hallo Welt", 2L),
    (2, 3L, 2, "Hallo Welt wie", 1L), (3, 4L, 3, "Hallo Welt wie gehts?", 2L),
    (3, 5L, 4, "ABC", 2L), (3, 6L, 5, "BCD", 3L), (4, 7L, 6, "CDE", 2L),
    (4, 8L, 7, "DEF", 1L), (4, 9L, 8, "EFG", 1L), (4, 10L, 9, "FGH", 2L),
    (5, 11L, 10, "GHI", 1L), (5, 12L, 11, "HIJ", 3L), (5, 13L, 12, "IJK", 3L),
    (5, 14L, 13, "JKL", 2L), (5, 15L, 14, "KLM", 2L))

  def t3(spark: SparkSession): DataFrame = {
    import spark.implicits._
    t3Rows.toDF("a", "b", "c")
  }
  def t5(spark: SparkSession): DataFrame = {
    import spark.implicits._
    t5Rows.toDF("a", "b", "c", "d", "e")
  }
  def smallT3(spark: SparkSession): DataFrame = {
    import spark.implicits._
    t3Rows.take(3).toDF("a", "b", "c")
  }
  def smallT5(spark: SparkSession): DataFrame = {
    import spark.implicits._
    t5Rows.take(5).toDF("a", "b", "c", "d", "e")
  }
}
