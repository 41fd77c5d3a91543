package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's named queries. Each query is a
  * `(SparkSession, sfDir) => DataFrame`; `oracleSql` carries the equivalent
  * DuckDB SQL for the driver's hash-compare (queries without an oracle get
  * a rows-only check).
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    graft.operators.BatchQueries,
    graft.operators.SqlQueries,
    graft.operators.WindowQueries,
    graft.operators.AsofQueries,
    graft.functions.ScalarQueries,
    graft.pipeline.DedupQueries,
    graft.pipeline.TextQueries,
    graft.pipeline.EmbeddingQueries,
    graft.pipeline.MultimodalQueries,
    graft.pipeline.CurationQueries,
    graft.pipeline.PackingQueries,
    graft.pipeline.BpeQueries,
    graft.streaming.CepQueries,
    graft.streaming.CepQuantQuery,
    graft.streaming.GroupCepQuery,
    graft.streaming.MatchRecognizeQuery,
    graft.graph.GraphQueries)

  private lazy val allQueries: Seq[Q] = modules.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
