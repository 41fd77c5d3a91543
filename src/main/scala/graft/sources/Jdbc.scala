package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC INPUT with the reference's parallel-range split semantics
  * (flink-connectors/flink-jdbc/.../JDBCInputFormat.java:101 +
  * NumericBetweenParametersProvider: the [lower, upper] key range is cut
  * into numPartitions contiguous sub-ranges and each split runs its own
  * bounded query). Spark's JDBC relation implements exactly that
  * contract — partitionColumn/lowerBound/upperBound/numPartitions
  * compile to one `WHERE partCol >= x AND partCol < y` predicate per
  * task — so the operator is declarative; this wrapper pins the
  * reference's split arithmetic and is exercised END-TO-END against an
  * embedded Derby database (the in-image `derby-10.16` jars; round 3
  * had concluded "no driver jar", which held only for client/server
  * drivers — the embedded engine needs no network). Scale: each of the
  * N splits is an independent cursor against the database; N bounds
  * both the parallelism AND the per-query row count, the same dial the
  * reference exposes.
  */
object Jdbc {

  val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** Parallel-range read: numPartitions bounded queries over
    * [lowerBound, upperBound] of a numeric partition column.
    *
    * `predicate` composes a caller WHERE clause with each split's range
    * bound — the reference JDBCInputFormat posture (its query text
    * carries the caller's WHERE and the provider appends the range
    * parameters), pushed as a subquery so the DATABASE evaluates it
    * inside every split cursor: a split whose range the predicate
    * empties returns zero rows from an index scan instead of streaming
    * rows to Spark. Spark-native `.filter(...)` on the returned frame
    * reaches the same place (JDBCRelation compiles Catalyst filters
    * into each split's WHERE — `PushedFilters` in the scan node);
    * `predicate` exists for expressions outside Catalyst's pushdown
    * dialect, exactly like the reference's free-form query text. */
  def readRange(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, driver: String = DerbyDriver,
      predicate: Option[String] = None): DataFrame = {
    val dbtable = predicate
      .map(p => s"(SELECT * FROM $table WHERE $p) graft_sub")
      .getOrElse(table)
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", dbtable)
      .option("driver", driver)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .load()
  }

  /** Single-cursor read (the reference's non-parallel form). */
  def read(spark: SparkSession, url: String, table: String,
      driver: String = DerbyDriver): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .load()

  /** A [[graft.streaming.RelationalSink.StatementExecutor]] executor over a real
    * JDBC connection (PreparedStatement addBatch/executeBatch) — closes
    * the sink loop against an actual database instead of the spec's
    * in-memory recorder. */
  def statements(url: String,
      driver: String = DerbyDriver): graft.streaming.RelationalSink.StatementExecutor = {
    Class.forName(driver)
    val conn = java.sql.DriverManager.getConnection(url)
    new graft.streaming.RelationalSink.StatementExecutor {
      def executeBatch(sql: String, rows: Seq[Seq[Any]]): Unit = {
        val ps = conn.prepareStatement(sql)
        try {
          rows.foreach { r =>
            r.zipWithIndex.foreach { case (v, i) =>
              ps.setObject(i + 1, v)
            }
            ps.addBatch()
          }
          ps.executeBatch()
        } finally ps.close()
      }
      override def close(): Unit = conn.close()
    }
  }
}
