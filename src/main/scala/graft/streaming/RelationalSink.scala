package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}

/** JDBC-style relational sink (reference: flink-connectors/flink-jdbc
  * JDBCOutputFormat.java:33 — buffer rows into a PreparedStatement,
  * `executeBatch` every `batchInterval` rows (default 5000) and on
  * close — and JDBCAppendTableSink, which renders the
  * `INSERT INTO t (c1, …) VALUES (?, …)` statement from the table
  * schema).
  *
  * The image carries no JDBC driver, so the `java.sql.Connection` layer
  * is abstracted behind [[StatementExecutor]]: a real deployment
  * implements it with a PreparedStatement per task (one connection per
  * partition — the same distribution the reference gets from one
  * OutputFormat instance per parallel subtask); RelationalSinkSpec
  * implements it over an in-memory store and exercises batching,
  * per-partition connections, and exactly-once epoch replay through
  * [[TxnSink.exactlyOnce]].
  *
  * Scale shape: rows never touch the driver — each partition buffers at
  * most `batchInterval` rows before flushing, so executor memory per
  * task is O(batchInterval), and a 1000-executor cluster opens 1000
  * parallel connections exactly like the reference's parallel
  * OutputFormat instances.
  */
object RelationalSink {

  /** One "connection" per partition. `executeBatch` receives the
    * rendered parameterized statement and the buffered parameter rows
    * (JDBCOutputFormat.flush → PreparedStatement.executeBatch). */
  trait StatementExecutor extends Serializable {
    def executeBatch(sql: String, rows: Seq[Seq[Any]]): Unit
    def close(): Unit = ()
  }

  /** `INSERT INTO t (c1, c2) VALUES (?, ?)` — JDBCAppendTableSink's
    * statement rendering from the schema. */
  def insertStatement(table: String, columns: Seq[String]): String =
    s"INSERT INTO $table (${columns.mkString(", ")}) VALUES (${
      columns.map(_ => "?").mkString(", ")})"

  /** Key-conflict upsert rendered as ANSI SQL:2003 MERGE (the
    * idempotent-write shape [[TxnSink.exactlyOnce]]'s contract asks
    * for). Parameter order is keyCols ++ valueCols, matching the row
    * layout [[writeBatched]] callers project. Targets with a native
    * `ON CONFLICT DO UPDATE` can swap the renderer; the executeBatch
    * contract is unchanged. */
  def upsertStatement(table: String, keyCols: Seq[String],
      valueCols: Seq[String]): String = {
    val all = keyCols ++ valueCols
    val src = s"(VALUES (${all.map(_ => "?").mkString(", ")})) AS src (${
      all.mkString(", ")})"
    val on = keyCols.map(k => s"$table.$k = src.$k").mkString(" AND ")
    val set = valueCols.map(v => s"$v = src.$v").mkString(", ")
    val ins = s"(${all.mkString(", ")}) VALUES (${
      all.map(c => s"src.$c").mkString(", ")})"
    s"MERGE INTO $table USING $src ON $on " +
      s"WHEN MATCHED THEN UPDATE SET $set " +
      s"WHEN NOT MATCHED THEN INSERT $ins"
  }

  /** Write `df` through per-partition batched statements: each task
    * creates its own executor (connection), buffers `batchInterval`
    * rows between flushes, and flushes the remainder on close —
    * JDBCOutputFormat.writeRecord/flush/close per parallel subtask.
    * Usable directly on a batch frame or inside `foreachBatch`. */
  def writeBatched(df: DataFrame, sql: String, batchInterval: Int,
      executorFactory: () => StatementExecutor): Unit = {
    require(batchInterval > 0, "batchInterval must be positive")
    val cols = df.columns
    df.foreachPartition { (it: Iterator[Row]) =>
      val exec = executorFactory()
      try {
        val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
        it.foreach { r =>
          buf += cols.indices.map(r.get)
          if (buf.size >= batchInterval) {
            exec.executeBatch(sql, buf.toSeq); buf.clear()
          }
        }
        if (buf.nonEmpty) exec.executeBatch(sql, buf.toSeq)
      } finally exec.close()
    }
  }

  /** Streaming append sink: `writeStream.foreachBatch(appendSink(...))`.
    * Epoch idempotence comes from composing with [[TxnSink.exactlyOnce]]
    * (the `committed_epochs`-table pattern in TxnSink's doc): replayed
    * micro-batches become no-ops, giving the exactly-once delivery the
    * reference's JDBC sink only approximates (it is at-least-once;
    * flink-jdbc has no TwoPhaseCommitSinkFunction implementation). */
  def appendSink(table: String, columns: Seq[String], batchInterval: Int,
      executorFactory: () => StatementExecutor): (DataFrame, Long) => Unit = {
    val sql = insertStatement(table, columns)
    (df, _) => writeBatched(df.selectExpr(columns: _*), sql, batchInterval,
      executorFactory)
  }
}
