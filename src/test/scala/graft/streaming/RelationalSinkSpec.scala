package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** JDBC-style sink exercised end-to-end (SURVEY §2.2 row: JDBC/external
  * sinks). Reference behaviors pinned: JDBCOutputFormat.java:33 batched
  * flush at batchInterval + remainder on close, one connection per
  * parallel subtask; JDBCAppendTableSink statement rendering; composed
  * with TxnSink.exactlyOnce for epoch-idempotent streaming delivery.
  */
class RelationalSinkSpec extends SparkSuite {

  test("statement rendering matches the append-table-sink shape") {
    assert(RelationalSink.insertStatement("t", Seq("a", "b")) ==
      "INSERT INTO t (a, b) VALUES (?, ?)")
    assert(RelationalSink.upsertStatement("t", Seq("k"), Seq("v1", "v2")) ==
      "MERGE INTO t USING (VALUES (?, ?, ?)) AS src (k, v1, v2) " +
        "ON t.k = src.k " +
        "WHEN MATCHED THEN UPDATE SET v1 = src.v1, v2 = src.v2 " +
        "WHEN NOT MATCHED THEN INSERT (k, v1, v2) VALUES (src.k, src.v1, src.v2)")
  }

  test("writeBatched flushes every batchInterval rows per partition, remainder on close") {
    import spark.implicits._
    RelationalSinkSpec.store.clear()
    RelationalSinkSpec.flushSizes.clear()
    val df = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(2)
    RelationalSink.writeBatched(df,
      RelationalSink.insertStatement("kv", Seq("id", "v")),
      batchInterval = 3, () => new RelationalSinkSpec.MemExecutor)
    val rows = RelationalSinkSpec.store.asScala.toSeq
    assert(rows.size == 10)
    assert(rows.map(_._2.head.asInstanceOf[Long]).sorted == (1L to 10L))
    // every flush is <= batchInterval and nothing exceeded the buffer
    assert(RelationalSinkSpec.flushSizes.asScala.forall(n => n >= 1 && n <= 3))
  }

  test("streaming appendSink + TxnSink.exactlyOnce makes epoch replays no-ops") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    RelationalSinkSpec.store.clear()
    val committed = new java.util.concurrent.ConcurrentHashMap[Long, Boolean]()
    val log = new TxnSink.CommitLog {
      override def isCommitted(id: Long): Boolean = committed.containsKey(id)
      override def commit(id: Long): Unit = committed.put(id, true)
    }
    val write = RelationalSink.appendSink("kv", Seq("id", "v"),
      batchInterval = 2, () => new RelationalSinkSpec.MemExecutor)
    val guarded = TxnSink.exactlyOnce(log)(write)

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "v").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        guarded(df, id)
        guarded(df, id) // simulate the same epoch replayed after a failure
      }.start()
    try {
      input.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      input.addData((3L, "c")); q.processAllAvailable()
    } finally q.stop()

    val ids = RelationalSinkSpec.store.asScala.toSeq
      .map(_._2.head.asInstanceOf[Long]).sorted
    assert(ids == Seq(1L, 2L, 3L)) // each row delivered exactly once
  }
}

object RelationalSinkSpec {
  // static per-JVM "database" — reachable from executor threads in local mode
  val store = new ConcurrentLinkedQueue[(String, Seq[Any])]()
  val flushSizes = new ConcurrentLinkedQueue[Int]()

  final class MemExecutor extends RelationalSink.StatementExecutor {
    override def executeBatch(sql: String, rows: Seq[Seq[Any]]): Unit = {
      flushSizes.add(rows.size)
      rows.foreach(r => store.add((sql, r)))
    }
  }
}
