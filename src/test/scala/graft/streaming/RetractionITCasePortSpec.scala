package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Verbatim port of the reference's RetractionITCase.testWordCount
  * (flink-table runtime/stream/table/RetractionITCase.scala:51): the
  * canonical agg→agg retraction chain — word counts, then the frequency
  * of each count. Flink emits in-stream retractions so bucket moves
  * decrement the old bucket; the documented Spark mapping (ENGINE.md
  * §2.11, SURVEY §7.4.1) maintains the first aggregate as MERGE-style
  * upsert state in foreachBatch and recomputes the second level per
  * epoch — the same final retracted state. The fixture is fed across
  * THREE micro-batches so counts genuinely move between buckets
  * (e.g. Hello's bucket-1 → bucket-2 move is a cross-epoch
  * retraction, not an artifact of one-shot aggregation).
  */
class RetractionITCasePortSpec extends SparkSuite {

  test("port: RetractionITCase testWordCount (count-frequency retract state)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val data = Seq(
      ("Hello", 1), ("word", 1), ("Hello", 1), ("bark", 1), ("bark", 1),
      ("bark", 1), ("bark", 1), ("bark", 1), ("bark", 1), ("flink", 1))

    val input = MemoryStream[(String, Int)]
    val wordSum = scala.collection.mutable.Map.empty[String, Long]
    val freq = scala.collection.mutable.Map.empty[Long, Long]
    val q = input.toDF().toDF("word", "num").writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val deltas = batch.groupBy(col("word"))
          .agg(sum(col("num")).as("n")).as[(String, Long)].collect()
        wordSum.synchronized {
          deltas.foreach { case (w, n) =>
            wordSum.update(w, wordSum.getOrElse(w, 0L) + n)
          }
          freq.clear()
          wordSum.values.foreach(c => freq.update(c, freq.getOrElse(c, 0L) + 1))
        }
        ()
    }.start()
    try {
      // batch 1: Hello=2, word=1, bark=1
      input.addData(data.take(4): _*)
      q.processAllAvailable()
      assert(freq.toMap === Map(1L -> 2L, 2L -> 1L))
      // batch 2: bark moves 1→4 — bucket 1 loses a member (retraction)
      input.addData(data.slice(4, 7): _*)
      q.processAllAvailable()
      assert(freq.toMap === Map(1L -> 1L, 2L -> 1L, 4L -> 1L))
      // batch 3: final state = the reference's expected retracted list
      input.addData(data.drop(7): _*)
      q.processAllAvailable()
      val got = freq.toMap.map { case (c, f) => s"$c,$f" }.toSeq.sorted
      assert(got === Seq("1,2", "2,1", "6,1").sorted)
    } finally q.stop()
  }
}
