package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** RuntimeContext/FunctionContext parity: metric counters, job
  * parameters, subtask identity and the distributed cache, each used
  * from inside executor-side code. */
class FunctionCtxSpec extends SparkSuite {
  import spark.implicits._

  test("metric counters aggregate across tasks (getMetricGroup parity)") {
    val nulls = FunctionCtx.counter(spark, "null_payloads")
    val ds = Seq(Some(1), None, Some(3), None, None).toDS()
      .repartition(3)
    val cleaned = ds.mapPartitions { it =>
      it.flatMap {
        case Some(v) => Some(v)
        case None => nulls.add(1L); None
      }
    }
    assert(cleaned.collect().sorted.toSeq == Seq(1, 3))
    assert(nulls.value == 3L)
  }

  test("job parameters ship to executor closures (getJobParameter parity)") {
    spark.conf.set("graft.test.multiplier", "7")
    val m = FunctionCtx.jobParameter(spark, "graft.test.multiplier", "1").toLong
    val got = spark.range(3).map(_ * m).collect().sorted.toSeq
    assert(got == Seq(0L, 7L, 14L))
    assert(FunctionCtx.jobParameter(spark, "graft.test.absent", "dflt") == "dflt")
  }

  test("subtask index / parallelism are the live task's identity") {
    val rows = spark.range(8).repartition(4)
      .mapPartitions { it =>
        val idx = FunctionCtx.subtaskIndex()
        val par = FunctionCtx.parallelism()
        it.map(_ => (idx, par))
      }.collect()
    assert(rows.map(_._1).distinct.length == 4)
    assert(rows.forall(_._2 == 4))
    // outside a task: refuses, like the reference outside open()
    assertThrows[IllegalArgumentException](FunctionCtx.subtaskIndex())
  }

  test("distributed cache: addFile + cachedFile round-trip (getCachedFile parity)") {
    val f = java.nio.file.Files.createTempFile("graft-cache", ".txt")
    java.nio.file.Files.writeString(f, "lookup-table-v1")
    spark.sparkContext.addFile(f.toString)
    val name = f.getFileName.toString
    val contents = spark.range(2).mapPartitions { it =>
      val path = FunctionCtx.cachedFile(name)
      val text = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        "UTF-8")
      it.map(_ => text)
    }.collect().distinct.toSeq
    assert(contents == Seq("lookup-table-v1"))
  }
}
