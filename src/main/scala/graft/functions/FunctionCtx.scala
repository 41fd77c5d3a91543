package graft.functions

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** The reference's `FunctionContext` surface (flink-core
  * api/common/functions/RuntimeContext.java + table FunctionContext.java:
  * what a RichFunction can reach at runtime), mapped to Spark's
  * first-party equivalents and exercised by FunctionCtxSpec:
  *
  *  - metric counters (getMetricGroup().counter(...)) → named
  *    [[LongAccumulator]]s, aggregated driver-side across tasks
  *    ([[counter]]);
  *  - job parameters (getJobParameter) → session conf ([[jobParameter]]
  *    — spark.conf entries ship to executors via the SQL conf);
  *  - subtask identity (getIndexOfThisSubtask /
  *    getNumberOfParallelSubtasks) → [[subtaskIndex]] /
  *    [[parallelism]] off the live TaskContext;
  *  - distributed cache (getCachedFile) → `SparkContext.addFile` +
  *    `SparkFiles.get` ([[cachedFile]]).
  */
object FunctionCtx {

  /** A named metric counter usable inside any UDF/closure; read the
    * aggregated value driver-side with `.value` (Flink: metric reporters
    * aggregate the same way). */
  def counter(spark: SparkSession, name: String): LongAccumulator =
    spark.sparkContext.longAccumulator(name)

  /** Job-parameter lookup (executors see runtime SQL conf entries). */
  def jobParameter(spark: SparkSession, key: String,
      default: String): String =
    spark.conf.getOption(key).getOrElse(default)

  /** Index of the running task's partition — only meaningful inside a
    * task (throws outside one, like the reference outside open()). */
  def subtaskIndex(): Int = {
    val tc = TaskContext.get()
    require(tc != null, "subtaskIndex() is only available inside a task")
    tc.partitionId()
  }

  /** Number of partitions of the running stage's task set. */
  def parallelism(): Int = {
    val tc = TaskContext.get()
    require(tc != null, "parallelism() is only available inside a task")
    tc.numPartitions()
  }

  /** Distributed-cache file path (register with `sc.addFile(...)`). */
  def cachedFile(name: String): String =
    org.apache.spark.SparkFiles.get(name)
}
