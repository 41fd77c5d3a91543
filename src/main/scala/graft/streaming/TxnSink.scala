package graft.streaming

import org.apache.spark.sql.DataFrame

/** Generic two-phase-commit sink template (reference:
  * flink-streaming-java functions/sink/TwoPhaseCommitSinkFunction.java —
  * 830 LoC of beginTransaction/preCommit/commit/abort/recoverAndCommit
  * state machine driven by checkpoint callbacks).
  *
  * Structured Streaming's execution contract shrinks the template: epochs
  * (micro-batches) are totally ordered and a failed epoch is REPLAYED with
  * the same batchId, so exactly-once delivery to an external system is
  * idempotent-commit-by-epoch:
  *
  *  - beginTransaction/preCommit ≈ stage the batch under an epoch identity
  *  - commit                     ≈ atomically record the batchId committed
  *  - recoverAndCommit/abort     ≈ on replay, epochs in the log are no-ops
  *
  * [[exactlyOnce]] wires the protocol into `foreachBatch` with a pluggable
  * commit log; [[FileCommitLog]] commits via atomic rename — the same
  * primitive the streaming file sink's `_spark_metadata` epoch log uses
  * (its per-epoch atomicity is asserted in FormatsSpec).
  */
object TxnSink {

  /** Where committed epoch ids are durably recorded. Implementations for
    * real targets use the target's own transaction (a `committed_epochs`
    * table written in the same DB transaction as the data, a Kafka
    * transactional marker, ...) so data+log commit atomically. */
  trait CommitLog extends Serializable {
    def isCommitted(batchId: Long): Boolean
    def commit(batchId: Long): Unit
  }

  /** File-based log: `epoch-<id>.committed` markers created by atomic
    * rename. Suitable when the data write itself is staged-then-renamed
    * into place (file/object-store sinks). */
  final class FileCommitLog(dir: String) extends CommitLog {
    private def marker(id: Long) = new java.io.File(dir, s"epoch-$id.committed")
    override def isCommitted(id: Long): Boolean = marker(id).exists()
    override def commit(id: Long): Unit = {
      new java.io.File(dir).mkdirs()
      val tmp = new java.io.File(dir, s".epoch-$id.tmp")
      java.nio.file.Files.writeString(tmp.toPath, "committed")
      java.nio.file.Files.move(tmp.toPath, marker(id).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** Wrap a batch writer in the protocol for
    * `writeStream.foreachBatch(TxnSink.exactlyOnce(log)(write))`:
    * `write` executes at most once per epoch across query restarts —
    * replayed epochs found in the log are skipped. The write must be
    * atomic-or-idempotent at the target (stage+rename, transactional
    * INSERT, MERGE by key); the log turns epoch replays into no-ops. */
  def exactlyOnce(log: CommitLog)(write: (DataFrame, Long) => Unit):
      (DataFrame, Long) => Unit = { (df, id) =>
    if (!log.isCommitted(id)) {
      write(df, id)
      log.commit(id)
    }
  }
}
