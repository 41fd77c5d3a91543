package graft.streaming

import scala.collection.mutable

/** Update-stream → retract-stream bridge for foreachBatch
  * compositions over [[NonWindowJoin.joinFn]].
  *
  * The reference's planner chains a group-aggregate's RETRACT stream
  * straight into its unbounded join inside one SQL query (flink-table
  * stream/table/JoinITCase.scala:497 testLeftJoinWithRetractionInput —
  * DataStreamGroupAggregate emits retract(old)+insert(new) per count
  * move). Spark cannot place a second stateful operator below an
  * update-mode streaming aggregate in one query, so the achievable
  * form is a foreachBatch composition — and the missing piece is this
  * bridge: an update-mode micro-batch reports each changed key's NEW
  * aggregate row only, while the join's transition function needs the
  * change-tagged delta. `tag` remembers the previously delivered value
  * per key and expands each update into the reference's exact retract
  * stream (retract the old value, then insert the new one, in that
  * order — the join's null-pad flips depend on it).
  *
  * Scale: state is ONE value per live aggregate key, held where the
  * bridge runs (the foreachBatch caller — typically the driver). That
  * matches the composition's own shape: foreachBatch collects the
  * update batch to feed the next operator, so the key cardinality is
  * already a driver-side quantity there; for key spaces beyond driver
  * memory, run the composition's join keyed-distributed (the
  * [[NonWindowJoin.unboundedOuterJoin]] Dataset surface) and keep
  * foreachBatch compositions for the aggregate-arity streams they fit
  * (aggregates compress input to one row per group key). Thread-safe:
  * concurrent foreachBatch callbacks from two upstream queries may tag
  * through their own bridges under one downstream lock (the spec's
  * composition shape). */
final class RetractBridge[K, V] extends Serializable {
  private val prev = mutable.Map.empty[K, V]

  /** Change-tag one update batch: per updated key, retract the
    * previously delivered value (if any), then insert the new one. */
  def tag(updates: Seq[(K, V)]): Seq[(Boolean, K, V)] = synchronized {
    updates.flatMap { case (k, v) =>
      val out = prev.get(k).map(o => (false, k, o)).toSeq :+ ((true, k, v))
      prev(k) = v
      out
    }
  }

  /** Forget a key (emits the retraction of its last value, if any) —
    * for complete-mode sources that CAN drop keys. Update-mode
    * streaming aggregates never do; provided for symmetry. */
  def drop(k: K): Seq[(Boolean, K, V)] = synchronized {
    prev.remove(k).map(o => (false, k, o)).toSeq
  }

  /** Number of keys currently remembered. */
  def size: Int = synchronized(prev.size)
}
