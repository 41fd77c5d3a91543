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
  * composition shape).
  *
  * RECOVERY: bridge state is in-memory and does NOT survive a driver
  * restart — a restarted composition must either [[seed]] the bridge
  * from the downstream's materialized state (the sink knows each key's
  * last delivered value) or restart the downstream from empty state
  * alongside the fresh bridge; resuming a durable downstream against
  * an unseeded bridge would emit insert-without-retract on every key's
  * first post-restart update. Deliberately NOT Serializable: the
  * bridge must live where foreachBatch runs (the driver) — capturing
  * it in an executor-side closure would fork `prev` per task and
  * silently compute retractions against stale history, so that misuse
  * fails fast at closure serialization instead. */
final class RetractBridge[K, V] {
  private val prev = mutable.Map.empty[K, V]

  /** Rehydrate after a restart: install each key's last DELIVERED
    * value (typically read back from the downstream sink) without
    * emitting anything. */
  def seed(entries: Iterable[(K, V)]): Unit = synchronized {
    entries.foreach { case (k, v) => prev(k) = v }
  }

  /** The remembered last-delivered values (for checkpointing the
    * bridge alongside the composition's own state). */
  def snapshot: Map[K, V] = synchronized(prev.toMap)

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
