package graft

import graft.streaming.NonWindowJoin
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

/** Scale measurement for the unbounded streaming outer join
  * ([[NonWindowJoin]]) — the operator has no batch/oracle surface, so
  * ScaleUpBench's SparkEntry protocol cannot reach it; this drives it
  * the two ways that matter at cluster scale:
  *
  *  1. KEY SCALE (the real Dataset surface over MemoryStream): the
  *     operator's parallelism story is hash partitioning on the join
  *     key, so wall time at K vs 10K keys (same per-key state size)
  *     should grow ~linearly in input — the same
  *     disjoint-shards regime ScaleUpBench measures for queries.
  *  2. HOT-KEY STRESS (the transition fn driven directly, output
  *     consumed WITHOUT materializing): one key holding `stateRows`
  *     distinct left rows receives a full batch of right-side
  *     arrivals, each of which emits O(stateRows) rows. Emission is
  *     lazy per element, so the only O(stateRows × arrivals) object is
  *     the consumed stream itself — this run materializes nothing but
  *     a counter, which is exactly what a downstream sink sees. The
  *     per-key state scan is the reference's own cost profile
  *     (NonWindowOuterJoin.scala:84-101); what this measures is that
  *     output cost is throughput, not memory.
  *
  * Run: Test/runMain graft.JoinScaleBench [keys] [stateRows] [arrivals]
  * Prints one JSON line + a markdown table for ENGINE.md.
  */
object JoinScaleBench {

  type E = (Int, Int)

  /** Drive the Dataset surface end-to-end at `keys` distinct keys,
    * `perSide` rows per key per side: micro-batch 1 delivers every
    * LEFT row (each null-pads into state), micro-batch 2 every RIGHT
    * row (each scans the buffered lefts, retracting the pads) — so
    * every key's state genuinely carries across the batch boundary.
    * Returns (seconds, rows emitted). */
  def keyScale(spark: SparkSession, keys: Int, perSide: Int): (Double, Long) = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in1 = MemoryStream[E]
    val in2 = MemoryStream[E]
    val emitted = new java.util.concurrent.atomic.AtomicLong
    val joined = NonWindowJoin.unboundedOuterJoin[Int, E, E](
      in1.toDS(), in2.toDS(), l => Some(l._1), r => Some(r._1),
      "full_outer")
    val q = joined.writeStream.outputMode("append")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[(Boolean, Option[E], Option[E])],
            _: Long) => emitted.addAndGet(df.count()); ()
      }.start()
    val rows = for (k <- 0 until keys; i <- 0 until perSide)
      yield (k, k * perSide + i)
    val t0 = System.nanoTime()
    try {
      in1.addData(rows: _*)
      q.processAllAvailable()
      in2.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    ((System.nanoTime() - t0) / 1e9, emitted.get())
  }

  /** One-key driver shared by the hot-key scenarios: seed the left
    * state, then time a single batch of right arrivals — each joins
    * the full left state. Output consumed row-at-a-time. */
  private def hotKeyDrive[S](
      fn: (Int, Iterator[(Boolean, Option[E], Option[E])],
        org.apache.spark.sql.streaming.GroupState[S]) =>
          Iterator[(Boolean, Option[E], Option[E])],
      stateRows: Int, arrivals: Int,
      seedPayload: Int => Int, arrivalPayload: Int => Int): (Double, Long) = {
    var state = Optional.empty[S]()
    def drive(els: Iterator[(Boolean, Option[E], Option[E])]): Long = {
      val st = TestGroupState.create[S](
        state, GroupStateTimeout.NoTimeout(), 0L,
        Optional.empty[Long](), hasTimedOut = false)
      var n = 0L
      fn(0, els, st).foreach(_ => n += 1)
      state = if (st.isRemoved) Optional.empty()
              else if (st.isUpdated) Optional.of(st.get)
              else state
      n
    }
    drive((0 until stateRows).iterator.map(i =>
      (true, Some((i, seedPayload(i))), None)))
    val t0 = System.nanoTime()
    val emitted = drive((0 until arrivals).iterator.map(j =>
      (true, None, Some((stateRows + j, arrivalPayload(j))))))
    ((System.nanoTime() - t0) / 1e9, emitted)
  }

  /** [[keyScale]] through the COLUMN surface ([[graft.streaming.NonWindowJoinSql]])
    * — the same protocol over DataFrames, so the state rides the
    * versioned + fingerprinted kryo envelope (one JoinStateEnvelope
    * encode/decode per touched key per micro-batch) instead of the
    * typed surface's product encoding. The wall ratio vs [[keyScale]]
    * bounds the whole Column-surface stack's overhead: envelope + kryo
    * + generic-Row handling + the canonical JSON grouping key. */
  def keyScaleSql(spark: SparkSession, keys: Int, perSide: Int): (Double, Long) = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val in1 = MemoryStream[E]
    val in2 = MemoryStream[E]
    val emitted = new java.util.concurrent.atomic.AtomicLong
    val joined = graft.streaming.NonWindowJoinSql.unboundedOuterJoin(
      in1.toDS().toDF("k", "v"), in2.toDS().toDF("j", "w"),
      Seq(col("k")), Seq(col("j")), "full_outer")
    val q = joined.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        emitted.addAndGet(df.count()); ()
      }.start()
    val rows = for (k <- 0 until keys; i <- 0 until perSide)
      yield (k, k * perSide + i)
    val t0 = System.nanoTime()
    try {
      in1.addData(rows: _*)
      q.processAllAvailable()
      in2.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    ((System.nanoTime() - t0) / 1e9, emitted.get())
  }

  /** Equi hot key: one key, `stateRows` distinct lefts, one batch of
    * `arrivals` rights each joining the full left state. */
  def hotKey(stateRows: Int, arrivals: Int): (Double, Long) =
    hotKeyDrive(NonWindowJoin.joinFn[Int, E, E]("left_outer"),
      stateRows, arrivals, identity, identity)

  /** [[hotKey]] for the NON-EQUI variant — the per-pair residual
    * predicate + joinCnt bookkeeping is the operator's most expensive
    * path; same one-batch shape, left_outer with a cond every pair
    * passes (worst case: every state row emits AND updates joinCnt). */
  def hotKeyNonEqui(stateRows: Int, arrivals: Int): (Double, Long) =
    hotKeyDrive(NonWindowJoin.joinFnNonEqui[Int, E, E]("left_outer",
      (l, r) => l._2 <= r._2), stateRows, arrivals, _ => 0, _ => 1)

  def main(args: Array[String]): Unit = {
    val keys = args.headOption.map(_.toInt).getOrElse(4000)
    val stateRows = args.lift(1).map(_.toInt).getOrElse(100000)
    val arrivals = args.lift(2).map(_.toInt).getOrElse(200)
    val perSide = 8
    val spark = Engine.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    // warm BOTH surfaces before timing either, then interleave the
    // sizes (typed 1x, SQL 1x, typed 10x, SQL 10x) — timing one
    // surface's runs entirely after the other's would hand the second
    // surface a fully JIT-hot session and bias the overhead ratio
    keyScale(spark, 50, perSide)
    keyScaleSql(spark, 50, perSide)
    val (t1, n1) = keyScale(spark, keys, perSide)
    val (s1, m1) = keyScaleSql(spark, keys, perSide)
    val (t10, n10) = keyScale(spark, keys * 10, perSide)
    val (s10, m10) = keyScaleSql(spark, keys * 10, perSide)
    val ratio = t10 / t1
    val sqlRatio = s10 / s1
    val envOverhead = s1 / t1

    // hot-key: warm then measure
    hotKey(10000, 20)
    val (th, nh) = hotKey(stateRows, arrivals)
    val thrpt = nh / th
    hotKeyNonEqui(10000, 20)
    val (tne, nne) = hotKeyNonEqui(stateRows, arrivals)
    val neThrpt = nne / tne

    println(f"[joinscale] keys=$keys%d 1x $t1%6.2fs ($n1%d rows) | " +
      f"10x $t10%6.2fs ($n10%d rows) | ratio $ratio%5.2f")
    println(f"[joinscale] SQL surface keys=$keys%d 1x $s1%6.2fs " +
      f"($m1%d rows) | 10x $s10%6.2fs ($m10%d rows) | ratio " +
      f"$sqlRatio%5.2f | overhead vs typed $envOverhead%5.2fx")
    println(f"[joinscale] hotkey state=$stateRows%d arrivals=$arrivals%d " +
      f"$th%6.2fs $nh%d rows ${thrpt / 1e6}%5.2fM rows/s")
    println(f"[joinscale] hotkeyNE state=$stateRows%d arrivals=$arrivals%d " +
      f"$tne%6.2fs $nne%d rows ${neThrpt / 1e6}%5.2fM rows/s")
    println(f"""{"metric":"joinscale","keys":$keys,"x1_sec":$t1%.3f,""" +
      f""""x10_sec":$t10%.3f,"ratio":$ratio%.2f,"x1_rows":$n1,""" +
      f""""x10_rows":$n10,"hotkey_state":$stateRows,""" +
      f""""hotkey_arrivals":$arrivals,"hotkey_sec":$th%.3f,""" +
      f""""hotkey_rows":$nh,"hotkey_rows_per_sec":${thrpt.toLong},""" +
      f""""hotkey_ne_sec":$tne%.3f,"hotkey_ne_rows":$nne,""" +
      f""""hotkey_ne_rows_per_sec":${neThrpt.toLong},""" +
      f""""sql_x1_sec":$s1%.3f,"sql_x10_sec":$s10%.3f,""" +
      f""""sql_ratio":$sqlRatio%.2f,"sql_overhead":$envOverhead%.2f}""")
    println()
    println("| scenario | size | seconds | rows emitted |")
    println("|---|---|---|---|")
    println(f"| key-scale 1x | $keys keys x $perSide/side | $t1%.2fs | $n1 |")
    println(f"| key-scale 10x | ${keys * 10} keys x $perSide/side | $t10%.2fs | $n10 |")
    println(f"| SQL-surface key-scale 1x | $keys keys x $perSide/side | $s1%.2fs | $m1 |")
    println(f"| SQL-surface key-scale 10x | ${keys * 10} keys x $perSide/side | $s10%.2fs | $m10 |")
    println(f"| hot key, one batch | $stateRows state rows x $arrivals arrivals | $th%.2fs | $nh |")
    println(f"| hot key non-equi | $stateRows state rows x $arrivals arrivals | $tne%.2fs | $nne |")
  }
}
