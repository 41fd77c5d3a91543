package graft.operators

import graft.{Q, QueryModule}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join and bounded range-count — the two temporal
  * join shapes a training-data / feature pipeline needs that plain equi-join
  * can't express (reference analog: the event-time interval join,
  * flink-streaming-java IntervalJoinOperator; batch as-of join has no
  * reference operator — DuckDB's ASOF JOIN serves as the oracle).
  *
  * Scale design: both operators avoid the naive key-join-then-filter plan,
  * whose worst case is |probe_k| × |build_k| intermediate rows per key (a
  * hot key with 1M events each side would materialize 10^12 pairs). Instead
  * the two inputs are UNIONed with a side tag and processed by ONE window
  * pass: hash-shuffle on the key, sort within partition by (ts, tag), then
  * a running `last(...)` (as-of) or a RANGE-frame `sum` (range count).
  * Cost is O(n log n) per partition, one shuffle total, and the sort spills
  * gracefully — the same plan Spark uses for any window aggregate, so AQE
  * skew handling applies unchanged on a 1000-executor cluster.
  */
object AsofOps {

  /** For every probe row, attach the payload of the *latest* build row with
    * `build.ts <= probe.ts` on the same key (inclusive, like SQL ASOF).
    *
    * Output = all probe columns + `asof_ts` (matched build timestamp) +
    * `asof_<c>` for each payload column; unmatched probe rows are dropped
    * when `leftJoin = false`, kept with nulls otherwise.
    *
    * Build rows sort before probe rows at equal timestamps (tag 0 < 1), so
    * a build row at exactly probe.ts matches. Rows with identical
    * (key, ts, tag) have no defined winner — callers needing total
    * determinism must ensure per-side (key, ts) uniqueness.
    *
    * The build side travels as ONE struct(ts, payload...) column and the
    * match is a single `last(struct, ignoreNulls)`: every `asof_*` output
    * column comes from the SAME matched build row. (Per-column `last`s
    * would silently fall back to an OLDER row for any payload column that
    * is NULL on the matched row — DuckDB ASOF returns the matched row's
    * NULL, and so does this.)
    */
  def asofJoin(probe: DataFrame, build: DataFrame, key: String, ts: String,
      payload: Seq[String], leftJoin: Boolean = false): DataFrame =
    asofCore(probe, build, key, ts, payload, leftJoin, forward = false)

  /** The FORWARD direction (pandas merge_asof direction='forward'): for
    * every probe row, the payload of the *earliest* build row with
    * `build.ts >= probe.ts` (inclusive) — "the next version at or after
    * this instant", the shape label-attribution and next-event feature
    * pipelines need. Same one-shuffle union+window plan mirrored: build
    * rows sort AFTER probe rows at equal timestamps (so an exactly-
    * simultaneous build row matches) and the partition is sorted
    * DESCENDING so the match stays a running `last(...)` over
    * (unboundedPreceding, currentRow). A (currentRow,
    * unboundedFollowing) frame would express the same result, but Spark
    * evaluates that frame shape by re-scanning the remainder of the
    * partition for every output row — O(n²) on a hot key — while the
    * running frame is incremental O(n); flipping the sort keeps the
    * forward direction on the same cost curve as backward.
    * Output schema and null/determinism contracts are [[asofJoin]]'s. */
  def asofJoinForward(probe: DataFrame, build: DataFrame, key: String,
      ts: String, payload: Seq[String],
      leftJoin: Boolean = false): DataFrame =
    asofCore(probe, build, key, ts, payload, leftJoin, forward = true)

  /** The NEAREST direction (pandas merge_asof direction='nearest'): for
    * every probe row, the build row minimizing |build.ts - probe.ts| on
    * the same key, either side; an exactly-equidistant before/after pair
    * resolves to the EARLIER (backward) row — a documented tie rule, pure
    * integer-micros comparison. Plan: the same single key shuffle, then
    * TWO in-partition sort+running-frame passes (ascending backward,
    * descending forward — both the O(n) incremental frame, see
    * [[asofJoinForward]]) and a per-row distance pick; no join, no
    * following-unbounded frame, so the hot-key cost stays O(n log n).
    * Output schema and null/determinism contracts are [[asofJoin]]'s. */
  def asofJoinNearest(probe: DataFrame, build: DataFrame, key: String,
      ts: String, payload: Seq[String],
      leftJoin: Boolean = false): DataFrame = {
    val (bSide, pSide, probeRest) =
      taggedSides(probe, build, key, ts, payload, bTag = 0, pTag = 1)
    // build tag 0 sorts before probe tag 1 under BOTH orderings (the
    // descending pass flips only _ts), so an equal-ts build lands in both
    // running frames at distance 0 and the backward tie rule returns it
    val wBack = Window.partitionBy(key).orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(key).orderBy(col("_ts").desc, col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dBack = unix_micros(col("_ts")) - unix_micros(col("_back.__asof_ts"))
    val dFwd = unix_micros(col("_fwd.__asof_ts")) - unix_micros(col("_ts"))
    val matched = bSide.unionByName(pSide)
      .withColumn("_back", last(col("_b"), ignoreNulls = true).over(wBack))
      .withColumn("_fwd", last(col("_b"), ignoreNulls = true).over(wFwd))
      .where(col("_tag") === 1)
      .withColumn("_match",
        when(col("_back").isNotNull &&
          (col("_fwd").isNull || dBack <= dFwd), col("_back"))
          .otherwise(col("_fwd")))
    projectMatch(matched, key, ts, probeRest, payload, leftJoin)
  }

  /** Backward as-of with a TOLERANCE bound (pandas merge_asof
    * `tolerance=`): the latest at-or-before build row matches ONLY if
    * `probe.ts - build.ts <= toleranceMicros` (inclusive); a nearest
    * match that is too stale does NOT fall back to an even older row —
    * the match is rejected (dropped when `leftJoin = false`, nulled
    * otherwise). Stale feature values are worse than missing ones in a
    * training pipeline; this is the operator form of that rule. Same
    * one-shuffle union+window plan as [[asofJoin]] plus one map-side
    * gap comparison in exact integer micros. */
  def asofJoinWithin(probe: DataFrame, build: DataFrame, key: String,
      ts: String, payload: Seq[String], toleranceMicros: Long,
      leftJoin: Boolean = false): DataFrame = {
    require(toleranceMicros >= 0, s"negative tolerance: $toleranceMicros")
    val all = asofCore(probe, build, key, ts, payload, leftJoin = true,
      forward = false)
    val ok = col("asof_ts").isNotNull &&
      unix_micros(col(ts)) - unix_micros(col("asof_ts")) <= toleranceMicros
    if (leftJoin)
      all.select(all.columns.map { c =>
        if (c == "asof_ts" || payload.map("asof_" + _).contains(c))
          when(ok, col(c)).otherwise(lit(null)).as(c)
        else col(c)
      }: _*)
    else all.where(ok)
  }

  private def asofCore(probe: DataFrame, build: DataFrame, key: String,
      ts: String, payload: Seq[String], leftJoin: Boolean,
      forward: Boolean): DataFrame = {
    // tags order the build row onto the probe row's matching side of an
    // equal timestamp: backward = build first ascending (0 < 1, frame
    // reaches back), forward = build first DESCENDING (1 > 0)
    val (bTag, pTag) = if (forward) (1, 0) else (0, 1)
    val (bSide, pSide, probeRest) =
      taggedSides(probe, build, key, ts, payload, bTag, pTag)
    // both directions run the O(n) incremental (unboundedPreceding,
    // currentRow) frame; forward flips the sort instead of the frame (a
    // following-unbounded frame is O(n²) per key in Spark — see the
    // asofJoinForward scaladoc). Descending (_ts, _tag) puts the builds
    // at-or-after a probe BEFORE it, build first at equal ts (tag 1 > 0),
    // so the running last() is the earliest at-or-after build.
    val base =
      if (forward)
        Window.partitionBy(key).orderBy(col("_ts").desc, col("_tag").desc)
      else Window.partitionBy(key).orderBy(col("_ts"), col("_tag"))
    val matched = bSide.unionByName(pSide)
      .withColumn("_match", last(col("_b"), ignoreNulls = true)
        .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("_tag") === pTag)
    projectMatch(matched, key, ts, probeRest, payload, leftJoin)
  }

  /** Union legs for the tagged one-shuffle plan: the build side carries
    * its payload as ONE struct `_b` (null probe columns), the probe side
    * carries its columns (null `_b`). Returns (bSide, pSide, probeRest). */
  private def taggedSides(probe: DataFrame, build: DataFrame, key: String,
      ts: String, payload: Seq[String], bTag: Int,
      pTag: Int): (DataFrame, DataFrame, Seq[String]) = {
    val probeRest = probe.columns.toSeq.filterNot(c => c == key || c == ts)
    val bSide = build.select(
      (col(key) +: col(ts).as("_ts") +: lit(bTag).as("_tag") +:
        probeRest.map(c => lit(null).cast(probe.schema(c).dataType).as(c))) :+
        struct(col(ts).as("__asof_ts") +: payload.map(col): _*).as("_b"): _*)
    val pSide = probe.select(
      (col(key) +: col(ts).as("_ts") +: lit(pTag).as("_tag") +:
        probeRest.map(col)) :+
        lit(null).cast(bSide.schema("_b").dataType).as("_b"): _*)
    (bSide, pSide, probeRest)
  }

  /** Inner/left filtering + the shared output projection over a `_match`
    * struct column: probe columns back under their names, `asof_ts` +
    * `asof_<c>` from the matched build row. */
  private def projectMatch(matched: DataFrame, key: String, ts: String,
      probeRest: Seq[String], payload: Seq[String],
      leftJoin: Boolean): DataFrame = {
    val joined = if (leftJoin) matched else matched.where(col("_match").isNotNull)
    joined.select(
      (col(key) +: col("_ts").as(ts) +: probeRest.map(col)) ++:
        (col("_match.__asof_ts").as("asof_ts") +:
          payload.map(c => col(s"_match.$c").as(s"asof_$c"))): _*)
  }

  /** For every probe row, the count of build rows on the same key with
    * `build.ts ∈ [probe.ts - window, probe.ts]` (both ends inclusive, like
    * SQL BETWEEN). Same union-and-window plan as [[asofJoin]]; the frame is
    * a RANGE over epoch microseconds, so sub-second bounds stay exact.
    * Output = all probe columns + `n_in_range` (0 when none — left-join
    * semantics). */
  def rangeCount(probe: DataFrame, build: DataFrame, key: String, ts: String,
      windowMicros: Long): DataFrame = {
    val probeRest = probe.columns.toSeq.filterNot(c => c == key || c == ts)
    val bSide = build.select(
      col(key) +: col(ts).as("_ts") +: lit(1).as("_hit") +:
        probeRest.map(c => lit(null).cast(probe.schema(c).dataType).as(c)): _*)
    val pSide = probe.select(
      col(key) +: col(ts).as("_ts") +: lit(0).as("_hit") +: probeRest.map(col): _*)
    val w = Window.partitionBy(key).orderBy(unix_micros(col("_ts")))
      .rangeBetween(-windowMicros, 0)
    bSide.unionByName(pSide)
      .withColumn("n_in_range", sum(col("_hit")).over(w))
      .where(col("_hit") === 0)
      .select(col(key) +: col("_ts").as(ts) +: probeRest.map(col) :+
        col("n_in_range"): _*)
  }
}
