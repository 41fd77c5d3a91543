package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampType}

/** The SQL:2011 `FOR SYSTEM_TIME AS OF` surface over the engine's
  * temporal-join runtime (reference lineage: Flink's temporal table
  * functions arrive in 1.7, `FOR SYSTEM_TIME AS OF` in 1.12 — this is
  * the user-facing text form of what [[AsofOps.asofJoin]] /
  * `StreamOps.temporalJoin` already execute, so the engine exceeds the
  * 1.6 surface here deliberately: it is the form users write).
  *
  * Supported statement shape (one temporal join; the SELECT list and
  * any trailing WHERE/GROUP BY/HAVING/ORDER BY/LIMIT run verbatim
  * through `spark.sql` afterwards):
  *
  * {{{
  * SELECT f.event_id, v.rate, ...
  * FROM facts [AS] f
  * [LEFT] JOIN versions FOR SYSTEM_TIME AS OF f.ts [AS] v
  *   ON f.k1 = v.k1 [AND f.k2 = v.k2 ...]
  * [WHERE ...] [GROUP BY ...] [ORDER BY ...] [LIMIT n]
  * }}}
  *
  * `facts`/`versions` resolve through `spark.table` (temp views or
  * catalog tables). Each fact row joins the version row that was
  * current AT THE FACT'S event time: the latest version with
  * `version.<versionTimeCol> <= f.<asOfCol>` on the equi-keys. `JOIN`
  * drops facts preceding every version; `LEFT JOIN` keeps them with a
  * NULL version struct. The joined relation exposes ONE STRUCT COLUMN
  * PER ALIAS (`f`, `v` above), so the select list / tail clauses
  * reference `f.col` / `v.col` exactly as written — no text rewriting
  * of user expressions ever happens.
  *
  * Batch plan = the [[AsofOps]] shape: union the two sides with a side
  * tag and resolve with ONE window pass (hash shuffle on the keys, sort
  * by (time, tag), running `last(version_struct, ignoreNulls)`) — one
  * shuffle, no per-key quadratic, AQE-skew-safe at cluster scale.
  * Streaming inputs (either side) route through
  * `StreamOps.temporalJoin`'s keyed state (bounded version buffer,
  * watermark-gated emission); rows travel as JSON over the declared
  * schemas and re-expand to the same two struct columns, so the text
  * form is identical in both regimes.
  *
  * Rejections (named errors, by design):
  *  - `FOR SYSTEM_TIME AS OF PROCTIME()` / `CURRENT_TIMESTAMP` / `NOW()`
  *    — the processing-time form has no deterministic replay semantics;
  *  - an AS OF expression that is not `<factAlias>.<column>`;
  *  - non-equi or non-conjunctive ON conditions;
  *  - anything outside the statement shape above.
  */
object TemporalSql {

  /** Named rejection for the unsupported corners — callers can match on
    * the type, and the message names the exact construct. */
  final class TemporalSqlError(msg: String)
      extends IllegalArgumentException(msg)

  private def fail(msg: String): Nothing = throw new TemporalSqlError(msg)

  private case class Parsed(select: String, factTable: String,
      factAlias: String, leftJoin: Boolean, versionTable: String,
      versionAlias: String, asOfCol: String, factKeys: Seq[String],
      versionKeys: Seq[String], tail: String)

  private val StmtRe = (
    """(?is)^\s*SELECT\s+(.*?)\s+FROM\s+([\w.]+)(?:\s+AS)?\s+(\w+)\s+""" +
      """(LEFT(?:\s+OUTER)?\s+JOIN|INNER\s+JOIN|JOIN)\s+([\w.]+)\s+""" +
      """FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(.+?)\s+(?:AS\s+)?(\w+)\s+""" +
      """ON\s+(.*?)((?:\s+(?:WHERE|GROUP\s+BY|HAVING|ORDER\s+BY|LIMIT)\b.*)?)\s*$""").r

  private val ProcTimeRe =
    """(?i).*\b(PROCTIME\s*\(|CURRENT_TIMESTAMP\b|NOW\s*\(|LOCALTIMESTAMP\b).*""".r
  private val ColRefRe = """(?s)^\s*(\w+)\s*\.\s*(\w+)\s*$""".r
  private val EqRe = """(?s)^\s*(\w+)\s*\.\s*(\w+)\s*=\s*(\w+)\s*\.\s*(\w+)\s*$""".r

  private def parse(sql: String): Parsed = sql match {
    case StmtRe(select, ft, fa, joinKw, vt, asOfExpr, va, onText, tail) =>
      asOfExpr match {
        case ProcTimeRe(what) =>
          fail("processing-time temporal join is not supported: FOR " +
            s"SYSTEM_TIME AS OF '${what.takeWhile(_ != '(').trim}' has " +
            "no deterministic replay semantics; use an event-time " +
            s"column of the fact side (e.g. $fa.ts)")
        case _ => ()
      }
      val asOfCol = asOfExpr match {
        case ColRefRe(a, c) if a.equalsIgnoreCase(fa) => c
        case ColRefRe(a, _) =>
          fail(s"FOR SYSTEM_TIME AS OF must reference the fact side " +
            s"'$fa', got '$a.<col>'")
        case other =>
          fail("FOR SYSTEM_TIME AS OF supports a plain fact column " +
            s"reference, got expression '${other.trim}'")
      }
      if ("""(?i)\bOR\b""".r.findFirstIn(onText).isDefined)
        fail("temporal join ON must be a conjunction of equi-predicates" +
          s", got '$onText'")
      val pairs = onText.split("""(?i)\s+AND\s+""").toSeq.map {
        case EqRe(a1, c1, a2, c2)
            if a1.equalsIgnoreCase(fa) && a2.equalsIgnoreCase(va) =>
          (c1, c2)
        case EqRe(a1, c1, a2, c2)
            if a1.equalsIgnoreCase(va) && a2.equalsIgnoreCase(fa) =>
          (c2, c1)
        case other =>
          fail("temporal join ON supports only " +
            s"'$fa.col = $va.col' equi-predicates, got '${other.trim}'")
      }
      Parsed(select, ft, fa, joinKw.toUpperCase.startsWith("LEFT"), vt,
        va, asOfCol, pairs.map(_._1), pairs.map(_._2), tail)
    case _ =>
      fail("unsupported statement: expected SELECT ... FROM <facts> " +
        "[AS] f [LEFT] JOIN <versions> FOR SYSTEM_TIME AS OF f.<ts> " +
        "[AS] v ON f.k = v.k [AND ...] [WHERE/GROUP BY/ORDER BY/LIMIT]")
  }

  /** epoch-micros view of a time column (timestamp or integral). */
  private def micros(df: DataFrame, c: String) =
    df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case _ => col(c).cast(LongType)
    }

  /** Column-level mirror of `StreamOps.detString` applied to a row's
    * JSON rendering: the deterministic same-timestamp tiebreak key. The
    * streaming path orders same-ts versions by
    * `detString(to_json(row))` (its payloads ARE row-JSON strings), so
    * the batch window must sort by the IDENTICAL transform — escape the
    * structural delimiters in the same order detString does — for both
    * regimes to crown the same winner on duplicate (key, ts) versions. */
  private def detJson(row: org.apache.spark.sql.Column) =
    Seq("\\" -> "\\\\", "," -> "\\,", "[" -> "\\[", "]" -> "\\]",
      "(" -> "\\(", ")" -> "\\)")
      .foldLeft(to_json(row)) { case (c, (from, to)) =>
        replace(c, lit(from), lit(to))
      }

  /** Batch as-of resolution: one union + one window pass (the
    * [[AsofOps.asofJoin]] plan, generalized to multi-key and whole-row
    * struct payloads). */
  private def batchJoin(facts: DataFrame, vers: DataFrame, p: Parsed,
      versionTimeCol: String): DataFrame = {
    val fRow = struct(facts.columns.map(col): _*)
    val vRow = struct(vers.columns.map(col): _*)
    val fType = facts.select(fRow.as("x")).schema("x").dataType
    val vType = vers.select(vRow.as("x")).schema("x").dataType
    val keyCols = p.factKeys.indices.map(i => s"_k$i")
    // SQL comparison semantics: NULL keys never match and a NULL
    // version time satisfies no `v.ts <= f.ts` — such version rows can
    // match nothing and are dropped (a null _ts would otherwise sort
    // FIRST in the window and spuriously match every fact); null-key
    // facts fall in a partition with no versions, so they resolve to
    // no match (kept under LEFT JOIN)
    val vClean = vers.where(
      (col(versionTimeCol).isNotNull +:
        p.versionKeys.map(col(_).isNotNull)).reduce(_ && _))
    val vSide = vClean.select(
      p.versionKeys.zipWithIndex.map { case (c, i) => col(c).as(s"_k$i") } ++
        Seq(micros(vClean, versionTimeCol).as("_ts"), lit(0).as("_tag"),
          detJson(vRow).as("_det"),
          lit(null).cast(fType).as("_f"), vRow.as("_v")): _*)
    val fSide = facts.select(
      p.factKeys.zipWithIndex.map { case (c, i) => col(c).as(s"_k$i") } ++
        Seq(micros(facts, p.asOfCol).as("_ts"), lit(1).as("_tag"),
          lit("").as("_det"),
          fRow.as("_f"), lit(null).cast(vType).as("_v")): _*)
    // _det breaks same-timestamp version ties DETERMINISTICALLY (the
    // ADVICE r10 finding): without it the sort leaves equal-(ts, tag)
    // version rows in shuffle order and `last(_v)` is run-dependent.
    // Ascending max-_det wins, exactly like the streaming path's
    // pre-order-by-detString + last-qualifying-row lookup.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_tag"), col("_det"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = vSide.unionByName(fSide)
      .withColumn("_m", last(col("_v"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)
    val kept = if (p.leftJoin) matched else matched.where(col("_m").isNotNull)
    kept.select(col("_f").as(p.factAlias), col("_m").as(p.versionAlias))
  }

  /** Streaming resolution through `StreamOps.temporalJoin`'s keyed
    * state: rows travel as (key-string, epoch-micros, row-JSON) and
    * re-expand against the declared schemas.
    *
    * `delayMs` is the allowed event-time out-of-orderness in REAL
    * milliseconds. The state operator's timestamps are epoch-MICROS
    * reinterpreted in temporalJoin's millis domain (a uniform 1000×
    * inflation that preserves order and sub-millisecond version
    * precision), so the delay is inflated by the same factor at this
    * boundary — the one place that knows the unit (ADVICE r10). */
  private def streamJoin(spark: SparkSession, facts: DataFrame,
      vers: DataFrame, p: Parsed, versionTimeCol: String,
      delayMs: Long): DataFrame = {
    import spark.implicits._
    val fSchema: StructType = facts.schema
    val vSchema: StructType = vers.schema
    def joinable(df: DataFrame, keys: Seq[String], ts: String) =
      (col(ts).isNotNull +: keys.map(col(_).isNotNull)).reduce(_ && _)
    // Escape the composite-key separator INSIDE each component before
    // concatenation, so distinct key tuples can never collide on the
    // joined string (("a\u0001b","c") vs ("a","b\u0001c") — ADVICE
    // r10). Backslash doubles FIRST, then the separator takes a SINGLE
    // backslash prefix — an escaped separator is preceded by an ODD
    // backslash run and a joiner separator by an EVEN one, so the
    // encoding is injective even for backslash-bearing keys (a double
    // prefix here would make "a\\" + SEP-in-next-part collide with an
    // embedded separator — the round-11 review catch)
    def esc(c: org.apache.spark.sql.Column) =
      replace(replace(c.cast("string"), lit("\\"), lit("\\\\")),
        lit("\u0001"), lit("\\\u0001"))
    def keyed(df: DataFrame, keys: Seq[String], ts: String)
        : Dataset[(String, Long, String)] =
      df.where(joinable(df, keys, ts))
        .select(
          concat_ws("\u0001", keys.map(c => esc(col(c))): _*).as("_k"),
          micros(df, ts).as("_t"),
          to_json(struct(df.columns.map(col): _*)).as("_j"))
        .as[(String, Long, String)]
    // the state operator's ts domain is epoch-micros-as-millis, so the
    // real-ms delay inflates 1000x here (see Scaladoc above)
    val joined = graft.streaming.StreamOps.temporalJoin[String, String, String](
      keyed(facts, p.factKeys, p.asOfCol),
      keyed(vers, p.versionKeys, versionTimeCol),
      delay = s"${delayMs * 1000L} milliseconds")
    val out = joined.toDF("_k", "_ts", "_fj", "_vj")
      .select(from_json(col("_fj"), fSchema).as(p.factAlias),
        from_json(col("_vj"), vSchema).as(p.versionAlias))
    if (!p.leftJoin) out.where(col(p.versionAlias).isNotNull)
    else {
      // SQL LEFT JOIN keeps facts whose NULL key/AS-OF time can match
      // nothing — they bypass the keyed state entirely (routing them
      // through the join would collide NULL keys with empty-string
      // keys) and union back with a NULL version struct, matching the
      // batch path
      val bypass = facts
        .where(!joinable(facts, p.factKeys, p.asOfCol))
        .select(struct(facts.columns.map(col): _*).as(p.factAlias),
          lit(null).cast(vSchema).as(p.versionAlias))
      out.unionByName(bypass)
    }
  }

  /** Versioned-table registry: the role Flink's DDL plays when a table
    * declares its event-time attribute (and thereby becomes usable as
    * the version side of `FOR SYSTEM_TIME AS OF`). Keyed WEAKLY by
    * session (entries die with the session — no leak across stopped
    * sessions) and case-insensitively by view name (Spark resolves
    * identifiers case-insensitively); [[apply]] consults it so queries
    * over registered tables need no `versionTimeCol` argument, while an
    * EXPLICIT argument still wins (the per-query opt-out). */
  private val versionedTimeCols =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[String, String]]())

  private def lcName(n: String): String =
    n.toLowerCase(java.util.Locale.ROOT)

  /** Register `df` as a temp view AND declare its event-time attribute
    * — the DDL-equivalent of a versioned-table definition. Subsequent
    * `FOR SYSTEM_TIME AS OF` queries naming `name` as the version side
    * pick up `timeCol` automatically. */
  def registerVersioned(spark: SparkSession, name: String, df: DataFrame,
      timeCol: String): Unit = {
    require(df.columns.exists(_.equalsIgnoreCase(timeCol)),
      s"versioned table $name has no column $timeCol")
    df.createOrReplaceTempView(name)
    versionedTimeCols
      .computeIfAbsent(spark, _ =>
        new java.util.concurrent.ConcurrentHashMap[String, String]())
      .put(lcName(name), timeCol)
  }

  /** Parse and execute `sql`; the version table's event-time attribute
    * comes from its [[registerVersioned]] declaration, falling back to
    * `ts`. */
  def apply(spark: SparkSession, sql: String): DataFrame =
    run(spark, sql, None)

  /** Parse and execute `sql` with an EXPLICIT version-time attribute —
    * wins over any [[registerVersioned]] declaration (the per-query
    * opt-out). */
  def apply(spark: SparkSession, sql: String,
      versionTimeCol: String): DataFrame =
    run(spark, sql, Some(versionTimeCol))

  /** [[apply]] with an allowed event-time out-of-orderness for the
    * STREAMING regime (ignored for batch inputs, which need none): late
    * version/fact rows within `delayMs` real milliseconds of the
    * watermark still resolve exactly. */
  def apply(spark: SparkSession, sql: String,
      versionTimeCol: Option[String], delayMs: Long): DataFrame =
    run(spark, sql, versionTimeCol, delayMs)

  private def run(spark: SparkSession, sql: String,
      explicit: Option[String], delayMs: Long = 0L): DataFrame = {
    val p = parse(sql)
    val facts = spark.table(p.factTable)
    val vers = spark.table(p.versionTable)
    // explicit argument > registered declaration > the `ts` default
    val declared = explicit
      .orElse(Option(versionedTimeCols.get(spark))
        .flatMap(m => Option(m.get(lcName(p.versionTable)))))
      .getOrElse("ts")
    // resolve user-written names against the actual schema the way SQL
    // does — case-insensitively — and use the RESOLVED names downstream
    // (batchJoin/micros do case-SENSITIVE schema(c) lookups; ADVICE r10)
    def resolved(df: DataFrame, c: String, table: String): String =
      df.schema.fieldNames.find(_.equalsIgnoreCase(c)).getOrElse(
        fail(s"table $table has no column $c (have: " +
          df.columns.mkString(", ") + ")"))
    val asOf = resolved(facts, p.asOfCol, p.factTable)
    val timeCol = resolved(vers, declared, p.versionTable)
    val pr = p.copy(asOfCol = asOf,
      factKeys = p.factKeys.map(resolved(facts, _, p.factTable)),
      versionKeys = p.versionKeys.map(resolved(vers, _, p.versionTable)))
    val joined =
      if (facts.isStreaming || vers.isStreaming)
        streamJoin(spark, facts, vers, pr, timeCol, delayMs)
      else batchJoin(facts, vers, pr, timeCol)
    val view = s"graft_temporal_${java.util.UUID.randomUUID()
      .toString.replace("-", "")}"
    joined.createOrReplaceTempView(view)
    try spark.sql(s"SELECT ${p.select} FROM $view${p.tail}")
    finally spark.catalog.dropTempView(view) // the analyzed plan embeds
    // the view's subtree, so the result outlives the catalog entry
  }
}
