package graft.pipeline

import graft.{Det, Q, QueryModule}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pass — the composition the individual
  * operators exist for: MinHash-LSH near-dup removal (keep the lowest
  * doc_id of every candidate cluster edge), quality-score filtering, and
  * per-language corpus statistics. One DataFrame pipeline, one oracle.
  *
  * Scale shape: dedup is the LSH band equi-join (no all-pairs), the drop
  * set is a broadcast-sized anti-join side relative to the corpus, quality
  * scoring is a pure column expression, and the final rollup is a
  * partial-aggregated groupBy — every stage shards by key.
  */
object CurationQueries extends QueryModule {

  /** The word tokenizer and 0-based trigram builder shared by EVERY
    * gram-space operator (qp24 decontamination, qp26 substring dedup,
    * qp27 source overlap, qp29 containment) — single definitions so a
    * tokenization tweak can never silently diverge one operator's gram
    * space from the others'. `TrigramsExpr` expects a `ws` word-array
    * column. */
  private[pipeline] val WordsExpr = "filter(split(text, ' '), x -> x <> '')"

  /** The three-term weighted quality score (0.4·length + 0.3·stopword
    * + 0.3·word-shape, each least()-capped at 1) — ONE expression for
    * BOTH consumers (review r18: qp7 and qp30 each hand-held a copy of
    * the Spark tree AND of the oracle text, four maintained copies of
    * an IEEE-operand-order-sensitive formula). Inputs are DOUBLE
    * columns; the operand order fixed here is the cross-engine
    * contract. */
  private def qualityCol(nc: org.apache.spark.sql.Column,
      nt: org.apache.spark.sql.Column,
      ns: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lit(0.4) * least(nc / 500.0, lit(1.0)) +
      lit(0.3) * least((ns / nt) * 5.0, lit(1.0)) +
      lit(0.3) * least(((nc - (nt - 1.0)) / nt) / 8.0, lit(1.0))

  /** DuckDB text of [[qualityCol]] — same shape, parameterized by the
    * (already-DOUBLE) operand SQL. */
  private def QualitySql(nc: String, nt: String, ns: String): String =
    s"(0.4 * least($nc / 500.0, 1.0)" +
      s" + 0.3 * least(($ns / $nt) * 5.0, 1.0)" +
      s" + 0.3 * least((($nc - ($nt - 1.0)) / $nt) / 8.0, 1.0))"
  private[pipeline] val TrigramsExpr =
    "transform(sequence(0, size(ws) - 3), i -> " +
      "concat(ws[i], ' ', ws[i + 1], ' ', ws[i + 2]))"

  /** Ordered-pair expansion over a sorted array column `arr`: every
    * (a, b) with a strictly before b, as named_struct(aField, bField).
    * Shared by qp27 (per-gram source sets) and qp29 (per-gram doc sets)
    * — ONE definition of the subtle 1-based slice indexing. */
  private[pipeline] def pairExpansionExpr(arr: String, aField: String,
      bField: String): String =
    s"flatten(transform($arr, (a, i) -> " +
      s"transform(slice($arr, i + 2, size($arr) - i - 1), b -> " +
      s"named_struct('$aField', a, '$bField', b))))"

  /** Shared tokenize + gram-position machinery for the span operators
    * (qp24 decontamination, qp26 substring dedup): `tk` = (doc_id, ws)
    * word arrays, `gp` = (doc_id, p, g) 0-based trigram positions. */
  private def tokensAndGrams(docs: org.apache.spark.sql.DataFrame):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val tk = docs.selectExpr("doc_id", s"$WordsExpr AS ws")
    val gp = tk.where("size(ws) >= 3")
      .select(col("doc_id"), posexplode(expr(TrigramsExpr)).as(Seq("p", "g")))
    (tk, gp)
  }

  /** qp30's per-domain document cap (RefinedWeb-style host cap). */
  private[pipeline] val DomainCap = 15

  /** qp30's rollup body, parameterized by cap so the spec can drive the
    * keep-all branch (n_docs <= cap) on a synthetic small domain and
    * the over-granularity regime on a synthetic huge one — the fixture
    * domains all hold more than [[DomainCap]] docs.
    *
    * Shape: two map-side-combined corpus passes (domain totals; the
    * threshold-filtered kept rollup), both reducing to ~#domains rows,
    * with the threshold table broadcast between them. The threshold is
    * all-integer — greatest((2^32·cap) div n_docs, 1) rendered as 8
    * lowercase hex chars — compared lexicographically against the
    * doc's 8-hex md5 prefix (fixed-width hex compare ≡ numeric
    * compare). When n_docs <= cap the keep-all disjunct short-circuits;
    * th8 is then 9+ hex chars and the two engines render it
    * differently (lpad truncates, printf doesn't) but neither ever
    * compares it. */
  private[pipeline] def domainRollup(docs: org.apache.spark.sql.DataFrame,
      cap: Int): org.apache.spark.sql.DataFrame = {
    // split(text) binds ONCE (review r18: the former shape evaluated
    // the split inside both the nt and ns lambdas, and subexpression
    // elimination does not reliably dedupe higher-order functions — up
    // to four tokenizations per doc across this stage's two passes);
    // filter(tk, x -> x <> '') is WordsExpr over the bound array
    val perDoc = docs
      .withColumn("tk", split(col("text"), " "))
      .select(col("source"),
        expr("size(filter(tk, x -> x <> ''))").cast("long").as("nt"),
        length(col("text")).cast("long").as("nc"),
        expr("size(filter(tk, " +
          "w -> w IN ('the', 'a', 'of', 'and', 'in')))").cast("long")
          .as("ns"),
        substring(md5(concat(lit("domcap|"), col("doc_id").cast("string"))),
          1, 8).as("h8"))
      .where(col("nt") > 0)
      // qp7's quality formula SHAPE (same three weighted terms, same
      // IEEE operand order) over WordsExpr token counts (qp7 itself
      // counts the raw split including empty tokens — the two scores
      // agree except on consecutive-space docs), floor-scaled to an
      // exact BIGINT (the Det "dirty double" rule: floor(q * 1e6) is
      // a pure binary op, identical in both engines)
      .withColumn("q6", floor(qualityCol(col("nc").cast("double"),
        col("nt").cast("double"), col("ns").cast("double"))
        * 1000000.0).cast("long"))
    // perDoc feeds the totals pass AND the capped pass: both are
    // map-side-combined partial aggs to ~#domains rows, and perDoc is
    // a narrow map — the recorded recompute-over-materialize rule
    // (qp24/qp26), so no cache. The 32-BIT hash space (h8, threshold
    // (2^32·cap) div n_docs) replaces round 16's original 16-bit one,
    // whose threshold floored to 0 for any domain over 65536·cap
    // (983k) docs and silently dropped the WHOLE domain — exactly the
    // hot-domain case the query targets (review r16). With 2^32 cells
    // the kept count sits within n_docs/2^32 of cap up to 2^32·cap
    // (~64 billion) docs per domain, and the greatest(…, 1) floor
    // makes the threshold never reach zero beyond it — a domain too
    // big for the granularity keeps ~n_docs/2^32 ≥ cap docs
    // (graceful overshoot), never zero.
    val tot = perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("total_tokens"),
        sum("q6").as("q6sum"))
    val th = tot.withColumn("th8",
      lpad(lower(hex(expr(s"greatest((4294967296L * $cap) div n_docs, 1L)"))),
        8, "0"))
    val kept = perDoc
      .join(broadcast(th.select("source", "n_docs", "th8")), "source")
      .where(col("n_docs") <= cap || col("h8") < col("th8"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("nt").as("kept_tokens"))
    th.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("total_tokens"),
        expr("q6sum div n_docs").as("avg_q6"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy("source")
  }

  /** Per-document span removal shared by qp24/qp26: union the banned
    * 0-based positions, count them, rebuild the text without them. */
  private def removeSpans(tk: org.apache.spark.sql.DataFrame,
      banned: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val agg = banned.groupBy("doc_id")
      .agg(collect_set("bp").as("bps"),
        count(lit(1)).cast("long").as("n_removed"))
    agg.join(tk, "doc_id")
      .select(col("doc_id"), col("n_removed"),
        expr("""array_join(filter(
          |  transform(sequence(0, size(ws) - 1), i ->
          |    IF(array_contains(bps, i), NULL, ws[i])),
          |  x -> x IS NOT NULL), ' ')""".stripMargin).as("clean_text"))
      .orderBy("doc_id")
  }

  def all: Seq[Q] = Seq(
    q("qp7_curation_pipeline",
      s"""${DedupQueries.duckSig},
         |bands AS (SELECT doc_id, b.band,
         |    CASE b.band WHEN 0 THEN h0 || h1 WHEN 1 THEN h2 || h3
         |                WHEN 2 THEN h4 || h5 ELSE h6 || h7 END AS bv
         |  FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band) b),
         |drops AS (SELECT DISTINCT y.doc_id
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
         |  WHERE x.bv <> ''),
         |scored AS (SELECT d.doc_id, d.lang,
         |    CAST(length(d.text) AS DOUBLE) AS nc,
         |    CAST(len(string_split(d.text, ' ')) AS DOUBLE) AS nt,
         |    CAST(len(list_filter(string_split(d.text, ' '),
         |        w -> w IN ('the', 'a', 'of', 'and', 'in'))) AS DOUBLE) AS ns
         |  FROM documents d
         |  WHERE NOT EXISTS (SELECT 1 FROM drops WHERE drops.doc_id = d.doc_id)),
         |quality AS (SELECT doc_id, lang, nt,
         |    ${QualitySql("nc", "nt", "ns")} AS q
         |  FROM scored)
         |SELECT lang, COUNT(*) AS n_docs,
         |  ${Det.DSUM("nt")} AS total_tokens,
         |  ((CAST(SUM(CAST(floor(q * 1000000.0) AS BIGINT)) AS DOUBLE)
         |      / COUNT(*)) / 1000000.0) AS avg_quality
         |FROM quality WHERE q >= 0.5
         |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val docs = t(s, d, "documents")
      // band rows come ONLY from the shared guarded definition (review
      // r18: this was the last inline construction left standing after
      // the r17 consolidation — it carried the guard, but the
      // BandInvariantSpec source invariant now closes the class)
      val bands = DedupQueries.bandsOf(DedupQueries.withShingles(docs))
        .cache()
      // a doc is dropped iff SOME band bucket holds a smaller doc_id,
      // i.e. iff it is not its bucket's minimum: per-bucket min
      // aggregate (map-side combined), joined back onto the band rows.
      // Replaces the former pairwise band self-join (optimization r18,
      // guide §2.5): a hot bucket of k docs now flows k rows through
      // the aggregate instead of k²/2 join pairs, so a template/mirror
      // family cannot blow the stage up quadratically. The drop set is
      // provably identical — y joins some x < y in a bucket exactly
      // when y > min(bucket). (A min-WINDOW computes the same thing in
      // one exchange but full-sorts the band table — measured 0.25s
      // slower at sf0.1; the agg form broadcasts the minima locally
      // and reuses the agg's (band, bv) partitioning at scale.) The
      // band table feeds both the agg and the join-back, so it keeps
      // its cache.
      val minima = bands.groupBy(col("band"), col("bv"))
        .agg(min(col("doc_id")).as("mn"))
      // no DISTINCT on the drop set: it feeds a LEFT ANTI join, which is
      // duplicate-insensitive on its build side — a doc dropped in k > 1
      // buckets just appears k (≤ 4) times there. The former .distinct()
      // was a doc_id exchange + two HashAggregates of pure tax
      // (optimization r19, guide §2.4 "remove shuffles outright").
      val drops = bands
        .join(minima, Seq("band", "bv"))
        .where(col("doc_id") > col("mn"))
        .select(col("doc_id"))
      val scored = docs
        .join(drops, Seq("doc_id"), "left_anti")
        .withColumn("tk", split(col("text"), " "))
        .withColumn("nc", length(col("text")).cast("double"))
        .withColumn("nt", size(col("tk")).cast("double"))
        .withColumn("ns", expr(
          "size(filter(tk, w -> w IN ('the', 'a', 'of', 'and', 'in')))")
          .cast("double"))
      val quality = scored.withColumn("q",
        qualityCol(col("nc"), col("nt"), col("ns")))
      // avg over floor-scaled integers: a computed ("dirty") double cast to
      // DECIMAL can round differently across engines (shortest-repr vs true
      // binary), but floor(q * 1e6) is a pure binary-double op — identical
      // everywhere — and the integer sum is exact.
      quality.where(col("q") >= 0.5)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          Det.dsum(col("nt")).as("total_tokens"),
          ((sum(floor(col("q") * 1000000.0).cast("long")).cast("double")
            / count(lit(1))) / 1000000.0).as("avg_quality"))
        .orderBy(col("lang"))
    },

    // Benchmark DECONTAMINATION — the canonical eval-set-leakage check a
    // training pipeline runs before shipping a corpus: count each
    // document's distinct word-trigrams that also occur in the
    // "benchmark" set (here: docs with doc_id % 97 = 0, a deterministic
    // stand-in for an eval suite). Scale shape: the corpus side explodes
    // to trigrams and partially aggregates; the benchmark gram set is
    // TINY and broadcasts, so the overlap join is shuffle-free on the
    // corpus side — exactly how 13-gram decontamination runs at 100 TB.
    q("qp9_decontamination",
      """WITH tk AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |grams AS (SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws) - 2), i ->
        |      ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1]
        |        || ' ' || ws[CAST(i AS INTEGER) + 2])) AS g
        |  FROM tk WHERE len(ws) >= 3),
        |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
        |hits AS (SELECT d.doc_id, COUNT(DISTINCT d.g) AS n_hits
        |  FROM grams d JOIN bench b ON d.g = b.g
        |  WHERE d.doc_id % 97 <> 0
        |  GROUP BY d.doc_id)
        |SELECT doc_id, n_hits, n_hits >= 2 AS contaminated
        |FROM hits
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      // gram space comes from the ONE shared tokensAndGrams machinery
      // (review r18: this inline copy duplicated the size >= 3 guard
      // and explode wiring qp24/qp26 route through the helper — the
      // decontamination gram space must never drift from the
      // span-removal one)
      val grams = tokensAndGrams(t(s, d, "documents"))._2
        .select(col("doc_id"), col("g"))
      val bench = grams.where(col("doc_id") % 97 === 0)
        .select(col("g")).distinct()
      grams.where(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "g")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("g")).as("n_hits"))
        .selectExpr("doc_id", "n_hits", "n_hits >= 2 AS contaminated")
        .orderBy("doc_id")
    },

    // Oracled END-TO-END composition: exact dedup (min-id survivor per
    // content hash) → deterministic stratified sample (the qp11
    // thresholds) → per-language corpus accounting. The per-stage specs
    // prove each operator; this row proves the CHAIN hash-exactly
    // through the driver gate — survivors of one stage are the other
    // stage's input, and the final token ledger matches an independent
    // engine running the same composition.
    q("qp25_curated_rollup",
      """WITH surv AS (
        |  SELECT doc_id, lang, text FROM (
        |    SELECT doc_id, lang, text,
        |      ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id)
        |        AS rn
        |    FROM documents) z WHERE rn = 1),
        |samp AS (
        |  SELECT doc_id, lang, text FROM surv
        |  WHERE substr(md5('strat|' || CAST(doc_id AS STRING)), 1, 4)
        |      < (CASE WHEN lang = 'en' THEN '0ccc' ELSE '8000' END))
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(list_filter(string_split(text, ' '),
        |    x -> x <> ''))) AS BIGINT) AS n_tokens
        |FROM samp GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val surv = t(s, d, "documents")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("lang"), col("text"))
      surv
        .where(SamplingOps.stratifiedKeep(col("doc_id"), col("lang"),
          Map("en" -> "0ccc"), default = "8000"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("size(filter(split(text, ' '), x -> x <> ''))"))
            .cast("long").as("n_tokens"))
        .orderBy("lang")
    },

    // Span-level decontamination — the REMOVAL action qp9's detection
    // implies: instead of dropping a contaminated document, cut exactly
    // the tokens covered by benchmark-matching 13-grams (here trigrams,
    // same geometry as qp9) and keep the rest. Matching gram positions
    // ban their 3-token spans; overlapping bans union per document
    // (DISTINCT positions); the text rebuilds with an array-lambda
    // filter — one broadcast gram-set join + one partial-agg per doc,
    // no window, no self-join. Output: affected documents with removed-
    // token counts and the surgically cleaned text.
    q("qp24_decontaminate_spans",
      """WITH tk AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |gp AS (SELECT doc_id, CAST(g.i AS INT) AS p,
        |    ws[g.i] || ' ' || ws[g.i + 1] || ' ' || ws[g.i + 2] AS g
        |  FROM tk, UNNEST(generate_series(1, len(ws) - 2)) AS g(i)
        |  WHERE len(ws) >= 3),
        |bench AS (SELECT DISTINCT g FROM gp WHERE doc_id % 97 = 0),
        |banned AS (SELECT DISTINCT d.doc_id, u.bp
        |  FROM gp d JOIN bench b ON d.g = b.g,
        |    UNNEST([d.p, d.p + 1, d.p + 2]) AS u(bp)
        |  WHERE d.doc_id % 97 <> 0),
        |agg AS (SELECT doc_id, list(bp) AS bps,
        |    CAST(COUNT(*) AS BIGINT) AS n_removed
        |  FROM banned GROUP BY doc_id)
        |SELECT a.doc_id, a.n_removed,
        |  COALESCE(array_to_string(list_filter(
        |    list_transform(generate_series(1, len(t.ws)), i ->
        |      CASE WHEN list_contains(a.bps, CAST(i AS INT)) THEN NULL
        |           ELSE t.ws[i] END),
        |    x -> x IS NOT NULL), ' '), '') AS clean_text
        |FROM agg a JOIN tk t ON t.doc_id = a.doc_id
        |ORDER BY a.doc_id""".stripMargin) { (s, d) =>
      val (tk, gp) = tokensAndGrams(t(s, d, "documents"))
      val bench = gp.where(col("doc_id") % 97 === 0)
        .select(col("g")).distinct()
      // 0-based here vs 1-based in the oracle — each side rebuilds from
      // its own indexing; the output text and counts are identical
      val banned = gp.where(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "g")
        .select(col("doc_id"),
          explode(expr("array(p, p + 1, p + 2)")).as("bp"))
        .distinct()
      removeSpans(tk, banned)
    },

    // Corpus-INTERNAL exact-substring dedup (round 14) — the
    // "Deduplicating Training Data Makes Language Models Better"
    // action qp24's machinery implies: instead of cutting spans that
    // match an external benchmark, cut spans duplicated ACROSS
    // DOCUMENTS, keeping one canonical copy. Each n-gram (trigrams,
    // qp9/qp24's fixture geometry; production uses ~50-grams) elects
    // the MIN doc_id holding it as owner; in every other document the
    // gram's token span is banned, overlapping bans union per document
    // (DISTINCT positions), and the text rebuilds without them — an
    // exact duplicate of an earlier document loses its entire text.
    // Scale shape: ONE window pass over the gram stream — owner =
    // min(doc_id) OVER (PARTITION BY g); a row in a non-owner document
    // is banned iff its doc_id differs from the partition min (which
    // by itself proves >1 distinct docs hold the gram). One shuffle on
    // the gram key, a single corpus scan, then one per-document
    // partial agg; no join against a corpus-sized gram set (NOT
    // broadcastable at 100 TB), no self-join, no all-pairs.
    q("qp26_substring_dedup",
      """WITH tk AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |gp AS (SELECT doc_id, CAST(g.i AS INT) AS p,
        |    ws[g.i] || ' ' || ws[g.i + 1] || ' ' || ws[g.i + 2] AS g
        |  FROM tk, UNNEST(generate_series(1, len(ws) - 2)) AS g(i)
        |  WHERE len(ws) >= 3),
        |own AS (SELECT g, MIN(doc_id) AS owner FROM gp
        |  GROUP BY g HAVING COUNT(DISTINCT doc_id) > 1),
        |banned AS (SELECT DISTINCT d.doc_id, u.bp
        |  FROM gp d JOIN own o ON d.g = o.g AND d.doc_id <> o.owner,
        |    UNNEST([d.p, d.p + 1, d.p + 2]) AS u(bp)),
        |agg AS (SELECT doc_id, list(bp) AS bps,
        |    CAST(COUNT(*) AS BIGINT) AS n_removed
        |  FROM banned GROUP BY doc_id)
        |SELECT a.doc_id, a.n_removed,
        |  COALESCE(array_to_string(list_filter(
        |    list_transform(generate_series(1, len(t.ws)), i ->
        |      CASE WHEN list_contains(a.bps, CAST(i AS INT)) THEN NULL
        |           ELSE t.ws[i] END),
        |    x -> x IS NOT NULL), ' '), '') AS clean_text
        |FROM agg a JOIN tk t ON t.doc_id = a.doc_id
        |ORDER BY a.doc_id""".stripMargin) { (s, d) =>
      val (tk, gp) = tokensAndGrams(t(s, d, "documents"))
      // 0-based here vs 1-based in the oracle — each side rebuilds from
      // its own indexing; the output text and counts are identical.
      // doc_id != min(doc_id) over the gram partition already implies
      // the gram spans >1 distinct document
      val banned = gp
        .withColumn("owner", min("doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("g")))
        .where(col("doc_id") =!= col("owner"))
        .select(col("doc_id"),
          explode(expr("array(p, p + 1, p + 2)")).as("bp"))
        .distinct()
      removeSpans(tk, banned)
    },

    // Cross-source contamination matrix (round 15): pairwise shared-
    // trigram Jaccard between sources — the audit run before mixing
    // corpora (how much of source B is already inside source A?).
    // Scale shape: ONE distinct pass over (source, gram), then the
    // per-gram source SET (bounded by #sources, not corpus size)
    // expands to its ordered pairs and a tiny (src_a, src_b)
    // aggregation; per-source totals broadcast into the final join.
    // No corpus-vs-corpus join, no per-pair rescan of the grams — the
    // work is one gram-key shuffle regardless of how many sources
    // are compared (the oracle's equi-self-join form is equivalent
    // here because per-gram cardinality is bounded by #sources).
    // Jaccard is ONE division of exact BIGINTs per pair — identical
    // doubles in both engines.
    q("qp27_source_overlap",
      """WITH tk AS (SELECT source,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |grams AS (SELECT source,
        |    unnest(list_transform(generate_series(1, len(ws) - 2), i ->
        |      ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1]
        |        || ' ' || ws[CAST(i AS INTEGER) + 2])) AS g
        |  FROM tk WHERE len(ws) >= 3),
        |gs AS (SELECT DISTINCT source, g FROM grams),
        |tot AS (SELECT source, COUNT(*) AS n FROM gs GROUP BY source),
        |sh AS (SELECT x.source AS src_a, y.source AS src_b,
        |    COUNT(*) AS shared_grams
        |  FROM gs x JOIN gs y ON x.g = y.g AND x.source < y.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, shared_grams,
        |  CAST(shared_grams AS DOUBLE) / (ta.n + tb.n - shared_grams)
        |    AS jaccard
        |FROM sh
        |JOIN tot ta ON sh.src_a = ta.source
        |JOIN tot tb ON sh.src_b = tb.source
        |ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
      // gs feeds the per-source totals AND the pair expansion — cache
      // so the gram explode+distinct runs once, not twice
      val gs = t(s, d, "documents")
        .selectExpr("source", s"$WordsExpr AS ws")
        .where("size(ws) >= 3")
        .select(col("source"), explode(expr(TrigramsExpr)).as("g"))
        .distinct()
        .cache()
      val tot = gs.groupBy("source").agg(count(lit(1)).as("n"))
      val sh = gs.groupBy("g")
        .agg(sort_array(collect_set(col("source"))).as("ss"))
        .select(explode(
          expr(pairExpansionExpr("ss", "src_a", "src_b"))).as("p"))
        .select(col("p.src_a"), col("p.src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("shared_grams"))
      sh.join(broadcast(tot.withColumnRenamed("source", "src_a")
          .withColumnRenamed("n", "na")), "src_a")
        .join(broadcast(tot.withColumnRenamed("source", "src_b")
          .withColumnRenamed("n", "nb")), "src_b")
        .select(col("src_a"), col("src_b"), col("shared_grams"),
          (col("shared_grams").cast("double") /
            (col("na") + col("nb") - col("shared_grams"))).as("jaccard"))
        .orderBy("src_a", "src_b")
    },

    // CCNet-style perplexity-bucket filter (round 15): score every doc
    // under the corpus add-one bigram LM (qt12's exact machinery —
    // avg_lp6 = floor-scaled mean log-likelihood, all-BIGINT), split the
    // corpus into EXACT terciles of that score, and drop the worst
    // (highest-perplexity) third — the head/middle keep CCNet applies
    // with its KenLM. Scale shape: the tercile cutoffs come from a
    // distributed two-phase prefix sum over the VALUE-grouped score
    // distribution (the qp17 pattern): scores group to (avg_lp6, count),
    // coarse buckets of 65536 score units cumulate in a bucket-table
    // window (bounded by score RANGE / 65536 ≈ hundreds of rows, by
    // construction — not corpus size), within-bucket windows partition
    // BY bucket (≤ 65536 distinct integer scores each, by construction),
    // and the two cutoff scalars broadcast onto the corpus map-side. No
    // global corpus-sized sort/window anywhere. Ties share a bucket
    // (value-based cutoffs), so the split is deterministic; every
    // compared value is a BIGINT (the one float op is qt12's proven
    // floor-scaled ln). Docs with no bigrams are unscoreable and out of
    // scope, as in qt12.
    q("qp28_perplexity_buckets",
      """WITH arr AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS a
        |  FROM documents),
        |big AS MATERIALIZED (SELECT doc_id, a[i] AS w1, a[i + 1] AS w2
        |  FROM arr, UNNEST(generate_series(1, len(a) - 1)) AS g(i)),
        |bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb
        |  FROM big GROUP BY w1, w2),
        |uc AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cu
        |  FROM bc GROUP BY w1),
        |v AS (SELECT CAST(COUNT(DISTINCT u.w) AS BIGINT) AS vsz
        |  FROM (SELECT UNNEST(a) AS w FROM arr) u),
        |sc AS (SELECT b.doc_id,
        |    CAST(SUM(CAST(floor(ln((COALESCE(bc.cb, 0) + 1.0)
        |      / (COALESCE(uc.cu, 0) + v.vsz))
        |      * 1000000.0) AS BIGINT)) AS BIGINT) // COUNT(*) AS avg_lp6
        |  FROM big b LEFT JOIN bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
        |    LEFT JOIN uc ON b.w1 = uc.w1 CROSS JOIN v
        |  GROUP BY b.doc_id),
        |dist AS (SELECT avg_lp6 AS s, CAST(COUNT(*) AS BIGINT) AS c,
        |    CAST(floor(CAST(avg_lp6 AS DOUBLE) / 65536.0) AS BIGINT) AS bkt
        |  FROM sc GROUP BY 1),
        |bk AS (SELECT bkt, SUM(c) AS cb2 FROM dist GROUP BY bkt),
        |bases AS (SELECT bkt, COALESCE(SUM(cb2) OVER (ORDER BY bkt
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base
        |  FROM bk),
        |cum AS (SELECT d.s, bases.base + SUM(d.c) OVER (PARTITION BY d.bkt
        |    ORDER BY d.s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS cm
        |  FROM dist d JOIN bases ON d.bkt = bases.bkt),
        |n AS (SELECT SUM(c) AS nt FROM dist),
        |cuts AS (SELECT MIN(CASE WHEN cm * 3 >= n.nt THEN s END) AS c1,
        |    MIN(CASE WHEN cm * 3 >= 2 * n.nt THEN s END) AS c2
        |  FROM cum CROSS JOIN n)
        |SELECT sc.doc_id, sc.avg_lp6,
        |  CAST(CASE WHEN avg_lp6 <= c1 THEN 0
        |    WHEN avg_lp6 <= c2 THEN 1 ELSE 2 END AS INT) AS bucket,
        |  avg_lp6 > c1 AS keep
        |FROM sc CROSS JOIN cuts ORDER BY sc.doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, d, "documents")
      val big = TextQueries.bigramRows(docs).cache()
      val (bc, uc, v) = TextQueries.bigramLm(big, docs)
      // scored feeds BOTH the cutoff subtree and the final projection —
      // cache it (per-doc sized) so the corpus-scale scoring joins run
      // once, not twice
      val scored = TextQueries.scoreBigramLm(big, bc, uc, v)
        .select(col("doc_id"), col("avg_lp6"))
        .cache()
      val dist = scored.groupBy(col("avg_lp6").as("s"))
        .agg(count(lit(1)).as("c"))
        .withColumn("bkt",
          floor(col("s").cast("double") / 65536.0).cast("long"))
      val bk = dist.groupBy("bkt").agg(sum("c").as("cb2"))
      // bucket-table cumulative: bounded by score range / 65536 by
      // construction (a few hundred rows) — the documented
      // tiny-aggregate-table single-partition window
      val bases = bk.withColumn("base",
        coalesce(sum("cb2").over(Window.orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val cum = dist.join(broadcast(bases.select("bkt", "base")), "bkt")
        .withColumn("cm", col("base") +
          sum("c").over(Window.partitionBy("bkt").orderBy("s")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val nTab = dist.agg(sum("c").as("nt"))
      val cuts = cum.crossJoin(broadcast(nTab))
        .agg(min(when(col("cm") * 3 >= col("nt"), col("s"))).as("c1"),
          min(when(col("cm") * 3 >= col("nt") * 2, col("s"))).as("c2"))
      scored.crossJoin(broadcast(cuts))
        .select(col("doc_id"), col("avg_lp6"),
          when(col("avg_lp6") <= col("c1"), 0)
            .when(col("avg_lp6") <= col("c2"), 1).otherwise(2)
            .cast("int").as("bucket"),
          (col("avg_lp6") > col("c1")).as("keep"))
        .orderBy("doc_id")
    },

    // Domain-level curation rollup (round 16, VERDICT r15 #5) — the
    // C4/RefinedWeb per-domain action the qp set lacked: aggregate
    // quality per domain (`source` stands in for the URL host) and
    // enforce a PER-DOMAIN DOCUMENT CAP so no single domain dominates
    // the mix — RefinedWeb samples domains down; C4 dedupes and caps
    // by host. Cap selection is deterministic hash-rate sampling (the
    // qp11 machinery with a PER-DOMAIN threshold): a doc survives iff
    // its 8-hex md5 prefix falls under the domain's keep rate
    // cap/n_docs scaled into the 32-BIT hash space — membership is a
    // pure function of (doc_id, the domain's size), reproducible
    // across engines and cluster sizes, no RNG. (Round 16's first cut
    // used a 16-bit space, whose threshold floored to 0 for any
    // domain over 65536·cap docs and silently dropped the WHOLE
    // domain; 32 bits + the greatest(…,1) floor keep ~cap up to 64
    // billion docs per domain and overshoot gracefully beyond —
    // review r16, spec-pinned in the over-granularity test.) Scale
    // shape: two map-side-combined corpus passes (totals; the
    // threshold-filtered kept rollup), each reducing to ~#domains
    // rows, thresholds broadcast between them; no corpus-wide window,
    // no per-domain row_number (a hot domain at 100 TB would skew it).
    // Quality is qp7's floor-scaled formula shape over WordsExpr
    // counts; every output is a BIGINT (avg_q6 by integer division),
    // so the compare is exact.
    q("qp30_domain_rollup",
      s"""WITH d AS (SELECT source, doc_id,
         |    CAST(len(list_filter(string_split(text, ' '),
         |        x -> x <> '')) AS BIGINT) AS nt,
         |    CAST(length(text) AS BIGINT) AS nc,
         |    CAST(len(list_filter(string_split(text, ' '),
         |        w -> w IN ('the', 'a', 'of', 'and', 'in'))) AS BIGINT)
         |      AS ns,
         |    substr(md5('domcap|' || CAST(doc_id AS STRING)), 1, 8) AS h8
         |  FROM documents),
         |sc AS (SELECT source, h8, nt,
         |    CAST(floor(${QualitySql("CAST(nc AS DOUBLE)",
              "CAST(nt AS DOUBLE)", "CAST(ns AS DOUBLE)")}
         |      * 1000000.0) AS BIGINT) AS q6
         |  FROM d WHERE nt > 0),
         |tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(nt) AS BIGINT) AS total_tokens,
         |    CAST(SUM(q6) AS BIGINT) AS q6sum
         |  FROM sc GROUP BY source),
         |th AS (SELECT source, n_docs, total_tokens, q6sum,
         |    printf('%08x', greatest(
         |      (4294967296 * $DomainCap) // n_docs, 1)) AS th8
         |  FROM tot),
         |kept AS (SELECT sc.source, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |    CAST(SUM(sc.nt) AS BIGINT) AS kept_tokens
         |  FROM sc JOIN th ON sc.source = th.source
         |  WHERE th.n_docs <= $DomainCap OR sc.h8 < th.th8
         |  GROUP BY sc.source)
         |SELECT t.source, t.n_docs, t.total_tokens,
         |  t.q6sum // t.n_docs AS avg_q6,
         |  COALESCE(k.n_kept, 0) AS n_kept,
         |  COALESCE(k.kept_tokens, 0) AS kept_tokens
         |FROM th t LEFT JOIN kept k ON t.source = k.source
         |ORDER BY t.source""".stripMargin) { (s, d) =>
      domainRollup(t(s, d, "documents"), DomainCap)
    },

    // Deterministic stratified sampling — the data-mixing primitive: each
    // language keeps a different fraction (downsample the dominant 'en' to
    // 5%, keep half of everything else), decided per row by an md5-prefix
    // threshold. Membership is a pure function of doc_id, so the sample is
    // reproducible across runs/engines/cluster sizes, re-runnable
    // incrementally (a new shard samples itself), and exactly restatable
    // in any engine with md5 — no RNG state, no seed plumbing. Map-only:
    // the filter is a codegen'd column expression, zero shuffles at any
    // scale. Thresholds compare 4 hex chars lexicographically: P(h <
    // '0ccc') = 3276/65536 ≈ 5.00%, P(h < '8000') = 50%.
    q("qp11_stratified_sample",
      """SELECT doc_id, lang, source FROM documents
        |WHERE substr(md5('strat|' || CAST(doc_id AS STRING)), 1, 4)
        |    < (CASE WHEN lang = 'en' THEN '0ccc' ELSE '8000' END)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .where(SamplingOps.stratifiedKeep(col("doc_id"), col("lang"),
          Map("en" -> "0ccc"), default = "8000"))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    },

    // Deterministic per-stratum reservoir: the k smallest md5 hashes per
    // language — a uniform k-sample whose membership is a pure function of
    // the data (the bottom-k-by-hash construction graft_kll/graft_kmv use,
    // applied per group). Window row_number here (one shuffle+sort); at
    // 100 TB the same sample falls out of a partial-aggregating bottom-k
    // (merge = union-and-trim through the agg tree) or a qp11-style hash
    // pre-filter at rate ~2k/n before the window — both documented in
    // ENGINE.md; the semantics (and this oracle) are identical.
    q("qp12_reservoir_sample",
      """WITH h AS (SELECT doc_id, lang,
        |    md5('rsv|' || CAST(doc_id AS STRING)) AS hv FROM documents),
        |r AS (SELECT lang, doc_id, hv,
        |    row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rk
        |  FROM h)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id
        |FROM r WHERE rk <= 8 ORDER BY lang, rk""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      t(s, d, "documents")
        .withColumn("hv",
          md5(concat(lit("rsv|"), col("doc_id").cast("string"))))
        .withColumn("rk", row_number().over(Window.partitionBy(col("lang"))
          .orderBy(col("hv"), col("doc_id"))))
        .where(col("rk") <= 8)
        .select(col("lang"), col("rk").cast("long").as("rk"), col("doc_id"))
        .orderBy(col("lang"), col("rk"))
    },

    // Token-budget data mixing — WATER-FILLING allocation: given a global
    // token budget (90% of the corpus here), give every source an equal
    // share except that no source can contribute more than it has; the
    // surplus of small sources redistributes to the rest. Closed form
    // over sources sorted by availability: the knee is the first rank i
    // where pfx(i-1) + (n-i+1)·a_i covers the budget, the common cap is
    // c = (B - pfx(knee-1)) / (n-knee+1); alloc = min(a, c), rate =
    // alloc/a. Scale shape: per-source token counts partial-aggregate
    // off the corpus scan (the only corpus-sized stage); everything
    // after runs on one row per SOURCE — the unpartitioned windows are
    // over that tiny table, not the corpus. Bit-exact: prefix sums and
    // the knee test are exact integers; c and the rates are single IEEE
    // divisions with fixed operand order.
    q("qp13_token_budget",
      """WITH avail AS (SELECT source,
        |    SUM(CAST(len(list_filter(string_split(text, ' '),
        |        x -> x <> '')) AS BIGINT)) AS toks
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS total, COUNT(*) AS n
        |  FROM avail),
        |r AS (SELECT a.source, a.toks,
        |    row_number() OVER (ORDER BY a.toks, a.source) AS i,
        |    SUM(a.toks) OVER (ORDER BY a.toks, a.source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pfx,
        |    t.total, t.n
        |  FROM avail a CROSS JOIN tot t),
        |knee AS (SELECT MIN(i) AS ki FROM r
        |  WHERE COALESCE(pfx, 0) + (n - i + 1) * toks
        |      >= CAST(floor(total * 0.9) AS BIGINT)),
        |cap AS (SELECT (CAST(floor(r.total * 0.9) AS BIGINT)
        |      - COALESCE(r.pfx, 0)) / CAST(r.n - r.i + 1 AS DOUBLE) AS c
        |  FROM r JOIN knee ON r.i = knee.ki)
        |SELECT r.source, CAST(r.toks AS BIGINT) AS avail_tokens,
        |  CASE WHEN CAST(r.toks AS DOUBLE) <= cap.c
        |       THEN CAST(r.toks AS DOUBLE) ELSE cap.c END AS alloc_tokens,
        |  CASE WHEN CAST(r.toks AS DOUBLE) <= cap.c
        |       THEN 1.0 ELSE cap.c / r.toks END AS keep_rate
        |FROM r CROSS JOIN cap ORDER BY r.source""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // cache the per-source reduced table: tot, r's window chain, knee,
      // cap and the final projection all re-derive from it, and uncached
      // each re-derivation re-ran the CORPUS token-count pass — scan-audit
      // counted documents scanned 6× (optimization r18; the qt17/qt21
      // reduced-table rule)
      val toks = t(s, d, "documents")
        .select(col("source"), expr(
          "CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT)")
          .as("tk"))
        .groupBy(col("source")).agg(sum(col("tk")).as("toks"))
        .cache()
      val tot = toks.agg(sum(col("toks")).cast("long").as("total"),
        count(lit(1)).as("n"))
      // unpartitioned window over the per-source table (rows = sources,
      // not corpus rows) — single-partition by construction, documented
      val w = Window.orderBy(col("toks"), col("source"))
      val r = toks.crossJoin(broadcast(tot))
        .withColumn("i", row_number().over(w))
        .withColumn("pfx", sum(col("toks"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("budget", floor(col("total") * 0.9).cast("long"))
      val knee = r
        .where(coalesce(col("pfx"), lit(0L))
          + (col("n") - col("i") + 1) * col("toks") >= col("budget"))
        .agg(min(col("i")).as("ki"))
      val cap = r.join(broadcast(knee), col("i") === col("ki"))
        .select(((col("budget") - coalesce(col("pfx"), lit(0L)))
          / (col("n") - col("i") + 1).cast("double")).as("c"))
      r.crossJoin(broadcast(cap))
        .select(col("source"), col("toks").as("avail_tokens"),
          when(col("toks").cast("double") <= col("c"),
            col("toks").cast("double")).otherwise(col("c"))
            .as("alloc_tokens"),
          when(col("toks").cast("double") <= col("c"), lit(1.0))
            .otherwise(col("c") / col("toks")).as("keep_rate"))
        .orderBy(col("source"))
    },

    // Sketch-driven outlier clipping — the two-pass curation move at
    // 100 TB: pass 1 reduces the corpus to ONE deterministic quantile
    // sample (graft_kll over doc token lengths, 512 B), the p5/p95
    // thresholds read off the sample; pass 2 filters the corpus against
    // the broadcast thresholds and rolls up survivors per language.
    // Neither pass shuffles more than partial aggregates; the corpus is
    // never sorted. Bit-exact: the sample is a pure function of the
    // data (bottom-64 by md5 hash — the qs11 machinery), thresholds are
    // exact sample members, and the filter compares integral doubles.
    q("qp14_length_clip",
      """WITH lens AS (SELECT doc_id, lang,
        |    CAST(len(list_filter(string_split(text, ' '),
        |        x -> x <> '')) AS DOUBLE) AS lv
        |  FROM documents),
        |h AS (SELECT lang, lv,
        |    list_aggregate(list_transform(generate_series(1, 15), i ->
        |      CAST(strpos('0123456789abcdef',
        |          substr(md5(CAST(doc_id AS VARCHAR)),
        |            CAST(i AS INTEGER), 1)) - 1 AS BIGINT)
        |        * (CAST(1 AS BIGINT) << CAST((15 - i) * 4 AS INTEGER))),
        |      'sum') AS hv
        |  FROM lens),
        |d AS (SELECT hv, MIN(lv) AS v FROM h GROUP BY 1),
        |r AS (SELECT v, row_number() OVER (ORDER BY hv) AS rn FROM d),
        |s AS (SELECT v FROM r WHERE rn <= 64),
        |o AS (SELECT v, row_number() OVER (ORDER BY v) AS vr,
        |    COUNT(*) OVER () AS n FROM s),
        |th AS (SELECT
        |    MAX(CASE WHEN vr = CAST(ceil(0.05 * n) AS BIGINT) THEN v END)
        |      AS lo,
        |    MAX(CASE WHEN vr = CAST(ceil(0.95 * n) AS BIGINT) THEN v END)
        |      AS hi
        |  FROM o)
        |SELECT lang, COUNT(*) AS n_kept,
        |  CAST(SUM(CAST(lv AS BIGINT)) AS BIGINT) AS tokens_kept
        |FROM lens CROSS JOIN th
        |WHERE lv >= th.lo AND lv <= th.hi
        |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      graft.functions.Udafs.register(s)
      val lens = t(s, d, "documents")
        .selectExpr("doc_id", "lang",
          "CAST(size(filter(split(text, ' '), x -> x <> '')) AS DOUBLE) AS lv")
      // EMPTY input: the global agg still yields one row whose sample
      // is an empty array, and element_at(sample, 0) throws Spark's
      // array-indices-start-at-1 error where the oracle returns zero
      // rows; NULL lo/hi make the keep predicate false everywhere —
      // both engines now read empty as empty (review r18)
      val th = lens
        .selectExpr("CAST(doc_id AS STRING) AS id", "lv")
        .agg(expr("graft_kll(id, lv)").as("sample"))
        .selectExpr(
          "IF(size(sample) = 0, CAST(NULL AS DOUBLE)," +
            " element_at(sample, int(ceil(0.05 * size(sample))))) AS lo",
          "IF(size(sample) = 0, CAST(NULL AS DOUBLE)," +
            " element_at(sample, int(ceil(0.95 * size(sample))))) AS hi")
      lens.crossJoin(broadcast(th))
        .where(col("lv") >= col("lo") && col("lv") <= col("hi"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("lv").cast("long")).as("tokens_kept"))
        .orderBy(col("lang"))
    }
  )
}
