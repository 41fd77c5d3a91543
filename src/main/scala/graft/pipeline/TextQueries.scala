package graft.pipeline

import graft.{Q, QueryModule}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token statistics,
  * quality scoring, n-gram-heuristic language ID, tokenizer counting,
  * corpus-frequency/novelty statistics, and the classical corpus-law
  * fits. The PER-ROW queries (qt1/qt2/qt4/qt7/qt8/qt15/qt16) are pure
  * column expressions — fully parallel, shuffle-free, codegen-friendly;
  * the corpus-statistics queries (qt6, qt9–qt14, qt17–qt21) aggregate
  * and shuffle, each with its scale shape documented at the query.
  */
object TextQueries extends QueryModule {

  /** PII patterns in the Java∩RE2 regex subset (char classes, bounded
    * repeats, \b) so Spark and RE2-based engines match identically. */
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiPhone = "\\+\\d{1,2}-\\d{3}-\\d{4}"
  val PiiIp = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Mask emails, then phones, then IPv4 (email first so the later
    * numeric patterns never see its digits). Stateless column
    * expression — applies unchanged to streaming sources. */
  def scrubPii(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      PiiEmail, "<EMAIL>"), PiiPhone, "<PHONE>"), PiiIp, "<IP>")

  /** Occurrences of `pattern` in `c` (whole-match count). */
  def piiCount(c: org.apache.spark.sql.Column,
      pattern: String): org.apache.spark.sql.Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** qt19's head-rank cap: the Zipf fit uses only the top-N ranks per
    * source. Doubles as the scale bound — every per-source moment sum
    * is ≤ this many bounded terms regardless of corpus size — and as a
    * tested code path: the fixture vocab (~30 words/source) exceeds it,
    * so the cap bites at sf0.01 already. */
  private[pipeline] val ZipfRankCap = 20

  private val Stopwords = Seq("the", "a", "of", "and", "in")
  private val stopList = Stopwords.map(w => s"'$w'").mkString(", ")

  // Marker-word profiles for the language-ID heuristic. Deterministic CASE
  // cascade; ties resolve in declaration order (en > de > es > fr > zh).
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and"),
    "de" -> Seq("der", "die", "das"),
    "es" -> Seq("el", "la", "los"),
    "fr" -> Seq("le", "la", "les"),
    "zh" -> Seq("de", "shi", "bu"))

  def all: Seq[Q] = Seq(

    // Per-document statistics: token count, char count, mean token length,
    // stopword ratio.
    q("qt1_text_stats",
      s"""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  (CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         |     / len(string_split(text, ' '))) AS avg_token_len,
         |  (CAST(len(list_filter(string_split(text, ' '),
         |       w -> w IN ($stopList))) AS DOUBLE)
         |     / len(string_split(text, ' '))) AS stopword_ratio
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .withColumn("tk", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("tk")).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars"),
          ((length(col("text")) - (size(col("tk")) - 1)).cast("double")
            / size(col("tk"))).as("avg_token_len"),
          (expr(s"size(filter(tk, w -> w IN ($stopList)))").cast("double")
            / size(col("tk"))).as("stopword_ratio"))
        .orderBy(col("doc_id"))
    },

    // Unicode NFC normalization (round 14) — the canonical cleanup
    // BEFORE tokenizing/fingerprinting: decomposed sequences (e +
    // U+0301) fold to their composed forms so visually identical text
    // dedups and counts identically. Runs the codegen'd
    // [[graft.functions.NfcNormalize]] expression (Spark has no
    // normalizer builtin); the oracle is DuckDB's nfc_normalize — both
    // implement the same Unicode standard, compared bit-exactly. The
    // fixture corpus is ASCII (NFC-identity), so the query PREPENDS a
    // decomposed prefix to every document: the composed output must
    // be one character shorter than the raw input, per row.
    q("qt15_unicode_nfc",
      """WITH r AS (SELECT doc_id,
        |    'Cafee' || chr(769) || ' ' || substr(text, 1, 24) AS raw
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(raw) AS norm,
        |  CAST(length(raw) AS BIGINT) AS n_raw,
        |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_norm
        |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
      val raw = concat(lit("Cafee\u0301 "), substring(col("text"), 1, 24))
      t(s, d, "documents")
        .select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"),
          graft.functions.GraftFunctions.nfc(s, col("raw")).as("norm"),
          length(col("raw")).cast("long").as("n_raw"),
          length(graft.functions.GraftFunctions.nfc(s, col("raw")))
            .cast("long").as("n_norm"))
        .orderBy(col("doc_id"))
    },

    // Quality score: bounded length score + stopword signal + token-length
    // sanity, combined with fixed weights (all double arithmetic in an
    // identical evaluation order in both engines).
    q("qt2_quality_score",
      s"""WITH f AS (SELECT doc_id,
         |    CAST(length(text) AS DOUBLE) AS nc,
         |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
         |    CAST(len(list_filter(string_split(text, ' '),
         |        w -> w IN ($stopList))) AS DOUBLE) AS ns
         |  FROM documents)
         |SELECT doc_id,
         |  (0.4 * least(nc / 500.0, 1.0)
         |   + 0.3 * least((ns / nt) * 5.0, 1.0)
         |   + 0.3 * least(((nc - (nt - 1.0)) / nt) / 8.0, 1.0)) AS quality
         |FROM f ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .withColumn("tk", split(col("text"), " "))
        .withColumn("nc", length(col("text")).cast("double"))
        .withColumn("nt", size(col("tk")).cast("double"))
        .withColumn("ns",
          expr(s"size(filter(tk, w -> w IN ($stopList)))").cast("double"))
        .select(col("doc_id"),
          (lit(0.4) * least(col("nc") / 500.0, lit(1.0))
            + lit(0.3) * least((col("ns") / col("nt")) * 5.0, lit(1.0))
            + lit(0.3) * least(((col("nc") - (col("nt") - 1.0)) / col("nt")) / 8.0,
              lit(1.0))).as("quality"))
        .orderBy(col("doc_id"))
    },

    // Hard quality-rule gate (round 15) — the Gopher-style RULE
    // cascade (Rae et al. 2021 §A1.1: word-count bounds, mean-word-
    // length bounds, a stopword floor, a repetition cap), distinct
    // from qt2's weighted SCORE: each rule is a named boolean and keep
    // is their conjunction, the filter shape production pipelines
    // apply before scoring. Every rule is INTEGER arithmetic (ratio
    // thresholds as cross-products, e.g. 8*topcnt <= nt instead of
    // topcnt/nt <= 0.125) so the oracle compare carries no float
    // determinism risk. Shuffle-free column expressions; the
    // repetition rule's per-row distinct-count scan is bounded by the
    // document's own token count.
    q("qt16_gopher_rules",
      s"""WITH f AS (SELECT doc_id,
         |    len(string_split(text, ' ')) AS nt,
         |    length(text) AS nc,
         |    len(list_intersect(string_split(text, ' '),
         |        [$stopList])) AS nstop,
         |    list_max(list_transform(list_distinct(string_split(text, ' ')),
         |        w -> len(list_filter(string_split(text, ' '),
         |                             x -> x = w)))) AS topcnt
         |  FROM documents),
         |rules AS (SELECT doc_id,
         |    nt BETWEEN 20 AND 120 AS word_ok,
         |    (4 * nt <= nc - (nt - 1) AND nc - (nt - 1) <= 6 * nt) AS len_ok,
         |    nstop >= 2 AS stop_ok,
         |    8 * topcnt <= nt AS rep_ok
         |  FROM f)
         |SELECT doc_id, word_ok, len_ok, stop_ok, rep_ok,
         |  (word_ok AND len_ok AND stop_ok AND rep_ok) AS keep
         |FROM rules ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .withColumn("tk", split(col("text"), " "))
        .withColumn("nt", size(col("tk")))
        .withColumn("nc", length(col("text")))
        .withColumn("nstop",
          size(array_intersect(col("tk"),
            array(Stopwords.map(lit): _*))))
        .withColumn("topcnt", expr(
          "array_max(transform(array_distinct(tk), " +
            "w -> size(filter(tk, x -> x = w))))"))
        .withColumn("word_ok", col("nt").between(20, 120))
        .withColumn("len_ok",
          lit(4) * col("nt") <= col("nc") - (col("nt") - 1) &&
            col("nc") - (col("nt") - 1) <= lit(6) * col("nt"))
        .withColumn("stop_ok", col("nstop") >= 2)
        .withColumn("rep_ok", lit(8) * col("topcnt") <= col("nt"))
        .select(col("doc_id"), col("word_ok"), col("len_ok"),
          col("stop_ok"), col("rep_ok"),
          (col("word_ok") && col("len_ok") && col("stop_ok") &&
            col("rep_ok")).as("keep"))
        .orderBy(col("doc_id"))
    },

    // Token-distribution entropy per document (round 15) — the
    // repetitiousness signal the hard rule gates (qt16) and top-word
    // caps (qt7) approximate: H = Σ (c/T)·ln(T/c) over the doc's token
    // counts, low for template/boilerplate docs, high for diverse prose.
    // Determinism: the only float op is the established floor-scaled ln
    // of ONE exact integer ratio (T/c); each term then rides as
    // c·floor(ln(T/c)·1e6) — a BIGINT product — and the per-doc total
    // divides by T in integer math. Scale shape: one (doc, word)
    // partial-agg groupBy, one per-doc rollup, one co-keyed join of the
    // two reduced tables — no window, no corpus-sized broadcast; an
    // all-identical-tokens doc scores exactly 0. Empty docs have no
    // tokens and are out of scope (absent), as in qt12.
    q("qt17_token_entropy",
      """WITH tok AS (SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS w
        |  FROM documents),
        |wc AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tok GROUP BY doc_id, w),
        |t AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS tot,
        |    CAST(COUNT(*) AS BIGINT) AS nd
        |  FROM wc GROUP BY doc_id)
        |SELECT t.doc_id, t.tot AS n_tokens, t.nd AS n_distinct,
        |  CAST(SUM(c * CAST(floor(ln(CAST(t.tot AS DOUBLE) / c)
        |    * 1000000.0) AS BIGINT)) AS BIGINT) // t.tot AS entropy6
        |FROM wc JOIN t USING (doc_id)
        |GROUP BY t.doc_id, t.tot, t.nd
        |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
      // wc feeds the per-doc rollup AND the scoring join — cache the
      // reduced (doc, word, count) table so the token explode+groupBy
      // runs once
      val wc = t(s, d, "documents")
        .select(col("doc_id"),
          explode(expr(CurationQueries.WordsExpr)).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .cache()
      val tt = wc.groupBy("doc_id")
        .agg(sum("c").as("tot"), count(lit(1)).as("nd"))
      wc.join(tt, "doc_id")
        .groupBy(col("doc_id"), col("tot"), col("nd"))
        .agg(sum(col("c") *
          floor(log(col("tot").cast("double") / col("c")) * 1000000.0)
            .cast("long")).cast("long").as("tsum"))
        .select(col("doc_id"), col("tot").as("n_tokens"),
          col("nd").as("n_distinct"),
          expr("tsum div tot").as("entropy6"))
        .orderBy("doc_id")
    },

    // N-gram novelty curve (round 15) — the Heaps-law corpus-health
    // check at trigram granularity: cumulative distinct-trigram count
    // and the NEW-gram delta at 25/50/75/100% doc-id checkpoints. A
    // healthy diverse corpus keeps minting novel n-grams; a
    // template-heavy source's novelty rate collapses — the curve you
    // read before deciding a source is mined out (word-level vocab
    // saturates trivially; the gram space is where diversity lives).
    // Scale shape: the naive form is four conditional DISTINCT
    // aggregates (four gram shuffles); this runs ONE groupBy instead —
    // first_seen = MIN(doc_id) per gram (a single gram-keyed
    // partial-agg shuffle, the qp26-family key), then every checkpoint
    // statistic is a count over first_seen buckets against a broadcast
    // 4-row checkpoint table. All counts exact BIGINTs; checkpoints
    // derive from MAX(doc_id) by integer arithmetic.
    q("qt18_gram_novelty",
      """WITH tk AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |gs AS (SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(ws) - 2),
        |      i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS g
        |  FROM tk WHERE len(ws) >= 3),
        |fs AS (SELECT g, CAST(MIN(doc_id) AS BIGINT) AS first_seen
        |  FROM gs GROUP BY g),
        |mx AS (SELECT MAX(doc_id) AS md FROM documents),
        |cp AS (SELECT q AS quartile, (mx.md * q) // 4 AS cutoff,
        |    CASE WHEN q = 1 THEN -1
        |      ELSE (mx.md * (q - 1)) // 4 END AS prev_cutoff
        |  FROM (SELECT unnest([1, 2, 3, 4]) AS q) u CROSS JOIN mx)
        |SELECT CAST(cp.quartile AS INT) AS quartile,
        |  CAST(cp.cutoff AS BIGINT) AS doc_cutoff,
        |  CAST(COUNT(*) FILTER (WHERE fs.first_seen <= cp.cutoff)
        |    AS BIGINT) AS gram_vocab,
        |  CAST(COUNT(*) FILTER (WHERE fs.first_seen <= cp.cutoff
        |    AND fs.first_seen > cp.prev_cutoff) AS BIGINT) AS new_grams
        |FROM cp CROSS JOIN fs
        |GROUP BY cp.quartile, cp.cutoff, cp.prev_cutoff
        |ORDER BY quartile""".stripMargin) { (s, d) =>
      val fs = t(s, d, "documents")
        .selectExpr("doc_id", s"${CurationQueries.WordsExpr} AS ws")
        .where("size(ws) >= 3")
        .select(col("doc_id"),
          explode(expr(CurationQueries.TrigramsExpr)).as("g"))
        .groupBy("g").agg(min("doc_id").as("first_seen"))
      val mx = t(s, d, "documents").agg(max("doc_id").as("md"))
      val cp = s.range(1, 5).toDF("quartile")
        .crossJoin(broadcast(mx))
        .select(col("quartile"),
          expr("(md * quartile) div 4").as("cutoff"),
          // quartile 1's lower bound sits BELOW the smallest doc_id
          // (doc_id 0 exists — its first-seen grams must land in q1)
          expr("IF(quartile = 1, -1L, (md * (quartile - 1)) div 4)")
            .as("prev_cutoff"))
      fs.crossJoin(broadcast(cp))
        .groupBy(col("quartile"), col("cutoff"), col("prev_cutoff"))
        .agg(count(when(col("first_seen") <= col("cutoff"), 1))
            .as("gram_vocab"),
          count(when(col("first_seen") <= col("cutoff")
            && col("first_seen") > col("prev_cutoff"), 1)).as("new_grams"))
        .select(col("quartile").cast("int").as("quartile"),
          col("cutoff").as("doc_cutoff"),
          col("gram_vocab").cast("long").as("gram_vocab"),
          col("new_grams").cast("long").as("new_grams"))
        .orderBy("quartile")
    },

    // Zipf rank-frequency fit (round 16) — the per-source corpus-health
    // twin of qt18's novelty curve: natural text follows freq ∝ 1/rank
    // (log-log slope ≈ −1); template-mined or boilerplate-heavy sources
    // flatten the head (slope → 0) and synthetic spam steepens it. The
    // fit is an OLS slope of ln(freq) on ln(rank) over the HEAD ranks
    // only (rank ≤ [[ZipfRankCap]]) — the head is where Zipf holds (the
    // singleton tail always deviates) and the cap makes every per-source
    // moment sum ≤ cap terms, so the BIGINT accumulators cannot overflow
    // at ANY corpus size (ln values floor-scale at 1e3: x ≤ ~10, y ≤
    // ~30 even at 10^13 tokens — products stay under 2^53, sums exact).
    // Determinism: ranks and counts are exact integers; the only float
    // ops are the established floored ln of each (qt17's rule) and ONE
    // final division of two exactly-representable BIGINTs (< 2^53),
    // floored at 1e-6. Scale shape: ONE (source, word) partial-agg
    // shuffle reduces the corpus; the ranking window partitions by
    // source over that vocab-bounded table (never corpus rows), the
    // head filter caps it at [[ZipfRankCap]] rows per source, and the
    // moment rollup is one more partial agg — no corpus window, no
    // join, nothing driver-side.
    q("qt19_zipf_slope",
      s"""WITH tok AS (SELECT source,
         |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
         |      AS w
         |  FROM documents),
         |wc AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM tok GROUP BY source, w),
         |rk AS (SELECT source, c, row_number() OVER (PARTITION BY source
         |    ORDER BY c DESC, w) AS r,
         |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS vocab
         |  FROM wc),
         |xy AS (SELECT source, vocab,
         |    CAST(floor(ln(CAST(r AS DOUBLE)) * 1000.0) AS BIGINT) AS x,
         |    CAST(floor(ln(CAST(c AS DOUBLE)) * 1000.0) AS BIGINT) AS y
         |  FROM rk WHERE r <= $ZipfRankCap),
         |m AS (SELECT source, vocab, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx
         |  FROM xy GROUP BY source, vocab)
         |SELECT source, vocab, n AS n_fit,
         |  CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
         |    / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000.0) AS BIGINT)
         |    AS slope6
         |FROM m WHERE n >= 2 ORDER BY source""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wc = t(s, d, "documents")
        .select(col("source"),
          explode(expr(CurationQueries.WordsExpr)).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      val rk = wc
        .withColumn("r", row_number().over(Window.partitionBy("source")
          .orderBy(col("c").desc, col("w"))))
        .withColumn("vocab",
          count(lit(1)).over(Window.partitionBy("source")))
      val xy = rk.where(col("r") <= ZipfRankCap)
        .select(col("source"), col("vocab"),
          floor(log(col("r").cast("double")) * 1000.0).cast("long")
            .as("x"),
          floor(log(col("c").cast("double")) * 1000.0).cast("long")
            .as("y"))
      xy.groupBy("source", "vocab")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .where(col("n") >= 2)
        .select(col("source"), col("vocab"), col("n").as("n_fit"),
          floor((col("n") * col("sxy") - col("sx") * col("sy"))
              .cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double") * 1000000.0).cast("long").as("slope6"))
        .orderBy("source")
    },

    // Per-source distribution drift (round 16) — KL(source ‖ corpus)
    // over unigram distributions: the crawl-health audit a pipeline
    // runs to catch a source whose snapshot shifted (new template, new
    // language mix, spam injection) before mixing it in. KL(P‖Q) =
    // Σ p·ln(p/q) with P the source's word distribution and Q the
    // corpus's — every source word exists in the corpus (g ≥ c), so q
    // never zeroes. Determinism (qt17's rule): the only float ops are
    // the floored ln of ONE ratio per word and the two exact-integer
    // divisions composing it — (c/T_s)·(T/g), divisions BEFORE the
    // multiply so both factors stay near 1 and no BIGINT product can
    // overflow at any corpus size; each term then rides as
    // c·floor(ln(·)·1e6), a BIGINT, and the per-source total divides
    // by T_s in integer math. Scale shape: ONE (source, word)
    // partial-agg shuffle reduces the corpus; the global word table,
    // source totals, and corpus total all DERIVE from that cached
    // reduced table (three aggregations, no second corpus pass); the
    // scoring join is word-keyed over vocab-bounded tables with the
    // 1-row corpus total and per-source totals broadcast. The summed
    // term CAN go slightly negative for a near-identical source (true
    // KL ≥ 0, but each term carries the floor's ≤1e-6 downward bias);
    // DuckDB's `//` and Spark's `div` both truncate toward zero (on
    // HUGEINT and DECIMAL alike; verified -7//2 = -7 div 2 = -3), so
    // the engines agree on signed totals. The term products and their
    // sum ride EXACT 128-bit integers (Spark DECIMAL(38,0) / DuckDB
    // HUGEINT — c·floor(ln·1e6) reaches ~3.5e20 for a 10^13-token
    // source, past BIGINT), and only the final per-source quotient
    // (≤ |ln|·1e6) narrows back to BIGINT.
    q("qt20_source_kl_drift",
      """WITH tok AS (SELECT source,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS w
        |  FROM documents),
        |wcs AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tok GROUP BY source, w),
        |ts AS (SELECT source, CAST(SUM(c) AS BIGINT) AS tsrc
        |  FROM wcs GROUP BY source),
        |wg AS (SELECT w, CAST(SUM(c) AS BIGINT) AS g FROM wcs GROUP BY w),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM wcs)
        |SELECT wcs.source, CAST(COUNT(*) AS BIGINT) AS n_words,
        |  CAST(SUM(CAST(c AS HUGEINT) * CAST(floor(ln(
        |      (CAST(c AS DOUBLE) / CAST(tsrc AS DOUBLE))
        |      * (CAST(t AS DOUBLE) / CAST(g AS DOUBLE)))
        |    * 1000000.0) AS BIGINT)) // tsrc AS BIGINT) AS kl6
        |FROM wcs
        |JOIN ts ON ts.source = wcs.source
        |JOIN wg ON wg.w = wcs.w
        |CROSS JOIN tot
        |GROUP BY wcs.source, tsrc
        |ORDER BY wcs.source""".stripMargin) { (s, d) =>
      // wcs feeds FOUR consumers (ts, wg, tot, the scoring join) —
      // cache the vocab-bounded reduced table (the house rule: cache
      // the reduced table, never the corpus input); harness callers
      // clearCache() per the QueryModule contract
      val wcs = t(s, d, "documents")
        .select(col("source"),
          explode(expr(CurationQueries.WordsExpr)).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
        .cache()
      val ts = wcs.groupBy("source").agg(sum("c").as("tsrc"))
      val wg = wcs.groupBy("w").agg(sum("c").as("g"))
      val tot = wcs.agg(sum("c").as("t"))
      wcs.join(broadcast(ts), "source")
        .join(wg, "w")
        .crossJoin(broadcast(tot))
        .withColumn("term",
          col("c").cast(org.apache.spark.sql.types.DecimalType(38, 0))
            * floor(log(
              (col("c").cast("double") / col("tsrc").cast("double"))
                * (col("t").cast("double") / col("g").cast("double")))
              * 1000000.0).cast("long"))
        .groupBy("source", "tsrc")
        .agg(count(lit(1)).as("n_words"), sum("term").as("klsum"))
        .select(col("source"), col("n_words"),
          expr("CAST(klsum div tsrc AS BIGINT)").as("kl6"))
        .orderBy("source")
    },

    // Heaps' law vocabulary-growth fit (round 17) — the SECOND classical
    // corpus law beside qt19's Zipf: V(N) ≈ K·N^β (β ≈ 0.4–0.6 for
    // natural text; β → 0 flags a template/boilerplate source whose
    // vocabulary saturates, β → 1 flags id/hash spam where every token
    // is new). The fit is an OLS slope of ln(cumulative vocab) on
    // ln(cumulative tokens) at 8 per-source document checkpoints
    // (doc-count octiles in doc_id order — a bounded, deterministic
    // point set at ANY corpus size, the qt19 cap posture). Determinism:
    // cumulative counts are exact integers off window prefix sums; the
    // only float ops are the established floored ln (qt17's rule) and
    // one final division of two < 2^53 BIGINTs, floored at 1e-6; a
    // degenerate all-equal-x point set is filtered by the integer
    // denominator test, not left to NaN. Scale shape: TWO token-stream
    // partial-agg passes — word first-occurrence and per-doc counts —
    // each one shuffle (the explode is recomputed per consumer: the
    // recorded qp24/qp26 lesson — a narrow map/explode is cheaper to
    // recompute than to materialize); everything downstream runs on
    // DOC- or VOCAB-reduced tables, the checkpoint table is
    // #sources × 8 rows and broadcasts into its join.
    q("qt21_heaps_fit",
      """WITH tok AS (SELECT source, doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS w
        |  FROM documents),
        |fw AS (SELECT source, w, MIN(doc_id) AS fd
        |  FROM tok GROUP BY source, w),
        |v AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab
        |  FROM fw GROUP BY source),
        |nv AS (SELECT source, fd AS doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS newv
        |  FROM fw GROUP BY source, fd),
        |tc AS (SELECT source, doc_id, CAST(COUNT(*) AS BIGINT) AS tcnt
        |  FROM tok GROUP BY source, doc_id),
        |dd AS (SELECT tc.source, tc.doc_id, tc.tcnt,
        |    COALESCE(nv.newv, 0) AS newv
        |  FROM tc LEFT JOIN nv
        |    ON nv.source = tc.source AND nv.doc_id = tc.doc_id),
        |wd AS (SELECT source, doc_id,
        |    CAST(SUM(tcnt) OVER (PARTITION BY source ORDER BY doc_id)
        |      AS BIGINT) AS cumn,
        |    CAST(SUM(newv) OVER (PARTITION BY source ORDER BY doc_id)
        |      AS BIGINT) AS cumv,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
        |      AS BIGINT) AS r,
        |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS nd
        |  FROM dd),
        |cp AS (SELECT DISTINCT source, nd, (nd * k.k + 7) // 8 AS r
        |  FROM (SELECT DISTINCT source, nd FROM wd) s
        |  CROSS JOIN (SELECT CAST(unnest([1, 2, 3, 4, 5, 6, 7, 8])
        |      AS BIGINT) AS k) k),
        |xy AS (SELECT wd.source, wd.nd,
        |    CAST(floor(ln(CAST(cumn AS DOUBLE)) * 1000.0) AS BIGINT) AS x,
        |    CAST(floor(ln(CAST(cumv AS DOUBLE)) * 1000.0) AS BIGINT) AS y
        |  FROM wd JOIN cp ON cp.source = wd.source AND cp.r = wd.r
        |  WHERE cumn > 0 AND cumv > 0),
        |m AS (SELECT source, MAX(nd) AS n_docs,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM xy GROUP BY source)
        |SELECT m.source, CAST(n_docs AS BIGINT) AS n_docs, v.vocab,
        |  n AS n_fit,
        |  CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000.0) AS BIGINT)
        |    AS beta6
        |FROM m JOIN v ON v.source = m.source
        |WHERE n >= 2 AND n * sxx - sx * sx <> 0
        |ORDER BY m.source""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // cache contract (qp29 lesson, qt20's rationale): fw feeds the
      // vocab rollup AND the new-word table, dd feeds the window AND
      // the per-source doc counts — without the caches the corpus
      // token explode re-ran FIVE times (measured: 5 FileScans, zero
      // ReusedExchange); with them it runs exactly twice (tc, fw).
      // Harness callers clearCache() per the QueryModule contract.
      val tok = t(s, d, "documents")
        .select(col("source"), col("doc_id"),
          explode(expr(CurationQueries.WordsExpr)).as("w"))
      val fw = tok.groupBy("source", "w").agg(min("doc_id").as("fd"))
        .cache()
      val v = fw.groupBy("source").agg(count(lit(1)).as("vocab"))
      val nv = fw.groupBy(col("source"), col("fd").as("doc_id"))
        .agg(count(lit(1)).as("newv"))
      val tc = tok.groupBy("source", "doc_id")
        .agg(count(lit(1)).as("tcnt"))
      val dd = tc.join(nv, Seq("source", "doc_id"), "left")
        .select(col("source"), col("doc_id"), col("tcnt"),
          coalesce(col("newv"), lit(0L)).as("newv"))
        .cache()
      val nds = dd.groupBy("source").agg(count(lit(1)).as("nd"))
      val byDoc = Window.partitionBy("source").orderBy("doc_id")
      val wd = dd.select(col("source"), col("doc_id"),
        sum("tcnt").over(byDoc).as("cumn"),
        sum("newv").over(byDoc).as("cumv"),
        row_number().over(byDoc).cast("long").as("r"))
      val ks = s.range(1, 9).select(col("id").as("k"))
      val cp = nds.crossJoin(ks)
        .select(col("source"), expr("(nd * k + 7) div 8").as("r"))
        .distinct()
      val xy = wd.join(broadcast(cp), Seq("source", "r"))
        .where(col("cumn") > 0 && col("cumv") > 0)
        .select(col("source"),
          floor(log(col("cumn").cast("double")) * 1000.0).cast("long")
            .as("x"),
          floor(log(col("cumv").cast("double")) * 1000.0).cast("long")
            .as("y"))
      val m = xy.groupBy("source")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .where(col("n") >= 2
          && col("n") * col("sxx") - col("sx") * col("sx") =!= 0)
      m.join(broadcast(nds.select(col("source"), col("nd").as("n_docs"))),
          "source")
        .join(broadcast(v), "source")
        .select(col("source"), col("n_docs").cast("long"),
          col("vocab"), col("n").as("n_fit"),
          floor((col("n") * col("sxy") - col("sx") * col("sy"))
              .cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double") * 1000000.0).cast("long").as("beta6"))
        .orderBy("source")
    },

    // N-gram/marker-word language-ID heuristic: count marker hits per
    // language profile, argmax with fixed tie order, then confusion counts
    // against the labeled lang column.
    q("qt3_langid", {
      val scores = LangMarkers.map { case (l, ws) =>
        val list = ws.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(tk, w -> w IN ($list))) AS sc_$l"
      }.mkString(",\n    ")
      val langs = LangMarkers.map(_._1)
      val caseExpr = langs.init.map { l =>
        val ge = langs.filter(_ != l).map(o => s"sc_$l >= sc_$o").mkString(" AND ")
        s"WHEN $ge THEN '$l'"
      }.mkString("\n    ")
      s"""WITH tkx AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
         |sc AS (SELECT doc_id, lang,
         |    $scores
         |  FROM tkx),
         |pred AS (SELECT lang, CASE
         |    $caseExpr
         |    ELSE '${langs.last}' END AS lang_pred
         |  FROM sc)
         |SELECT lang, lang_pred, COUNT(*) AS n FROM pred
         |GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin
    }) { (s, d) =>
      val langs = LangMarkers.map(_._1)
      val withScores = LangMarkers.foldLeft(
        t(s, d, "documents").withColumn("tk", split(col("text"), " "))) {
        case (df, (l, ws)) =>
          val list = ws.map(w => s"'$w'").mkString(", ")
          df.withColumn(s"sc_$l", expr(s"size(filter(tk, w -> w IN ($list)))"))
      }
      val pred = langs.init.foldRight(lit(langs.last)) { (l, els) =>
        val ge = langs.filter(_ != l)
          .map(o => col(s"sc_$l") >= col(s"sc_$o"))
          .reduce(_ && _)
        when(ge, l).otherwise(els)
      }
      withScores.withColumn("lang_pred", pred)
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("lang_pred"))
    },

    // Tokenizer counting: whitespace tokens vs a BPE-ish regex tokenizer
    // (letter runs / single digits / single punctuation). Whitespace is
    // the EXPLICIT class [ \t\n\f\r\x0B], not \s (review r18: \s is NOT
    // in the Java∩RE2 subset the module header mandates — Java's \s
    // includes vertical tab U+000B, RE2's does not, so a document
    // containing a VT split differently in the two engines; the
    // explicit class names the same five-plus-one characters in both).
    q("qt4_token_count",
      """SELECT doc_id,
        |  CAST(len(string_split_regex(text, '[ \t\n\f\r\x0B]+')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 \t\n\f\r\x0B]')) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          size(split(col("text"), "[ \\t\\n\\f\\r\\x0B]+")).cast("long")
            .as("ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[a-z]+|[0-9]|[^a-z0-9 \\t\\n\\f\\r\\x0B]"), lit(0)))
            .cast("long").as("bpe_tokens"))
        .orderBy(col("doc_id"))
    },

    // Corpus n-gram statistics: top-5 bigrams per language by count —
    // the canonical corpus-frequency pass of a training-data pipeline.
    // Scale shape: explode → map-side partial aggregation on
    // (lang, bigram) → per-language rank; at 100 TB the pre-aggregated
    // (lang, bigram, cnt) table is tiny relative to the corpus, so the
    // window ranks a reduced input. Ties break on bigram text for
    // cross-engine determinism.
    q("qt6_top_ngrams",
      """WITH tkx AS (SELECT lang, string_split(text, ' ') AS tk FROM documents),
        |bg AS (SELECT lang, unnest(list_transform(generate_series(1, len(tk) - 1),
        |    i -> tk[i] || ' ' || tk[i+1])) AS bigram
        |  FROM tkx WHERE len(tk) >= 2),
        |c AS (SELECT lang, bigram, COUNT(*) AS cnt FROM bg GROUP BY 1, 2),
        |r AS (SELECT lang, bigram, cnt, CAST(row_number() OVER (
        |    PARTITION BY lang ORDER BY cnt DESC, bigram) AS BIGINT) AS rnk FROM c)
        |SELECT lang, bigram, cnt, rnk FROM r WHERE rnk <= 5
        |ORDER BY lang, rnk""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val bg = t(s, d, "documents")
        .withColumn("tk", split(col("text"), " "))
        .where(size(col("tk")) >= 2)
        .select(col("lang"), explode(expr(
          "transform(sequence(0, size(tk) - 2), i -> concat(tk[i], ' ', tk[i + 1]))"))
          .as("bigram"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("cnt").desc, col("bigram"))
      bg.groupBy(col("lang"), col("bigram"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 5)
        .select(col("lang"), col("bigram"), col("cnt"), col("rnk"))
        .orderBy(col("lang"), col("rnk"))
    },

    // JSON field extraction from the events props column (reference:
    // flink-json JsonRowDeserializationSchema.java:52 → from_json /
    // get_json_object).
    q("qt5_json_extract",
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, d) =>
        t(s, d, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("int").as("k"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).cast("long").as("sum_k"), count(lit(1)).as("n"))
          .orderBy(col("event_type"))
    },

    // Repetition-ratio quality signal (the Gopher/C4 curation rule this
    // family lacked): per document, the fraction of duplicated words and
    // duplicated word-bigrams — high repetition marks boilerplate/spam
    // for training-data filtering. Pure per-row array expressions
    // (split/filter/array_distinct/transform — all codegen'd builtins),
    // ZERO shuffles before the output sort: the 100 TB shape is a map-only
    // pass. Fractions are IEEE divisions of exact integer counts, so both
    // engines compute bit-identical doubles and the low_quality flag
    // compares identically.
    q("qt7_repetition",
      """WITH w AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |g AS (SELECT doc_id, ws,
        |    list_transform(generate_series(1, len(ws) - 1), i ->
        |      ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1]) AS bs
        |  FROM w WHERE len(ws) >= 2)
        |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) / len(ws)
        |    AS word_rep,
        |  CAST(len(bs) - len(list_distinct(bs)) AS DOUBLE) / len(bs)
        |    AS bigram_rep,
        |  (CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) / len(ws) > 0.6
        |   OR CAST(len(bs) - len(list_distinct(bs)) AS DOUBLE) / len(bs) > 0.2)
        |    AS low_quality
        |FROM g
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents")
        .selectExpr("doc_id", "filter(split(text, ' '), x -> x <> '') AS ws")
        .where("size(ws) >= 2")
        .selectExpr("doc_id", "ws",
          "transform(sequence(0, size(ws) - 2), i -> " +
            "concat(ws[i], ' ', ws[i + 1])) AS bs")
        .selectExpr("doc_id",
          "CAST(size(ws) AS BIGINT) AS n_words",
          "CAST(size(ws) - size(array_distinct(ws)) AS DOUBLE) / size(ws)" +
            " AS word_rep",
          "CAST(size(bs) - size(array_distinct(bs)) AS DOUBLE) / size(bs)" +
            " AS bigram_rep")
        .selectExpr("doc_id", "n_words", "word_rep", "bigram_rep",
          "word_rep > 0.6 OR bigram_rep > 0.2 AS low_quality")
        .orderBy("doc_id")
    },

    // PII detect + redact — the scrub pass every training corpus runs
    // before the tokenizer: emails, phone numbers, and IPv4 addresses are
    // counted (regexp_extract_all) and masked (chained regexp_replace,
    // email first so the later numeric patterns never see its digits).
    // Map-only column expressions, zero shuffles at any scale; the
    // patterns stay in the Java∩RE2 regex subset (char classes, bounded
    // repeats, \b) so both engines match identically. The synthetic
    // corpus carries no PII, so the contact text is CONSTRUCTED from the
    // customer table by the same SQL in both engines — the operator under
    // test is the scrubber, not the generator.
    // ONE pattern definition governs BOTH sides (review r18: the
    // oracle carried hand-copied pattern text, so a pattern edit could
    // silently fork the two scrubbers while the fixture kept passing;
    // the constants interpolate verbatim — they are Java∩RE2 and
    // contain nothing a SQL single-quoted literal reinterprets)
    q("qt8_pii_redaction",
      s"""WITH raw AS (SELECT c_custkey,
        |    'Contact ' || c_name || ' <user' || CAST(c_custkey AS VARCHAR)
        |      || '@example.com> phone +1-555-'
        |      || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
        |      || ' from 10.' || CAST(c_custkey % 256 AS VARCHAR)
        |      || '.0.' || CAST(c_custkey % 100 AS VARCHAR) AS txt
        |  FROM customer)
        |SELECT c_custkey,
        |  regexp_replace(regexp_replace(regexp_replace(txt,
        |      '$PiiEmail', '<EMAIL>', 'g'),
        |      '$PiiPhone', '<PHONE>', 'g'),
        |      '$PiiIp', '<IP>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(txt, '$PiiEmail')) AS BIGINT)
        |    AS n_email,
        |  CAST(len(regexp_extract_all(txt, '$PiiPhone')) AS BIGINT)
        |    AS n_phone,
        |  CAST(len(regexp_extract_all(txt, '$PiiIp')) AS BIGINT) AS n_ip
        |FROM raw ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .withColumn("txt", concat(
          lit("Contact "), col("c_name"), lit(" <user"),
          col("c_custkey").cast("string"),
          lit("@example.com> phone +1-555-"),
          lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
          lit(" from 10."), (col("c_custkey") % 256).cast("string"),
          lit(".0."), (col("c_custkey") % 100).cast("string")))
        .select(col("c_custkey"),
          scrubPii(col("txt")).as("redacted"),
          piiCount(col("txt"), PiiEmail).as("n_email"),
          piiCount(col("txt"), PiiPhone).as("n_phone"),
          piiCount(col("txt"), PiiIp).as("n_ip"))
        .orderBy(col("c_custkey"))
    },

    // Corpus token frequency via the string-keyed Count-Min sketch
    // (graft_cms_str): ONE 4 KiB sketch over every token answers "how
    // often does word X appear?" for any later key — at 100 TB this
    // replaces the full token groupBy (qt6's exact path) with a partial-
    // agg of constant-size partials; tokens hash through the md5 60-bit
    // prefix the KMV/KLL sketches use, so the oracle restates hashing AND
    // bucket arithmetic exactly (hex-nibble sum -> Carter-Wegman bucket).
    // Bit-exact, including the absent key's zero.
    q("qt9_token_freq_cms", {
      val hv = (e: String) =>
        s"""list_aggregate(list_transform(generate_series(1, 15), i ->
           |      CAST(strpos('0123456789abcdef',
           |          substr(md5($e), CAST(i AS INTEGER), 1)) - 1 AS BIGINT)
           |        * (CAST(1 AS BIGINT)
           |           << CAST((15 - i) * 4 AS INTEGER))), 'sum')""".stripMargin
      val bucket = (h: String) =>
        s"((CAST(hp.a AS BIGINT) * ($h % 2147483647) + hp.b) % 2147483647) % 512"
      s"""WITH tok AS (SELECT
         |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
         |  FROM documents),
         |f AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY 1),
         |fh AS (SELECT w, c, ${hv("w")} AS h FROM f),
         |ks AS (SELECT * FROM (VALUES ('the'), ('spark'), ('table'),
         |    ('zzz_absent')) t(k)),
         |kh AS (SELECT k, ${hv("k")} AS h FROM ks),
         |hp AS (SELECT * FROM (VALUES (0, 1103515245, 12345),
         |    (1, 1299709, 7919), (2, 104729, 271), (3, 97, 31)) t(j, a, b)),
         |est AS (SELECT kh.k, hp.j, COALESCE(SUM(fh.c), 0) AS e
         |  FROM kh CROSS JOIN hp LEFT JOIN fh
         |    ON ${bucket("fh.h")} = ${bucket("kh.h")}
         |  GROUP BY 1, 2)
         |SELECT k, CAST(MIN(e) AS BIGINT) AS est
         |FROM est GROUP BY k ORDER BY k""".stripMargin
    }) { (s, d) =>
      graft.functions.Udafs.register(s)
      val sk = t(s, d, "documents")
        .select(explode(expr("filter(split(text, ' '), x -> x <> '')"))
          .as("w"))
        .agg(expr("graft_cms_str(w)").as("sk"))
      val ks = s.createDataFrame(
        java.util.Arrays.asList(Seq("the", "spark", "table", "zzz_absent")
          .map(org.apache.spark.sql.Row(_)): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.StringType, nullable = false))))
      ks.crossJoin(broadcast(sk))
        .selectExpr("k", "graft_cms_est_str(sk, k) AS est")
        .orderBy("k")
    },

    // TF-IDF top terms per document — the classic relevance/keyword
    // primitive: tf = term count / doc length, idf = ln(N / doc-freq),
    // top 3 terms per doc by score. Scale shape: ONE tokenize pass feeds
    // three partial-aggregated groupBys (term counts, doc lengths,
    // document frequencies — cached, the posture you'd persist at
    // 100 TB); the scoring joins are term-/doc-keyed equi-joins (AQE
    // broadcasts the small sides at test scale, shuffles at corpus
    // scale), and the per-doc top-3 is a doc-partitioned window over the
    // already-reduced (doc, term) table. Determinism: FLOOR-scaled
    // fixed-point, not round() — round(x, 6) flips at half-boundaries
    // where Spark (decimal-repr HALF_UP) and DuckDB (true binary)
    // disagree (seen once in 15k scores at sf0.1); floor is a pure
    // binary-double op, identical everywhere. Ties break on the term.
    q("qt10_tfidf_top_terms",
      """WITH tok AS (SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS len
        |  FROM tf GROUP BY 1),
        |df AS (SELECT w, COUNT(*) AS dfreq FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS nd FROM dl),
        |s AS (SELECT tf.doc_id, tf.w,
        |    floor((CAST(tf.c AS DOUBLE) / dl.len)
        |      * CAST(floor(ln(CAST(n.nd AS DOUBLE) / df.dfreq)
        |          * 1000000.0) AS BIGINT)) / 1000000.0 AS score
        |  FROM tf JOIN dl USING (doc_id) JOIN df USING (w) CROSS JOIN n),
        |r AS (SELECT doc_id, w, score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, w) AS rk
        |  FROM s)
        |SELECT doc_id, CAST(rk AS BIGINT) AS rk, w AS term, score
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val tf = t(s, d, "documents")
        .select(col("doc_id"),
          explode(expr("filter(split(text, ' '), x -> x <> '')")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
        .cache() // one tokenize pass feeds all three aggregates
      val dl = tf.groupBy(col("doc_id"))
        .agg(sum(col("c")).cast("long").as("len"))
      val dfq = tf.groupBy(col("w")).agg(count(lit(1)).as("dfreq"))
      val n = dl.agg(count(lit(1)).as("nd"))
      val scored = tf.join(dl, "doc_id").join(dfq, "w")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("w"),
          (floor((col("c").cast("double") / col("len"))
            * floor(log(col("nd").cast("double") / col("dfreq"))
              * 1000000.0).cast("long")) / 1000000.0)
            .as("score"))
      scored
        .withColumn("rk", row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("w"))))
        .where(col("rk") <= 3)
        .select(col("doc_id"), col("rk").cast("long").as("rk"),
          col("w").as("term"), col("score"))
        .orderBy(col("doc_id"), col("rk"))
    },

    // Bigram language-model scoring — the CCNet/KenLM-style perplexity
    // quality filter: train add-one-smoothed bigram probabilities on the
    // corpus itself, score every document by its summed/average bigram
    // log-probability (low average ⇒ improbable text ⇒ filter
    // candidate). Scale shape: the corpus reduces to the bigram count
    // table and its prefix rollup (two partial-aggregated groupBys over
    // one array-native bigram pass — no positional self-join); scoring
    // is token-keyed LEFT equi-joins of the per-doc bigram rows against
    // those reduced tables (unseen bigrams take the add-one floor
    // 1/(cu+V) — OOV-safe when deployed on NEW documents), then ONE
    // partial-aggregated groupBy(doc).
    // Determinism: P = (cb+1)/(cu+V) is one division of exact integers;
    // ln floor-scales to micro-units (the qt10 rule) so per-doc SUMs are
    // integer sums and avg is integer division — bit-exact cross-engine.
    q("qt12_bigram_logprob",
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
        |  FROM (SELECT UNNEST(a) AS w FROM arr) u)
        |SELECT b.doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(CAST(floor(ln((COALESCE(bc.cb, 0) + 1.0)
        |    / (COALESCE(uc.cu, 0) + v.vsz))
        |    * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_lp6,
        |  CAST(SUM(CAST(floor(ln((COALESCE(bc.cb, 0) + 1.0)
        |    / (COALESCE(uc.cu, 0) + v.vsz))
        |    * 1000000.0) AS BIGINT)) AS BIGINT) // COUNT(*) AS avg_lp6
        |FROM big b LEFT JOIN bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
        |  LEFT JOIN uc ON b.w1 = uc.w1 CROSS JOIN v
        |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val big = bigramRows(docs)
        .cache() // one bigram pass feeds training counts AND scoring
      val (bc, uc, v) = bigramLm(big, docs)
      scoreBigramLm(big, bc, uc, v).orderBy(col("doc_id"))
    },

    // PMI collocations — pointwise mutual information over corpus
    // bigrams, the classic collocation/phrase-mining statistic:
    // pmi = ln(P(w1,w2) / (P(w1)·P(w2))) = ln(cb·N² / (B·c1·c2)).
    // Scale shape: bigram + token counts are two partial-aggregated
    // groupBys; scoring joins run on the REDUCED count tables (vocab-
    // sized, not corpus-sized); top-15 is a TakeOrdered. Determinism:
    // each FACTOR casts to double BEFORE multiplying (review r18: the
    // former exact-int64 products cb·nt² / bt·c1·c2 hit ANSI
    // ARITHMETIC_OVERFLOW — and DuckDB's int64 overflow error — once
    // the corpus passes ~15M tokens, a hard ceiling the 100 TB
    // posture cannot carry; IEEE double multiply/divide in the SAME
    // operand order is bit-identical across engines and never
    // overflows), then the floor-scaled-ln rule; min-support cb ≥ 5
    // keeps the statistic meaningful.
    q("qt13_pmi_collocations",
      """WITH tok AS MATERIALIZED (SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS w
        |  FROM documents),
        |wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok
        |  GROUP BY w),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM tok),
        |arr AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS a
        |  FROM documents),
        |bg AS (SELECT a[i] AS w1, a[i + 1] AS w2
        |  FROM arr, UNNEST(generate_series(1, len(a) - 1)) AS g(i)),
        |bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb FROM bg
        |  GROUP BY w1, w2),
        |b AS (SELECT CAST(SUM(cb) AS BIGINT) AS bt FROM bc),
        |s AS (SELECT bc.w1, bc.w2, bc.cb,
        |    CAST(floor(ln(
        |      (CAST(bc.cb AS DOUBLE) * CAST(n.nt AS DOUBLE)
        |        * CAST(n.nt AS DOUBLE))
        |      / (CAST(b.bt AS DOUBLE) * CAST(x1.c AS DOUBLE)
        |        * CAST(x2.c AS DOUBLE))) * 1000000.0)
        |      AS BIGINT) AS pmi6
        |  FROM bc JOIN wc x1 ON bc.w1 = x1.w
        |    JOIN wc x2 ON bc.w2 = x2.w
        |    CROSS JOIN n CROSS JOIN b
        |  WHERE bc.cb >= 5)
        |SELECT w1, w2, cb, pmi6 FROM s
        |ORDER BY pmi6 DESC, w1, w2 LIMIT 15""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      val big = bigramRows(docs)
      // cache the two vocab-reduced count tables: bc feeds its own total
      // AND the scoring join, wc feeds the token total AND both per-side
      // joins — uncached, the corpus explode+aggregate passes re-ran per
      // consumer (scan-audit: documents scanned 5×; optimization r18,
      // the qt17/qt21 reduced-table rule)
      val bc = big.groupBy("w1", "w2").agg(count(lit(1)).as("cb")).cache()
      val wc = docs
        .select(explode(expr("filter(split(text, ' '), x -> x <> '')"))
          .as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .cache()
      val n = wc.agg(sum("c").cast("long").as("nt"))
      val b = bc.agg(sum("cb").cast("long").as("bt"))
      bc.where(col("cb") >= 5)
        .join(wc.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
        .join(wc.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
        .crossJoin(broadcast(n)).crossJoin(broadcast(b))
        .select(col("w1"), col("w2"), col("cb"),
          floor(log((col("cb").cast("double") * col("nt").cast("double")
              * col("nt").cast("double"))
            / (col("bt").cast("double") * col("c1").cast("double")
              * col("c2").cast("double")))
            * 1000000.0).cast("long").as("pmi6"))
        .orderBy(col("pmi6").desc, col("w1"), col("w2"))
        .limit(15)
    }
  )

  /** (doc_id, w1, w2) bigram rows of a corpus — array-native (one
    * transform + explode), no positional self-join. Stateless, so it
    * applies unchanged to a streaming source. */
  def bigramRows(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> x <> '')").as("a"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(a) >= 2
          |  THEN transform(sequence(0, size(a) - 2),
          |         i -> named_struct('w1', a[i], 'w2', a[i + 1]))
          |  ELSE CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>)
          |END""".stripMargin)).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))

  /** Train the add-one bigram LM: (bigram counts, prefix counts,
    * vocabulary size) — the reduced tables you'd persist at corpus
    * scale and reuse across scoring runs. */
  def bigramLm(big: DataFrame, docs: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val bc = big.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val uc = bc.groupBy("w1").agg(sum("cb").as("cu"))
    val v = docs
      .select(explode(expr("filter(split(text, ' '), x -> x <> '')"))
        .as("w"))
      .agg(count_distinct(col("w")).as("vsz"))
    (bc, uc, v)
  }

  /** Score bigram rows against a trained LM: token-keyed equi-joins +
    * one partial-aggregated groupBy(doc). The joins are stream-safe
    * (stream-static), so a trained model can score documents ON INGEST
    * — StreamingPipelineSpec pins stream == batch. */
  def scoreBigramLm(big: DataFrame, bc: DataFrame, uc: DataFrame,
      v: DataFrame): DataFrame = {
    val lp6 = floor(log((col("cb") + lit(1.0)) / (col("cu") + col("vsz")))
      * 1000000.0).cast("long")
    // LEFT joins: when scoring NEW documents the LM never saw, unseen
    // bigrams/prefixes take the add-one-smoothed floor (cb=0, cu=0 ⇒
    // P = 1/(cu+V)) instead of silently dropping out of the sums
    big.join(bc, Seq("w1", "w2"), "left").join(uc, Seq("w1"), "left")
      .withColumn("cb", coalesce(col("cb"), lit(0L)))
      .withColumn("cu", coalesce(col("cu"), lit(0L)))
      .crossJoin(broadcast(v))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum(lp6).cast("long").as("sum_lp6"))
      .withColumn("avg_lp6", expr("sum_lp6 div n_bigrams"))
  }
}
