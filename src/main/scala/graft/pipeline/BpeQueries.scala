package graft.pipeline

import graft.{Q, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE merge learning (Sennrich et al. 2016, the tokenizer-training pass of
  * an LLM data pipeline): iteratively find the most frequent adjacent
  * symbol pair and fuse it, starting from characters.
  *
  * Scale shape — the production trick is that BPE never iterates over the
  * corpus: the corpus reduces ONCE to the word-frequency table (a
  * partial-aggregated groupBy — the only corpus-sized stage), and every
  * merge iteration runs on that vocabulary table (millions of rows at
  * 100 TB, distributed; each iteration is one small explode + partial-agg
  * + a single-row argmax collect, the same driver-scalar-per-iteration
  * pattern as the graph loops). The greedy left-to-right pair rewrite is
  * ONE codegen'd `aggregate` fold over each word's symbol array — no
  * shuffle, no UDF.
  *
  * Determinism: argmax ties break on (freq DESC, left ASC, right ASC);
  * frequencies are integer sums — every step is bit-exact cross-engine.
  * The DuckDB oracle unrolls the same K iterations as chained CTE blocks,
  * expressing the greedy non-overlapping rewrite RELATIONALLY: candidate
  * positions group into runs of consecutive indices and greedy
  * left-to-right keeps exactly the odd-ranked position of each run
  * (adjacent candidates overlap by one symbol; non-adjacent ones are
  * independent) — equivalence with the sequential fold is property-tested
  * in BpeSpec.
  */
object BpeQueries extends QueryModule {

  private val Steps = 6

  /** tokens → (word, freq, syms=chars): the one corpus-sized stage.
    * Empty words (consecutive/leading spaces) are filtered — the text
    * ops' `x <> ''` convention — which also guarantees every symbol
    * array is non-empty, the precondition of [[mergeOnceExpr]]'s
    * empty-string no-carry sentinel. */
  private[pipeline] def wordVocab(docs: DataFrame): DataFrame =
    docs.select(explode(expr(
        "filter(split(text, ' '), x -> x <> '')")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms", split(col("word"), ""))

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")

  /** Adjacent pairs of the symbol array as array<struct<a,b>>. */
  private val pairExpr: String =
    """CASE WHEN size(syms) >= 2
      |  THEN transform(sequence(0, size(syms) - 2),
      |         i -> named_struct('a', syms[i], 'b', syms[i + 1]))
      |  ELSE CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>)
      |END""".stripMargin

  /** Greedy left-to-right single-merge rewrite of `syms` as a codegen'd
    * fold: carry the previous unmerged symbol; when (prev, cur) is the
    * merge pair emit the fused symbol and clear the carry (the fused
    * symbol never re-merges within the same step, per BPE). The empty
    * string is the fold's no-carry sentinel, so symbols must be
    * non-empty — guaranteed by [[wordVocab]]'s empty-word filter
    * (split of a non-empty word yields non-empty chars/fusions). */
  private[pipeline] def mergeOnceExpr(a: String, b: String,
      c: String = "syms"): String = {
    val A = esc(a); val B = esc(b); val AB = esc(a + b)
    s"""aggregate(`$c`,
       |  named_struct('out', CAST(array() AS ARRAY<STRING>), 'prev', ''),
       |  (acc, x) -> CASE
       |    WHEN acc.prev = '$A' AND x = '$B'
       |      THEN named_struct('out', concat(acc.out, array('$AB')),
       |                        'prev', '')
       |    WHEN acc.prev = ''
       |      THEN named_struct('out', acc.out, 'prev', x)
       |    ELSE named_struct('out', concat(acc.out, array(acc.prev)),
       |                      'prev', x)
       |  END,
       |  acc -> CASE WHEN acc.prev = '' THEN acc.out
       |              ELSE concat(acc.out, array(acc.prev)) END)""".stripMargin
  }

  /** Learn `k` merges over a (word, freq, syms) vocabulary table. Each
    * iteration collects exactly one argmax row to the driver (the
    * convergence-scalar pattern); the vocabulary stays distributed.
    * localCheckpoint keeps the per-iteration plan constant-size. */
  private[pipeline] def learnMerges(
      vocab0: DataFrame, k: Int): Seq[(Int, String, String, Long)] = {
    var vocab = vocab0.localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val best = vocab
        .select(col("freq"), explode(expr(pairExpr)).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("f"))
        .orderBy(desc("f"), col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val r = best(0)
        val (a, b, f) = (r.getString(0), r.getString(1), r.getLong(2))
        out += ((step, a, b, f))
        vocab = vocab
          .withColumn("syms", expr(mergeOnceExpr(a, b)))
          .localCheckpoint()
        step += 1
      }
    }
    out.toSeq
  }

  /** The same K iterations as chained DuckDB CTE blocks (no recursion):
    * pairs → argmax → greedy rewrite via run-alternation → next vocab.
    * [[duckBpeCtes]] exposes just the WITH-chain (ending at
    * words_{k+1}, the fully-merged vocabulary) so qt14 can consume the
    * final vocab state; [[duckBpe]] appends the merge-table select. */
  private def duckBpeCtes(k: Int): String = {
    val blocks = (1 to k).map { i =>
      s"""pairs_$i AS MATERIALIZED (
         |  SELECT w.word, w.freq, CAST(g.i AS INT) AS pos,
         |         w.syms[g.i] AS a, w.syms[g.i + 1] AS b
         |  FROM words_$i w,
         |       UNNEST(generate_series(1, len(w.syms) - 1)) AS g(i)),
         |best_$i AS MATERIALIZED (
         |  SELECT a, b, CAST(SUM(freq) AS BIGINT) AS f
         |  FROM pairs_$i GROUP BY a, b
         |  ORDER BY SUM(freq) DESC, a, b LIMIT 1),
         |cand_$i AS MATERIALIZED (
         |  SELECT p.word, p.pos FROM pairs_$i p
         |  JOIN best_$i b ON p.a = b.a AND p.b = b.b),
         |runs_$i AS MATERIALIZED (
         |  SELECT word, pos,
         |         pos - ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos)
         |           AS run
         |  FROM cand_$i),
         |keep_$i AS MATERIALIZED (
         |  SELECT word, pos FROM (
         |    SELECT word, pos,
         |           ROW_NUMBER() OVER (PARTITION BY word, run ORDER BY pos)
         |             AS rr
         |    FROM runs_$i) z
         |  WHERE rr % 2 = 1),
         |symrows_$i AS MATERIALIZED (
         |  SELECT w.word, w.freq, CAST(g.i AS INT) AS pos, w.syms[g.i] AS sym
         |  FROM words_$i w,
         |       UNNEST(generate_series(1, len(w.syms))) AS g(i)),
         |newrows_$i AS MATERIALIZED (
         |  SELECT s.word, s.freq, s.pos, b.a || b.b AS sym
         |  FROM symrows_$i s
         |  JOIN keep_$i kp ON s.word = kp.word AND s.pos = kp.pos
         |  CROSS JOIN best_$i b
         |  UNION ALL
         |  SELECT s.word, s.freq, s.pos, s.sym
         |  FROM symrows_$i s
         |  WHERE NOT EXISTS (SELECT 1 FROM keep_$i kp
         |    WHERE kp.word = s.word AND kp.pos IN (s.pos, s.pos - 1))),
         |words_${i + 1} AS MATERIALIZED (
         |  SELECT word, freq, list(sym ORDER BY pos) AS syms
         |  FROM newrows_$i GROUP BY word, freq)""".stripMargin
    }.mkString(",\n")
    s"""WITH words_1 AS MATERIALIZED (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
       |         string_split(word, '') AS syms
       |  FROM (SELECT UNNEST(list_filter(string_split(text, ' '),
       |                                  x -> x <> '')) AS word
       |        FROM documents) u
       |  GROUP BY word),
       |$blocks""".stripMargin
  }

  private def duckBpe(k: Int): String = {
    val rows = (1 to k).map { i =>
      s"SELECT $i AS step, a AS pair_left, b AS pair_right, f AS freq FROM best_$i"
    }.mkString("\n  UNION ALL ")
    s"""${duckBpeCtes(k)}
       |SELECT * FROM (
       |  $rows) m ORDER BY step""".stripMargin
  }

  /** BPE ENCODE — segment words by a learned merge list, applied in
    * order (the tokenizer-application step: learn with [[learnMerges]],
    * encode the corpus — or an incoming stream — with the result).
    * Adds `out` (array<string>) next to `wordCol`. Pure chained column
    * expressions (K folds), stateless: applies identically on ingest
    * over a streaming source and in batch. */
  def encode(df: DataFrame, wordCol: String,
      merges: Seq[(String, String)], out: String = "bpe"): DataFrame = {
    val seeded = df.withColumn(out, split(col(wordCol), ""))
    merges.foldLeft(seeded) { case (acc, (a, b)) =>
      acc.withColumn(out, expr(mergeOnceExpr(a, b, out)))
    }
  }

  def all: Seq[Q] = Seq(
    q("qt11_bpe_merges", duckBpe(Steps)) { (s, d) =>
      val merges = learnMerges(wordVocab(t(s, d, "documents")), Steps)
      s.createDataFrame(merges).toDF("step", "pair_left", "pair_right",
          "freq")
        .orderBy("step")
    },

    // Token counting under the LEARNED tokenizer — the measurement that
    // motivates training a BPE at all (how many sequence positions a
    // document costs once merges fuse common fragments; compare qt4's
    // whitespace/regex counts). The corpus-sized work is one explode +
    // one token-keyed equi-join against the ENCODED VOCABULARY (a
    // vocab-sized table — encode runs once per distinct word, never per
    // occurrence) + one partial-aggregated groupBy(doc). The oracle
    // consumes the final vocab state of qt11's unrolled CTE chain, so
    // the relational rewrite and the fold-encode must agree end-to-end.
    q("qt14_bpe_token_count",
      s"""${duckBpeCtes(Steps)},
         |wl AS (SELECT word, CAST(len(syms) AS BIGINT) AS n
         |  FROM words_${Steps + 1}),
         |tok AS (SELECT doc_id, UNNEST(list_filter(string_split(text, ' '),
         |                                           x -> x <> '')) AS w
         |  FROM documents)
         |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(wl.n) AS BIGINT) AS n_bpe
         |FROM tok t JOIN wl ON wl.word = t.w
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents")
      // materialize the word vocabulary ONCE: learnMerges checkpoints
      // its own copy internally, but encode() below consumes this
      // DataFrame too — without the checkpoint the corpus-sized
      // explode+groupBy (the module's declared only-corpus-sized
      // stage) would execute a second time (review r16)
      val vocab = wordVocab(docs).localCheckpoint()
      val merges = learnMerges(vocab, Steps)
        .map(m => (m._2, m._3))
      val wl = encode(vocab.select("word"), "word", merges)
        .select(col("word").as("w"), size(col("bpe")).cast("long").as("n"))
      docs.select(col("doc_id"), explode(expr(
          "filter(split(text, ' '), x -> x <> '')")).as("w"))
        .join(wl, Seq("w"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_words"),
          sum("n").cast("long").as("n_bpe"))
        .orderBy("doc_id")
    })
}
