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
         |    (0.4 * least(nc / 500.0, 1.0)
         |     + 0.3 * least((ns / nt) * 5.0, 1.0)
         |     + 0.3 * least(((nc - (nt - 1.0)) / nt) / 8.0, 1.0)) AS q
         |  FROM scored)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(CAST(nt AS DECIMAL(30,8))) AS DOUBLE) AS total_tokens,
         |  ((CAST(SUM(CAST(floor(q * 1000000.0) AS BIGINT)) AS DOUBLE)
         |      / COUNT(*)) / 1000000.0) AS avg_quality
         |FROM quality WHERE q >= 0.5
         |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val docs = t(s, d, "documents")
      val bands = DedupQueries.withShingles(docs)
        .select(col("doc_id"),
          posexplode(expr("graft_minhash_bands(sh)")).as(Seq("band", "bv")))
        .where(col("bv") =!= "")
        .cache()
      val drops = bands.as("x")
        .join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bv") === col("y.bv")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("y.doc_id").as("doc_id"))
        .distinct()
      val scored = docs
        .join(drops, Seq("doc_id"), "left_anti")
        .withColumn("tk", split(col("text"), " "))
        .withColumn("nc", length(col("text")).cast("double"))
        .withColumn("nt", size(col("tk")).cast("double"))
        .withColumn("ns", expr(
          "size(filter(tk, w -> w IN ('the', 'a', 'of', 'and', 'in')))")
          .cast("double"))
      val quality = scored.withColumn("q",
        lit(0.4) * least(col("nc") / 500.0, lit(1.0))
          + lit(0.3) * least((col("ns") / col("nt")) * 5.0, lit(1.0))
          + lit(0.3) * least(((col("nc") - (col("nt") - 1.0)) / col("nt")) / 8.0,
            lit(1.0)))
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
      val grams = t(s, d, "documents")
        .selectExpr("doc_id", "filter(split(text, ' '), x -> x <> '') AS ws")
        .where("size(ws) >= 3")
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ws) - 3), i -> " +
            "concat(ws[i], ' ', ws[i + 1], ' ', ws[i + 2]))")).as("g"))
      val bench = grams.where(col("doc_id") % 97 === 0)
        .select(col("g")).distinct()
      grams.where(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "g")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("g")).as("n_hits"))
        .selectExpr("doc_id", "n_hits", "n_hits >= 2 AS contaminated")
        .orderBy("doc_id")
    }
  )
}
