package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The EXACT gate + the gate-quartet composition (round 18
  * continuation). Pins, for [[DedupQueries.exactGate]]: the normalized
  * fingerprint matches across case/whitespace variants (the qp1/qp15
  * normalization), novel docs pass, the artifact lifecycle rides the
  * shared writeEpoch, and the watermark contract rejects by name. For
  * [[DedupQueries.ingestDecision]]: the COMPOSITION LAW (every verdict
  * row equals the severity fold of the four individually-run gates —
  * the wiring cannot silently drop or re-rank a leg), deterministic
  * verdicts for a verbatim copy (fires exact+near+span, precedence
  * picks 'exact'), a semantic-only duplicate, a novel doc, and the
  * batch-only rejection by name.
  *
  * Fixture: 5 corpus docs with fully DISJOINT 12-word vocabularies, so
  * every cross-doc text-gate hit is constructed, never statistical
  * (disjoint shingles → disjoint bands/prints; every print df = 1).
  * Embeddings use the SemanticGateSpec geometry: axis c carries 1.0, a
  * per-doc unique axis carries 0.5, so a scaled copy scores cosine 1.0
  * and everything else ≤ 0.8 < the 0.95 default tau.
  */
class IngestDecisionSpec extends SparkSuite {
  import spark.implicits._

  private val Dim = 16

  private def vec(cluster: Int, unique: Int, scale: Float): Seq[Float] = {
    val a = Array.fill(Dim)(0.0f)
    a(cluster) = 1.0f * scale
    a(4 + unique) = 0.5f * scale
    a.toSeq
  }

  private def words(doc: Int): Seq[String] =
    (0 until 12).map(w => s"w${w}x$doc")

  private val corpusText: Seq[(Long, String)] =
    (0 until 5).map(i => (i.toLong, words(i).mkString(" ")))
  private val corpusVecsRaw: Seq[(Long, Seq[Float])] =
    (0 until 5).map(i => (i.toLong, vec(i % 4, i, 1.0f)))
  private val novelDir: Seq[Float] =
    Array.fill(Dim)(0.0f).updated(0, -1.0f).toSeq

  private def corpusDf = corpusText.toDF("doc_id", "text")

  test("exactGate: normalization-insensitive hit, novel miss, artifact " +
      "round-trip, streaming watermark rejection") {
    val root = java.nio.file.Files.createTempDirectory("corpus_fps")
      .resolve("fps").toString
    DedupQueries.appendCorpusFps(corpusDf, root, 0L)
    val art = DedupQueries.readCorpusFps(spark, root)
    val direct = DedupQueries.docFps(corpusDf)
    assert(art.count() == direct.count() &&
      art.except(direct).isEmpty && direct.except(art).isEmpty)

    // a case + whitespace variant of doc 2 normalizes to the same
    // fingerprint; a novel doc emits no pair
    val variant = corpusText(2)._2.toUpperCase.replace(" ", "  \t")
    val incoming = Seq(
      (100L, variant),
      (101L, "totally novel words nothing shared at all")).toDF("doc_id", "text")
    val got = DedupQueries.exactGate(incoming, art)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 2L)),
      s"exactGate must flag the normalized variant only: $got")

    // corpus-INTERNAL duplicates: when the artifact holds two copies of
    // a text, an incoming copy pairs with BOTH (n_exact counts matches,
    // dup_of routes to the lowest id) — the n > 1 path of the verdict
    // reduction
    val artDup = art.union(DedupQueries.docFps(
      Seq((50L, corpusText(2)._2)).toDF("doc_id", "text")))
    val both = DedupQueries.exactGate(incoming, artDup)
      .as[(Long, Long)].collect().toSet
    assert(both == Set((100L, 2L), (100L, 50L)),
      s"an incoming copy must pair with every corpus copy: $both")
    val decDup = DedupQueries.ingestDecision(incoming, artDup,
        DedupQueries.docBands(corpusDf), DedupQueries.docPrints(corpusDf))
      .where(col("doc_id") === 100L)
      .select("n_exact", "dup_of").as[(Long, Option[Long])].collect().head
    assert(decDup == ((2L, Some(2L))),
      s"n_exact must count both copies and dup_of take the lowest: $decDup")

    // stream-static: same verdicts, and the no-watermark call is
    // rejected by name (the shared gatePairs contract)
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = DedupQueries.exactGate(
        input.toDF().toDF("doc_id", "text", "ts")
          .withWatermark("ts", "10 seconds"),
        art, eventTimeCol = Some("ts"))
      .writeStream.outputMode("append")
      .format("memory").queryName("exact_stream").start()
    try {
      input.addData((100L, variant, t0),
        (101L, "totally novel words nothing shared at all", t0))
      q.processAllAvailable()
      val streamed = spark.table("exact_stream")
        .as[(Long, Long)].collect().toSet
      assert(streamed == got)
      val e = intercept[IllegalArgumentException] {
        DedupQueries.exactGate(
          input.toDF().toDF("doc_id", "text", "ts"), art)
      }
      assert(e.getMessage.contains("watermark") &&
        e.getMessage.contains("exactGate"))
    } finally q.stop()
  }

  test("ingestDecision: deterministic verdicts, severity precedence, " +
      "and the composition law against the individually-run gates") {
    val cents = SimilarityOps.ivfIndex(spark,
      corpusVecsRaw.toDF("doc_id", "embedding"), "doc_id", "embedding",
      k = 2).centroids
    val cFps = DedupQueries.docFps(corpusDf).cache()
    val cBands = DedupQueries.docBands(corpusDf).cache()
    val cPrints = DedupQueries.docPrints(corpusDf).cache()
    val cVecs = SimilarityOps.docVectors(
      corpusVecsRaw.toDF("doc_id", "embedding"), cents).cache()
    try {
      val incoming = Seq(
        // verbatim copy of doc 3: fires exact AND near (identical
        // signature → all 4 bands) AND span (identical prints, df 1)
        (100L, corpusText(3)._2, novelDir),
        // novel text, novel direction: accept
        (101L, "totally novel words nothing shared here at all", novelDir),
        // a 7-token run lifted from doc 4 inside otherwise-novel words:
        // the winnowing guarantee (≥ 6 shared tokens) makes span fire
        (102L, ("alpha beta " + words(4).slice(3, 10).mkString(" ")
          + " gamma delta"), novelDir),
        // novel text, embedding = 2.5× doc 2's vector: semantic only
        (103L, "fresh sentence with yet more unshared vocabulary",
          corpusVecsRaw(2)._2.map(_ * 2.5f)))
        .toDF("doc_id", "text", "embedding")

      val dec = DedupQueries.ingestDecision(incoming, cFps, cBands,
          cPrints, vectors = Some((cVecs, cents)))
        .as[(Long, Long, Long, Long, Long, String, Option[Long])]
        .collect().map(r => r._1 -> r).toMap
      assert(dec.keySet == Set(100L, 101L, 102L, 103L))

      // deterministic rows
      val r100 = dec(100L)
      assert(r100._2 == 1L && r100._3 >= 1L && r100._4 >= 1L &&
        r100._6 == "exact" && r100._7 == Some(3L),
        s"verbatim copy must fire exact+near+span with 'exact' winning: $r100")
      assert(dec(101L) == ((101L, 0L, 0L, 0L, 0L, "accept", None)))
      val r102 = dec(102L)
      assert(r102._4 >= 1L && r102._2 == 0L && r102._5 == 0L,
        s"span leg must fire on the lifted run: $r102")
      assert(dec(103L) == ((103L, 0L, 0L, 0L, 1L, "semantic", Some(2L))))

      // the composition law: every row equals the severity fold of the
      // four individually-run gates (counts, verdict AND dup_of)
      def agg(pairs: Array[(Long, Long)]): Map[Long, (Long, Long)] =
        pairs.groupBy(_._1).map { case (k, v) =>
          k -> (v.length.toLong, v.map(_._2).min) }
      val legs = Seq(
        "exact" -> agg(DedupQueries.exactGate(incoming, cFps)
          .as[(Long, Long)].collect()),
        "near" -> agg(DedupQueries.nearDupGate(incoming, cBands)
          .as[(Long, Long)].collect()),
        "span" -> agg(DedupQueries.winnowGate(incoming, cPrints)
          .as[(Long, Long)].collect()),
        "semantic" -> agg(SimilarityOps.semanticGate(incoming, cVecs,
          cents).as[(Long, Long)].collect()))
      assert(legs.map(_._1) == DedupQueries.GateSeverity)
      for (id <- dec.keySet) {
        val n = legs.map { case (g, m) =>
          g -> m.get(id).map(_._1).getOrElse(0L) }.toMap
        val expVerdict = DedupQueries.GateSeverity
          .find(g => n(g) > 0).getOrElse("accept")
        val expOf = DedupQueries.GateSeverity.find(g => n(g) > 0)
          .map(g => legs.toMap.apply(g)(id)._2)
        val row = dec(id)
        assert((row._2, row._3, row._4, row._5) ==
          ((n("exact"), n("near"), n("span"), n("semantic"))),
          s"composition law (counts) broken for $id: $row vs $n")
        assert(row._6 == expVerdict && row._7 == expOf,
          s"composition law (verdict) broken for $id: $row vs $expVerdict/$expOf")
      }

      // without a vector leg the schema is stable and the semantic-only
      // doc falls through to accept
      val textOnly = DedupQueries.ingestDecision(incoming, cFps, cBands,
          cPrints)
        .as[(Long, Long, Long, Long, Long, String, Option[Long])]
        .collect().map(r => r._1 -> r).toMap
      assert(textOnly(103L) == ((103L, 0L, 0L, 0L, 0L, "accept", None)))
      assert(textOnly(100L)._6 == "exact")

      // batch-only: a streaming frame is rejected by name
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val e = intercept[IllegalArgumentException] {
        DedupQueries.ingestDecision(input.toDF().toDF("doc_id", "text"),
          cFps, cBands, cPrints)
      }
      assert(e.getMessage.contains("ingestDecision"))
    } finally spark.catalog.clearCache()
  }
}
