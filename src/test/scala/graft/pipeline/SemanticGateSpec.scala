package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The SEMANTIC ingest gate + corpus vector artifact (round 18) — the
  * embedding member of the gate family beside the exact Bloom gates,
  * nearDupGate (bands) and winnowGate (prints). Pins: the gate flags an
  * exact re-embedding REGARDLESS of magnitude (cosine semantics ride on
  * the unit normalization), a novel direction passes, zero-norm vectors
  * neither match nor get matched, stream == batch, the watermark
  * contract rejects by name, and the artifact lifecycle (append → read
  * → gate-after-append, idempotent epoch replay) matches the band/print
  * families through the shared writeEpoch.
  *
  * Fixture: 4 direction clusters in 44 dims — axis c ∈ 0..3 carries
  * 1.0, a PER-VECTOR unique axis carries 0.5, so within-cluster cosine
  * is exactly 1/1.25 = 0.8 < 0.95 while a copy scores 1.0: at the
  * default tau6 = 950000 a copy hits EXACTLY its template, no cluster
  * welding, no hash assumptions. Every 5th vector is 10×-scaled (the
  * r18 mixed-magnitude IVF lesson: bucketing must be norm-invariant).
  */
class SemanticGateSpec extends SparkSuite {
  import spark.implicits._

  private val Dim = 44

  private def vec(cluster: Int, unique: Int, scale: Float): Seq[Float] = {
    val a = Array.fill(Dim)(0.0f)
    a(cluster) = 1.0f * scale
    a(4 + unique) = 0.5f * scale
    a.toSeq
  }

  private val corpus: Seq[(Long, Seq[Float])] = (0 until 40).map { i =>
    (i.toLong, vec(i % 4, i, if (i % 5 == 0) 10.0f else 1.0f))
  }
  private val novelDir: Seq[Float] =
    Array.fill(Dim)(0.0f).updated(0, -1.0f).updated(1, -1.0f).toSeq
  private val zeroVec: Seq[Float] = Array.fill(Dim)(0.0f).toSeq

  private def corpusDf = corpus.toDF("doc_id", "embedding")

  private def fitCentroids(): Array[(Int, Array[Double])] =
    SimilarityOps.ivfIndex(spark, corpusDf, "doc_id", "embedding", k = 4)
      .centroids

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).resolve("vecs").toString

  test("semanticGate: a copy hits exactly its template at any magnitude; " +
      "novel directions and zero vectors pass") {
    val cents = fitCentroids()
    val corpusVecs = SimilarityOps.docVectors(corpusDf, cents).cache()
    try {
      // doc 7's exact embedding, 3.7×-scaled: cosine is 1.0 to the
      // template and 0.8 to the rest of its cluster — only the
      // template clears tau6 = 950000
      val incoming = Seq(
        (1000L, corpus(7)._2.map(_ * 3.7f)),
        (1001L, novelDir),
        (1002L, zeroVec)).toDF("doc_id", "embedding")
      val got = SimilarityOps.semanticGate(incoming, corpusVecs, cents)
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1000L, 7L)),
        s"scaled copy must hit exactly its template: $got")
      // lowering the threshold under the within-cluster cosine (0.8)
      // welds the cluster: the probe really scans the bucket members
      val loose = SimilarityOps.semanticGate(incoming, corpusVecs, cents,
          tau6 = 790000L)
        .as[(Long, Long)].collect().toSet
      assert(loose.filter(_._1 == 1000L).size > 1)
      assert(!loose.exists(p => p._1 == 1001L || p._1 == 1002L))
      // zero-norm corpus vectors are dropped AT THE ARTIFACT: a zero
      // row contributes nothing for any incoming doc to match
      val withZero = (corpus :+ (99L, zeroVec)).toDF("doc_id", "embedding")
      assert(SimilarityOps.docVectors(withZero, cents)
        .where(col("doc_id") === 99L).isEmpty)
    } finally spark.catalog.clearCache()
  }

  test("semanticGate runs stream-static (append); stream == batch; " +
      "a streaming call without the watermark contract is rejected by name") {
    implicit val sqlCtx = spark.sqlContext
    val cents = fitCentroids()
    val corpusVecs = SimilarityOps.docVectors(corpusDf, cents).cache()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val incoming = Seq(
      (1000L, corpus(7)._2.map(_ * 3.7f), t0),
      (1001L, novelDir, t0),
      (1002L, zeroVec, t0))
    val input = MemoryStream[(Long, Seq[Float], java.sql.Timestamp)]
    val q = SimilarityOps.semanticGate(
        input.toDF().toDF("doc_id", "embedding", "ts")
          .withWatermark("ts", "10 seconds"),
        corpusVecs, cents, eventTimeCol = Some("ts"))
      .writeStream.outputMode("append")
      .format("memory").queryName("sem_stream").start()
    try {
      input.addData(incoming.head)
      q.processAllAvailable()
      input.addData(incoming.tail: _*)
      q.processAllAvailable()
      val got = spark.table("sem_stream").as[(Long, Long)].collect().toSet
      val expected = SimilarityOps.semanticGate(
          incoming.map(r => (r._1, r._2)).toDF("doc_id", "embedding"),
          corpusVecs, cents)
        .as[(Long, Long)].collect().toSet
      assert(got == expected)
      assert(got == Set((1000L, 7L)))
      val e = intercept[IllegalArgumentException] {
        SimilarityOps.semanticGate(
          input.toDF().toDF("doc_id", "embedding", "ts"), corpusVecs, cents)
      }
      assert(e.getMessage.contains("watermark"))
    } finally { q.stop(); spark.catalog.clearCache() }
  }

  test("vector artifact lifecycle: append, read, gate-after-append, " +
      "idempotent epoch replay") {
    val cents = fitCentroids()
    val root = tmpRoot("corpus_vecs")
    SimilarityOps.appendCorpusVectors(corpusDf, root, 0L, cents)
    val art = SimilarityOps.readCorpusVectors(spark, root)
    val direct = SimilarityOps.docVectors(corpusDf, cents)
    assert(art.count() == direct.count() &&
      art.except(direct).isEmpty && direct.except(art).isEmpty)

    // day 1: a novel direction passes the gate and is ACCEPTED
    val novel = Seq((1000L, novelDir)).toDF("doc_id", "embedding")
    assert(SimilarityOps.semanticGate(novel,
      SimilarityOps.readCorpusVectors(spark, root), cents).isEmpty)
    SimilarityOps.appendCorpusVectors(novel, root, 1L, cents)

    // day 2: an exact copy of yesterday's admission is flagged
    val copy = Seq((2000L, novelDir.map(_ * 0.25f))).toDF("doc_id", "embedding")
    val day2 = SimilarityOps.semanticGate(copy,
        SimilarityOps.readCorpusVectors(spark, root), cents)
      .as[(Long, Long)].collect().toSet
    assert(day2 == Set((2000L, 1000L)),
      s"gate-after-append must flag the just-accepted doc: $day2")

    // epoch replay: commit-once (same count after a replay; a
    // DIVERGENT replay of a committed epoch is skipped)
    val before = SimilarityOps.readCorpusVectors(spark, root).count()
    SimilarityOps.appendCorpusVectors(novel, root, 1L, cents)
    assert(SimilarityOps.readCorpusVectors(spark, root).count() == before)
    SimilarityOps.appendCorpusVectors(
      corpusDf.limit(3), root, 1L, cents)
    assert(SimilarityOps.readCorpusVectors(spark, root).count() == before,
      "a replay of a committed epoch must be a no-op")
  }

  test("streaming vector appender lands micro-batches in epochId " +
      "partitions; batch frames rejected by name") {
    implicit val sqlCtx = spark.sqlContext
    val cents = fitCentroids()
    val root = tmpRoot("corpus_vecs_stream")
    val ckpt = java.nio.file.Files
      .createTempDirectory("vecs_ckpt").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val q = SimilarityOps.corpusVectorAppender(
        input.toDF().toDF("doc_id", "embedding"), root, cents)
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData(corpus.take(20): _*)
      q.processAllAvailable()
      input.addData(corpus.drop(20): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = SimilarityOps.readCorpusVectors(spark, root)
    val expected = SimilarityOps.docVectors(corpusDf, cents)
    assert(got.count() == expected.count())
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
    val epochs = spark.read.parquet(root).select("epoch")
      .distinct().count()
    assert(epochs >= 2, s"expected >= 2 epoch partitions, got $epochs")
    // the artifact a stream built feeds the same gate
    val hits = SimilarityOps.semanticGate(
        Seq((9000L, corpus(3)._2)).toDF("doc_id", "embedding"),
        SimilarityOps.readCorpusVectors(spark, root), cents)
      .as[(Long, Long)].collect().toSet
    assert(hits == Set((9000L, 3L)))
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.corpusVectorAppender(corpusDf, root, cents)
    }
    assert(e.getMessage.contains("appendCorpusVectors"))
  }
}
