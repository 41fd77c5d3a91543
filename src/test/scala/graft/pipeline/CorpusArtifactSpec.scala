package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The corpus band-artifact LIFECYCLE (VERDICT r17 #1): docBands
  * computes, appendCorpusBands writes an epoch partition, readCorpusBands
  * + nearDupGate consume — so a doc accepted today is screened against
  * TOMORROW. These specs pin the three contract points: gate-after-append
  * flags a just-accepted doc as corpus, an epoch replay is idempotent
  * (overwrite-self, never duplicate), and the streaming appender lands
  * micro-batches in their epochId partitions through foreachBatch.
  */
class CorpusArtifactSpec extends SparkSuite {
  import spark.implicits._

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).resolve("bands").toString

  private val corpus = (0L until 30L).map(i =>
    (i, s"template alpha bravo charlie delta echo variant$i " +
      "foxtrot golf hotel india"))

  test("gate-after-append: a doc accepted in epoch N is corpus for epoch N+1") {
    val root = tmpRoot("corpus_bands")
    DedupQueries.appendCorpusBands(corpus.toDF("doc_id", "text"), root, 0L)

    // day 1: a genuinely novel doc passes the gate (no candidate pair)
    val novel = Seq((1000L,
      "completely different words about unrelated topics entirely here"))
    val day1 = DedupQueries.nearDupGate(novel.toDF("doc_id", "text"),
      DedupQueries.readCorpusBands(spark, root))
    assert(day1.isEmpty, "novel doc must not match the day-1 corpus")

    // ...so it is ACCEPTED: its bands append as the next epoch
    DedupQueries.appendCorpusBands(novel.toDF("doc_id", "text"), root, 1L)

    // day 2: an exact copy of yesterday's admission is now flagged —
    // the whole point of the write path
    val copy = Seq((2000L, novel.head._2))
    val day2 = DedupQueries.nearDupGate(copy.toDF("doc_id", "text"),
      DedupQueries.readCorpusBands(spark, root))
      .as[(Long, Long)].collect().toSet
    assert(day2.contains((2000L, 1000L)),
      s"gate-after-append must flag the just-accepted doc: $day2")
    // and the original corpus is still screened through the same read
    val copy7 = Seq((3000L, corpus(7)._2))
    val hits7 = DedupQueries.nearDupGate(copy7.toDF("doc_id", "text"),
      DedupQueries.readCorpusBands(spark, root))
      .as[(Long, Long)].collect().toSet
    assert(hits7.contains((3000L, 7L)))
  }

  test("epoch replay is idempotent: a retried append overwrites itself") {
    val root = tmpRoot("corpus_bands_idem")
    DedupQueries.appendCorpusBands(corpus.toDF("doc_id", "text"), root, 0L)
    val inc = corpus.take(5).map { case (i, t) => (i + 500L, t) }
    DedupQueries.appendCorpusBands(inc.toDF("doc_id", "text"), root, 1L)
    val before = DedupQueries.readCorpusBands(spark, root).count()
    // the at-least-once replay: same epoch, same data, written again
    DedupQueries.appendCorpusBands(inc.toDF("doc_id", "text"), root, 1L)
    val after = DedupQueries.readCorpusBands(spark, root).count()
    assert(before == after,
      s"epoch-1 replay duplicated rows: $before -> $after")
    // the artifact equals the one-shot computation over the union
    val expected = DedupQueries.docBands(
      (corpus ++ inc).toDF("doc_id", "text")).count()
    assert(after == expected)
    // commit-once, sharpened (review r18): a committed epoch is
    // IMMUTABLE — a replay carrying different rows is skipped, so
    // readers can never observe a committed epoch's rows vanish
    // during a delete-then-write rewrite
    val other = corpus.take(3).map { case (i, t) => (i + 900L, t) }
    DedupQueries.appendCorpusBands(other.toDF("doc_id", "text"), root, 1L)
    assert(DedupQueries.readCorpusBands(spark, root).count() == after,
      "a replay of a committed epoch must be a no-op")
    // ...while a crashed FIRST attempt (files but no _SUCCESS marker)
    // is redone on retry instead of left permanently in place
    val stale = new java.io.File(s"$root/epoch=2")
    assert(stale.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/epoch=2/part-stale.parquet"),
      Array[Byte](1, 2, 3))
    DedupQueries.appendCorpusBands(other.toDF("doc_id", "text"), root, 2L)
    val withEpoch2 = DedupQueries.readCorpusBands(spark, root).count()
    assert(withEpoch2 == after +
      DedupQueries.docBands(other.toDF("doc_id", "text")).count())
  }

  test("print artifact lifecycle: append, df-capped read view, gate-after-append") {
    // the span family's twin of the band lifecycle: RAW prints append
    // per epoch; the df cap is a READ-time view (df is a corpus-wide
    // property — a print rare today may be boilerplate after the next
    // crawl, so capping at append time would freeze a stale df).
    val root = tmpRoot("corpus_prints")
    val docs = (0L until 20L).map(i =>
      (i, s"alpha bravo charlie u${i}a u${i}b u${i}c u${i}d u${i}e " +
        "golf hotel india"))
    DedupQueries.appendCorpusPrints(docs.toDF("doc_id", "text"), root, 0L)
    val raw = DedupQueries.readCorpusPrints(spark, root)
    // raw artifact == direct computation
    val direct = DedupQueries.docPrints(docs.toDF("doc_id", "text"))
    assert(raw.count() == direct.count() &&
      raw.except(direct).isEmpty && direct.except(raw).isEmpty)
    // the capped view equals a driver-side df filter of the raw table
    val dfOf = direct.as[(Long, String)].collect()
      .groupBy(_._2).map { case (fp, v) => fp -> v.length }
    val keptDriver = direct.as[(Long, String)].collect()
      .filter(r => dfOf(r._2) <= 1).toSet
    val keptView = DedupQueries.rareCorpusPrints(raw, maxDf = 1)
      .select("doc_id", "fp").as[(Long, String)].collect().toSet
    assert(keptView == keptDriver && keptView.nonEmpty)
    // idempotent epoch replay + gate-after-append, as with bands
    val novel = Seq((500L,
      "completely new sentence with words v1 v2 v3 v4 v5 end cap tail"))
    DedupQueries.appendCorpusPrints(novel.toDF("doc_id", "text"), root, 1L)
    DedupQueries.appendCorpusPrints(novel.toDF("doc_id", "text"), root, 1L)
    val after = DedupQueries.readCorpusPrints(spark, root)
    assert(after.count() == DedupQueries.docPrints(
      (docs ++ novel).toDF("doc_id", "text")).count())
    val hits = DedupQueries.winnowGate(
        Seq((900L, novel.head._2)).toDF("doc_id", "text"),
        DedupQueries.rareCorpusPrints(after, maxDf = 1), maxDf = 0)
      .as[(Long, Long)].collect().toSet
    assert(hits == Set((900L, 500L)),
      s"gate-after-append must flag the accepted doc's span source: $hits")
    // the RAW artifact through the gate's default internal cap agrees
    // (the accepted doc's prints are df=1 — under any cap they survive)
    val hitsRaw = DedupQueries.winnowGate(
        Seq((900L, novel.head._2)).toDF("doc_id", "text"), after)
      .as[(Long, Long)].collect().toSet
    assert(hitsRaw == Set((900L, 500L)))
  }

  test("streaming appender lands each micro-batch in its epochId partition") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmpRoot("corpus_bands_stream")
    val ckpt = java.nio.file.Files
      .createTempDirectory("bands_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = DedupQueries.corpusBandAppender(
        input.toDF().toDF("doc_id", "text"), root)
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData(corpus.take(15): _*)
      q.processAllAvailable()
      input.addData(corpus.drop(15): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = DedupQueries.readCorpusBands(spark, root)
    val expected = DedupQueries.docBands(corpus.toDF("doc_id", "text"))
    assert(got.count() == expected.count())
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
    // distinct epoch partitions really exist (idempotence key = epochId)
    val epochs = spark.read.parquet(root).select("epoch")
      .distinct().count()
    assert(epochs >= 2, s"expected >= 2 epoch partitions, got $epochs")
    // the artifact a stream built feeds the same gate
    val hits = DedupQueries.nearDupGate(
        Seq((9000L, corpus(3)._2)).toDF("doc_id", "text"),
        DedupQueries.readCorpusBands(spark, root))
      .as[(Long, Long)].collect().toSet
    assert(hits.contains((9000L, 3L)))
    // batch frames are rejected by name from the streaming surface
    val e = intercept[IllegalArgumentException] {
      DedupQueries.corpusBandAppender(corpus.toDF("doc_id", "text"), root)
    }
    assert(e.getMessage.contains("appendCorpusBands"))
  }
}
