package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The full curation chain composed end-to-end from library pieces —
  * quality filter → exact dedup → deterministic sample → sequence
  * packing — proving the operators compose as DataFrames (each stage's
  * output is the next stage's input) and that the whole chain is
  * DETERMINISTIC: two independent runs produce identical results, the
  * reproducibility contract every stage advertises individually. */
class PipelineEndToEndSpec extends SparkSuite {

  private def chain() = {
    val docs = graft.Engine.table(spark, sf, "documents")
    // 1. quality gate: drop ultra-short docs (the qt2-style length signal)
    val quality = docs.where(size(split(col("text"), " ")) >= 10)
    // 2. exact dedup: min-doc_id survivor per normalized fingerprint
    val survivors = quality
      .withColumn("fp",
        md5(lower(regexp_replace(col("text"), "\\s+", " "))))
      .withColumn("keep",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("fp").orderBy("doc_id")))
      .where(col("keep") === 1).drop("fp", "keep")
    // 3. deterministic stratified sample (reproducible, coordinator-free)
    val sampled = survivors.where(SamplingOps.stratifiedKeep(
      col("doc_id"), col("lang"), Map("en" -> "e666"), default = "c000"))
    // 4. pack the sampled corpus into training sequences
    PackingQueries.packedOffsets(sampled)
  }

  test("curate→dedup→sample→pack composes and is run-to-run identical") {
    val a = chain().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = chain().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b, "chain is not deterministic across runs")
    assert(a.nonEmpty)
    // offsets are a permutation-free exact prefix tiling of the total
    val total = a.map(_._2).sum
    assert(a.map(_._3).distinct.length == a.length, "duplicate offsets")
    val byOffset = a.sortBy(_._3)
    byOffset.sliding(2).filter(_.length == 2).foreach { w =>
      assert(w(0)._3 + w(0)._2 == w(1)._3, "offset gap in packed chain")
    }
    assert(byOffset.last._3 + byOffset.last._2 == total)
    // every stage really filtered something (the chain is not vacuous)
    val nDocs = graft.Engine.table(spark, sf, "documents").count()
    assert(a.length < nDocs)
  }

  test("uniformKeep boundary rates: 1000 permil keeps ALL, 0 keeps none, mid is exact") {
    // regression (review r16): permil=1000's threshold value 65536
    // rendered as the FIVE-char string "10000", which lexicographically
    // sits below most 4-char buckets — keep-everything silently kept
    // ~6%. The helper now short-circuits the full rate.
    import org.apache.spark.sql.functions.col
    val docs = graft.Engine.table(spark, sf, "documents")
    val n = docs.count()
    assert(docs.where(
      SamplingOps.uniformKeep(col("doc_id"), 1000)).count() == n)
    assert(docs.where(
      SamplingOps.uniformKeep(col("doc_id"), 0)).count() == 0L)
    // a mid rate matches the exact md5-threshold recompute
    import spark.implicits._
    val ids = docs.select($"doc_id").as[Long].collect()
    def md5hex(s: String) = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val th = f"${(250 * 65536) / 1000}%04x"
    val expected = ids.count(id =>
      md5hex(s"samp|$id").substring(0, 4) < th).toLong
    assert(docs.where(
      SamplingOps.uniformKeep(col("doc_id"), 250)).count() == expected)
  }

  test("targetKeep: constant-size sample, exact threshold recompute, floor regimes") {
    // ADVICE r17: the permil scheme's 1-permil floor grew the fit
    // sample as n/1000 forever; targetKeep's 8-hex threshold keeps the
    // sample ~target at any n. Verified against an exact driver-side
    // md5 recompute on real ids.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = graft.Engine.table(spark, sf, "documents")
    val n = docs.count()
    // n <= target short-circuits to keep-everything
    assert(docs.where(
      SamplingOps.targetKeep(col("doc_id"), n, n)).count() == n)
    // a thresholded rate matches the exact 8-hex md5 recompute
    val target = n / 4
    val ids = docs.select($"doc_id").as[Long].collect()
    def md5hex(s: String) = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val th = SamplingOps.targetThreshold(n, target)
    val expected = ids.count(id =>
      md5hex(s"samp|$id").substring(0, 8) < th).toLong
    val got = docs.where(
      SamplingOps.targetKeep(col("doc_id"), n, target)).count()
    assert(got == expected)
    // the rate lands near target (binomial tolerance on a small corpus)
    assert(math.abs(got - target) <= math.max(12L, target / 2),
      s"got $got for target $target of $n")
    // threshold regimes, asserted on the formula itself: proportional
    // in the normal band; clamped to the 8-hex minimum '00000001'
    // (never zero — the qp30 lesson) in the over-granularity regime;
    // capped at the hash-space maximum just below keep-all
    assert(SamplingOps.targetThreshold(1L << 20, 1L << 18) == "40000000")
    assert(SamplingOps.targetThreshold(1L << 40, 1L) == "00000001")
    assert(SamplingOps.targetThreshold(1L << 40, (1L << 40) - 1)
      == "ffffffff")
  }
}
