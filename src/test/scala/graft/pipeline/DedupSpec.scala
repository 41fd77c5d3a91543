package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat near the river bank"), // near dup of 1
    (4L, "completely different words about spark engines and query planning")
  ).toDF("doc_id", "text")

  test("identical texts get identical minhash signatures") {
    val sig = DedupQueries.withSig(docs)
      .select($"doc_id", concat_ws(",", (0 until 8).map(i => col(s"h$i")): _*).as("sig"))
      .as[(Long, String)].collect().toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(4L))
  }

  test("near-duplicates share most minhash components, unrelated docs few") {
    val rows = DedupQueries.withSig(docs)
      .select($"doc_id", array((0 until 8).map(i => col(s"h$i")): _*))
      .as[(Long, Seq[String])].collect().toMap
    def shared(a: Long, b: Long) = rows(a).zip(rows(b)).count { case (x, y) => x == y }
    assert(shared(1L, 3L) > shared(1L, 4L))
    assert(shared(1L, 2L) == 8)
  }

  test("shingling produces n-2 word trigrams and empty for short docs") {
    val short = Seq((9L, "two words")).toDF("doc_id", "text")
    val sh = DedupQueries.withShingles(docs.union(short))
      .select($"doc_id", size($"sh")).as[(Long, Int)].collect().toMap
    assert(sh(1L) == 13 - 2) // 13 tokens
    assert(sh(9L) == 0)
  }

  test("simhash: identical docs equal, near-dups closer than unrelated") {
    // qp6 logic applied to the tiny fixture via the same expressions
    val withHash = docs
      .withColumn("tk", split($"text", " "))
      .withColumn("hs", expr(
        "transform(tk, w -> CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT))"))
      .withColumn("bitsum", expr(
        """aggregate(hs, transform(sequence(0, 63), b -> 0L),
          |  (acc, h) -> zip_with(acc, sequence(0, 63),
          |    (c, b) -> c + IF((shiftright(h, CAST(b AS INT)) & 1L) = 1L, 1L, -1L)))""".stripMargin))
      .withColumn("simhash", expr(
        """aggregate(zip_with(bitsum, sequence(0, 63),
          |  (c, b) -> IF(c > 0L, shiftleft(1L, CAST(b AS INT)), 0L)),
          |  0L, (a, x) -> a + x)""".stripMargin))
      .select($"doc_id", $"simhash").as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(withHash(a) ^ withHash(b))
    assert(ham(1L, 2L) == 0)
    assert(ham(1L, 3L) < ham(1L, 4L))
  }

  test("qp1 exact dedup groups on sf data are disjoint and cover all docs") {
    val total = graft.Engine.table(spark, sf, "documents").count()
    val got = run("qp1_dedup_exact")
    assert(got.agg(sum($"n_copies")).as[Long].head() == total)
  }

  test("qp4 candidate pairs are ordered and distinct") {
    val pairs = run("qp4_minhash_pairs").as[(Long, Long)].collect()
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
  }
}
