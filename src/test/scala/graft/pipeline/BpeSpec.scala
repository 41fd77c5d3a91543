package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** BPE merge learning, pinned three ways:
  *  1. `learnMerges` on the real corpus equals an independent driver-side
  *     reference implementation (sequential greedy rewrite, same
  *     tie-break) — no shared code with the engine path.
  *  2. The oracle's RELATIONAL greedy rewrite (runs of consecutive
  *     candidate positions, keep odd ranks) equals the sequential
  *     left-to-right fold on randomized symbol arrays — the equivalence
  *     the DuckDB oracle depends on.
  *  3. The codegen'd `aggregate` fold expression itself rewrites crafted
  *     overlap cases (aaa, abab) exactly like the reference.
  */
class BpeSpec extends SparkSuite {

  /** Reference greedy left-to-right single-merge rewrite. */
  private def mergeSeq(syms: Vector[String], a: String, b: String)
      : Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** The oracle's relational formulation: candidate positions → runs of
    * consecutive indices → keep odd ranks → rebuild. */
  private def mergeRelational(syms: Vector[String], a: String, b: String)
      : Vector[String] = {
    val cand = (0 until syms.length - 1)
      .filter(i => syms(i) == a && syms(i + 1) == b)
    // group into runs of consecutive positions, keep 1st, 3rd, ... of each
    val keep = cand.zipWithIndex
      .groupBy { case (pos, rank) => pos - rank }
      .values.flatMap(run => run.map(_._1).sorted.zipWithIndex
        .collect { case (pos, r) if r % 2 == 0 => pos })
      .toSet
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (keep(i)) { out += (a + b); i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def referenceBpe(vocab: Map[String, Long], k: Int)
      : Seq[(Int, String, String, Long)] = {
    var words = vocab.map { case (w, f) =>
      (w.split("").toVector, f)
    }.toVector
    val out = Vector.newBuilder[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), f) = counts.toSeq
          .minBy { case ((a, b), f) => (-f, a, b) }
        out += ((step, a, b, f))
        words = words.map { case (syms, fr) => (mergeSeq(syms, a, b), fr) }
        step += 1
      }
    }
    out.result()
  }

  test("qt11 learnMerges equals the driver-side reference on the corpus") {
    val vocab = graft.Engine.table(spark, sf, "documents")
      .select(explode(expr("filter(split(text, ' '), x -> x <> '')"))
        .as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceBpe(vocab, 6)
    val got = run("qt11_bpe_merges").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  test("relational run-alternation rewrite == sequential greedy fold " +
      "(the oracle equivalence) on random arrays") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val n = 1 + rnd.nextInt(10)
      val syms = Vector.fill(n)(("a" + rnd.nextInt(3)).intern())
      val a = "a" + rnd.nextInt(3); val b = "a" + rnd.nextInt(3)
      assert(mergeRelational(syms, a, b) == mergeSeq(syms, a, b),
        s"diverged on $syms merging ($a,$b)")
    }
  }

  test("encode applies learned merges in order (the tokenizer step)") {
    import spark.implicits._
    val vocab = Map("lower" -> 2L, "lowest" -> 1L, "newer" -> 3L,
      "wider" -> 1L, "new" -> 2L)
    val merges = referenceBpe(vocab, 4).map(m => (m._2, m._3))
    val words = vocab.keys.toSeq.sorted
    val got = BpeQueries.encode(words.toDF("word"), "word", merges)
      .select("word", "bpe").as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      val expected = merges.foldLeft(w.split("").toVector) {
        case (syms, (a, b)) => mergeSeq(syms, a, b)
      }
      assert(got(w) == expected, s"encode diverged on '$w'")
    }
    // the encode really fuses something (greedy merges applied)
    assert(words.exists(w => got(w).length < w.length))
  }

  test("qt14 token counts under the learned BPE equal the reference") {
    val texts = graft.Engine.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val vocab = texts.flatMap(_._2).groupBy(identity)
      .map { case (w, v) => w -> v.length.toLong }
    val merges = referenceBpe(vocab, 6).map(m => (m._2, m._3))
    val enc = vocab.keys.map { w =>
      w -> merges.foldLeft(w.split("").toVector) {
        case (syms, (a, b)) => mergeSeq(syms, a, b)
      }.length.toLong
    }.toMap
    val expected = texts.map { case (id, ws) =>
      (id, ws.length.toLong, ws.map(enc).sum)
    }.sortBy(_._1).toSeq
    val got = run("qt14_bpe_token_count").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // merging actually compresses: fewer BPE symbols than characters
    val totalChars = texts.map(_._2.map(_.length.toLong).sum).sum
    assert(got.map(_._3).sum < totalChars)
  }

  test("the aggregate-fold expression handles overlap cases exactly") {
    import spark.implicits._
    val cases = Seq(
      ("aaa", "a", "a"), ("aaaa", "a", "a"), ("abab", "a", "b"),
      ("aab", "a", "b"), ("ba", "a", "b"), ("a", "a", "a"),
      ("ababa", "b", "a"), ("xaay", "a", "a"))
    cases.foreach { case (w, a, b) =>
      val got = Seq(w).toDF("word")
        .withColumn("syms", split(col("word"), ""))
        .withColumn("merged", expr(BpeQueries.mergeOnceExpr(a, b)))
        .select("merged").as[Seq[String]].head().toVector
      assert(got == mergeSeq(w.split("").toVector, a, b),
        s"fold diverged on '$w' merging ($a,$b)")
    }
  }

  test("empty words from consecutive/leading spaces never enter the " +
      "vocabulary (the fold's '' sentinel precondition)") {
    import spark.implicits._
    val messy = Seq((1L, "  a  bb   a"), (2L, "bb  a ")).toDF("doc_id", "text")
    val vocab = BpeQueries.wordVocab(messy)
      .select("word").as[String].collect().toSet
    assert(vocab == Set("a", "bb")) // no "" row despite the runs of spaces
    // and the learned-merge path stays consistent with a clean corpus
    val clean = Seq((1L, "a bb a"), (2L, "bb a")).toDF("doc_id", "text")
    val m1 = BpeQueries.learnMerges(BpeQueries.wordVocab(messy), 2)
    val m2 = BpeQueries.learnMerges(BpeQueries.wordVocab(clean), 2)
    assert(m1 == m2 && m1.nonEmpty)
  }
}
