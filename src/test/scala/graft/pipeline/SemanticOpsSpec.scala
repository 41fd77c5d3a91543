package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** qe8 SemDeDup cells, qt12 bigram-LM scoring, qp19 leakage-safe split —
  * each pinned against an exact driver-side recomputation, plus the
  * leakage invariant qp19 exists for. */
class SemanticOpsSpec extends SparkSuite {

  test("qe8 per-cell top pairs equal a driver-side recomputation") {
    val emb = graft.Engine.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val piv = emb.filter(_._1 < 16)
    val cells = emb.map { case (id, v) =>
      val n = dot(v, v)
      val cell = piv.map { case (pid, pv) =>
        (n - 2.0 * dot(v, pv) + dot(pv, pv), pid)
      }.min._2
      (id, v, n, cell)
    }.filter(_._3 > 0)
    val expected = cells.groupBy(_._4).toSeq.flatMap { case (cell, vs) =>
      val pairs = for {
        (a, va, na, _) <- vs; (b, vb, nb, _) <- vs if a < b
      } yield (a, b,
        math.floor(dot(va, vb) / math.sqrt(na * nb) * 1000000.0).toLong)
      pairs.sortBy(p => (-p._3, p._1, p._2)).take(2).zipWithIndex
        .map { case ((a, b, c6), i) => (cell, (i + 1).toLong, a, b, c6) }
    }.sortBy(t => (t._1, t._2))

    val got = run("qe8_semdedup_cells").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }

  test("qt12 document log-probabilities equal a driver-side bigram LM") {
    val texts = graft.Engine.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val bigrams = texts.flatMap { case (id, ws) =>
      ws.sliding(2).filter(_.length == 2).map(p => (id, p(0), p(1)))
    }
    val bc = bigrams.groupBy(t => (t._2, t._3)).map { case (k, v) =>
      k -> v.length.toLong
    }
    val uc = bc.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val vsz = texts.flatMap(_._2).distinct.length.toLong
    val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
      val lps = bs.map { case (_, w1, w2) =>
        math.floor(math.log((bc((w1, w2)) + 1.0) / (uc(w1) + vsz))
          * 1000000.0).toLong
      }
      id -> (bs.length.toLong, lps.sum, lps.sum / bs.length)
    }
    val got = run("qt12_bigram_logprob").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, s, a) = expected(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == s && r.getLong(3) == a,
        s"doc ${r.getLong(0)} scored (${r.getLong(1)},${r.getLong(2)}," +
          s"${r.getLong(3)}) expected ($n,$s,$a)")
    }
  }

  test("qt13 PMI collocations equal a driver-side recomputation") {
    val texts = graft.Engine.table(spark, sf, "documents")
      .select(col("text")).collect()
      .map(_.getString(0).split(" ").filter(_.nonEmpty))
    val wc = texts.flatten.groupBy(identity).map { case (w, v) =>
      w -> v.length.toLong
    }
    val nt = texts.map(_.length.toLong).sum
    val bg = texts.flatMap(_.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))))
    val bc = bg.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val bt = bc.values.sum
    val expected = bc.toSeq.filter(_._2 >= 5).map { case ((w1, w2), cb) =>
      val pmi6 = math.floor(math.log(
        (cb * nt * nt).toDouble / (bt * wc(w1) * wc(w2)).toDouble)
        * 1000000.0).toLong
      (w1, w2, cb, pmi6)
    }.sortBy(t => (-t._4, t._1, t._2)).take(15)
    val got = run("qt13_pmi_collocations").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("qe9 recall@5 equals |ivf-top5 ∩ exact-top5| from first principles") {
    val emb = graft.Engine.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val exact = Seq(42L, 123L, 321L).map { qid =>
      val qv = emb.find(_._1 == qid).get._2
      val qn = dot(qv, qv)
      qid -> emb.filter { case (id, v) => id != qid && dot(v, v) > 0 }
        .map { case (id, v) =>
          (id, math.floor(dot(qv, v) / math.sqrt(qn * dot(v, v))
            * 1000000.0).toLong)
        }.sortBy(t => (-t._2, t._1)).take(5).map(_._1).toSet
    }.toMap
    val ivf = run("qe7_ivf_probe").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, v) => q -> v.map(_._2).toSet }
    val got = run("qe9_ann_recall").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(42L, 123L, 321L))
    got.foreach { case (qid, nHits, pct) =>
      val expected = (exact(qid) & ivf(qid)).size.toLong
      assert(nHits == expected && pct == expected * 20,
        s"recall mismatch for query $qid: $nHits vs $expected")
    }
  }

  test("qe14 filtered ANN: exact leg recomputed driver-side, post ⊆ probed ∩ label") {
    val emb = graft.Engine.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    // exact pre-filtered ground truth from first principles
    val exact = Seq(42L, 123L, 321L).map { qid =>
      val qv = emb.find(_._1 == qid).get._2
      val qn = dot(qv, qv)
      qid -> emb.filter { case (id, v, l) =>
          id != qid && l == 3 && dot(v, v) > 0 }
        .map { case (id, v, _) =>
          (id, math.floor(dot(qv, v) / math.sqrt(qn * dot(v, v))
            * 1000000.0).toLong)
        }.sortBy(t => (-t._2, t._1)).take(5).map(_._1).toSet
    }.toMap
    // recompute the POST leg from first principles over the SAME
    // candidate universe: every vector sharing a probed cell with the
    // query (the qe14 cand set — nprobe=2 over the vec_id<8 pivots),
    // label-filtered, cosine re-ranked, top-5. n_post and n_hits must
    // match exactly — a dropped label filter, wrong cell join, or
    // changed nprobe all break this
    def d2(a: Array[Float], b: Array[Float]): Double =
      dot(a, a) - 2.0 * dot(a, b) + dot(b, b)
    val pivots = emb.filter(_._1 < 8).map(t => (t._1, t._2)).toSeq
    def cellOf(v: Array[Float]): Long =
      pivots.map { case (pid, pv) => (d2(v, pv), pid) }.min._2
    val cellIndex = emb.map(t => t._1 -> cellOf(t._2)).toMap
    val postExp = Seq(42L, 123L, 321L).map { qid =>
      val qv = emb.find(_._1 == qid).get._2
      val qn = dot(qv, qv)
      val probedCells = pivots.map { case (pid, pv) => (d2(qv, pv), pid) }
        .sorted.take(2).map(_._2).toSet
      qid -> emb.filter { case (id, v, l) =>
          id != qid && l == 3 && probedCells.contains(cellIndex(id)) &&
            dot(v, v) > 0 }
        .map { case (id, v, _) =>
          (id, math.floor(dot(qv, v) / math.sqrt(qn * dot(v, v))
            * 1000000.0).toLong)
        }.sortBy(t => (-t._2, t._1)).take(5).map(_._1).toSet
    }.toMap
    val got = run("qe14_filtered_ann").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(42L, 123L, 321L))
    got.foreach { case (qid, nPost, nHits, pct) =>
      assert(pct == nHits * 20)
      assert(nPost == postExp(qid).size.toLong, s"n_post for $qid")
      assert(nHits == (postExp(qid) & exact(qid)).size.toLong,
        s"n_hits for $qid")
    }
    // the audit is non-vacuous on this corpus: post-filtering costs
    // recall for at least one probe
    assert(got.map(_._3).sum < 15)
  }

  test("qe10 Gram-identity diversity equals the literal n² pairwise sum") {
    val emb = graft.Engine.table(spark, sf, "embeddings")
      .select(col("label"), col("vec_id"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](2).toArray
        .map(v => math.floor(v.toDouble * 10000.0).toLong)))
    val expected = emb.groupBy(_._1).map { case (label, vs) =>
      var s = 0L
      for (i <- vs.indices; j <- vs.indices if i != j) {
        val (a, b) = (vs(i)._2, vs(j)._2)
        var d = 0L; var k = 0
        while (k < a.length) { d += a(k) * b(k); k += 1 }
        s += d
      }
      label -> (vs.length.toLong, s, s / (vs.length.toLong * (vs.length - 1)))
    }
    val got = run("qe10_sample_diversity").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, ps, m) = expected(r.getInt(0))
      assert(r.getLong(1) == n && r.getLong(2) == ps && r.getLong(3) == m,
        s"label ${r.getInt(0)}: (${r.getLong(1)},${r.getLong(2)}," +
          s"${r.getLong(3)}) != ($n,$ps,$m)")
    }
  }

  test("qp19 never splits a near-dup pair across sides (the invariant)") {
    val side = run("qp19_split_leakage_safe").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // every doc assigned exactly once, to a real side
    val docs = graft.Engine.table(spark, sf, "documents").count()
    assert(side.size == docs)
    assert(side.values.forall(v => v._2 == "train" || v._2 == "heldout"))
    // the invariant: LSH near-dup candidates (qp4) land on the SAME side
    // with the SAME representative
    val pairs = run("qp4_minhash_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should carry near-dup candidates")
    pairs.foreach { case (a, b) =>
      assert(side(a)._1 == side(b)._1 && side(a)._2 == side(b)._2,
        s"near-dup pair ($a,$b) split across sides: ${side(a)} vs ${side(b)}")
    }
    // representative is the cluster minimum: rep <= doc_id always, and
    // a rep maps to itself
    side.foreach { case (id, (rep, _)) =>
      assert(rep <= id)
      assert(side(rep)._1 == rep, s"rep $rep of $id is not its own rep")
    }
  }
}
