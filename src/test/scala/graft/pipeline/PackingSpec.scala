package graft.pipeline

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** qp17 sequence packing + qp18 interleave, checked against exact
  * driver-side recomputations (no tolerance): the two-phase distributed
  * prefix sum must equal the sequential prefix sum in the global hash
  * order, and the stride schedule must equal the sequential merge of the
  * per-source streams. */
class PackingSpec extends SparkSuite {

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("qp17 two-phase prefix sum equals the sequential global prefix sum") {
    val docs = graft.Engine.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong + 1))
    // sequential reference: sort by (md5, doc_id), running offsets
    val ordered = docs.map { case (id, n) => (md5hex(s"pack|$id"), id, n) }
      .sortBy(t => (t._1, t._2))
    val expected = scala.collection.mutable.LinkedHashMap
      .empty[Long, (Long, Long)] // doc_id -> (n_tok, offset)
    var off = 0L
    ordered.foreach { case (_, id, n) =>
      expected(id) = (n, off); off += n
    }

    val got = run("qp17_sequence_packing").collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val (id, n, o) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (en, eo) = expected(id)
      assert(n == en, s"n_tok mismatch for doc $id")
      assert(o == eo, s"offset mismatch for doc $id")
      assert(r.getLong(3) == eo / 64 && r.getLong(4) == (eo + en - 1) / 64)
    }
    // the output arrives in offset order and covers the corpus exactly
    assert(got.map(_.getLong(2)).toSeq == expected.values.map(_._2).toSeq)
    assert(got.last.getLong(2) + got.last.getLong(1) == off)
  }

  test("qp20 manifest tiles every sequence exactly and conserves tokens") {
    val offsets = run("qp17_sequence_packing").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = offsets.map(_._2).sum
    val man = run("qp20_pack_manifest").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // token conservation per document
    val perDoc = man.groupBy(_._2).map { case (d, rs) => d -> rs.map(_._4).sum }
    offsets.foreach { case (d, n, _) => assert(perDoc(d) == n) }
    // every sequence is tiled contiguously from 0; full 64 except the last
    val lastSeq = (total - 1) / 64
    man.groupBy(_._1).foreach { case (seq, rs) =>
      val spans = rs.sortBy(_._3)
      assert(spans.head._3 == 0)
      spans.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(0)._3 + w(0)._4 == w(1)._3, s"gap in seq $seq")
      }
      val filled = spans.map(_._4).sum
      assert(if (seq == lastSeq) filled == total - seq * 64
             else filled == 64, s"seq $seq holds $filled tokens")
    }
    // spans agree with qp17's chunk range
    val ranges = man.groupBy(_._2)
      .map { case (d, rs) => d -> (rs.map(_._1).min, rs.map(_._1).max) }
    run("qp17_sequence_packing").collect().foreach { r =>
      assert(ranges(r.getLong(0)) == (r.getLong(3), r.getLong(4)))
    }
  }

  test("qp21 temperature mixing takes min(n, M*sqrt(n)/sum) per source " +
      "and flattens the distribution") {
    val docs = graft.Engine.table(spark, sf, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ns = docs.groupBy(_._2).map { case (s, v) => s -> v.length.toLong }
    val s6 = ns.map { case (s, n) =>
      s -> math.floor(math.sqrt(n.toDouble) * 1000000.0).toLong
    }
    val ts6 = s6.values.sum
    val takeN = ns.map { case (s, n) => s -> math.min(n, 200 * s6(s) / ts6) }
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      rows.map { case (id, _) => (md5hex(s"temp|$id"), id) }
        .sortBy(t => (t._1, t._2)).take(takeN(src).toInt).zipWithIndex
        .map { case ((_, id), i) => (id, src, (i + 1).toLong) }
    }.sortBy(t => (t._2, t._3))
    val got = run("qp21_temperature_mix").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected && got.nonEmpty)
    // flattening: smaller sources keep a HIGHER fraction than larger ones
    val frac = takeN.map { case (s, t) => s -> t.toDouble / ns(s) }
    for (a <- ns.keys; b <- ns.keys if ns(a) < ns(b))
      assert(frac(a) >= frac(b) - 1e-9,
        s"α-sampling did not flatten: $a(${ns(a)}) ${frac(a)} < " +
          s"$b(${ns(b)}) ${frac(b)}")
  }

  test("qp18 stride interleave equals the sequential per-source merge") {
    val docs = graft.Engine.table(spark, sf, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySource = docs.groupBy(_._2)
    val keyed = bySource.toSeq.flatMap { case (src, rows) =>
      val n = rows.length
      rows.map { case (id, _) => (md5hex(s"mix|$id"), id) }
        .sortBy(t => (t._1, t._2)).zipWithIndex
        .map { case ((_, id), i) => ((i + 1).toDouble / n, src, id) }
    }
    val expected = keyed.sortBy(t => (t._1, t._2, t._3)).take(120)

    val got = run("qp18_mix_interleave").collect()
    assert(got.length == math.min(120, docs.length))
    got.zip(expected).zipWithIndex.foreach { case ((r, (_, src, id)), i) =>
      assert(r.getLong(0) == i + 1)
      assert(r.getString(1) == src && r.getLong(2) == id,
        s"schedule position ${i + 1} mismatch")
    }
    // proportionality: in a full-length prefix each source appears within
    // ±1 of its proportional share (the stride-scheduler guarantee)
    val total = docs.length.toDouble
    val prefix = expected.length.toDouble
    expected.groupBy(_._2).foreach { case (src, rows) =>
      val share = bySource(src).length * prefix / total
      assert(math.abs(rows.length - share) <= 1.0 + 1e-9,
        s"source $src appears ${rows.length}× vs proportional $share")
    }
  }
}
