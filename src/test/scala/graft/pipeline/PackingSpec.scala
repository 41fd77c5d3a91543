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
