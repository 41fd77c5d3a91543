package graft.pipeline

import graft.{Engine, SparkSuite}
import org.apache.spark.sql.functions._

/** Round-9 pipeline additions: deterministic sampling (qp11/qp12), PII
  * redaction (qt8), label centroids (qe6). The sampling specs recompute
  * the EXACT expected membership on the driver (md5 is a pure function of
  * doc_id), so there is no statistical tolerance anywhere.
  */
class PipelineOpsSpec extends SparkSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private lazy val docs: Seq[(Long, String)] =
    Engine.table(spark, sf, "documents")
      .select($"doc_id", $"lang").as[(Long, String)].collect().toSeq

  test("qp11 stratified sample membership is exactly the md5-threshold set") {
    val expected = docs.collect {
      case (id, lang) if md5hex(s"strat|$id").substring(0, 4) <
        (if (lang == "en") "0ccc" else "8000") => id
    }.sorted
    val got = run("qp11_stratified_sample").select($"doc_id")
      .as[Long].collect().toSeq
    assert(got == expected)
    // the dominant stratum actually downsampled vs the others
    val rateEn = got.count(id => docs.toMap.apply(id) == "en").toDouble /
      docs.count(_._2 == "en")
    val rateDe = got.count(id => docs.toMap.apply(id) == "de").toDouble /
      docs.count(_._2 == "de")
    assert(rateEn < rateDe)
  }

  test("qp12 reservoir keeps exactly the k smallest hashes per stratum") {
    val expected = docs.groupBy(_._2).flatMap { case (lang, ds) =>
      ds.map { case (id, _) => (lang, md5hex(s"rsv|$id"), id) }
        .sortBy(t => (t._2, t._3)).take(8)
        .zipWithIndex.map { case ((l, _, id), i) => (l, (i + 1).toLong, id) }
    }.toSeq.sorted
    val got = run("qp12_reservoir_sample")
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(got == expected)
    assert(got.size == 5 * 8) // every sf0.001 stratum has >= 8 docs
  }

  test("qt8 masks every constructed email/phone/ip and counts one of each") {
    val rows = run("qt8_pii_redaction")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(rows.length ==
      Engine.table(spark, sf, "customer").count())
    rows.foreach { case (k, red, ne, np, ni) =>
      assert(ne == 1 && np == 1 && ni == 1, s"counts for $k")
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>")
        && red.contains("<IP>"), s"masks for $k")
      assert(!red.contains("@"), s"unredacted email for $k")
      // non-PII digits (the customer name) survive; the PII shapes go
      assert(!red.contains("+1-555-"), s"unredacted phone for $k")
      assert(!red.contains(" 10."), s"unredacted ip for $k")
    }
  }

  test("qt16 gopher rules equal a driver-side recompute; every rule discriminates") {
    // recompute all five booleans from (doc_id, text) in plain Scala —
    // integer arithmetic only, mirroring the query's cross-product
    // thresholds exactly
    val stop = Set("the", "a", "of", "and", "in")
    val expected = Engine.table(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val tk = text.split(" ", -1)
        val nt = tk.length
        // CODE POINTS, not UTF-16 units — Spark/DuckDB length() counts
        // code points, and String.length diverges above U+FFFF (the
        // round-11 collation lesson; fixture is ASCII today, but the
        // recompute must not silently depend on that)
        val nc = text.codePointCount(0, text.length)
        val letters = nc - (nt - 1)
        val topcnt = tk.groupBy(identity).values.map(_.length).max
        val wordOk = nt >= 20 && nt <= 120
        val lenOk = 4 * nt <= letters && letters <= 6 * nt
        val stopOk = tk.toSet.count(stop) >= 2
        val repOk = 8 * topcnt <= nt
        (id, wordOk, lenOk, stopOk, repOk,
          wordOk && lenOk && stopOk && repOk)
      }.sortBy(_._1).toSeq
    val got = run("qt16_gopher_rules")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().toSeq
    assert(got == expected)
    // each rule individually discriminates on the fixture (both values
    // occur), and the gate actually drops documents
    Seq[((Long, Boolean, Boolean, Boolean, Boolean, Boolean)) => Boolean](
      _._2, _._3, _._4, _._5, _._6).foreach { f =>
      assert(got.exists(f) && got.exists(r => !f(r)))
    }
  }

  test("qp27 source-overlap matrix equals a driver-side set recompute") {
    // independent ground truth: build each source's distinct trigram
    // SET in plain Scala, intersect pairwise, and compare counts and
    // the single-division jaccard exactly
    val bySource = Engine.table(spark, sf, "documents")
      .select($"source", $"text").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues { docs =>
        docs.flatMap { case (_, text) =>
          val ws = text.split(" ").filter(_.nonEmpty)
          if (ws.length < 3) Seq.empty
          else (0 to ws.length - 3).map(i =>
            s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")
        }.toSet
      }.toMap
    val sources = bySource.keys.toSeq.sorted
    val expected = for {
      i <- sources.indices; j <- (i + 1) until sources.size
      a = sources(i); b = sources(j)
      shared = (bySource(a) & bySource(b)).size if shared > 0
    } yield (a, b, shared.toLong, shared.toDouble /
      (bySource(a).size + bySource(b).size - shared))
    val got = run("qp27_source_overlap")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty) // the fixture's sources genuinely overlap
  }

  test("qp28 perplexity buckets are exact value-based terciles of the LM score") {
    val rows = run("qp28_perplexity_buckets")
      .as[(Long, Long, Int, Boolean)].collect().toSeq
    assert(rows.nonEmpty)
    val n = rows.size
    val scores = rows.map(_._2).sorted
    // two independent cutoff formulations that must agree: positional
    // (the value at sorted index ceil(n/3)-1) and rank-based (smallest
    // score whose count-of-scores-at-or-below reaches n/3) — equal for
    // any multiset, so cross-checking them guards both recomputes
    val c1 = scores(((n + 2) / 3) - 1)
    def rankOf(s: Long) = scores.count(_ <= s)
    val expC1 = scores.find(s => rankOf(s) * 3 >= n).get
    val expC2 = scores.find(s => rankOf(s) * 3 >= 2 * n).get
    assert(c1 === expC1)
    rows.foreach { case (_, s, bucket, keep) =>
      val expected = if (s <= expC1) 0 else if (s <= expC2) 1 else 2
      assert(bucket === expected, s"score $s")
      assert(keep === (bucket >= 1))
    }
    // all three buckets are populated and roughly balanced (ties can
    // skew, but never empty a tercile on this corpus); bucket 0 is the
    // DROPPED highest-perplexity tail, buckets 1-2 the CCNet keep
    val sizes = rows.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes.keySet === Set(0, 1, 2))
    assert(sizes(0) * 3 >= n / 2, s"tail tercile unexpectedly small: $sizes")
    // scores agree with qt12's (same LM, same docs)
    val qt12 = run("qt12_bigram_logprob")
      .select($"doc_id", $"avg_lp6").as[(Long, Long)].collect().toMap
    rows.foreach { case (id, s, _, _) => assert(qt12(id) === s) }
  }

  test("qt17 token entropy equals a driver-side recompute; uniformity extremes hold") {
    val texts = Engine.table(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val expected = texts.flatMap { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      if (ws.isEmpty) None
      else {
        val counts = ws.groupBy(identity).view.mapValues(_.length.toLong)
        val tot = ws.length.toLong
        val tsum = counts.values.map(c =>
          c * math.floor(math.log(tot.toDouble / c) * 1e6).toLong).sum
        Some((id, tot, counts.size.toLong,
          Math.floorDiv(tsum, tot))) // Spark's `div` floors like BIGINT //
      }
    }.sortBy(_._1)
    val got = run("qt17_token_entropy")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // extremes: an all-identical-token doc would score exactly 0 and a
    // unique-token doc floor(ln(n)*1e6)-ish; assert the corpus ordering
    // signal is real — entropy grows with distinct/total ratio overall
    val lows = got.filter(r => r._3 * 2 <= r._2).map(_._4)
    val highs = got.filter(r => r._3 == r._2).map(_._4)
    if (lows.nonEmpty && highs.nonEmpty)
      assert(lows.min < highs.max)
  }

  test("qm5 scene cuts equal a driver-side frame-energy recompute") {
    val texts = Engine.table(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    // The engine slices the BINARY payload (graft_bytesum, round 16 —
    // this recompute matches it byte-for-byte) but the DuckDB ORACLE
    // still slices CHARACTERS (DuckDB 1.0 cannot substring BLOBs) —
    // oracle and engine agree only while the corpus is pure ASCII.
    // Assert that precondition BY NAME so a future non-ASCII fixture
    // fails here with the cause stated, not as an opaque oracle
    // mismatch (ADVICE r15).
    val nonAscii = texts.filter { case (_, tx) =>
      tx.getBytes("UTF-8").length != tx.length }
    assert(nonAscii.isEmpty,
      "qm5 assumes a pure-ASCII corpus (its DuckDB oracle slices " +
        "characters, the engine and this recompute slice bytes); " +
        "non-ASCII doc_ids: " +
        nonAscii.map(_._1).take(5).mkString(", "))
    val expected = texts.flatMap { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val nf = bytes.length / 64
      if (nf == 0) None
      else {
        val energies = (0 until nf).map(i =>
          bytes.slice(i * 64, i * 64 + 64).map(_.toLong & 0xffL).sum)
        val deltas =
          if (energies.size < 2) Seq.empty[Long]
          else energies.sliding(2).map(p => math.abs(p(1) - p(0))).toSeq
        Some((id, nf.toLong, deltas.count(_ >= 300).toLong,
          if (deltas.isEmpty) 0L else deltas.max))
      }
    }.sortBy(_._1)
    val got = run("qm5_scene_cuts")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("qp30 domain rollup equals a driver-side recompute; the cap bites") {
    val rows = Engine.table(spark, sf, "documents")
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect().toSeq
    val cap = CurationQueries.DomainCap
    val stop = Set("the", "a", "of", "and", "in")
    val per = rows.flatMap { case (id, src, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      if (ws.isEmpty) None
      else {
        val nt = ws.length.toLong
        val nc = text.length.toLong
        val ns = ws.count(stop).toLong
        // qp7's formula in the engine's exact operand order — every op
        // a pure IEEE double op, so the floor-scaled BIGINT matches
        val q = 0.4 * math.min(nc / 500.0, 1.0) +
          0.3 * math.min(ns.toDouble / nt * 5.0, 1.0) +
          0.3 * math.min((nc - (nt - 1.0)) / nt / 8.0, 1.0)
        Some((src, nt, math.floor(q * 1000000.0).toLong,
          md5hex(s"domcap|$id").substring(0, 8)))
      }
    }
    val expected = per.groupBy(_._1).toSeq.map { case (src, ds) =>
      val n = ds.size.toLong
      val th8 = f"${math.max(4294967296L * cap / n, 1L)}%08x"
      val kept = if (n <= cap) ds else ds.filter(_._4 < th8)
      (src, n, ds.map(_._2).sum, ds.map(_._3).sum / n,
        kept.size.toLong, kept.map(_._2).sum)
    }.sortBy(_._1)
    val got = run("qp30_domain_rollup")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // the cap actually bites on this corpus (every fixture domain holds
    // more than DomainCap docs), no domain empties, and the hash-rate
    // selection lands near cap (within the 32-bit thresholding's
    // granularity + hash variance; exactness is the recompute above)
    got.foreach { r =>
      assert(r._2 > cap, s"${r._1}: fixture domain too small for the cap test")
      assert(r._5 > 0 && r._5 < r._2, s"${r._1}: kept ${r._5} of ${r._2}")
    }
    assert(got.map(_._5).sum < got.map(_._2).sum)
  }

  test("qp30 keep-all branch: a domain at or under the cap keeps every doc") {
    // the fixture never exercises n_docs <= cap, so drive the helper on
    // a synthetic corpus: d1 holds 2 docs (== cap), d2 holds 3 (> cap)
    val tiny = Seq(
      (1L, "d1", "alpha beta the gamma"),
      (2L, "d1", "of delta epsilon"),
      (3L, "d2", "x y z w"),
      (4L, "d2", "p q r"),
      (5L, "d2", "m n o and")).toDF("doc_id", "source", "text")
    val got = CurationQueries.domainRollup(tiny, cap = 2)
      .select($"source", $"n_docs", $"n_kept")
      .as[(String, Long, Long)].collect()
      .map { case (s, n, k) => s -> ((n, k)) }.toMap
    assert(got("d1") === ((2L, 2L))) // n_docs == cap → keep all
    // d2: threshold = (2^32 * 2) div 3 = 2863311530 = 'aaaaaaaa'
    val keptD2 = Seq(3L, 4L, 5L).count(id =>
      md5hex(s"domcap|$id").substring(0, 8) < "aaaaaaaa").toLong
    assert(got("d2") === ((3L, keptD2)))
  }

  test("qp30 over-granularity regime: a domain past 65536*cap docs still keeps ~cap") {
    // regression for the round-16 review catch: with the original
    // 16-BIT hash space, (65536*cap) div n_docs floored to 0 for any
    // domain over 65536*cap docs, so 'hot' — the query's own target
    // case — silently kept NOTHING. The 32-bit space keeps ~cap:
    // expected count recomputed exactly from the same md5 prefixes.
    val cap = 2
    val n = 200000L // > 65536 * cap = 131072 — the old scheme kept 0
    val big = spark.range(0, n)
      .selectExpr("id AS doc_id", "'hot' AS source", "'a b c' AS text")
    val th8 = f"${math.max(4294967296L * cap / n, 1L)}%08x"
    val expectedKept = (0L until n).count(id =>
      md5hex(s"domcap|$id").substring(0, 8) < th8).toLong
    val got = CurationQueries.domainRollup(big, cap = cap)
      .select($"n_docs", $"n_kept").as[(Long, Long)].head()
    assert(got._1 === n)
    assert(got._2 === expectedKept)
    // the whole point: NOT zero, and within hash variance of cap
    assert(expectedKept > 0L,
      "over-granularity domain kept nothing — the 16-bit cliff is back")
    assert(expectedKept <= 4L * cap,
      s"kept $expectedKept, expected ~$cap — rate selection off")
  }

  test("qt18 gram novelty equals a driver-side first-seen recompute") {
    val texts = Engine.table(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val firstSeen = scala.collection.mutable.Map.empty[String, Long]
    texts.sortBy(_._1).foreach { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      if (ws.length >= 3)
        (0 to ws.length - 3).foreach { i =>
          val g = s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}"
          if (!firstSeen.contains(g)) firstSeen(g) = id
        }
    }
    val md = texts.map(_._1).max
    val expected = (1 to 4).map { q =>
      val cut = md * q / 4
      val prev = if (q == 1) -1L else md * (q - 1) / 4 // q1 includes doc 0
      (q, cut,
        firstSeen.values.count(_ <= cut).toLong,
        firstSeen.values.count(v => v <= cut && v > prev).toLong)
    }
    val got = run("qt18_gram_novelty")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // the signal is real on this corpus: cumulative vocab is
    // non-decreasing, and the curve saturates (later novelty <= the
    // first burst)
    assert(got.map(_._3) == got.map(_._3).sorted)
    assert(got.last._4 <= got.head._4)
    // deltas partition the cumulative total
    assert(got.map(_._4).sum == got.last._3)
  }

  test("qt19 zipf slope equals a driver-side OLS recompute; the cap bites") {
    val rows = Engine.table(spark, sf, "documents")
      .select($"source", $"text").as[(String, String)].collect().toSeq
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      val counts = ds.flatMap(_._2.split(" ").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      val vocab = counts.size.toLong
      // rank by (count desc, word asc) — ASCII corpus, so Scala's
      // UTF-16 string order equals both engines' binary orders
      val head = counts.sortBy { case (w, c) => (-c, w) }
        .take(TextQueries.ZipfRankCap).zipWithIndex
        .map { case ((_, c), i) =>
          (math.floor(math.log((i + 1).toDouble) * 1e3).toLong,
            math.floor(math.log(c.toDouble) * 1e3).toLong)
        }
      val n = head.size.toLong
      if (n < 2) None
      else {
        val sx = head.map(_._1).sum; val sy = head.map(_._2).sum
        val sxy = head.map(p => p._1 * p._2).sum
        val sxx = head.map(p => p._1 * p._1).sum
        val slope6 = math.floor((n * sxy - sx * sy).toDouble
          / (n * sxx - sx * sx).toDouble * 1e6).toLong
        Some((src, vocab, n, slope6))
      }
    }.sortBy(_._1)
    val got = run("qt19_zipf_slope")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty)
    // the head cap genuinely bites on this fixture (vocab exceeds it)
    // and every fitted slope is negative (frequency falls with rank)
    assert(got.exists(r => r._2 > TextQueries.ZipfRankCap))
    got.filter(_._2 > TextQueries.ZipfRankCap)
      .foreach(r => assert(r._3 == TextQueries.ZipfRankCap.toLong))
    got.foreach(r => assert(r._4 < 0, s"${r._1} slope not negative"))
  }

  test("qt21 Heaps fit equals a driver recompute and discriminates planted growth") {
    // The fixture's 31-word vocabulary saturates at the first octile
    // (beta ~ 0 everywhere — the template regime the query exists to
    // flag), so discrimination needs planted sources: one whose every
    // doc is all-new words (V = N, beta -> 1) and one whose docs reuse
    // a fixed 10-word set (beta -> 0). The driver recompute replicates
    // the whole chain: octile checkpoints, floored lns, integer OLS.
    val docs = (0 until 64).map { i =>
      (i.toLong, "growing", (0 until 10).map(j => s"g_${i}_$j").mkString(" "))
    } ++ (0 until 64).map { i =>
      (100L + i, "flat", (0 until 10).map(j => s"f_$j").mkString(" "))
    }
    val dir = java.nio.file.Files.createTempDirectory("qt21spec").toString
    docs.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("qt21_heaps_fit")(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val sorted = ds.sortBy(_._1)
      val seen = scala.collection.mutable.Set.empty[String]
      var cumn = 0L; var cumv = 0L
      val cums = sorted.map { case (_, _, text) =>
        val ws = text.split(" ").filter(_.nonEmpty)
        cumn += ws.length
        ws.foreach(w => if (seen.add(w)) cumv += 1)
        (cumn, cumv)
      }
      val ndDocs = sorted.size.toLong
      val rs = (1L to 8L).map(k => (ndDocs * k + 7) / 8).distinct
      val pts = rs.map(r => cums(r.toInt - 1))
        .filter(p => p._1 > 0 && p._2 > 0)
        .map { case (n0, v0) =>
          (math.floor(math.log(n0.toDouble) * 1000.0).toLong,
            math.floor(math.log(v0.toDouble) * 1000.0).toLong)
        }
      val n = pts.size.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val beta6 = math.floor((n * sxy - sx * sy).toDouble
        / (n * sxx - sx * sx).toDouble * 1e6).toLong
      src -> ((src, ndDocs, seen.size.toLong, n, beta6))
    }
    assert(got == expected)
    // beta separates the regimes: all-new words ~ 1.0, fixed vocab ~ 0
    assert(got("growing")._5 > 900000L, s"growing: ${got("growing")}")
    assert(got("flat")._5 < 100000L, s"flat: ${got("flat")}")
    spark.catalog.clearCache()
  }

  test("qt20 KL drift equals a driver-side recompute; a planted shift scores high") {
    val rows = Engine.table(spark, sf, "documents")
      .select($"source", $"text").as[(String, String)].collect().toSeq
    val perSrc = rows.groupBy(_._1).view.mapValues(
      _.flatMap(_._2.split(" ").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap).toMap
    val global = perSrc.values.flatten
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val t = global.values.sum
    val expected = perSrc.toSeq.map { case (src, wc) =>
      val tsrc = wc.values.sum
      val klsum = wc.map { case (w, c) =>
        c * math.floor(math.log(
          (c.toDouble / tsrc.toDouble)
            * (t.toDouble / global(w).toDouble)) * 1e6).toLong
      }.sum
      (src, wc.size.toLong, klsum / tsrc) // both engines truncate to 0
    }.sortBy(_._1)
    val got = run("qt20_source_kl_drift")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty)
    // the statistic discriminates: recompute KL for a PLANTED drifted
    // source (one fixture source's counts with one word's mass tripled)
    // and assert it scores above that source's real drift
    val (src0, wc0) = perSrc.head
    val hot = wc0.keys.head
    val shifted = wc0.updated(hot, wc0(hot) * 3 + 10)
    val tS = shifted.values.sum
    val gS = global.updated(hot, global(hot) + shifted(hot) - wc0(hot))
    val ttS = t + shifted(hot) - wc0(hot)
    val klShift = shifted.map { case (w, c) =>
      c * math.floor(math.log(
        (c.toDouble / tS.toDouble) * (ttS.toDouble / gS(w).toDouble))
        * 1e6).toLong
    }.sum / tS
    val klOrig = got.find(_._1 == src0).get._3
    assert(klShift > klOrig,
      s"planted drift ($klShift) should exceed the real drift ($klOrig)")
  }

  test("qm6 energy segments equal a driver-side run-length recompute") {
    val texts = Engine.table(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    // same byte==char precondition as qm5's spec: the DuckDB oracle
    // slices characters, the engine and this recompute slice bytes
    val nonAscii = texts.filter { case (_, tx) =>
      tx.getBytes("UTF-8").length != tx.length }
    assert(nonAscii.isEmpty,
      "qm6 assumes a pure-ASCII corpus; non-ASCII doc_ids: " +
        nonAscii.map(_._1).take(5).mkString(", "))
    val expected = texts.flatMap { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val nf = bytes.length / 64
      if (nf == 0) None
      else {
        val active = (0 until nf).map(i =>
          bytes.slice(i * 64, i * 64 + 64).map(_.toLong & 0xffL).sum
            >= MultimodalQueries.ActiveEnergy)
        // run-length encode the active flags
        val runs = active.foldLeft(List.empty[(Boolean, Long)]) {
          case ((f, len) :: tl, a) if f == a => (f, len + 1) :: tl
          case (acc, a) => (a, 1L) :: acc
        }.filter(_._1).map(_._2)
        Some((id, nf.toLong, runs.size.toLong,
          if (runs.isEmpty) 0L else runs.max,
          runs.sum))
      }
    }.sortBy(_._1)
    val got = run("qm6_energy_segments")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // the fixture exercises every branch: a zero-active item (the left
    // join's coalesce row), a multi-segment item, and the invariant
    // that runs never exceed the frame budget
    assert(got.exists(_._3 == 0))
    assert(got.exists(_._3 > 1))
    got.foreach(r => assert(r._5 <= r._2 && r._4 <= r._5))
  }

  test("qm7 clip manifest picks the longest earliest scene; boundaries are qm5's") {
    val texts = Engine.table(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    // same byte==char precondition as qm5/qm6's specs: the DuckDB
    // oracle slices characters, the engine and this recompute slice
    // bytes (review r16 — qm7 initially shipped without this assert)
    val nonAscii = texts.filter { case (_, tx) =>
      tx.getBytes("UTF-8").length != tx.length }
    assert(nonAscii.isEmpty,
      "qm7 assumes a pure-ASCII corpus; non-ASCII doc_ids: " +
        nonAscii.map(_._1).take(5).mkString(", "))
    val expected = texts.flatMap { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val nf = bytes.length / 64
      if (nf == 0) None
      else {
        val energies = (0 until nf).map(i =>
          bytes.slice(i * 64, i * 64 + 64).map(_.toLong & 0xffL).sum)
        // scene id = running count of cut boundaries (first frame is
        // never a cut)
        val sceneIds = energies.indices.map { i =>
          (1 to i).count(j =>
            math.abs(energies(j) - energies(j - 1))
              >= MultimodalQueries.CutDelta)
        }
        val scenes = sceneIds.zipWithIndex.groupBy(_._1).values.toSeq
          .map(fs => (fs.map(_._2).min.toLong, fs.size.toLong))
        val (start, len) = scenes
          .sortBy { case (st, ln) => (-ln, st) }.head
        Some((id, scenes.size.toLong, start, len))
      }
    }.sortBy(_._1)
    val got = run("qm7_clip_manifest")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // scene boundaries are EXACTLY qm5's: n_scenes = its n_cuts + 1,
    // per item — the shared-CutDelta contract, asserted cross-query
    val qm5 = run("qm5_scene_cuts")
      .select($"doc_id", $"n_cuts").as[(Long, Long)].collect().toMap
    got.foreach(r => assert(r._2 == qm5(r._1) + 1,
      s"doc ${r._1}: scene count diverges from qm5's cut count"))
    // multi-scene items exist and every clip fits its item
    assert(got.exists(_._2 > 1))
  }

  test("qp13 water-filling: budget exhausted, caps respected, one knee") {
    val rows = run("qp13_token_budget")
      .as[(String, Long, Double, Double)].collect()
    val total = rows.map(_._2).sum
    val budget = math.floor(total * 0.9)
    // the allocation spends exactly the budget (sum of caps + full takes)
    assert(math.abs(rows.map(_._3).sum - budget) < 1e-6)
    rows.foreach { case (src, avail, alloc, rate) =>
      assert(alloc <= avail + 1e-9, s"$src over-allocated")
      assert(rate > 0.0 && rate <= 1.0, s"$src rate $rate")
      // rate is consistent with the allocation
      assert(math.abs(alloc - rate * avail) < 1e-6, s"$src alloc/rate")
    }
    // capped sources share ONE common cap; uncapped keep everything
    val caps = rows.filter(_._4 < 1.0).map(_._3).distinct
    assert(caps.length <= 1, s"multiple cap values: ${caps.toSeq}")
    // water-filling dominance: a source with more tokens never gets a
    // smaller allocation
    rows.sortBy(_._2).map(_._3).sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1e-9)
      case _ => ()
    }
  }

  test("qt10 tf-idf: 3 descending-scored terms per doc, top-1 matches Scala") {
    val rows = run("qt10_tfidf_top_terms")
      .as[(Long, Long, String, Double)].collect()
    val byDoc = rows.groupBy(_._1)
    byDoc.values.foreach { ts =>
      assert(ts.length == 3)
      val ordered = ts.sortBy(_._2)
      assert(ordered.map(_._4).sliding(2).forall {
        case Array(a, b) => a >= b; case _ => true
      })
    }
    // recompute one document's scores directly
    val texts = Engine.table(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val allTf: Map[Long, Map[String, Int]] = texts.view.mapValues(
      _.split(" ").filter(_.nonEmpty).groupBy(identity)
        .map { case (w, a) => w -> a.length }).toMap
    val nd = allTf.size.toDouble
    val dfreq = allTf.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, o) => w -> o.size }
    val doc = allTf.keys.min
    val len = allTf(doc).values.sum.toDouble
    val expTop = allTf(doc).toSeq.map { case (w, c) =>
      val idf6 = math.floor(math.log(nd / dfreq(w)) * 1e6).toLong
      val score = math.floor(c / len * idf6) / 1e6
      (w, score)
    }.sortBy { case (w, sc) => (-sc, w) }.head
    val gotTop = rows.filter(r => r._1 == doc && r._2 == 1L).head
    assert((gotTop._3, gotTop._4) == expTop)
  }

  test("qp14 length clip equals a driver-side KLL sample + filter") {
    val lens = Engine.table(spark, sf, "documents")
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)]
      .collect().toSeq
      .map { case (id, lang, text) =>
        (id, lang, text.split(" ").count(_.nonEmpty).toDouble) }
    val agg = new graft.functions.Udafs.KllAgg()
    var buf = agg.zero
    lens.foreach { case (id, _, lv) =>
      buf = agg.reduce(buf, graft.functions.Udafs.KllIn(id.toString, lv)) }
    val sample = agg.finish(buf)
    val lo = sample(math.ceil(0.05 * sample.length).toInt - 1)
    val hi = sample(math.ceil(0.95 * sample.length).toInt - 1)
    val expected = lens.filter(t => t._3 >= lo && t._3 <= hi)
      .groupBy(_._2).view.mapValues(ds =>
        (ds.size.toLong, ds.map(_._3.toLong).sum)).toMap
    val got = run("qp14_length_clip").as[(String, Long, Long)].collect()
      .map { case (l, n, tk) => l -> (n, tk) }.toMap
    assert(got == expected)
    assert(lo < hi) // the clip window is non-degenerate on this corpus
  }

  test("qe7 IVF probe: candidates come only from the query's probed cells") {
    val vecs = Engine.table(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    // same fold arithmetic as graft_dot: sequential left fold of exact
    // float-product doubles
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def d2(a: Array[Float], b: Array[Float]): Double =
      dot(a, a) - 2.0 * dot(a, b) + dot(b, b)
    val piv = vecs.filter(_._1 < 8).toSeq.sortBy(_._1)
    def cellOf(v: Array[Float]): Long =
      piv.map { case (pid, p) => (d2(v, p), pid) }.min._2
    val rows = run("qe7_ivf_probe")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).distinct.sorted.toSeq == Seq(42L, 123L, 321L))
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.length <= 5)
      val probed = piv.map { case (pid, p) =>
        (d2(vecs(qid), p), pid) }.sorted.take(2).map(_._2).toSet
      rs.foreach { case (_, _, vid, _) =>
        assert(vid != qid)
        assert(probed.contains(cellOf(vecs(vid))),
          s"candidate $vid outside probed cells of $qid")
      }
      // scores descend with the rank
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._4).sliding(2).forall {
        case Array(a, b) => a >= b; case _ => true
      })
    }
  }

  test("qe6 centroids equal a direct fixed-point mean per (label, dim)") {
    val vecs = Engine.table(spark, sf, "embeddings")
      .select($"label", $"embedding").as[(Int, Array[Float])]
      .collect().toSeq
    val got = run("qe6_label_centroids")
      .as[(Int, Long, Double)].collect()
      .map { case (l, d, m) => (l, d) -> m }.toMap
    val dims = vecs.head._2.length
    assert(got.size == vecs.map(_._1).distinct.size * dims)
    for (label <- Seq(0, 4, 9); dim <- Seq(1, dims / 2, dims)) {
      val vs = vecs.filter(_._1 == label).map(_._2(dim - 1))
      val exp = vs.map(v => math.floor(v.toDouble * 1e6).toLong).sum
        .toDouble / 1e6 / vs.size
      assert(math.abs(got((label, dim.toLong)) - exp) < 1e-12,
        s"label $label dim $dim")
    }
  }

  test("qm2/qm4 assume a pure-ASCII corpus — asserted by name, with a frame-space recompute") {
    // review r18: qm5/qm6/qm7 each assert the byte==char precondition
    // BY NAME (their oracles slice VARCHAR characters where the engine
    // slices BINARY bytes), but qm2/qm4 — same precondition — failed
    // only as an opaque hash mismatch. Same assert here, plus a driver
    // recompute of qm2's sampled frame space so the shared frameRows
    // definition is pinned independently of the oracle.
    val texts = Engine.table(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val nonAscii = texts.filter { case (_, tx) =>
      tx.getBytes("UTF-8").length != tx.length }
    assert(nonAscii.isEmpty,
      "qm2/qm4 assume a pure-ASCII corpus (their DuckDB oracles slice " +
        "characters, the engine slices bytes); non-ASCII doc_ids: " +
        nonAscii.map(_._1).take(5).mkString(", "))
    val expected = texts.flatMap { case (id, tx) =>
      val bytes = tx.getBytes("UTF-8")
      val nf = bytes.length / 64
      (0 until nf).filter(_ % 4 == 0).map { i =>
        val frame = bytes.slice(i * 64, i * 64 + 64)
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(frame).map("%02x".format(_)).mkString
        (id, i, h, 64L)
      }
    }.sortBy(r => (r._1, r._2))
    val got = run("qm2_frame_sample")
      .as[(Long, Int, String, Long)].collect().toSeq
    assert(got == expected && expected.nonEmpty)
  }

  test("qt4 tokenizers split vertical tab as whitespace (Java∩RE2 explicit class)") {
    // review r18: \s is NOT engine-portable — Java's includes U+000B,
    // RE2's does not, so a VT document counted differently in Spark vs
    // the DuckDB oracle (oracle-blind: the fixture carries no VT). The
    // explicit class [ \t\n\f\r\x0B] names the same characters in both;
    // this pin holds the Spark side to the VT-splits reading.
    val rows = Seq((1L, "a\u000Bb c"), (2L, "x\ty z"), (3L, "plain"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        size(split(col("text"), "[ \\t\\n\\f\\r\\x0B]+")).as("ws"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]|[^a-z0-9 \\t\\n\\f\\r\\x0B]"), lit(0))).as("bpe"))
      .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, 3, 3), (2L, 3, 3), (3L, 1, 1)))
  }

  test("fingerprint normalization collapses vertical tab (qp2/qp10/qp15 " +
      "share the Java∩RE2 explicit whitespace class)") {
    // round 18 continuation: the qt4 lesson applied to the dedup
    // fingerprint family — its \s+ normalization was the same
    // oracle-blind trap (Java's \s includes U+000B, RE2's does not, so
    // a VT document fingerprinted differently in the two engines and
    // the dup verdict silently diverged). The explicit class holds the
    // VT-is-whitespace reading: texts differing only VT-vs-space must
    // fingerprint IDENTICALLY.
    val fps = Seq((1L, "hello\u000Bworld"), (2L, "hello world"),
        (3L, "hello  world"), (4L, "helloworld"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        md5(trim(regexp_replace(lower(col("text")),
          "[ \\t\\n\\f\\r\\x0B]+", " "))).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(2L) && fps(2L) == fps(3L))
    assert(fps(4L) != fps(1L))
  }
}
