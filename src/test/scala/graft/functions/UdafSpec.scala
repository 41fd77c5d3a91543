package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class UdafSpec extends SparkSuite {
  import spark.implicits._

  test("multiset aggregator counts occurrences per key") {
    Udafs.register(spark)
    val got = Seq((1, 5), (1, 5), (1, 3), (2, 7)).toDF("k", "v")
      .groupBy($"k").agg(expr("graft_multiset(v)").as("ms"))
      .as[(Int, Map[Int, Int])].collect().toMap
    assert(got(1) == Map(5 -> 2, 3 -> 1))
    assert(got(2) == Map(7 -> 1))
  }

  test("weighted average aggregator (typed + SQL registration)") {
    Udafs.register(spark)
    val df = Seq((1.0, 1.0), (3.0, 3.0)).toDF("value", "weight")
    val got = df.agg(expr("graft_weighted_avg(value, weight)")).as[Double].head()
    assert(math.abs(got - 2.5) < 1e-12) // (1*1 + 3*3) / 4
  }

  test("HLL sketch estimates distinct counts within error bounds") {
    Udafs.register(spark)
    val n = 50000
    val est = spark.range(n)
      .selectExpr("CAST(id AS STRING) AS s")
      .agg(expr("graft_hll(s)")).as[Long].head()
    // p=12 → standard error ~1.6%; allow 5 sigma
    assert(math.abs(est - n).toDouble / n < 0.08,
      s"HLL estimate $est too far from $n")
    // small cardinalities go through linear counting: near-exact
    val small = spark.range(100).selectExpr("CAST(id AS STRING) AS s")
      .agg(expr("graft_hll(s)")).as[Long].head()
    assert(math.abs(small - 100) <= 2, s"small-range estimate was $small")
  }

  test("HLL sketches merge: overlapping partial sketches combine by register max") {
    // the property that matters at 100 TB: per-shard sketches built
    // independently (different days/tables) merge into the exact sketch
    // the union would have produced — duplicates across shards collapse
    val agg = new Udafs.HllAgg()
    var s1 = agg.zero
    var s2 = agg.zero
    (0 until 30000).foreach(i => s1 = agg.reduce(s1, i.toString))
    (15000 until 45000).foreach(i => s2 = agg.reduce(s2, i.toString))
    val est = agg.finish(agg.merge(s1.clone, s2))
    assert(math.abs(est - 45000).toDouble / 45000 < 0.08,
      s"merged estimate $est vs exact 45000")
    // self-merge changes nothing (idempotent register max)
    assert(agg.finish(agg.merge(s1.clone, s1)) == agg.finish(s1))
  }

  test("KMV sketch: exact below k, estimator accuracy above, dedup on hash") {
    Udafs.register(spark)
    // below k: exact distinct count (duplicates collapse in the sketch)
    val small = Seq("a", "b", "c", "a", "b").toDF("s")
      .agg(expr("graft_kmv(s)")).as[Long].head()
    assert(small == 3L)
    // above k: KMV estimator, relative error ~1/sqrt(k-2) (~13%), 5 sigma
    val n = 20000
    val est = spark.range(n).selectExpr("CAST(id AS STRING) AS s")
      .repartition(8) // exercise partial-sketch merge across partitions
      .agg(expr("graft_kmv(s)")).as[Long].head()
    assert(math.abs(est - n).toDouble / n < 0.65, s"KMV estimate $est vs $n")
  }

  test("KMV sketches merge: union-and-trim equals the sketch of the union") {
    val agg = new Udafs.KmvAgg()
    var s1 = agg.zero
    var s2 = agg.zero
    var sBoth = agg.zero
    (0 until 3000).foreach { i => s1 = agg.reduce(s1, i.toString) }
    (1500 until 4500).foreach { i => s2 = agg.reduce(s2, i.toString) }
    (0 until 4500).foreach { i => sBoth = agg.reduce(sBoth, i.toString) }
    // bottom-k sketches merge EXACTLY: the k minima of the union are the
    // k minima of the merged minima — duplicates across shards collapse
    val merged = agg.merge(s1.clone, s2)
    assert(merged.toSeq == sBoth.toSeq)
    assert(agg.finish(merged) == agg.finish(sBoth))
    // self-merge changes nothing
    assert(agg.merge(s1.clone, s1).toSeq == s1.toSeq)
  }

  test("KMV theta set ops: exact below k, bounded error above, zero-overlap sanity") {
    val agg = new Udafs.KmvSketchAgg()
    def sketch(xs: Seq[String]): Array[Long] =
      xs.foldLeft(agg.zero)(agg.reduce)
    // exact regime: both sketches below k=64 -> exact intersection/diff
    val a = sketch((0 until 40).map("v" + _))
    val b = sketch((25 until 60).map("v" + _))
    assert(Udafs.kmvIntersect(a, b) === 15L) // v25..v39
    assert(Udafs.kmvDiff(a, b) === 25L)      // v0..v24
    assert(Udafs.kmvDiff(b, a) === 20L)      // v40..v59
    // disjoint sets -> zero intersection, diff == |A| exactly
    val c = sketch((100 until 140).map("w" + _))
    assert(Udafs.kmvIntersect(a, c) === 0L)
    assert(Udafs.kmvDiff(a, c) === 40L)
    // sampled regime: 20k vs 20k with 10k overlap; theta-sketch error
    // ~1/sqrt(k-1) (~13% at k=64) — allow 5 sigma
    val bigA = sketch((0 until 20000).map("x" + _))
    val bigB = sketch((10000 until 30000).map("x" + _))
    val inter = Udafs.kmvIntersect(bigA, bigB)
    val diff = Udafs.kmvDiff(bigA, bigB)
    assert(math.abs(inter - 10000).toDouble / 10000 < 0.65,
      s"intersection estimate $inter vs 10000")
    assert(math.abs(diff - 10000).toDouble / 10000 < 0.65,
      s"difference estimate $diff vs 10000")
    // the estimates compose: |A| ~ |A n B| + |A \ B| by construction
    // (both count over the same theta restriction)
    val estA = inter + diff
    assert(math.abs(estA - 20000).toDouble / 20000 < 0.5)
    // union finisher == the KMV estimator over the union sketch (the
    // exact mergeability property), and exact below k
    val est = new Udafs.KmvAgg()
    assert(Udafs.kmvUnion(a, b) === 60L) // v0..v59 exact
    assert(Udafs.kmvUnion(bigA, bigB) ===
      est.finish(est.merge(bigA.clone(), bigB)))
    // jaccard: exact small sets (15 common / 60 total), bounded big
    assert(Udafs.kmvJaccard(a, b) === 15.0 / 60.0)
    assert(Udafs.kmvJaccard(a, c) === 0.0)
    assert(Udafs.kmvJaccard(Array.empty[Long], Array.empty[Long]) === 0.0)
    val jac = Udafs.kmvJaccard(bigA, bigB) // true 10k/30k = 0.333
    assert(math.abs(jac - 1.0 / 3) < 0.25, s"jaccard estimate $jac")
  }

  test("KLL-seat quantile sample: rank error bound and partition-count invariance") {
    Udafs.register(spark)
    val n = 20000
    val base = spark.range(n)
      .selectExpr("CAST(id AS STRING) AS id", "CAST(id AS DOUBLE) AS v")
    // identical sketch regardless of the aggregation tree: 1 partition,
    // 8 partitions, 29 partitions — membership is a pure function of the
    // data (the order-independence a randomized KLL cannot give)
    val samples = Seq(1, 8, 29).map { p =>
      base.repartition(p).agg(expr("graft_kll(id, v)"))
        .as[Seq[Double]].head()
    }
    assert(samples(0) == samples(1) && samples(1) == samples(2))
    // the sample median estimates the true median with ~1/sqrt(k) rank
    // error (k=64 -> 12.5%; allow 5 sigma-ish: 40% of n)
    val med = samples.head((samples.head.size + 1) / 2 - 1)
    assert(math.abs(med - n / 2.0) / n < 0.4, s"median estimate $med")
  }

  test("CMS sketch: partition-count invariance and overestimate guarantee") {
    Udafs.register(spark)
    val n = 20000
    val base = spark.range(n).selectExpr("id % 997 AS v")
    // counters are sums -> the sketch is bit-identical under any
    // aggregation tree (the property SpaceSaving-style summaries lack)
    val sketches = Seq(1, 8, 29).map { p =>
      base.repartition(p).agg(expr("graft_cms(v)")).as[Seq[Long]].head()
    }
    assert(sketches(0) == sketches(1) && sketches(1) == sketches(2))
    assert(sketches.head.sum == n.toLong * Udafs.CmsD) // every row counted d times
    // point estimates never underestimate; absent keys only overestimate
    val sk = sketches.head.toArray
    val exact = (0L until n).groupBy(_ % 997).view.mapValues(_.size.toLong)
    Seq(0L, 13L, 499L, 996L).foreach { k =>
      assert(Udafs.cmsEst(sk, k) >= exact(k), s"key $k underestimated")
    }
    assert(Udafs.cmsEst(sk, 123456789L) >= 0L)
    // negative keys hash into range (floorMod), no exception
    assert(Udafs.cmsEst(sk, -5L) >= 0L)
  }

  test("string-keyed CMS estimates exact token counts on a tiny vocabulary") {
    Udafs.register(spark)
    // 5 distinct tokens in 2048 buckets: collision-free, estimates exact
    val words = Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
      Seq.fill(9)("gamma") ++ Seq("delta", "epsilon")
    val sk = words.toDF("w").repartition(7)
      .agg(expr("graft_cms_str(w)")).as[Seq[Long]].head().toArray
    assert(Udafs.cmsEstStr(sk, "alpha") == 40L)
    assert(Udafs.cmsEstStr(sk, "beta") == 25L)
    assert(Udafs.cmsEstStr(sk, "gamma") == 9L)
    assert(Udafs.cmsEstStr(sk, "missing") == 0L)
  }

  test("Bloom filter: no false negatives, partition invariance, OR-merge of halves") {
    Udafs.register(spark)
    val keys = (0 until 5000).map(i => s"key_$i")
    val df = keys.toDF("k")
    // bit-OR counters are idempotent sums -> identical under any
    // aggregation tree (the same invariance the CMS/KLL seats pin)
    val sketches = Seq(1, 8, 29).map { p =>
      df.repartition(p).agg(expr("graft_bloom(k)")).as[Seq[Long]].head()
    }
    assert(sketches(0) == sketches(1) && sketches(1) == sketches(2))
    val sk = sketches.head.toArray
    // membership NEVER false-negative
    assert(keys.forall(Udafs.bloomContains(sk, _)))
    // 5k keys x 4 rows in 2^20 bits: fpp ~ 4e-7 per probe — a 2k-probe
    // absent sample stays clean with huge margin
    val fp = (0 until 2000).count(i => Udafs.bloomContains(sk, s"absent_$i"))
    assert(fp <= 2, s"false-positive count $fp")
    // merging disjoint halves ORs into exactly the full filter
    val h1 = keys.take(2500).toDF("k")
      .agg(expr("graft_bloom(k)")).as[Seq[Long]].head()
    val h2 = keys.drop(2500).toDF("k")
      .agg(expr("graft_bloom(k)")).as[Seq[Long]].head()
    assert(h1.zip(h2).map { case (a, b) => a | b } == sketches.head)
  }

  test("reservoir partial-agg equals the qp12 window formulation per stratum") {
    Udafs.register(spark)
    // the same per-lang bottom-8 sample, via partial aggregation (the
    // 100 TB shape: no corpus sort) vs the window row_number (qp12)
    val viaAgg = graft.Engine.table(spark, sf, "documents")
      .selectExpr("lang", "CAST(doc_id AS STRING) AS id")
      .repartition(13) // exercise cross-partition partial merge
      .groupBy($"lang").agg(expr("graft_reservoir(id)").as("ids"))
      .as[(String, Seq[String])].collect().toMap
    val viaWindow = graft.SparkEntry.queries("qp12_reservoir_sample")(
        spark, sf)
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3.toString).toSeq)
      .toMap
    assert(viaAgg == viaWindow)
    // partition-count invariance: membership is a pure function of data
    val again = graft.Engine.table(spark, sf, "documents")
      .selectExpr("lang", "CAST(doc_id AS STRING) AS id")
      .repartition(2)
      .groupBy($"lang").agg(expr("graft_reservoir(id)").as("ids"))
      .as[(String, Seq[String])].collect().toMap
    assert(again == viaAgg)
  }

  test("CMS sketches merge: elementwise sum equals the sketch of the union") {
    val agg = new Udafs.CmsAgg()
    var s1 = agg.zero
    var s2 = agg.zero
    var sBoth = agg.zero
    (0L until 3000L).foreach { i => s1 = agg.reduce(s1, i % 37) }
    (0L until 2000L).foreach { i => s2 = agg.reduce(s2, i % 53) }
    (0L until 3000L).foreach { i => sBoth = agg.reduce(sBoth, i % 37) }
    (0L until 2000L).foreach { i => sBoth = agg.reduce(sBoth, i % 53) }
    assert(agg.merge(s1.clone, s2).toSeq == sBoth.toSeq)
  }

  test("KLL-seat sketches merge: union-and-trim equals the sketch of the union") {
    val agg = new Udafs.KllAgg()
    var s1 = agg.zero
    var s2 = agg.zero
    var sBoth = agg.zero
    (0 until 3000).foreach { i =>
      s1 = agg.reduce(s1, Udafs.KllIn(i.toString, i.toDouble)) }
    (1500 until 4500).foreach { i =>
      s2 = agg.reduce(s2, Udafs.KllIn(i.toString, i.toDouble)) }
    (0 until 4500).foreach { i =>
      sBoth = agg.reduce(sBoth, Udafs.KllIn(i.toString, i.toDouble)) }
    val merged = agg.merge((s1._1.clone, s1._2.clone), s2)
    assert(merged._1.toSeq == sBoth._1.toSeq)
    assert(merged._2.toSeq == sBoth._2.toSeq)
    assert(agg.finish(merged).toSeq == agg.finish(sBoth).toSeq)
    // idempotent: overlapping shards collapse (0-3000 appears in both)
    assert(agg.merge((s1._1.clone, s1._2.clone), s1)._1.toSeq == s1._1.toSeq)
  }

  test("scalar UDF registration surface (ScalarFunction parity)") {
    spark.udf.register("graft_double_it", (x: Long) => x * 2)
    val got = spark.sql("SELECT graft_double_it(21)").as[Long].head()
    assert(got == 42L)
  }

  test("UDTF surface: UDF returning array + explode (TableFunction parity)") {
    spark.udf.register("graft_split_words", (s: String) => s.split(" "))
    val got = Seq("a b c").toDF("s")
      .select(explode(expr("graft_split_words(s)")).as("w"))
      .as[String].collect().toSeq
    assert(got == Seq("a", "b", "c"))
  }
}
