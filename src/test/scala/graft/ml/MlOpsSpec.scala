package graft.ml

import graft.{Engine, SparkSuite}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._

class MlOpsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val vecs = MlOps.toVectors(
    Engine.table(spark, sf, "embeddings"), "embedding", "features")

  test("standard scaler: zero mean, unit variance per dimension") {
    val scaled = MlOps.standardScale(vecs, "features", "scaled")
    val arr = scaled.select("scaled").collect()
      .map(_.getAs[Vector](0).toArray)
    val dim0 = arr.map(_(0))
    val mean = dim0.sum / dim0.length
    val varr = dim0.map(x => (x - mean) * (x - mean)).sum / (dim0.length - 1)
    assert(math.abs(mean) < 1e-9)
    assert(math.abs(varr - 1.0) < 1e-6)
  }

  test("min-max scaler bounds every dimension to [0,1]") {
    val scaled = MlOps.minMaxScale(vecs, "features", "scaled")
    val arr = scaled.select("scaled").collect().map(_.getAs[Vector](0).toArray)
    assert(arr.flatten.forall(v => v >= -1e-12 && v <= 1.0 + 1e-12))
  }

  test("LSH similarity join finds close pairs and respects threshold") {
    val pairs = MlOps.approxSimilarityJoin(
      vecs.select($"vec_id", $"features"), "vec_id", "features",
      threshold = 6.0)
    val rows = pairs.as[(Long, Long, Double)].collect()
    assert(rows.forall { case (a, b, d) => a < b && d <= 6.0 })
  }

  test("ALS fits customer-part purchase quantities (recommendation parity)") {
    val ratings = Engine.table(spark, sf, "lineitem")
      .join(Engine.table(spark, sf, "orders"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey".cast("int").as("user"),
        $"l_partkey".cast("int").as("item"))
      .agg(sum($"l_quantity").cast("float").as("rating"))
      .cache()
    val preds = MlOps.als(ratings, "user", "item", "rating")
    val joined = preds.select($"rating", $"prediction").as[(Float, Float)]
      .collect()
    assert(joined.nonEmpty)
    val rmse = math.sqrt(joined.map { case (r, p) =>
      val dd = (r - p).toDouble; dd * dd
    }.sum / joined.length)
    val mean = joined.map(_._1.toDouble).sum / joined.length
    val base = math.sqrt(joined.map { case (r, _) =>
      val dd = r - mean; dd * dd
    }.sum / joined.length)
    assert(rmse < base, s"ALS rmse $rmse should beat mean-baseline $base")
  }

  test("linear SVM separates labels and beats the majority-class baseline") {
    // linearly separable task on real data: label = quality proxy from
    // the embeddings table's own label column (binary split at median)
    val labeled = Engine.table(spark, sf, "embeddings")
      .withColumn("cls", (col("label") % 2 === 0).cast("double"))
    val train = MlOps.toVectors(labeled, "embedding", "features")
    val preds = MlOps.linearSvm(train, "features", "cls", train)
      .select($"cls", $"prediction").as[(Double, Double)].collect()
    val acc = preds.count(p => p._1 == p._2).toDouble / preds.length
    val majority = {
      val pos = preds.count(_._1 == 1.0).toDouble / preds.length
      math.max(pos, 1 - pos)
    }
    assert(acc >= majority,
      s"SVM train accuracy $acc must not lose to majority baseline $majority")
    assert(preds.map(_._2).distinct.length == 2,
      "SVM must actually use both classes")
  }

  test("polynomial expansion produces the degree-2 monomial basis") {
    val df = MlOps.toVectors(
      Seq((1L, Array(2.0f, 3.0f))).toDF("id", "arr"), "arr", "features")
    val out = MlOps.polynomialFeatures(df, "features", "poly", degree = 2)
      .select("poly").collect().head.getAs[Vector](0).toArray
    // spark.ml basis order: x, x^2, y, xy, y^2
    assert(out.toSeq == Seq(2.0, 4.0, 3.0, 6.0, 9.0))
  }

  test("train/test split partitions the data deterministically per seed") {
    val df = spark.range(1000).toDF("id")
    val (tr1, te1) = MlOps.trainTestSplit(df, 0.8, seed = 7L)
    val (tr2, te2) = MlOps.trainTestSplit(df, 0.8, seed = 7L)
    assert(tr1.count() + te1.count() == 1000)
    assert(tr1.collect().toSet == tr2.collect().toSet)
    assert(te1.collect().toSet == te2.collect().toSet)
    val frac = tr1.count().toDouble / 1000
    assert(frac > 0.7 && frac < 0.9)
  }

  test("kFold assigns every row to exactly one of k roughly-even folds") {
    val folds = MlOps.kFold(spark.range(1000).toDF("id"), "id", 5)
      .groupBy("fold").count().as[(Int, Long)].collect().toMap
    assert(folds.keySet == Set(0, 1, 2, 3, 4))
    assert(folds.values.sum == 1000L)
    assert(folds.values.forall(n => n > 100 && n < 300))
  }

  test("SOS ranks a planted outlier above every inlier") {
    // tight cluster at origin + one far point
    val rnd = new scala.util.Random(5)
    val rows = (0L until 20L).map(i =>
      (i, Array.fill(4)(rnd.nextGaussian().toFloat * 0.1f))) :+
      (99L, Array(5.0f, 5.0f, 5.0f, 5.0f))
    val got = MlOps.stochasticOutlierSelection(
      rows.toDF("id", "v"), "id", "v")
      .as[(Long, Double)].collect().toMap
    val outlierProb = got(99L)
    assert(got.filter(_._1 != 99L).values.forall(_ < outlierProb),
      s"outlier 99 must outrank inliers: $got")
    assert(outlierProb > 0.5)
  }

  test("SOS fully-bound points score 0, not NULL or an inflated product") {
    // review r17: b = 1 made its factor log(0) = NULL, which sum()
    // silently dropped — the most-bound (least outlying) point got the
    // HIGHEST surviving product, and a 2-point input went all-NULL.
    // Two points: each is the other's only neighbor (b = 1 regardless
    // of beta) -> both fully bound -> outlier_prob 0 exactly.
    val two = Seq((1L, Array(0f, 0f)), (2L, Array(1f, 1f))).toDF("id", "v")
    val gotTwo = MlOps.stochasticOutlierSelection(two, "id", "v")
      .as[(Long, Double)].collect().toMap
    assert(gotTwo == Map(1L -> 0.0, 2L -> 0.0), s"two-point case: $gotTwo")
    // Identical twins + one point far enough that exp(-d2*beta)
    // UNDERFLOWS at any solved beta: each twin binds its twin with
    // b = 1 exactly while the far point still sends b = 0.5 to each
    // twin. Without the guard the NULL factor dropped and the twins
    // read 0.5; fully bound means 0. The far point receives b = 0
    // from both -> outlier_prob 1 exactly.
    val tri = Seq((1L, Array(0f, 0f)), (2L, Array(0f, 0f)),
      (3L, Array(1e30f, 1e30f))).toDF("id", "v")
    val gotTri = MlOps.stochasticOutlierSelection(tri, "id", "v")
      .as[(Long, Double)].collect().toMap
    assert(gotTri(1L) == 0.0 && gotTri(2L) == 0.0, s"twins: $gotTri")
    assert(gotTri(3L) == 1.0, s"unbound far point: $gotTri")
  }

  test("linear regression recovers a known linear relationship") {
    val train = spark.range(200).select(
      $"id".cast("double").as("x"))
      .withColumn("label", $"x" * 3.0 + 7.0)
    val withFeatures = MlOps.toVectors(
      train.withColumn("arr", array($"x".cast("float"))), "arr", "features")
    val (_, coefs) = MlOps.linearRegression(withFeatures, "features", "label")
    assert(math.abs(coefs(0) - 3.0) < 1e-6)
    assert(math.abs(coefs(1) - 7.0) < 1e-4)
  }
}
