package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, MinMaxScaler, StandardScaler}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FlinkML capability parity via spark.ml (SURVEY.md §2.12): the
  * reference's preprocessing (StandardScaler/MinMaxScaler,
  * flink-ml preprocessing package), MultipleLinearRegression
  * (regression/MultipleLinearRegression.scala), KNN via LSH (knn package +
  * our BucketedRandomProjectionLSH), and its Estimator/Transformer/Pipeline
  * contract (pipeline/{Estimator,Transformer,Predictor}.scala ↔
  * spark.ml Pipeline). ALS (recommendation/ALS.scala) is available in
  * spark.ml with the same latent-factor semantics.
  *
  * All wrappers take the embeddings-style layout (id, Array[Float]) and
  * return DataFrames — no driver-side data movement.
  */
object MlOps {

  /** Array[Float] column → ml Vector column (the bridge from our data
    * model to spark.ml's). */
  def toVectors(df: DataFrame, arrayCol: String, vecCol: String): DataFrame =
    df.withColumn(vecCol,
      array_to_vector(col(arrayCol).cast("array<double>")))

  /** z-score standardization (reference: preprocessing/StandardScaler). */
  def standardScale(df: DataFrame, inCol: String, outCol: String): DataFrame = {
    val scaler = new StandardScaler()
      .setInputCol(inCol).setOutputCol(outCol)
      .setWithMean(true).setWithStd(true)
    scaler.fit(df).transform(df)
  }

  /** [0,1] rescaling (reference: preprocessing/MinMaxScaler). */
  def minMaxScale(df: DataFrame, inCol: String, outCol: String): DataFrame = {
    val scaler = new MinMaxScaler().setInputCol(inCol).setOutputCol(outCol)
    scaler.fit(df).transform(df)
  }

  /** Approximate KNN join via bucketed random projection LSH (reference:
    * flink-ml KNN + our scale path for similarity search). Returns
    * (idA, idB, distance) pairs within `threshold` euclidean distance. */
  def approxSimilarityJoin(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bucketLength: Double = 2.0): DataFrame = {
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol(vecCol).setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(3).setSeed(42L)
    val model = lsh.fit(df)
    model.approxSimilarityJoin(df, df, threshold, "dist")
      .where(col(s"datasetA.$idCol") < col(s"datasetB.$idCol"))
      .select(col(s"datasetA.$idCol").as("id_a"),
        col(s"datasetB.$idCol").as("id_b"), col("dist"))
  }

  /** ALS collaborative filtering (reference: flink-ml
    * recommendation/ALS.scala — same latent-factor model): fit on
    * (user, item, rating) and return the model's predictions for the
    * training pairs. */
  def als(ratings: DataFrame, userCol: String, itemCol: String,
      ratingCol: String, rank: Int = 8, iters: Int = 8): DataFrame = {
    val model = new org.apache.spark.ml.recommendation.ALS()
      .setUserCol(userCol).setItemCol(itemCol).setRatingCol(ratingCol)
      .setRank(rank).setMaxIter(iters).setSeed(42L).setNonnegative(true)
      .fit(ratings)
    model.setColdStartStrategy("drop").transform(ratings)
  }

  /** Linear SVM classifier (reference: flink-ml classification/SVM.scala —
    * CoCoA-optimized soft-margin linear SVM; spark.ml's LinearSVC solves
    * the same hinge-loss objective with OWLQN). Returns predictions for
    * `data` with a `prediction` column in {0.0, 1.0}. */
  def linearSvm(train: DataFrame, featuresCol: String, labelCol: String,
      data: DataFrame, maxIter: Int = 20, regParam: Double = 0.01): DataFrame = {
    val svc = new org.apache.spark.ml.classification.LinearSVC()
      .setFeaturesCol(featuresCol).setLabelCol(labelCol)
      .setMaxIter(maxIter).setRegParam(regParam)
    svc.fit(train).transform(data)
  }

  /** Polynomial feature expansion (reference: flink-ml
    * preprocessing/PolynomialFeatures.scala → spark.ml
    * PolynomialExpansion, same monomial basis up to `degree`). */
  def polynomialFeatures(df: DataFrame, inCol: String, outCol: String,
      degree: Int = 2): DataFrame =
    new org.apache.spark.ml.feature.PolynomialExpansion()
      .setInputCol(inCol).setOutputCol(outCol).setDegree(degree)
      .transform(df)

  /** Train/test split (reference: flink-ml pipeline/Splitter.scala
    * trainTestSplit): seeded random partition — deterministic per seed. */
  def trainTestSplit(df: DataFrame, trainFraction: Double,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    val Array(train, test) =
      df.randomSplit(Array(trainFraction, 1.0 - trainFraction), seed)
    (train, test)
  }

  /** K-fold assignment (reference: Splitter.kFoldSplit): adds a
    * deterministic `fold` column in [0, k) — a hash partition, so folds
    * are reproducible across runs/cluster sizes without materializing k
    * DataFrames. */
  def kFold(df: DataFrame, idCol: String, k: Int): DataFrame =
    df.withColumn("fold", pmod(xxhash64(col(idCol)), lit(k)).cast("int"))

  /** Stochastic Outlier Selection (reference: flink-ml
    * outlier/StochasticOutlierSelection.scala — same affinity →
    * binding-probability → outlier-probability pipeline): per point,
    * a Gaussian affinity over squared distances with the bandwidth
    * solved per-row so the distribution's perplexity hits the target;
    * outlier probability of j = Π over i of (1 − binding(i→j)).
    *
    * SOS is inherently all-pairs — the reference broadcasts the full
    * dataset too (StochasticOutlierSelection.scala computes a dense
    * distance matrix). Scope it to a candidate set (a bucket, a
    * partition, a sample) at scale; the per-row beta search runs
    * distributed via groupByKey over the pair rows.
    *
    * @param df (id, Array[Float]) rows
    * @return (id, outlier_prob)
    */
  def stochasticOutlierSelection(df: DataFrame, idCol: String,
      vecCol: String, perplexity: Double = 4.5): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val base = df.select(col(idCol).cast("long").as("pid"),
      col(vecCol).cast("array<float>").as("v"))
    val pairs = base.as("x").join(base.as("y"), col("x.pid") =!= col("y.pid"))
      .select(col("x.pid").as("i"), col("y.pid").as("j"),
        (expr("graft_dot(x.v, x.v)") + expr("graft_dot(y.v, y.v)")
          - lit(2.0) * expr("graft_dot(x.v, y.v)")).as("d2"))
      .as[(Long, Long, Double)]
    // per source row i: bisection on beta until the affinity
    // distribution's perplexity matches, then emit binding probs i→j
    val bindings = pairs.groupByKey(_._1).flatMapGroups {
      (i: Long, it: Iterator[(Long, Long, Double)]) =>
        val ds = it.map(t => (t._2, t._3)).toArray
        val logPerp = math.log(perplexity)
        def entropyAndAff(beta: Double): (Double, Array[Double]) = {
          val aff = ds.map { case (_, d2) => math.exp(-d2 * beta) }
          val sumA = aff.sum
          if (sumA <= 0) (0.0, aff)
          else {
            // H = log(sumA) + beta * sum(d2 * a) / sumA
            val h = math.log(sumA) +
              beta * ds.zip(aff).map { case ((_, d2), a) => d2 * a }.sum / sumA
            (h, aff)
          }
        }
        var lo = 1e-12; var hi = 1e12; var beta = 1.0
        var aff = Array.empty[Double]
        var iter = 0
        while (iter < 64) {
          beta = math.sqrt(lo * hi)
          val (h, a) = entropyAndAff(beta)
          aff = a
          if (h > logPerp) lo = beta else hi = beta
          iter += 1
        }
        val sumA = aff.sum
        if (sumA <= 0) Iterator.empty
        else ds.zip(aff).iterator.map { case ((j, _), a) => (j, a / sumA) }
    }.toDF("j", "b")
    // outlier prob of j = Π over senders i of (1 - b_ij): high when no
    // other point binds to j (the SOS paper's f(x); product via
    // log-sum). A sender that binds j with b = 1 EXACTLY (its only
    // neighbor, or every other affinity underflowed) makes that factor
    // log(0) = NULL, which sum() silently DROPS — inflating the
    // probability of precisely the most-bound point (and a 2-point
    // input went all-NULL); any b >= 1 means the product is 0 by
    // inspection, so guard before the log (review r17)
    bindings.groupBy(col("j").as(idCol))
      .agg(when(max(col("b")) >= 1.0, lit(0.0))
        .otherwise(exp(sum(log(lit(1.0) - col("b")))))
        .as("outlier_prob"))
  }

  /** Linear regression pipeline (reference: MultipleLinearRegression). */
  def linearRegression(train: DataFrame, featuresCol: String,
      labelCol: String): (DataFrame, Array[Double]) = {
    val lr = new LinearRegression()
      .setFeaturesCol(featuresCol).setLabelCol(labelCol)
      .setMaxIter(20).setRegParam(0.0)
    val model = new Pipeline().setStages(Array(lr)).fit(train)
    val fitted = model.stages.head
      .asInstanceOf[org.apache.spark.ml.regression.LinearRegressionModel]
    (model.transform(train), fitted.coefficients.toArray :+ fitted.intercept)
  }
}
