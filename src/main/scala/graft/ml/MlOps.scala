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
