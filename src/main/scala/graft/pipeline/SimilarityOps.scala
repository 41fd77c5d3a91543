package graft.pipeline

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbor: a k-means coarse quantizer
  * assigns every vector to its nearest centroid (the inverted-file bucket);
  * queries probe only the `nprobe` nearest buckets, so the scan cost drops
  * from |corpus| to ~|corpus| * nprobe / k. This is the second ANN path
  * next to the hyperplane-LSH buckets (qe3) and the brute-force baseline
  * (qe2) that EmbeddingSpec measures recall against.
  *
  * Scale: the quantizer is fit once (small sample suffices at 100 TB);
  * centroids broadcast; the bucket assignment is a shuffle-free column
  * computation and search is an equi-join on bucket id.
  */
object SimilarityOps {

  final case class IvfIndex(assigned: DataFrame, centroids: Array[(Int, Array[Double])])

  /** Rows the quantizer fit may consume — k-means iterates its input
    * maxIter times, so the fit runs on a deterministic hash sample
    * capped near this size while ASSIGNMENT still covers every row
    * (the class doc's scale contract, made real in review r16). */
  private val FitSampleTarget = 65536L

  /** Fit the coarse quantizer (on a bounded deterministic sample) and
    * assign every row to a bucket. */
  def ivfIndex(spark: SparkSession, embeddings: DataFrame, idCol: String,
      arrCol: String, k: Int = 16): IvfIndex = {
    val withVec = embeddings.withColumn("__vec",
      array_to_vector(col(arrCol).cast("array<double>")))
    // deterministic md5-rate sample for the fit: 10 k-means iterations
    // over the FULL corpus would be 10 corpus passes at 100 TB; the
    // centroids need only a representative sample. Membership is
    // SamplingOps.targetKeep (a pure function of the id on a 32-bit
    // hash space), so the fit set — hence the index — is reproducible
    // across runs and cluster sizes AND stays ~FitSampleTarget at any
    // corpus size (a permil rate floored at 1 would grow the fit as
    // n/1000 past ~65.5M rows; ADVICE r17). The count is
    // column-pruned (id only), which a parquet-backed source answers
    // from footer metadata, not a data pass.
    val n = embeddings.select(col(idCol)).count()
    val fitSet =
      if (n <= FitSampleTarget) withVec
      else withVec.where(SamplingOps.targetKeep(
        col(idCol), n, FitSampleTarget, salt = "ivf|"))
    val model = new KMeans().setK(k).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("__vec").setPredictionCol("__bucket")
      .fit(fitSet)
    val assigned = model.transform(withVec)
      .select(col(idCol), col(arrCol), col("__bucket").as("bucket"))
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }
    IvfIndex(assigned, centroids)
  }

  /** Probe the `nprobe` nearest buckets per query and return the cosine
    * top-k within them. Queries are rows of the index itself (self-search,
    * excluding the query id). */
  def ivfSearch(spark: SparkSession, index: IvfIndex, queryIds: Seq[Long],
      idCol: String, arrCol: String, topK: Int = 3,
      nprobe: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val centroidDf = index.centroids.toSeq
      .map { case (b, arr) => (b, arr.map(_.toFloat)) }
      .toDF("cbucket", "carr")
    val queries = index.assigned
      .where(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"), col(arrCol).as("qe"))
    // nearest nprobe centroids per query (tiny cross join, broadcast)
    val probeW = Window.partitionBy($"qid")
      .orderBy($"cdist".asc, $"cbucket".asc)
    val probes = queries.crossJoin(broadcast(centroidDf))
      .withColumn("cdist",
        expr(s"graft_dot(qe, qe) + graft_dot(carr, carr) - 2 * graft_dot(qe, carr)"))
      .withColumn("rn", row_number().over(probeW))
      .where($"rn" <= nprobe)
      .select($"qid", $"qe", $"cbucket".as("bucket"))
    // search only the probed buckets
    val rankW = Window.partitionBy($"qid")
      .orderBy($"cosine".desc, $"nid".asc)
    probes.join(index.assigned
      .select(col(idCol).as("nid"), col(arrCol).as("ne"), col("bucket")),
      Seq("bucket"))
      .where($"nid" =!= $"qid")
      // zero-norm guard (every other cosine path has it): a zero
      // vector's cosine is 0/0 = NaN, and Spark sorts NaN ABOVE every
      // real double, so it would take rnk=1 in each shared bucket
      .where(expr("graft_dot(ne, ne)") > 0)
      .withColumn("cosine",
        expr("graft_dot(qe, ne)")
          / (sqrt(expr("graft_dot(qe, qe)")) * sqrt(expr("graft_dot(ne, ne)"))))
      .withColumn("rnk", row_number().over(rankW))
      .where($"rnk" <= topK)
      .select($"qid", $"nid", $"cosine", $"rnk")
  }
}
