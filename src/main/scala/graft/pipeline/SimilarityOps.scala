package graft.pipeline

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
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
  * Because results rank by COSINE, the quantizer runs on L2-NORMALIZED
  * vectors (review r18): on the unit sphere ‖a−b‖² = 2 − 2·cos(a,b), so
  * Euclidean k-means bucketing agrees with the target metric — on raw
  * vectors a corpus with mixed magnitudes (one source emitting 10×-scaled
  * embeddings) buckets by NORM and a query's cosine-nearest neighbor can
  * land in a never-probed bucket, collapsing recall regardless of nprobe.
  *
  * Scale: the quantizer is fit once (small sample suffices at 100 TB);
  * centroids broadcast; the bucket assignment is a shuffle-free column
  * computation and search is an equi-join on bucket id. The assignment
  * CACHES at build (review r18: an unpersisted lazy plan re-ran the
  * full-corpus KMeans transform on every reference — two per search); at
  * 100 TB it is the precomputed artifact a daily job writes once.
  */
object SimilarityOps {

  final case class IvfIndex(assigned: DataFrame, centroids: Array[(Int, Array[Double])])

  /** Rows the quantizer fit may consume — k-means iterates its input
    * maxIter times, so the fit runs on a deterministic hash sample
    * capped near this size while ASSIGNMENT still covers every row
    * (the class doc's scale contract, made real in review r16). */
  private val FitSampleTarget = 65536L

  /** Fit the coarse quantizer (on a bounded deterministic sample) and
    * assign every row to a bucket. The embedding column is cast to
    * `array<float>` HERE (review r18: search-time `graft_dot` demands
    * float arrays, so an `array<double>` corpus used to build an
    * expensive index that failed analysis at first search), and the
    * returned `assigned` carries (id, arrCol, __unit, bucket) — the
    * normalized vector rides along so search probes in the same space
    * the quantizer was fit in. */
  def ivfIndex(spark: SparkSession, embeddings: DataFrame, idCol: String,
      arrCol: String, k: Int = 16): IvfIndex = {
    graft.functions.GraftFunctions.register(spark)
    val base = embeddings
      .select(col(idCol), col(arrCol).cast("array<float>").as(arrCol))
      .withColumn("__n2", expr(s"graft_dot(`$arrCol`, `$arrCol`)"))
      .withColumn("__unit", expr(
        s"""CASE WHEN __n2 > 0
           |  THEN transform(`$arrCol`, x -> CAST(x / sqrt(__n2) AS FLOAT))
           |  ELSE `$arrCol` END""".stripMargin))
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
    require(n > 0, "ivfIndex: the embeddings input is empty — there is " +
      "nothing to fit the coarse quantizer on") // review r18: KMeans.fit
    // on empty input dies with an unnamed summarizer error otherwise
    val withVec = base.withColumn("__vec",
      array_to_vector(col("__unit").cast("array<double>")))
    val fitSet =
      if (n <= FitSampleTarget) withVec
      else withVec.where(SamplingOps.targetKeep(
        col(idCol), n, FitSampleTarget, salt = "ivf|"))
    val model = new KMeans().setK(k).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("__vec").setPredictionCol("__bucket")
      .fit(fitSet)
    val assigned = model.transform(withVec)
      .select(col(idCol), col(arrCol), col("__unit"),
        col("__bucket").as("bucket"))
      .cache()
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }
    IvfIndex(assigned, centroids)
  }

  /** Probe the `nprobe` nearest buckets per query and return the cosine
    * top-k within them. Queries are rows of the index itself (self-search,
    * excluding the query id). Zero-norm (or null/ragged) vectors are
    * guarded on BOTH sides (review r18: only the neighbor side was — a
    * zero-norm QUERY's cosines were all 0/0 = NaN, which Spark sorts
    * above every real double, so it received topK arbitrary rows instead
    * of none). Norms compute ONCE per row before the join, not per
    * candidate pair. */
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
      .select(col(idCol).as("qid"), col(arrCol).as("qe"),
        col("__unit").as("qu"),
        expr(s"graft_dot(`$arrCol`, `$arrCol`)").as("qn2"))
      .where(col("qn2") > 0)
    // nearest nprobe centroids per query (tiny cross join, broadcast);
    // probed in the NORMALIZED space the quantizer was fit in, with the
    // one canonical d2 expression (EmbeddingQueries.d2Expr)
    val probeW = Window.partitionBy($"qid")
      .orderBy($"cdist".asc, $"cbucket".asc)
    val probes = queries.crossJoin(broadcast(centroidDf))
      .withColumn("cdist", expr(EmbeddingQueries.d2Expr("qu", "carr")))
      .withColumn("rn", row_number().over(probeW))
      .where($"rn" <= nprobe)
      .select($"qid", $"qe", $"qn2", $"cbucket".as("bucket"))
    // search only the probed buckets
    val rankW = Window.partitionBy($"qid")
      .orderBy($"cosine".desc, $"nid".asc)
    probes.join(index.assigned
      .select(col(idCol).as("nid"), col(arrCol).as("ne"), col("bucket"),
        expr(s"graft_dot(`$arrCol`, `$arrCol`)").as("nn2")),
      Seq("bucket"))
      .where($"nid" =!= $"qid")
      .where($"nn2" > 0)
      .withColumn("cosine",
        expr("graft_dot(qe, ne)") / (sqrt($"qn2") * sqrt($"nn2")))
      .withColumn("rnk", row_number().over(rankW))
      .where($"rnk" <= topK)
      .select($"qid", $"nid", $"cosine", $"rnk")
  }
}
