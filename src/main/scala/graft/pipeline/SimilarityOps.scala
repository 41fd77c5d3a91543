package graft.pipeline

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    val base = unitized(embeddings, idCol, arrCol)
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

  // ---------------------------------------------------------------------
  // The SEMANTIC ingest gate + corpus vector artifact — the embedding
  // member of the stream-static gate family (exact: qp15/qp16 Bloom;
  // near-dup: DedupQueries.nearDupGate; span overlap: winnowGate;
  // semantic: this). The corpus side is a PRECOMPUTED artifact of
  // (doc_id, unit, bucket) rows — unit-normalized vectors IVF-assigned
  // to their nearest centroid — appended one idempotent epoch per
  // accepted increment exactly like the band/print artifacts. Incoming
  // docs probe the `nprobe` nearest buckets and flag any corpus vector
  // whose cosine clears the SemDeDup threshold. Everything on the
  // stream side is a row-local column expression (the nearest-bucket
  // selection happens INSIDE an array_sort over a literal centroid
  // array, never a window or aggregate), so the same code runs batch
  // and streaming (append mode).
  // ---------------------------------------------------------------------

  /** Column-level squared Euclidean distance, term-for-term identical
    * to [[EmbeddingQueries.d2Expr]] (float addition is non-associative;
    * one term order across the IVF family keeps near-tie probe
    * rankings consistent between the artifact's bucket assignment and
    * the gate's probe ranking). */
  private def d2c(a: Column, b: Column): Column =
    call_function("graft_dot", a, a) -
      lit(2.0d) * call_function("graft_dot", a, b) +
      call_function("graft_dot", b, b)

  /** (id[, extra...], __n2, __unit) of an embeddings frame — the ONE
    * normalization every vector-artifact producer and consumer shares
    * (ivfIndex's inlined form refactored onto it), so a doc appended to
    * the artifact and the same doc arriving at the gate normalize
    * identically. Zero-norm vectors keep their raw array and __n2 = 0
    * for the caller to filter. */
  private def unitized(df: DataFrame, idCol: String, arrCol: String,
      extra: Seq[String] = Nil): DataFrame =
    df.select((col(idCol) +: extra.map(col)) :+
        col(arrCol).cast("array<float>").as(arrCol): _*)
      .withColumn("__n2", expr(s"graft_dot(`$arrCol`, `$arrCol`)"))
      .withColumn("__unit", expr(
        s"""CASE WHEN __n2 > 0
           |  THEN transform(`$arrCol`, x -> CAST(x / sqrt(__n2) AS FLOAT))
           |  ELSE `$arrCol` END""".stripMargin))

  /** The `nprobe` nearest centroid buckets of a unit vector as ONE
    * row-local array expression: d2 to every centroid of a LITERAL
    * broadcast-free centroid array, array_sort on (d2, bucket), slice.
    * No window, no aggregate — legal in a streaming append plan, which
    * is the whole reason the gate can share code batch/stream. */
  private def nearestBuckets(unit: Column,
      centroids: Array[(Int, Array[Double])], nprobe: Int): Column = {
    require(centroids.nonEmpty, "nearestBuckets: empty centroid set")
    val centArr = array(centroids.toSeq.map { case (b, c) =>
      struct(lit(b).as("bucket"),
        typedLit(c.map(_.toFloat).toSeq).as("cvec"))
    }: _*)
    val ranked = array_sort(transform(centArr, c =>
      struct(d2c(unit, c.getField("cvec")).as("d2"),
        c.getField("bucket").as("bucket"))))
    transform(slice(ranked, 1, nprobe), x => x.getField("bucket"))
  }

  /** The (doc_id, unit, bucket) corpus vector table of an embeddings
    * frame — [[docBands]]/[[docPrints]]'s twin for the semantic family:
    * unit-normalized vectors assigned to their nearest-centroid IVF
    * bucket, zero-norm vectors DROPPED (cosine is undefined for them —
    * they can neither be nor have a semantic duplicate). Stateless
    * column expressions only (the assignment is [[nearestBuckets]] at
    * nprobe = 1), so it runs identically batch and streaming; at 100 TB
    * the corpus-side result is the precomputed artifact the gate's
    * stream-static join consumes, and the centroid set is the small
    * fit-time artifact ([[ivfIndex]].centroids) that rides beside it. */
  def docVectors(docs: DataFrame, centroids: Array[(Int, Array[Double])],
      idCol: String = "doc_id", arrCol: String = "embedding",
      extra: Seq[String] = Nil): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    unitized(docs, idCol, arrCol, extra)
      .where(col("__n2") > 0)
      .select((col(idCol).as("doc_id") +: extra.map(col)) ++ Seq(
        col("__unit").as("unit"),
        element_at(nearestBuckets(col("__unit"), centroids, 1), 1)
          .as("bucket")): _*)
  }

  /** The semantic ingest gate: incoming docs' embeddings probe the
    * `nprobe` nearest IVF buckets of a PRECOMPUTED corpus vector table
    * ([[docVectors]] output / [[readCorpusVectors]]) and flag DISTINCT
    * (doc_id, old_id) pairs whose exact cosine clears `tau6` (a
    * floor-scaled 1e6 fixed-point threshold — 950000 = cosine ≥ 0.95,
    * the SemDeDup screening posture). Both sides are unit vectors, so
    * the dot IS the cosine. Like the other gates this is the cheap
    * first-pass cut — candidates come from the probed buckets only, so
    * a pair can be missed exactly when IVF recall misses it (the qe9
    * audit measures that); the batch qe5/qe8 legs are the exhaustive
    * form. Same watermark contract as nearDupGate/winnowGate (dedup
    * state bounded via dropDuplicatesWithinWatermark; a streaming call
    * without `eventTimeCol` is rejected by name). Zero-norm incoming
    * vectors emit no pairs. */
  def semanticGate(incoming: DataFrame, corpusVectors: DataFrame,
      centroids: Array[(Int, Array[Double])], tau6: Long = 950000L,
      nprobe: Int = 2, eventTimeCol: Option[String] = None,
      idCol: String = "doc_id", arrCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(incoming.sparkSession)
    val keep = eventTimeCol.toSeq
    val cand = unitized(incoming, idCol, arrCol, keep)
      .where(col("__n2") > 0)
      .select((col(idCol).as("doc_id") +: keep.map(col)) ++ Seq(
        col("__unit").as("qu"),
        explode(nearestBuckets(col("__unit"), centroids, nprobe))
          .as("bucket")): _*)
      .join(corpusVectors
        .select(col("doc_id").as("old_id"), col("unit").as("nu"),
          col("bucket")),
        Seq("bucket"))
      .where(floor(call_function("graft_dot", col("qu"), col("nu"))
        * lit(1000000.0d)).cast("long") >= tau6)
      .select((Seq("doc_id", "old_id") ++ keep).map(col): _*)
    DedupQueries.gatePairs(cand, incoming.isStreaming, eventTimeCol,
      "semanticGate")
  }

  /** [[DedupQueries.appendCorpusBands]]'s twin for the vector artifact:
    * one epoch partition of the accepted docs' (doc_id, unit, bucket)
    * rows, same commit-once idempotence contract (the shared
    * writeEpoch). The centroid set must be THE corpus index's — mixing
    * centroid generations inside one artifact root would bucket epochs
    * inconsistently, so a quantizer refresh rewrites the artifact under
    * a new root (df-view footnote of the print family, vector form). */
  def appendCorpusVectors(accepted: DataFrame, artifactRoot: String,
      epoch: Long, centroids: Array[(Int, Array[Double])],
      idCol: String = "doc_id", arrCol: String = "embedding"): Unit =
    DedupQueries.writeEpoch(
      docVectors(accepted, centroids, idCol, arrCol), artifactRoot, epoch)

  /** Read the corpus vector artifact back as the (doc_id, unit, bucket)
    * frame [[semanticGate]] consumes (epoch partition column pruned —
    * the gate screens against every epoch). */
  def readCorpusVectors(spark: SparkSession, artifactRoot: String): DataFrame =
    spark.read.parquet(artifactRoot).select("doc_id", "unit", "bucket")

  /** The streaming form of [[appendCorpusVectors]] — foreachBatch at
    * the epochId, exactly as corpusBandAppender/corpusPrintAppender. */
  def corpusVectorAppender(accepted: DataFrame, artifactRoot: String,
      centroids: Array[(Int, Array[Double])],
      idCol: String = "doc_id", arrCol: String = "embedding"
      ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(accepted.isStreaming,
      "corpusVectorAppender is the streaming form; batch callers use " +
        "appendCorpusVectors(df, root, epoch, centroids) with their own " +
        "epoch key")
    accepted.writeStream.outputMode("append").foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
       epochId: Long) =>
        appendCorpusVectors(batch, artifactRoot, epochId, centroids,
          idCol, arrCol)
    }
  }
}
