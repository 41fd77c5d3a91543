package graft.pipeline

import graft.{Engine, SparkSuite}
import org.apache.spark.sql.functions._

class EmbeddingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val vecs: Map[Long, Array[Float]] =
    Engine.table(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  test("qe1 norms match a direct Scala computation") {
    val got = run("qe1_embed_norm").as[(Long, Double)].collect().toMap
    vecs.take(20).foreach { case (id, v) =>
      val expected = v.map(x => x.toDouble * x.toDouble).sum
      assert(math.abs(got(id) - expected) < 1e-9, s"vec $id")
    }
  }

  test("qe2 brute-force knn returns the true top-3 neighbors") {
    val got = run("qe2_knn_brute").select($"qid", $"nid", $"rnk")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._3).map(_._2).toSeq
      }
    (0L until 5L).foreach { q =>
      val expected = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cosine(vecs(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1)
      assert(got(q) == expected, s"query $q")
    }
  }

  test("IVF search recalls most of the exact top-3 neighbors") {
    val e = graft.Engine.table(spark, sf, "embeddings")
    val index = SimilarityOps.ivfIndex(spark, e, "vec_id", "embedding", k = 8)
    val queryIds = (0L until 20L).toSeq
    val approx = SimilarityOps.ivfSearch(spark, index, queryIds,
      "vec_id", "embedding", topK = 3, nprobe = 3)
      .select($"qid", $"nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // exact top-3 via the brute-force query
    val exact = run("qe2_knn_brute").select($"qid", $"nid")
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.5, s"IVF mean recall@3 was $meanRecall")
  }

  test("qe3 LSH buckets: same-bucket pairs are more similar than average") {
    val buckets = run("qe3_lsh_buckets").select($"vec_id", $"bucket")
      .as[(Long, Long)].collect()
    val byBucket = buckets.groupBy(_._2).values.filter(_.length > 1)
    val sameBucketPairs = byBucket.flatMap(g =>
      g.combinations(2).map { case Array((a, _), (b, _)) => cosine(vecs(a), vecs(b)) })
      .toSeq
    if (sameBucketPairs.nonEmpty) {
      val rnd = new scala.util.Random(7)
      val ids = vecs.keys.toArray
      val randomPairs = Seq.fill(500) {
        val a = ids(rnd.nextInt(ids.length)); val b = ids(rnd.nextInt(ids.length))
        cosine(vecs(a), vecs(b))
      }
      assert(sameBucketPairs.sum / sameBucketPairs.size >
        randomPairs.sum / randomPairs.size - 0.05)
    }
  }
}
