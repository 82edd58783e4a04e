package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Clustering
import graft.sources.Catalog

/** Contracts for distributed k-means: the fit improves the seeds,
  * every point lands on its nearest centroid, determinism holds, and
  * cluster count is bounded.
  */
class ClusteringSpec extends AnyFunSuite {
  import TestSession._

  private def emb = Catalog.table(spark, sfDir, "embeddings")

  test("lloyd iterations do not worsen inertia vs one step") {
    val one = Clustering.kmeans(emb, "embedding", "vec_id", k = 8, maxIters = 1)
    val five = Clustering.kmeans(emb, "embedding", "vec_id", k = 8, maxIters = 5)
    assert(five.inertia <= one.inertia * 1.0001,
      s"inertia ${five.inertia} after 5 iters vs ${one.inertia} after 1")
    assert(five.iters >= 1 && five.iters <= 5)
  }

  test("assignments land on the truly nearest centroid") {
    val fit = Clustering.kmeans(emb, "embedding", "vec_id", k = 4, maxIters = 3)
    val cf = Clustering.centroidFrame(emb, fit.centroids)
    // brute-force check: for 50 points, the assigned centroid has the
    // max cosine among all centroids
    val sample = Clustering.assign(emb.limit(50), "embedding", "vec_id", fit.centroids)
    val best = emb.limit(50).crossJoin(broadcast(cf))
      .select(col("vec_id"), col("centroid_id"),
        graft.llm.Similarity.cosine(col("embedding"), col("cv")).as("c"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("c").desc, col("centroid_id"))))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("centroid_id").as("best_cid"))
    val joined = sample.join(best, "vec_id")
      .where(col("centroid_id") =!= col("best_cid")).count()
    assert(joined == 0, s"$joined points assigned to a non-nearest centroid")
  }

  test("fit is deterministic across runs") {
    val a = Clustering.kmeans(emb, "embedding", "vec_id", k = 6, maxIters = 3)
    val b = Clustering.kmeans(emb, "embedding", "vec_id", k = 6, maxIters = 3)
    assert(a.inertia == b.inertia)
    assert(a.centroids.vecs.map(_.toSeq).toSeq == b.centroids.vecs.map(_.toSeq).toSeq)
  }
}
