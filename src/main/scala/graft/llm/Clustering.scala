package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.Similarity.CentroidSet

/** Distributed k-means (Lloyd) over an embedding column — the
  * training loop on top of the IVF machinery: assignment is the same
  * shuffle-free [[graft.plans.NearestCentroid]] projection the index
  * uses, and each iteration's update is ONE keyed aggregation of
  * k·dim partial sums. Centroids (k·dim doubles) are the only thing
  * that ever reaches the driver — the corpus is scanned once per
  * iteration and never shuffled by row.
  *
  * Seeding is [[Similarity.centroidSeeds]] (deterministic, bounded
  * read), so the whole fit is reproducible on any cluster size.
  */
object Clustering {

  final case class KmeansFit(centroids: CentroidSet, inertia: Double, iters: Int)

  /** Lloyd iterations until `maxIters` or relative inertia improvement
    * < `tol`. Empty clusters keep their previous centroid (standard
    * small-k practice; no resampling pass).
    */
  def kmeans(corpus: DataFrame, vecCol: String, idCol: String,
      k: Int, maxIters: Int = 10, tol: Double = 1e-6): KmeansFit = {
    var cs = Similarity.centroidSeeds(corpus, vecCol, idCol, k)
    var lastInertia = Double.MaxValue
    var it = 0
    var done = false
    while (it < maxIters && !done) {
      val assigned = Similarity.ivfAssign(corpus, vecCol, idCol, cs)
        .select(col("centroid_id"), col(vecCol).as("v"))
      // one aggregation: per-(cluster, dimension) sums + counts
      val sums = assigned
        .select(col("centroid_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(sum(col("x").cast("double")).as("sx"), count(lit(1)).as("n"))
        .collect()
      val byCluster = sums.groupBy(_.getLong(0))
      val newVecs = cs.ids.zipWithIndex.map { case (cid, i) =>
        byCluster.get(cid) match {
          case Some(rows) =>
            val dim = rows.map(_.getInt(1)).max + 1
            val v = new Array[Float](dim)
            rows.foreach(r => v(r.getInt(1)) = (r.getDouble(2) / r.getLong(3)).toFloat)
            v
          case None => cs.vecs(i) // empty cluster: keep previous centroid
        }
      }
      cs = CentroidSet(cs.ids, newVecs)
      // inertia = Σ (1 - cos(x, centroid(x))) under the NEW centroids
      val inertia = Similarity.ivfAssign(corpus, vecCol, idCol, cs)
        .select(col("centroid_id"), col(vecCol).as("v"))
        .join(broadcast(centroidFrame(corpus, cs)), Seq("centroid_id"))
        .select((lit(1.0) - Similarity.cosine(col("v"), col("cv"))).as("d"))
        .agg(sum("d")).head().getDouble(0)
      it += 1
      if (lastInertia != Double.MaxValue &&
          (lastInertia - inertia) <= tol * math.abs(lastInertia)) done = true
      lastInertia = inertia
    }
    KmeansFit(cs, lastInertia, it)
  }

  /** The centroid set as a broadcastable frame (k rows). */
  def centroidFrame(like: DataFrame, cs: CentroidSet): DataFrame = {
    val spark = like.sparkSession
    import spark.implicits._
    cs.ids.zip(cs.vecs.map(_.toSeq)).toSeq.toDF("centroid_id", "cv")
  }

  /** Final assignment frame: (id, centroid_id, cos to own centroid). */
  def assign(corpus: DataFrame, vecCol: String, idCol: String,
      cs: CentroidSet): DataFrame =
    Similarity.ivfAssign(corpus, vecCol, idCol, cs)
      .join(broadcast(centroidFrame(corpus, cs)), Seq("centroid_id"))
      .select(col(idCol), col("centroid_id"),
        Similarity.cosine(col(vecCol), col("cv")).as("cos_to_centroid"))
}
