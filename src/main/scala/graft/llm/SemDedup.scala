package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication over an embedding column
  * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication", arXiv:2303.09540).
  *
  * The pipeline is the paper's, re-expressed Spark-first:
  *   1. k-means the corpus embeddings (the distributed Lloyd of
  *      graft.llm.Clustering — broadcast-centroid assignment, one
  *      k·dim aggregate per iteration, zero corpus shuffles).
  *   2. Within each cluster ONLY, find pairs above cosine `tau` and
  *      greedily keep one representative per near-duplicate group —
  *      the member FARTHEST from the cluster centroid (the paper's
  *      keep-outliers rule, §3: "keep the examples with the lowest
  *      cosine similarity to the cluster centroid"), ties broken by
  *      id for determinism.
  *
  * The within-cluster pass is the paper's exact sequential greedy in
  * priority order (ascending cos-to-centroid, then id): a member is
  * kept iff its cosine to every ALREADY-KEPT member of its cluster is
  * ≤ tau. Chains therefore behave like the reference implementation:
  * if a~b (dropped) and b~c but a!~c, then c IS kept, because b was
  * never kept — a pure "has-any-higher-priority-neighbor" join would
  * wrongly drop c.
  *
  * Scale posture (100 TB): the quadratic work is CLUSTER-LOCAL by
  * construction — that bounded O(|c|²·dim) per cluster is SemDeDup's
  * core trick (the paper runs it per-cluster on single GPUs), and k
  * is chosen so clusters fit one executor (n/k members ≈ thousands).
  * Spark-side: one groupByKey shuffle on centroid_id, clusters
  * processed independently in parallel; nothing corpus×corpus.
  */
object SemDedup {

  /** Greedy scan of one cluster's members, pre-sorted by keep
    * priority. Returns the kept flag per member, same order.
    */
  def greedyKeep(vecs: Array[Array[Float]], tau: Double): Array[Boolean] = {
    val n = vecs.length
    val kept = new Array[Boolean](n)
    val keptIdx = new scala.collection.mutable.ArrayBuffer[Int]()
    val norms = vecs.map { v =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
      math.sqrt(s)
    }
    var i = 0
    while (i < n) {
      var dup = false
      var j = 0
      while (j < keptIdx.length && !dup) {
        val o = keptIdx(j)
        var dot = 0.0; var d = 0
        val a = vecs(i); val b = vecs(o)
        while (d < a.length) { dot += a(d).toDouble * b(d); d += 1 }
        val denom = norms(i) * norms(o)
        if (denom > 0 && dot / denom > tau) dup = true
        j += 1
      }
      if (!dup) { kept(i) = true; keptIdx += i }
      i += 1
    }
    kept
  }

  /** Full SemDeDup pass. Output: (id, centroid_id, cos_to_centroid,
    * kept) — one row per input vector; filter kept for the surviving
    * corpus. Deterministic for a fixed (k, tau): the kmeans seeding,
    * the priority order, and the greedy scan are all order-pinned.
    */
  def semDedup(emb: DataFrame, vecCol: String, idCol: String,
      k: Int, tau: Double, maxIters: Int = 5): DataFrame =
    semDedup(emb, vecCol, idCol,
      Clustering.kmeans(emb, vecCol, idCol, k, maxIters).centroids, tau)

  /** Same pass with a pinned centroid set (kmeans fit elsewhere) —
    * everything downstream of the fit is partition-invariant.
    */
  def semDedup(emb: DataFrame, vecCol: String, idCol: String,
      cs: Similarity.CentroidSet, tau: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._

    val assigned = Similarity.ivfAssign(emb, vecCol, idCol, cs)
      .join(broadcast(Clustering.centroidFrame(emb, cs)), Seq("centroid_id"))
      .select(col(idCol).cast("long").as("id"), col("centroid_id"),
        col(vecCol).as("v"),
        Similarity.cosine(col(vecCol), col("cv")).as("cos_to_centroid"))

    assigned
      .select(col("id"), col("centroid_id"), col("v"), col("cos_to_centroid"))
      .as[(Long, Long, Array[Float], Double)]
      .groupByKey(_._2)
      .flatMapGroups { (cid, it) =>
        // paper priority: farthest-from-centroid first (ascending
        // cosine to centroid), id as the deterministic tie-break
        val members = it.toArray.sortBy(m => (m._4, m._1))
        val kept = greedyKeep(members.map(_._3), tau)
        members.iterator.zipWithIndex.map { case ((id, _, _, cosC), i) =>
          (id, cid, cosC, kept(i))
        }
      }
      .toDF("id", "centroid_id", "cos_to_centroid", "kept")
  }
}
