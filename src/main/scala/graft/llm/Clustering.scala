package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Deterministic INTEGER-GRID k-means (r13): vectors quantize to
    * int8 (the s07 kernel — its REAL replay is oracle-proven), seeds
    * are EXPLICIT ids, assignment is argmax integer-cosine with a
    * smallest-cluster-id tiebreak, and each centroid update is the
    * truncating integer mean — every step is exact integer (or a
    * double derived from exact integers, identical on any IEEE
    * engine), so the whole fit is bit-identical across runs, cluster
    * sizes, and engines, and the p06 entry carries a full DuckDB
    * oracle that replays the Lloyd loop in SQL. Scale shape identical
    * to [[kmeans]]: one scan per iteration, one bounded k·dim
    * aggregate to the driver, zero row shuffles.
    */
  def kmeansInt8(corpus: DataFrame, vecCol: String, idCol: String,
                 seedIds: Seq[Long], iters: Int): DataFrame = {
    import graft.plans.Quantization
    val q = corpus.select(col(idCol).cast("long").as("id"),
      Quantization.int8Longs(col(vecCol)).as("qv"))
    val cents = lloydInt(q, seedIds, iters)
    // final assignment summary under the converged centroids:
    // cohesion sums in exact DECIMAL so the average is order-free
    assignInt(q, cents)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        (sum(col("cos").cast(org.apache.spark.sql.types.DecimalType(27, 12)))
          .cast("double") / count(lit(1))).as("avg_cohesion"))
      .select(col("cid").as("centroid_id"), col("n_members"), col("avg_cohesion"))
      .orderBy(col("centroid_id"))
  }

  /** The integer-Lloyd core shared by [[kmeansInt8]] and the
    * deterministic PQ codebooks ([[ProductQuant.deterministicPqTopK]]):
    * `q` is (id: long, qv: array&lt;long&gt;) on the int8 grid; seeds are
    * explicit ids whose RANK BY id becomes the cluster id. Returns the
    * centroids after `iters` truncating-integer-mean updates — every
    * step exact, the oracle replay spelled at the p06/s08 entries.
    */
  private[llm] def lloydInt(q: DataFrame, seedIds: Seq[Long],
      iters: Int): Seq[(Long, Array[Long])] = {
    // seeds: explicit ids, cluster ids = their rank by id (bounded
    // collect — k rows)
    var cents: Seq[(Long, Array[Long])] = q
      .filter(col("id").isin(seedIds: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .sortBy(_._1).zipWithIndex
      .map { case ((_, v), i) => i.toLong -> v }.toSeq
    require(cents.nonEmpty, "lloydInt: no seed vectors found")
    var it = 0
    while (it < iters) {
      // per-(cluster, position) exact integer sums — k·dim rows
      val sums = assignInt(q, cents)
        .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect()
      val byC = sums.groupBy(_.getLong(0))
      cents = cents.map { case (cid, prev) =>
        byC.get(cid) match {
          case Some(rows) =>
            val v = prev.clone()
            // truncating (toward-zero) integer mean — Scala Long
            // division; the oracle spells (sx - sx % n) / n
            rows.foreach(r => v(r.getInt(1)) = r.getLong(2) / r.getLong(3))
            cid -> v
          case None => cid -> prev // empty cluster keeps its centroid
        }
      }
      it += 1
    }
    cents
  }

  /** argmax integer-cosine over the (bounded) centroid set as one
    * struct-array max: (cos, -cid) orders ties to the smallest cid.
    * Input frame must carry (id, qv); output adds (cid, cos).
    */
  private[llm] def assignInt(q: DataFrame,
      cs: Seq[(Long, Array[Long])]): DataFrame = {
    val b = bestInt(col("qv"), cs)
    q.select(col("id"), col("qv"),
      (lit(0L) - b.getField("n")).as("cid"),
      b.getField("c").as("cos"))
  }

  /** struct(max integer-cos, -cid) of `qv` against the centroid set —
    * the projection both assignment and PQ ENCODING reduce to. */
  private[llm] def bestInt(qv: Column,
      cs: Seq[(Long, Array[Long])]): Column = {
    val scored = cs.map { case (cid, c) =>
      val cl = typedLit(c.toSeq)
      val dot = aggregate(zip_with(qv, cl, (x, y) => x * y),
        lit(0L), (a, x) => a + x)
      val nq = aggregate(transform(qv, x => x * x),
        lit(0L), (a, x) => a + x)
      val nc = c.map(v => v * v).sum
      val cos = when(nq === 0L || lit(nc) === 0L, lit(0.0))
        .otherwise(dot.cast("double") /
          (sqrt(nq.cast("double")) * sqrt(lit(nc).cast("double"))))
      struct(cos.as("c"), lit(-cid).as("n"))
    }
    array_max(array(scored: _*))
  }

  /** Final assignment frame: (id, centroid_id, cos to own centroid). */
  def assign(corpus: DataFrame, vecCol: String, idCol: String,
      cs: CentroidSet): DataFrame =
    Similarity.ivfAssign(corpus, vecCol, idCol, cs)
      .join(broadcast(centroidFrame(corpus, cs)), Seq("centroid_id"))
      .select(col(idCol), col("centroid_id"),
        Similarity.cosine(col(vecCol), col("cv")).as("cos_to_centroid"))
}
