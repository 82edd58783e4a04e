package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — one scan, map-side partial
  * top-k (TakeOrderedAndProject), no shuffle of the corpus. Scale
  * path: random-hyperplane LSH bucketing — candidates come from one
  * bucket (plus optional multi-probe), turning 100 TB scans into
  * bucket-local work.
  */
object Similarity {

  /** Dot product of two float vectors, accumulated left-to-right in
    * double — deterministic and portable (same order both engines).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Cosine via the custom [[graft.plans.CosineSimilarity]] expression
    * (primitive loop; the HOF zip_with/aggregate form evaluates
    * interpreted). Identical left-to-right double accumulation, so the
    * DuckDB list_sum oracle parity is preserved.
    */
  def cosine(a: Column, b: Column): Column =
    graft.plans.HashExpressions.columnOf(
      graft.plans.CosineSimilarity(
        graft.plans.HashExpressions.exprOf(a),
        graft.plans.HashExpressions.exprOf(b)))

  /** Brute-force cosine top-k against one query vector (supplied as a
    * one-row frame, broadcast — no driver collect). Plans as scan +
    * BroadcastNestedLoopJoin(1 row) + TakeOrderedAndProject: each
    * partition keeps its local top-k, the driver merges k·p rows.
    */
  def bruteForceTopK(
      corpus: DataFrame, vecCol: String, idCol: String,
      query: DataFrame, queryVecCol: String, k: Int): DataFrame = {
    corpus
      .crossJoin(broadcast(query.select(col(queryVecCol).as("__qv"))))
      .select(col(idCol),
        cosine(col(vecCol), col("__qv")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic random hyperplanes (seeded) for sign-LSH. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: fold over hyperplanes, acc*2 + signBit.
    * Cosine-similar vectors land in the same bucket w.h.p.
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.foldLeft(lit(0L)) { (acc, p) =>
      acc * 2 + when(dot(vec, typedlit(p)) >= 0, 1L).otherwise(0L)
    }

  /** LSH-bucketed ANN: hash corpus + query to buckets, equi-join on
    * bucket (the only shuffle — and with a broadcast query side, none
    * for the corpus), rank candidates by exact cosine. Recall is
    * tunable via nBits (fewer bits → bigger buckets → higher recall).
    */
  def annTopK(
      corpus: DataFrame, vecCol: String, idCol: String,
      query: DataFrame, queryVecCol: String,
      k: Int, nBits: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(nBits, dim)
    val c = corpus.withColumn("__bucket", lshBucket(col(vecCol), planes))
    val q = query.select(col(queryVecCol).as("__qv"),
      lshBucket(col(queryVecCol), planes).as("__bucket"))
    c.join(broadcast(q), Seq("__bucket"))
      .select(col(idCol), cosine(col(vecCol), col("__qv")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** IVF-style ANN: a coarse quantizer (centroids = deterministic data
    * seeds, k-medoids flavor) partitions the corpus into inverted
    * lists; a query probes only the `nprobe` nearest lists.
    *
    * Scale shape: assignment is a broadcast(centroids) pass over the
    * corpus (no corpus shuffle) done ONCE and reusable across queries
    * (the inverted-list table is the index); each query then touches
    * nprobe/K of the data. Recall tunes with nprobe.
    */
  /** Deterministic centroid seeds, BOUNDED in number: stride grows
    * with the corpus so assignment stays O(n·K), K ≈ maxCentroids —
    * not O(n²/stride) (a fixed stride quietly turns quadratic as the
    * corpus grows).
    */
  private def centroidsOf(corpus: DataFrame, vecCol: String, idCol: String,
                          maxCentroids: Int): DataFrame = {
    val n = corpus.count() // index-build-time job, amortized over queries
    val stride = math.max(1L, n / maxCentroids)
    corpus
      .filter(pmod(col(idCol), lit(stride)) === 0)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("cv"))
      .limit(maxCentroids)
  }

  def ivfAssign(
      corpus: DataFrame, vecCol: String, idCol: String,
      maxCentroids: Int): DataFrame = {
    val centroids = centroidsOf(corpus, vecCol, idCol, maxCentroids)
    corpus
      .crossJoin(broadcast(centroids))
      .select(col(idCol), col(vecCol),
        col("centroid_id"), cosine(col(vecCol), col("cv")).as("__ccos"))
      .groupBy(col(idCol))
      .agg(max_by(col("centroid_id"), col("__ccos")).as("centroid_id"),
        first(col(vecCol)).as(vecCol))
  }

  def ivfTopK(
      corpus: DataFrame, vecCol: String, idCol: String,
      query: DataFrame, queryVecCol: String,
      k: Int, maxCentroids: Int, nprobe: Int): DataFrame = {
    val assigned = ivfAssign(corpus, vecCol, idCol, maxCentroids)
    val centroids = centroidsOf(corpus, vecCol, idCol, maxCentroids)
    val q = query.select(col(queryVecCol).as("__qv"))
    val probed = centroids
      .crossJoin(broadcast(q))
      .select(col("centroid_id"), cosine(col("cv"), col("__qv")).as("__pc"))
      .orderBy(col("__pc").desc, col("centroid_id"))
      .limit(nprobe)
      .select(col("centroid_id"))
    assigned
      .join(broadcast(probed), Seq("centroid_id"), "left_semi")
      .crossJoin(broadcast(q))
      .select(col(idCol), cosine(col(vecCol), col("__qv")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Embedding near-duplicate pairs above a cosine threshold, blocked
    * by an equi key (label, LSH bucket, …) to bound the pair space.
    */
  def nearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, blockKey: Column,
      threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"), blockKey.as("bk"))
    val a = v.select(col("id").as("id_a"), col("v").as("v_a"), col("bk"))
    val b = v.select(col("id").as("id_b"), col("v").as("v_b"), col("bk"))
    a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
