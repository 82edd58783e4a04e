package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.Similarity.CentroidSet

/** Product quantization for ANN over an embedding column (Jégou et
  * al. 2011, "Product Quantization for Nearest Neighbor Search") —
  * the memory-bound 100 TB search path: vectors are cut into `m`
  * subspaces, each subspace gets its own k-codeword codebook
  * (distributed Lloyd via [[Clustering.kmeans]]), and the corpus is
  * stored as m small codes per vector (64-dim float → 4 bytes at
  * m=4, a 64× compression). Search is ADC (asymmetric distance
  * computation): the query precomputes an m×k table of sub-inner
  * products ONCE, and scoring a corpus vector is m table lookups —
  * no float vector is ever read at query time.
  *
  * Scale posture: training reads bounded samples per subspace
  * ([[Similarity.centroidSeeds]] seeding, one k·subDim aggregate per
  * Lloyd iteration); encoding is a pure projection (m
  * [[graft.plans.NearestCentroid]] exprs, zero shuffles); search is
  * scan + broadcast 1-row query + TakeOrderedAndProject, the same
  * exchange-free skeleton as [[Similarity.bruteForceTopK]] — but over
  * codes instead of vectors.
  *
  * Cosine handling: vectors are L2-normalized BEFORE training and
  * encoding, so ADC inner products approximate cosine directly and
  * per-vector norms need not be stored.
  */
object ProductQuant {

  /** codebooks(j)(c) = codeword c of subspace j (subDim floats). */
  final case class PqModel(m: Int, subDim: Int, k: Int,
      codebooks: Array[Array[Array[Float]]])

  /** Adds `__nv` = L2-normalized `vecCol`. The norm is materialized
    * once per row (a lambda capturing an outer column), NOT
    * recomputed per element — normalizing d elements costs O(d), not
    * O(d²).
    */
  private def withNormalized(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("__n", Similarity.norm(col(vecCol)))
      .withColumn("__nv",
        transform(col(vecCol), x => (x.cast("double") / col("__n")).cast("float")))
      .drop("__n")

  private def subVec(vec: Column, j: Int, subDim: Int): Column =
    slice(vec, j * subDim + 1, subDim)

  /** Train per-subspace codebooks on the (normalized) corpus — m
    * independent distributed k-means fits; only k·dim doubles ever
    * reach the driver per iteration.
    */
  def train(corpus: DataFrame, vecCol: String, idCol: String,
      m: Int, k: Int, iters: Int = 5): PqModel = {
    val head = corpus.select(size(col(vecCol))).head().getInt(0)
    require(head % m == 0, s"dim $head not divisible by m=$m")
    val subDim = head / m
    val normed = withNormalized(corpus, vecCol).select(col(idCol), col("__nv"))
    normed.persist()
    val codebooks = (0 until m).map { j =>
      val sub = normed.select(col(idCol), subVec(col("__nv"), j, subDim).as("__sv"))
      val fit = Clustering.kmeans(sub, "__sv", idCol, k = k, maxIters = iters)
      fit.centroids.vecs
    }.toArray
    normed.unpersist()
    PqModel(m, subDim, k, codebooks)
  }

  /** Code assignment as a shuffle-free projection: one NearestCentroid
    * expression per subspace, ids 0..k-1 so the assigned "centroid id"
    * IS the code. Output: (id, codes array<int>).
    */
  def encode(corpus: DataFrame, vecCol: String, idCol: String,
      model: PqModel): DataFrame = {
    val codes = (0 until model.m).map { j =>
      val cs = CentroidSet(
        Array.tabulate(model.codebooks(j).length)(_.toLong), model.codebooks(j))
      graft.plans.HashExpressions.columnOf(
        graft.plans.NearestCentroid(
          graft.plans.HashExpressions.exprOf(subVec(col("__nv"), j, model.subDim)),
          cs.ids, cs.vecs)).cast("int")
    }
    withNormalized(corpus, vecCol).select(col(idCol), array(codes: _*).as("codes"))
  }

  /** ADC top-k: precompute the query's m×k sub-inner-product table
    * driver-side (m·k doubles), broadcast it as literals inside the
    * projection, and score each corpus vector with m array lookups.
    * `query` is a raw (un-normalized) vector.
    */
  def searchTopK(encoded: DataFrame, idCol: String,
      query: Array[Float], model: PqModel, k: Int): DataFrame = {
    val qn = {
      val n = math.sqrt(query.map(x => x.toDouble * x).sum)
      query.map(x => (x / n))
    }
    // adc(j)(c) = <q_j, codeword_{j,c}>
    val adc: Array[Array[Double]] = Array.tabulate(model.m) { j =>
      val qj = qn.slice(j * model.subDim, (j + 1) * model.subDim)
      model.codebooks(j).map(cw =>
        cw.zip(qj).map { case (a, b) => a.toDouble * b }.sum)
    }
    val score = (0 until model.m).map { j =>
      element_at(typedlit(adc(j).toSeq), col("codes")(j) + 1)
    }.reduce(_ + _)
    encoded.select(col(idCol), score.as("adc_sim"))
      .orderBy(col("adc_sim").desc, col(idCol))
      .limit(k)
  }

  /** The production PQ search shape (IVFADC practice): ADC over the
    * codes proposes a `shortlist`-sized candidate set, then ONLY those
    * rows are re-scored with exact cosine against the float vectors.
    * The expensive corpus scan touches codes only; float vectors are
    * read for `shortlist` rows (broadcast semi-join on id) no matter
    * the corpus size.
    */
  def searchRerankTopK(encoded: DataFrame, corpus: DataFrame,
      vecCol: String, idCol: String, query: Array[Float], model: PqModel,
      k: Int, shortlist: Int = 50): DataFrame = {
    val cand = searchTopK(encoded, idCol, query, model, shortlist)
      .select(col(idCol))
    corpus.join(broadcast(cand), Seq(idCol))
      .select(col(idCol),
        Similarity.cosine(col(vecCol), typedlit(query.toSeq)).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** DETERMINISTIC integer-grid PQ search (r14, the p06 pattern):
    * vectors quantize to int8 (the s07 kernel, REAL-replayable in
    * DuckDB), each subspace's codebook is the exact integer Lloyd of
    * [[Clustering.lloydInt]] from pinned seed ids, encoding is the
    * same argmax integer-cosine (smallest-code tiebreak), the ADC
    * table is EXACT integer sub-inner products of the quantized query
    * against the integer codewords, and the shortlist re-ranks with
    * the bit-portable double cosine (the s01 oracle form). Every
    * intermediate is an exact integer or a double derived from exact
    * integers, so the s08 oracle replays the whole pipeline —
    * quantizer, m Lloyd loops, encoding, ADC scan, re-rank — in
    * DuckDB SQL and hash-matches.
    *
    * Scale shape unchanged from the float path: training reads the
    * corpus iters·m times for bounded k·subDim aggregates (batchable
    * to iters scans by keying the aggregate on (subspace, cluster)),
    * encoding is one shuffle-free projection, search is scan + top-k.
    * The float [[train]]/[[searchRerankTopK]] stays the production
    * path for externally-trained codebooks (recall contracts in
    * PipelineSpec).
    */
  def deterministicPqTopK(corpus: DataFrame, vecCol: String, idCol: String,
      m: Int, k: Int, iters: Int, seedIds: Seq[Long], queryId: Long,
      shortlist: Int, topK: Int): DataFrame = {
    import graft.plans.Quantization
    val q = corpus.select(col(idCol).cast("long").as("id"),
      Quantization.int8Longs(col(vecCol)).as("qv"))
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    def sub(qv: Column, j: Int): Column = slice(qv, j * subDim + 1, subDim)
    q.persist()
    // m independent integer-Lloyd codebooks from the SAME pinned seeds
    val codebooks: IndexedSeq[Seq[(Long, Array[Long])]] =
      (0 until m).map { j =>
        Clustering.lloydInt(
          q.select(col("id"), sub(col("qv"), j).as("qv")), seedIds, iters)
      }
    // encode: one shuffle-free projection, code_j = argmax cid
    val codeCols = (0 until m).map { j =>
      (lit(0L) - Clustering.bestInt(sub(col("qv"), j), codebooks(j))
        .getField("n")).cast("int")
    }
    val encoded = q.select(col("id"), array(codeCols: _*).as("codes"))
    // the query's quantized subvectors (ONE bounded row to the driver)
    val qRow = q.filter(col("id") === queryId).head()
    val qQv = qRow.getSeq[Long](1).toArray
    q.unpersist()
    // exact integer ADC tables: adc(j)(c) = <q_j, codeword_{j,c}>,
    // nrm(j)(c) = |codeword_{j,c}|². The shortlist score is the
    // reconstruction COSINE numerator dot / |recon| — dividing by the
    // reconstruction norm cancels each corpus vector's own int8
    // quantization scale (raw dots bias toward small-max-abs vectors);
    // a double derived from exact integers, bit-portable.
    val adc: IndexedSeq[Seq[Long]] = (0 until m).map { j =>
      val qj = qQv.slice(j * subDim, (j + 1) * subDim)
      codebooks(j).map { case (_, cw) =>
        cw.zip(qj).map { case (a, b) => a * b }.sum
      }
    }
    val nrm: IndexedSeq[Seq[Long]] = (0 until m).map { j =>
      codebooks(j).map { case (_, cw) => cw.map(v => v * v).sum }
    }
    val pqDot = (0 until m).map { j =>
      element_at(typedlit(adc(j)), col("codes")(j) + 1)
    }.reduce(_ + _)
    val pqNrm = (0 until m).map { j =>
      element_at(typedlit(nrm(j)), col("codes")(j) + 1)
    }.reduce(_ + _)
    val pqScore = when(pqNrm === 0L, lit(0.0))
      .otherwise(pqDot.cast("double") / sqrt(pqNrm.cast("double")))
    val cand = encoded.select(col("id"), pqScore.as("pq_score"))
      .orderBy(col("pq_score").desc, col("id"))
      .limit(shortlist)
    // exact-cosine re-rank of the bounded shortlist (broadcast join)
    val qVec = corpus.filter(col(idCol).cast("long") === queryId)
      .select(col(vecCol)).head().getSeq[Float](0)
    corpus.join(broadcast(cand), col(idCol).cast("long") === col("id"))
      .select(col(idCol), col("pq_score"),
        Similarity.cosine(col(vecCol), typedlit(qVec)).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(topK)
  }
}
