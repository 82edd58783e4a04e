package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed quality-classifier training for corpus curation — the
  * GPT-3/CommonCrawl practice of filtering a raw crawl with a simple
  * linear classifier trained to recognize "curated-looking" text
  * (Brown et al. 2020 §A; reference corpora vs raw crawl).
  *
  * Logistic regression by full-batch gradient descent in the k-means
  * mold ([[Clustering]]): the weight vector (dim+1 doubles) broadcasts
  * into a pure projection, and each iteration is ONE aggregate of
  * dim+2 running sums (per-feature gradient, bias gradient, loss) —
  * no per-row state, no shuffle of the corpus, O(iters) scans. Feature
  * dim is assumed small (engineered text statistics, not embeddings),
  * so gradients ride as agg columns rather than a posexplode —
  * the corpus never leaves its partitions.
  *
  * Feature standardization (one extra aggregate) is folded INTO the
  * returned weights, so scoring needs only the raw features.
  */
object Classifier {

  /** weights/bias operate on RAW (un-standardized) features. */
  final case class LrModel(weights: Array[Double], bias: Double,
      losses: Seq[Double])

  private def sigmoidC(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Margin of a raw feature array under the model, as a Column. */
  def margin(feat: Column, model: LrModel): Column =
    model.weights.zipWithIndex.map { case (w, i) =>
      element_at(feat, i + 1).cast("double") * lit(w)
    }.reduce(_ + _) + lit(model.bias)

  /** P(label = 1 | features) for scoring a corpus — a pure projection. */
  def predictProb(feat: Column, model: LrModel): Column =
    sigmoidC(margin(feat, model))

  /** Full-batch GD fit. `featCol` is array<double> of fixed dimension,
    * `labelCol` is 0/1. Features are standardized internally
    * ((x-mean)/std, constant columns dropped to zero weight) and the
    * transform is folded back into the returned raw-space model.
    */
  def trainLogistic(df: DataFrame, featCol: String, labelCol: String,
      iters: Int = 50, lr: Double = 0.5, l2: Double = 1e-4): LrModel = {
    val dim = df.select(size(col(featCol))).head().getInt(0)
    val feats = (0 until dim).map(i => element_at(col(featCol), i + 1).cast("double"))

    // one pass: per-feature mean/std + row count
    val statRow = df.agg(
      count(lit(1)).as("n"),
      feats.zipWithIndex.flatMap { case (f, i) =>
        Seq(avg(f).as(s"m$i"), stddev_pop(f).as(s"s$i"))
      }: _*).head()
    val n = statRow.getLong(0).toDouble
    val mean = Array.tabulate(dim)(i => statRow.getDouble(1 + 2 * i))
    val std = Array.tabulate(dim) { i =>
      val s = statRow.getDouble(2 + 2 * i); if (s > 0) s else 1.0
    }

    var w = Array.fill(dim)(0.0)
    var b = 0.0
    val losses = Seq.newBuilder[Double]
    val y = col(labelCol).cast("double")
    for (_ <- 0 until iters) {
      val z = (0 until dim).map(i =>
        (feats(i) - lit(mean(i))) / lit(std(i)) * lit(w(i))).reduce(_ + _) + lit(b)
      val p = sigmoidC(z)
      val err = p - y
      // ONE aggregate: dim gradient sums + bias sum + loss sum
      val aggRow = df.agg(
        sum(err).as("gb"),
        (0 until dim).map(i =>
          sum(err * (feats(i) - lit(mean(i))) / lit(std(i))).as(s"g$i")) ++
          // clamped log-loss (p can round to exactly 0/1 in double)
          Seq(sum(-(y * log(greatest(p, lit(1e-12))) +
            (lit(1.0) - y) * log(greatest(lit(1.0) - p, lit(1e-12))))).as("loss")): _*)
        .head()
      val gb = aggRow.getDouble(0) / n
      val g = Array.tabulate(dim)(i => aggRow.getDouble(1 + i) / n + l2 * w(i))
      losses += aggRow.getDouble(1 + dim) / n
      b -= lr * gb
      for (i <- 0 until dim) w(i) -= lr * g(i)
    }
    // fold standardization into raw-space weights:
    // z = Σ w_i (x_i - m_i)/s_i + b  =  Σ (w_i/s_i) x_i + (b - Σ w_i m_i/s_i)
    val rawW = Array.tabulate(dim)(i => w(i) / std(i))
    val rawB = b - (0 until dim).map(i => w(i) * mean(i) / std(i)).sum
    LrModel(rawW, rawB, losses.result())
  }

  /** DETERMINISTIC fixed-point linear classifier (r14, the p06/s08
    * integer-grid pattern): features are pre-scaled INTEGERS (the
    * caller centers them on fixed constants — standardization with
    * data-dependent doubles would break exactness), weights live on a
    * 10⁻⁶ grid as Longs, the loss is squared error against ±10⁹
    * targets, and each full-batch GD step is one aggregate of exact
    * DECIMAL(38,0) gradient sums with a truncating integer update
    * w_i -= trunc(G_i / (n·10⁶·lrDen)) — every intermediate exact, so
    * DuckDB replays the whole fit in SQL (HUGEINT sums, the
    * (g - g % D)/D toward-zero division). Same scale shape as
    * [[trainLogistic]]: broadcast weights, ONE dim-column aggregate
    * per iteration, zero corpus shuffles. The float logistic fit
    * stays the expressive production path (ClassifierSpec).
    */
  def trainLinearInt(df: DataFrame, featCol: String, labelCol: String,
      iters: Int, lrDen: Long = 1L): Array[Long] = {
    import org.apache.spark.sql.types.DecimalType
    val dim = df.select(size(col(featCol))).head().getInt(0)
    val feats = (0 until dim).map(i => element_at(col(featCol), i + 1))
    val n = df.count()
    val w = Array.fill(dim)(0L)
    val tgt = (col(labelCol).cast("long") * 2L - 1L) * lit(1000000000L)
    for (_ <- 0 until iters) {
      val margin = feats.zip(w).map { case (f, wi) => f * lit(wi) }
        .reduce(_ + _)
      val r = margin - tgt
      val gCols = (0 until dim).map(i =>
        sum((r * feats(i)).cast(DecimalType(38, 0))).as(s"g$i"))
      val row = df.agg(gCols.head, gCols.tail: _*).head()
      val d = BigInt(n) * 1000000L * lrDen
      for (i <- 0 until dim) {
        val g = BigInt(row.getDecimal(i).toBigInteger)
        val q = g.abs / d
        w(i) -= (if (g.signum >= 0) q else -q).toLong
      }
    }
    w
  }

  /** Margin of an integer feature array under fixed-point weights. */
  def marginInt(feat: Column, w: Array[Long]): Column =
    w.zipWithIndex.map { case (wi, i) =>
      element_at(feat, i + 1) * lit(wi)
    }.reduce(_ + _)
}
