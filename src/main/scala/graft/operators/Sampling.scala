package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling operators — the TABLESAMPLE surface of the reference
  * (stock DuckDB: reservoir, bernoulli, system —
  * /root/reference/src/execution/operator/helper/
  * physical_reservoir_sample.cpp, physical_streaming_sample.cpp).
  *
  * Scale shapes:
  *  - reservoir(n): fixed-size uniform sample as distributed bottom-k
  *    over a seeded per-row uniform draw. Bottom-k ≡ reservoir
  *    sampling in distribution, but parallelizes: each partition keeps
  *    its local k smallest draws (TakeOrderedAndProject), the driver
  *    merges k·p candidates — no global sort, no single-node pass.
  *  - bernoulli(p): independent per-row coin flips — a pure scan-time
  *    filter, no shuffle at all (DuckDB's "streaming sample").
  *  - system-ish(p): whole-partition sampling via RDD sample of
  *    partition indices is intentionally NOT offered: at 100 TB
  *    partition-correlated samples bias every downstream estimate;
  *    bernoulli is the honest default.
  */
object Sampling {

  /** Fixed-size uniform sample without replacement (reservoir
    * semantics). Deterministic for a fixed seed + input.
    */
  def reservoir(df: DataFrame, n: Int, seed: Long = 42L): DataFrame = {
    val draw = "__draw"
    df.withColumn(draw, rand(seed))
      .orderBy(col(draw))
      .limit(n)
      .drop(draw)
  }

  /** Bernoulli sampling: keep each row independently with probability
    * p. Seeded and shuffle-free.
    */
  def bernoulli(df: DataFrame, p: Double, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = false, p, seed)

  /** Stratified sampling: an independent bernoulli rate per stratum —
    * the training-data-mixture primitive (e.g. downsample English to
    * 10% while keeping low-resource languages whole). Strata absent
    * from `fractions` are dropped. Still a pure scan-side filter: the
    * per-row draw is compared against a rate looked up from the
    * (broadcast-sized) fractions map — no shuffle, no per-stratum pass.
    */
  def stratified(df: DataFrame, strataCol: Column,
                 fractions: Map[String, Double], seed: Long = 42L): DataFrame = {
    val rate = fractions.foldLeft(lit(0.0)) { case (acc, (k, p)) =>
      when(strataCol === k, p).otherwise(acc)
    }
    df.where(rand(seed) < rate)
  }
}
