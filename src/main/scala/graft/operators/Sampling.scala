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

  /** The top 16 bits of md5(tag:key) as a uniform draw in [0, 65536) —
    * the md5-threshold accept the mixture sampler (llm/Curation) uses.
    * Key-DETERMINISTIC sampling: the same row is kept on every run, on
    * any cluster size, in any engine with md5 — the reproducibility a
    * 100 TB training pipeline needs (re-runs and incremental adds see
    * a consistent sample), and what lets these entries carry a real
    * DuckDB oracle instead of a rows-only check (r13 upgrade).
    */
  private def keyU16(key: Column, tag: String): Column =
    conv(substring(md5(concat(lit(tag + ":"), key.cast("string"))), 1, 4),
      16, 10).cast("bigint")

  /** Bernoulli sampling, deterministic by key: keep a row iff its md5
    * draw falls under p·65536. Pure scan-side filter, no shuffle.
    */
  def bernoulliByKey(df: DataFrame, key: Column, p: Double,
                     tag: String = "bern"): DataFrame =
    df.where(keyU16(key, tag) < math.floor(p * 65536.0).toLong)

  /** Stratified sampling, deterministic by key: an independent
    * md5-threshold rate per stratum. Strata absent from `fractions`
    * drop (rate 0).
    */
  def stratifiedByKey(df: DataFrame, key: Column, strataCol: Column,
                      fractions: Map[String, Double],
                      tag: String = "strat"): DataFrame = {
    val rate = fractions.foldLeft(lit(0.0)) { case (acc, (k, p)) =>
      when(strataCol === k, p).otherwise(acc)
    }
    df.where(keyU16(key, tag) < floor(rate * 65536.0).cast("bigint"))
  }
}
