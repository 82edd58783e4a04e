package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation operators.
  *
  * AQE's skew-join splitting handles most runtime skew; these are the
  * explicit forms for when the skew is known a priori (a hot user, a
  * boilerplate document cluster) or when AQE can't help (aggregation
  * skew — AQE splits join partitions, not hash-aggregate groups).
  */
object Skew {

  /** Two-phase salted aggregation: group once on (keys ⊕ salt), then
    * re-aggregate on keys alone. A key with 10⁹ rows becomes `buckets`
    * partial groups computed in parallel, then `buckets` tiny rows.
    *
    * `partials` must be re-aggregable pairs: (partialExpr, finalExpr
    * over the partial's column). Sums/counts/min/max compose; avg must
    * be decomposed by the caller into sum+count.
    */
  def saltedAggregate(
      df: DataFrame, keys: Seq[Column], buckets: Int,
      partials: Seq[(Column, String)],
      finals: Seq[String => Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val phase1 = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partials.head._1.as(partials.head._2),
        partials.tail.map { case (c, n) => c.as(n) }: _*)
    phase1
      .groupBy(keys: _*)
      .agg(finals.head(partials.head._2),
        finals.tail.zip(partials.tail).map { case (f, (_, n)) => f(n) }: _*)
  }

  /** Salted join for a skewed LEFT side against a small-ish right side:
    * left rows get a random salt in [0, buckets); the right side is
    * replicated `buckets` times with each salt value. The join key
    * becomes (key, salt) — the hot key's rows spread over `buckets`
    * partitions instead of one straggler.
    */
  def saltedJoin(
      skewedLeft: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column, buckets: Int): DataFrame = {
    val saltedLeft = skewedLeft.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedLeft.join(replicatedRight,
        leftKey === rightKey && saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
  }
}
