package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SQL:2011 GROUPS window frames (`GROUPS BETWEEN p PRECEDING AND f
  * FOLLOWING`) — frame bounds counted in PEER GROUPS rather than rows
  * or order-key values. Neither Spark nor the bundled reference build
  * implements GROUPS natively (the reference parser rejects it with
  * "not implemented yet"), but the frame is exactly expressible as a
  * RANGE frame over `dense_rank`: peer group = distinct order-key
  * value = one dense-rank value, so GROUPS n ≡ RANGE n on the rank.
  *
  * Cost shape: the rank window and the aggregate window share the
  * same partitioning and a monotone order, so Spark plans ONE
  * exchange and the second sort sees already-sorted runs — no extra
  * shuffle, matching how a native GROUPS implementation would ride
  * the same sorted pass.
  */
object GroupsFrame {
  /** Append `outCol` = `agg` evaluated over GROUPS BETWEEN
    * `preceding` PRECEDING AND `following` FOLLOWING of
    * (part, order). `agg` is any aggregate Column (sum(x),
    * count(lit(1)), min/max/avg …).
    */
  def withGroupsAgg(
      df: DataFrame, outCol: String, agg: Column,
      part: Seq[Column], order: Seq[Column],
      preceding: Long, following: Long): DataFrame = {
    require(preceding >= 0 && following >= 0,
      s"GROUPS frame [$preceding PRECEDING, $following FOLLOWING] must contain the current group")
    val rankW = Window.partitionBy(part: _*).orderBy(order: _*)
    val frameW = Window.partitionBy(part: _*).orderBy(col("__gf_dr"))
      .rangeBetween(-preceding, following)
    df.withColumn("__gf_dr", dense_rank().over(rankW))
      .withColumn(outCol, agg.over(frameW))
      .drop("__gf_dr")
  }
}
