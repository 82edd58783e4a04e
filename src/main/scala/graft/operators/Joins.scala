package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond plain equi-joins, expressed Spark-first.
  *
  * Reference surface covered here:
  *  - theta (non-equi) join — the fork's AM_US_JOIN nested-loop
  *    operator (/root/reference/src/execution/am_us_join/
  *    am_us_join_inner.cpp); in Spark a declarative non-equi condition
  *    plans to BroadcastNestedLoopJoin when one side is small.
  *  - semi / anti / mark joins (physical_am_us_join.cpp handles MARK) —
  *    Spark: left_semi / left_anti / null-aware NOT IN.
  *  - ASOF join (stock DuckDB `ASOF JOIN`).
  *  - range (interval) join.
  *  - POSITIONAL join (stock DuckDB).
  */
object Joins {

  /** Non-equi ("theta") join. Declarative condition; Catalyst plans
    * BroadcastNestedLoopJoin when a side fits the broadcast threshold —
    * the Spark analog of the reference's AM_US_JOIN. At 100 TB keep the
    * broadcast side a dim table; a fact-fact theta join should be
    * rewritten as a banded/range join instead (see [[rangeJoin]]).
    */
  def thetaJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(broadcast(right), cond, "inner")

  /** ASOF backward join: for each left row, match right rows with
    * rightTime <= leftTime on the same key and keep only the latest.
    * Implemented as a single equi-shuffle on the key + max-aggregation
    * — one shuffle, partial-aggregated map-side, no sort of the union.
    * Left rows with no match survive with NULLs (LEFT ASOF semantics).
    */
  def asofLastTimestamp(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      leftOut: Seq[Column], asOfAlias: String): DataFrame = {
    left
      .join(right, leftKey === rightKey && rightTime <= leftTime, "left")
      .groupBy(leftOut: _*)
      .agg(max(rightTime).as(asOfAlias))
  }

  /** Range (interval) join: pairs where `lo <= probe < hi` on the same
    * key. The equi key carries the shuffle; the band predicate is
    * evaluated post-shuffle — the scalable plan shape for interval
    * joins (vs. a cartesian). Skewed keys are AQE-split at runtime.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "inner")

  /** POSITIONAL join: zip two frames by row position under an explicit
    * total order. Row position is only well-defined given a sort key —
    * same contract DuckDB's POSITIONAL JOIN has on ordered scans.
    * Note: a global row_number needs a single-partition window; use
    * only on dim-sized inputs (for big frames use zipWithIndex on a
    * sorted RDD — not needed for the reference surface).
    */
  def positionalJoin(left: DataFrame, leftOrder: Column,
                     right: DataFrame, rightOrder: Column): DataFrame = {
    val wl = Window.orderBy(leftOrder)
    val wr = Window.orderBy(rightOrder)
    val l = left.withColumn("__pos", row_number().over(wl))
    val r = right.withColumn("__pos", row_number().over(wr))
    l.join(r, "__pos").drop("__pos")
  }
}
