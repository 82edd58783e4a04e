package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Window frame EXCLUDE (CURRENT ROW | GROUP | TIES) — the stock
  * SQL:2011 frame-exclusion surface the reference ships
  * (/root/reference/src/execution/window_segment_tree.cpp's
  * WindowExcludePart; exercised by its window tests) and Spark's
  * window operator lacks.
  *
  * Implemented as ALGEBRAIC REWRITES over stock window aggregates, not
  * a forked window exec: for an aggregate with an inverse (SUM, COUNT,
  * AVG) the excluded part is computed as its own window aggregate and
  * subtracted; for MIN/MAX (no inverse) the frame is SPLIT around the
  * current row and recombined with least/greatest. Every helper emits
  * plain Catalyst window expressions over the SAME partition/order, so
  * Spark evaluates all of them in ONE window pass (one exchange + one
  * sort) — the rewrite adds columns, never stages. That is exactly the
  * scale posture of the reference's segment-tree implementation: one
  * sorted pass per (partition, order) spec regardless of how many
  * exclusion variants are projected.
  *
  * NULL semantics match SQL: the aggregate over an empty-after-
  * exclusion frame is NULL (not 0), and NULL inputs don't count —
  * handled by tracking the non-null COUNT of the exclusion alongside
  * its SUM.
  *
  * Preconditions are ENFORCED at call time, not just documented: the
  * helpers take a [[Frame]] descriptor (never a raw WindowSpec) and
  * build the spec themselves, so a frame that doesn't contain the
  * current row, or a GROUP/TIES exclusion over a bounded ROWS frame
  * (which can split the current row's peer group), is rejected with
  * IllegalArgumentException instead of silently computing the wrong
  * answer. For bounded ROWS frames with duplicate order keys the
  * caller must still order by a tie-breaking key (which also makes
  * the ROWS frame itself deterministic — without that, bounded-ROWS
  * results are order-dependent in ANY engine, exclusion or not).
  */
object WindowExclude {

  /** Frame-exclusion modes, mirroring SQL:2011 / the reference's
    * window clause. NO OTHERS is the identity (stock Spark).
    */
  sealed trait Exclude
  case object ExcludeCurrentRow extends Exclude
  case object ExcludeGroup extends Exclude
  case object ExcludeTies extends Exclude

  /** Frame descriptors — the only way to hand a frame to the
    * exclusion helpers, so every supported shape is valid by
    * construction (both bounds non-negative ⇒ the frame contains the
    * current row).
    */
  sealed trait Frame
  /** RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING. */
  case object FullPartition extends Frame
  /** ROWS BETWEEN `preceding` PRECEDING AND `following` FOLLOWING. */
  final case class RowsAround(preceding: Long, following: Long) extends Frame {
    require(preceding >= 0 && following >= 0,
      s"ROWS frame [$preceding PRECEDING, $following FOLLOWING] must contain the current row")
  }
  /** RANGE BETWEEN `preceding` PRECEDING AND `following` FOLLOWING
    * over a numeric/temporal order key.
    */
  final case class RangeAround(preceding: Long, following: Long) extends Frame {
    require(preceding >= 0 && following >= 0,
      s"RANGE frame [$preceding PRECEDING, $following FOLLOWING] must contain the current row")
  }

  private def specOf(part: Seq[Column], order: Seq[Column], frame: Frame): WindowSpec = {
    val base = Window.partitionBy(part: _*).orderBy(order: _*)
    frame match {
      case FullPartition =>
        base.rangeBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      case RowsAround(p, f)  => base.rowsBetween(-p, f)
      case RangeAround(p, f) => base.rangeBetween(-p, f)
    }
  }

  /** GROUP/TIES need the WHOLE peer group inside the frame. RANGE
    * bounds can never split a peer group (peers share the order-key
    * value, so they share every range test); bounded ROWS bounds can.
    */
  private def checkPeerSafe(frame: Frame, exclude: Exclude): Unit = exclude match {
    case ExcludeGroup | ExcludeTies =>
      require(!frame.isInstanceOf[RowsAround],
        s"EXCLUDE $exclude over a bounded ROWS frame can split the peer group; " +
          "use FullPartition or RangeAround")
    case ExcludeCurrentRow => ()
  }

  /** Peer-group frame: all rows sharing the current row's ORDER BY
    * values. Same partition/order as the enclosing frame, so it rides
    * the same sort.
    */
  private def peerSpec(part: Seq[Column], order: Seq[Column]): WindowSpec =
    Window.partitionBy(part: _*).orderBy(order: _*)
      .rangeBetween(Window.currentRow, Window.currentRow)

  /** SUM(x) over `frame` (built here from part/order) with exclusion. */
  def sumExclude(x: Column, frame: Frame,
                 part: Seq[Column], order: Seq[Column],
                 exclude: Exclude): Column = {
    checkPeerSafe(frame, exclude)
    val w = specOf(part, order, frame)
    val s = sum(x).over(w)
    val c = count(x).over(w)
    val (exSum, exCnt) = exclude match {
      case ExcludeCurrentRow =>
        (coalesce(x, lit(0L)), when(x.isNotNull, 1L).otherwise(0L))
      case ExcludeGroup =>
        val p = peerSpec(part, order)
        (coalesce(sum(x).over(p), lit(0L)), count(x).over(p))
      case ExcludeTies =>
        // peers minus the current row itself
        val p = peerSpec(part, order)
        (coalesce(sum(x).over(p), lit(0L)) - coalesce(x, lit(0L)),
          count(x).over(p) - when(x.isNotNull, 1L).otherwise(0L))
    }
    when(c - exCnt === 0, lit(null)).otherwise(s - exSum)
  }

  /** COUNT(x) over `frame` with exclusion (0 on empty, per SQL). */
  def countExclude(x: Column, frame: Frame,
                   part: Seq[Column], order: Seq[Column],
                   exclude: Exclude): Column = {
    checkPeerSafe(frame, exclude)
    val c = count(x).over(specOf(part, order, frame))
    exclude match {
      case ExcludeCurrentRow => c - when(x.isNotNull, 1L).otherwise(0L)
      case ExcludeGroup      => c - count(x).over(peerSpec(part, order))
      case ExcludeTies =>
        c - count(x).over(peerSpec(part, order)) +
          when(x.isNotNull, 1L).otherwise(0L)
    }
  }

  /** AVG via the exact sum/count pair (NULL on empty, per SQL). */
  def avgExclude(x: Column, frame: Frame,
                 part: Seq[Column], order: Seq[Column],
                 exclude: Exclude): Column = {
    val n = countExclude(x, frame, part, order, exclude)
    when(n === 0, lit(null))
      .otherwise(sumExclude(x, frame, part, order, exclude) / n)
  }

  /** MIN(x) over a bounded ROWS frame [-prec, +fol] EXCLUDE CURRENT
    * ROW: no inverse exists, so the frame splits into the strictly-
    * before and strictly-after halves — two more aggregates on the
    * same sort — recombined with `least` (null-skipping, NULL when
    * both halves are empty, matching SQL).
    */
  def minExcludeCurrentRow(x: Column, part: Seq[Column], order: Seq[Column],
                           prec: Long, fol: Long): Column = {
    val (before, after) = splitRows(part, order, prec, fol)
    least(min(x).over(before), min(x).over(after))
  }

  /** MAX variant of [[minExcludeCurrentRow]]. */
  def maxExcludeCurrentRow(x: Column, part: Seq[Column], order: Seq[Column],
                           prec: Long, fol: Long): Column = {
    val (before, after) = splitRows(part, order, prec, fol)
    greatest(max(x).over(before), max(x).over(after))
  }

  private def splitRows(part: Seq[Column], order: Seq[Column],
                        prec: Long, fol: Long): (WindowSpec, WindowSpec) = {
    val base = Window.partitionBy(part: _*).orderBy(order: _*)
    (base.rowsBetween(-prec, -1), base.rowsBetween(1, fol))
  }
}
