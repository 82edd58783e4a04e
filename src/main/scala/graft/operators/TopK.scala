package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}

import graft.plans.TopKPerGroupNode

/** User-facing top-K-per-group on the custom bounded-heap operator
  * (graft.plans.TopKPerGroup*). Requires the session to carry
  * GraftExtensions (GraftSession does).
  *
  * vs. window+filter: one shuffle either way, but no per-partition
  * sort — O(n log K) and O(groups·K) memory instead of O(n log n) and
  * the whole partition buffered.
  */
object TopK {
  def perGroup(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val child = GraftBridge.logicalPlan(df)
    val sortOrders = order.map { c =>
      GraftBridge.resolvedExprOf(c, child) match {
        case so: SortOrder => so
        case e => SortOrder(e, Ascending)
      }
    }
    GraftBridge.ofRows(df.sparkSession,
      TopKPerGroupNode(keys.map(GraftBridge.resolvedExprOf(_, child)), sortOrders, k, child))
  }
}
