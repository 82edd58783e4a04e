package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Top-K-per-group as a first-class operator — the full custom-operator
  * ladder (logical node → strategy → physical exec), the Spark analog
  * of adding a physical operator to the reference engine the way its
  * fork adds AM_US_JOIN.
  *
  * Why not window+filter? `row_number() OVER (PARTITION BY k ORDER BY
  * o) <= K` fully SORTS every partition (O(n log n) and the whole
  * partition held for the sort) before discarding all but K rows. This
  * operator keeps a bounded K-heap per group: O(n log K) time, O(
  * groups·K) memory, single pass — the difference between a straggler
  * sort and a streaming pass on a 100 TB fact table.
  */
case class TopKPerGroupNode(
    groupKeys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupNode =
    copy(child = c)
}

/** The shared bounded-heap pass: per-group top-K within one partition.
  * Used twice — map-side (partial) and reduce-side (final) — because
  * per-group top-K is a semilattice: the global top-K is contained in
  * the union of per-partition top-Ks, exactly like partial aggregation.
  */
private[plans] object TopKHeapPass {
  def run(rows: Iterator[InternalRow], schema: Seq[Attribute],
          keys: Seq[Expression], ord: Seq[SortOrder], k: Int): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keys, schema)
    // LazilyGeneratedOrdering: codegen'd comparator over the sort keys
    val rowOrd = new LazilyGeneratedOrdering(ord, schema)
    // per-group bounded heap; heap root = WORST kept row (reverse order)
    val heaps = new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
    rows.foreach { row =>
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[InternalRow](k + 1, rowOrd.reverse)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) heap.add(row.copy())
      else if (rowOrd.compare(row, heap.peek()) < 0) {
        heap.poll(); heap.add(row.copy())
      }
    }
    val out = Seq.newBuilder[InternalRow]
    heaps.values.forEach { h =>
      // drain each heap in ascending order for deterministic output
      val arr = new Array[InternalRow](h.size)
      var i = arr.length - 1
      while (i >= 0) { arr(i) = h.poll(); i -= 1 }
      arr.foreach(out += _)
    }
    out.result().iterator
  }
}

/** Map-side partial top-K: runs BEFORE the exchange, bounding what the
  * shuffle carries to ≤ groups·K rows per input partition (the analog
  * of partial aggregation — on a 100 TB fact table this is the
  * difference between shuffling every row and shuffling K per group
  * per partition).
  */
case class TopKPerGroupPartialExec(
    groupKeys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val (keys, ord, kk) = (groupKeys, order, k)
    child.execute().mapPartitions(
      rows => TopKHeapPass.run(rows, schema, keys, ord, kk),
      preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupPartialExec =
    copy(child = c)
}

case class TopKPerGroupExec(
    groupKeys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** Co-locate each group in one partition: one shuffle, no sort. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupKeys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val (keys, ord, kk) = (groupKeys, order, k)
    child.execute().mapPartitions(
      rows => TopKHeapPass.run(rows, schema, keys, ord, kk),
      preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(keys, order, k, child) =>
      // partial → exchange (inserted by EnsureRequirements) → final
      TopKPerGroupExec(keys, order, k,
        TopKPerGroupPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}
