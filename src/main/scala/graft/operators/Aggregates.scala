package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Coalesce, Expression, Literal, Multiply}
import org.apache.spark.sql.catalyst.expressions.aggregate.{DeclarativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.HashExpressions

/** Aggregate-function long tail the reference ships natively and
  * Spark lacks: PRODUCT (reference:
  * src/core_functions/aggregate/distributive/product.cpp) and
  * APPROX_TOP_K (holistic/approx_top_k.cpp).
  *
  * Both are real Catalyst aggregates — they ride Spark's partial
  * aggregation (map-side combine, one narrow buffer per group per
  * mapper crosses the shuffle), so they scale exactly like built-in
  * aggs: no window, no collect, no second pass.
  */
object Aggregates {
  /** PRODUCT(x): NULL-skipping running product; NULL for an empty /
    * all-NULL group (matching the reference's product.cpp).
    *
    * FP multiplication is commutative but not associative, so for
    * general doubles the last bits depend on partition order — same
    * as any engine's parallel product. Over exactly-representable
    * factors whose product stays ≤ 2^53 (the oracle entry's case:
    * small-int factors) every order yields the identical exact
    * result.
    */
  def product(x: Column): Column =
    HashExpressions.columnOf(
      ProductAgg(HashExpressions.exprOf(x)).toAggregateExpression())

  /** APPROX_TOP_K(x, k) via the Space-Saving sketch (Metwally et al.,
    * "Efficient Computation of Frequent and Top-k Elements in Data
    * Streams" — the same sketch family the reference's
    * approx_top_k.cpp uses): at most `capacity` counters per group;
    * when full, the minimum counter is surrendered to the new value
    * (count inherits the floor, error records it). Exact whenever a
    * group's distinct-value count stays ≤ capacity; otherwise counts
    * are overestimates within the recorded error — the standard
    * Space-Saving guarantee.
    *
    * Returns array<struct<v: string, cnt: long>> sorted by
    * (cnt DESC, v ASC), truncated to k — deterministic given exact
    * counts.
    */
  def approxTopK(x: Column, k: Int, capacity: Int): Column =
    HashExpressions.columnOf(
      ApproxTopKAgg(HashExpressions.exprOf(x), k, capacity).toAggregateExpression())

  /** KAHAN_SUM / FSUM (reference: aggregate/distributive/sum.cpp
    * KahanSumOperation + sum_helpers.hpp KahanAddInternal):
    * compensated summation carrying a (value, err) pair per group.
    * The reference's EXACT operation order is mirrored — including
    * its two quirks: merge folds the partner's value then its err
    * through the same compensated add, and finalize returns `value`
    * WITHOUT adding the residual err (sum_helpers.hpp:17, so e.g.
    * kahan_sum(1e16, 1.0, -1e16) is 0.0 there, not 1.0 — see
    * NumericFringeSpec for the contrast with textbook Kahan).
    * Declarative — rides partial aggregation and codegen like any
    * built-in sum; the buffer is two doubles + a bool per group.
    */
  def kahanSum(x: Column): Column =
    HashExpressions.columnOf(
      KahanSumAgg(HashExpressions.exprOf(x)).toAggregateExpression())

  /** RESERVOIR_QUANTILE(x, q, sample_size) (reference: holistic/
    * reservoir_quantile.cpp): bounded-memory quantile over a
    * reservoir sample. Finalize is the reference's exact index math —
    * element at truncate((n−1)·q) of the sorted reservoir
    * (reservoir_quantile.cpp:165) — so whenever a group's row count
    * stays ≤ sample_size the result is EXACT and deterministic (the
    * reservoir is the whole group; the oracle entry runs in this
    * regime). Beyond the cap, replacement is Algorithm R with
    * hash-derived indices: deterministic for a fixed partition order,
    * sample-dependent across plans — the same contract as the
    * reference's RNG sampler.
    */
  def reservoirQuantile(x: Column, q: Double, sampleSize: Int): Column =
    HashExpressions.columnOf(
      ReservoirQuantileAgg(HashExpressions.exprOf(x), q, sampleSize)
        .toAggregateExpression())
}

final class ReservoirBuffer {
  var seen: Long = 0L
  var values: scala.collection.mutable.ArrayBuffer[Double] =
    new scala.collection.mutable.ArrayBuffer[Double]()
}

case class ReservoirQuantileAgg(
    child: Expression,
    q: Double,
    sampleSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ReservoirBuffer] {

  require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
  require(sampleSize > 0, s"sample_size must be positive, got $sampleSize")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): ReservoirBuffer = new ReservoirBuffer

  private def childD(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else child.dataType match {
      case DoubleType => v
      case _ => Cast(child, DoubleType).eval(input)
    }
  }

  /** Algorithm R slot for the k-th element seen (0-based), hash-mixed
    * for determinism: uniform over [0, k] — replace if < capacity.
    */
  private def slot(k: Long): Long = {
    var h = k * 0x9e3779b97f4a7c15L
    h ^= h >>> 32; h *= 0xff51afd7ed558ccdL; h ^= h >>> 32
    java.lang.Long.remainderUnsigned(h, k + 1)
  }

  private def add(buf: ReservoirBuffer, x: Double): Unit = {
    if (buf.values.length < sampleSize) buf.values += x
    else {
      val s = slot(buf.seen)
      if (s < sampleSize) buf.values(s.toInt) = x
    }
    buf.seen += 1
  }

  override def update(buf: ReservoirBuffer, input: InternalRow): ReservoirBuffer = {
    val v = childD(input)
    if (v != null) add(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: ReservoirBuffer, other: ReservoirBuffer): ReservoirBuffer = {
    val total = buf.seen + other.seen
    if (buf.values.length + other.values.length <= sampleSize) {
      buf.values ++= other.values
    } else {
      // weighted downsample: each side contributes slots in proportion
      // to the row count its reservoir represents; strided picks
      // spread each side's contribution across its slot positions
      val na = math.min(buf.values.length.toLong,
        math.max(0L, math.round(sampleSize.toDouble * buf.seen / total)))
      val nb = math.min(other.values.length.toLong, sampleSize - na)
      val out = new scala.collection.mutable.ArrayBuffer[Double](sampleSize)
      var i = 0L
      while (i < na) {
        out += buf.values(((i * buf.values.length) / na).toInt); i += 1
      }
      i = 0L
      while (i < nb) {
        out += other.values(((i * other.values.length) / nb).toInt); i += 1
      }
      buf.values = out
    }
    buf.seen = total
    buf
  }

  override def eval(buf: ReservoirBuffer): Any = {
    if (buf.values.isEmpty) null
    else {
      val sorted = buf.values.toArray
      java.util.Arrays.sort(sorted)
      sorted(((sorted.length - 1).toDouble * q).toLong.toInt)
    }
  }

  override def serialize(buf: ReservoirBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + 8 * buf.values.length)
    bb.putLong(buf.seen)
    bb.putInt(buf.values.length)
    buf.values.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ReservoirBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new ReservoirBuffer
    buf.seen = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.values += bb.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ReservoirQuantileAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ReservoirQuantileAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ReservoirQuantileAgg =
    copy(child = newChildren(0))
}

/** Compensated (Kahan) summation with the reference's exact operation
  * order: update is KahanAddInternal(input, value, err); merge is
  * KahanAddInternal(other.value) THEN KahanAddInternal(other.err);
  * finalize returns value (err is dropped, as the reference does).
  * NULL inputs are skipped; an empty/all-NULL group returns NULL.
  */
case class KahanSumAgg(child: Expression) extends DeclarativeAggregate {
  import org.apache.spark.sql.catalyst.expressions.{Add, And, GreaterThan, If, IsNull, Or, Subtract}

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  private lazy val sum = AttributeReference("ksum", DoubleType, nullable = false)()
  private lazy val err = AttributeReference("kerr", DoubleType, nullable = false)()
  private lazy val isset = AttributeReference("kset", BooleanType, nullable = false)()

  private def childD: Expression =
    if (child.dataType == DoubleType) child else Cast(child, DoubleType)

  private def add(a: Expression, b: Expression) = Add(a, b)
  private def sub(a: Expression, b: Expression) = Subtract(a, b)

  /** (newSum, newErr) after KahanAddInternal(x, s, e):
    * diff = x − e; newval = s + diff; e' = (newval − s) − diff.
    */
  private def kahanStep(x: Expression, s: Expression, e: Expression): (Expression, Expression) = {
    val diff = sub(x, e)
    val newval = add(s, diff)
    (newval, sub(sub(newval, s), diff))
  }

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(sum, err, isset)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0), Literal(false))

  override lazy val updateExpressions: Seq[Expression] = {
    val (s1, e1) = kahanStep(childD, sum, err)
    Seq(
      If(IsNull(child), sum, s1),
      If(IsNull(child), err, e1),
      Or(isset, org.apache.spark.sql.catalyst.expressions.Not(IsNull(child))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    // fold the partner's (value, err) through two sequential
    // compensated adds, exactly as KahanSumState::Combine does —
    // which (like the reference) folds UNCONDITIONALLY, even when the
    // partner state is empty (its (0,0) pair is a no-op only because
    // empty states initialize to exact zeros)
    val (s1, e1) = kahanStep(sum.right, sum.left, err.left)
    val (s2, e2) = kahanStep(err.right, s1, e1)
    Seq(s2, e2, Or(isset.left, isset.right))
  }

  override lazy val evaluateExpression: Expression =
    If(isset, sum, Literal(null, DoubleType))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KahanSumAgg =
    copy(child = newChildren(0))
}

case class ProductAgg(child: Expression) extends DeclarativeAggregate {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  private lazy val prod = AttributeReference("product", DoubleType)()
  private def childD: Expression =
    if (child.dataType == DoubleType) child else Cast(child, DoubleType)

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(prod)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(null, DoubleType))
  // NULL-skipping fold: null*x = null, so Coalesce picks the
  // still-live operand; both null → stays null
  override lazy val updateExpressions: Seq[Expression] =
    Seq(Coalesce(Seq(Multiply(prod, childD), childD, prod)))
  override lazy val mergeExpressions: Seq[Expression] =
    Seq(Coalesce(Seq(Multiply(prod.left, prod.right), prod.right, prod.left)))
  override lazy val evaluateExpression: Expression = prod

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ProductAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "product"
}

/** Space-Saving counter set: value → [count, error]. */
final class TopKBuffer {
  val counts = new java.util.HashMap[UTF8String, Array[Long]]()
}

case class ApproxTopKAgg(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0 && capacity >= k, s"need 0 < k <= capacity, got k=$k capacity=$capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", StringType), StructField("cnt", LongType))))

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer

  private def minEntry(buf: TopKBuffer): java.util.Map.Entry[UTF8String, Array[Long]] = {
    var min: java.util.Map.Entry[UTF8String, Array[Long]] = null
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (min == null || e.getValue()(0) < min.getValue()(0)) min = e
    }
    min
  }

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v != null) {
      val e = buf.counts.get(v)
      if (e != null) e(0) += 1
      else if (buf.counts.size < capacity) {
        // clone: the input UTF8String may alias a reused scan buffer
        buf.counts.put(v.clone(), Array(1L, 0L))
      } else {
        val m = minEntry(buf)
        val floor = m.getValue()(0)
        buf.counts.remove(m.getKey)
        buf.counts.put(v.clone(), Array(floor + 1L, floor))
      }
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.counts.forEach { (v, c) =>
      val e = buf.counts.get(v)
      if (e != null) { e(0) += c(0); e(1) += c(1) }
      else buf.counts.put(v, c)
    }
    while (buf.counts.size > capacity) {
      val m = minEntry(buf)
      buf.counts.remove(m.getKey)
    }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val entries = new java.util.ArrayList(buf.counts.entrySet())
    entries.sort { (a, b) =>
      val c = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    val n = math.min(k, entries.size)
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      val e = entries.get(i)
      rows(i) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    var size = 4
    buf.counts.forEach { (v, _) => size += 4 + v.numBytes() + 16 }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.counts.size)
    buf.counts.forEach { (v, c) =>
      val bytes = v.getBytes
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c(0)); bb.putLong(c(1))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val vb = new Array[Byte](len)
      bb.get(vb)
      buf.counts.put(UTF8String.fromBytes(vb), Array(bb.getLong, bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ApproxTopKAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "approx_top_k"
}
