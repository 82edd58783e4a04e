package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Bucket-local LSH pair generation: one surviving band bucket's
  * members in, its candidate pairs out — the generator form of the
  * self-equi-join on (band, bandHash).
  *
  * Why a generator and not a join: the join shuffles each doc's
  * signature payload TWICE (build + probe side of the same bucket) and
  * hashes one full side into per-partition maps; grouping the bucket
  * once (`groupBy(bk).agg(collect_list(...))`) ships the payload once
  * and hands this kernel a contiguous member array, with the emit-once
  * band test, the signature-agreement estimate, and (optionally) the
  * exact gram-Jaccard fused into one primitive loop per pair — a pair
  * row below threshold never exists at all. Same pair set as the join
  * by construction: i<j over the member array ≡ id_a<id_b over the
  * bucket cross product, and the per-pair filters are verbatim.
  *
  * Scale posture: callers only group buckets that survived the
  * stop-band cap, so the member array is bounded by `maxBucket` (the
  * worst group is maxBucket × ~(sig+grams) bytes, far under any
  * executor's memory), and per-bucket work is bounded by maxBucket²
  * signature compares regardless of corpus size.
  *
  * `withGrams = false`: members are (id, sig, m); emits
  * (id_a, id_b, est_jaccard) where est ≥ threshold.
  * `withGrams = true`: members are (id, sig, m, grams); emits
  * (id_a, id_b, jaccard) for pairs with est ≥ threshold AND exact
  * jaccard ≥ minJaccard (sorted-merge intersection; inputs sorted
  * distinct — guaranteed by wordNgramHashes). Consumers that go on to
  * filter the exact jaccard (cluster building) push that threshold
  * here so a rejected pair is never emitted as a row at all.
  */
case class LshBucketPairs(
    members: Expression,
    band: Expression,
    numHashes: Int,
    threshold: Double,
    withGrams: Boolean,
    minJaccard: Double = 0.0)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(members, band)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LshBucketPairs =
    copy(members = newChildren(0), band = newChildren(1))

  override def elementSchema: StructType = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField(if (withGrams) "jaccard" else "est_jaccard",
      DoubleType, nullable = false)))

  private val structFields = if (withGrams) 4 else 3

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = members.eval(input)
    val bandV = band.eval(input)
    if (arr == null || bandV == null) return Iterator.empty
    val a = arr.asInstanceOf[ArrayData]
    val bandIdx = bandV.asInstanceOf[Number].longValue()
    val m = a.numElements()
    if (m < 2) return Iterator.empty

    // unpack once: primitive arrays per member, no per-pair extraction
    val ids = new Array[Long](m)
    val sigs = new Array[Array[Int]](m)
    val masks = new Array[Array[Long]](m)
    val grams = if (withGrams) new Array[Array[Long]](m) else null
    var i = 0
    while (i < m) {
      val row = a.getStruct(i, structFields)
      ids(i) = row.getLong(0)
      sigs(i) = row.getArray(1).toIntArray()
      masks(i) = row.getArray(2).toLongArray()
      if (withGrams) grams(i) = row.getArray(3).toLongArray()
      i += 1
    }

    // lazy iterator: a bucket's pair space is never buffered — the
    // consumer pulls one row at a time straight out of the loop state
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      private var nextRow: InternalRow = null

      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && i < m - 1) {
          // emit-once: this bucket is the pair's first shared surviving band
          if (HashKernels.firstEqualLong(masks(i), masks(j)) == bandIdx) {
            val agree = HashKernels.agreeCountInts(sigs(i), sigs(j))
            val est = agree.toDouble / numHashes
            if (est >= threshold) {
              val lo = math.min(ids(i), ids(j))
              val hi = math.max(ids(i), ids(j))
              if (withGrams) {
                val (gi, gj) = (grams(i), grams(j))
                val inter = HashKernels.sortedIntersectLong(gi, gj)
                val uni = math.max(gi.length + gj.length - inter, 1L)
                val jac = inter.toDouble / uni
                if (jac >= minJaccard)
                  nextRow = new GenericInternalRow(Array[Any](lo, hi, jac))
              } else {
                nextRow = new GenericInternalRow(Array[Any](lo, hi, est))
              }
            }
          }
          j += 1
          if (j >= m) { i += 1; j = i + 1 }
        }
      }

      advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow
        advance()
        r
      }
    }
  }
}
