package graft.plans

/** Minimal serializable open-addressing Long→Long map (power-of-two
  * capacity, ≤0.5 load, linear probing, splitmix64 finalizer on the
  * key). Backs broadcast model tables probed from inside generated
  * code ([[BigramLmStats]]) — `getOrZero` is a handful of array reads
  * with no boxing, so a per-row probe stays JIT-friendly inside
  * whole-stage codegen where a `java.util.HashMap[Long,Long]` would
  * box every lookup.
  */
final class LongLongMap(capacityHint: Int) extends Serializable {

  private val cap: Int = {
    val want = math.max(capacityHint, 4) * 2
    var c = 8
    while (c < want) c <<= 1
    c
  }
  private val mask = cap - 1
  private val keys = new Array[Long](cap)
  private val vals = new Array[Long](cap)
  private val used = new Array[Boolean](cap)
  private var zeroVal = 0L
  private var hasZero = false
  private var n = 0

  private def slot(k: Long): Int = {
    var h = k
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h.toInt & mask
  }

  def put(k: Long, v: Long): Unit = {
    if (k == 0L) {
      if (!hasZero) n += 1
      zeroVal = v; hasZero = true
      return
    }
    var i = slot(k)
    while (used(i) && keys(i) != k) i = (i + 1) & mask
    if (!used(i)) n += 1
    require(n <= cap / 2 + 1, s"LongLongMap over capacity hint $capacityHint")
    keys(i) = k; vals(i) = v; used(i) = true
  }

  /** Value, or 0 when absent — the add-one-smoothing default. */
  def getOrZero(k: Long): Long = {
    if (k == 0L) return if (hasZero) zeroVal else 0L
    var i = slot(k)
    while (used(i)) {
      if (keys(i) == k) return vals(i)
      i = (i + 1) & mask
    }
    0L
  }

  def size: Int = n
}
