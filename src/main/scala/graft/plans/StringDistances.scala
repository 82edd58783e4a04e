package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** String-distance kernels matching the reference's scalar surface
  * (reference: src/core_functions/scalar/string/damerau_levenshtein
  * .cpp, hamming.cpp, jaccard.cpp, jaro_winkler.cpp and third_party/
  * jaro_winkler/details/jaro_impl.hpp). Spark ships only
  * `levenshtein`; these fill the rest of the distance family as
  * codegen'd binary expressions over the raw UTF-8 BYTES — the same
  * alphabet the reference uses (its kernels iterate `string_t` data
  * bytes, not code points), so results agree on any input, and on
  * ASCII bytes == characters anyway.
  *
  * Float discipline: jaro/jaro-winkler use only +,*,/ on exact small
  * integers in the reference's operation order, so the doubles are
  * bit-identical cross-engine (no libm involvement).
  */
object StringDistanceKernels {

  /** Damerau-Levenshtein via the Lowrance-Wagner algorithm — true
    * adjacent-transposition edit distance (NOT the restricted
    * optimal-string-alignment variant), mirroring the reference's
    * damerau_levenshtein.cpp: unit costs, full H matrix with the
    * last-match bookkeeping (DA/DB in the LW paper).
    */
  def damerauLevenshtein(a: UTF8String, b: UTF8String): Long = {
    val s = a.getBytes; val t = b.getBytes
    val sl = s.length; val tl = t.length
    if (sl == 0) return tl.toLong
    if (tl == 0) return sl.toLong
    val inf = sl + tl + 1
    // distance matrix with 2-row/col offset, as in the LW formulation
    val d = Array.fill(sl + 2, tl + 2)(inf)
    var i = 0
    while (i <= sl) { d(i + 1)(1) = i; i += 1 }
    var j = 1
    while (j <= tl) { d(1)(j + 1) = j; j += 1 }
    val lastSrcMatch = new Array[Int](256) // DA: largest source index matching each byte
    i = 0
    while (i < sl) {
      var lastTgtMatch = 0 // DB: largest target index matching s(i)
      j = 0
      while (j < tl) {
        val i1 = lastSrcMatch(t(j) & 0xff)
        val j1 = lastTgtMatch
        var diag = 1
        if (s(i) == t(j)) { diag = 0; lastTgtMatch = j + 1 }
        val viaEdit = d(i + 1)(j + 1) + diag
        val viaIns = d(i + 2)(j + 1) + 1
        val viaDel = d(i + 1)(j + 2) + 1
        val viaTrans = d(i1)(j1) + (i - i1) + 1 + (j - j1)
        var m = viaEdit
        if (viaIns < m) m = viaIns
        if (viaDel < m) m = viaDel
        if (viaTrans < m) m = viaTrans
        d(i + 2)(j + 2) = m
        j += 1
      }
      lastSrcMatch(s(i) & 0xff) = i + 1
      i += 1
    }
    d(sl + 1)(tl + 1).toLong
  }

  /** Positional mismatch count of two equal-length strings
    * (reference hamming.cpp rejects unequal/empty input; callers
    * guarantee equal length, we return -1 as the never-matching
    * sentinel otherwise instead of throwing mid-pipeline).
    */
  def hamming(a: UTF8String, b: UTF8String): Long = {
    val s = a.getBytes; val t = b.getBytes
    if (s.length != t.length || s.length == 0) return -1L
    var miss = 0L
    var i = 0
    while (i < s.length) { if (s(i) != t(i)) miss += 1; i += 1 }
    miss
  }

  /** Byte-SET Jaccard (reference jaccard.cpp: bitset over the 256
    * byte alphabet, |A∩B| / |A∪B| — positions and multiplicity are
    * ignored). 0.0 for empty input (reference throws; never-match).
    */
  def jaccard(a: UTF8String, b: UTF8String): Double = {
    val s = a.getBytes; val t = b.getBytes
    if (s.length == 0 || t.length == 0) return 0.0
    val inA = new Array[Boolean](256); val inB = new Array[Boolean](256)
    var i = 0
    while (i < s.length) { inA(s(i) & 0xff) = true; i += 1 }
    i = 0
    while (i < t.length) { inB(t(i) & 0xff) = true; i += 1 }
    var inter = 0; var union = 0
    i = 0
    while (i < 256) {
      if (inA(i) && inB(i)) inter += 1
      if (inA(i) || inB(i)) union += 1
      i += 1
    }
    inter.toDouble / union.toDouble
  }

  /** Jaro similarity, mirroring third_party/jaro_winkler/details/
    * jaro_impl.hpp exactly: sliding window Bound = max(len)/2 - 1,
    * view truncation (chars beyond the window can never match),
    * common-prefix fast path, greedy lowest-available-index flagging
    * iterated over the SECOND string (the bit-parallel order), and
    * ordered-flag transposition count. Final arithmetic in the
    * reference's operation order for bit-identical doubles.
    */
  def jaro(a: UTF8String, b: UTF8String): Double = {
    val p = a.getBytes; val t = b.getBytes
    jaroBytes(p, t)
  }

  private def jaroBytes(p: Array[Byte], t: Array[Byte]): Double = {
    val pLen = p.length; val tLen = t.length
    if (pLen == 0 || tLen == 0) return 0.0
    if (pLen == 1 && tLen == 1) return if (p(0) == t(0)) 1.0 else 0.0
    // jaro_bounds: window radius + view truncation
    var pView = pLen; var tView = tLen
    var bound = 0
    if (tLen > pLen) {
      bound = tLen / 2 - 1
      if (tLen > pLen + bound) tView = pLen + bound
    } else {
      bound = pLen / 2 - 1
      if (pLen > tLen + bound) pView = tLen + bound
    }
    // remove_common_prefix on the truncated views
    var prefix = 0
    val maxCmp = math.min(pView, tView)
    while (prefix < maxCmp && p(prefix) == t(prefix)) prefix += 1
    var common = prefix.toLong
    var transpositions = 0L
    val pv = pView - prefix; val tv = tView - prefix
    if (pv > 0 && tv > 0) {
      val pFlag = new Array[Boolean](pv); val tFlag = new Array[Boolean](tv)
      var j = 0
      while (j < tv) {
        var i = math.max(0, j - bound)
        val hi = math.min(pv - 1, j + bound)
        var found = false
        while (i <= hi && !found) {
          if (!pFlag(i) && p(prefix + i) == t(prefix + j)) {
            pFlag(i) = true; tFlag(j) = true; common += 1; found = true
          }
          i += 1
        }
        j += 1
      }
      var pi = 0
      j = 0
      while (j < tv) {
        if (tFlag(j)) {
          while (!pFlag(pi)) pi += 1
          if (p(prefix + pi) != t(prefix + j)) transpositions += 1
          pi += 1
        }
        j += 1
      }
    }
    if (common == 0) return 0.0
    val t2 = transpositions / 2
    var sim = 0.0
    sim += common.toDouble / pLen.toDouble
    sim += common.toDouble / tLen.toDouble
    sim += (common.toDouble - t2.toDouble) / common.toDouble
    sim / 3.0
  }

  /** Winkler adjustment (jaro_impl.hpp jaro_winkler_similarity):
    * common prefix of the ORIGINAL strings capped at 4, boost applied
    * only above the classic 0.7 threshold, weight 0.1.
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val p = a.getBytes; val t = b.getBytes
    val maxPrefix = math.min(math.min(p.length, t.length), 4)
    var prefix = 0
    while (prefix < maxPrefix && p(prefix) == t(prefix)) prefix += 1
    var sim = jaroBytes(p, t)
    if (sim > 0.7) sim += prefix.toDouble * 0.1 * (1.0 - sim)
    sim
  }
}

/** Catalyst expressions wrapping [[StringDistanceKernels]] — one
  * static kernel call per row inside whole-stage codegen, same
  * pattern as [[HashExpressions]].
  */
abstract class StringDistanceExpr extends BinaryExpression {
  protected def kernelName: String
  protected def kernelEval(a: UTF8String, b: UTF8String): Any

  override def nullSafeEval(a: Any, b: Any): Any =
    kernelEval(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.StringDistanceKernels.$kernelName($l, $r)")
}

case class DamerauLevenshtein(left: Expression, right: Expression) extends StringDistanceExpr {
  override def dataType: DataType = LongType
  protected def kernelName = "damerauLevenshtein"
  protected def kernelEval(a: UTF8String, b: UTF8String): Any =
    StringDistanceKernels.damerauLevenshtein(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DamerauLevenshtein =
    copy(left = l, right = r)
}

case class HammingDistance(left: Expression, right: Expression) extends StringDistanceExpr {
  override def dataType: DataType = LongType
  protected def kernelName = "hamming"
  protected def kernelEval(a: UTF8String, b: UTF8String): Any =
    StringDistanceKernels.hamming(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDistance =
    copy(left = l, right = r)
}

case class JaccardSim(left: Expression, right: Expression) extends StringDistanceExpr {
  override def dataType: DataType = DoubleType
  protected def kernelName = "jaccard"
  protected def kernelEval(a: UTF8String, b: UTF8String): Any =
    StringDistanceKernels.jaccard(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

case class JaroSim(left: Expression, right: Expression) extends StringDistanceExpr {
  override def dataType: DataType = DoubleType
  protected def kernelName = "jaro"
  protected def kernelEval(a: UTF8String, b: UTF8String): Any =
    StringDistanceKernels.jaro(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroSim =
    copy(left = l, right = r)
}

case class JaroWinklerSim(left: Expression, right: Expression) extends StringDistanceExpr {
  override def dataType: DataType = DoubleType
  protected def kernelName = "jaroWinkler"
  protected def kernelEval(a: UTF8String, b: UTF8String): Any =
    StringDistanceKernels.jaroWinkler(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSim =
    copy(left = l, right = r)
}

/** Column-level API for the distance family. */
object StringDistances {
  import HashExpressions.{columnOf, exprOf}

  def damerauLevenshtein(a: Column, b: Column): Column =
    columnOf(DamerauLevenshtein(exprOf(a), exprOf(b)))
  def hamming(a: Column, b: Column): Column =
    columnOf(HammingDistance(exprOf(a), exprOf(b)))
  def jaccard(a: Column, b: Column): Column =
    columnOf(JaccardSim(exprOf(a), exprOf(b)))
  def jaro(a: Column, b: Column): Column =
    columnOf(JaroSim(exprOf(a), exprOf(b)))
  def jaroWinkler(a: Column, b: Column): Column =
    columnOf(JaroWinklerSim(exprOf(a), exprOf(b)))
}
