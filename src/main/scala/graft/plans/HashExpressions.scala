package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom Catalyst expressions for the hashing hot paths.
  *
  * Spark's higher-order array functions (`transform`/`filter`/
  * `aggregate`) evaluate their lambdas interpreted — per-element boxing
  * and a fresh array per nesting level. For minhash (64 permutations ×
  * hundreds of shingles per row) that is ~10⁹ boxed ops per 50k docs.
  * These expressions do the same math as one tight primitive loop per
  * row: ~50× faster, and the natural (b) step on the preference ladder
  * (compose built-ins → custom Expression → custom operator).
  */
object HashExpressions {
  /** 2^31-1; universal hashing modulus (keeps a*h+b under 2^62). */
  val MersenneP: Long = 2147483647L

  /** Column ↔ Expression bridge for the classic (non-Connect) API. */
  def columnOf(e: Expression): Column = GraftBridge.columnOf(e)

  def exprOf(c: Column): Expression = GraftBridge.exprOf(c)
}

/** Distinct 31-bit rolling hashes of the byte k-grams of a string —
  * the shingle+hash+dedup pipeline fused into one allocation-free pass
  * (a `transform(sequence…substr)` expression tree allocates a
  * substring per position and evaluates interpreted). Polynomial
  * rolling hash: h(i+1) derives from h(i) in O(1), so total work is
  * O(bytes), not O(bytes·k).
  */
case class CharShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  import HashExpressions.MersenneP

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private val B = 1315423911L // odd polynomial base

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val n = bytes.length
    val m = if (n <= k) 1 else n - k + 1
    val hs = new Array[Long](m)
    if (n <= k) {
      var h = 0L
      var i = 0
      while (i < n) { h = h * B + (bytes(i) & 0xff); i += 1 }
      hs(0) = (h & Long.MaxValue) % MersenneP
    } else {
      // B^(k-1) with wraparound (consistent everywhere)
      var bk = 1L
      var e = 0
      while (e < k - 1) { bk *= B; e += 1 }
      var h = 0L
      var i = 0
      while (i < k) { h = h * B + (bytes(i) & 0xff); i += 1 }
      hs(0) = (h & Long.MaxValue) % MersenneP
      var p = 1
      while (p < m) {
        h = (h - (bytes(p - 1) & 0xff) * bk) * B + (bytes(p + k - 1) & 0xff)
        hs(p) = (h & Long.MaxValue) % MersenneP
        p += 1
      }
    }
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < m) {
      if (r == 0 || hs(r) != hs(r - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  override protected def withNewChildInternal(c: Expression): CharShingleHashes =
    copy(child = c)
}

/** Distinct hashes of the word n-grams of a string — tokenize
  * (whitespace, ASCII-lowercased), hash each token, combine n
  * consecutive token hashes, dedupe. One allocation-light pass;
  * replaces split+transform+slice+concat_ws trees (interpreted) for
  * exact-Jaccard verification, where comparing gram HASHES instead of
  * gram strings is both faster and collision-negligible at 64 bits.
  */
case class WordNgramHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private val B = 1315423911L

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    // token hashes
    val toks = new java.util.ArrayList[java.lang.Long]()
    var h = 0L
    var in = false
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i)
      val ws = b0 == ' ' || b0 == '\t' || b0 == '\n' || b0 == '\r'
      if (ws) {
        if (in) { toks.add(h); in = false; h = 0L }
      } else {
        val lc = if (b0 >= 'A' && b0 <= 'Z') (b0 + 32).toByte else b0
        h = h * B + (lc & 0xff)
        in = true
      }
      i += 1
    }
    if (in) toks.add(h)
    val t = toks.size
    val m = math.max(1, t - n + 1)
    val out = new Array[Long](if (t == 0) 0 else m)
    var p = 0
    while (p < out.length) {
      var g = 0L
      var j = 0
      val end = math.min(p + n, t)
      var q = p
      while (q < end) { g = g * 0x9e3779b97f4a7c15L + toks.get(q); q += 1; j += 1 }
      out(p) = g
      p += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < out.length) {
      if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  override protected def withNewChildInternal(c: Expression): WordNgramHashes =
    copy(child = c)
}

/** Cosine similarity of two float vectors, accumulated left-to-right
  * in double (engine-portable: same order ⇒ same bits as DuckDB's
  * list_sum-over-list_transform form). One primitive loop instead of
  * three interpreted higher-order lambdas per row — the difference
  * between O(n·d) boxed ops and a vectorizable loop on ANN paths.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val xd = x(i).toDouble; val yd = y(i).toDouble
      dot += xd * yd; nx += xd * xd; ny += yd * yd
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Winnowing fingerprint (MOSS-style, simplified) fused into one pass:
  * k-gram rolling hashes → min of each sliding window of w → distinct
  * sorted mins → one mixed 64-bit id. The expression-tree formulation
  * (transform + slice + array_min per window) evaluates interpreted
  * and quadratic-ish; this is O(bytes · w) primitive ops.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  private val B = 1315423911L

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val n = bytes.length
    val m = if (n <= k) 1 else n - k + 1
    val hs = new Array[Long](m)
    if (n <= k) {
      var h = 0L; var i = 0
      while (i < n) { h = h * B + (bytes(i) & 0xff); i += 1 }
      hs(0) = h
    } else {
      var bk = 1L; var e = 0
      while (e < k - 1) { bk *= B; e += 1 }
      var h = 0L; var i = 0
      while (i < k) { h = h * B + (bytes(i) & 0xff); i += 1 }
      hs(0) = h
      var p = 1
      while (p < m) {
        h = (h - (bytes(p - 1) & 0xff) * bk) * B + (bytes(p + k - 1) & 0xff)
        hs(p) = h
        p += 1
      }
    }
    val wm = if (m <= w) 1 else m - w + 1
    val mins = new Array[Long](wm)
    var i = 0
    while (i < wm) {
      var mn = hs(i)
      var j = i + 1
      val end = math.min(i + w, m)
      while (j < end) { if (hs(j) < mn) mn = hs(j); j += 1 }
      mins(i) = mn
      i += 1
    }
    java.util.Arrays.sort(mins)
    var fp = 0xcbf29ce484222325L
    var r = 0
    while (r < wm) {
      if (r == 0 || mins(r) != mins(r - 1)) {
        fp ^= mins(r); fp *= 0x100000001b3L
      }
      r += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(c: Expression): WinnowFingerprint =
    copy(child = c)
}

/** sig[i] = min over shingle-hashes h of ((a(i)*h + b(i)) mod p).
  * Input: array<long> of 31-bit shingle hashes. Output: array<long>.
  */
case class MinHashSignature(child: Expression, as: Array[Long], bs: Array[Long])
    extends UnaryExpression {
  import HashExpressions.MersenneP

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  /** Full codegen (no fallback): the permutation loop is emitted
    * directly into the stage's generated class, so the hot path pays
    * no per-row virtual call or boxed hand-off.
    */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val asRef = ctx.addReferenceObj("mhAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("mhBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
      long[] mhHs = $c.toLongArray();
      int mhN = $asRef.length;
      long[] mhMins = new long[mhN];
      java.util.Arrays.fill(mhMins, Long.MAX_VALUE);
      for (int mhJ = 0; mhJ < mhHs.length; mhJ++) {
        long mhH = mhHs[mhJ];
        for (int mhI = 0; mhI < mhN; mhI++) {
          long mhV = $asRef[mhI] * mhH + $bsRef[mhI];
          mhV = (mhV & ${MersenneP}L) + (mhV >>> 31);
          mhV = (mhV & ${MersenneP}L) + (mhV >>> 31);
          if (mhV >= ${MersenneP}L) mhV -= ${MersenneP}L;
          if (mhV < mhMins[mhI]) mhMins[mhI] = mhV;
        }
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(mhMins);
      """
    })
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData].toLongArray()
    val n = as.length
    val mins = Array.fill(n)(Long.MaxValue)
    var j = 0
    while (j < hs.length) {
      val h = hs(j)
      var i = 0
      while (i < n) {
        // mod 2^31-1 via Mersenne folding (≡ %, ~2× cheaper):
        // x mod (2^31-1) = fold(x & p + x >>> 31) until < p
        var v = as(i) * h + bs(i)
        v = (v & MersenneP) + (v >>> 31)
        v = (v & MersenneP) + (v >>> 31)
        if (v >= MersenneP) v -= MersenneP
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** SimHash fingerprint over token hashes as 4×16-bit blocks (the
  * pigeonhole blocking unit for hamming ≤ 3 joins).
  */
case class SimHashBlocks(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData].toLongArray()
    val ones = new Array[Int](64)
    var j = 0
    while (j < hs.length) {
      val h = hs(j)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) ones(i) += 1
        i += 1
      }
      j += 1
    }
    val half = hs.length
    val blocks = new Array[Long](4)
    var b = 0
    while (b < 4) {
      var acc = 0L
      var i = 0
      while (i < 16) {
        // majority vote per bit, MSB-first fold (acc*2 + bit)
        acc = acc * 2 + (if (ones(b * 16 + i) * 2 > half) 1L else 0L)
        i += 1
      }
      blocks(b) = acc
      b += 1
    }
    new GenericArrayData(blocks)
  }

  override protected def withNewChildInternal(c: Expression): SimHashBlocks =
    copy(child = c)
}
