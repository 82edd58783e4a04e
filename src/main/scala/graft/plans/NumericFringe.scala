package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Numeric/hash fringe of the reference's scalar surface that Spark
  * has no native spelling for, as codegen'd Catalyst expressions:
  *
  *  - nextafter (reference: src/core_functions/scalar/math/
  *    math_functions.cpp NextAfterOperator) — IEEE-754 nextafter is
  *    bit-portable across libm and the JVM, so results compare
  *    exactly with no grid snapping.
  *  - gamma / lgamma (same file, GammaOperator/LogGammaOperator) —
  *    libm tgamma/lgamma are NOT bit-portable; the JVM side uses
  *    commons-math3's Lanczos (~1e-15 rel), callers snap to a grid.
  *  - md5_number (scalar/string/md5.cpp MD5NumberOperator): the 16
  *    digest bytes read as a little-endian unsigned 128-bit integer.
  *    Spark's widest decimal (38 digits) cannot hold 2^128, so the
  *    expression renders the decimal STRING; the oracle casts its
  *    HUGEINT to VARCHAR the same way.
  */
object NumericKernels {
  /** bit_position's scanner (reference: src/common/types/bit.cpp:238
    * Bit::BitPosition) is deliberately NON-BACKTRACKING: on a
    * mismatch it resets the pattern index WITHOUT re-testing the
    * current bit, so matches that overlap a failed prefix are missed
    * ('101' inside '1101' → 0, not 2). Reproduced bit-for-bit — a
    * plain substring search does NOT match the reference.
    */
  def bitPosition(pat: UTF8String, bits: UTF8String): Int = {
    val p = pat.toString
    val b = bits.toString
    if (p.isEmpty) return 0
    var si = 0
    var i = 0
    while (i < b.length) {
      if (b.charAt(i) == p.charAt(si)) {
        si += 1
        if (si == p.length) return i - p.length + 2
      } else {
        si = 0
      }
      i += 1
    }
    0
  }

  def nextAfter(x: Double, y: Double): Double = Math.nextAfter(x, y)

  def gamma(x: Double): Double =
    org.apache.commons.math3.special.Gamma.gamma(x)

  def logGamma(x: Double): Double =
    org.apache.commons.math3.special.Gamma.logGamma(x)

  /** md5_number_lower / md5_number_upper: the two UBIGINT halves of
    * the digest (observed against the engine: LOWER reads digest
    * bytes 8..15 little-endian, UPPER reads bytes 0..7 — the halves
    * of the same hugeint md5_number reinterprets). Rendered as
    * unsigned decimal strings: Spark has no unsigned 64-bit type.
    */
  def md5NumberHalf(s: UTF8String, lower: Boolean): UTF8String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(s.getBytes)
    val off = if (lower) 8 else 0
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (digest(off + i) & 0xffL); i -= 1 }
    UTF8String.fromString(java.lang.Long.toUnsignedString(v))
  }

  /** Decimal rendering of md5(input) as a little-endian SIGNED int128
    * (the reference's HUGEINT is two's-complement, so digests with the
    * top bit of the last byte set render negative).
    */
  def md5Number(s: UTF8String): UTF8String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(s.getBytes)
    // little-endian: reverse into big-endian for BigInteger
    val be = new Array[Byte](16)
    var i = 0
    while (i < 16) { be(i) = digest(15 - i); i += 1 }
    UTF8String.fromString(new java.math.BigInteger(be).toString)
  }
}

case class BitPositionQuirk(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullSafeEval(pat: Any, bits: Any): Any =
    NumericKernels.bitPosition(pat.asInstanceOf[UTF8String], bits.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, b) => s"graft.plans.NumericKernels.bitPosition($p, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitPositionQuirk =
    copy(left = l, right = r)
}

case class NextAfter(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Math.nextAfter(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"java.lang.Math.nextAfter($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NextAfter =
    copy(left = l, right = r)
}

case class GammaFn(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(x: Any): Any =
    NumericKernels.gamma(x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NumericKernels.gamma($c)")
  override protected def withNewChildInternal(c: Expression): GammaFn = copy(child = c)
}

case class LogGammaFn(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(x: Any): Any =
    NumericKernels.logGamma(x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NumericKernels.logGamma($c)")
  override protected def withNewChildInternal(c: Expression): LogGammaFn = copy(child = c)
}

case class Md5NumberHalf(child: Expression, lower: Boolean) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(x: Any): Any =
    NumericKernels.md5NumberHalf(x.asInstanceOf[UTF8String], lower)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NumericKernels.md5NumberHalf($c, $lower)")
  override protected def withNewChildInternal(c: Expression): Md5NumberHalf = copy(child = c)
}

case class Md5Number(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(x: Any): Any =
    NumericKernels.md5Number(x.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NumericKernels.md5Number($c)")
  override protected def withNewChildInternal(c: Expression): Md5Number = copy(child = c)
}

object NumericFringe {
  import HashExpressions.{columnOf, exprOf}

  def bitPosition(pat: Column, bits: Column): Column =
    columnOf(BitPositionQuirk(exprOf(pat), exprOf(bits)))
  def nextafter(x: Column, y: Column): Column = columnOf(NextAfter(exprOf(x), exprOf(y)))
  def gamma(x: Column): Column = columnOf(GammaFn(exprOf(x)))
  def lgamma(x: Column): Column = columnOf(LogGammaFn(exprOf(x)))
  def md5Number(c: Column): Column = columnOf(Md5Number(exprOf(c)))
  def md5NumberLower(c: Column): Column = columnOf(Md5NumberHalf(exprOf(c), lower = true))
  def md5NumberUpper(c: Column): Column = columnOf(Md5NumberHalf(exprOf(c), lower = false))
}
