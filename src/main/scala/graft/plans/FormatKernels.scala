package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Human-readable rendering functions from the reference's scalar
  * surface (reference: src/core_functions/scalar/string/format_bytes
  * .cpp → common/string_util.cpp BytesToHumanReadableString, and
  * bar.cpp + common/unicode_bar.hpp). Mirrored digit-for-digit:
  * successive divmod through the unit ladder with a single truncated
  * decimal (0→0, multiplier−1→9), and eighth-block bars whose space
  * padding compares UTF-8 BYTE length (a quirk of the reference —
  * full blocks are 3 bytes — preserved deliberately).
  */
object FormatKernels {
  private val binaryUnits = Array("bytes", "KiB", "MiB", "GiB", "TiB", "PiB")
  private val decimalUnits = Array("bytes", "kB", "MB", "GB", "TB", "PB")

  /** format_bytes / format_readable_decimal_size. Negative input
    * renders as "-" + magnitude; Long.MinValue's magnitude (2^63)
    * survives via unsigned division.
    */
  def formatBytes(bytes: Long, multiplier: Long): UTF8String = {
    val neg = bytes < 0
    var u = if (neg) -bytes else bytes // -Long.MinValue wraps to itself = 2^63 unsigned
    val units = if (multiplier == 1000L) decimalUnits else binaryUnits
    val arr = new Array[Long](6)
    arr(0) = u
    var i = 1
    while (i < 6) {
      arr(i) = java.lang.Long.divideUnsigned(arr(i - 1), multiplier)
      arr(i - 1) = java.lang.Long.remainderUnsigned(arr(i - 1), multiplier)
      i += 1
    }
    val sign = if (neg) "-" else ""
    i = 5
    while (i >= 1) {
      if (arr(i) != 0L) {
        val frac = arr(i - 1) * 10L / multiplier
        return UTF8String.fromString(s"$sign${arr(i)}.$frac ${units(i)}")
      }
      i -= 1
    }
    val unit = if (bytes == 1L) " byte" else " bytes"
    UTF8String.fromString(s"$sign${arr(0)}$unit")
  }

  private val fullBlock = "█"
  private val partialBlocks =
    Array(" ", "▏", "▎", "▍", "▌", "▋", "▊", "▉")

  /** bar(x, min, max, max_width): eighth-resolution unicode bar. */
  def bar(x: Double, min: Double, max: Double, maxWidth: Double): UTF8String = {
    val width =
      if (x.isNaN || min.isNaN || max.isNaN || x <= min) 0.0
      else if (x >= max) maxWidth
      else maxWidth * (x - min) / (max - min)
    val widthAsInt = (width * 8).toInt
    val full = widthAsInt / 8
    val rem = widthAsInt % 8
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < full) { sb.append(fullBlock); i += 1 }
    var byteLen = full * 3
    if (rem != 0) { sb.append(partialBlocks(rem)); byteLen += 3 }
    // reference pads by BYTE length (3-byte blocks), not glyph count
    val target = maxWidth.toInt
    while (byteLen < target) { sb.append(' '); byteLen += 1 }
    UTF8String.fromString(sb.toString)
  }
}

/** format_bytes(bigint) — binary (1024) or decimal (1000) ladder. */
case class FormatBytes(child: Expression, multiplier: Long) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    FormatKernels.formatBytes(input.asInstanceOf[Long], multiplier)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.FormatKernels.formatBytes($c, ${multiplier}L)")

  override protected def withNewChildInternal(c: Expression): FormatBytes =
    copy(child = c)
}

/** bar(x, min, max, width) with the range constants bound at plan time. */
case class BarChart(child: Expression, min: Double, max: Double, width: Double)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    FormatKernels.bar(input.asInstanceOf[Double], min, max, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.FormatKernels.bar($c, $min, $max, $width)")

  override protected def withNewChildInternal(c: Expression): BarChart =
    copy(child = c)
}

/** gcd/lcm over BIGINT (reference: core_functions/scalar/math —
  * greatest_common_divisor / least_common_multiple), absent from
  * Spark's function surface. Euclid on magnitudes; gcd(0,0)=0.
  */
object IntMathKernels {
  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }
  def lcm(a: Long, b: Long): Long = {
    if (a == 0 || b == 0) 0L
    else math.abs(a / gcd(a, b) * b)
  }
}

case class Gcd(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    IntMathKernels.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.IntMathKernels.gcd($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Gcd =
    copy(left = l, right = r)
}

case class Lcm(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    IntMathKernels.lcm(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.IntMathKernels.lcm($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Lcm =
    copy(left = l, right = r)
}

object Formats {
  import HashExpressions.{columnOf, exprOf}

  def formatBytes(c: Column): Column = columnOf(FormatBytes(exprOf(c), 1024L))
  def formatReadableDecimalSize(c: Column): Column = columnOf(FormatBytes(exprOf(c), 1000L))
  def bar(x: Column, min: Double, max: Double, width: Double): Column =
    columnOf(BarChart(exprOf(x), min, max, width))
  def gcd(a: Column, b: Column): Column = columnOf(Gcd(exprOf(a), exprOf(b)))
  def lcm(a: Column, b: Column): Column = columnOf(Lcm(exprOf(a), exprOf(b)))
}
