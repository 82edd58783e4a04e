package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Int8 embedding quantization for the ANN scale path.
  *
  * Per-vector symmetric max-abs quantization: q_i = round(127·x_i /
  * max|x|). The scale factor cancels in cosine similarity —
  * cos(q_a, q_b) needs NO dequantization — so the search corpus
  * shrinks 4× (Array[Float] → bytes) and the hot loop is pure
  * integer multiply-accumulate, which both JIT-vectorizes wider than
  * the float path and quarters the shuffle/cache footprint at
  * 100 TB. Recall vs exact float cosine is a measured contract
  * (QuantizationSpec), not a hope.
  */
object QuantKernels {

  /** Symmetric per-vector int8 quantization (max-abs / 127). */
  def quantizeInt8(vec: ArrayData): Array[Byte] = {
    val n = vec.numElements()
    val out = new Array[Byte](n)
    var maxAbs = 0f
    var i = 0
    while (i < n) {
      val v = math.abs(vec.getFloat(i)); if (v > maxAbs) maxAbs = v; i += 1
    }
    if (maxAbs == 0f) return out
    val inv = 127.0f / maxAbs
    i = 0
    while (i < n) { out(i) = math.round(vec.getFloat(i) * inv).toByte; i += 1 }
    out
  }

  /** Cosine of two int8-quantized vectors — integer dot and norms,
    * one double division at the end. Zero vectors yield 0.0.
    */
  def int8Cosine(a: Array[Byte], b: Array[Byte]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val x = a(i).toLong; val y = b(i).toLong
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }
}

/** float vector → int8 bytes (BinaryType). */
case class QuantizeInt8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    QuantKernels.quantizeInt8(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.QuantKernels.quantizeInt8($c)")

  override protected def withNewChildInternal(c: Expression): QuantizeInt8 =
    copy(child = c)
}

/** Cosine similarity of two int8-quantized vectors. */
case class Int8Cosine(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    QuantKernels.int8Cosine(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.QuantKernels.int8Cosine($l, $r)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Int8Cosine =
    copy(left = l, right = r)
}

/** int8 bytes → array<bigint> — the SQL-portable view of a quantized
  * vector (the p06 integer-grid k-means works on long arrays so the
  * DuckDB oracle can replay every step with exact integer arithmetic).
  * Eval-only: off the benched hot paths.
  */
case class BytesToLongArray(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      input.asInstanceOf[Array[Byte]].map(_.toLong))

  override protected def withNewChildInternal(c: Expression): BytesToLongArray =
    copy(child = c)
}

object Quantization {
  import HashExpressions.{columnOf, exprOf}

  def quantizeInt8(vec: Column): Column = columnOf(QuantizeInt8(exprOf(vec)))
  def int8Cosine(a: Column, b: Column): Column =
    columnOf(Int8Cosine(exprOf(a), exprOf(b)))

  /** Quantize to int8 and expose as array<bigint> (kernel-exact). */
  def int8Longs(vec: Column): Column =
    columnOf(BytesToLongArray(QuantizeInt8(exprOf(vec))))
}
