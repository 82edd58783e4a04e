package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization surface (reference:
  * src/function/scalar/string/strip_accents.cpp → utf8proc
  * utf8proc_remove_accents, and nfc_normalize → utf8proc NFC).
  *
  * strip_accents is NFD decomposition followed by dropping combining
  * marks — exactly what utf8proc's
  * `UTF8PROC_DECOMPOSE | UTF8PROC_STRIPMARK` does
  * (third_party/utf8proc/utf8proc.cpp:507) — so the JDK spelling
  * `Normalizer.normalize(s, NFD)` + remove `\p{M}` reproduces it for
  * the Latin repertoire the tests exercise. The reference fast-paths
  * pure-ASCII inputs untouched; mirrored here for the same reason
  * (the normalizer allocates, ASCII dominates).
  */
object UnicodeKernels {
  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) >= 0x80) return false; i += 1 }
    true
  }

  private val marks = "\\p{M}+".r

  def stripAccents(input: UTF8String): UTF8String = {
    val s = input.toString
    if (isAscii(s)) input
    else UTF8String.fromString(
      marks.replaceAllIn(Normalizer.normalize(s, Normalizer.Form.NFD), ""))
  }

  def nfcNormalize(input: UTF8String): UTF8String = {
    val s = input.toString
    if (isAscii(s) || Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  /** Extended-grapheme-cluster boundaries of s (char offsets,
    * starts with 0, ends with s.length). JDK BreakIterator's
    * character instance ≡ utf8proc's UAX #29 clusters for the
    * combining-mark content the oracle exercises.
    */
  private def graphemeBounds(s: String): Array[Int] = {
    val bi = java.text.BreakIterator.getCharacterInstance(java.util.Locale.ROOT)
    bi.setText(s)
    val out = new scala.collection.mutable.ArrayBuffer[Int](s.length + 1)
    var b = bi.first()
    while (b != java.text.BreakIterator.DONE) { out += b; b = bi.next() }
    out.toArray
  }

  /** left_grapheme(s, n) (reference: scalar/string/left_right.cpp,
    * LeftRightGrapheme): first n grapheme clusters; negative n drops
    * |n| clusters from the END; |n| beyond the cluster count clamps.
    */
  def leftGrapheme(input: UTF8String, n: Long): UTF8String = {
    val s = input.toString
    if (isAscii(s)) { // fast path: clusters == chars
      val g = s.length
      val keep = clamp(n, g)
      return UTF8String.fromString(s.substring(0, keep))
    }
    val bounds = graphemeBounds(s)
    val g = bounds.length - 1
    UTF8String.fromString(s.substring(0, bounds(clamp(n, g))))
  }

  /** right_grapheme(s, n): last n clusters; negative drops from the
    * FRONT.
    */
  def rightGrapheme(input: UTF8String, n: Long): UTF8String = {
    val s = input.toString
    if (isAscii(s)) {
      val g = s.length
      val keep = clamp(n, g)
      return UTF8String.fromString(s.substring(g - keep))
    }
    val bounds = graphemeBounds(s)
    val g = bounds.length - 1
    UTF8String.fromString(s.substring(bounds(g - clamp(n, g))))
  }

  /** Clusters to keep: n ≥ 0 keeps min(n, g); n < 0 keeps g − min(|n|, g). */
  private def clamp(n: Long, g: Int): Int =
    if (n >= 0) math.min(n, g.toLong).toInt
    else g - math.min(-n, g.toLong).toInt
}

/** Column wrappers, StringDistances-style. */
object UnicodeFns {
  import HashExpressions.{columnOf, exprOf}
  import org.apache.spark.sql.Column

  def stripAccents(c: Column): Column = columnOf(StripAccents(exprOf(c)))
  def nfcNormalize(c: Column): Column = columnOf(NfcNormalize(exprOf(c)))
  def leftGrapheme(c: Column, n: Column): Column =
    columnOf(LeftGrapheme(exprOf(c), exprOf(n)))
  def rightGrapheme(c: Column, n: Column): Column =
    columnOf(RightGrapheme(exprOf(c), exprOf(n)))
}

/** left_grapheme(varchar, n) — codegen'd. */
case class LeftGrapheme(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any, n: Any): Any =
    UnicodeKernels.leftGrapheme(s.asInstanceOf[UTF8String], n.asInstanceOf[Number].longValue)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) => s"graft.plans.UnicodeKernels.leftGrapheme($s, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LeftGrapheme =
    copy(left = l, right = r)
}

/** right_grapheme(varchar, n) — codegen'd. */
case class RightGrapheme(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any, n: Any): Any =
    UnicodeKernels.rightGrapheme(s.asInstanceOf[UTF8String], n.asInstanceOf[Number].longValue)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) => s"graft.plans.UnicodeKernels.rightGrapheme($s, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RightGrapheme =
    copy(left = l, right = r)
}

/** strip_accents(varchar) — codegen'd, stays inside whole-stage. */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    UnicodeKernels.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.UnicodeKernels.stripAccents($c)")

  override protected def withNewChildInternal(c: Expression): StripAccents =
    copy(child = c)
}

/** nfc_normalize(varchar) — codegen'd. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    UnicodeKernels.nfcNormalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.UnicodeKernels.nfcNormalize($c)")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}
