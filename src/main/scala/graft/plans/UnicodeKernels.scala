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
}

/** Column wrappers, StringDistances-style. */
object UnicodeFns {
  import HashExpressions.{columnOf, exprOf}
  import org.apache.spark.sql.Column

  def stripAccents(c: Column): Column = columnOf(StripAccents(exprOf(c)))
  def nfcNormalize(c: Column): Column = columnOf(NfcNormalize(exprOf(c)))
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
