package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** create_sort_key(v1, 'ASC NULLS LAST', v2, 'DESC', ...) — a binary
  * key whose unsigned byte order equals the ORDER BY order of the
  * inputs (reference src/core_functions/scalar/blob/create_sort_key
  * .cpp). The CONTRACT is order equivalence — the reference's
  * physical byte layout is an engine-internal format, so the bytes
  * are not byte-identical across engines (they aren't meant to be
  * consumed, only compared); SortKeySpec proves sort-order parity
  * against Spark's own ORDER BY for every type/modifier combination.
  *
  * Encoding (standard order-preserving tricks, one segment per
  * argument): a null-marker byte ordered by NULLS FIRST/LAST, then
  * sign-flipped big-endian integers, monotone-mapped IEEE doubles,
  * zero-escaped + double-zero-terminated strings/blobs, recursively
  * encoded lists/structs (as in the reference, nested null order
  * follows ASC/DESC, the user's NULLS clause applies at top level
  * only — create_sort_key.cpp:91). DESC flips the value bytes.
  */
case class CreateSortKey(args: Seq[Expression])
    extends Expression with CodegenFallback {
  require(args.nonEmpty && args.length % 2 == 0,
    "create_sort_key expects (value, 'modifier') pairs")

  override def children: Seq[Expression] = args
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  private case class Mods(desc: Boolean, nullsFirst: Boolean)

  private lazy val pairs: Seq[(Expression, Mods)] =
    args.grouped(2).map { case Seq(v, m) =>
      require(m.foldable, "create_sort_key: modifier must be a constant string")
      val s = String.valueOf(m.eval(null)).toUpperCase.trim
      val desc = s.contains("DESC")
      // reference default: ASC → NULLS LAST, DESC → NULLS FIRST
      val nullsFirst =
        if (s.contains("NULLS FIRST")) true
        else if (s.contains("NULLS LAST")) false
        else desc
      (v, Mods(desc, nullsFirst))
    }.toSeq

  override def foldable: Boolean = args.forall(_.foldable)

  override def eval(row: InternalRow): Any = {
    val out = ArrayBuffer.empty[Byte]
    pairs.foreach { case (v, mods) =>
      encodeTop(out, v.eval(row), v.dataType, mods)
    }
    out.toArray
  }

  private def encodeTop(out: ArrayBuffer[Byte], v: Any, dt: DataType, mods: Mods): Unit = {
    if (v == null) {
      out += (if (mods.nullsFirst) 0x00.toByte else 0xFF.toByte)
    } else {
      out += (if (mods.nullsFirst) 0x01.toByte else 0x00.toByte)
      val seg = ArrayBuffer.empty[Byte]
      encodeValue(seg, v, dt, mods.desc)
      if (mods.desc) out ++= seg.map(b => (~b).toByte) else out ++= seg
    }
  }

  /** Value bytes in ASC order; the caller flips for DESC. Nested
    * nulls inside lists/structs follow ASC order here and get
    * flipped wholesale with the segment — which matches the
    * reference's ASC/DESC-dependent nested null order.
    */
  private def encodeValue(out: ArrayBuffer[Byte], v: Any, dt: DataType, desc: Boolean): Unit = dt match {
    case BooleanType => out += (if (v.asInstanceOf[Boolean]) 1 else 0).toByte
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType =>
      val l = v match {
        case b: Byte => b.toLong
        case s: Short => s.toLong
        case i: Integer => i.toLong
        case i: Int => i.toLong
        case l: Long => l
      }
      putLong(out, l ^ Long.MinValue)
    case FloatType => encodeDouble(out, v.asInstanceOf[Float].toDouble)
    case DoubleType => encodeDouble(out, v.asInstanceOf[Double])
    case dt: DecimalType =>
      // exact: all values of one DecimalType share dt.scale, so the
      // unscaled integer is order-isomorphic to the value. ≤18 digits
      // fits a long; wider goes sign + length-prefixed big-endian
      // magnitude (complemented for negatives) — never collapses
      // distinct >15-significant-digit decimals the way a double
      // round-trip would.
      val dec = v.asInstanceOf[Decimal]
      if (dt.precision <= 18) putLong(out, dec.toUnscaledLong ^ Long.MinValue)
      else {
        val unscaled = dec.toJavaBigDecimal.setScale(dt.scale).unscaledValue()
        val mag = unscaled.abs.toByteArray.dropWhile(_ == 0)
        if (unscaled.signum < 0) {
          out += 0x00.toByte
          out += (0xFF - mag.length).toByte   // longer magnitude → more negative → earlier
          mag.foreach(b => out += (~b).toByte)
        } else {
          out += 0x01.toByte
          out += mag.length.toByte
          mag.foreach(out += _)
        }
      }
    case StringType => encodeBytes(out, v.asInstanceOf[UTF8String].getBytes)
    case BinaryType => encodeBytes(out, v.asInstanceOf[Array[Byte]])
    case ArrayType(et, _) =>
      // nested null marker 0xFF: ASC nests NULLS LAST (ref :95); the
      // whole-segment DESC flip then yields nested NULLS FIRST.
      // terminator 0x00 0x00 < element marker 0x01, so a prefix list
      // sorts before its extensions and [] before [null].
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        if (arr.isNullAt(i)) out += 0xFF.toByte
        else {
          out += 0x01.toByte
          encodeValue(out, arr.get(i, et), et, desc)
        }
        i += 1
      }
      out += 0x00.toByte; out += 0x00.toByte
    case StructType(fields) =>
      val r = v.asInstanceOf[InternalRow]
      fields.zipWithIndex.foreach { case (f, i) =>
        if (r.isNullAt(i)) out += 0xFF.toByte
        else {
          out += 0x01.toByte
          encodeValue(out, r.get(i, f.dataType), f.dataType, desc)
        }
      }
    case other =>
      throw new IllegalArgumentException(
        s"create_sort_key: unsupported type ${other.sql}")
  }

  /** IEEE double → monotone unsigned long (standard flip). −0.0 is
    * normalized to 0.0 first: SQL ordering treats them equal, and the
    * reference emits identical keys for both (pinned in DuckDB).
    */
  private def encodeDouble(out: ArrayBuffer[Byte], d0: Double): Unit = {
    val d = if (d0 == 0.0) 0.0 else d0
    val bits = java.lang.Double.doubleToLongBits(d)
    val mapped = if (bits < 0) ~bits else bits ^ Long.MinValue
    putLong(out, mapped)
  }

  private def putLong(out: ArrayBuffer[Byte], l: Long): Unit = {
    var shift = 56
    while (shift >= 0) {
      out += ((l >>> shift) & 0xFF).toByte
      shift -= 8
    }
  }

  /** Zero-escaped, double-zero-terminated: prefix-free and
    * prefix-order-preserving ('ab' < 'abc', embedded \\0 safe).
    */
  private def encodeBytes(out: ArrayBuffer[Byte], bytes: Array[Byte]): Unit = {
    bytes.foreach { b =>
      if (b == 0) { out += 0x00.toByte; out += 0x01.toByte } else out += b
    }
    out += 0x00.toByte; out += 0x00.toByte
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CreateSortKey =
    copy(args = newChildren)
}
