package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The hot-path kernel behind [[graft.util.Md5Lower64]]: parse the last
  * 16 hex digits of an md5 hex string as a little-endian 64-bit value
  * (bit-for-bit DuckDB `md5_number_lower`). Same design as [[VecDot]] /
  * [[TextNormKernel]] — a native expression with `doGenCode`, so the
  * per-row work is a 16-nibble parse inside whole-stage codegen.
  *
  * This replaces a `conv(regexp_replace(reverse(substring(...))), 16, 10)
  * % 2^63` SQL chain whose decimal(20,0) modulo + regex + string churn
  * measured ~3 µs/row — the dominant cost of every md5-keyed scan in the
  * repo (r10 sketch_bloom_join forensics). The parse is ~50 ns and
  * allocation-free.
  */
object HashKernel {
  @inline private def nib(b: Byte): Int = {
    val c = b & 0xFF
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10
  }

  /** Little-endian long from hex digits 17..32 (1-based) of a 32-char
    * md5 hex string: digest byte 8 is the LOW byte, byte 15 the high —
    * exactly DuckDB's md5_number_lower. Inputs shorter than 32 bytes
    * (never produced by md5) parse as 0. */
  def hexLower64(s: UTF8String): Long = {
    if (s.numBytes < 32) return 0L
    var v = 0L
    var k = 0
    while (k < 8) {
      val b = (nib(s.getByte(16 + 2 * k)) << 4) | nib(s.getByte(17 + 2 * k))
      v |= (b.toLong & 0xFFL) << (8 * k)
      k += 1
    }
    v
  }
}

/** `md5_lower64(hexstr)` — the masked non-negative form (`signed =
  * false`, low 63 bits) or the full signed two's-complement value
  * (`signed = true`, the SimHash bit-vote form). */
case class HexLower64(child: Expression, signed: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String =
    if (signed) "md5_lower64_signed" else "md5_lower64"

  override protected def nullSafeEval(s: Any): Any = {
    val v = HashKernel.hexLower64(s.asInstanceOf[UTF8String])
    if (signed) v else v & Long.MaxValue
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      if (signed) s"graft.functions.HashKernel.hexLower64($c)"
      else s"(graft.functions.HashKernel.hexLower64($c) & 0x7fffffffffffffffL)")

  override protected def withNewChildInternal(n: Expression): HexLower64 =
    copy(child = n)
}
