package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Hilbert space-filling-curve key for the TRTREE write-time layout
  * (`USING TRTREE(box) HILBERT`, r10 verdict #8): the Z-order curve's
  * bit-interleave has long diagonal jumps — consecutive keys can sit a
  * half-plane apart — which widens each file's min/max hyper-rectangle
  * under skew; the Hilbert curve visits every cell of the quantized grid
  * through FACE-ADJACENT steps, so a contiguous key range is a tighter
  * spatial blob and row-group pruning discards more off-axis files.
  * KernelSpec pins the defining properties (bijection + unit-step
  * adjacency) exhaustively on a 2-D grid. */
object HilbertCurve {

  /** Hilbert index of quantized coordinates (each in [0, 2^bits)),
    * n·bits ≤ 63. Skilling's in-place axes→transpose transform
    * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004)
    * followed by the MSB-first bit interleave of the transpose. */
  def index(coords: ArrayData, bits: Int): Long = {
    val n = coords.numElements()
    val x = new Array[Long](n)
    var i = 0
    while (i < n) { x(i) = coords.getLong(i); i += 1 }
    if (n == 1) return x(0)
    // axes -> Hilbert transpose, in place
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray decode
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0L) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave the transpose MSB-first (dim 0 most significant)
    var key = 0L
    var b = bits - 1
    while (b >= 0) {
      i = 0
      while (i < n) { key = (key << 1) | ((x(i) >>> b) & 1L); i += 1 }
      b -= 1
    }
    key
  }
}

/** `hilbert_key(coords, bits)`: Hilbert index of an array<long> of
  * quantized coordinates. */
case class HilbertKey(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertCurve.index(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertCurve.index($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}
