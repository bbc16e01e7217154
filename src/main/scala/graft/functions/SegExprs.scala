package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{Interp, SpanL, SpanSetAlg, TextIO, TNumAlg, TPoint, TPointAlg}

/** Native codegen'd segment-pair kernels for the BerlinMOD trip-pair
  * queries (q6/q10/q16) — the former `seg_*`/`pair_spanset_text`
  * ScalaUDFs ported to Catalyst expressions on the [[VecDot]] pattern
  * (r10 verdict #5): the per-candidate hot loop stays inside whole-stage
  * codegen and reads the unsafe array format directly — no encoder
  * round-trip materializing each packed segment into an Array[Double],
  * no boxing, no codegen fence around the join's post-filter.
  *
  * Numerics are UNCHANGED: each kernel builds the same 2-instant
  * [[TPoint]] the UDFs built and runs the identical
  * eDwithin/aDisjoint/tDwithin quadratic solvers (TPoint.scala), so a
  * trip-pair predicate still decomposes exactly into EXISTS/FORALL over
  * its time-overlapping segment pairs and the pinned BerlinMOD checksums
  * are bit-identical. */
object SegKernels {

  /** A packed segment — (x1, y1, t1micros, x2, y2, t2micros), micros as
    * exact doubles (|t| < 2^53) — as a 2-instant TPoint, same
    * construction as the trip-level load path. */
  private def segTPoint(a: ArrayData): TPoint = {
    val t1 = a.getDouble(2).toLong; val t2 = a.getDouble(5).toLong
    if (t2 > t1)
      TPointAlg.sequence(Array(a.getDouble(0), a.getDouble(3)),
        Array(a.getDouble(1), a.getDouble(4)), Array(t1, t2), Interp.Linear)
    else TPointAlg.instant(a.getDouble(0), a.getDouble(1), t1)
  }

  def eDwithin(a: ArrayData, b: ArrayData, d: Double): Boolean =
    TPointAlg.eDwithin(segTPoint(a), segTPoint(b), d)

  def touches(a: ArrayData, b: ArrayData): Boolean =
    !TPointAlg.aDisjoint(segTPoint(a), segTPoint(b))

  /** The within-d time spans of a segment pair, flattened
    * [lo1, up1, lo2, up2, ...] (closed bounds), or null when never
    * within d. */
  def dwithinSpans(a: ArrayData, b: ArrayData, d: Double): GenericArrayData =
    TPointAlg.tDwithin(segTPoint(a), segTPoint(b), d) match {
      case Some(tb) =>
        val spans = TNumAlg.whenTrue(tb)
        if (spans.isEmpty) null
        else new GenericArrayData(spans.flatMap(s => Array(s.lower, s.upper)))
      case None => null
    }

  /** Normalize the union of flattened span arrays (one per candidate
    * segment pair of a trip pair) and print as a tstzspanset literal,
    * or null when empty. */
  def spansetText(sps: ArrayData): UTF8String = {
    val n = sps.numElements()
    val buf = scala.collection.mutable.ArrayBuffer.empty[SpanL]
    var i = 0
    while (i < n) {
      val inner = sps.getArray(i)
      if (inner != null) {
        var j = 0
        while (j + 1 < inner.numElements()) {
          buf += SpanL(inner.getLong(j), inner.getLong(j + 1),
            lowerInc = true, upperInc = true)
          j += 2
        }
      }
      i += 1
    }
    if (buf.isEmpty) null
    else UTF8String.fromString(
      TextIO.printSpanSetL(SpanSetAlg.normalize(buf.toArray), TextIO.DomTs))
  }
}

/** eDwithin over two packed segments: ever within distance d during
  * their time overlap (exact quadratic solver). */
case class SegEDwithin(first: Expression, second: Expression,
                       third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "seg_edwithin"

  override protected def nullSafeEval(a: Any, b: Any, d: Any): Any =
    SegKernels.eDwithin(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, d) =>
      s"${ev.value} = graft.functions.SegKernels.eDwithin($a, $b, $d);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SegEDwithin =
    copy(first = f, second = s, third = t)
}

/** Ever-touching (NOT aDisjoint) over two packed segments. */
case class SegTouches(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "seg_touches"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SegKernels.touches(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SegKernels.touches($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SegTouches =
    copy(left = newLeft, right = newRight)
}

/** Flattened within-d spans of a segment pair (array<long>), null when
  * never within d — nullable even on non-null inputs. */
case class SegDwithinSpans(first: Expression, second: Expression,
                           third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "seg_dwithin_spans"

  override protected def nullSafeEval(a: Any, b: Any, d: Any): Any =
    SegKernels.dwithinSpans(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, d) => {
      val r = ctx.freshName("segSpans")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |  graft.functions.SegKernels.dwithinSpans($a, $b, $d);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SegDwithinSpans =
    copy(first = f, second = s, third = t)
}

/** tstzspanset literal of the normalized union of collected flattened
  * span arrays (the q10 per-trip-pair output formatter). */
case class PairSpansetText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(ArrayType(LongType)))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "pair_spanset_text"

  override protected def nullSafeEval(a: Any): Any =
    SegKernels.spansetText(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("spanText")
      s"""
         |UTF8String $r = graft.functions.SegKernels.spansetText($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PairSpansetText =
    copy(child = c)
}
