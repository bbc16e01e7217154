package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Non-mobility argument wrappers so the dispatch layer can tell a
  * timestamp from a bigint (both Long inside Catalyst). */
case class TsVal(us: Long)
case class DateVal(days: Int)
case class IntervalVal(us: Long)

/** The one polymorphic expression behind every registered mobility
  * function. DuckDB dispatches function overloads on the BLOB type alias
  * (ref src/temporal/temporal.cpp:58-86 registering many overloads per
  * name); Spark's UDF registry is monomorphic, so we register a single
  * `MobCall` per name and dispatch on the input schemas at bind time
  * (return type) and eval time (behavior). CodegenFallback: these are
  * value-level functions; the scan/join/agg hot paths stay in codegen.
  */
case class MobCall(fname: String, children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def nullable: Boolean = true
  // literal-only calls fold at plan time (stbox('...') etc.) — the
  // analogue of the reference's CONSTANT_VECTOR fast path
  // (ref src/temporal/temporal_functions.cpp:139-141, SURVEY §4), and
  // what lets the box-predicate rule see a plain Literal box
  override def foldable: Boolean = children.forall(_.foldable)
  override lazy val dataType: DataType =
    MobRuntime.retType(fname, children.map(_.dataType))

  override def eval(input: InternalRow): Any = {
    val n = children.length
    val args = new Array[Any](n)
    var i = 0
    while (i < n) {
      val c = children(i)
      val v = c.eval(input)
      if (v == null) return null
      args(i) = MobCall.decodeArg(c.dataType, v)
      i += 1
    }
    MobCall.encodeResult(MobRuntime.eval(fname, args.toIndexedSeq))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object MobCall {

  def decodeArg(dt: DataType, v: Any): Any =
    if (MobSchemas.kindOf(dt).isDefined) MobCodec.decode(dt, v)
    else dt match {
      case StringType => v.toString
      case TimestampType | TimestampNTZType => TsVal(v.asInstanceOf[Long])
      case DateType => DateVal(v.asInstanceOf[Int])
      case _: DayTimeIntervalType => IntervalVal(v.asInstanceOf[Long])
      case ArrayType(et, _) =>
        val a = v.asInstanceOf[ArrayData]
        et match {
          case LongType => a.toLongArray()
          case IntegerType => a.toIntArray().map(_.toLong)
          case DoubleType => a.toDoubleArray()
          case TimestampType | TimestampNTZType =>
            a.toLongArray().map(TsVal(_)).toIndexedSeq
          case dt: DecimalType =>
            (0 until a.numElements())
              .map(i => a.getDecimal(i, dt.precision, dt.scale).toDouble).toArray
          case StringType =>
            (0 until a.numElements()).map(i => a.getUTF8String(i).toString).toArray
          case BinaryType =>
            (0 until a.numElements()).map(a.getBinary).toArray[Any].toIndexedSeq
          case st: StructType if MobSchemas.kindOf(st).isDefined =>
            (0 until a.numElements())
              .map(i => MobCodec.decode(st, a.getStruct(i, st.fields.length)))
              .toArray[Any].toIndexedSeq
          case _ => a
        }
      case _: DecimalType => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
      case _ => v // Long, Int, Double, Boolean, Array[Byte], ...
    }

  def encodeResult(r: Any): Any = r match {
    case null => null
    case m: MobVal => MobCodec.encode(m)
    case s: String => UTF8String.fromString(s)
    case TsVal(us) => us
    case DateVal(d) => d
    case IntervalVal(us) => us
    case arr: Seq[_] => new GenericArrayData(arr.map(encodeResult).toArray)
    case other => other // primitives, Array[Byte]
  }
}
