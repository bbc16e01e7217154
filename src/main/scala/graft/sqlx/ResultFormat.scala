package graft.sqlx

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.core._
import graft.functions._

/** Formats external (collected) Spark values the way DuckDB's sqllogictest
  * renders them — mobility structs via their VARCHAR-cast text form,
  * primitives in DuckDB style. Used by the golden-test runner. */
object ResultFormat {

  def format(dt: DataType, v: Any): String = {
    if (v == null) return "NULL"
    dt match {
      case st: StructType if MobSchemas.kindOf(st).isDefined =>
        MobCodec.format(rowToMob(st, v.asInstanceOf[Row]))
      case TimestampType | TimestampNTZType => v match {
        case i: java.time.Instant =>
          TimeFmt.printTs(i.getEpochSecond * 1000000L + i.getNano / 1000)
        case t: java.sql.Timestamp =>
          TimeFmt.printTs(Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000)
        case ldt: java.time.LocalDateTime =>
          TimeFmt.printTs(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            ldt.getNano / 1000)
      }
      case DateType => v match {
        case d: java.sql.Date => d.toString
        case d: java.time.LocalDate => d.toString
      }
      case _: DayTimeIntervalType =>
        val dur = v.asInstanceOf[java.time.Duration]
        TimeFmt.printInterval(dur.getSeconds * 1000000L + dur.getNano / 1000)
      case BooleanType => if (v.asInstanceOf[Boolean]) "true" else "false"
      case DoubleType | FloatType =>
        // DuckDB sqllogictest renders doubles shortest-roundtrip, plain
        // decimal, integral values without a fraction
        val d = v match { case f: Float => f.toDouble; case dd: Double => dd }
        if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
        else new java.math.BigDecimal(java.lang.Double.toString(d)).toPlainString
      case BinaryType =>
        v.asInstanceOf[Array[Byte]].map(b => f"$b%02X").mkString
      case ArrayType(et, _) =>
        val seq = v.asInstanceOf[scala.collection.Seq[_]]
        val quoted = et == StringType ||
          (et.isInstanceOf[StructType] &&
            MobSchemas.kindOf(et).isDefined)
        seq.map(x => if (quoted && x != null) s"'${format(et, x)}'" else format(et, x))
          .mkString("[", ", ", "]")
      case _ => v.toString
    }
  }

  /** Rebuild a MobVal from an external Row (inverse of the encoders, on
    * the external representation). */
  def rowToMob(st: StructType, r: Row): MobVal = {
    def longs(i: Int) = r.getSeq[Long](i).toArray
    def doubles(i: Int) = r.getSeq[Double](i).toArray
    def strs(i: Int) = r.getSeq[String](i).toArray
    MobSchemas.kindOf(st).get match {
      case "span" => VSpan(SpanL(r.getLong(0), r.getLong(1),
        r.getBoolean(2), r.getBoolean(3)), r.getByte(4))
      case "spanF" => VSpanF(SpanD(r.getDouble(0), r.getDouble(1),
        r.getBoolean(2), r.getBoolean(3)))
      case "set" => VSet(longs(0), r.getByte(1))
      case "setF" => VSetF(doubles(0))
      case "setS" => VSetS(strs(0))
      case "spanSet" =>
        VSpanSet(r.getSeq[Row](0).map(x => SpanL(x.getLong(0), x.getLong(1),
          x.getBoolean(2), x.getBoolean(3))).toArray, r.getByte(1))
      case "spanSetF" =>
        VSpanSetF(r.getSeq[Row](0).map(x => SpanD(x.getDouble(0), x.getDouble(1),
          x.getBoolean(2), x.getBoolean(3))).toArray)
      case k @ ("tnumI" | "tnumF" | "tnumB") =>
        val kind: Byte = k match {
          case "tnumI" => 0
          case "tnumF" => 1
          case _ => 2
        }
        VTNum(TNum(r.getByte(0), r.getByte(1),
          r.getSeq[Row](2).map(x => TNumSeq(x.getSeq[Double](0).toArray,
            x.getSeq[Long](1).toArray, x.getBoolean(2), x.getBoolean(3))).toArray),
          kind)
      case "tgeom" =>
        VTGeom(TGeom(r.getByte(0), r.getByte(1), r.getInt(2),
          r.getSeq[Row](3).map(x => TGeomSeq(
            x.getSeq[Array[Byte]](0).toArray, x.getSeq[Long](1).toArray,
            x.getBoolean(2), x.getBoolean(3))).toArray))
      case "gset" =>
        VGeoSet(GeoSet(r.getSeq[Array[Byte]](0).toArray, r.getInt(1), r.getBoolean(2)))
      case "ttext" =>
        VTText(TText(r.getByte(0), r.getByte(1),
          r.getSeq[Row](2).map(x => TTextSeq(x.getSeq[String](0).toArray,
            x.getSeq[Long](1).toArray, x.getBoolean(2), x.getBoolean(3))).toArray))
      case "tpoint" =>
        VTPoint(TPoint(r.getByte(0), r.getByte(1), r.getInt(2),
          r.getSeq[Row](3).map(x => TPointSeq(x.getSeq[Double](0).toArray,
            x.getSeq[Double](1).toArray, x.getSeq[Long](2).toArray,
            x.getBoolean(3), x.getBoolean(4),
            if (x.isNullAt(5)) null else x.getSeq[Double](5).toArray)).toArray))
      case "tbox" =>
        VTBox(TBox(r.getDouble(0), r.getDouble(1), r.getBoolean(2), r.getBoolean(3),
          r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7),
          r.getBoolean(8), r.getBoolean(9), r.getBoolean(10)))
      case "stbox" =>
        VSTBox(STBox(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6), r.getLong(7),
          r.getBoolean(8), r.getBoolean(9), r.getInt(10), r.getBoolean(11),
          r.getBoolean(12), r.getBoolean(13), r.getBoolean(14)))
    }
  }
}
