package graft.core

/** Bounding boxes: TBOX (numeric value span × time span, either optional —
  * ref src/temporal/tbox.cpp:328-346) and STBOX (planar X/Y(/Z) extent ×
  * optional time with SRID/geodetic — ref src/geo/stbox.cpp:14-28).
  *
  * Flat doubles/longs so that, when projected to top-level columns, Parquet
  * min/max stats prune files — the Spark-native replacement for the
  * reference's R-tree (SURVEY §4).
  */
case class TBox(xmin: Double, xmax: Double, xminInc: Boolean, xmaxInc: Boolean,
                tmin: Long, tmax: Long, tminInc: Boolean, tmaxInc: Boolean,
                hasX: Boolean, hasT: Boolean, xInt: Boolean)

case class STBox(xmin: Double, xmax: Double, ymin: Double, ymax: Double,
                 zmin: Double, zmax: Double,
                 tmin: Long, tmax: Long, tminInc: Boolean, tmaxInc: Boolean,
                 srid: Int, geodetic: Boolean,
                 hasX: Boolean, hasZ: Boolean, hasT: Boolean)

object BoxAlg {

  // ---- TBox ----

  def tboxFromSpanD(s: SpanD, xInt: Boolean = false): TBox =
    TBox(s.lower, s.upper, s.lowerInc, s.upperInc, 0, 0, false, false,
      hasX = true, hasT = false, xInt = xInt)

  def tboxFromTs(t: Long): TBox =
    TBox(0, 0, false, false, t, t, true, true, hasX = false, hasT = true, xInt = false)

  def tboxFromTSpan(s: SpanL): TBox =
    TBox(0, 0, false, false, s.lower, s.upper, s.lowerInc, s.upperInc,
      hasX = false, hasT = true, xInt = false)

  def tbox(v: SpanD, t: SpanL, xInt: Boolean = false): TBox =
    TBox(v.lower, v.upper, v.lowerInc, v.upperInc, t.lower, t.upper, t.lowerInc, t.upperInc,
      hasX = true, hasT = true, xInt = xInt)

  def tboxOfTNum(tn: TNum): TBox = {
    val ts = TNumAlg.timeSpan(tn)
    TBox(TNumAlg.minValue(tn), TNumAlg.maxValue(tn), true, true,
      ts.lower, ts.upper, ts.lowerInc, ts.upperInc, hasX = true, hasT = true, xInt = false)
  }

  def overlapsT(a: TBox, b: TBox): Boolean = {
    val xOk = !(a.hasX && b.hasX) || SpanAlg.overlapsD(
      SpanD(a.xmin, a.xmax, a.xminInc, a.xmaxInc), SpanD(b.xmin, b.xmax, b.xminInc, b.xmaxInc))
    val tOk = !(a.hasT && b.hasT) || SpanAlg.overlaps(
      SpanL(a.tmin, a.tmax, a.tminInc, a.tmaxInc), SpanL(b.tmin, b.tmax, b.tminInc, b.tmaxInc))
    ((a.hasX && b.hasX) || (a.hasT && b.hasT)) && xOk && tOk
  }

  def containsT(a: TBox, b: TBox): Boolean = {
    val xOk = !(a.hasX && b.hasX) || SpanAlg.containsSpanD(
      SpanD(a.xmin, a.xmax, a.xminInc, a.xmaxInc), SpanD(b.xmin, b.xmax, b.xminInc, b.xmaxInc))
    val tOk = !(a.hasT && b.hasT) || SpanAlg.containsSpan(
      SpanL(a.tmin, a.tmax, a.tminInc, a.tmaxInc), SpanL(b.tmin, b.tmax, b.tminInc, b.tmaxInc))
    ((a.hasX && b.hasX) || (a.hasT && b.hasT)) && xOk && tOk
  }

  def shiftValueT(b: TBox, d: Double): TBox = b.copy(xmin = b.xmin + d, xmax = b.xmax + d)
  def shiftTimeT(b: TBox, d: Long): TBox = b.copy(tmin = b.tmin + d, tmax = b.tmax + d)
  def expandValueT(b: TBox, d: Double): TBox = b.copy(xmin = b.xmin - d, xmax = b.xmax + d)
  def expandTimeT(b: TBox, d: Long): TBox = b.copy(tmin = b.tmin - d, tmax = b.tmax + d)

  // ---- STBox ----

  def stboxXY(xmin: Double, ymin: Double, xmax: Double, ymax: Double, srid: Int = 0): STBox =
    STBox(xmin, xmax, ymin, ymax, 0, 0, 0, 0, false, false, srid, geodetic = false,
      hasX = true, hasZ = false, hasT = false)

  def stboxFromGeom(wkb: Array[Byte], srid: Int = 0): STBox = {
    val (_, pts) = Wkb.read(wkb)
    STBox(pts.map(_._1).min, pts.map(_._1).max, pts.map(_._2).min, pts.map(_._2).max,
      0, 0, 0, 0, false, false, srid, geodetic = false, hasX = true, hasZ = false, hasT = false)
  }

  def stboxGeomTs(wkb: Array[Byte], t: Long): STBox =
    stboxFromGeom(wkb).copy(tmin = t, tmax = t, tminInc = true, tmaxInc = true, hasT = true)

  /** The BerlinMOD workhorse `stbox(geom, period)` (ref stbox.cpp:53-142,
    * used by queries/query_13.sql:17). */
  def stboxGeomSpan(wkb: Array[Byte], s: SpanL): STBox =
    stboxFromGeom(wkb).copy(tmin = s.lower, tmax = s.upper,
      tminInc = s.lowerInc, tmaxInc = s.upperInc, hasT = true)

  def stboxFromTSpan(s: SpanL): STBox =
    STBox(0, 0, 0, 0, 0, 0, s.lower, s.upper, s.lowerInc, s.upperInc,
      0, geodetic = false, hasX = false, hasZ = false, hasT = true)

  def overlapsST(a: STBox, b: STBox): Boolean = {
    val xOk = !(a.hasX && b.hasX) ||
      (a.xmin <= b.xmax && b.xmin <= a.xmax && a.ymin <= b.ymax && b.ymin <= a.ymax &&
        (!(a.hasZ && b.hasZ) || (a.zmin <= b.zmax && b.zmin <= a.zmax)))
    val tOk = !(a.hasT && b.hasT) || SpanAlg.overlaps(
      SpanL(a.tmin, a.tmax, a.tminInc, a.tmaxInc), SpanL(b.tmin, b.tmax, b.tminInc, b.tmaxInc))
    ((a.hasX && b.hasX) || (a.hasT && b.hasT)) && xOk && tOk
  }

  def containsST(a: STBox, b: STBox): Boolean = {
    val xOk = !(a.hasX && b.hasX) ||
      (a.xmin <= b.xmin && b.xmax <= a.xmax && a.ymin <= b.ymin && b.ymax <= a.ymax &&
        (!(a.hasZ && b.hasZ) || (a.zmin <= b.zmin && b.zmax <= a.zmax)))
    val tOk = !(a.hasT && b.hasT) || SpanAlg.containsSpan(
      SpanL(a.tmin, a.tmax, a.tminInc, a.tmaxInc), SpanL(b.tmin, b.tmax, b.tminInc, b.tmaxInc))
    ((a.hasX && b.hasX) || (a.hasT && b.hasT)) && xOk && tOk
  }

  /** Inflate the spatial extent by d on every side (ref expandSpace,
    * stbox.cpp:164-172 — BerlinMOD q6/q10). */
  def expandSpace(b: STBox, d: Double): STBox =
    b.copy(xmin = b.xmin - d, xmax = b.xmax + d, ymin = b.ymin - d, ymax = b.ymax + d,
      zmin = if (b.hasZ) b.zmin - d else b.zmin,
      zmax = if (b.hasZ) b.zmax + d else b.zmax)

  /** Planar for geometric boxes; for geodetic boxes the spheroid area of
    * the meridian/geodesic-bounded rectangle (x = lon deg, y = lat deg),
    * matching MEOS stbox_area(box, spheroid=true) (ref
    * src/geo/stbox_functions.cpp:459-460, test/sql/stbox.test:84). */
  def area(b: STBox): Double =
    if (b.geodetic) Geodesy.boxArea(b.xmin, b.xmax, b.ymin, b.ymax)
    else (b.xmax - b.xmin) * (b.ymax - b.ymin)
}
