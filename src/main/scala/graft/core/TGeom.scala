package graft.core

/** Temporal general geometry (TGEOMETRY, ref src/geo/tgeometry.cpp:18-22):
  * WKB value per instant, step/discrete interpolation only (general
  * geometries cannot be linearly interpolated). Also the geometry set
  * types geomset/geogset (ref src/geo/geoset.cpp:18-39).
  */
case class TGeomSeq(ws: Array[Array[Byte]], ts: Array[Long], lInc: Boolean, uInc: Boolean) {
  def n: Int = ts.length
}

case class TGeom(subtype: Byte, interp: Byte, srid: Int, gseqs: Array[TGeomSeq])

case class GeoSet(wkbs: Array[Array[Byte]], gsrid: Int, geodetic: Boolean)

object TGeomAlg {

  def instant(w: Array[Byte], t: Long, srid: Int = 0): TGeom =
    TGeom(Subtype.Instant, Interp.None, srid,
      Array(TGeomSeq(Array(w), Array(t), lInc = true, uInc = true)))

  def sequence(ws: Array[Array[Byte]], ts: Array[Long], interp: Byte,
               lInc: Boolean = true, uInc: Boolean = true, srid: Int = 0): TGeom = {
    require(ts.nonEmpty && ws.length == ts.length)
    var i = 1
    while (i < ts.length) {
      require(ts(i) > ts(i - 1), "timestamps not strictly ascending")
      i += 1
    }
    val (li, ui) =
      if (interp == Interp.Discrete || ts.length == 1) (true, true) else (lInc, uInc)
    TGeom(Subtype.Sequence, interp, srid, Array(TGeomSeq(ws, ts, li, ui)))
  }

  def instants(t: TGeom): Array[(Array[Byte], Long)] =
    t.gseqs.flatMap(s => s.ws.zip(s.ts))

  def numInstants(t: TGeom): Int = t.gseqs.map(_.n).sum
  def startTimestamp(t: TGeom): Long = t.gseqs.head.ts.head
  def endTimestamp(t: TGeom): Long = t.gseqs.last.ts.last

  def timeSpan(t: TGeom): SpanL = {
    val inc0 = if (t.interp == Interp.Discrete) true else t.gseqs.head.lInc
    val inc1 = if (t.interp == Interp.Discrete) true else t.gseqs.last.uInc
    SpanL(startTimestamp(t), endTimestamp(t), inc0, inc1)
  }

  def merge(a: TGeom, b: TGeom): TGeom = {
    val all = (instants(a) ++ instants(b)).sortBy(_._2)
    val dedup = scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)]()
    for (x <- all)
      if (dedup.isEmpty || dedup.last._2 != x._2) dedup += x
    val interp =
      if (a.subtype == Subtype.Instant && b.subtype == Subtype.Instant) Interp.Discrete
      else if (a.interp != Interp.None) a.interp else b.interp
    if (dedup.length == 1) instant(dedup.head._1, dedup.head._2, a.srid)
    else TGeom(Subtype.Sequence, interp, a.srid,
      Array(TGeomSeq(dedup.map(_._1).toArray, dedup.map(_._2).toArray, true, true)))
  }

  /** Change interpolation, possibly changing subtype (ref setInterp,
    * tgeometry.cpp:1173-1179). */
  def setInterp(t: TGeom, interp: Byte): TGeom = {
    if (interp == Interp.Discrete)
      TGeom(Subtype.Sequence, Interp.Discrete, t.srid, Array(TGeomSeq(
        instants(t).map(_._1), instants(t).map(_._2), true, true)))
    else if (t.subtype == Subtype.Instant)
      TGeom(Subtype.Sequence, interp, t.srid, t.gseqs)
    else t.copy(interp = interp)
  }
}
