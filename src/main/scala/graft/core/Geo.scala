package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal planar geometry + WKB codec (Point / LineString / Polygon) —
  * the reference moves plain geometries as WKB blobs
  * (ref src/geo/stbox.cpp:20-24); we need exactly that interchange plus
  * the little geometry math MEOS supplies (SURVEY §7 core/wkb).
  */
object Wkb {
  val PointType = 1
  val LineStringType = 2
  val PolygonType = 3

  def writePoint(x: Double, y: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(PointType).putDouble(x).putDouble(y)
    bb.array()
  }

  def writeLineString(pts: Array[(Double, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(9 + 16 * pts.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(LineStringType).putInt(pts.length)
    pts.foreach { case (x, y) => bb.putDouble(x).putDouble(y) }
    bb.array()
  }

  /** Single-ring polygon (closed: first == last point expected). */
  def writePolygon(ring: Array[(Double, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(13 + 16 * ring.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(PolygonType).putInt(1).putInt(ring.length)
    ring.foreach { case (x, y) => bb.putDouble(x).putDouble(y) }
    bb.array()
  }

  /** Parse WKB → (geomType, coordinates). Handles both endiannesses and
    * ignores an EWKB SRID flag if present. Polygon returns the outer ring. */
  def read(wkb: Array[Byte]): (Int, Array[(Double, Double)]) = {
    val bb = ByteBuffer.wrap(wkb)
    bb.order(if (bb.get() == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    var gtype = bb.getInt()
    val hasSrid = (gtype & 0x20000000) != 0
    gtype &= 0xFF
    if (hasSrid) bb.getInt()
    gtype match {
      case PointType => (gtype, Array((bb.getDouble(), bb.getDouble())))
      case LineStringType =>
        val n = bb.getInt()
        (gtype, Array.fill(n)((bb.getDouble(), bb.getDouble())))
      case PolygonType =>
        val nRings = bb.getInt()
        require(nRings >= 1, "empty polygon")
        val n = bb.getInt()
        (gtype, Array.fill(n)((bb.getDouble(), bb.getDouble())))
      case other => throw new IllegalArgumentException(s"unsupported WKB type $other")
    }
  }

  def asText(wkb: Array[Byte]): String = {
    val (t, pts) = read(wkb)
    def fmt(p: (Double, Double)) = s"${TimeFmt.printFloat(p._1)} ${TimeFmt.printFloat(p._2)}"
    t match {
      case PointType => s"POINT(${fmt(pts.head)})"
      case LineStringType => pts.map(fmt).mkString("LINESTRING(", ",", ")")
      case PolygonType => pts.map(fmt).mkString("POLYGON((", ",", "))")
    }
  }
}

object Geo {

  /** Ray-casting point-in-polygon (boundary counts as inside). */
  def pointInPolygon(x: Double, y: Double, poly: Array[(Double, Double)]): Boolean = {
    var inside = false
    var i = 0
    val n = poly.length
    var j = n - 1
    while (i < n) {
      val (xi, yi) = poly(i); val (xj, yj) = poly(j)
      // on-edge check
      val cross = (xj - xi) * (y - yi) - (yj - yi) * (x - xi)
      if (math.abs(cross) < 1e-12 &&
          x >= math.min(xi, xj) - 1e-12 && x <= math.max(xi, xj) + 1e-12 &&
          y >= math.min(yi, yj) - 1e-12 && y <= math.max(yi, yj) + 1e-12)
        return true
      if ((yi > y) != (yj > y) && x < (xj - xi) * (y - yi) / (yj - yi) + xi)
        inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** Parameters u ∈ (0,1) where segment (x0,y0)-(x1,y1) crosses a polygon
    * edge. */
  def segPolyCrossings(x0: Double, y0: Double, x1: Double, y1: Double,
                       poly: Array[(Double, Double)]): Array[Double] = {
    val out = scala.collection.mutable.ArrayBuffer[Double]()
    val dx = x1 - x0; val dy = y1 - y0
    var i = 0
    val n = poly.length
    while (i < n) {
      val (ax, ay) = poly(i); val (bx, by) = poly((i + 1) % n)
      val ex = bx - ax; val ey = by - ay
      val denom = dx * ey - dy * ex
      if (math.abs(denom) > 1e-18) {
        val u = ((ax - x0) * ey - (ay - y0) * ex) / denom
        val v = ((ax - x0) * dy - (ay - y0) * dx) / denom
        if (u > 1e-12 && u < 1 - 1e-12 && v >= -1e-12 && v <= 1 + 1e-12) out += u
      }
      i += 1
    }
    out.toArray
  }

  /** EPSG:4326 (lon/lat) → EPSG:3857 (web mercator meters) — the only CRS
    * transform BerlinMOD uses (ref benchmark/.../07_trips.sql:29-35).
    * Standard published spherical-mercator formula. */
  val EarthRadius = 6378137.0
  def lonLatToMercator(lon: Double, lat: Double): (Double, Double) = {
    val x = math.toRadians(lon) * EarthRadius
    val y = math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2)) * EarthRadius
    (x, y)
  }
  def mercatorToLonLat(x: Double, y: Double): (Double, Double) = {
    val lon = math.toDegrees(x / EarthRadius)
    val lat = math.toDegrees(2 * math.atan(math.exp(y / EarthRadius)) - math.Pi / 2)
    (lon, lat)
  }
}
