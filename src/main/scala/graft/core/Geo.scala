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
  val GeometryCollectionType = 7

  /** GeometryCollection from already-encoded member WKBs. */
  def writeCollection(members: Array[Array[Byte]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(9 + members.map(_.length).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(GeometryCollectionType).putInt(members.length)
    members.foreach(bb.put)
    bb.array()
  }

  /** Member WKBs of a collection (or the geometry itself). */
  def collectionMembers(wkb: Array[Byte]): Array[Array[Byte]] = {
    val bb = java.nio.ByteBuffer.wrap(wkb)
    bb.order(if (bb.get() == 1) java.nio.ByteOrder.LITTLE_ENDIAN
             else java.nio.ByteOrder.BIG_ENDIAN)
    val gtype = bb.getInt() & 0xFF
    if (gtype != GeometryCollectionType) return Array(wkb)
    val n = bb.getInt()
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var pos = 9
    var i = 0
    while (i < n) {
      val sub = java.nio.ByteBuffer.wrap(wkb, pos, wkb.length - pos)
      sub.order(if (sub.get() == 1) java.nio.ByteOrder.LITTLE_ENDIAN
                else java.nio.ByteOrder.BIG_ENDIAN)
      val st = sub.getInt() & 0xFF
      val len = st match {
        case PointType => 21
        case LineStringType => 9 + 16 * sub.getInt()
        case PolygonType => { val nr = sub.getInt(); var l = 13; var r = 0
          // single ring assumption
          l = 9 + 4 + 4 + 16 * sub.getInt(); l }
        case _ => throw new IllegalArgumentException("nested collection")
      }
      out += java.util.Arrays.copyOfRange(wkb, pos, pos + len)
      pos += len
      i += 1
    }
    out.toArray
  }

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

  private val wktPointRe =
    """(?i)\s*point\s*\(\s*([-\d.eE+]+)\s+([-\d.eE+]+)\s*\)\s*""".r

  /** Parse WKT Point / LineString / Polygon (single ring) → WKB. */
  def fromText(wkt0: String): Array[Byte] = {
    val wkt = wkt0.trim
    val up = wkt.toUpperCase
    def coords(body: String): Array[(Double, Double)] =
      body.split(",").map { p =>
        val xy = p.trim.split("\\s+")
        (xy(0).toDouble, xy(1).toDouble)
      }
    if (up.startsWith("POINT")) wkt match {
      case wktPointRe(x, y) => writePoint(x.toDouble, y.toDouble)
      case _ => throw new IllegalArgumentException(s"bad WKT '$wkt0'")
    } else if (up.startsWith("LINESTRING")) {
      if (up.contains("EMPTY")) return writeLineString(Array.empty)
      val body = wkt.substring(wkt.indexOf('(') + 1, wkt.lastIndexOf(')'))
      writeLineString(coords(body))
    } else if (up.startsWith("POLYGON")) {
      val inner = wkt.substring(wkt.indexOf('(') + 1, wkt.lastIndexOf(')')).trim
      val ring = inner.substring(inner.indexOf('(') + 1, inner.lastIndexOf(')'))
      writePolygon(coords(ring))
    } else throw new IllegalArgumentException(s"unsupported WKT '$wkt0'")
  }

  def asText(wkb: Array[Byte]): String = {
    if (((java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .getInt(1)) & 0xFF) == GeometryCollectionType)
      return collectionMembers(wkb).map(asText)
        .mkString("GEOMETRYCOLLECTION(", ",", ")")
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
