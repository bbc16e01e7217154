package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Geodesy

/** Geodetic (WGS84) box area against independently computed 40-digit
  * mpmath reference values of the exact auxiliary-sphere integrals. */
class GeodesySpec extends AnyFunSuite {

  test("edge q-integrals match 40-digit mpmath reference") {
    Geodesy.DebugRoot = true
    val en = Geodesy.edgeQIntegral(math.toRadians(5), math.toRadians(3))
    val es = Geodesy.edgeQIntegral(math.toRadians(2), math.toRadians(3))
    info(f"E(N)=$en%.21f want 0.009129321410511723633")
    info(f"E(S)=$es%.21f want 0.003655526412343501420")
    assert(math.abs(en - 0.009129321410511723633) < 5e-17)
    assert(math.abs(es - 0.003655526412343501420) < 5e-17)
  }

  test("geodetic box area matches the MEOS/GeographicLib value") {
    // ref test/sql/stbox.test:84 — GEODSTBOX ZT(((1,2,3),(4,5,6)),...)
    val a = Geodesy.boxArea(1.0, 4.0, 2.0, 5.0)
    assert(math.abs(a - 110593375170.26) < 0.05, s"got $a")
  }

  test("degenerate boxes have zero area") {
    assert(Geodesy.boxArea(1, 1, 2, 5) == 0.0)
    assert(math.abs(Geodesy.boxArea(1, 4, 2, 2)) < 1e-3)
  }

  test("southern-hemisphere box mirrors the northern one") {
    val n = Geodesy.boxArea(10, 13, 40, 43)
    val s = Geodesy.boxArea(10, 13, -43, -40)
    assert(math.abs(n - s) < 1e-3, s"$n vs $s")
  }

  test("node azimuth root actually solves edgeLambda = dLam (wide, low-lat)") {
    // the old bracket lower bound pinned low-latitude wide edges (dLam
    // near pi) to the bracket endpoint — verify the residual across the
    // previously-broken regime
    for (latDeg <- Seq(0.5, 2.0, 10.0, 45.0, 80.0);
         dLamDeg <- Seq(1.0, 45.0, 120.0, 170.0, 179.5)) {
      val beta0 = math.atan(
        (1 - Geodesy.F) * math.tan(math.toRadians(latDeg)))
      val dLam = math.toRadians(dLamDeg)
      val a0 = Geodesy.solveNodeAzimuth(beta0, dLam)
      val residual = math.abs(Geodesy.edgeLambdaAt(beta0, a0) - dLam)
      assert(residual < 1e-9, s"lat=$latDeg dLam=$dLamDeg residual=$residual")
    }
  }

  test("UTM transform matches published sample coordinates") {
    import graft.core.Crs
    // CN Tower, 43.642567 N 79.387139 W — UTM zone 17N (EPSG:32617):
    // easting 630084, northing 4833438 (widely published sample)
    val (e17, n17) = Crs.transform(32617, -79.387139, 43.642567)
    assert(math.abs(e17 - 630084) < 1.0, s"easting $e17")
    assert(math.abs(n17 - 4833438) < 1.0, s"northing $n17")
    // central meridian maps to the 500 km false easting exactly
    val (e0, n0) = Crs.transform(32632, 9.0, 0.0)
    assert(math.abs(e0 - 500000.0) < 1e-6 && math.abs(n0) < 1e-6)
    // south zone = mirrored north + 10 000 km false northing
    val (eN, nN) = Crs.transform(32656, 153.0, 27.5)
    val (eS, nS) = Crs.transform(32756, 153.0, -27.5)
    assert(math.abs(eN - eS) < 1e-6)
    assert(math.abs((10000000.0 - nN) - nS) < 1e-6)
  }

  test("EPSG:2154 Lambert-93 hits its defining coordinates and parallels") {
    import graft.core.Crs
    // the natural origin (3E, 46.5N) maps to the false origin exactly
    val (x0, y0) = Crs.transform(2154, 3.0, 46.5)
    assert(math.abs(x0 - 700000.0) < 1e-6 && math.abs(y0 - 6600000.0) < 1e-6)
    // LCC 2SP is true-scale on both standard parallels: a 0.01-degree
    // step of longitude along 49N/44N must project to the ellipsoidal
    // parallel arc length (r*cos(phi)/sqrt(1-e2 sin^2 phi) * dlam)
    for (latDeg <- Seq(49.0, 44.0)) {
      val (xa, ya) = Crs.transform(2154, 3.0, latDeg)
      val (xb, yb) = Crs.transform(2154, 3.01, latDeg)
      val chord = math.hypot(xb - xa, yb - ya)
      val phi = math.toRadians(latDeg)
      val e2 = (1.0 / 298.257222101) * (2 - 1.0 / 298.257222101)
      val arc = 6378137.0 * math.cos(phi) /
        math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi)) * math.toRadians(0.01)
      assert(math.abs(chord - arc) < 1e-3, s"lat $latDeg: $chord vs $arc")
    }
  }

  test("EPSG:25832 ETRS89/UTM32 equals the defining constants and WGS84 twin") {
    import graft.core.Crs
    // central meridian at the equator is the false easting exactly
    val (e0, n0) = Crs.transform(25832, 9.0, 0.0)
    assert(math.abs(e0 - 500000.0) < 1e-6 && math.abs(n0) < 1e-6)
    // GRS80 vs WGS84 flattening differs in the 9th digit: the ETRS89
    // grid must agree with the (published-sample-validated) WGS84 UTM
    // twin to sub-mm — a strong cross-check of the GRS80 series
    val (eE, nE) = Crs.transform(25832, 10.0, 53.55) // Hamburg
    val (eW, nW) = Crs.transform(32632, 10.0, 53.55)
    assert(math.abs(eE - eW) < 1e-3 && math.abs(nE - nW) < 1e-3,
      s"($eE,$nE) vs ($eW,$nW)")
  }

  test("EPSG:3035 LAEA Europe: defining center + equal-area property") {
    import graft.core.Crs
    val (x0, y0) = Crs.transform(3035, 10.0, 52.0)
    assert(math.abs(x0 - 4321000.0) < 1e-6 && math.abs(y0 - 3210000.0) < 1e-6)
    // equal-area: planar polygon area of a projected 1x1-degree box far
    // from the center must match the exact ellipsoidal parallel-edge box
    // area a^2/2 * dlam * (q(phi2) - q(phi1)). (Geodesy.boxArea is NOT
    // the comparison target: it is a geodesic-edge quadrilateral, which
    // at 48N differs from the parallel-edge box by ~1.7e-5 relative.)
    val (lo, hi) = (14.0, 15.0); val (la, lb) = (48.0, 49.0)
    val pts = {
      val south = (0 to 400).map(i => (lo + i * (hi - lo) / 400, la))
      val east = (0 to 400).map(i => (hi, la + i * (lb - la) / 400))
      val north = (0 to 400).map(i => (hi - i * (hi - lo) / 400, lb))
      val west = (0 to 400).map(i => (lo, lb - i * (lb - la) / 400))
      (south ++ east ++ north ++ west).map { case (x, y) =>
        Crs.transform(3035, x, y)
      }
    }
    val planar = math.abs(pts.indices.map { i =>
      val (x1, y1) = pts(i); val (x2, y2) = pts((i + 1) % pts.length)
      x1 * y2 - x2 * y1
    }.sum / 2)
    val aa = 6378137.0; val ff = 1.0 / 298.257222101
    val e2 = ff * (2 - ff); val ecc = math.sqrt(e2)
    def q(p: Double) = {
      val s = math.sin(p)
      (1 - e2) * (s / (1 - e2 * s * s) -
        1 / (2 * ecc) * math.log((1 - ecc * s) / (1 + ecc * s)))
    }
    val exact = aa * aa / 2 *
      (q(math.toRadians(lb)) - q(math.toRadians(la))) * math.toRadians(hi - lo)
    assert(math.abs(planar - exact) / exact < 1e-6, s"$planar vs $exact")
  }

  test("EPSG:27700 British National Grid matches the OS worked example") {
    import graft.core.Crs
    // OS "A guide to coordinate systems in Great Britain", worked example
    // (projection, Annex C): OSGB36 52deg39'27.2531"N 1deg43'4.5177"E ->
    // E 651409.903 N 313177.270 — validates the Airy TM + grid offsets
    // without the datum shift
    val latOsgb = 52 + 39.0 / 60 + 27.2531 / 3600
    val lonOsgb = 1 + 43.0 / 60 + 4.5177 / 3600
    val (e, n) = Crs.osgb36Forward(lonOsgb, latOsgb)
    assert(math.abs(e - 651409.903) < 0.01, s"easting $e")
    assert(math.abs(n - 313177.270) < 0.01, s"northing $n")
    // full WGS84 path: the Helmert shift moves UK coordinates ~100+ m
    // (OSGB36 vs WGS84 offset is famously ~120 m in the southeast) and
    // the shifted point stays within the published ~5 m Helmert bound of
    // the projection example when starting from the ETRS89 position
    val (x, y) = Crs.transform(27700, lonOsgb, latOsgb)
    val d = math.hypot(x - 651409.903, y - 313177.270)
    assert(d > 50 && d < 200, s"datum shift moved $d m")
  }

  test("every supported SRID round-trips forward->inverse to sub-mm") {
    import graft.core.Crs
    // representative in-extent points per code (lon, lat)
    val cases = Seq(
      3857 -> (13.4, 52.5), 3812 -> (4.35, 50.85),
      2154 -> (2.35, 48.85), 3035 -> (14.5, 48.5),
      27700 -> (-0.12, 51.5), 25832 -> (10.0, 53.55),
      32617 -> (-79.39, 43.64), 32756 -> (153.0, -27.5))
    for ((srid, (lon, lat)) <- cases) {
      val (x, y) = Crs.transform(srid, lon, lat)
      val (lon2, lat2) = Crs.inverse(srid, x, y)
      // 2e-8 deg ~ 2 mm: datum-free codes round-trip to ~1e-12; 27700's
      // transposed small-angle rotation leaves ~1 mm, far inside the
      // published Helmert's own ~5 m accuracy
      assert(math.abs(lon2 - lon) < 2e-8 && math.abs(lat2 - lat) < 2e-8,
        s"$srid: ($lon,$lat) -> ($x,$y) -> ($lon2,$lat2)")
    }
  }

  test("pairwise transform pivots exactly: from->to == from->4326->to") {
    import graft.core.Crs
    // Brussels in Belgian Lambert 2008 -> ETRS89/UTM31 must equal the
    // two-step path by construction, and transformBetween(same, same)
    // is the identity
    val (bx, by) = Crs.transform(3812, 4.35, 50.85)
    val (ux, uy) = Crs.transformBetween(3812, 25831, bx, by)
    val (ux2, uy2) = Crs.transform(25831, 4.35, 50.85)
    assert(math.abs(ux - ux2) < 1e-6 && math.abs(uy - uy2) < 1e-6,
      s"($ux,$uy) vs ($ux2,$uy2)")
    assert(Crs.transformBetween(3812, 3812, bx, by) == ((bx, by)))
  }

  test("wide boxes (>= 180 deg lon) split at the midpoint meridian") {
    val whole = Geodesy.boxArea(-100, 100, 10, 20)
    val halves = Geodesy.boxArea(-100, 0, 10, 20) + Geodesy.boxArea(0, 100, 10, 20)
    assert(math.abs(whole - halves) / halves < 1e-12)
    // monotone in width and finite through the old failure regime
    val a179 = Geodesy.boxArea(0, 179, 0, 10)
    val a90 = Geodesy.boxArea(0, 90, 0, 10)
    assert(a179.isFinite && a179 > a90 && a90 > 0)
  }
}
