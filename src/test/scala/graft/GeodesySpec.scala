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
