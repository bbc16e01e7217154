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
}
