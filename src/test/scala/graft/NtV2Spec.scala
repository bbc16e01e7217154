package graft

import java.nio.ByteOrder

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Crs, EpsgRegistry => R, GridStore, NtV2, SynthNtv2}

/** NTv2 grid-shift machinery: codec round-trips in both endiannesses,
  * bilinear exactness on a bilinear field, sub-grid densest-wins
  * selection, forward/inverse consistency, sign conventions pinned
  * against the independent Helmert path, and the GridStore resolution
  * order inside EpsgRegistry (grid when covering, Helmert fallback). */
class NtV2Spec extends AnyFunSuite {

  private val synth = SynthNtv2.grid

  test("write → parse round-trip preserves structure and nodes (LE + BE)") {
    for (order <- Seq(ByteOrder.LITTLE_ENDIAN, ByteOrder.BIG_ENDIAN)) {
      val parsed = NtV2.parse(NtV2.write(synth, order))
      assert(parsed.subGrids.length === 1)
      val (a, b) = (parsed.subGrids.head, synth.subGrids.head)
      assert(a.name === b.name)
      assert(a.sLat === b.sLat && a.nLat === b.nLat)
      assert(a.eLon === b.eLon && a.wLon === b.wLon)
      assert(a.latInc === b.latInc && a.lonInc === b.lonInc)
      assert(a.nRows === 21 && a.nCols === 21)
      // the synthetic node values are binary fractions, exact in float32
      assert(a.latShift.sameElements(b.latShift))
      assert(a.lonShift.sameElements(b.lonShift))
    }
  }

  test("bilinear interpolation reproduces a bilinear field exactly") {
    val gf = NtV2.parse(NtV2.write(synth))
    // quarter-degree points sit mid-cell in both axes — every weight and
    // product is an exact binary fraction, so equality is bitwise
    for (i <- 0 to 40; j <- 0 to 40 by 5) {
      val lonE = 30.0 + i * 0.25
      val lat = -10.0 + j * 0.25
      val (dLat, dLonW) = gf.shiftSec(lonE, lat).get
      assert(dLat === SynthNtv2.dLatSec(lonE, lat), s"dLat at $lonE,$lat")
      assert(dLonW === SynthNtv2.dLonWestSec(lonE, lat), s"dLonW at $lonE,$lat")
    }
  }

  test("densest covering sub-grid wins; outside every extent → None") {
    val coarse = synth.subGrids.head
    // a denser child over the western half with all-zero shifts
    val child = NtV2.SubGrid("CHILD0", "GRAFT0",
      sLat = -36000.0, nLat = 0.0, eLon = -126000.0, wLon = -108000.0,
      latInc = 900.0, lonInc = 900.0,
      new Array[Double](41 * 21), new Array[Double](41 * 21))
    val gf = NtV2.GridFile(IndexedSeq(coarse, child))
    assert(gf.shiftSec(31.0, -5.0).get === (0.0, 0.0)) // child region
    assert(gf.shiftSec(38.0, -5.0).get ===
      (SynthNtv2.dLatSec(38.0, -5.0), SynthNtv2.dLonWestSec(38.0, -5.0)))
    assert(gf.shiftSec(10.0, -5.0).isEmpty) // outside both
    assert(gf.shiftSec(35.0, 5.0).isEmpty)
  }

  test("inverseShift is the fixed point of forwardShift") {
    for (lonE <- Seq(30.7, 34.113, 39.9); lat <- Seq(-9.8, -4.05, -0.2)) {
      val (fLon, fLat) = synth.forwardShift(lonE, lat).get
      val (iLon, iLat) = synth.inverseShift(fLon, fLat).get
      assert(math.abs(iLon - lonE) < 1e-11, s"lon $lonE")
      assert(math.abs(iLat - lat) < 1e-11, s"lat $lat")
    }
  }

  test("sign conventions match the Helmert path: a grid SAMPLED from the " +
       "NTF Helmert field reproduces Helmert to interpolation error") {
    val h = R.DatumNtf.toWgs84.get
    // 0.05-degree cells over a 4x2-degree patch of France; extents in
    // west-positive arc-seconds (lon 0..4E → lonW -14400..0)
    val (s, n, e, w) = (46.0, 48.0, -14400.0, 0.0)
    val inc = 180.0 // seconds = 0.05 deg
    val nc = math.round((w - e) / inc).toInt + 1
    val nr = math.round((n * 3600 - s * 3600) / inc).toInt + 1
    val la = new Array[Double](nr * nc)
    val lo = new Array[Double](nr * nc)
    for (r <- 0 until nr; c <- 0 until nc) {
      val lat = s + r * inc / 3600.0
      val lonE = -(e + c * inc) / 3600.0
      val (wLon, wLat) = h.shift(lonE, lat)
      la(r * nc + c) = (wLat - lat) * 3600.0
      lo(r * nc + c) = -(wLon - lonE) * 3600.0 // west-positive
    }
    val gf = NtV2.GridFile(IndexedSeq(NtV2.SubGrid("FRHELM", "NONE",
      s * 3600, n * 3600, e, w, inc, inc, la, lo)))
    for (lonE <- Seq(0.33, 1.77, 3.912); lat <- Seq(46.21, 47.033, 47.99)) {
      val (gLon, gLat) = gf.forwardShift(lonE, lat).get
      val (hLon, hLat) = h.shift(lonE, lat)
      assert(math.abs(gLon - hLon) < 5e-8, s"lon at $lonE,$lat")
      assert(math.abs(gLat - hLat) < 5e-8, s"lat at $lonE,$lat")
    }
  }

  test("EpsgRegistry resolution order: grid when covering, Helmert else") {
    GridStore.put(SynthNtv2.fileName, NtV2.write(synth))
    try {
      // inside the synthetic extent: 4275 → 4326 applies the grid field
      val (lonE, lat) = (32.25, -6.75)
      val (oLon, oLat) = Crs.transformBetween(4275, 4326, lonE, lat)
      assert(oLon === lonE - SynthNtv2.dLonWestSec(lonE, lat) / 3600.0)
      assert(oLat === lat + SynthNtv2.dLatSec(lonE, lat) / 3600.0)
      // the reverse direction inverts the grid (not the Helmert)
      val (bLon, bLat) = Crs.transformBetween(4326, 4275, oLon, oLat)
      assert(math.abs(bLon - lonE) < 1e-10 && math.abs(bLat - lat) < 1e-10)
      // outside the extent (France): identical to the Helmert-only path
      val hOnly = R.DatumNtf.toWgs84.get.shift(2.5, 47.0)
      assert(Crs.transformBetween(4275, 4326, 2.5, 47.0) === hOnly)
    } finally GridStore.remove(SynthNtv2.fileName)
  }

  test("27700 full-path grid-vs-Helmert divergence band (resolution-order " +
       "contract through the projected pipeline)") {
    // r9 verdict #8: lock the contract that a 27700-class PROJECTED
    // transform routes its datum step through the covering grid when one
    // is shipped (Helmert else) — through the FULL path: TM inverse →
    // OSGB36 geographic → datum shift → WGS84. The synthetic OSTN15 is
    // the OSGB36 Helmert field SAMPLED on a 0.05° grid over a Wales/
    // England patch PLUS a constant +0.5″ latitude offset, so the
    // grid-vs-Helmert divergence band is pinned analytically: +0.5″ in
    // lat (±bilinear error on the smooth field), ~0 in lon.
    val h = R.DatumOsgb36.toWgs84.get
    val (s0, n0, e0, w0) = (51.0, 53.0, 0.0, 7200.0) // lon -2..0E
    val inc = 180.0
    val nc = math.round((w0 - e0) / inc).toInt + 1
    val nr = math.round((n0 - s0) * 3600 / inc).toInt + 1
    val la = new Array[Double](nr * nc)
    val lo = new Array[Double](nr * nc)
    for (r <- 0 until nr; c <- 0 until nc) {
      val lat = s0 + r * inc / 3600.0
      val lonE = -(e0 + c * inc) / 3600.0
      val (wLon, wLat) = h.shift(lonE, lat)
      la(r * nc + c) = (wLat - lat) * 3600.0 + 0.5 // the planted offset
      lo(r * nc + c) = -(wLon - lonE) * 3600.0
    }
    val gf = NtV2.GridFile(IndexedSeq(NtV2.SubGrid("OSTN15", "NONE",
      s0 * 3600, n0 * 3600, e0, w0, inc, inc, la, lo)))
    // project the test points WITHOUT the grid (Helmert-only 27700)
    val pts = Seq((-1.25, 51.75), (-0.13, 52.2))
    val en = pts.map { case (lon, lat) => Crs.transform(27700, lon, lat) }
    val outside = Crs.transform(27700, -4.9, 56.2) // Scotland, off-grid
    val helmOut = Crs.transformBetween(27700, 4326,
      outside._1, outside._2)
    GridStore.put("OSTN15_NTv2_OSGBtoETRS.gsb", NtV2.write(gf))
    try {
      for (((lon, lat), (e, n)) <- pts.zip(en)) {
        val (gLon, gLat) = Crs.transformBetween(27700, 4326, e, n)
        val dLatSec = (gLat - lat) * 3600.0
        val dLonSec = (gLon - lon) * 3600.0
        assert(math.abs(dLatSec - 0.5) < 2e-3,
          s"lat divergence $dLatSec″ at $lon,$lat — want the 0.5″ band")
        assert(math.abs(dLonSec) < 2e-3,
          s"lon divergence $dLonSec″ at $lon,$lat — want ~0")
      }
      // outside the grid extent: byte-identical to the Helmert-only path
      val offGrid = Crs.transformBetween(27700, 4326,
        outside._1, outside._2)
      assert(offGrid === helmOut)
    } finally GridStore.remove("OSTN15_NTv2_OSGBtoETRS.gsb")
    // with the grid gone the divergence collapses to zero again
    val (rLon, rLat) = Crs.transformBetween(27700, 4326,
      en.head._1, en.head._2)
    // sub-mm: the residual is the iterative inverse-TM tolerance, not
    // any grid remnant (the 0.5″ offset is ~15 m — four orders away)
    assert(math.abs(rLat - pts.head._2) * 3600 < 1e-3 &&
      math.abs(rLon - pts.head._1) * 3600 < 1e-3)
  }

  test("without the grid file the registry is Helmert-only (r7 behavior)") {
    val hOnly = R.DatumNtf.toWgs84.get.shift(32.25, -6.75)
    assert(Crs.transformBetween(4275, 4326, 32.25, -6.75) === hOnly)
  }
}
