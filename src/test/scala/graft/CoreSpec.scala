package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.TextIO._

/** Unit tests for the core algebra, golden values taken from the
  * reference's sqllogictests (test/sql of the reference repo). */
class CoreSpec extends AnyFunSuite {

  // ---- spans (ref test/sql/span.test) ----

  test("intspan canonicalization [1,2] -> [1, 3)") {
    assert(printSpanL(parseSpanL("[1,2]", DomInt), DomInt) == "[1, 3)")
    assert(printSpanL(parseSpanL("(1,2]", DomInt), DomInt) == "[2, 3)")
  }

  test("tstzspan round trip") {
    assert(printSpanL(parseSpanL("[2000-01-01,2000-01-01]", DomTs), DomTs) ==
      "[2000-01-01 00:00:00+00, 2000-01-01 00:00:00+00]")
  }

  test("tstzspan contains timestamp (ref span.test @>)") {
    val sp = parseSpanL("[2000-01-01,2000-01-03]", DomTs)
    assert(SpanAlg.containsValue(sp, TimeFmt.parseTs("2000-01-02")))
    assert(!SpanAlg.containsValue(sp, TimeFmt.parseTs("2000-01-10")))
  }

  // ---- sets (ref test/sql/set.test) ----

  test("intset sorts and dedups") {
    assert(printSetL(parseSetL("{-1,-3,3}", DomInt), DomInt) == "{-3, -1, 3}")
  }
  test("floatset print") {
    assert(printSetD(parseSetD("{-1.2,-3.1,3}")) == "{-3.1, -1.2, 3}")
  }
  test("tstzset quoted print") {
    assert(printSetL(parseSetL("{2001-01-01 08:00:00, 2001-01-03 09:30:00}", DomTs), DomTs) ==
      "{\"2001-01-01 08:00:00+00\", \"2001-01-03 09:30:00+00\"}")
  }
  test("dateset unquoted print") {
    assert(printSetL(parseSetL("{2001-02-01}", DomDate), DomDate) == "{2001-02-01}")
  }
  test("textset sorted quoted") {
    assert(printSetS(parseSetS("{\"highway\", \"car\"}")) == "{\"car\", \"highway\"}")
  }

  // ---- spansets (ref test/sql/spanset.test) ----

  test("floatspanset keeps disjoint spans") {
    assert(printSpanSetD(parseSpanSetD("{[8.1, 8.5],[9.2, 9.4]}")) ==
      "{[8.1, 8.5], [9.2, 9.4]}")
  }
  test("intspanset merges adjacent after canonicalization") {
    val ss = SpanSetAlg.normalize(Array(
      parseSpanL("[10,12]", DomInt), parseSpanL("[13,15]", DomInt)))
    assert(printSpanSetL(ss, DomInt) == "{[10, 16)}")
  }
  test("datespanset merges adjacent days") {
    val ss = SpanSetAlg.normalize(Array(
      parseSpanL("[2000-01-01, 2000-01-02]", DomDate),
      parseSpanL("[2000-01-03,2000-01-04]", DomDate)))
    assert(printSpanSetL(ss, DomDate) == "{[2000-01-01, 2000-01-05)}")
  }
  test("spanset minus") {
    val a = Array(SpanL(0, 10, true, false))
    val b = Array(SpanL(3, 5, true, false))
    val m = SpanSetAlg.minus(a, b)
    assert(printSpanSetL(m, DomInt) == "{[0, 3), [5, 10)}")
  }

  // ---- temporal numerics (ref test/sql/tint.test, tbool.test) ----

  test("tint instant parse/print with tz normalization") {
    assert(printTNum(parseTNum("15@2025-01-01", KInt), KInt) ==
      "15@2025-01-01 00:00:00+00")
    assert(printTNum(parseTNum("100@2025-01-01 10:00:00+05", KInt), KInt) ==
      "100@2025-01-01 05:00:00+00")
  }

  test("tint discrete sequence round trip") {
    assert(printTNum(parseTNum("{1@2025-01-01, 2@2025-01-02, 1@2025-01-03}", KInt), KInt) ==
      "{1@2025-01-01 00:00:00+00, 2@2025-01-02 00:00:00+00, 1@2025-01-03 00:00:00+00}")
  }

  test("tint sequence set print") {
    assert(printTNum(parseTNum("{[1@2025-01-01, 2@2025-01-02],[3@2025-01-04, 3@2025-01-05]}", KInt), KInt) ==
      "{[1@2025-01-01 00:00:00+00, 2@2025-01-02 00:00:00+00], [3@2025-01-04 00:00:00+00, 3@2025-01-05 00:00:00+00]}")
  }

  test("tempSubtype / interp names") {
    assert(Subtype.name(parseTNum("1@2025-01-01", KInt).subtype) == "Instant")
    assert(Subtype.name(parseTNum("{1@2025-01-01, 2@2025-01-02}", KInt).subtype) == "Sequence")
    assert(Subtype.name(parseTNum("{[1@2025-01-01, 2@2025-01-02]}", KInt).subtype) == "SequenceSet")
    assert(Interp.name(parseTNum("1@2000-01-01", KInt).interp) == "None")
    assert(Interp.name(parseTNum("{1@2000-01-01, 2@2000-01-02}", KInt).interp) == "Discrete")
    assert(Interp.name(parseTNum("[1@2000-01-01, 2@2000-01-02]", KInt).interp) == "Step")
    assert(Interp.name(parseTNum("[1.5@2000-01-01, 2.5@2000-01-02]", KFloat).interp) == "Linear")
  }

  test("tbool print t/f") {
    assert(printTNum(parseTNum("{t@2000-01-01, f@2000-01-02}", KBool), KBool) ==
      "{t@2000-01-01 00:00:00+00, f@2000-01-02 00:00:00+00}")
  }

  test("duration boundspan (ref README '2 days')") {
    val t = parseTNum("{1@2000-01-01, 2@2000-01-02, 1@2000-01-03}", KInt)
    assert(TimeFmt.printInterval(TNumAlg.duration(t, boundSpan = true)) == "2 days")
    assert(TimeFmt.printInterval(TNumAlg.duration(t, boundSpan = false)) == "00:00:00")
  }

  test("valueAt linear interpolation") {
    val t = parseTNum("[1@2000-01-01, 3@2000-01-03]", KFloat)
    assert(TNumAlg.valueAt(t, TimeFmt.parseTs("2000-01-02")).contains(2.0))
    assert(TNumAlg.valueAt(t, TimeFmt.parseTs("2000-01-04")).isEmpty)
  }

  test("valueAt step holds previous value") {
    val t = parseTNum("[1@2000-01-01, 3@2000-01-03]", KInt)
    assert(TNumAlg.valueAt(t, TimeFmt.parseTs("2000-01-02")).contains(1.0))
  }

  test("atTime clips with interpolated boundaries") {
    val t = parseTNum("[0@2000-01-01, 10@2000-01-11]", KFloat)
    val w = parseSpanL("[2000-01-03, 2000-01-05]", DomTs)
    val r = TNumAlg.atTimeSpan(t, w).get
    assert(printTNum(r, KFloat) ==
      "[2@2000-01-03 00:00:00+00, 4@2000-01-05 00:00:00+00]")
    assert(TNumAlg.atTimeSpan(t, parseSpanL("[2001-01-01, 2001-01-02]", DomTs)).isEmpty)
  }

  test("whenTrue merges consecutive true steps") {
    val t = parseTNum("[t@2000-01-01, t@2000-01-02, f@2000-01-03, t@2000-01-04]", KBool)
    val spans = TNumAlg.whenTrue(t)
    assert(printSpanSetL(spans, DomTs) ==
      "{[2000-01-01 00:00:00+00, 2000-01-03 00:00:00+00), [2000-01-04 00:00:00+00, 2000-01-04 00:00:00+00]}")
  }

  test("atValue on linear finds crossing") {
    val t = parseTNum("[0@2000-01-01, 10@2000-01-11]", KFloat)
    val r = TNumAlg.atValue(t, 5.0).get
    assert(printTNum(r, KFloat) == "[5@2000-01-06 00:00:00+00]")
  }

  // ---- tgeompoint (ref test/sql/tgeompoint.test) ----

  test("tgeompoint instant prints WKB hex") {
    assert(printTPoint(parseTPoint("Point(1 1)@2012-01-01 08:00:00")) ==
      "0101000000000000000000F03F000000000000F03F@2012-01-01 08:00:00+00")
  }
  test("tgeompoint asText") {
    assert(printTPointText(parseTPoint("  Point(2 2)@2012-01-01 08:00:00  ")) ==
      "POINT(2 2)@2012-01-01 08:00:00+00")
  }
  test("tgeompoint sequence asText") {
    val t = parseTPoint("[Point(1 1)@2012-01-01 08:00:00, Point(2 2)@2012-01-01 08:10:00, Point(1 1)@2012-01-01 08:20:00]")
    assert(printTPointText(t) ==
      "[POINT(1 1)@2012-01-01 08:00:00+00, POINT(2 2)@2012-01-01 08:10:00+00, POINT(1 1)@2012-01-01 08:20:00+00]")
  }
  test("tgeompoint stbox") {
    val t = parseTPoint("Point(1 1)@2000-01-01")
    assert(printSTBox(TPointAlg.stbox(t)) ==
      "STBOX XT(((1,1),(1,1)),[2000-01-01 00:00:00+00, 2000-01-01 00:00:00+00])")
  }
  test("tgeompoint getTime spanset") {
    val t = parseTPoint("{[Point(1 1)@2000-01-01, Point(2 2)@2000-01-02, Point(1 1)@2000-01-03],[Point(3 3)@2000-01-04, Point(3 3)@2000-01-05]}")
    val spans = SpanSetAlg.normalize(t.seqs.map(s => SpanL(s.startT, s.endT, s.lInc, s.uInc)))
    assert(printSpanSetL(spans, DomTs) ==
      "{[2000-01-01 00:00:00+00, 2000-01-03 00:00:00+00], [2000-01-04 00:00:00+00, 2000-01-05 00:00:00+00]}")
  }

  test("tpoint length and valueAt") {
    val t = parseTPoint("[Point(0 0)@2000-01-01, Point(3 4)@2000-01-02]")
    assert(TPointAlg.length(t) == 5.0)
    val p = TPointAlg.valueAt(t, TimeFmt.parseTs("2000-01-01 12:00:00")).get
    assert(math.abs(p._1 - 1.5) < 1e-9 && math.abs(p._2 - 2.0) < 1e-9)
  }

  test("eDwithin / tDwithin quadratic solver") {
    // two points moving toward each other along x
    val a = parseTPoint("[Point(0 0)@2000-01-01 00:00:00, Point(10 0)@2000-01-01 00:00:10]")
    val b = parseTPoint("[Point(10 0)@2000-01-01 00:00:00, Point(0 0)@2000-01-01 00:00:10]")
    assert(TPointAlg.eDwithin(a, b, 1.0))   // they cross
    assert(!TPointAlg.eDwithin(a, TPointAlg.instant(100, 100, TimeFmt.parseTs("2000-01-01 00:00:05")), 1.0))
    val tb = TPointAlg.tDwithin(a, b, 2.0).get
    // |d(t)| = |10 - 2t| <= 2 -> t in [4, 6] seconds
    val spans = TNumAlg.whenTrue(tb)
    assert(spans.length == 1)
    assert(TimeFmt.printTs(spans(0).lower) == "2000-01-01 00:00:04+00")
    assert(TimeFmt.printTs(spans(0).upper) == "2000-01-01 00:00:06+00")
    assert(!TPointAlg.aDisjoint(a, b))
    val c = parseTPoint("[Point(0 5)@2000-01-01 00:00:00, Point(10 5)@2000-01-01 00:00:10]")
    assert(TPointAlg.aDisjoint(a, c))
  }

  test("minDistance of crossing paths is 0") {
    val a = parseTPoint("[Point(0 0)@2000-01-01 00:00:00, Point(10 0)@2000-01-01 00:00:10]")
    val b = parseTPoint("[Point(10 0)@2000-01-01 00:00:00, Point(0 0)@2000-01-01 00:00:10]")
    assert(TPointAlg.minDistance(a, b) < 1e-6)
    val c = parseTPoint("[Point(0 3)@2000-01-01 00:00:00, Point(10 3)@2000-01-01 00:00:10]")
    assert(math.abs(TPointAlg.minDistance(a, c) - 3.0) < 1e-9)
  }

  test("atGeometry clips to polygon") {
    val t = parseTPoint("[Point(-5 0)@2000-01-01 00:00:00, Point(5 0)@2000-01-01 00:00:10]")
    val square = Array((-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0))
    val r = TPointAlg.atGeometry(t, square).get
    val ts = TPointAlg.timeSpan(r)
    assert(TimeFmt.printTs(ts.lower) == "2000-01-01 00:00:04+00")
    assert(TimeFmt.printTs(ts.upper) == "2000-01-01 00:00:06+00")
  }

  test("trajectory dedups to linestring / point") {
    val t = parseTPoint("[Point(1 1)@2000-01-01, Point(2 2)@2000-01-02]")
    assert(Wkb.asText(TPointAlg.trajectory(t)) == "LINESTRING(1 1,2 2)")
    val p = parseTPoint("[Point(1 1)@2000-01-01, Point(1 1)@2000-01-02]")
    assert(Wkb.asText(TPointAlg.trajectory(p)) == "POINT(1 1)")
  }

  // ---- boxes (ref test/sql/tbox.test, stbox.test) ----

  test("tbox parse/print variants") {
    assert(printTBox(parseTBox("TBOXINT XT([1, 1],[2000-01-01,2000-01-02])")) ==
      "TBOXINT XT([1, 2),[2000-01-01 00:00:00+00, 2000-01-02 00:00:00+00])")
    assert(printTBox(parseTBox("TBOXFLOAT XT([1.0, 1.0],[2000-01-01,2000-01-02])")) ==
      "TBOXFLOAT XT([1, 1],[2000-01-01 00:00:00+00, 2000-01-02 00:00:00+00])")
    assert(printTBox(parseTBox("TBOXINT X([1, 1])")) == "TBOXINT X([1, 2))")
    assert(printTBox(parseTBox("TBOX T([2000-01-01,2000-01-02])")) ==
      "TBOX T([2000-01-01 00:00:00+00, 2000-01-02 00:00:00+00])")
    assert(printTBox(parseTBox("TBOXINT XT([1,2][2000-01-01,2000-01-02])")) ==
      "TBOXINT XT([1, 3),[2000-01-01 00:00:00+00, 2000-01-02 00:00:00+00])")
  }

  test("stbox parse/print variants") {
    assert(printSTBox(parseSTBox("STBOX X((1.0,2.0),(3.0,4.0))")) == "STBOX X((1,2),(3,4))")
    assert(printSTBox(parseSTBox("STBOX Z((1.0,2.0,3.0),(4.0,5.0,6.0))")) == "STBOX Z((1,2,3),(4,5,6))")
    assert(printSTBox(parseSTBox("STBOX XT(((1.0,2.0),(3.0,4.0)),[2001-01-01, 2001-01-02])")) ==
      "STBOX XT(((1,2),(3,4)),[2001-01-01 00:00:00+00, 2001-01-02 00:00:00+00])")
    assert(printSTBox(parseSTBox("STBOX T([2001-01-01, 2001-01-02])")) ==
      "STBOX T([2001-01-01 00:00:00+00, 2001-01-02 00:00:00+00])")
    assert(printSTBox(parseSTBox("GEODSTBOX Z((1.0,2.0,3.0),(1.0,2.0,3.0))")) ==
      "SRID=4326;GEODSTBOX Z((1,2,3),(1,2,3))")
    assert(printSTBox(parseSTBox("GEODSTBOX T([2001-01-01, 2001-01-02])")) ==
      "GEODSTBOX T([2001-01-01 00:00:00+00, 2001-01-02 00:00:00+00])")
  }

  test("stbox overlaps / contains / expandSpace") {
    val a = parseSTBox("STBOX X((0,0),(10,10))")
    val b = parseSTBox("STBOX X((5,5),(15,15))")
    val c = parseSTBox("STBOX X((11,11),(12,12))")
    assert(BoxAlg.overlapsST(a, b))
    assert(!BoxAlg.overlapsST(a, c))
    assert(BoxAlg.containsST(a, parseSTBox("STBOX X((1,1),(2,2))")))
    assert(BoxAlg.overlapsST(BoxAlg.expandSpace(a, 2.0), c))
    assert(BoxAlg.area(a) == 100.0)
  }

  test("mercator round trip") {
    val (x, y) = Geo.lonLatToMercator(13.405, 52.52) // Berlin
    val (lon, lat) = Geo.mercatorToLonLat(x, y)
    assert(math.abs(lon - 13.405) < 1e-9 && math.abs(lat - 52.52) < 1e-9)
  }

  test("text spanset parse/normalize/print (textspanset)") {
    val ss = TextIO.parseSpanSetS("""{["a", "c"], ["b", "d"], ["x", "y")}""")
    assert(TextIO.printSpanSetS(ss) == """{["a", "d"], ["x", "y")}""")
    // touching closed bounds merge; open-against-closed stays split
    val t2 = TextIO.parseSpanSetS("""{["a", "b"], ["b", "c"]}""")
    assert(TextIO.printSpanSetS(t2) == """{["a", "c"]}""")
    val t3 = TextIO.parseSpanSetS("""{["a", "b"), ("b", "c"]}""")
    assert(TextIO.printSpanSetS(t3) == """{["a", "b"), ("b", "c"]}""")
  }

  test("3D point literals parse, measure and print") {
    val t = TextIO.parseTPoint("[Point(1 1 1)@2000-01-01, Point(2 2 2)@2000-01-02]")
    assert(t.seqs.head.is3d)
    assert(math.abs(TPointAlg.length(t) - math.sqrt(3)) < 1e-12)
    assert(TextIO.printTPointText(t).contains("POINT Z (1 1 1)@"))
    val box = TPointAlg.stbox(t)
    assert(box.hasZ && box.zmin == 1.0 && box.zmax == 2.0)
  }

  test("EPSG:3812 forward matches published EPSG sample coordinates") {
    val (x, y) = Crs.transform(3812, 2.340088, 49.400250)
    assert(math.abs(x - 502773.429981) < 1e-5, s"x=$x")
    assert(math.abs(y - 511805.120402) < 1e-5, s"y=$y")
  }
}
