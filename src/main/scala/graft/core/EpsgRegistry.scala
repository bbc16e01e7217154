package graft.core

/** Data-driven EPSG CRS registry widening [[Crs.transform]] from the
  * closed set of special-cased codes to the common national / continental
  * systems a PROJ-backed engine supports out of the box. The reference
  * (via MEOS/PROJ, `src/geo/geoset.cpp:106-122`) reprojects between any
  * SRID pair; this registry closes most of that residual gap with
  * published EPSG parameters only:
  *
  *  - projection methods: Transverse Mercator (Karney series, reused from
  *    [[Crs.Tmerc]]), Lambert Conformal Conic 1SP (EPSG 9801) and 2SP
  *    (reused [[Crs.Lcc2SP]]), Lambert Azimuthal Equal Area (reused
  *    [[Crs.Laea]]), Albers Equal Area (9822), Mercator variant A (9804),
  *    Polar Stereographic variants A/B (9810/9829), Oblique Stereographic
  *    (9809, IOGP GN7-2 formulas), Lambert Cylindrical Equal Area (9835),
  *    and geographic (identity) CRS;
  *  - datum shifts: 7-parameter Helmert (position-vector convention,
  *    reused [[Crs.Helmert]]) with the standard published local→WGS84
  *    parameter sets (the same values PROJ ships as `+towgs84=`);
  *  - prime meridians: folded into the projection's central meridian
  *    (Paris = 2°20'14.025" = 2.337229166666667° for the NTF zones) —
  *    datum shifts run in ECEF so only the projection sees the PM.
  *
  * Accuracy: projection formulas are sub-mm; Helmert datum shifts carry
  * the published transformation's own nominal accuracy (1-10 m depending
  * on datum — same as PROJ without grid files). All worked-example tests
  * are in CrsRegistrySpec.
  */
object EpsgRegistry {

  // ---------------------------------------------------------------- datums

  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
  }

  val Wgs84: Ellipsoid = Ellipsoid(6378137.0, 298.257223563)
  val Grs80: Ellipsoid = Ellipsoid(6378137.0, 298.257222101)
  val Airy1830: Ellipsoid = Ellipsoid(6377563.396, 299.3249646)
  val Bessel1841: Ellipsoid = Ellipsoid(6377397.155, 299.1528128)
  /** a/(a-b) for a=6378206.4, b=6356583.8 (Clarke 1866 is defined by a,b). */
  val Clarke1866: Ellipsoid = Ellipsoid(6378206.4, 294.9786982139006)
  /** a/(a-b) for a=6378249.2, b=6356515.0 (Clarke 1880 IGN, defined by a,b). */
  val Clarke1880Ign: Ellipsoid = Ellipsoid(6378249.2, 293.4660212936269)
  val Intl1924: Ellipsoid = Ellipsoid(6378388.0, 297.0)
  /** Everest 1830 (1967 definition) — Borneo RSO (GN7-2 worked example). */
  val Everest1967: Ellipsoid = Ellipsoid(6377298.556, 300.8017)
  val Grs67: Ellipsoid = Ellipsoid(6378160.0, 298.247167427)

  /** Datum = ellipsoid + optional local→WGS84 Helmert (position-vector
    * convention — the `+towgs84` sign convention). `None` marks datums
    * within ~1 m of WGS84 (ETRS89, NAD83, GDA94, NZGD2000, RGF93): no
    * shift is applied, the ellipsoid still parameterizes the projection.
    * `gridFile` names the published NTv2 grid for the datum (the one
    * PROJ would load): when that file has been shipped to the session
    * (see [[GridStore]]) and covers the point, the grid-interpolated
    * shift replaces the Helmert — the same resolution order PROJ uses,
    * upgrading 1-10 m nominal accuracy to the grid's decimetre class
    * with zero code change. */
  final case class Datum(ell: Ellipsoid, toWgs84: Option[Crs.Helmert],
                         gridFile: Option[String] = None)

  private def helmert(ell: Ellipsoid, tx: Double, ty: Double, tz: Double,
                      rx: Double = 0, ry: Double = 0, rz: Double = 0,
                      s: Double = 0, grid: Option[String] = None): Datum =
    Datum(ell, Some(new Crs.Helmert(
      aSrc = ell.a, fSrc = ell.f, aDst = Wgs84.a, fDst = Wgs84.f,
      tx = tx, ty = ty, tz = tz, rxSec = rx, rySec = ry, rzSec = rz,
      sPpm = s)), grid)

  val DatumWgs84: Datum = Datum(Wgs84, None)
  val DatumGrs80: Datum = Datum(Grs80, None) // ETRS89 / NAD83 / GDA94 / NZGD2000
  /** OSGB36→WGS84 — inverse of the published OS tfm 1314 set already used
    * by the 27700 special case. Grid: the OS-published OSTN15 NTv2
    * distribution (ship it and transforms become cm-class). */
  val DatumOsgb36: Datum = helmert(Airy1830,
    446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894,
    grid = Some("OSTN15_NTv2_OSGBtoETRS.gsb"))
  /** DHDN (Potsdam)→WGS84, standard published set. Grid: BKG BETA2007. */
  val DatumDhdn: Datum = helmert(Bessel1841,
    598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7,
    grid = Some("BETA2007.gsb"))
  /** Amersfoort→WGS84, standard published set. Grid: NSGI rdtrans2018. */
  val DatumAmersfoort: Datum = helmert(Bessel1841,
    565.417, 50.3319, 465.552, -0.398957, 0.343988, -1.8774, 4.0725,
    grid = Some("rdtrans2018.gsb"))
  /** NTF→WGS84 (geocentric translations, EPSG tfm 1193). Grid: IGN
    * ntf_r93 (NTF→RGF93, which is WGS84-coincident at this accuracy). */
  val DatumNtf: Datum = helmert(Clarke1880Ign, -168.0, -60.0, 320.0,
    grid = Some("ntf_r93.gsb"))
  /** ED50→WGS84 mean-European translations. */
  val DatumEd50: Datum = helmert(Intl1924, -87.0, -98.0, -121.0)
  /** NAD27 (CONUS mean)→WGS84 translations. Grid: the NRCan NTv2
    * distribution (Canada; CONUS NADCON grids exist in NTv2 repacks
    * under the same name convention). */
  val DatumNad27: Datum = helmert(Clarke1866, -8.0, 160.0, 176.0,
    grid = Some("ntv2_0.gsb"))
  /** Tokyo→WGS84 translations. */
  val DatumTokyo: Datum = helmert(Bessel1841, -146.414, 507.337, 680.507)
  /** Belgium Datum 72→WGS84, position-vector parameter set. */
  val DatumBd72: Datum = helmert(Intl1924,
    -106.869, 52.2978, -103.724, 0.33657, -0.456955, 1.84218, -1.0)
  /** Makassar→WGS84 translations. */
  val DatumMakassar: Datum = helmert(Bessel1841, -587.8, 519.75, 145.76)
  /** Jamaica 1969→WGS84 translations. */
  val DatumJad69: Datum = helmert(Clarke1866, 70.0, 207.0, 389.5)
  /** CH1903→WGS84 (swisstopo official geocentric translations). */
  val DatumCh1903: Datum = helmert(Bessel1841, 674.374, 15.056, 405.346)
  /** S-JTSK→WGS84 translations (standard published set). */
  val DatumSJtsk: Datum = helmert(Bessel1841, 589.0, 76.0, 480.0)
  /** Timbalai 1948→WGS84 translations (standard published set). */
  val DatumTimbalai: Datum = helmert(Everest1967, -679.0, 669.0, -48.0)
  /** HD72→WGS84 translations (standard published set). */
  val DatumHd72: Datum = helmert(Grs67, 52.17, -71.82, -14.9)

  // ----------------------------------------------------------- projections

  /** A projection maps datum-local geographic degrees (Greenwich
    * longitudes — prime meridians are folded into `lon0`) to projected
    * (x, y) and back. `origin` is an in-domain anchor for tests. */
  sealed trait Projection {
    def forward(lonDeg: Double, latDeg: Double): (Double, Double)
    def inverse(x: Double, y: Double): (Double, Double)
    def origin: (Double, Double)
  }

  /** Geographic 2D CRS: projection is the identity on (lon, lat). */
  final case class Geographic() extends Projection {
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) =
      (lonDeg, latDeg)
    def inverse(x: Double, y: Double): (Double, Double) = (x, y)
    def origin: (Double, Double) = (0.0, 0.0)
  }

  // shared conformal/authalic helpers (Snyder 1987 notation)
  private def tSnyder(e: Double, phi: Double): Double =
    math.tan(math.Pi / 4 - phi / 2) /
      math.pow((1 - e * math.sin(phi)) / (1 + e * math.sin(phi)), e / 2)
  private def mSnyder(e2: Double, phi: Double): Double =
    math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
  private def qAuthalic(e: Double, e2: Double, phi: Double): Double = {
    val s = math.sin(phi)
    (1 - e2) * (s / (1 - e2 * s * s) -
      1 / (2 * e) * math.log((1 - e * s) / (1 + e * s)))
  }
  /** Geographic latitude from authalic latitude beta (Snyder eq. 3-18). */
  private def phiFromAuthalic(e2: Double, beta: Double): Double =
    beta +
      (e2 / 3 + 31 * e2 * e2 / 180 + 517 * math.pow(e2, 3) / 5040) *
        math.sin(2 * beta) +
      (23 * e2 * e2 / 360 + 251 * math.pow(e2, 3) / 3780) *
        math.sin(4 * beta) +
      (761 * math.pow(e2, 3) / 45360) * math.sin(6 * beta)
  /** Geographic latitude from conformal latitude chi (fixed point, same
    * iteration as Crs.phiFromConformal — private there). */
  private def phiFromChi(e: Double, chi: Double): Double = {
    val half = math.tan(math.Pi / 4 + chi / 2)
    var phi = chi
    var i = 0
    while (i < 10) {
      val es = e * math.sin(phi)
      phi = 2 * math.atan(half *
        math.pow((1 + es) / (1 - es), e / 2)) - math.Pi / 2
      i += 1
    }
    phi
  }

  /** Transverse Mercator with natural origin + offsets (EPSG 9807),
    * wrapping the shared Karney-series kernel. False northing is applied
    * at the latitude of natural origin. */
  final case class TmercProj(ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
                             k0: Double, fe: Double, fn: Double)
      extends Projection {
    private val kernel = new Crs.Tmerc(ell.a, ell.f)
    private val n0 =
      if (lat0Deg == 0.0) 0.0
      else kernel.forward(lon0Deg, k0, lon0Deg, lat0Deg)._2
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val (x, y) = kernel.forward(lon0Deg, k0, lonDeg, latDeg)
      (x + fe, y - n0 + fn)
    }
    def inverse(x: Double, y: Double): (Double, Double) =
      kernel.inverse(lon0Deg, k0, x - fe, y + n0 - fn)
    def origin: (Double, Double) = (lon0Deg, if (lat0Deg == 0) 30.0 else lat0Deg)
  }

  /** Lambert Conformal Conic 1SP (EPSG 9801), Snyder eqs. 15-1..15-11
    * with n = sin(lat0) and the point scale k0 at the single parallel. */
  final case class Lcc1SP(ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
                          k0: Double, fe: Double, fn: Double)
      extends Projection {
    private val e2 = ell.f * (2 - ell.f)
    private val e = math.sqrt(e2)
    private val lat0 = math.toRadians(lat0Deg)
    private val lon0 = math.toRadians(lon0Deg)
    private val n = math.sin(lat0)
    private val bigF = mSnyder(e2, lat0) / (n * math.pow(tSnyder(e, lat0), n))
    private val rho0 = ell.a * bigF * math.pow(tSnyder(e, lat0), n) * k0
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val rho =
        ell.a * bigF * math.pow(tSnyder(e, math.toRadians(latDeg)), n) * k0
      val th = n * (math.toRadians(lonDeg) - lon0)
      (fe + rho * math.sin(th), fn + rho0 - rho * math.cos(th))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe; val dy = rho0 - (y - fn)
      val rho = math.signum(n) * math.hypot(dx, dy)
      val th = math.atan2(math.signum(n) * dx, math.signum(n) * dy)
      val tt = math.pow(rho / (ell.a * bigF * k0), 1 / n)
      val chi = math.Pi / 2 - 2 * math.atan(tt)
      (math.toDegrees(th / n + lon0), math.toDegrees(phiFromChi(e, chi)))
    }
    def origin: (Double, Double) = (lon0Deg, lat0Deg)
  }

  /** Wrapper giving [[Crs.Lcc2SP]] a [[Projection]] face. */
  final case class Lcc2SPProj(ell: Ellipsoid, lat1Deg: Double, lat2Deg: Double,
                              lat0Deg: Double, lon0Deg: Double,
                              fe: Double, fn: Double) extends Projection {
    private val kernel = new Crs.Lcc2SP(ell.a, ell.f, lat1Deg, lat2Deg,
      lat0Deg, lon0Deg, fe, fn)
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) =
      kernel.forward(lonDeg, latDeg)
    def inverse(x: Double, y: Double): (Double, Double) = kernel.inverse(x, y)
    def origin: (Double, Double) = (lon0Deg, (lat1Deg + lat2Deg) / 2)
  }

  /** Albers Equal Area (EPSG 9822), Snyder eqs. 14-1..14-21 ellipsoidal. */
  final case class Albers(ell: Ellipsoid, lat1Deg: Double, lat2Deg: Double,
                          lat0Deg: Double, lon0Deg: Double,
                          fe: Double, fn: Double) extends Projection {
    private val e2 = ell.f * (2 - ell.f)
    private val e = math.sqrt(e2)
    private val lat1 = math.toRadians(lat1Deg)
    private val lat2 = math.toRadians(lat2Deg)
    private val lat0 = math.toRadians(lat0Deg)
    private val lon0 = math.toRadians(lon0Deg)
    private val m1 = mSnyder(e2, lat1)
    private val m2 = mSnyder(e2, lat2)
    private val q1 = qAuthalic(e, e2, lat1)
    private val q2 = qAuthalic(e, e2, lat2)
    private val n = (m1 * m1 - m2 * m2) / (q2 - q1)
    private val c = m1 * m1 + n * q1
    private def rho(q: Double): Double = ell.a * math.sqrt(c - n * q) / n
    private val rho0 = rho(qAuthalic(e, e2, lat0))
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val r = rho(qAuthalic(e, e2, math.toRadians(latDeg)))
      val th = n * (math.toRadians(lonDeg) - lon0)
      (fe + r * math.sin(th), fn + rho0 - r * math.cos(th))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe; val dy = rho0 - (y - fn)
      val r = math.signum(n) * math.hypot(dx, dy)
      val th = math.atan2(math.signum(n) * dx, math.signum(n) * dy)
      val q = (c - r * r * n * n / (ell.a * ell.a)) / n
      val qp = qAuthalic(e, e2, math.Pi / 2)
      val beta = math.asin(math.max(-1.0, math.min(1.0, q / qp)))
      (math.toDegrees(th / n + lon0),
       math.toDegrees(phiFromAuthalic(e2, beta)))
    }
    def origin: (Double, Double) = (lon0Deg, (lat1Deg + lat2Deg) / 2)
  }

  /** Mercator variant A (EPSG 9804): scale k0 at the equator. Covers
    * variant B too (construct with k0 = m(latTs)). */
  final case class MercatorA(ell: Ellipsoid, lon0Deg: Double, k0: Double,
                             fe: Double, fn: Double) extends Projection {
    private val e2 = ell.f * (2 - ell.f)
    private val e = math.sqrt(e2)
    private val lon0 = math.toRadians(lon0Deg)
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      (fe + ell.a * k0 * (math.toRadians(lonDeg) - lon0),
       fn - ell.a * k0 * math.log(tSnyder(e, phi)))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val chi = math.Pi / 2 -
        2 * math.atan(math.exp(-(y - fn) / (ell.a * k0)))
      (math.toDegrees((x - fe) / (ell.a * k0) + lon0),
       math.toDegrees(phiFromChi(e, chi)))
    }
    def origin: (Double, Double) = (lon0Deg, 10.0)
  }

  /** Polar Stereographic (EPSG 9810 variant A via `k0`; 9829 variant B via
    * [[PolarStereo.fromLatTs]]). `north` selects the aspect. */
  final case class PolarStereo(ell: Ellipsoid, north: Boolean, lon0Deg: Double,
                               k0: Double, fe: Double, fn: Double)
      extends Projection {
    private val e2 = ell.f * (2 - ell.f)
    private val e = math.sqrt(e2)
    private val lon0 = math.toRadians(lon0Deg)
    // sqrt((1+e)^(1+e) (1-e)^(1-e)) — the rho denominator (GN7-2)
    private val pole =
      math.sqrt(math.pow(1 + e, 1 + e) * math.pow(1 - e, 1 - e))
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phiA = if (north) math.toRadians(latDeg) else -math.toRadians(latDeg)
      val lamA = if (north) math.toRadians(lonDeg) - lon0
                 else -(math.toRadians(lonDeg) - lon0)
      val rho = 2 * ell.a * k0 * tSnyder(e, phiA) / pole
      val x = rho * math.sin(lamA)
      val y = -rho * math.cos(lamA)
      if (north) (fe + x, fn + y) else (fe - x, fn - y)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val (dx, dy) = if (north) (x - fe, y - fn) else (-(x - fe), -(y - fn))
      val rho = math.hypot(dx, dy)
      val tt = rho * pole / (2 * ell.a * k0)
      val chi = math.Pi / 2 - 2 * math.atan(tt)
      val phiA = if (rho < 1e-12) math.Pi / 2 else phiFromChi(e, chi)
      val lamA = if (rho < 1e-12) 0.0 else math.atan2(dx, -dy)
      if (north) (math.toDegrees(lamA + lon0), math.toDegrees(phiA))
      else (math.toDegrees(lon0 - lamA), -math.toDegrees(phiA))
    }
    def origin: (Double, Double) = (lon0Deg, if (north) 80.0 else -80.0)
  }
  object PolarStereo {
    /** Variant B: standard parallel instead of k0 (GN7-2: k0 derived from
      * the scale at latTs). */
    def fromLatTs(ell: Ellipsoid, latTsDeg: Double, lon0Deg: Double,
                  fe: Double, fn: Double): PolarStereo = {
      val e2 = ell.f * (2 - ell.f)
      val e = math.sqrt(e2)
      val phiF = math.toRadians(math.abs(latTsDeg))
      val mF = mSnyder(e2, phiF)
      val tF = tSnyder(e, phiF)
      val pole =
        math.sqrt(math.pow(1 + e, 1 + e) * math.pow(1 - e, 1 - e))
      val k0 = mF * pole / (2 * tF)
      PolarStereo(ell, north = latTsDeg >= 0, lon0Deg, k0, fe, fn)
    }
  }

  /** Oblique Stereographic (EPSG 9809) on the conformal sphere — the
    * IOGP GN7-2 formulation used by Dutch RD New. */
  final case class ObliqueStereo(ell: Ellipsoid, lat0Deg: Double,
                                 lon0Deg: Double, k0: Double,
                                 fe: Double, fn: Double) extends Projection {
    private val e2 = ell.f * (2 - ell.f)
    private val e = math.sqrt(e2)
    private val phi0 = math.toRadians(lat0Deg)
    private val lam0 = math.toRadians(lon0Deg)
    private val s0 = math.sin(phi0)
    private val rho0 = ell.a * (1 - e2) /
      math.pow(1 - e2 * s0 * s0, 1.5)
    private val nu0 = ell.a / math.sqrt(1 - e2 * s0 * s0)
    private val bigR = math.sqrt(rho0 * nu0)
    private val n = math.sqrt(1 + e2 * math.pow(math.cos(phi0), 4) / (1 - e2))
    private val w1 = math.pow(
      (1 + s0) / (1 - s0) * math.pow((1 - e * s0) / (1 + e * s0), e), n)
    private val sinChi00 = (w1 - 1) / (w1 + 1)
    private val cc = (n + s0) * (1 - sinChi00) / ((n - s0) * (1 + sinChi00))
    private val w2 = cc * w1
    private val chi0 = math.asin((w2 - 1) / (w2 + 1))
    private val lamC0 = lam0 // Lambda0 = n(lam0 - lam0) + lam0

    private def chiLambda(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val s = math.sin(phi)
      val w = cc * math.pow(
        (1 + s) / (1 - s) * math.pow((1 - e * s) / (1 + e * s), e), n)
      val chi = math.asin((w - 1) / (w + 1))
      val lambda = n * (math.toRadians(lonDeg) - lam0) + lamC0
      (chi, lambda)
    }
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val (chi, lambda) = chiLambda(lonDeg, latDeg)
      val b = 1 + math.sin(chi) * math.sin(chi0) +
        math.cos(chi) * math.cos(chi0) * math.cos(lambda - lamC0)
      (fe + 2 * bigR * k0 * math.cos(chi) * math.sin(lambda - lamC0) / b,
       fn + 2 * bigR * k0 * (math.sin(chi) * math.cos(chi0) -
         math.cos(chi) * math.sin(chi0) * math.cos(lambda - lamC0)) / b)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe; val dy = y - fn
      val g = 2 * bigR * k0 * math.tan(math.Pi / 4 - chi0 / 2)
      val h = 4 * bigR * k0 * math.tan(chi0) + g
      val i = math.atan(dx / (h + dy))
      val j = math.atan(dx / (g - dy)) - i
      val chi = chi0 + 2 * math.atan((dy - dx * math.tan(j / 2)) /
        (2 * bigR * k0))
      val lambda = j + 2 * i + lamC0
      val lon = math.toDegrees((lambda - lamC0) / n + lam0)
      // isometric-latitude fixed point (GN7-2): psi from chi, then phi
      val psi0 = 0.5 *
        math.log((1 + math.sin(chi)) / (cc * (1 - math.sin(chi)))) / n
      var phi = 2 * math.atan(math.exp(psi0)) - math.Pi / 2
      var it = 0
      while (it < 12) {
        val s = math.sin(phi)
        val psiI = math.log(math.tan(phi / 2 + math.Pi / 4) *
          math.pow((1 - e * s) / (1 + e * s), e / 2))
        phi = phi - (psiI - psi0) * math.cos(phi) * (1 - e2 * s * s) / (1 - e2)
        it += 1
      }
      (lon, math.toDegrees(phi))
    }
    def origin: (Double, Double) = (lon0Deg, lat0Deg)
  }

  /** Lambert Cylindrical Equal Area (EPSG 9835), Snyder eqs. 10-1,
    * 10-2, 10-6, 10-26. */
  final case class CylEqualArea(ell: Ellipsoid, latTsDeg: Double,
                                lon0Deg: Double, fe: Double, fn: Double)
      extends Projection {
    private val e2 = ell.f * (2 - ell.f)
    private val e = math.sqrt(e2)
    private val lon0 = math.toRadians(lon0Deg)
    private val latTs = math.toRadians(latTsDeg)
    private val k0 = mSnyder(e2, latTs)
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) =
      (fe + ell.a * k0 * (math.toRadians(lonDeg) - lon0),
       fn + ell.a * qAuthalic(e, e2, math.toRadians(latDeg)) / (2 * k0))
    def inverse(x: Double, y: Double): (Double, Double) = {
      val qp = qAuthalic(e, e2, math.Pi / 2)
      val q = 2 * (y - fn) * k0 / ell.a
      val beta = math.asin(math.max(-1.0, math.min(1.0, q / qp)))
      (math.toDegrees((x - fe) / (ell.a * k0) + lon0),
       math.toDegrees(phiFromAuthalic(e2, beta)))
    }
    def origin: (Double, Double) = (lon0Deg, 10.0)
  }

  /** Hotine Oblique Mercator (EPSG 9812 variant A / 9815 variant B) —
    * the IOGP GN7-2 formulation. Variant A references the projection's
    * NATURAL origin (FE/FN applied there, `variantB = false`); variant B
    * references the projection CENTRE (Ec/Nc applied there, the grid
    * coordinates reduced by uc). Covers Borneo RSO (the GN7-2 worked
    * example), Swiss LV03 / Hungarian EOV (the αc = 90° special case),
    * and Michigan GeoRef (variant A). */
  final case class ObliqueMerc(ell: Ellipsoid, latCDeg: Double,
                               lonCDeg: Double, alphaCDeg: Double,
                               gammaCDeg: Double, kc: Double,
                               eOff: Double, nOff: Double,
                               variantB: Boolean) extends Projection {
    private val e2 = ell.f * (2 - ell.f)
    private val e = math.sqrt(e2)
    private val phiC = math.toRadians(latCDeg)
    private val lamC = math.toRadians(lonCDeg)
    private val alphaC = math.toRadians(alphaCDeg)
    private val gammaC = math.toRadians(gammaCDeg)
    private val sC = math.sin(phiC)
    private val bigB =
      math.sqrt(1 + e2 * math.pow(math.cos(phiC), 4) / (1 - e2))
    private val bigA = ell.a * bigB * kc * math.sqrt(1 - e2) /
      (1 - e2 * sC * sC)
    private val t0 = tSnyder(e, phiC)
    private val bigD = bigB * math.sqrt(1 - e2) /
      (math.cos(phiC) * math.sqrt(1 - e2 * sC * sC))
    private val d2 = math.max(1.0, bigD * bigD)
    private val bigF = bigD + math.sqrt(d2 - 1) * math.signum(phiC)
    private val bigH = bigF * math.pow(t0, bigB)
    private val bigG = (bigF - 1 / bigF) / 2
    private val gamma0 = math.asin(math.sin(alphaC) / bigD)
    private val lam0 = lamC - math.asin(bigG * math.tan(gamma0)) / bigB
    // variant B's u at the projection centre (GN7-2: the αc = 90° case —
    // Switzerland, Hungary — replaces the atan form, whose cos αc = 0)
    private val uC =
      if (!variantB) 0.0
      else if (math.abs(math.cos(alphaC)) < 1e-12) bigA * (lamC - lam0)
      else (bigA / bigB) *
        math.atan2(math.sqrt(d2 - 1), math.cos(alphaC)) * math.signum(phiC)
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val t = tSnyder(e, math.toRadians(latDeg))
      val bigQ = bigH / math.pow(t, bigB)
      val bigS = (bigQ - 1 / bigQ) / 2
      val bigT = (bigQ + 1 / bigQ) / 2
      val dl = bigB * (math.toRadians(lonDeg) - lam0)
      val bigV = math.sin(dl)
      val bigU = (-bigV * math.cos(gamma0) + bigS * math.sin(gamma0)) / bigT
      val v = bigA * math.log((1 - bigU) / (1 + bigU)) / (2 * bigB)
      val u = (bigA / bigB) * math.atan2(
        bigS * math.cos(gamma0) + bigV * math.sin(gamma0), math.cos(dl)) - uC
      (v * math.cos(gammaC) + u * math.sin(gammaC) + eOff,
       u * math.cos(gammaC) - v * math.sin(gammaC) + nOff)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val vP = (x - eOff) * math.cos(gammaC) - (y - nOff) * math.sin(gammaC)
      val uP = (y - nOff) * math.cos(gammaC) + (x - eOff) * math.sin(gammaC) +
        uC
      val bigQ = math.exp(-bigB * vP / bigA)
      val bigS = (bigQ - 1 / bigQ) / 2
      val bigT = (bigQ + 1 / bigQ) / 2
      val bigV = math.sin(bigB * uP / bigA)
      val bigU = (bigV * math.cos(gamma0) + bigS * math.sin(gamma0)) / bigT
      val t = math.pow(
        bigH / math.sqrt((1 + bigU) / (1 - bigU)), 1 / bigB)
      val chi = math.Pi / 2 - 2 * math.atan(t)
      val lam = lam0 - math.atan2(
        bigS * math.cos(gamma0) - bigV * math.sin(gamma0),
        math.cos(bigB * uP / bigA)) / bigB
      (math.toDegrees(lam), math.toDegrees(phiFromChi(e, chi)))
    }
    def origin: (Double, Double) = (lonCDeg, latCDeg)
  }

  /** Krovak (EPSG 9819) — the IOGP GN7-2 formulation for S-JTSK: a
    * conformal double projection onto an oblique cone. `forward` returns
    * the GIS-friendly Krovak East/North axes (EPSG 5514: E = -Westing,
    * N = -Southing); [[lookup]] registers 5513 (axes Southing/Westing)
    * through the same kernel with negated outputs. `lon0Deg` is the
    * longitude of origin ALREADY reduced to Greenwich (EPSG defines it
    * as 42°30' east of Ferro = 24°50' east of Greenwich). */
  final case class Krovak(ell: Ellipsoid, latCDeg: Double, lon0Deg: Double,
                          alphaCDeg: Double, latPDeg: Double, kp: Double,
                          fe: Double, fn: Double, eastNorth: Boolean)
      extends Projection {
    private val e2 = ell.f * (2 - ell.f)
    private val e = math.sqrt(e2)
    private val phiC = math.toRadians(latCDeg)
    private val lam0 = math.toRadians(lon0Deg)
    private val alphaC = math.toRadians(alphaCDeg)
    private val phiP = math.toRadians(latPDeg)
    private val sC = math.sin(phiC)
    private val bigA = ell.a * math.sqrt(1 - e2) / (1 - e2 * sC * sC)
    private val bigB =
      math.sqrt(1 + e2 * math.pow(math.cos(phiC), 4) / (1 - e2))
    private val gamma0 = math.asin(sC / bigB)
    private val t0 = math.tan(math.Pi / 4 + gamma0 / 2) *
      math.pow((1 + e * sC) / (1 - e * sC), e * bigB / 2) /
      math.pow(math.tan(math.Pi / 4 + phiC / 2), bigB)
    private val n = math.sin(phiP)
    private val r0 = kp * bigA / math.tan(phiP)
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val s = math.sin(phi)
      val bigU = 2 * (math.atan(
        t0 * math.pow(math.tan(phi / 2 + math.Pi / 4), bigB) /
          math.pow((1 + e * s) / (1 - e * s), e * bigB / 2)) - math.Pi / 4)
      val bigV = bigB * (lam0 - math.toRadians(lonDeg))
      val bigT = math.asin(math.cos(alphaC) * math.sin(bigU) +
        math.sin(alphaC) * math.cos(bigU) * math.cos(bigV))
      val bigD = math.asin(math.cos(bigU) * math.sin(bigV) / math.cos(bigT))
      val theta = n * bigD
      val r = r0 * math.pow(math.tan(math.Pi / 4 + phiP / 2), n) /
        math.pow(math.tan(bigT / 2 + math.Pi / 4), n)
      val southing = r * math.cos(theta) + fn
      val westing = r * math.sin(theta) + fe
      if (eastNorth) (-westing, -southing) else (southing, westing)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val (southing, westing) =
        if (eastNorth) (-y, -x) else (x, y)
      val xP = southing - fn
      val yP = westing - fe
      val r = math.hypot(xP, yP)
      val theta = math.atan2(yP, xP)
      val bigD = theta / n
      val bigT = 2 * (math.atan(
        math.pow(r0 / r, 1 / n) * math.tan(math.Pi / 4 + phiP / 2)) -
        math.Pi / 4)
      val bigU = math.asin(math.cos(alphaC) * math.sin(bigT) -
        math.sin(alphaC) * math.cos(bigT) * math.cos(bigD))
      val bigV = math.asin(math.cos(bigT) * math.sin(bigD) / math.cos(bigU))
      val lon = math.toDegrees(lam0 - bigV / bigB)
      // fixed point for phi (GN7-2), starting at U
      var phi = bigU
      var i = 0
      while (i < 12) {
        val s = math.sin(phi)
        phi = 2 * (math.atan(
          math.pow(t0, -1 / bigB) *
            math.pow(math.tan(bigU / 2 + math.Pi / 4), 1 / bigB) *
            math.pow((1 + e * s) / (1 - e * s), e / 2)) - math.Pi / 4)
        i += 1
      }
      (lon, math.toDegrees(phi))
    }
    def origin: (Double, Double) = (17.0, 49.8)
  }

  /** Wrapper giving [[Crs.Laea]] a [[Projection]] face. */
  final case class LaeaProj(ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
                            fe: Double, fn: Double) extends Projection {
    private val kernel = new Crs.Laea(ell.a, ell.f, lat0Deg, lon0Deg, fe, fn)
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) =
      kernel.forward(lonDeg, latDeg)
    def inverse(x: Double, y: Double): (Double, Double) = kernel.inverse(x, y)
    def origin: (Double, Double) = (lon0Deg, lat0Deg)
  }

  // ------------------------------------------------------------- registry

  final case class CrsDef(datum: Datum, proj: Projection)

  /** Paris prime meridian (2°20'14.025" E of Greenwich = 2.5969213 grads
    * exactly); folded into lon0 for the NTF Lambert zones. */
  val ParisPm: Double = 2.337229166666667

  /** French NTF Lambert zones I-IV (LCC 1SP on Clarke 1880 IGN, Paris
    * meridian): (lat0, k0, FE, FN-nord). Zone grads → degrees published. */
  private def frenchLambert(zone: Int, carto: Boolean): CrsDef = {
    val (lat0, k0, fe, fn) = zone match {
      case 1 => (49.5, 0.999877341, 600000.0, 200000.0)
      case 2 => (46.8, 0.99987742, 600000.0, 200000.0)
      case 3 => (44.1, 0.999877499, 600000.0, 200000.0)
      case 4 => (42.165, 0.99994471, 234.358, 185861.369)
      case z => throw new IllegalArgumentException(s"Lambert zone $z")
    }
    val fnUse = if (carto) fn + zone * 1000000.0 else fn
    CrsDef(DatumNtf,
      Lcc1SP(Clarke1880Ign, lat0, ParisPm, k0, fe, fnUse))
  }

  /** EPSG code → CRS definition, or None if unsupported. Geographic codes
    * return a [[Geographic]] projection (coords stay lon/lat degrees on
    * the local datum). */
  def lookup(srid: Int): Option[CrsDef] = {
    val d: CrsDef = srid match {
      // geographic 2D CRS
      case 4326 => CrsDef(DatumWgs84, Geographic())
      case 4258 | 4171 | 4269 | 4283 | 4167 | 4151 =>
        CrsDef(DatumGrs80, Geographic()) // ETRS89/RGF93/NAD83/GDA94/NZGD2000/CHTRS95
      case 4277 => CrsDef(DatumOsgb36, Geographic())
      case 4267 => CrsDef(DatumNad27, Geographic())
      case 4230 => CrsDef(DatumEd50, Geographic())
      case 4314 => CrsDef(DatumDhdn, Geographic())
      case 4275 => CrsDef(DatumNtf, Geographic())
      case 4289 => CrsDef(DatumAmersfoort, Geographic())
      case 4313 => CrsDef(DatumBd72, Geographic())
      case 4301 => CrsDef(DatumTokyo, Geographic())
      case 4149 => CrsDef(DatumCh1903, Geographic())
      case 4156 => CrsDef(DatumSJtsk, Geographic())
      case 4298 => CrsDef(DatumTimbalai, Geographic())
      case 4237 => CrsDef(DatumHd72, Geographic())
      // world Mercator
      case 3395 => CrsDef(DatumWgs84, MercatorA(Wgs84, 0.0, 1.0, 0.0, 0.0))
      // Makassar / NEIEZ (GN7-2 Mercator-A worked example)
      case 3002 => CrsDef(DatumMakassar,
        MercatorA(Bessel1841, 110.0, 0.997, 3900000.0, 900000.0))
      // Jamaica 1969 National Grid (GN7-2 LCC-1SP worked example)
      case 24200 => CrsDef(DatumJad69,
        Lcc1SP(Clarke1866, 18.0, -77.0, 1.0, 250000.0, 150000.0))
      // French NTF Lambert zones (nord / carto false northings)
      case z if z >= 27561 && z <= 27564 => frenchLambert(z - 27560, carto = false)
      case z if z >= 27571 && z <= 27574 => frenchLambert(z - 27570, carto = true)
      // Amersfoort / RD New (GN7-2 Oblique Stereographic worked example)
      case 28992 => CrsDef(DatumAmersfoort,
        ObliqueStereo(Bessel1841, 52.15616055555556, 5.387638888888889,
          0.9999079, 155000.0, 463000.0))
      // Belgian Lambert 72 (LCC 2SP with lat0 at the pole)
      case 31370 => CrsDef(DatumBd72,
        Lcc2SPProj(Intl1924, 51.16666723, 49.8333339, 90.0,
          4.367486666666666, 150000.013, 5400088.438))
      // DHDN Gauss-Krüger zones 2-5
      case z if z >= 31466 && z <= 31469 =>
        val zone = z - 31464 // 31466 → zone 2
        CrsDef(DatumDhdn, TmercProj(Bessel1841, 0.0, zone * 3.0, 1.0,
          zone * 1000000.0 + 500000.0, 0.0))
      // NZGD2000 / NZTM
      case 2193 => CrsDef(DatumGrs80,
        TmercProj(Grs80, 0.0, 173.0, 0.9996, 1600000.0, 10000000.0))
      // Irish Transverse Mercator (ITM)
      case 2157 => CrsDef(DatumGrs80,
        TmercProj(Grs80, 53.5, -8.0, 0.99982, 600000.0, 750000.0))
      // GDA94 / MGA zones 48-58
      case z if z >= 28348 && z <= 28358 =>
        CrsDef(DatumGrs80, TmercProj(Grs80, 0.0, (z - 28300) * 6 - 183, 0.9996,
          500000.0, 10000000.0))
      // WGS84 / UTM north 1-60 and south 1-60 — registry-side twins of
      // the Crs.transform special-case path (same etmerc kernel, so
      // they agree to the nanometer; having them HERE makes every UTM
      // code a transformBetween pivot and a forward/inverse citizen)
      case z if z >= 32601 && z <= 32660 =>
        CrsDef(DatumWgs84, TmercProj(Wgs84, 0.0, (z - 32600) * 6 - 183,
          0.9996, 500000.0, 0.0))
      case z if z >= 32701 && z <= 32760 =>
        CrsDef(DatumWgs84, TmercProj(Wgs84, 0.0, (z - 32700) * 6 - 183,
          0.9996, 500000.0, 10000000.0))
      // GDA2020 / MGA zones 46-58: identical grid to GDA94 / MGA (the
      // ~1.8 m plate-motion datum difference is below the no-grid
      // Helmert accuracy class both are served at — see DatumGrs80 note)
      case z if z >= 7846 && z <= 7858 =>
        CrsDef(DatumGrs80, TmercProj(Grs80, 0.0, (z - 7800) * 6 - 183,
          0.9996, 500000.0, 10000000.0))
      // NAD83 / UTM north zones 1-23
      case z if z >= 26901 && z <= 26923 =>
        CrsDef(DatumGrs80, TmercProj(Grs80, 0.0, (z - 26900) * 6 - 183, 0.9996,
          500000.0, 0.0))
      // NAD83 State Plane (meter-based SPCS83 codes) — the LCC-2SP tier
      // real US users hit first. Parameters are the published SPCS83
      // defining constants; the false origin (lon0, lat0) -> (FE, FN)
      // identity is exact by construction and pinned in CrsRegistrySpec.
      case 26943 => CrsDef(DatumGrs80, Lcc2SPProj(Grs80, // California zone 3
        38.43333333333333, 37.06666666666667, 36.5, -120.5,
        2000000.0, 500000.0))
      case 26954 => CrsDef(DatumGrs80, Lcc2SPProj(Grs80, // Colorado Central
        39.75, 38.45, 37.833333333333336, -105.5,
        914401.8288036576, 304800.6096012192))
      case 26986 => CrsDef(DatumGrs80, Lcc2SPProj(Grs80, // Massachusetts Mainland
        42.68333333333333, 41.71666666666667, 41.0, -71.5,
        200000.0, 750000.0))
      case 32118 => CrsDef(DatumGrs80, Lcc2SPProj(Grs80, // New York Long Island
        41.03333333333333, 40.666666666666664, 40.166666666666664, -74.0,
        300000.0, 0.0))
      // NAD83 State Plane TM tier — Arizona East/Central/West (meters,
      // FE = 213360 m = 700000 international feet). Scale reductions
      // differ per zone: East/Central 1:10000 (k0 = 0.9999), West
      // 1:15000 (k0 = 0.999933...) — SPCS83 defining constants.
      case 26948 => CrsDef(DatumGrs80,
        TmercProj(Grs80, 31.0, -110.16666666666667, 0.9999, 213360.0, 0.0))
      case 26949 => CrsDef(DatumGrs80,
        TmercProj(Grs80, 31.0, -111.91666666666667, 0.9999, 213360.0, 0.0))
      case 26950 => CrsDef(DatumGrs80,
        TmercProj(Grs80, 31.0, -113.75, 0.9999333333333333, 213360.0, 0.0))
      // NAD27 / UTM north zones 3-22
      case z if z >= 26703 && z <= 26722 =>
        CrsDef(DatumNad27, TmercProj(Clarke1866, 0.0, (z - 26700) * 6 - 183,
          0.9996, 500000.0, 0.0))
      // ED50 / UTM zones 28-38
      case z if z >= 23028 && z <= 23038 =>
        CrsDef(DatumEd50, TmercProj(Intl1924, 0.0, (z - 23000) * 6 - 183,
          0.9996, 500000.0, 0.0))
      // polar stereographic family
      case 3031 => CrsDef(DatumWgs84,
        PolarStereo.fromLatTs(Wgs84, -71.0, 0.0, 0.0, 0.0))
      case 3032 => CrsDef(DatumWgs84,
        PolarStereo.fromLatTs(Wgs84, -71.0, 70.0, 6000000.0, 6000000.0))
      case 3413 => CrsDef(DatumWgs84,
        PolarStereo.fromLatTs(Wgs84, 70.0, -45.0, 0.0, 0.0))
      case 3976 => CrsDef(DatumWgs84,
        PolarStereo.fromLatTs(Wgs84, -70.0, 0.0, 0.0, 0.0))
      case 32661 => CrsDef(DatumWgs84,
        PolarStereo(Wgs84, north = true, 0.0, 0.994, 2000000.0, 2000000.0))
      case 32761 => CrsDef(DatumWgs84,
        PolarStereo(Wgs84, north = false, 0.0, 0.994, 2000000.0, 2000000.0))
      // Hotine Oblique Mercator family
      // Timbalai 1948 / RSO Borneo (m) — the GN7-2 variant-B example
      case 29873 => CrsDef(DatumTimbalai, ObliqueMerc(Everest1967,
        4.0, 115.0,
        53.0 + 18.0 / 60 + 56.9537 / 3600,   // azimuth of initial line
        53.0 + 7.0 / 60 + 48.3685 / 3600,    // rectified-to-skew angle
        0.99984, 590476.87, 442857.65, variantB = true))
      // CH1903 / LV03 — the αc = 90° special case (EPSG models the Swiss
      // double projection as HOM variant B; agreement is sub-mm)
      case 21781 => CrsDef(DatumCh1903, ObliqueMerc(Bessel1841,
        46.0 + 57.0 / 60 + 8.66 / 3600, 7.0 + 26.0 / 60 + 22.5 / 3600,
        90.0, 90.0, 1.0, 600000.0, 200000.0, variantB = true))
      // CH1903+ / LV95 — LV03 shifted to the (2.6M, 1.2M) false origin;
      // the published Helmert set (674.374/15.056/405.346, the Bern
      // parameters) is the CH1903+ one the registry already carries
      case 2056 => CrsDef(DatumCh1903, ObliqueMerc(Bessel1841,
        46.0 + 57.0 / 60 + 8.66 / 3600, 7.0 + 26.0 / 60 + 22.5 / 3600,
        90.0, 90.0, 1.0, 2600000.0, 1200000.0, variantB = true))
      // NAD83 / Alaska zone 1 (SPCS83) — variant A, the negative-azimuth
      // case (αc = γc = -36°52'11.6315", the published sexagesimal —
      // atan(-3/4) differs in the 8th decimal)
      case 26931 => CrsDef(DatumGrs80, ObliqueMerc(Grs80,
        57.0, -133.66666666666667,
        -(36.0 + 52.0 / 60 + 11.6315 / 3600),
        -(36.0 + 52.0 / 60 + 11.6315 / 3600),
        0.9999, 5000000.0, -5000000.0, variantB = false))
      // GDM2000 RSO grids (GDM2000 is WGS84-coincident) — variant A
      case 3375 => CrsDef(DatumGrs80, ObliqueMerc(Grs80, // Peninsular RSO
        4.0, 102.25,
        323.0 + 1.0 / 60 + 32.8467 / 3600,   // azimuth of initial line
        323.0 + 7.0 / 60 + 48.3685 / 3600,   // rectified-to-skew angle
        0.99984, 804671.0, 0.0, variantB = false))
      case 3376 => CrsDef(DatumGrs80, ObliqueMerc(Grs80, // East Malaysia BRSO
        4.0, 115.0,
        53.0 + 18.0 / 60 + 56.9537 / 3600,
        53.0 + 7.0 / 60 + 48.3685 / 3600,
        0.99984, 0.0, 0.0, variantB = false))
      // HD72 / EOV (Hungary) — the other national αc = 90° HOM-B grid
      case 23700 => CrsDef(DatumHd72, ObliqueMerc(Grs67,
        47.0 + 8.0 / 60 + 39.8174 / 3600, 19.0 + 2.0 / 60 + 54.8584 / 3600,
        90.0, 90.0, 0.99993, 650000.0, 200000.0, variantB = true))
      // NAD83 / Michigan Oblique Mercator — variant A (FE/FN at the
      // natural origin, no uc reduction)
      case 3078 => CrsDef(DatumGrs80, ObliqueMerc(Grs80,
        45.30916666666666, -86.0, 337.25556, 337.25556,
        0.9996, 2546731.496, -4354009.816, variantB = false))
      // Krovak (S-JTSK): 5514 = GIS East/North axes, 5513 = Southing/
      // Westing axes; lon0 = 42°30' E of Ferro = 24°50' E of Greenwich
      case 5514 => CrsDef(DatumSJtsk, Krovak(Bessel1841,
        49.5, 24.0 + 50.0 / 60, 30.0 + 17.0 / 60 + 17.3031 / 3600,
        78.5, 0.9999, 0.0, 0.0, eastNorth = true))
      case 5513 => CrsDef(DatumSJtsk, Krovak(Bessel1841,
        49.5, 24.0 + 50.0 / 60, 30.0 + 17.0 / 60 + 17.3031 / 3600,
        78.5, 0.9999, 0.0, 0.0, eastNorth = false))
      // equal-area family
      case 5070 => CrsDef(DatumGrs80,
        Albers(Grs80, 29.5, 45.5, 23.0, -96.0, 0.0, 0.0))
      case 3577 => CrsDef(DatumGrs80,
        Albers(Grs80, -18.0, -36.0, 0.0, 132.0, 0.0, 0.0))
      case 6933 => CrsDef(DatumWgs84, CylEqualArea(Wgs84, 30.0, 0.0, 0.0, 0.0))
      case _ => null
    }
    Option(d)
  }

  /** Local-datum → WGS84 geographic shift: NTv2 grid when the datum
    * names one, it is present in the session ([[GridStore]]) and covers
    * the point; else the published Helmert; else identity. */
  private[core] def datumToWgs(d: Datum, lon: Double, lat: Double)
      : (Double, Double) =
    d.gridFile.flatMap(GridStore.find)
      .flatMap(_.forwardShift(lon, lat))
      .getOrElse(d.toWgs84 match {
        case Some(h) => h.shift(lon, lat)
        case None    => (lon, lat)
      })

  /** WGS84 → local-datum shift — grid inverse (fixed-point on the
    * forward field) with the same fallback order as [[datumToWgs]]. */
  private[core] def wgsToDatum(d: Datum, lon: Double, lat: Double)
      : (Double, Double) =
    d.gridFile.flatMap(GridStore.find)
      .flatMap(_.inverseShift(lon, lat))
      .getOrElse(d.toWgs84 match {
        case Some(h) => h.inverseShift(lon, lat)
        case None    => (lon, lat)
      })

  /** WGS84 lon/lat → projected coords in `srid` (datum shift + project). */
  def forward(srid: Int, lonWgs: Double, latWgs: Double)
      : Option[(Double, Double)] =
    lookup(srid).map { crs =>
      val (lon, lat) = wgsToDatum(crs.datum, lonWgs, latWgs)
      crs.proj.forward(lon, lat)
    }

  /** Projected coords in `srid` → WGS84 lon/lat. */
  def inverse(srid: Int, x: Double, y: Double): Option[(Double, Double)] =
    lookup(srid).map { crs =>
      val (lon, lat) = crs.proj.inverse(x, y)
      datumToWgs(crs.datum, lon, lat)
    }
}
