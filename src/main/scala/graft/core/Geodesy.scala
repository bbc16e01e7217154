package graft.core

/** Ellipsoidal (WGS84) geodesy for geodetic boxes — the math the
  * reference delegates to MEOS/PostGIS/GeographicLib (ref geodetic
  * `area`, src/geo/stbox_functions.cpp:443-465, golden
  * test/sql/stbox.test:84).
  *
  * A geodetic STBOX's spatial footprint is the quadrilateral bounded by
  * two meridians and the two GEODESICS joining its equal-latitude corner
  * pairs (meridian edges contribute no area). Rather than port
  * GeographicLib's series expansions, we evaluate the EXACT auxiliary-
  * sphere formulation (Karney 2013, "Algorithms for geodesics"):
  * a geodesic maps to a great circle in reduced latitude beta with
  *   sin(beta(sigma)) = cos(a0) sin(sigma)
  *   lambda = omega - f sin(a0) * I3(sigma),
  *   dI3/dsigma = (2-f) / (1 + (1-f) sqrt(1 + k^2 sin^2 sigma))
  * (k^2 = e'^2 cos^2 a0), and the area under a curve is
  *   c * Integral q(phi) dlambda,  q(phi) = sin(phi)/(1-e^2 sin^2 phi)
  *     + atanh(e sin(phi))/e,  c = a^2 (1-e^2)/2.
  * The node azimuth a0 of the symmetric equal-latitude edge is solved by
  * bisection; integrals by fixed 64-point Gauss-Legendre (integrands are
  * analytic — error is far below the 0.1 m^2 the golden corpus prints).
  */
object Geodesy {

  private[graft] var DebugRoot = false

  val A = 6378137.0
  val F = 1.0 / 298.257223563
  private val E2 = F * (2 - F)
  private val E = math.sqrt(E2)
  private val Ep2 = E2 / (1 - E2)
  private val C = A * A * (1 - E2) / 2

  /** Legendre nodes/weights on [-1, 1], n = 64 (computed once by Newton
    * on the Legendre recurrence — standard Golub-Welsch-free method). */
  private val (glX, glW): (Array[Double], Array[Double]) = {
    val n = 128
    val xs = new Array[Double](n)
    val ws = new Array[Double](n)
    var i = 0
    while (i < n) {
      var x = math.cos(math.Pi * (i + 0.75) / (n + 0.5))
      def legendreAndDeriv(xx: Double): (Double, Double) = {
        var p0 = 1.0; var p1 = xx
        var k = 2
        while (k <= n) {
          val p2 = ((2 * k - 1) * xx * p1 - (k - 1) * p0) / k
          p0 = p1; p1 = p2
          k += 1
        }
        (p1, n * (xx * p1 - p0) / (xx * xx - 1))
      }
      var it = 0
      while (it < 100) {
        val (p1, dp) = legendreAndDeriv(x)
        val dx = p1 / dp
        x -= dx
        if (math.abs(dx) < 1e-16) it = 100 else it += 1
      }
      // weight from the derivative AT the converged node (a stale dp from
      // the previous Newton iterate costs ~1e-8 relative on the weight)
      val (_, dpFinal) = legendreAndDeriv(x)
      xs(i) = x
      ws(i) = 2 / ((1 - x * x) * dpFinal * dpFinal)
      i += 1
    }
    (xs, ws)
  }

  private def integrate1(f: Double => Double, lo: Double, hi: Double): Double = {
    val mid = (lo + hi) / 2
    val half = (hi - lo) / 2
    var acc = 0.0
    var i = 0
    while (i < glX.length) {
      acc += glW(i) * f(mid + half * glX(i))
      i += 1
    }
    acc * half
  }

  /** Panelized Gauss-Legendre (split at the geodesic vertex + halves):
    * keeps the symmetric peak off panel interiors' edges. */
  private def integrate(f: Double => Double, lo: Double, hi: Double): Double = {
    val mid = (lo + hi) / 2
    integrate1(f, lo, (lo + mid) / 2) + integrate1(f, (lo + mid) / 2, mid) +
      integrate1(f, mid, (mid + hi) / 2) + integrate1(f, (mid + hi) / 2, hi)
  }

  /** Authalic-style area integrand primitive. */
  private def q(phi: Double): Double = {
    val s = math.sin(phi)
    s / (1 - E2 * s * s) + atanh(E * s) / E
  }

  // log1p form: the naive 0.5*ln((1+x)/(1-x)) loses ~eps/x relative
  // precision for the small x = e*sin(phi) this sees
  private def atanh(x: Double): Double = 0.5 * math.log1p(2 * x / (1 - x))

  /** Longitude swing of the symmetric geodesic edge with node azimuth a0
    * whose endpoints sit at reduced latitude beta0 > 0. */
  private def edgeLambda(a0: Double, beta0: Double): Double = {
    val s1 = math.asin(math.sin(beta0) / math.cos(a0))
    val s2 = math.Pi - s1
    val k2 = Ep2 * math.cos(a0) * math.cos(a0)
    val om1 = math.atan2(math.sin(a0) * math.sin(s1), math.cos(s1))
    val om2 = math.atan2(math.sin(a0) * math.sin(s2), math.cos(s2))
    val i3 = integrate(s => {
      val sn = math.sin(s)
      (2 - F) / (1 + (1 - F) * math.sqrt(1 + k2 * sn * sn))
    }, s1, s2)
    (om2 - om1) - F * math.sin(a0) * i3
  }

  /** Node azimuth a0 of the symmetric equal-latitude geodesic edge with
    * endpoints at reduced latitude beta0 and longitude swing dLam, by
    * bisection over the FULL range (eps, pi/2 - beta0 - eps): edgeLambda
    * decreases monotonically from ~pi (a0 -> 0: the edge grazes the
    * pole) to 0 (a0 -> pi/2 - beta0: the degenerate edge), so any
    * dLam in (0, pi) brackets. (A narrower lower bound once silently
    * pinned low-latitude wide edges — dLam near pi — to the bracket
    * endpoint.) */
  private[graft] def solveNodeAzimuth(beta0: Double, dLam: Double): Double = {
    var lo = 1e-15
    var hi = math.Pi / 2 - beta0 - 1e-15
    var it = 0
    while (it < 100) {
      val mid = (lo + hi) / 2
      if (edgeLambda(mid, beta0) > dLam) lo = mid else hi = mid
      it += 1
    }
    (lo + hi) / 2
  }

  private[graft] def edgeLambdaAt(beta0: Double, a0: Double): Double =
    edgeLambda(a0, beta0)

  /** c-normalized area between the equator and the geodesic joining
    * (phi0, 0) and (phi0, dLam), phi0 > 0, dLam < pi:
    * Integral q(phi) dlambda. */
  private[graft] def edgeQIntegral(phi0: Double, dLam: Double): Double = {
    if (phi0 == 0.0 || dLam == 0.0) return 0.0
    require(dLam < math.Pi,
      s"geodesic edge undefined for half-circumference swings (dLam=$dLam)")
    val beta0 = math.atan((1 - F) * math.tan(phi0))
    val a0 = solveNodeAzimuth(beta0, dLam)
    if (DebugRoot) println(f"[geodesy] a0($phi0%.6f) = $a0%.18f")
    // The integral is ill-conditioned IN a0 (dE/da0 ~ -150): a half-ulp
    // root error costs ~2e-14 on E. But dE/da0 = q(phi0) * dLambda/da0
    // exactly (endpoints sit at phi0), so adding the first-order endpoint
    // correction for the unmet longitude residual cancels the
    // sensitivity — the corrected value is flat to O(residual^2).
    val lamResidual = dLam - edgeLambda(a0, beta0)
    val s1 = math.asin(math.sin(beta0) / math.cos(a0))
    val s2 = math.Pi - s1
    val k2 = Ep2 * math.cos(a0) * math.cos(a0)
    val f2 = integrate(s => {
      val sn = math.sin(s)
      val ca = math.cos(a0)
      val omdot = math.sin(a0) / (1 - ca * ca * sn * sn)
      val lamdot = omdot -
        F * math.sin(a0) * (2 - F) / (1 + (1 - F) * math.sqrt(1 + k2 * sn * sn))
      val sb = ca * sn
      val phi = math.atan(sb / ((1 - F) * math.sqrt(1 - sb * sb)))
      q(phi) * lamdot
    }, s1, s2)
    f2 + q(phi0) * lamResidual
  }

  /** Area (m^2) of the geodetic rectangle [lonMin,lonMax]x[latMin,latMax]
    * (degrees), bounded by meridians and geodesics — the semantics of
    * MEOS `stbox_area(box, spheroid=true)`.
    *
    * Boxes spanning >= 180 deg of longitude are split at their midpoint
    * meridian and summed: a single equal-latitude geodesic edge is
    * undefined at half a circumference (it degenerates through the
    * pole), so each panel gets its own well-defined edges — the
    * polygon-with-intermediate-vertex interpretation. */
  def boxArea(lonMinDeg: Double, lonMaxDeg: Double,
              latMinDeg: Double, latMaxDeg: Double): Double = {
    val dLonDeg = lonMaxDeg - lonMinDeg
    if (dLonDeg >= 180.0) {
      val midDeg = lonMinDeg + dLonDeg / 2
      return boxArea(lonMinDeg, midDeg, latMinDeg, latMaxDeg) +
        boxArea(midDeg, lonMaxDeg, latMinDeg, latMaxDeg)
    }
    val dLam = math.toRadians(dLonDeg)
    def signedEdge(latDeg: Double): Double = {
      val phi = math.toRadians(latDeg)
      if (phi >= 0) edgeQIntegral(phi, dLam)
      else -edgeQIntegral(-phi, dLam)
    }
    math.abs(C * (signedEdge(latMaxDeg) - signedEdge(latMinDeg)))
  }
}
