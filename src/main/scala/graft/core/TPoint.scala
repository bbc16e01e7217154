package graft.core

/** Temporal geometry points (TGEOMPOINT, ref src/geo/tgeompoint.cpp:18-28)
  * as parallel coordinate arrays, plus the planar spatiotemporal algebra
  * the reference delegates to MEOS (length, trajectory, atGeometry,
  * eDwithin/tDwithin/aDisjoint — ref tgeompoint.cpp:234-311).
  */
case class TPointSeq(xs: Array[Double], ys: Array[Double], ts: Array[Long],
                     lInc: Boolean, uInc: Boolean,
                     zs: Array[Double] = null) {
  def n: Int = ts.length
  def startT: Long = ts(0)
  def endT: Long = ts(ts.length - 1)
  def is3d: Boolean = zs != null
}

case class TPoint(subtype: Byte, interp: Byte, srid: Int, seqs: Array[TPointSeq])

object TPointAlg {

  def instant(x: Double, y: Double, t: Long, srid: Int = 0): TPoint =
    TPoint(Subtype.Instant, Interp.None, srid,
      Array(TPointSeq(Array(x), Array(y), Array(t), lInc = true, uInc = true)))

  def sequence(xs: Array[Double], ys: Array[Double], ts: Array[Long],
               interp: Byte, lInc: Boolean = true, uInc: Boolean = true,
               srid: Int = 0): TPoint = {
    require(ts.nonEmpty && xs.length == ts.length && ys.length == ts.length)
    var i = 1
    while (i < ts.length) {
      require(ts(i) > ts(i - 1), s"timestamps not strictly ascending at $i")
      i += 1
    }
    val (li, ui) =
      if (interp == Interp.Discrete || ts.length == 1) (true, true) else (lInc, uInc)
    TPoint(Subtype.Sequence, interp, srid, Array(TPointSeq(xs, ys, ts, li, ui)))
  }

  def sequenceSet(seqs: Array[TPointSeq], interp: Byte, srid: Int): TPoint = {
    val sorted = seqs.sortBy(_.startT)
    TPoint(Subtype.SequenceSet, interp, srid, sorted)
  }

  def numInstants(t: TPoint): Int = t.seqs.map(_.n).sum
  def startTimestamp(t: TPoint): Long = t.seqs.head.startT
  def endTimestamp(t: TPoint): Long = t.seqs.last.endT

  def timeSpan(t: TPoint): SpanL = {
    val inc0 = if (t.interp == Interp.Discrete) true else t.seqs.head.lInc
    val inc1 = if (t.interp == Interp.Discrete) true else t.seqs.last.uInc
    SpanL(startTimestamp(t), endTimestamp(t), inc0, inc1)
  }

  def duration(t: TPoint, boundSpan: Boolean): Long =
    if (boundSpan) endTimestamp(t) - startTimestamp(t)
    else if (t.interp == Interp.Discrete || t.subtype == Subtype.Instant) 0L
    else t.seqs.map(s => s.endT - s.startT).sum

  /** Spatiotemporal bounding box (ref tgeompoint→STBOX cast,
    * tgeompoint.cpp:44-52). */
  def stbox(t: TPoint): STBox = {
    var xmin = Double.MaxValue; var xmax = Double.MinValue
    var ymin = Double.MaxValue; var ymax = Double.MinValue
    var zmin = Double.MaxValue; var zmax = Double.MinValue
    var any3d = false
    for (s <- t.seqs; i <- 0 until s.n) {
      if (s.xs(i) < xmin) xmin = s.xs(i); if (s.xs(i) > xmax) xmax = s.xs(i)
      if (s.ys(i) < ymin) ymin = s.ys(i); if (s.ys(i) > ymax) ymax = s.ys(i)
      if (s.is3d) {
        any3d = true
        if (s.zs(i) < zmin) zmin = s.zs(i); if (s.zs(i) > zmax) zmax = s.zs(i)
      }
    }
    val ts = timeSpan(t)
    STBox(xmin, xmax, ymin, ymax,
      if (any3d) zmin else 0, if (any3d) zmax else 0,
      ts.lower, ts.upper, ts.lowerInc, ts.upperInc,
      t.srid, geodetic = false, hasX = true, hasZ = any3d, hasT = true)
  }

  /** Position at timestamp (linear interpolation); None outside domain
    * (ref valueAtTimestamp, tgeompoint.cpp:220-228 — BerlinMOD q3/q11/q12/q14). */
  def valueAt(t: TPoint, at: Long): Option[(Double, Double)] = {
    for (s <- t.seqs) {
      if (t.interp == Interp.Discrete || t.subtype == Subtype.Instant) {
        var i = 0
        while (i < s.n) { if (s.ts(i) == at) return Some((s.xs(i), s.ys(i))); i += 1 }
      } else if (at >= s.startT && at <= s.endT) {
        if ((at == s.startT && !s.lInc && s.n > 1) || (at == s.endT && !s.uInc && s.n > 1)) ()
        else {
          var i = 0
          while (i < s.n - 1 && s.ts(i + 1) < at) i += 1
          if (s.ts(i) == at) return Some((s.xs(i), s.ys(i)))
          if (i < s.n - 1 && s.ts(i + 1) == at) return Some((s.xs(i + 1), s.ys(i + 1)))
          if (i < s.n - 1) {
            val f = (at - s.ts(i)).toDouble / (s.ts(i + 1) - s.ts(i))
            return Some(
              if (t.interp == Interp.Linear)
                (s.xs(i) + (s.xs(i + 1) - s.xs(i)) * f, s.ys(i) + (s.ys(i + 1) - s.ys(i)) * f)
              else (s.xs(i), s.ys(i)))
          }
        }
      }
    }
    None
  }

  /** Clip to a time span with interpolated boundary positions (ref atTime,
    * tgeompoint.cpp:200-218 — BerlinMOD q8/q9/q13/q15/q16). */
  def atTimeSpan(t: TPoint, w: SpanL): Option[TPoint] = {
    if (t.subtype == Subtype.Instant || t.interp == Interp.Discrete) {
      val kept = for {
        s <- t.seqs; i <- 0 until s.n
        if SpanAlg.containsValue(w, s.ts(i))
      } yield (s.xs(i), s.ys(i), s.ts(i))
      if (kept.isEmpty) None
      else if (t.subtype == Subtype.Instant) {
        val (x, y, ts) = kept.head; Some(instant(x, y, ts, t.srid))
      } else Some(TPoint(Subtype.Sequence, Interp.Discrete, t.srid, Array(
        TPointSeq(kept.map(_._1), kept.map(_._2), kept.map(_._3), lInc = true, uInc = true))))
    } else {
      val clipped = t.seqs.flatMap(clipSeq(_, t.interp, w))
      if (clipped.isEmpty) None
      else if (clipped.length == 1 && t.subtype == Subtype.Sequence)
        Some(TPoint(Subtype.Sequence, t.interp, t.srid, clipped))
      else Some(TPoint(Subtype.SequenceSet, t.interp, t.srid, clipped))
    }
  }

  private def clipSeq(s: TPointSeq, interp: Byte, w: SpanL): Option[TPointSeq] = {
    val dom = SpanL(s.startT, s.endT, s.lInc, s.uInc)
    val ix = SpanAlg.intersection(dom, w).getOrElse(return None)
    if (ix.lower == ix.upper && !(ix.lowerInc && ix.upperInc)) return None
    def posAt(at: Long): (Double, Double) = {
      var i = 0
      while (i < s.n - 1 && s.ts(i + 1) < at) i += 1
      if (s.ts(i) == at) (s.xs(i), s.ys(i))
      else if (i < s.n - 1 && s.ts(i + 1) == at) (s.xs(i + 1), s.ys(i + 1))
      else if (i < s.n - 1) {
        val f = (at - s.ts(i)).toDouble / (s.ts(i + 1) - s.ts(i))
        if (interp == Interp.Linear)
          (s.xs(i) + (s.xs(i + 1) - s.xs(i)) * f, s.ys(i) + (s.ys(i + 1) - s.ys(i)) * f)
        else (s.xs(i), s.ys(i))
      } else (s.xs(i), s.ys(i))
    }
    val xsB = scala.collection.mutable.ArrayBuffer[Double]()
    val ysB = scala.collection.mutable.ArrayBuffer[Double]()
    val tsB = scala.collection.mutable.ArrayBuffer[Long]()
    val p0 = posAt(ix.lower)
    xsB += p0._1; ysB += p0._2; tsB += ix.lower
    var i = 0
    while (i < s.n) {
      if (s.ts(i) > ix.lower && s.ts(i) < ix.upper) {
        xsB += s.xs(i); ysB += s.ys(i); tsB += s.ts(i)
      }
      i += 1
    }
    if (ix.upper > ix.lower) {
      val p1 = posAt(ix.upper)
      xsB += p1._1; ysB += p1._2; tsB += ix.upper
    }
    Some(TPointSeq(xsB.toArray, ysB.toArray, tsB.toArray, ix.lowerInc, ix.upperInc))
  }

  def atTimeSpanSet(t: TPoint, ws: Array[SpanL]): Option[TPoint] = {
    val parts = ws.flatMap(w => atTimeSpan(t, w))
    if (parts.isEmpty) None
    else if (t.subtype == Subtype.Instant) Some(parts.head)
    else {
      val allSeqs = parts.flatMap(_.seqs)
      if (allSeqs.length == 1 && t.subtype == Subtype.Sequence)
        Some(TPoint(Subtype.Sequence, t.interp, t.srid, allSeqs))
      else Some(TPoint(Subtype.SequenceSet, t.interp, t.srid, allSeqs))
    }
  }

  /** Planar trajectory length: sum of segment lengths over linear
    * sequences (ref length, tgeompoint.cpp:234-242 — BerlinMOD q8/q9). */
  def length(t: TPoint): Double = {
    if (t.interp != Interp.Linear) return 0.0
    var total = 0.0
    for (s <- t.seqs) {
      var i = 0
      while (i < s.n - 1) {
        val dx = s.xs(i + 1) - s.xs(i)
        val dy = s.ys(i + 1) - s.ys(i)
        // hypot for 2D (ulp-exact with the golden corpus); 3D via sqrt
        total +=
          (if (s.is3d) { val dz = s.zs(i + 1) - s.zs(i)
                         math.sqrt(dx * dx + dy * dy + dz * dz) }
           else math.hypot(dx, dy))
        i += 1
      }
    }
    total
  }

  /** Trajectory geometry: Point for a single position, LineString of the
    * instants otherwise, consecutive duplicates removed (ref trajectory,
    * tgeompoint.cpp:244-253 — BerlinMOD q4/q7/q13-17). Returns WKB. */
  def trajectory(t: TPoint): Array[Byte] = {
    val lines = scala.collection.mutable.ArrayBuffer[Array[(Double, Double)]]()
    val points = scala.collection.mutable.LinkedHashSet[(Double, Double)]()
    for (s <- t.seqs) {
      val pts = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
      for (i <- 0 until s.n) {
        val p = (s.xs(i), s.ys(i))
        if (pts.isEmpty || pts.last != p) pts += p
      }
      if (pts.length == 1) points += pts.head
      else lines += pts.toArray
    }
    val covered = lines.flatten.toSet
    val solo = points.filterNot(covered).toArray
    if (lines.isEmpty && solo.length == 1) Wkb.writePoint(solo(0)._1, solo(0)._2)
    else if (lines.length == 1 && solo.isEmpty) Wkb.writeLineString(lines(0))
    else Wkb.writeCollection(
      solo.map(p => Wkb.writePoint(p._1, p._2)) ++ lines.map(Wkb.writeLineString))
  }

  /** Speed at the end of segment math: average speed = length/duration.
    * Units: coordinate units per second. */
  def avgSpeed(t: TPoint): Double = {
    val d = duration(t, boundSpan = false)
    if (d == 0) 0.0 else length(t) / (d.toDouble / 1e6)
  }

  // ---- two-trajectory analytics ----

  /** Synchronized segment pairs of two linear temporals over their common
    * time domain: (t0, t1, p0, p1, q0, q1). Two-pointer merge sweep over
    * both instant lists — O(n+m) per pair, which is what keeps the
    * trip-pair proximity joins (BerlinMOD q6/q10/q16) tractable. */
  private[core] def syncSegments(a: TPoint, b: TPoint):
      Array[(Long, Long, (Double, Double), (Double, Double), (Double, Double), (Double, Double))] = {
    val sa = timeSpan(a); val sb = timeSpan(b)
    val ix = SpanAlg.intersection(sa, sb).getOrElse(return Array.empty)
    // flatten both to (t, x, y) instant arrays (sequences are time-sorted)
    val at = a.seqs.flatMap(_.ts); val ax = a.seqs.flatMap(_.xs); val ay = a.seqs.flatMap(_.ys)
    val bt = b.seqs.flatMap(_.ts); val bx = b.seqs.flatMap(_.xs); val by = b.seqs.flatMap(_.ys)
    // merged distinct times within the intersection
    val times = scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0; var j = 0
    if (ix.lower == ix.upper) times += ix.lower
    else {
      while (i < at.length || j < bt.length) {
        val t =
          if (i >= at.length) { val v = bt(j); j += 1; v }
          else if (j >= bt.length) { val v = at(i); i += 1; v }
          else if (at(i) < bt(j)) { val v = at(i); i += 1; v }
          else if (bt(j) < at(i)) { val v = bt(j); j += 1; v }
          else { val v = at(i); i += 1; j += 1; v }
        if (t >= ix.lower && t <= ix.upper &&
            (times.isEmpty || times.last != t)) times += t
      }
    }
    if (times.isEmpty) return Array.empty
    // incremental interpolation: advance one cursor per temporal
    def interpolator(ts: Array[Long], xs: Array[Double], ys: Array[Double]):
        Long => (Double, Double) = {
      var k = 0
      (t: Long) => {
        while (k < ts.length - 1 && ts(k + 1) < t) k += 1
        if (ts(k) == t) (xs(k), ys(k))
        else if (k < ts.length - 1 && ts(k + 1) == t) (xs(k + 1), ys(k + 1))
        else if (k < ts.length - 1 && ts(k) < t && t < ts(k + 1)) {
          val f = (t - ts(k)).toDouble / (ts(k + 1) - ts(k))
          (xs(k) + (xs(k + 1) - xs(k)) * f, ys(k) + (ys(k + 1) - ys(k)) * f)
        } else (xs(math.min(k, ts.length - 1)), ys(math.min(k, ts.length - 1)))
      }
    }
    val pa = interpolator(at, ax, ay)
    val pb = interpolator(bt, bx, by)
    if (times.length == 1) {
      val t0 = times(0)
      val p = pa(t0); val q = pb(t0)
      return Array((t0, t0, p, p, q, q))
    }
    // sequence-set gap handling: a merged sub-segment counts only when it
    // lies inside a sequence domain of BOTH temporals (all seq boundaries
    // are in `times`, so each sub-segment is fully inside or outside)
    def covered(t: TPoint): (Long, Long) => Boolean = {
      val bounds = t.seqs.map(s => (s.startT, s.endT))
      (lo: Long, hi: Long) => {
        var k = 0
        var ok = false
        while (k < bounds.length && !ok) {
          if (bounds(k)._1 <= lo && hi <= bounds(k)._2) ok = true
          k += 1
        }
        ok
      }
    }
    val covA = covered(a)
    val covB = covered(b)
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, (Double, Double), (Double, Double), (Double, Double), (Double, Double))]()
    var p0 = pa(times(0)); var q0 = pb(times(0))
    var n = 0
    while (n < times.length - 1) {
      val t0 = times(n); val t1 = times(n + 1)
      val p1 = pa(t1); val q1 = pb(t1)
      if (covA(t0, t1) && covB(t0, t1)) out += ((t0, t1, p0, p1, q0, q1))
      p0 = p1; q0 = q1
      n += 1
    }
    out.toArray
  }

  /** Squared distance between the moving points over one synchronized
    * segment, as quadratic d2(u) = A u^2 + B u + C with u ∈ [0,1]. */
  private def distQuadratic(p0: (Double, Double), p1: (Double, Double),
                            q0: (Double, Double), q1: (Double, Double)): (Double, Double, Double) = {
    val dx0 = p0._1 - q0._1; val dy0 = p0._2 - q0._2
    val dvx = (p1._1 - q1._1) - dx0; val dvy = (p1._2 - q1._2) - dy0
    val A = dvx * dvx + dvy * dvy
    val B = 2 * (dx0 * dvx + dy0 * dvy)
    val C = dx0 * dx0 + dy0 * dy0
    (A, B, C)
  }

  /** "Ever within distance d" (ref eDwithin, tgeompoint.cpp:289-297 —
    * BerlinMOD q6): true iff min over the synchronized domain of the
    * distance is <= d. */
  def eDwithin(a: TPoint, b: TPoint, d: Double): Boolean = {
    val segs = syncSegments(a, b)
    val d2 = d * d
    segs.exists { case (_, _, p0, p1, q0, q1) =>
      val (qa, qb, qc) = distQuadratic(p0, p1, q0, q1)
      minOnUnit(qa, qb, qc) <= d2 + 1e-9
    }
  }

  /** "Always disjoint" (ref aDisjoint, tgeompoint.cpp:279-287 — q16):
    * positions never coincide over the synchronized domain. */
  def aDisjoint(a: TPoint, b: TPoint): Boolean = {
    val segs = syncSegments(a, b)
    if (segs.isEmpty) return true // empty common domain: vacuously disjoint
    segs.forall { case (_, _, p0, p1, q0, q1) =>
      val (qa, qb, qc) = distQuadratic(p0, p1, q0, q1)
      minOnUnit(qa, qb, qc) > 1e-18
    }
  }

  private def minOnUnit(a: Double, b: Double, c: Double): Double = {
    var m = math.min(c, a + b + c) // u=0, u=1
    if (a > 0) {
      val u = -b / (2 * a)
      if (u > 0 && u < 1) m = math.min(m, a * u * u + b * u + c)
    }
    m
  }

  /** Temporal within-distance (ref tDwithin, tgeompoint.cpp:303-311 —
    * BerlinMOD q10): step TBOOL that is true exactly when dist <= d.
    * Solves the per-segment quadratic d2(u) <= d^2 (SURVEY §7 "hard parts"). */
  def tDwithin(a: TPoint, b: TPoint, d: Double): Option[TNum] = {
    val segs = syncSegments(a, b)
    if (segs.isEmpty) return None
    val d2 = d * d
    val trueSpans = scala.collection.mutable.ArrayBuffer[SpanL]()
    for ((t0, t1, p0, p1, q0, q1) <- segs) {
      val (qa, qb, qc) = distQuadratic(p0, p1, q0, q1)
      // solve qa u^2 + qb u + qc - d2 <= 0 on [0,1]
      val ivs: Array[(Double, Double)] =
        if (qa < 1e-24) {
          if (math.abs(qb) < 1e-24) { if (qc <= d2) Array((0.0, 1.0)) else Array.empty }
          else {
            val u = (d2 - qc) / qb
            if (qb > 0) { if (u >= 0) Array((0.0, math.min(u, 1.0))) else Array.empty }
            else { if (u <= 1) Array((math.max(u, 0.0), 1.0)) else Array.empty }
          }
        } else {
          val disc = qb * qb - 4 * qa * (qc - d2)
          if (disc < 0) Array.empty
          else {
            val sq = math.sqrt(disc)
            val u0 = (-qb - sq) / (2 * qa); val u1 = (-qb + sq) / (2 * qa)
            val lo = math.max(u0, 0.0); val hi = math.min(u1, 1.0)
            if (lo <= hi) Array((lo, hi)) else Array.empty
          }
        }
      for ((u0, u1) <- ivs) {
        val s0 = t0 + (u0 * (t1 - t0)).round
        val s1 = t0 + (u1 * (t1 - t0)).round
        trueSpans += SpanL(s0, math.max(s1, s0), lowerInc = true, upperInc = true)
      }
    }
    val merged = SpanSetAlg.normalize(trueSpans.toArray)
    // Build a step TBOOL over the full synchronized domain as a sequence
    // set so closed true-interval bounds are representable (a single step
    // sequence cannot express value change AT its last instant).
    val domLo = segs.head._1; val domHi = segs.last._2
    if (domLo == domHi)
      return Some(TNumAlg.instant(if (SpanSetAlg.contains(merged, domLo)) 1.0 else 0.0, domLo))
    val seqs = scala.collection.mutable.ArrayBuffer[TNumSeq]()
    def falseSeq(a: Long, b: Long, lInc: Boolean, uInc: Boolean): Unit =
      if (a < b || (a == b && lInc && uInc))
        seqs += (if (a == b) TNumSeq(Array(0.0), Array(a), true, true)
                 else TNumSeq(Array(0.0, 0.0), Array(a, b), lInc, uInc))
    var cursor = domLo
    var cursorInc = true
    for (sp <- merged) {
      falseSeq(cursor, sp.lower, cursorInc, uInc = false)
      seqs += (if (sp.lower == sp.upper) TNumSeq(Array(1.0), Array(sp.lower), true, true)
               else TNumSeq(Array(1.0, 1.0), Array(sp.lower, sp.upper), true, true))
      cursor = sp.upper
      cursorInc = false
    }
    falseSeq(cursor, domHi, cursorInc, uInc = true)
    if (seqs.length == 1) Some(TNum(Subtype.Sequence, Interp.Step, seqs.toArray))
    else Some(TNum(Subtype.SequenceSet, Interp.Step, seqs.toArray))
  }

  /** Minimum distance ever between two temporals (ref the disabled
    * `distance_gs` semantics used by BerlinMOD q5, tgeompoint.cpp:351-379). */
  def minDistance(a: TPoint, b: TPoint): Double = {
    val segs = syncSegments(a, b)
    if (segs.isEmpty) return Double.NaN
    math.sqrt(segs.map { case (_, _, p0, p1, q0, q1) =>
      val (qa, qb, qc) = distQuadratic(p0, p1, q0, q1)
      minOnUnit(qa, qb, qc)
    }.min)
  }

  /** Restrict to the times the moving point lies ON a linestring
    * (atGeometry with a 1-D geometry): per motion segment × line segment,
    * collinear overlap → sub-span, transversal crossing → instant. */
  def atLineString(t: TPoint, line: Array[(Double, Double)]): Option[TPoint] = {
    val eps = 1e-9
    val spans = scala.collection.mutable.ArrayBuffer[SpanL]()
    def onSeg(px: Double, py: Double, ax: Double, ay: Double, bx: Double, by: Double): Boolean = {
      val cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
      math.abs(cross) <= eps &&
        px >= math.min(ax, bx) - eps && px <= math.max(ax, bx) + eps &&
        py >= math.min(ay, by) - eps && py <= math.max(ay, by) + eps
    }
    for (s <- t.seqs) {
      if (s.n == 1 || t.interp != Interp.Linear) {
        for (i <- 0 until s.n)
          if (line.indices.dropRight(1).exists(j =>
              onSeg(s.xs(i), s.ys(i), line(j)._1, line(j)._2, line(j + 1)._1, line(j + 1)._2)))
            spans += SpanL(s.ts(i), s.ts(i), lowerInc = true, upperInc = true)
      } else {
        var i = 0
        while (i < s.n - 1) {
          val (px, py) = (s.xs(i), s.ys(i))
          val (qx, qy) = (s.xs(i + 1), s.ys(i + 1))
          val dx = qx - px; val dy = qy - py
          for (j <- 0 until line.length - 1) {
            val (ax, ay) = line(j); val (bx, by) = line(j + 1)
            val ex = bx - ax; val ey = by - ay
            val denom = dx * ey - dy * ex
            if (math.abs(denom) <= eps) {
              // parallel: collinear overlap?
              if (onSeg(px, py, ax, ay, bx, by) || onSeg(ax, ay, px, py, qx, qy)) {
                // project line segment ends onto motion parameter
                val len2 = dx * dx + dy * dy
                if (len2 <= eps) {
                  // stationary segment resting on the line: whole span
                  if (onSeg(px, py, ax, ay, bx, by))
                    spans += SpanL(s.ts(i), s.ts(i + 1), lowerInc = true, upperInc = true)
                } else {
                  val ua = ((ax - px) * dx + (ay - py) * dy) / len2
                  val ub = ((bx - px) * dx + (by - py) * dy) / len2
                  val lo = math.max(0.0, math.min(ua, ub))
                  val hi = math.min(1.0, math.max(ua, ub))
                  if (lo <= hi) {
                    val t0 = s.ts(i) + (lo * (s.ts(i + 1) - s.ts(i))).round
                    val t1 = s.ts(i) + (hi * (s.ts(i + 1) - s.ts(i))).round
                    spans += SpanL(t0, math.max(t1, t0), lowerInc = true, upperInc = true)
                  }
                }
              }
            } else {
              val u = ((ax - px) * ey - (ay - py) * ex) / denom
              val v = ((ax - px) * dy - (ay - py) * dx) / denom
              if (u >= -eps && u <= 1 + eps && v >= -eps && v <= 1 + eps) {
                val tc = s.ts(i) + (u * (s.ts(i + 1) - s.ts(i))).round
                spans += SpanL(tc, tc, lowerInc = true, upperInc = true)
              }
            }
          }
          i += 1
        }
      }
    }
    if (spans.isEmpty) None
    else atTimeSpanSet(t, SpanSetAlg.normalize(spans.toArray))
  }

  /** Restrict to the portion inside a polygon (ref atGeometry,
    * tgeompoint.cpp:265-273): per linear segment, find parameter
    * intervals inside the polygon (crossing params + midpoint test). */
  def atGeometry(t: TPoint, poly: Array[(Double, Double)]): Option[TPoint] = {
    val inside = scala.collection.mutable.ArrayBuffer[SpanL]()
    for (s <- t.seqs) {
      if (s.n == 1) {
        if (Geo.pointInPolygon(s.xs(0), s.ys(0), poly))
          inside += SpanL(s.ts(0), s.ts(0), lowerInc = true, upperInc = true)
      } else {
        var i = 0
        while (i < s.n - 1) {
          val cuts = (0.0 +: Geo.segPolyCrossings(
            s.xs(i), s.ys(i), s.xs(i + 1), s.ys(i + 1), poly) :+ 1.0).distinct.sorted
          var j = 0
          while (j < cuts.length - 1) {
            val mid = (cuts(j) + cuts(j + 1)) / 2
            val mx = s.xs(i) + (s.xs(i + 1) - s.xs(i)) * mid
            val my = s.ys(i) + (s.ys(i + 1) - s.ys(i)) * mid
            if (Geo.pointInPolygon(mx, my, poly)) {
              val t0 = s.ts(i) + (cuts(j) * (s.ts(i + 1) - s.ts(i))).round
              val t1 = s.ts(i) + (cuts(j + 1) * (s.ts(i + 1) - s.ts(i))).round
              inside += SpanL(t0, math.max(t1, t0), lowerInc = true, upperInc = true)
            }
            j += 1
          }
          i += 1
        }
      }
    }
    if (inside.isEmpty) None
    else atTimeSpanSet(t, SpanSetAlg.normalize(inside.toArray))
  }
}
