package graft.core

/** Span over a Long-valued domain: int, bigint, date (epoch days), and
  * tstz (epoch micros) spans all share this struct; the registered
  * function layer knows which domain it is handling (printing/parsing
  * differ, algebra does not). Mirrors the reference's `span<T>` semantics
  * (ref src/include/temporal/span.hpp:20-25) re-expressed as a flat
  * Catalyst-encodable case class (SURVEY §1.4).
  *
  * Discrete domains (int/bigint/date) are canonicalized to `[lower, upper)`
  * exactly like MEOS: `intspan '[1,2]'` prints `[1, 3)`
  * (ref test/sql/span.test:3-6).
  */
case class SpanL(lower: Long, upper: Long, lowerInc: Boolean, upperInc: Boolean)

/** Span over a Double domain (floatspan). Bounds keep their inclusivity. */
case class SpanD(lower: Double, upper: Double, lowerInc: Boolean, upperInc: Boolean)

/** Span over the text domain, lexicographic order (textspanset — the
  * reference registers it at src/include/temporal/spanset.hpp:21). */
case class SpanS(lower: String, upper: String, lowerInc: Boolean, upperInc: Boolean)

object SpanSAlg {
  def make(lo: String, hi: String, lInc: Boolean, uInc: Boolean): SpanS = {
    require(lo < hi || (lo == hi && lInc && uInc), s"invalid span [$lo, $hi)")
    SpanS(lo, hi, lInc, uInc)
  }

  /** Sort + merge overlapping/touching spans (continuous domain: merge
    * when ranges intersect or share a closed bound). */
  def normalize(spans: Array[SpanS]): Array[SpanS] = {
    if (spans.isEmpty) return spans
    val sorted = spans.sortBy(s => (s.lower, !s.lowerInc, s.upper))
    val out = scala.collection.mutable.ArrayBuffer[SpanS](sorted.head)
    var i = 1
    while (i < sorted.length) {
      val cur = sorted(i)
      val last = out.last
      val joinable = cur.lower < last.upper ||
        (cur.lower == last.upper && (cur.lowerInc || last.upperInc))
      if (joinable) {
        val (u, ui) =
          if (cur.upper > last.upper) (cur.upper, cur.upperInc)
          else if (cur.upper == last.upper) (last.upper, last.upperInc || cur.upperInc)
          else (last.upper, last.upperInc)
        out(out.length - 1) = SpanS(last.lower, u, last.lowerInc, ui)
      } else out += cur
      i += 1
    }
    out.toArray
  }
}

object SpanAlg {

  // ---- construction / canonicalization ----

  /** Canonicalize a discrete-domain span to [lower, upper). */
  def canonDiscrete(lo: Long, hi: Long, lInc: Boolean, uInc: Boolean): SpanL = {
    val l = if (lInc) lo else lo + 1
    val u = if (uInc) hi + 1 else hi
    require(l < u, s"invalid span: lower $l >= upper $u")
    SpanL(l, u, lowerInc = true, upperInc = false)
  }

  def makeL(lo: Long, hi: Long, lInc: Boolean, uInc: Boolean, discrete: Boolean): SpanL =
    if (discrete) canonDiscrete(lo, hi, lInc, uInc)
    else {
      require(lo < hi || (lo == hi && lInc && uInc), s"invalid span [$lo, $hi)")
      SpanL(lo, hi, lInc, uInc)
    }

  def makeD(lo: Double, hi: Double, lInc: Boolean, uInc: Boolean): SpanD = {
    require(lo < hi || (lo == hi && lInc && uInc), s"invalid span [$lo, $hi)")
    SpanD(lo, hi, lInc, uInc)
  }

  // ---- predicates (Long domain; Double versions mirror) ----

  def containsValue(s: SpanL, v: Long): Boolean =
    (v > s.lower || (v == s.lower && s.lowerInc)) &&
      (v < s.upper || (v == s.upper && s.upperInc))

  def containsValueD(s: SpanD, v: Double): Boolean =
    (v > s.lower || (v == s.lower && s.lowerInc)) &&
      (v < s.upper || (v == s.upper && s.upperInc))

  def containsSpan(a: SpanL, b: SpanL): Boolean = {
    val lowOk = a.lower < b.lower ||
      (a.lower == b.lower && (a.lowerInc || !b.lowerInc))
    val hiOk = a.upper > b.upper ||
      (a.upper == b.upper && (a.upperInc || !b.upperInc))
    lowOk && hiOk
  }

  def containsSpanD(a: SpanD, b: SpanD): Boolean = {
    val lowOk = a.lower < b.lower ||
      (a.lower == b.lower && (a.lowerInc || !b.lowerInc))
    val hiOk = a.upper > b.upper ||
      (a.upper == b.upper && (a.upperInc || !b.upperInc))
    lowOk && hiOk
  }

  def overlaps(a: SpanL, b: SpanL): Boolean = {
    val aBeforeB = a.upper < b.lower ||
      (a.upper == b.lower && !(a.upperInc && b.lowerInc))
    val bBeforeA = b.upper < a.lower ||
      (b.upper == a.lower && !(b.upperInc && a.lowerInc))
    !aBeforeB && !bBeforeA
  }

  def overlapsD(a: SpanD, b: SpanD): Boolean = {
    val aBeforeB = a.upper < b.lower ||
      (a.upper == b.lower && !(a.upperInc && b.lowerInc))
    val bBeforeA = b.upper < a.lower ||
      (b.upper == a.lower && !(b.upperInc && a.lowerInc))
    !aBeforeB && !bBeforeA
  }

  /** Adjacent: touch without overlapping (e.g. [1,3) -|- [3,5)). */
  def adjacent(a: SpanL, b: SpanL): Boolean =
    (a.upper == b.lower && (a.upperInc ^ b.lowerInc)) ||
      (b.upper == a.lower && (b.upperInc ^ a.lowerInc))

  /** a strictly left of b (`<<`). */
  def left(a: SpanL, b: SpanL): Boolean =
    a.upper < b.lower || (a.upper == b.lower && !(a.upperInc && b.lowerInc))

  // ---- combination ----

  def intersection(a: SpanL, b: SpanL): Option[SpanL] = {
    if (!overlaps(a, b)) return None
    val (lo, lInc) =
      if (a.lower > b.lower) (a.lower, a.lowerInc)
      else if (b.lower > a.lower) (b.lower, b.lowerInc)
      else (a.lower, a.lowerInc && b.lowerInc)
    val (hi, uInc) =
      if (a.upper < b.upper) (a.upper, a.upperInc)
      else if (b.upper < a.upper) (b.upper, b.upperInc)
      else (a.upper, a.upperInc && b.upperInc)
    Some(SpanL(lo, hi, lInc, uInc))
  }

  /** Union of two overlapping-or-adjacent spans (bounding hull otherwise
    * not defined — callers use spanset union for the general case). */
  def hull(a: SpanL, b: SpanL): SpanL = {
    val (lo, lInc) =
      if (a.lower < b.lower) (a.lower, a.lowerInc)
      else if (b.lower < a.lower) (b.lower, b.lowerInc)
      else (a.lower, a.lowerInc || b.lowerInc)
    val (hi, uInc) =
      if (a.upper > b.upper) (a.upper, a.upperInc)
      else if (b.upper > a.upper) (b.upper, b.upperInc)
      else (a.upper, a.upperInc || b.upperInc)
    SpanL(lo, hi, lInc, uInc)
  }

  def widthL(s: SpanL): Long = s.upper - s.lower
  def widthD(s: SpanD): Double = s.upper - s.lower

  def shiftL(s: SpanL, d: Long): SpanL =
    SpanL(s.lower + d, s.upper + d, s.lowerInc, s.upperInc)
  def shiftD(s: SpanD, d: Double): SpanD =
    SpanD(s.lower + d, s.upper + d, s.lowerInc, s.upperInc)

  /** Scale so the width becomes `w` keeping lower fixed. */
  def scaleL(s: SpanL, w: Long): SpanL = SpanL(s.lower, s.lower + w, s.lowerInc, s.upperInc)
  def scaleD(s: SpanD, w: Double): SpanD = SpanD(s.lower, s.lower + w, s.lowerInc, s.upperInc)
}

/** Span-set algebra: a spanset is a sorted array of disjoint,
  * non-adjacent-mergeable spans (ref src/include/temporal/spanset.hpp:18-23
  * normalization semantics). */
object SpanSetAlg {

  /** Normalize arbitrary spans: sort, merge overlapping/adjacent. */
  def normalize(spans: Array[SpanL]): Array[SpanL] = {
    if (spans.isEmpty) return spans
    val sorted = spans.sortBy(s => (s.lower, !s.lowerInc, s.upper))
    val out = scala.collection.mutable.ArrayBuffer[SpanL](sorted.head)
    var i = 1
    while (i < sorted.length) {
      val cur = sorted(i)
      val last = out.last
      if (SpanAlg.overlaps(last, cur) || SpanAlg.adjacent(last, cur))
        out(out.length - 1) = SpanAlg.hull(last, cur)
      else out += cur
      i += 1
    }
    out.toArray
  }

  def contains(ss: Array[SpanL], v: Long): Boolean =
    ss.exists(SpanAlg.containsValue(_, v))

  def overlapsSpan(ss: Array[SpanL], s: SpanL): Boolean =
    ss.exists(SpanAlg.overlaps(_, s))

  def intersectionSpan(ss: Array[SpanL], s: SpanL): Array[SpanL] =
    ss.flatMap(SpanAlg.intersection(_, s))

  def union(a: Array[SpanL], b: Array[SpanL]): Array[SpanL] =
    normalize(a ++ b)

  /** Total width (sum of span widths). */
  def width(ss: Array[SpanL]): Long = ss.map(SpanAlg.widthL).sum

  /** Bounding span. */
  def span(ss: Array[SpanL]): SpanL = {
    require(ss.nonEmpty, "empty spanset")
    SpanL(ss.head.lower, ss.last.upper, ss.head.lowerInc, ss.last.upperInc)
  }

  def minus(a: Array[SpanL], b: Array[SpanL]): Array[SpanL] = {
    var cur = a.toBuffer
    for (s <- b) {
      val next = scala.collection.mutable.ArrayBuffer[SpanL]()
      for (x <- cur) {
        SpanAlg.intersection(x, s) match {
          case None => next += x
          case Some(ix) =>
            // left remainder
            if (x.lower < ix.lower || (x.lower == ix.lower && x.lowerInc && !ix.lowerInc))
              next += SpanL(x.lower, ix.lower, x.lowerInc, !ix.lowerInc)
            // right remainder
            if (x.upper > ix.upper || (x.upper == ix.upper && x.upperInc && !ix.upperInc))
              next += SpanL(ix.upper, x.upper, !ix.upperInc, x.upperInc)
        }
      }
      cur = next
    }
    normalize(cur.toArray)
  }
}

/** Ordered-set algebra: a set is a sorted, deduplicated array
  * (ref src/include/temporal/set.hpp:18-23). */
object SetAlg {
  def makeL(vs: Array[Long]): Array[Long] = vs.distinct.sorted
  def makeD(vs: Array[Double]): Array[Double] = vs.distinct.sorted
  def makeS(vs: Array[String]): Array[String] = vs.distinct.sorted

  def unionL(a: Array[Long], b: Array[Long]): Array[Long] = makeL(a ++ b)
  def interL(a: Array[Long], b: Array[Long]): Array[Long] =
    a.toSet.intersect(b.toSet).toArray.sorted
  def minusL(a: Array[Long], b: Array[Long]): Array[Long] = {
    val bs = b.toSet; a.filterNot(bs)
  }

  /** Bounding span of a sorted Long set (discrete → canonical [min, max+1)). */
  def spanOf(vs: Array[Long], discrete: Boolean): SpanL =
    if (discrete) SpanL(vs.head, vs.last + 1, lowerInc = true, upperInc = false)
    else SpanL(vs.head, vs.last, lowerInc = true, upperInc = true)
}
