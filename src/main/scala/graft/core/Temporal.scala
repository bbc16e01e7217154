package graft.core

/** Temporal types: time-varying values with the reference's subtype model
  * (ref src/include/temporal/temporal.hpp:24-29 and SURVEY §1.2):
  *   subtype: 1=Instant, 2=Sequence, 3=SequenceSet
  *   interp:  0=None (instant), 1=Discrete, 2=Step, 3=Linear
  *
  * Encoding: parallel primitive arrays inside flat case classes — Catalyst
  * encodes these as compact struct/array columns (no per-instant object
  * header, Parquet-prunable), which is the Spark-idiomatic replacement for
  * the reference's opaque BLOB payloads (SURVEY §1.4).
  *
  * A numeric temporal covers TINT / TFLOAT / TBOOL (0/1); the registered
  * function layer tracks which logical type it is for text I/O.
  */
case class TNumSeq(vs: Array[Double], ts: Array[Long], lInc: Boolean, uInc: Boolean) {
  def n: Int = ts.length
  def startT: Long = ts(0)
  def endT: Long = ts(ts.length - 1)
}

case class TNum(subtype: Byte, interp: Byte, seqs: Array[TNumSeq])

case class TTextSeq(vs: Array[String], ts: Array[Long], lInc: Boolean, uInc: Boolean)
case class TText(subtype: Byte, interp: Byte, seqs: Array[TTextSeq])

object Interp {
  val None: Byte = 0
  val Discrete: Byte = 1
  val Step: Byte = 2
  val Linear: Byte = 3
  def name(i: Byte): String = i match {
    case 0 => "None"
    case 1 => "Discrete"
    case 2 => "Step"
    case 3 => "Linear"
  }
  def parse(s: String): Byte = s.trim.toLowerCase match {
    case "none" => None
    case "discrete" => Discrete
    case "step" => Step
    case "linear" => Linear
    case other => throw new IllegalArgumentException(s"bad interp '$other'")
  }
}

object Subtype {
  val Instant: Byte = 1
  val Sequence: Byte = 2
  val SequenceSet: Byte = 3
  def name(s: Byte): String = s match {
    case 1 => "Instant"
    case 2 => "Sequence"
    case 3 => "SequenceSet"
  }
}

object TNumAlg {

  // ---- constructors ----

  def instant(v: Double, t: Long): TNum =
    TNum(Subtype.Instant, Interp.None,
      Array(TNumSeq(Array(v), Array(t), lInc = true, uInc = true)))

  /** Build a sequence from parallel arrays; validates strictly ascending
    * timestamps (ref temporal_functions.cpp:144-229 tsequence_make). */
  def sequence(vs: Array[Double], ts: Array[Long], interp: Byte,
               lInc: Boolean = true, uInc: Boolean = true): TNum = {
    require(vs.length == ts.length && vs.nonEmpty, "empty sequence")
    var i = 1
    while (i < ts.length) {
      require(ts(i) > ts(i - 1), s"timestamps not strictly ascending at $i")
      i += 1
    }
    val (li, ui) =
      if (interp == Interp.Discrete || ts.length == 1) (true, true) else (lInc, uInc)
    TNum(Subtype.Sequence, interp, Array(TNumSeq(vs, ts, li, ui)))
  }

  def sequenceSet(seqs: Array[TNumSeq], interp: Byte): TNum = {
    require(seqs.nonEmpty, "empty sequence set")
    val sorted = seqs.sortBy(_.startT)
    var i = 1
    while (i < sorted.length) {
      require(sorted(i).startT >= sorted(i - 1).endT, "overlapping sequences")
      i += 1
    }
    TNum(Subtype.SequenceSet, interp, sorted)
  }

  /** All instants as (v, t) pairs in time order. */
  def instants(t: TNum): Array[(Double, Long)] =
    t.seqs.flatMap(s => s.vs.zip(s.ts))

  // ---- accessors (ref temporal.cpp:108-370) ----

  def numInstants(t: TNum): Int = t.seqs.map(_.n).sum
  def startValue(t: TNum): Double = t.seqs.head.vs.head
  def endValue(t: TNum): Double = t.seqs.last.vs.last
  def minValue(t: TNum): Double = t.seqs.map(_.vs.min).min
  def maxValue(t: TNum): Double = t.seqs.map(_.vs.max).max
  def valueN(t: TNum, n: Int): Option[Double] = {
    val all = instants(t)
    if (n >= 1 && n <= all.length) Some(all(n - 1)._1) else None
  }
  /** Instant with min/max value (first such). Returned as instant TNum. */
  def minInstant(t: TNum): TNum = {
    val (v, ts) = instants(t).minBy(_._1)
    instant(v, ts)
  }
  def maxInstant(t: TNum): TNum = {
    val (v, ts) = instants(t).maxBy(_._1)
    instant(v, ts)
  }
  def startTimestamp(t: TNum): Long = t.seqs.head.startT
  def endTimestamp(t: TNum): Long = t.seqs.last.endT

  /** Bounding time span (ref temporal.cpp:300-308 timeSpan). */
  def timeSpan(t: TNum): SpanL = {
    val inc0 = if (t.interp == Interp.Discrete) true else t.seqs.head.lInc
    val inc1 = if (t.interp == Interp.Discrete) true else t.seqs.last.uInc
    SpanL(startTimestamp(t), endTimestamp(t), inc0, inc1)
  }

  /** Time domain as tstzspanset (ref getTime, temporal.cpp:200-208).
    * Discrete: one degenerate span per instant. */
  def getTime(t: TNum): Array[SpanL] =
    if (t.interp == Interp.Discrete)
      instants(t).map { case (_, ts) => SpanL(ts, ts, lowerInc = true, upperInc = true) }
    else
      SpanSetAlg.normalize(
        t.seqs.map(s => SpanL(s.startT, s.endT, s.lInc, s.uInc)))

  /** Duration (ref temporal.cpp:210-218): boundspan → end-start, else sum
    * of per-sequence durations (0 for instant/discrete). */
  def duration(t: TNum, boundSpan: Boolean): Long =
    if (boundSpan) endTimestamp(t) - startTimestamp(t)
    else if (t.interp == Interp.Discrete || t.subtype == Subtype.Instant) 0L
    else t.seqs.map(s => s.endT - s.startT).sum

  def valueSpan(t: TNum): SpanD =
    SpanD(minValue(t), maxValue(t), lowerInc = true, upperInc = true)

  def sequences(t: TNum): Array[TNum] =
    t.seqs.map(s => TNum(Subtype.Sequence, if (t.interp == Interp.None) Interp.Discrete else t.interp, Array(s)))

  // ---- transformations ----

  def shiftValue(t: TNum, d: Double): TNum = mapValues(t, _ + d)
  def scaleValue(t: TNum, width: Double): TNum = {
    val lo = minValue(t); val hi = maxValue(t)
    if (hi == lo) mapValues(t, _ => lo)
    else mapValues(t, v => lo + (v - lo) * width / (hi - lo))
  }
  def shiftTime(t: TNum, d: Long): TNum =
    TNum(t.subtype, t.interp, t.seqs.map(s => s.copy(ts = s.ts.map(_ + d))))
  /** Scale total (bounding) duration to `w` micros, anchored at start. */
  def scaleTime(t: TNum, w: Long): TNum = {
    val t0 = startTimestamp(t); val t1 = endTimestamp(t)
    if (t1 == t0) return t
    TNum(t.subtype, t.interp, t.seqs.map(s =>
      s.copy(ts = s.ts.map(x => t0 + ((x - t0).toDouble * w / (t1 - t0)).round))))
  }
  private def mapValues(t: TNum, f: Double => Double): TNum =
    TNum(t.subtype, t.interp, t.seqs.map(s => s.copy(vs = s.vs.map(f))))

  // ---- value lookup / interpolation ----

  /** Value at timestamp with interpolation; None outside the domain
    * (ref temporal valueAtTimestamp semantics). */
  def valueAt(t: TNum, at: Long): Option[Double] = {
    for (s <- t.seqs) {
      if (t.interp == Interp.Discrete || t.subtype == Subtype.Instant) {
        var i = 0
        while (i < s.n) { if (s.ts(i) == at) return Some(s.vs(i)); i += 1 }
      } else if (at >= s.startT && at <= s.endT) {
        if (at == s.startT && !s.lInc && s.n > 1) () // excluded bound
        else if (at == s.endT && !s.uInc && s.n > 1) ()
        else {
          var i = 0
          while (i < s.n - 1 && s.ts(i + 1) < at) i += 1
          if (s.ts(i) == at) return Some(s.vs(i))
          if (i < s.n - 1 && s.ts(i + 1) == at) return Some(s.vs(i + 1))
          if (i < s.n - 1) {
            val frac = (at - s.ts(i)).toDouble / (s.ts(i + 1) - s.ts(i))
            return Some(
              if (t.interp == Interp.Linear) s.vs(i) + (s.vs(i + 1) - s.vs(i)) * frac
              else s.vs(i)) // step
          }
        }
      }
    }
    None
  }

  // ---- restriction: atTime (the BerlinMOD workhorse, ref
  //      temporal_functions.cpp:1069-1166) ----

  /** Clip one continuous sequence to a span, interpolating boundary
    * instants. Returns None when the intersection is empty. */
  private def clipSeq(s: TNumSeq, interp: Byte, w: SpanL): Option[TNumSeq] = {
    val dom = SpanL(s.startT, s.endT, s.lInc, s.uInc)
    val ix = SpanAlg.intersection(dom, w).getOrElse(return None)
    if (ix.lower == ix.upper && !(ix.lowerInc && ix.upperInc)) return None
    val vsB = scala.collection.mutable.ArrayBuffer[Double]()
    val tsB = scala.collection.mutable.ArrayBuffer[Long]()
    def valueAtIn(at: Long): Double = {
      var i = 0
      while (i < s.n - 1 && s.ts(i + 1) < at) i += 1
      if (s.ts(i) == at) s.vs(i)
      else if (i < s.n - 1 && s.ts(i + 1) == at) s.vs(i + 1)
      else if (i < s.n - 1) {
        val frac = (at - s.ts(i)).toDouble / (s.ts(i + 1) - s.ts(i))
        if (interp == Interp.Linear) s.vs(i) + (s.vs(i + 1) - s.vs(i)) * frac
        else s.vs(i)
      } else s.vs(i)
    }
    // boundary instant at ix.lower
    if (s.ts(0) < ix.lower || (s.ts(0) == ix.lower)) {
      vsB += valueAtIn(ix.lower); tsB += ix.lower
    }
    var i = 0
    while (i < s.n) {
      if (s.ts(i) > ix.lower && s.ts(i) < ix.upper) { vsB += s.vs(i); tsB += s.ts(i) }
      i += 1
    }
    if (ix.upper > ix.lower) {
      // Exclusive upper with step interp: the phantom boundary instant
      // carries the LEFT limit (the value holding during the clipped
      // window), not the value at the excluded endpoint itself.
      val vUp =
        if (interp == Interp.Step && !ix.upperInc) {
          var j = 0
          while (j < s.n - 1 && s.ts(j + 1) < ix.upper) j += 1
          s.vs(j)
        } else valueAtIn(ix.upper)
      vsB += vUp; tsB += ix.upper
    }
    if (tsB.isEmpty) None
    else Some(TNumSeq(vsB.toArray, tsB.toArray, ix.lowerInc, ix.upperInc))
  }

  def atTimeSpan(t: TNum, w: SpanL): Option[TNum] = {
    if (t.subtype == Subtype.Instant || t.interp == Interp.Discrete) {
      val kept = instants(t).filter { case (_, ts) => SpanAlg.containsValue(w, ts) }
      if (kept.isEmpty) None
      else if (t.subtype == Subtype.Instant) Some(instant(kept.head._1, kept.head._2))
      else Some(TNum(Subtype.Sequence, Interp.Discrete,
        Array(TNumSeq(kept.map(_._1), kept.map(_._2), lInc = true, uInc = true))))
    } else {
      val clipped = t.seqs.flatMap(clipSeq(_, t.interp, w))
      if (clipped.isEmpty) None
      // preserve the input's subtype: clipping a SequenceSet yields a
      // SequenceSet even when one sequence remains (MEOS behavior)
      else if (t.subtype == Subtype.Sequence && clipped.length == 1)
        Some(TNum(Subtype.Sequence, t.interp, clipped))
      else Some(TNum(Subtype.SequenceSet, t.interp, clipped))
    }
  }

  def atTimeSpanSet(t: TNum, ws: Array[SpanL]): Option[TNum] = {
    val parts = ws.flatMap(w => atTimeSpan(t, w))
    if (parts.isEmpty) None
    else {
      val allSeqs = parts.flatMap(_.seqs)
      if (t.subtype == Subtype.Instant) Some(parts.head)
      else if (t.interp == Interp.Discrete) {
        val inst = allSeqs.flatMap(s => s.vs.zip(s.ts)).distinct.sortBy(_._2)
        Some(TNum(Subtype.Sequence, Interp.Discrete,
          Array(TNumSeq(inst.map(_._1), inst.map(_._2), lInc = true, uInc = true))))
      }
      else if (allSeqs.length == 1 && t.subtype == Subtype.Sequence)
        Some(TNum(Subtype.Sequence, t.interp, allSeqs))
      else Some(TNum(Subtype.SequenceSet, t.interp, allSeqs))
    }
  }

  /** Restrict to instants/periods where value == v (ref atValues,
    * temporal.cpp:425-433). Linear interp solves crossings. */
  def atValue(t: TNum, v: Double): Option[TNum] = {
    if (t.subtype == Subtype.Instant || t.interp == Interp.Discrete) {
      val kept = instants(t).filter(_._1 == v)
      if (kept.isEmpty) None
      else if (t.subtype == Subtype.Instant) Some(instant(kept.head._1, kept.head._2))
      else Some(TNum(Subtype.Sequence, Interp.Discrete,
        Array(TNumSeq(kept.map(_._1), kept.map(_._2), lInc = true, uInc = true))))
    } else {
      // collect spans where value == v
      val spans = scala.collection.mutable.ArrayBuffer[SpanL]()
      for (s <- t.seqs) {
        var i = 0
        while (i < s.n - 1) {
          val (v0, v1) = (s.vs(i), s.vs(i + 1))
          val (t0, t1) = (s.ts(i), s.ts(i + 1))
          if (t.interp == Interp.Step) {
            if (v0 == v) spans += SpanL(t0, t1, lowerInc = true, upperInc = false)
          } else {
            if (v0 == v && v1 == v) spans += SpanL(t0, t1, lowerInc = true, upperInc = true)
            else if (v0 == v) spans += SpanL(t0, t0, lowerInc = true, upperInc = true)
            else if (v1 == v) spans += SpanL(t1, t1, lowerInc = true, upperInc = true)
            else if ((v0 < v && v1 > v) || (v0 > v && v1 < v)) {
              val tc = t0 + ((v - v0) / (v1 - v0) * (t1 - t0)).round
              spans += SpanL(tc, tc, lowerInc = true, upperInc = true)
            }
          }
          i += 1
        }
        if (s.n == 1 || (t.interp == Interp.Step && s.vs(s.n - 1) == v && s.uInc)) {
          if (s.vs(s.n - 1) == v) spans += SpanL(s.endT, s.endT, lowerInc = true, upperInc = true)
        }
      }
      if (spans.isEmpty) None
      else atTimeSpanSet(t, SpanSetAlg.normalize(spans.toArray))
    }
  }

  /** For a TBOOL (0/1 step temporal): span-set where value is true
    * (ref whenTrue, temporal.cpp:435-443). */
  def whenTrue(t: TNum): Array[SpanL] = {
    val spans = scala.collection.mutable.ArrayBuffer[SpanL]()
    if (t.subtype == Subtype.Instant || t.interp == Interp.Discrete) {
      for ((v, ts) <- instants(t) if v != 0.0)
        spans += SpanL(ts, ts, lowerInc = true, upperInc = true)
    } else {
      for (s <- t.seqs) {
        var i = 0
        while (i < s.n - 1) {
          if (s.vs(i) != 0.0)
            spans += SpanL(s.ts(i), s.ts(i + 1),
              lowerInc = if (i == 0) s.lInc else true, upperInc = false)
          i += 1
        }
        if (s.vs(s.n - 1) != 0.0 && s.uInc)
          spans += SpanL(s.endT, s.endT, lowerInc = true, upperInc = true)
      }
    }
    SpanSetAlg.normalize(spans.toArray)
  }

  /** Merge two temporals (non-overlapping domains) into one. */
  def merge(a: TNum, b: TNum): TNum = {
    require(a.interp == b.interp || a.subtype == Subtype.Instant || b.subtype == Subtype.Instant,
      "interp mismatch")
    val interp = if (a.subtype != Subtype.Instant) a.interp else b.interp
    if (interp == Interp.Discrete || interp == Interp.None) {
      val inst = (instants(a) ++ instants(b)).distinct.sortBy(_._2)
      TNum(Subtype.Sequence, Interp.Discrete,
        Array(TNumSeq(inst.map(_._1), inst.map(_._2), lInc = true, uInc = true)))
    } else sequenceSet(a.seqs ++ b.seqs, interp)
  }
}
