package graft.core

/** Text I/O for every mobility type, matching the reference's golden
  * formats byte-for-byte (ref test/sql tests; FIXTURES.md §2-3):
  * canonical discrete spans `[1, 3)`, quoted timestamp/text set elements,
  * `TBOXINT XT(...)`, `STBOX XT(((1,2),(3,4)),[...])`, temporal literals
  * `v@t` / `{..}` / `[..]` / `{[..],[..]}`, WKB-hex tgeompoint output.
  */
object TextIO {

  // ---- generic helpers ----

  /** Split at top-level commas (respecting (), [], {}, and double quotes). */
  def splitTop(s: String, sep: Char = ','): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0; var inQ = false; var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '"') inQ = false }
      else c match {
        case '"' => inQ = true
        case '(' | '[' | '{' => depth += 1
        case ')' | ']' | '}' => depth -= 1
        case `sep` if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.toArray
  }

  sealed trait LDomain
  case object DomInt extends LDomain   // int/bigint: discrete, plain print
  case object DomDate extends LDomain  // epoch days: discrete, date print
  case object DomTs extends LDomain    // epoch micros: continuous, ts print

  private def parseLVal(s: String, dom: LDomain): Long = dom match {
    case DomInt => s.trim.toLong
    case DomDate => TimeFmt.parseDate(stripQuotes(s))
    case DomTs => TimeFmt.parseTs(stripQuotes(s))
  }

  private def printLVal(v: Long, dom: LDomain): String = dom match {
    case DomInt => v.toString
    case DomDate => TimeFmt.printDate(v)
    case DomTs => TimeFmt.printTs(v)
  }

  def stripQuotes(s0: String): String = {
    val s = s0.trim
    if (s.length >= 2 && s.head == '"' && s.last == '"') s.substring(1, s.length - 1)
    else s
  }

  // ---- spans ----

  /** Parse `[lo, hi)` over a Long domain (int/bigint/date/tstz). */
  def parseSpanL(s0: String, dom: LDomain): SpanL = {
    val s = s0.trim
    require(s.length >= 3 && "[(".contains(s.head) && ")]".contains(s.last),
      s"bad span literal '$s0'")
    val lInc = s.head == '['
    val uInc = s.last == ']'
    val parts = splitTop(s.substring(1, s.length - 1))
    require(parts.length == 2, s"bad span literal '$s0'")
    val lo = parseLVal(parts(0), dom)
    val hi = parseLVal(parts(1), dom)
    SpanAlg.makeL(lo, hi, lInc, uInc, discrete = dom != DomTs)
  }

  def parseSpanD(s0: String): SpanD = {
    val s = s0.trim
    val lInc = s.head == '['
    val uInc = s.last == ']'
    val parts = splitTop(s.substring(1, s.length - 1))
    SpanAlg.makeD(parts(0).trim.toDouble, parts(1).trim.toDouble, lInc, uInc)
  }

  def printSpanL(sp: SpanL, dom: LDomain): String =
    (if (sp.lowerInc) "[" else "(") + printLVal(sp.lower, dom) + ", " +
      printLVal(sp.upper, dom) + (if (sp.upperInc) "]" else ")")

  def printSpanD(sp: SpanD): String =
    (if (sp.lowerInc) "[" else "(") + TimeFmt.printFloat(sp.lower) + ", " +
      TimeFmt.printFloat(sp.upper) + (if (sp.upperInc) "]" else ")")

  def printSpanD(sp: SpanD, digits: Int): String =
    (if (sp.lowerInc) "[" else "(") + TimeFmt.printFloat(sp.lower, digits) + ", " +
      TimeFmt.printFloat(sp.upper, digits) + (if (sp.upperInc) "]" else ")")

  /** Text-domain span: bounds print quoted like textset elements. */
  def parseSpanS(s0: String): SpanS = {
    val s = s0.trim
    require(s.length >= 3 && "[(".contains(s.head) && ")]".contains(s.last),
      s"bad span literal '$s0'")
    val parts = splitTop(s.substring(1, s.length - 1))
    require(parts.length == 2, s"bad span literal '$s0'")
    SpanSAlg.make(stripQuotes(parts(0).trim), stripQuotes(parts(1).trim),
      s.head == '[', s.last == ']')
  }

  def printSpanS(sp: SpanS): String =
    (if (sp.lowerInc) "[" else "(") + "\"" + sp.lower + "\", \"" + sp.upper +
      "\"" + (if (sp.upperInc) "]" else ")")

  def parseSpanSetS(s: String): Array[SpanS] =
    SpanSAlg.normalize(splitTop(innerBraceS(s)).map(parseSpanS))

  def printSpanSetS(ss: Array[SpanS]): String =
    ss.map(printSpanS).mkString("{", ", ", "}")

  private def innerBraceS(s0: String): String = {
    val s = s0.trim
    require(s.head == '{' && s.last == '}', s"bad spanset literal '$s0'")
    s.substring(1, s.length - 1)
  }

  // ---- sets ----

  private def innerBrace(s0: String): String = {
    val s = s0.trim
    require(s.head == '{' && s.last == '}', s"bad set literal '$s0'")
    s.substring(1, s.length - 1)
  }

  def parseSetL(s: String, dom: LDomain): Array[Long] =
    SetAlg.makeL(splitTop(innerBrace(s)).map(parseLVal(_, dom)))
  def parseSetD(s: String): Array[Double] =
    SetAlg.makeD(splitTop(innerBrace(s)).map(_.trim.toDouble))
  def parseSetS(s: String): Array[String] =
    SetAlg.makeS(splitTop(innerBrace(s)).map(stripQuotes))

  /** Print set: numeric/date unquoted, tstz/text double-quoted
    * (ref test/sql/set.test:10-29). */
  def printSetL(vs: Array[Long], dom: LDomain): String = dom match {
    case DomTs => vs.map(v => "\"" + printLVal(v, dom) + "\"").mkString("{", ", ", "}")
    case _ => vs.map(printLVal(_, dom)).mkString("{", ", ", "}")
  }
  def printSetD(vs: Array[Double]): String =
    vs.map(TimeFmt.printFloat).mkString("{", ", ", "}")
  def printSetD(vs: Array[Double], digits: Int): String =
    vs.map(TimeFmt.printFloat(_, digits)).mkString("{", ", ", "}")
  def printSetS(vs: Array[String]): String =
    vs.map(v => "\"" + v + "\"").mkString("{", ", ", "}")

  // ---- spansets ----

  def parseSpanSetL(s: String, dom: LDomain): Array[SpanL] =
    SpanSetAlg.normalize(splitTop(innerBrace(s)).map(parseSpanL(_, dom)))

  def parseSpanSetD(s: String): Array[SpanD] = {
    // normalize via sort+merge on doubles
    val spans = splitTop(innerBrace(s)).map(parseSpanD).sortBy(x => (x.lower, x.upper))
    val out = scala.collection.mutable.ArrayBuffer[SpanD]()
    for (sp <- spans) {
      if (out.nonEmpty && SpanAlg.overlapsD(out.last, sp)) {
        val l = out.last
        out(out.length - 1) = SpanD(l.lower, math.max(l.upper, sp.upper), l.lowerInc,
          if (sp.upper >= l.upper) sp.upperInc else l.upperInc)
      } else out += sp
    }
    out.toArray
  }

  def printSpanSetL(ss: Array[SpanL], dom: LDomain): String =
    ss.map(printSpanL(_, dom)).mkString("{", ", ", "}")
  def printSpanSetD(ss: Array[SpanD]): String =
    ss.map(printSpanD).mkString("{", ", ", "}")
  def printSpanSetD(ss: Array[SpanD], digits: Int): String =
    ss.map(printSpanD(_, digits)).mkString("{", ", ", "}")

  // ---- temporal values ----

  sealed trait TKind
  case object KInt extends TKind
  case object KFloat extends TKind
  case object KBool extends TKind

  private def parseNumVal(s: String, k: TKind): Double = k match {
    case KInt => s.trim.toLong.toDouble
    case KFloat => s.trim.toDouble
    case KBool => s.trim.toLowerCase match {
      case "t" | "true" => 1.0
      case "f" | "false" => 0.0
      case other => throw new IllegalArgumentException(s"bad bool '$other'")
    }
  }

  def printNumVal(v: Double, k: TKind): String = k match {
    case KInt => v.toLong.toString
    case KFloat => TimeFmt.printFloat(v)
    case KBool => if (v != 0.0) "t" else "f"
  }

  /** Split `value@timestamp` at the last top-level '@'. */
  private def splitAt(s: String): (String, String) = {
    var inQ = false; var depth = 0; var pos = -1
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '"') inQ = false }
      else c match {
        case '"' => inQ = true
        case '(' | '[' | '{' => depth += 1
        case ')' | ']' | '}' => depth -= 1
        case '@' if depth == 0 => pos = i
        case _ => ()
      }
      i += 1
    }
    require(pos > 0, s"no '@' in temporal instant '$s'")
    (s.substring(0, pos), s.substring(pos + 1))
  }

  /** Default interp for continuous sequences: linear for tfloat,
    * step for tint/tbool/ttext (ref temporal_functions.cpp:153
    * temptype_continuous). */
  def defaultInterp(k: TKind): Byte = k match {
    case KFloat => Interp.Linear
    case _ => Interp.Step
  }

  def parseTNum(s0: String, k: TKind): TNum = {
    var s = s0.trim
    var forcedInterp: Byte = -1
    if (s.toLowerCase.startsWith("interp=")) {
      val i = s.indexOf(';')
      forcedInterp = Interp.parse(s.substring(7, i))
      s = s.substring(i + 1).trim
    }
    def seqInterp(default: Byte): Byte = if (forcedInterp >= 0) forcedInterp else default
    if (s.head == '{') {
      val inner = innerBrace(s).trim
      if (inner.startsWith("[") || inner.startsWith("(")) {
        // sequence set
        val seqs = splitTop(innerBrace(s)).map { part =>
          parseContSeq(part.trim, k)
        }
        TNumAlg.sequenceSet(seqs, seqInterp(defaultInterp(k)))
      } else {
        // discrete sequence
        val ivs = splitTop(inner).map(p => splitAt(p.trim))
        val vs = ivs.map(p => parseNumVal(p._1, k))
        val ts = ivs.map(p => TimeFmt.parseTs(p._2))
        TNumAlg.sequence(vs, ts, Interp.Discrete)
      }
    } else if (s.head == '[' || s.head == '(') {
      val seq = parseContSeq(s, k)
      TNum(Subtype.Sequence, seqInterp(defaultInterp(k)), Array(seq))
    } else {
      val (v, t) = splitAt(s)
      TNumAlg.instant(parseNumVal(v, k), TimeFmt.parseTs(t))
    }
  }

  private def parseContSeq(s: String, k: TKind): TNumSeq = {
    val lInc = s.head == '['
    val uInc = s.last == ']'
    val ivs = splitTop(s.substring(1, s.length - 1)).map(p => splitAt(p.trim))
    TNumSeq(ivs.map(p => parseNumVal(p._1, k)), ivs.map(p => TimeFmt.parseTs(p._2)), lInc, uInc)
  }

  def printTNum(t: TNum, k: TKind): String = {
    def inst(v: Double, ts: Long) = s"${printNumVal(v, k)}@${TimeFmt.printTs(ts)}"
    def seq(s: TNumSeq): String = {
      val body = (0 until s.n).map(i => inst(s.vs(i), s.ts(i))).mkString(", ")
      (if (s.lInc) "[" else "(") + body + (if (s.uInc) "]" else ")")
    }
    t.subtype match {
      case Subtype.Instant => inst(t.seqs.head.vs.head, t.seqs.head.ts.head)
      case Subtype.Sequence =>
        if (t.interp == Interp.Discrete)
          (0 until t.seqs.head.n).map(i => inst(t.seqs.head.vs(i), t.seqs.head.ts(i)))
            .mkString("{", ", ", "}")
        else seq(t.seqs.head)
      case Subtype.SequenceSet => t.seqs.map(seq).mkString("{", ", ", "}")
    }
  }

  // ---- ttext ----

  def parseTText(s0: String): TText = {
    val s = s0.trim
    def one(p: String): (String, Long) = {
      val (v, t) = splitAt(p.trim)
      (stripQuotes(v), TimeFmt.parseTs(t))
    }
    if (s.head == '{') {
      val inner = innerBrace(s).trim
      if (inner.startsWith("[") || inner.startsWith("(")) {
        val seqs = splitTop(innerBrace(s)).map { part =>
          val q = part.trim
          val ivs = splitTop(q.substring(1, q.length - 1)).map(one)
          TTextSeq(ivs.map(_._1), ivs.map(_._2), q.head == '[', q.last == ']')
        }
        TText(Subtype.SequenceSet, Interp.Step, seqs.sortBy(_.ts.head))
      } else {
        val ivs = splitTop(inner).map(one)
        TText(Subtype.Sequence, Interp.Discrete,
          Array(TTextSeq(ivs.map(_._1), ivs.map(_._2), lInc = true, uInc = true)))
      }
    } else if (s.head == '[' || s.head == '(') {
      val ivs = splitTop(s.substring(1, s.length - 1)).map(one)
      TText(Subtype.Sequence, Interp.Step,
        Array(TTextSeq(ivs.map(_._1), ivs.map(_._2), s.head == '[', s.last == ']')))
    } else {
      val (v, t) = one(s)
      TText(Subtype.Instant, Interp.None,
        Array(TTextSeq(Array(v), Array(t), lInc = true, uInc = true)))
    }
  }

  def printTText(t: TText): String = {
    def inst(v: String, ts: Long) = "\"" + v + "\"@" + TimeFmt.printTs(ts)
    def seq(s: TTextSeq): String = {
      val body = s.vs.indices.map(i => inst(s.vs(i), s.ts(i))).mkString(", ")
      (if (s.lInc) "[" else "(") + body + (if (s.uInc) "]" else ")")
    }
    t.subtype match {
      case Subtype.Instant => inst(t.seqs.head.vs.head, t.seqs.head.ts.head)
      case Subtype.Sequence =>
        if (t.interp == Interp.Discrete)
          t.seqs.head.vs.indices.map(i => inst(t.seqs.head.vs(i), t.seqs.head.ts(i)))
            .mkString("{", ", ", "}")
        else seq(t.seqs.head)
      case Subtype.SequenceSet => t.seqs.map(seq).mkString("{", ", ", "}")
    }
  }

  // ---- tgeompoint ----

  private val pointRe =
    """(?i)\s*(?:srid=(\d+);)?\s*point\s*z?\s*\(\s*([-\d.eE+]+)\s+([-\d.eE+]+)(?:\s+([-\d.eE+]+))?\s*\)\s*""".r

  /** Parse `Point(x y)` / `Point(x y z)` (ref 3D literals,
    * test/sql/tgeompoint.test:168). z = NaN when absent. */
  def parsePointVal(s: String): (Double, Double, Double, Int) = s match {
    case pointRe(srid, x, y, z) =>
      (x.toDouble, y.toDouble, if (z == null) Double.NaN else z.toDouble,
        if (srid == null) 0 else srid.toInt)
    case _ => throw new IllegalArgumentException(s"bad point literal '$s'")
  }

  def parseTPoint(s0: String): TPoint = {
    var s = s0.trim
    var srid = 0
    if (s.toLowerCase.startsWith("srid=")) {
      val i = s.indexOf(';')
      srid = s.substring(5, i).toInt
      s = s.substring(i + 1).trim
    }
    var forcedInterp: Byte = -1
    if (s.toLowerCase.startsWith("interp=")) {
      val i = s.indexOf(';')
      forcedInterp = Interp.parse(s.substring(7, i))
      s = s.substring(i + 1).trim
    }
    def one(p: String): (Double, Double, Double, Long) = {
      val (v, t) = splitAtOf(p.trim)
      val (x, y, z, sr) = parsePointVal(v)
      if (sr != 0) srid = sr
      (x, y, z, TimeFmt.parseTs(t))
    }
    // a sequence is 3D iff its points carry z (mixed dims rejected like
    // the reference's MEOS parser)
    def mkSeq(ivs: Array[(Double, Double, Double, Long)],
              lInc: Boolean, uInc: Boolean): TPointSeq = {
      val any3d = ivs.exists(v => !v._3.isNaN)
      if (any3d && ivs.exists(v => v._3.isNaN))
        throw new IllegalArgumentException("mixed 2D/3D points in sequence")
      TPointSeq(ivs.map(_._1), ivs.map(_._2), ivs.map(_._4), lInc, uInc,
        if (any3d) ivs.map(_._3) else null)
    }
    def interpOr(d: Byte): Byte = if (forcedInterp >= 0) forcedInterp else d
    if (s.head == '{') {
      val inner = innerBrace(s).trim
      if (inner.startsWith("[") || inner.startsWith("(")) {
        val seqs = splitTop(innerBrace(s)).map { part =>
          val q = part.trim
          val ivs = splitTop(q.substring(1, q.length - 1)).map(one)
          mkSeq(ivs, q.head == '[', q.last == ']')
        }
        TPoint(Subtype.SequenceSet, interpOr(Interp.Linear), srid, seqs.sortBy(_.startT))
      } else {
        val ivs = splitTop(inner).map(one)
        TPoint(Subtype.Sequence, Interp.Discrete, srid,
          Array(mkSeq(ivs, lInc = true, uInc = true)))
      }
    } else if (s.head == '[' || s.head == '(') {
      val ivs = splitTop(s.substring(1, s.length - 1)).map(one)
      TPoint(Subtype.Sequence, interpOr(Interp.Linear), srid,
        Array(mkSeq(ivs, s.head == '[', s.last == ']')))
    } else {
      val (x, y, z, t) = one(s)
      if (z.isNaN) TPointAlg.instant(x, y, t, srid)
      else TPoint(Subtype.Instant, Interp.None, srid,
        Array(TPointSeq(Array(x), Array(y), Array(t), lInc = true, uInc = true, Array(z))))
    }
  }

  /** splitAt that ignores '@' inside parens (POINT(1 1)@ts is fine anyway). */
  private def splitAtOf(s: String): (String, String) = {
    var depth = 0; var pos = -1; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case '@' if depth == 0 => pos = i
        case _ => ()
      }
      i += 1
    }
    require(pos > 0, s"no '@' in '$s'")
    (s.substring(0, pos), s.substring(pos + 1))
  }

  private def hex(b: Array[Byte]): String =
    b.map(x => f"$x%02X").mkString

  /** Default output: WKB hex per point (ref tgeompoint.test golden
    * `0101000000...@2012-01-01 08:00:00+00`). */
  def printTPoint(t: TPoint): String =
    printTPointWith(t, (s, i) =>
      if (s.is3d) hex(Wkb.writePointZ(s.xs(i), s.ys(i), s.zs(i)))
      else hex(Wkb.writePoint(s.xs(i), s.ys(i))))

  /** asText / asEWKT output: `POINT(1 1)@...` (EWKT adds SRID=n; prefix). */
  def printTPointText(t: TPoint): String =
    printTPointWith(t, (s, i) =>
      if (s.is3d)
        s"POINT Z (${TimeFmt.printFloat(s.xs(i))} ${TimeFmt.printFloat(s.ys(i))} ${TimeFmt.printFloat(s.zs(i))})"
      else s"POINT(${TimeFmt.printFloat(s.xs(i))} ${TimeFmt.printFloat(s.ys(i))})")

  def printTPointEwkt(t: TPoint): String = {
    val base = printTPointText(t)
    if (t.srid != 0) s"SRID=${t.srid};$base" else base
  }

  private def printTPointWith(t: TPoint, pf: (TPointSeq, Int) => String): String = {
    def inst(s: TPointSeq, i: Int) = s"${pf(s, i)}@${TimeFmt.printTs(s.ts(i))}"
    def seq(s: TPointSeq): String = {
      val body = (0 until s.n).map(inst(s, _)).mkString(", ")
      (if (s.lInc) "[" else "(") + body + (if (s.uInc) "]" else ")")
    }
    t.subtype match {
      case Subtype.Instant => inst(t.seqs.head, 0)
      case Subtype.Sequence =>
        if (t.interp == Interp.Discrete)
          (0 until t.seqs.head.n).map(inst(t.seqs.head, _)).mkString("{", ", ", "}")
        else seq(t.seqs.head)
      case Subtype.SequenceSet => t.seqs.map(seq).mkString("{", ", ", "}")
    }
  }

  // ---- tgeometry ----

  def parseTGeom(s0: String): TGeom = {
    var s = s0.trim
    var srid = 0
    if (s.toLowerCase.startsWith("srid=")) {
      val i = s.indexOf(';')
      srid = s.substring(5, i).toInt
      s = s.substring(i + 1).trim
    }
    var forcedInterp: Byte = -1
    if (s.toLowerCase.startsWith("interp=")) {
      val i = s.indexOf(';')
      forcedInterp = Interp.parse(s.substring(7, i))
      s = s.substring(i + 1).trim
    }
    def one(p: String): (Array[Byte], Long) = {
      val (v, t) = splitAtDepth0(p.trim)
      (Wkb.fromText(stripQuotes(v)), TimeFmt.parseTs(t))
    }
    def interpOr(d: Byte): Byte = if (forcedInterp >= 0) forcedInterp else d
    if (s.head == '{') {
      val inner = innerBrace(s).trim
      if (inner.startsWith("[") || inner.startsWith("(")) {
        val seqs = splitTop(innerBrace(s)).map { part =>
          val q = part.trim
          val ivs = splitTop(q.substring(1, q.length - 1)).map(one)
          TGeomSeq(ivs.map(_._1), ivs.map(_._2), q.head == '[', q.last == ']')
        }
        TGeom(Subtype.SequenceSet, interpOr(Interp.Step), srid, seqs.sortBy(_.ts.head))
      } else {
        val ivs = splitTop(inner).map(one)
        TGeom(Subtype.Sequence, Interp.Discrete, srid,
          Array(TGeomSeq(ivs.map(_._1), ivs.map(_._2), lInc = true, uInc = true)))
      }
    } else if (s.head == '[' || s.head == '(') {
      val ivs = splitTop(s.substring(1, s.length - 1)).map(one)
      TGeom(Subtype.Sequence, interpOr(Interp.Step), srid,
        Array(TGeomSeq(ivs.map(_._1), ivs.map(_._2), s.head == '[', s.last == ']')))
    } else {
      val (w, t) = one(s)
      TGeomAlg.instant(w, t, srid)
    }
  }

  private def splitAtDepth0(s: String): (String, String) = {
    var depth = 0; var pos = -1; var i = 0; var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '"') inQ = false }
      else c match {
        case '"' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case '@' if depth == 0 => pos = i
        case _ => ()
      }
      i += 1
    }
    require(pos > 0, s"no '@' in '$s'")
    (s.substring(0, pos), s.substring(pos + 1))
  }

  private def hexStr(b: Array[Byte]): String = b.map(x => f"$x%02X").mkString

  def printTGeom(t: TGeom): String = printTGeomWith(t, hexStr)
  def printTGeomText(t: TGeom): String = printTGeomWith(t, Wkb.asText)
  def printTGeomEwkt(t: TGeom): String = {
    val base = printTGeomText(t)
    if (t.srid != 0) s"SRID=${t.srid};$base" else base
  }

  private def printTGeomWith(t: TGeom, pf: Array[Byte] => String): String = {
    def inst(s: TGeomSeq, i: Int) = s"${pf(s.ws(i))}@${TimeFmt.printTs(s.ts(i))}"
    def seq(s: TGeomSeq): String = {
      val body = (0 until s.n).map(inst(s, _)).mkString(", ")
      (if (s.lInc) "[" else "(") + body + (if (s.uInc) "]" else ")")
    }
    t.subtype match {
      case Subtype.Instant => inst(t.gseqs.head, 0)
      case Subtype.Sequence =>
        if (t.interp == Interp.Discrete)
          (0 until t.gseqs.head.n).map(inst(t.gseqs.head, _)).mkString("{", ", ", "}")
        else seq(t.gseqs.head)
      case Subtype.SequenceSet => t.gseqs.map(seq).mkString("{", ", ", "}")
    }
  }

  // ---- geomset / geogset ----

  def parseGeoSet(s0: String, geodetic: Boolean): GeoSet = {
    var s = s0.trim
    var srid = 0
    if (s.toLowerCase.startsWith("srid=")) {
      val i = s.indexOf(';')
      srid = s.substring(5, i).toInt
      s = s.substring(i + 1).trim
    }
    if (geodetic && srid == 0) srid = 4326
    val elems = splitTop(innerBrace(s)).map(e => Wkb.fromText(stripQuotes(e)))
    GeoSet(elems, srid, geodetic)
  }

  def printGeoSetText(g: GeoSet, digits: Int = -1): String =
    g.wkbs.map(w => "\"" + Wkb.asText(w, digits) + "\"").mkString("{", ", ", "}")

  def printGeoSetEwkt(g: GeoSet, digits: Int = -1): String = {
    val base = printGeoSetText(g, digits)
    if (g.gsrid != 0) s"SRID=${g.gsrid};$base" else base
  }

  def printGeoSet(g: GeoSet): String =
    g.wkbs.map(hexStr).mkString("{", ", ", "}")

  // ---- TBox ----

  def parseTBox(s0: String): TBox = {
    val s = s0.trim
    val up = s.toUpperCase
    val isInt = up.startsWith("TBOXINT")
    val rest0 = s.substring(if (isInt || up.startsWith("TBOXFLOAT")) {
      if (isInt) 7 else 9
    } else 4).trim
    val dimEnd = rest0.indexOf('(')
    val dims = rest0.substring(0, dimEnd).trim.toUpperCase
    val body = rest0.substring(dimEnd + 1, rest0.length - 1).trim
    dims match {
      case "XT" =>
        // [span],[tspan] — optional comma between (ref tbox.test optional comma)
        val cut = findSpanSplit(body)
        val vs = body.substring(0, cut).trim.stripSuffix(",").trim
        val ts = body.substring(cut).trim
        val vspan =
          if (isInt) { val sp = parseSpanL(vs, DomInt); SpanD(sp.lower.toDouble, sp.upper.toDouble, sp.lowerInc, sp.upperInc) }
          else parseSpanD(vs)
        BoxAlg.tbox(vspan, parseSpanL(ts, DomTs), xInt = isInt)
      case "X" =>
        val vspan =
          if (isInt) { val sp = parseSpanL(body, DomInt); SpanD(sp.lower.toDouble, sp.upper.toDouble, sp.lowerInc, sp.upperInc) }
          else parseSpanD(body)
        BoxAlg.tboxFromSpanD(vspan, xInt = isInt)
      case "T" => BoxAlg.tboxFromTSpan(parseSpanL(body, DomTs))
      case other => throw new IllegalArgumentException(s"bad TBOX dims '$other'")
    }
  }

  /** Find the index where the second top-level '[' or '(' span starts. */
  private def findSpanSplit(body: String): Int = {
    var depth = 0; var i = 0; var seenFirst = false
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '[' || c == '(') {
        if (depth == 0) {
          if (seenFirst) return i
          seenFirst = true
        }
        depth += 1
      } else if (c == ']' || c == ')') depth -= 1
      i += 1
    }
    body.length
  }

  def printTBox(b: TBox): String = {
    val name = if (!b.hasX) "TBOX" else if (b.xInt) "TBOXINT" else "TBOXFLOAT"
    def vspan =
      if (b.xInt)
        (if (b.xminInc) "[" else "(") + b.xmin.toLong + ", " + b.xmax.toLong +
          (if (b.xmaxInc) "]" else ")")
      else printSpanD(SpanD(b.xmin, b.xmax, b.xminInc, b.xmaxInc))
    def tspan = printSpanL(SpanL(b.tmin, b.tmax, b.tminInc, b.tmaxInc), DomTs)
    if (b.hasX && b.hasT) s"$name XT($vspan,$tspan)"
    else if (b.hasX) s"$name X($vspan)"
    else s"$name T($tspan)"
  }

  // ---- STBox ----

  def parseSTBox(s0: String): STBox = {
    var s = s0.trim
    var srid = 0
    if (s.toLowerCase.startsWith("srid=")) {
      val i = s.indexOf(';')
      srid = s.substring(5, i).toInt
      s = s.substring(i + 1).trim
    }
    val up = s.toUpperCase
    val geodetic = up.startsWith("GEODSTBOX")
    val rest0 = s.substring(if (geodetic) 9 else 5).trim
    if (geodetic && srid == 0) srid = 4326
    val dimEnd = rest0.indexOf('(')
    val dims = rest0.substring(0, dimEnd).trim.toUpperCase
    val body = rest0.substring(dimEnd + 1, rest0.length - 1).trim
    def parseCorner(c: String): Array[Double] =
      splitTop(c.trim.stripPrefix("(").stripSuffix(")")).map(_.trim.toDouble)
    def parseXBody(b: String): (Array[Double], Array[Double]) = {
      val parts = splitTop(b)
      (parseCorner(parts(0)), parseCorner(parts(1)))
    }
    dims match {
      case "X" | "Z" =>
        val (lo, hi) = parseXBody(body)
        val hasZ = lo.length == 3
        STBox(lo(0), hi(0), lo(1), hi(1), if (hasZ) lo(2) else 0, if (hasZ) hi(2) else 0,
          0, 0, false, false, srid, geodetic,
          hasX = true, hasZ = hasZ, hasT = false)
      case "XT" | "ZT" =>
        // ((lo),(hi)),[span]
        val cut = body.lastIndexOf(',', findTimeBracket(body) - 1)
        val xPart = body.substring(0, cut).trim
        val tPart = body.substring(cut + 1).trim
        val (lo, hi) = parseXBody(xPart.stripPrefix("(").stripSuffix(")"))
        val hasZ = lo.length == 3
        val tsp = parseSpanL(tPart, DomTs)
        STBox(lo(0), hi(0), lo(1), hi(1), if (hasZ) lo(2) else 0, if (hasZ) hi(2) else 0,
          tsp.lower, tsp.upper, tsp.lowerInc, tsp.upperInc, srid, geodetic,
          hasX = true, hasZ = hasZ, hasT = true)
      case "T" =>
        val tsp = parseSpanL(body, DomTs)
        STBox(0, 0, 0, 0, 0, 0, tsp.lower, tsp.upper, tsp.lowerInc, tsp.upperInc,
          srid, geodetic, hasX = false, hasZ = false, hasT = true)
      case other => throw new IllegalArgumentException(s"bad STBOX dims '$other'")
    }
  }

  private def findTimeBracket(body: String): Int = {
    // index of the '[' or '(' that starts the trailing time span
    var depth = 0; var i = 0; var last = -1
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '(' || c == '[') { if (depth == 0) last = i; depth += 1 }
      else if (c == ')' || c == ']') depth -= 1
      i += 1
    }
    last
  }

  def printSTBox(b: STBox): String = {
    val name = if (b.geodetic) "GEODSTBOX" else "STBOX"
    val sridPrefix = if (b.srid != 0 && b.hasX) s"SRID=${b.srid};" else ""
    def f(v: Double) = TimeFmt.printFloat(v)
    def corner3(x: Double, y: Double, z: Double) =
      if (b.hasZ) s"(${f(x)},${f(y)},${f(z)})" else s"(${f(x)},${f(y)})"
    def tspan = printSpanL(SpanL(b.tmin, b.tmax, b.tminInc, b.tmaxInc), DomTs)
    val dims = (if (b.hasX) (if (b.hasZ) "Z" else "X") else "") + (if (b.hasT) "T" else "")
    if (b.hasX && b.hasT)
      s"$sridPrefix$name $dims((${corner3(b.xmin, b.ymin, b.zmin)},${corner3(b.xmax, b.ymax, b.zmax)}),$tspan)"
    else if (b.hasX)
      s"$sridPrefix$name $dims(${corner3(b.xmin, b.ymin, b.zmin)},${corner3(b.xmax, b.ymax, b.zmax)})"
    else
      s"$sridPrefix$name $dims($tspan)"
  }

  // ---- intervals ----

  def printIntervalUs(us: Long): String = TimeFmt.printInterval(us)
}
