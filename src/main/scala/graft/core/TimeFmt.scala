package graft.core

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Timestamp / date / interval / float text I/O in the Postgres style the
  * reference prints (ref: docs/MEOS-DuckDB Type Conversion.md:4-14 and the
  * golden outputs in test/sql tests — e.g. `2001-01-01 08:00:00+00`).
  *
  * Internal representation is epoch MICROS (UTC) for timestamps and epoch
  * DAYS for dates — no 2000-01-01 epoch shift anywhere inside the engine
  * (that is a MEOS-internal detail, ref src/include/time_util.hpp:9-30);
  * we only ever format/parse the textual form.
  */
object TimeFmt {
  val UsPerSec: Long = 1000000L
  val UsPerDay: Long = 86400L * UsPerSec

  // ---- timestamps (epoch micros, UTC) ----

  private val dateRe =
    """^(\d{4})-(\d{2})-(\d{2})$""".r
  private val tsRe =
    """^(\d{4})-(\d{2})-(\d{2})[ T](\d{2}):(\d{2})(?::(\d{2})(\.\d{1,9})?)?\s*(?:([+-]\d{2})(?::?(\d{2}))?|Z)?$""".r

  /** Parse `YYYY-MM-DD[ HH:MM[:SS[.ffffff]]][+HH[:MM]]` → epoch micros.
    * Date-only means midnight UTC. Offset is normalized away (stored UTC). */
  def parseTs(s0: String): Long = {
    val s = s0.trim
    s match {
      case dateRe(y, m, d) =>
        LocalDate.of(y.toInt, m.toInt, d.toInt).toEpochDay * UsPerDay
      case tsRe(y, mo, d, h, mi, se, frac, offH, offM) =>
        val sec = if (se == null) 0 else se.toInt
        val micros =
          if (frac == null) 0L
          else (frac.toDouble * 1e6).round
        val ldt = LocalDateTime.of(y.toInt, mo.toInt, d.toInt, h.toInt, mi.toInt, sec)
        val base = ldt.toEpochSecond(ZoneOffset.UTC) * UsPerSec + micros
        val offUs =
          if (offH == null) 0L
          else {
            val sign = if (offH.startsWith("-")) -1L else 1L
            val hAbs = offH.replaceAll("[+-]", "").toLong
            val mAbs = if (offM == null) 0L else offM.toLong
            sign * (hAbs * 3600 + mAbs * 60) * UsPerSec
          }
        base - offUs
      case _ =>
        throw new IllegalArgumentException(s"invalid timestamp literal: '$s0'")
    }
  }

  private val outFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Print epoch micros as `YYYY-MM-DD HH:MM:SS[.ffffff]+00`. */
  def printTs(us: Long): String = {
    val secs = Math.floorDiv(us, UsPerSec)
    val frac = Math.floorMod(us, UsPerSec)
    val base = LocalDateTime.ofEpochSecond(secs, 0, ZoneOffset.UTC).format(outFmt)
    if (frac == 0) base + "+00"
    else {
      var f = f"$frac%06d"
      while (f.endsWith("0")) f = f.dropRight(1)
      s"$base.$f+00"
    }
  }

  // ---- dates (epoch days) ----

  def parseDate(s: String): Long = LocalDate.parse(s.trim).toEpochDay

  def printDate(days: Long): String = LocalDate.ofEpochDay(days).toString

  // ---- intervals (Postgres duration style: "2 days 01:30:00") ----

  /** Print a micros duration Postgres-style: `N days`, `HH:MM:SS[.ffffff]`,
    * or both (ref README.md:63-71 golden `2 days`). */
  def printInterval(us0: Long): String = {
    val neg = us0 < 0
    val us = math.abs(us0)
    val days = us / UsPerDay
    val rem = us % UsPerDay
    val sb = new StringBuilder
    if (neg && (days > 0 || rem > 0)) sb.append("-")
    if (days > 0) {
      sb.append(days).append(if (days == 1) " day" else " days")
      if (rem > 0) sb.append(" ")
    }
    if (rem > 0 || days == 0) {
      val h = rem / (3600 * UsPerSec)
      val m = (rem / (60 * UsPerSec)) % 60
      val s = (rem / UsPerSec) % 60
      val f = rem % UsPerSec
      sb.append(f"$h%02d:$m%02d:$s%02d")
      if (f > 0) {
        var fs = f"$f%06d"
        while (fs.endsWith("0")) fs = fs.dropRight(1)
        sb.append(".").append(fs)
      }
    }
    sb.toString
  }

  // ---- floats (15 significant digits, trailing zeros trimmed) ----

  /** MEOS `OUT_DEFAULT_DECIMAL_DIGITS`=15 style float printing
    * (ref src/include/tydef.hpp:77): up to 15 digits AFTER the decimal
    * point, trailing zeros trimmed: `3.0` → `3`, `pi/2` →
    * `1.570796326794897`. */
  def printFloat(v: Double): String = {
    if (v.isNaN) return "NaN"
    if (v.isInfinite) return if (v > 0) "Infinity" else "-Infinity"
    if (v == v.longValue.toDouble && math.abs(v) < 1e15) return v.longValue.toString
    java.math.BigDecimal.valueOf(v)
      .setScale(15, java.math.RoundingMode.HALF_UP)
      .stripTrailingZeros.toPlainString
  }

  /** Like printFloat but with an explicit max-digit override (asText(x, digits)). */
  def printFloat(v: Double, digits: Int): String = {
    if (v == math.rint(v) && math.abs(v) < 1e15) return v.longValue.toString
    val bd = java.math.BigDecimal.valueOf(v).setScale(digits, java.math.RoundingMode.HALF_EVEN)
    bd.stripTrailingZeros.toPlainString
  }
}
