package graft.model

import java.time.{LocalDate, LocalDateTime, ZoneOffset}

/** Timestamp & duration codec with the semantics of the reference's datetime
  * layer (reference: libakumuli/datetime.cpp:60 basic-ISO8601 parse,
  * datetime.cpp:173 `parse_duration`). Timestamps are 64-bit nanoseconds
  * since the UNIX epoch, UTC; text form is *basic* ISO 8601
  * (`YYYYMMDDThhmmss.fffffffff`).
  */
object AkuTime {
  val NsPerSec: Long = 1000000000L

  private val IsoRe =
    """^(\d{4})(\d{2})(\d{2})(?:T(\d{2})(\d{2})(\d{2})(?:\.(\d{1,9}))?)?$""".r
  // Unit table mirrors reference datetime.cpp:174 (n, us, ms, s, m, min, h, d).
  private val DurRe = """^(\d+)\s*(n|us|ms|s|m|min|h|d)?$""".r

  /** Parse a query timestamp: basic-format ISO8601, or raw ns digits.
    * EVERY failure — bad shape, invalid month/day (DateTimeException
    * inside LocalDate), digit strings past Long range — surfaces as the
    * same IllegalArgumentException, so callers (and the HTTP error-line
    * layer) see one normalized parser contract for any byte sequence,
    * like the reference's fuzz-hardened datetime.cpp parse. */
  def parseTs(s: String): Long = s.trim match {
    case IsoRe(y, mo, d, h, mi, se, frac) =>
      val date =
        try LocalDate.of(y.toInt, mo.toInt, d.toInt)
        catch { case _: RuntimeException =>
          throw new IllegalArgumentException(s"bad timestamp: '$s'") }
      // time-of-day fields validate like the date ones: '990000' is a
      // bad timestamp, not 99 hours silently added (= 4 days of shift)
      if (h != null && (h.toInt > 23 || mi.toInt > 59 || se.toInt > 59))
        throw new IllegalArgumentException(s"bad timestamp: '$s'")
      val secs = date.toEpochDay * 86400L +
        (if (h == null) 0L else h.toLong * 3600 + mi.toLong * 60 + se.toLong)
      val ns = if (frac == null) 0L else frac.padTo(9, '0').toLong
      secs * NsPerSec + ns
    case t if t.nonEmpty && t.forall(_.isDigit) =>
      try t.toLong catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"bad timestamp: '$t'") }
    case other => throw new IllegalArgumentException(s"bad timestamp: '$other'")
  }

  /** `10s`, `1m`, `100ms` ... -> nanoseconds. Overflow (count past Long
    * range, or count x unit wrapping 2^63) is a bad duration, not a
    * silently negative interval. */
  def parseDuration(s: String): Long = s.trim match {
    case DurRe(num, unit) =>
      val k = unit match {
        case null | "n"  => 1L
        case "us"        => 1000L
        case "ms"        => 1000000L
        case "s"         => NsPerSec
        case "m" | "min" => 60L * NsPerSec
        case "h"         => 3600L * NsPerSec
        case "d"         => 86400L * NsPerSec
      }
      try Math.multiplyExact(k, num.toLong)
      catch { case _: RuntimeException =>
        throw new IllegalArgumentException(s"bad duration: '$s'") }
    case other => throw new IllegalArgumentException(s"bad duration: '$other'")
  }

  /** ns -> basic ISO8601 with full ns fraction (reference datetime.cpp:150). */
  def formatIso(ns: Long): String = {
    val ldt =
      LocalDateTime.ofEpochSecond(Math.floorDiv(ns, NsPerSec), 0, ZoneOffset.UTC)
    f"${ldt.getYear}%04d${ldt.getMonthValue}%02d${ldt.getDayOfMonth}%02d" +
      f"T${ldt.getHour}%02d${ldt.getMinute}%02d${ldt.getSecond}%02d" +
      f".${Math.floorMod(ns, NsPerSec)}%09d"
  }
}
