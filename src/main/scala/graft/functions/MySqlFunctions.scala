package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MySQL-flavored scalar functions the reference registers in FuncExp that
  * have no direct Spark builtin (reference: utils/funcexp/funcexp.cpp:68-320;
  * func_period.cpp for period_add/period_diff). Implemented as compositions
  * of built-in expressions, so they stay inside whole-stage codegen.
  */
object MySqlFunctions {

  /** Months since year 0 for a YYYYMM period (MySQL canonicalizes YYMM too;
    * we support the YYYYMM form the reference's tests use). */
  private def periodToMonths(p: Column): Column =
    (p.cast("long") / 100).cast("long") * 12 + (p.cast("long") % 100) - 1

  /** MySQL PERIOD_ADD(period, n): add n months to a YYYYMM period. */
  def periodAdd(p: Column, n: Column): Column = {
    val total = periodToMonths(p) + n.cast("long")
    (total / 12).cast("long") * 100 + (total % 12) + 1
  }

  /** MySQL PERIOD_DIFF(p1, p2): months between two YYYYMM periods. */
  def periodDiff(p1: Column, p2: Column): Column =
    periodToMonths(p1) - periodToMonths(p2)

  /** MySQL TIME_TO_SEC on a timestamp's time-of-day. */
  def timeToSec(ts: Column): Column =
    hour(ts) * 3600L + minute(ts) * 60L + second(ts)

  /** MySQL SEC_TO_TIME rendered as HH:MM:SS string. */
  def secToTime(sec: Column): Column = {
    val s = sec.cast("long")
    concat_ws(":",
      lpad((s / 3600).cast("long").cast("string"), 2, "0"),
      lpad(((s % 3600) / 60).cast("long").cast("string"), 2, "0"),
      lpad((s % 60).cast("string"), 2, "0"))
  }

  /** MySQL TO_DAYS: days since year 0 (MySQL's day 0 = 0000-00-00; offset
    * 719528 aligns 1970-01-01 = 719528). */
  def toDays(d: Column): Column =
    datediff(d.cast("date"), to_date(lit("1970-01-01"))) + lit(719528L)

  /** MySQL FROM_DAYS: inverse of toDays. */
  def fromDays(n: Column): Column =
    date_add(to_date(lit("1970-01-01")), (n.cast("long") - 719528L).cast("int"))

  /** MySQL YEARWEEK(date) in default mode 0: YYYYWW with Sunday-start weeks;
    * week 0 days roll into the previous year's last week. */
  def weekMode0(d: Column): Column = {
    val doy = dayofyear(d)
    val jan1Dow = dayofweek(date_trunc("year", d)) // 1 = Sunday
    val daysBeforeFirstSunday = (lit(8) - jan1Dow) % 7
    floor((doy - 1 - daysBeforeFirstSunday) / 7) + 1
  }

  /** MySQL WEEKDAY: 0 = Monday … 6 = Sunday. */
  def weekday(d: Column): Column = (dayofweek(d) + 5) % 7

  /** MySQL format specifier → Java DateTimeFormatter pattern
    * (the subset the reference's func_date_format.cpp handles).
    * Tokenized left-to-right: %% emits a literal percent, literal letters
    * are single-quoted so they can't be misread as pattern letters, and an
    * unmapped specifier fails fast with a clear message. */
  def mysqlFormatToJava(fmt: String): String = {
    val map = Map(
      'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'c' -> "M",
      'd' -> "dd", 'e' -> "d", 'H' -> "HH", 'k' -> "H",
      'h' -> "hh", 'i' -> "mm", 's' -> "ss", 'S' -> "ss",
      'j' -> "DDD", 'a' -> "EEE", 'b' -> "MMM", 'W' -> "EEEE",
      'M' -> "MMMM", 'p' -> "a")
    val out = new StringBuilder
    val literal = new StringBuilder
    def flushLiteral(): Unit = if (literal.nonEmpty) {
      // quote the whole run once; letters would otherwise read as pattern
      // chars, and adjacent single-char quotes ('T''h') mis-parse as an
      // escaped quote
      if (literal.exists(c => c.isLetter || c == '\'')) {
        out.append('\'').append(literal.toString.replace("'", "''"))
          .append('\'')
      } else out.append(literal)
      literal.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%') {
        require(i + 1 < fmt.length, s"dangling % in format '$fmt'")
        val spec = fmt.charAt(i + 1)
        if (spec == '%') { literal.append('%'); i += 2 }
        else {
          flushLiteral()
          out.append(map.getOrElse(spec, throw new IllegalArgumentException(
            s"unsupported MySQL format specifier %$spec in '$fmt'")))
          i += 2
        }
      } else { literal.append(c); i += 1 }
    }
    flushLiteral()
    out.toString
  }

  /** MySQL DATE_FORMAT(ts, '%Y-%m-%d …'). */
  def dateFormat(ts: Column, mysqlFmt: String): Column =
    date_format(ts, mysqlFormatToJava(mysqlFmt))

  /** MySQL STR_TO_DATE(str, '%Y…') → timestamp. */
  def strToDate(s: Column, mysqlFmt: String): Column =
    to_timestamp(s, mysqlFormatToJava(mysqlFmt))

  /** MySQL MAKEDATE(year, dayofyear). */
  def makeDate(y: Column, doy: Column): Column =
    date_add(make_date(y, lit(1), lit(1)), (doy - 1).cast("int"))

  /** MySQL string→number coercion: the longest numeric prefix parses, the
    * rest is ignored, and a non-numeric string is 0 ('12abc'+0 = 12,
    * 'abc'+0 = 0). Spark's cast (ANSI error / NULL) differs; the reference
    * inherits this MySQL accident, so migrations need the shim. */
  def mysqlToNumber(s: Column): Column =
    when(s.isNull, lit(null).cast("double")) // MySQL: NULL propagates
      .otherwise(coalesce(
        regexp_extract(trim(s), "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?", 0)
          .try_cast("double"), // no numeric prefix → empty match → NULL
        lit(0.0)))

  /** MySQL GET_FORMAT(type, region) lookup table
    * (reference: utils/funcexp/func_get_format.cpp:50-56
    * known_date_time_formats). Full MySQL semantics: the reference's own
    * getStrVal (func_get_format.cpp:101-110) only answers for DATE and
    * returns the DATETIME column — a fidelity bug we do not reproduce. */
  private val getFormatTable: Map[(String, String), String] = Map(
    ("DATE", "USA") -> "%m.%d.%Y",
    ("DATE", "JIS") -> "%Y-%m-%d",
    ("DATE", "ISO") -> "%Y-%m-%d",
    ("DATE", "EUR") -> "%d.%m.%Y",
    ("DATE", "INTERNAL") -> "%Y%m%d",
    ("DATETIME", "USA") -> "%Y-%m-%d %H.%i.%s",
    ("DATETIME", "JIS") -> "%Y-%m-%d %H:%i:%s",
    ("DATETIME", "ISO") -> "%Y-%m-%d %H:%i:%s",
    ("DATETIME", "EUR") -> "%Y-%m-%d %H.%i.%s",
    ("DATETIME", "INTERNAL") -> "%Y%m%d%H%i%s",
    ("TIME", "USA") -> "%h:%i:%s %p",
    ("TIME", "JIS") -> "%H:%i:%s",
    ("TIME", "ISO") -> "%H:%i:%s",
    ("TIME", "EUR") -> "%H.%i.%s",
    ("TIME", "INTERNAL") -> "%H%i%s")

  /** MySQL GET_FORMAT(DATE|DATETIME|TIME, 'USA'|'JIS'|'ISO'|'EUR'|'INTERNAL');
    * unknown combinations yield NULL (MySQL behavior). */
  def getFormat(tpe: String, region: String): Column =
    getFormatTable.get((tpe.toUpperCase, region.toUpperCase))
      .map(lit).getOrElse(lit(null).cast("string"))

  /** MAKETIME(h, m, s) → 'HH:MM:SS' string. Out-of-range minute/second →
    * NULL; an hour beyond ±838 saturates the whole TIME to ±838:59:59
    * (reference: utils/funcexp/func_maketime.cpp:160-183, matching MySQL's
    * TIME range endpoint).
    *
    * Known deviation from MySQL proper (reference-faithful on purpose): for
    * single-digit negative hours the reference's snprintf("%02d", h) counts
    * the sign toward the field width, so maketime(-5,10,10) = '-5:10:10'
    * where MySQL returns '-05:10:10'. We pin the reference behavior
    * (FunctionsSpec "maketime negative hours"). */
  def makeTime(h: Column, m: Column, s: Column): Column = {
    val h0 = h.cast("long")
    val m0 = m.cast("long")
    val s0 = s.cast("long")
    val overflow = h0 > 838 || h0 < -838
    val hc = greatest(least(h0, lit(838L)), lit(-838L))
    val mm = when(overflow, lit(59L)).otherwise(m0)
    val ss = when(overflow, lit(59L)).otherwise(s0)
    // format_string mirrors the reference's snprintf("%02d:%02d:%02d", …)
    // exactly (lpad would truncate 3-digit clamped hours)
    when(m0.between(0, 59) && s0.between(0, 59),
      format_string("%02d:%02d:%02d", hc, mm, ss))
      .otherwise(lit(null).cast("string"))
  }

  /** MySQL INET_ATON('a.b.c.d'). */
  def inetAton(ip: Column): Column = {
    val p = split(ip, "\\.")
    p.getItem(0).cast("long") * 16777216L + p.getItem(1).cast("long") * 65536L +
      p.getItem(2).cast("long") * 256L + p.getItem(3).cast("long")
  }

  /** MySQL INET_NTOA(n). */
  def inetNtoa(n: Column): Column = {
    val v = n.cast("long")
    concat_ws(".",
      ((v / 16777216L) % 256).cast("long").cast("string"),
      ((v / 65536L) % 256).cast("long").cast("string"),
      ((v / 256L) % 256).cast("long").cast("string"),
      (v % 256).cast("string"))
  }

  /** MySQL CONVERT_TZ(dt, from, to) for fixed-offset zones ('±HH:MM' —
    * reference: utils/funcexp/func_convert_tz.cpp; the offset form is
    * pure interval arithmetic and therefore engine-portable). Out-of-
    * range offsets (beyond ±13:59, MySQL's limit) return NULL, matching
    * MySQL. Named zones ('America/New_York') should go through Spark's
    * own convert_timezone, which consults the JVM tz database — not
    * replayable in an engine-independent oracle, so not modeled here. */
  def convertTz(dt: Column, from: String, to: String): Column = {
    def offsetSec(z: String): Option[Long] = {
      val m = "^([+-])(\\d{2}):(\\d{2})$".r.findFirstMatchIn(z)
      m.flatMap { g =>
        val sign = if (g.group(1) == "-") -1L else 1L
        val h = g.group(2).toLong
        val mi = g.group(3).toLong
        if (h > 13 || mi > 59) None else Some(sign * (h * 3600 + mi * 60))
      }
    }
    (offsetSec(from), offsetSec(to)) match {
      case (Some(f), Some(t)) =>
        // interval add preserves sub-second precision
        dt + expr(s"INTERVAL ${t - f} SECOND")
      case _ => lit(null).cast("timestamp")
    }
  }
}
