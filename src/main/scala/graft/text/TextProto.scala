package graft.text

import java.nio.charset.StandardCharsets
import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Pure codec functions for the reference's text protocol (ingest lines
  * `key ts v1 v2 …`, printed reads) — the behaviors of sonnerie's
  * `escape_string` crate (`escape_string/src/lib.rs:1-233`), float printing
  * (`src/row_format.rs:275-321`), base64 columns (`src/row_format.rs:353-381`)
  * and timestamp layouts (`src/main.rs:520-543`, `src/formatted.rs:39-47`).
  *
  * Pure JVM functions so they unit-test without Spark; the Spark layer wraps
  * them in typed Dataset maps (ingest path, not the analytical hot path).
  */
object TextProto {

  // ── X1: backslash escape / unescape ────────────────────────────────

  /** Escape whitespace and backslash so a token survives space-splitting
    * (ref `escape_string::escape`): `\a \b \t \n \v \f \r \\ \ ` forms.
    */
  def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '\u0007' => b.append("\\a")
      case '\b'     => b.append("\\b")
      case '\t'     => b.append("\\t")
      case '\n'     => b.append("\\n")
      case '\u000B' => b.append("\\v")
      case '\f'     => b.append("\\f")
      case '\r'     => b.append("\\r")
      case '\\'     => b.append("\\\\")
      case ' '      => b.append("\\ ")
      case c        => b.append(c)
    }
    b.toString
  }

  /** Split one whitespace-delimited, backslash-escaped token off the front;
    * returns (token, rest-after-delimiters). Unknown escapes pass the
    * escaped character through verbatim (ref `split_one`).
    */
  def splitOne(line: String): Option[(String, String)] = {
    if (line.isEmpty) return None
    val b = new StringBuilder
    var i = 0
    var done = false
    while (i < line.length && !done) {
      line.charAt(i) match {
        case '\\' if i + 1 < line.length =>
          line.charAt(i + 1) match {
            case 'a' => b.append('\u0007'); case 'b' => b.append('\b')
            case 't' => b.append('\t');     case 'n' => b.append('\n')
            case 'v' => b.append('\u000B'); case 'f' => b.append('\f')
            case 'r' => b.append('\r')
            case c   => b.append(c)
          }
          i += 2
        case c if c == ' ' || c == '\t' => done = true
        case c => b.append(c); i += 1
      }
    }
    while (i < line.length && (line.charAt(i) == ' ' || line.charAt(i) == '\t')) i += 1
    Some((b.toString, line.substring(i)))
  }

  def unescape(token: String): String =
    splitOne(token).map(_._1).getOrElse("")

  // ── X5: float text with reference fidelity ─────────────────────────

  /** Rust `{:.17}` fixed formatting with `nan` literal
    * (ref `src/row_format.rs:291,321`): `32.5` → `"32.50000000000000000"`.
    */
  def formatF64(v: Double): String =
    if (v.isNaN) "NaN"
    else if (v.isInfinite) { if (v > 0) "inf" else "-inf" }
    else
      // Exact binary expansion rounded at 17 decimals (Java's %.17f pads the
      // *shortest* repr with zeros instead — not byte-identical to Rust {:.17}).
      new java.math.BigDecimal(v)
        .setScale(17, java.math.RoundingMode.HALF_EVEN)
        .toPlainString

  def formatF32(v: Float): String =
    if (v.isNaN) "NaN" else formatF64(v.toDouble)

  /** Parse accepting the `nan` literal (case-insensitive, ref
    * `src/row_format.rs:275-281`).
    */
  def parseF64(s: String): Double =
    if (s.equalsIgnoreCase("nan")) Double.NaN else s.toDouble

  def parseF32(s: String): Float =
    if (s.equalsIgnoreCase("nan")) Float.NaN else s.toFloat

  // ── X4: base64 bytes columns ───────────────────────────────────────

  /** Decode without padding requirement (ref: no-pad decode). */
  def base64Decode(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(
      if (s.length % 4 == 0) s else s + "=" * (4 - s.length % 4))

  /** Encode with standard alphabet + padding (ref: std encode). */
  def base64Encode(b: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(b)

  // ── X2/X3: timestamp layouts ↔ epoch nanos ─────────────────────────

  /** The six datetime layouts the reference CLI accepts
    * (`src/main.rs:520-543`): ISO date, `T` or space separator, optional
    * fractional seconds — plus raw nanos.
    */
  private val layouts = Seq(
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSS", "yyyy-MM-dd HH:mm:ss.SSSSSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd"
  ).map(DateTimeFormatter.ofPattern)

  /** chrono-strftime layout → java.time formatter. The reference CLI takes
    * chrono tokens (`src/formatted.rs:39-47`, `src/main.rs:520-543`), so a
    * sonnerie user's `--timestamp-format '%FT%T'` must work verbatim.
    * Supported: the full chrono table for naive datetimes — dates
    * `%Y %y %m %d %e %j %b %h %B %a %A %u %w %U %W %G %g %V %D %x %F %v`,
    * times `%H %k %I %l %M %S %p %P %R %T %X %r`, fractions
    * `%f %.f %3f %6f %9f %.3f %.6f %.9f`, composites `%c %+`, zone/epoch
    * `%z %:z %s`, literals `%t %n %%`, and the `%-`/`%0`/`%_` padding
    * modifiers on numeric tokens — plus literal text; anything else
    * (`%C %Z`: century can't round-trip through java.time's resolver,
    * zone *names* don't exist on naive timestamps — chrono itself fails
    * to format `%Z` on a NaiveDateTime) fails loudly, matching chrono's
    * parse error rather than silently mis-reading data. Defaults fill
    * omitted fields (date-only layouts parse to midnight, like the
    * reference's `NaiveDate … and_hms_opt(0,0,0)`).
    *
    * chrono-parity notes: names are English and parse case-insensitively
    * (chrono's month/weekday tables); `%z` formats as the engine's UTC
    * (`+0000`) and a parsed offset is dropped, exactly what chrono's
    * `NaiveDateTime::parse_from_str` does with `%z`; `%s` is the UTC epoch
    * second (parse side handled in [[parseTimestampWith]] via
    * INSTANT_SECONDS); `%a`/`%A` are cross-checked against the parsed date
    * by the resolver, as chrono rejects impossible weekday/date pairs.
    */
  // DateTimeFormatter is immutable and thread-safe; the builder walk is
  // per-row cost on the print/parse hot paths (read, serve GET, gegnum)
  // without a cache.
  private val strftimeCache =
    new java.util.concurrent.ConcurrentHashMap[String, DateTimeFormatter]()

  def strftimeFormatter(fmt: String): DateTimeFormatter =
    strftimeCache.computeIfAbsent(fmt, buildStrftime)

  /** chrono's `%w` (weekday, Sunday = 0 … Saturday = 6) — ISO
    * DAY_OF_WEEK shifted, with a resolver that folds a parsed value back
    * into DAY_OF_WEEK so the weekday/date cross-check still applies.
    */
  private object WeekdaySun0 extends java.time.temporal.TemporalField {
    import java.time.temporal._
    import java.time.format.ResolverStyle
    override def getBaseUnit: TemporalUnit = ChronoUnit.DAYS
    override def getRangeUnit: TemporalUnit = ChronoUnit.WEEKS
    override def range: ValueRange = ValueRange.of(0, 6)
    override def isDateBased: Boolean = true
    override def isTimeBased: Boolean = false
    override def isSupportedBy(t: TemporalAccessor): Boolean =
      t.isSupported(ChronoField.DAY_OF_WEEK)
    override def rangeRefinedBy(t: TemporalAccessor): ValueRange = range
    override def getFrom(t: TemporalAccessor): Long =
      t.getLong(ChronoField.DAY_OF_WEEK) % 7
    override def adjustInto[R <: Temporal](t: R, v: Long): R =
      t.`with`(ChronoField.DAY_OF_WEEK, if (v == 0L) 7L else v)
        .asInstanceOf[R]
    override def resolve(
        values: java.util.Map[TemporalField, java.lang.Long],
        partial: TemporalAccessor, style: ResolverStyle): TemporalAccessor = {
      val v = values.remove(this).longValue()
      values.put(ChronoField.DAY_OF_WEEK,
        java.lang.Long.valueOf(if (v == 0L) 7L else v))
      null
    }
    override def toString: String = "WeekdaySun0"
  }

  private def buildStrftime(fmt: String): DateTimeFormatter = {
    import java.time.format.{DateTimeFormatterBuilder, TextStyle}
    import java.time.temporal.{ChronoField, IsoFields, TemporalField, WeekFields}
    import java.time.DayOfWeek
    import ChronoField._
    val b = new DateTimeFormatterBuilder()
    b.parseCaseInsensitive() // chrono name parsing is case-insensitive
    // POSIX week-of-year: week 1 starts at the first Sunday (resp. Monday);
    // earlier days are week 0 — exactly WeekFields(start, minimalDays = 7)
    val weekSun = WeekFields.of(DayOfWeek.SUNDAY, 7).weekOfYear()
    val weekMon = WeekFields.of(DayOfWeek.MONDAY, 7).weekOfYear()
    var hasDayOfYear = false
    var hasEpoch = false
    var hasAmPm = false
    var hasWeek = false
    val ampmLower = new java.util.HashMap[java.lang.Long, String]()
    ampmLower.put(0L, "am"); ampmLower.put(1L, "pm")
    // numeric token with a chrono padding modifier: default zero-padding
    // (space for %e %k %l), %- no pad, %0 zero pad, %_ space pad
    def num(f: TemporalField, w: Int, mod: Char, defPad: Char = '0'): Unit =
      (if (mod == ' ') defPad else mod) match {
        case '-'           => b.appendValue(f)
        case '0'           => b.appendValue(f, w)
        case '_' | _       => b.padNext(w, ' ').appendValue(f)
      }
    def time(): Unit = // %T / %X
      b.appendValue(HOUR_OF_DAY, 2).appendLiteral(':')
        .appendValue(MINUTE_OF_HOUR, 2).appendLiteral(':')
        .appendValue(SECOND_OF_MINUTE, 2)
    def token(t: Char, mod: Char): Unit = t match {
      case 'Y' => num(YEAR, 4, mod)
      // chrono/POSIX two-digit years: 69-99 → 1969-1999, 00-68 →
      // 2000-2068 (base 1969 gives exactly that window)
      case 'y' => b.appendValueReduced(YEAR, 2, 2, 1969)
      case 'm' => num(MONTH_OF_YEAR, 2, mod)
      case 'd' => num(DAY_OF_MONTH, 2, mod)
      case 'e' => num(DAY_OF_MONTH, 2, mod, defPad = ' ')
      case 'j' => num(DAY_OF_YEAR, 3, mod); hasDayOfYear = true
      case 'b' | 'h' => // abbreviated month name (Jan … Dec)
        b.appendText(MONTH_OF_YEAR, TextStyle.SHORT)
      case 'B' => // full month name (January … December)
        b.appendText(MONTH_OF_YEAR, TextStyle.FULL)
      case 'a' => // abbreviated weekday name (Sun … Sat)
        b.appendText(DAY_OF_WEEK, TextStyle.SHORT)
      case 'A' => // full weekday name (Sunday … Saturday)
        b.appendText(DAY_OF_WEEK, TextStyle.FULL)
      case 'u' => num(DAY_OF_WEEK, 1, mod) // ISO weekday, Monday = 1
      case 'w' => num(WeekdaySun0, 1, mod) // Sunday = 0
      case 'U' => num(weekSun, 2, mod); hasWeek = true
      case 'W' => num(weekMon, 2, mod); hasWeek = true
      case 'G' => num(IsoFields.WEEK_BASED_YEAR, 4, mod); hasWeek = true
      case 'g' =>
        b.appendValueReduced(IsoFields.WEEK_BASED_YEAR, 2, 2, 1969)
        hasWeek = true
      case 'V' => num(IsoFields.WEEK_OF_WEEK_BASED_YEAR, 2, mod); hasWeek = true
      case 'H' => num(HOUR_OF_DAY, 2, mod)
      case 'k' => num(HOUR_OF_DAY, 2, mod, defPad = ' ')
      case 'I' => num(CLOCK_HOUR_OF_AMPM, 2, mod); hasAmPm = true
      case 'l' => num(CLOCK_HOUR_OF_AMPM, 2, mod, defPad = ' '); hasAmPm = true
      case 'M' => num(MINUTE_OF_HOUR, 2, mod)
      case 'S' => num(SECOND_OF_MINUTE, 2, mod)
      case 'p' => b.appendText(AMPM_OF_DAY, TextStyle.SHORT); hasAmPm = true
      case 'P' => b.appendText(AMPM_OF_DAY, ampmLower); hasAmPm = true
      case 'z' => // +0000 offset; the engine's datetimes are UTC
        b.appendOffset("+HHMM", "+0000")
      case 's' => // unix timestamp seconds (variable width, signed)
        b.appendValue(INSTANT_SECONDS); hasEpoch = true
      case 'F' => // %Y-%m-%d
        b.appendValue(YEAR, 4).appendLiteral('-')
          .appendValue(MONTH_OF_YEAR, 2).appendLiteral('-')
          .appendValue(DAY_OF_MONTH, 2)
      case 'D' | 'x' => // %m/%d/%y
        b.appendValue(MONTH_OF_YEAR, 2).appendLiteral('/')
          .appendValue(DAY_OF_MONTH, 2).appendLiteral('/')
          .appendValueReduced(YEAR, 2, 2, 1969)
      case 'v' => // %e-%b-%Y ( 4-Jul-2001)
        b.padNext(2, ' ').appendValue(DAY_OF_MONTH).appendLiteral('-')
          .appendText(MONTH_OF_YEAR, TextStyle.SHORT).appendLiteral('-')
          .appendValue(YEAR, 4)
      case 'T' | 'X' => time()
      case 'R' => // %H:%M
        b.appendValue(HOUR_OF_DAY, 2).appendLiteral(':')
          .appendValue(MINUTE_OF_HOUR, 2)
      case 'r' => // %I:%M:%S %p
        b.appendValue(CLOCK_HOUR_OF_AMPM, 2).appendLiteral(':')
          .appendValue(MINUTE_OF_HOUR, 2).appendLiteral(':')
          .appendValue(SECOND_OF_MINUTE, 2).appendLiteral(' ')
          .appendText(AMPM_OF_DAY, TextStyle.SHORT)
        hasAmPm = true
      case 'c' => // ctime: %a %b %e %H:%M:%S %Y
        b.appendText(DAY_OF_WEEK, TextStyle.SHORT).appendLiteral(' ')
          .appendText(MONTH_OF_YEAR, TextStyle.SHORT).appendLiteral(' ')
          .padNext(2, ' ').appendValue(DAY_OF_MONTH).appendLiteral(' ')
        time()
        b.appendLiteral(' ').appendValue(YEAR, 4)
      case 'f' => // nanoseconds, no dot (chrono: 9 digits)
        b.appendFraction(NANO_OF_SECOND, 9, 9, false)
      case 't' => b.appendLiteral('\t')
      case 'n' => b.appendLiteral('\n')
      case '%' => b.appendLiteral('%')
      case _ => throw new IllegalArgumentException(
        s"unsupported strftime token %$t in '$fmt'")
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case d @ ('3' | '6' | '9') if i + 2 < fmt.length &&
              fmt.charAt(i + 2) == 'f' =>
            // chrono %3f/%6f/%9f: fixed-width fraction, no dot
            val w = d - '0'
            b.appendFraction(NANO_OF_SECOND, w, w, false); i += 3
          case '.' if i + 3 < fmt.length && "369".contains(fmt.charAt(i + 2)) &&
              fmt.charAt(i + 3) == 'f' =>
            // chrono %.3f/%.6f/%.9f: dot + fixed-width fraction
            val w = fmt.charAt(i + 2) - '0'
            b.appendFraction(NANO_OF_SECOND, w, w, true); i += 4
          case '.' if i + 2 < fmt.length && fmt.charAt(i + 2) == 'f' =>
            // chrono %.f: optional dot + 1-9 fractional digits
            b.appendFraction(NANO_OF_SECOND, 0, 9, true); i += 3
          case '+' => // ISO 8601 / RFC 3339: %Y-%m-%dT%H:%M:%S%.f%:z
            b.appendValue(YEAR, 4).appendLiteral('-')
              .appendValue(MONTH_OF_YEAR, 2).appendLiteral('-')
              .appendValue(DAY_OF_MONTH, 2).appendLiteral('T')
            time()
            b.appendFraction(NANO_OF_SECOND, 0, 9, true)
              .appendOffset("+HH:MM", "+00:00")
            i += 2
          case ':' if i + 2 < fmt.length && fmt.charAt(i + 2) == 'z' =>
            b.appendOffset("+HH:MM", "+00:00"); i += 3 // %:z → +00:00
          case m @ ('-' | '0' | '_') if i + 2 < fmt.length &&
              "YmdejuwUWGVHkIlMS".indexOf(fmt.charAt(i + 2)) >= 0 =>
            token(fmt.charAt(i + 2), m); i += 3 // padding modifier
          case t => token(t, ' '); i += 2
        }
      } else { b.appendLiteral(c); i += 1 }
    }
    // month/day defaults conflict with a parsed day-of-year or week
    // number (the resolver derives the date from %j / year+week+weekday
    // and cross-checks it against every other date field, so an injected
    // Jan 1 would reject 51 weeks of the year — chrono resolves these
    // layouts fine), so only default them for layouts with neither; an
    // epoch layout (%s) carries the whole datetime in one field, so
    // defaulting date/time fields there would only invite resolver
    // conflicts; a 12-hour layout (%I %p) resolves HOUR_OF_DAY itself,
    // and a pre-seeded 0 would collide with it
    if (!hasEpoch) {
      if (!hasDayOfYear && !hasWeek)
        b.parseDefaulting(MONTH_OF_YEAR, 1).parseDefaulting(DAY_OF_MONTH, 1)
      if (!hasAmPm) b.parseDefaulting(HOUR_OF_DAY, 0)
      b.parseDefaulting(MINUTE_OF_HOUR, 0)
        .parseDefaulting(SECOND_OF_MINUTE, 0)
    }
    b.parseDefaulting(NANO_OF_SECOND, 0)
      // English month/weekday names, whatever the JVM default locale —
      // chrono's tables are English-only
      .toFormatter(java.util.Locale.ENGLISH)
  }

  /** Parse with an explicit layout (reference `add --timestamp-format`,
    * `src/formatted.rs:39-47`). A `%` marks a chrono-strftime layout (what
    * the reference accepts); otherwise the pattern is a Java layout.
    */
  def parseTimestampWith(s: String, pattern: String): Long = {
    if (pattern.contains('%')) {
      import java.time.temporal.ChronoField.{INSTANT_SECONDS, NANO_OF_SECOND}
      val parsed = strftimeFormatter(pattern).parse(s)
      // prefer the LOCAL fields: a %z layout parses the offset but must
      // ignore its value (chrono NaiveDateTime::parse_from_str semantics),
      // and java keeps the as-written local fields alongside the derived
      // instant. Only a pure-epoch layout (%s) has no local date to
      // assemble — resolve that through INSTANT_SECONDS directly.
      return try toNanos(LocalDateTime.from(parsed))
      catch {
        case e: java.time.DateTimeException
            if parsed.isSupported(INSTANT_SECONDS) =>
          Math.addExact(
            Math.multiplyExact(parsed.getLong(INSTANT_SECONDS), 1000000000L),
            parsed.getLong(NANO_OF_SECOND))
      }
    }
    val f = DateTimeFormatter.ofPattern(pattern)
    val ldt =
      if (pattern.exists("HmsS".contains(_))) LocalDateTime.parse(s, f)
      else java.time.LocalDate.parse(s, f).atStartOfDay()
    toNanos(ldt)
  }

  def parseTimestamp(s: String): Long = {
    if (s.forall(_.isDigit)) return s.toLong // raw nanos
    val norm = s.replace('_', ' ') // reference also accepts '_' separator
    layouts.foreach { f =>
      try {
        val ldt =
          if (norm.contains(":")) LocalDateTime.parse(norm, f)
          else java.time.LocalDate.parse(norm, f).atStartOfDay()
        return toNanos(ldt)
      } catch { case _: java.time.format.DateTimeParseException => }
    }
    throw new IllegalArgumentException(s"unparseable timestamp: $s")
  }

  def toNanos(ldt: LocalDateTime): Long = {
    val i = ldt.toInstant(ZoneOffset.UTC)
    Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000000L), i.getNano.toLong)
  }

  /** Format epoch nanos with a strftime-style layout; `%N`-equivalent nanos
    * are appended exactly (Spark's `date_format` is µs-bound, so this stays
    * a JVM function for CLI-parity output).
    */
  def formatTimestamp(nanos: Long, pattern: String = ""): String = {
    val secs = Math.floorDiv(nanos, 1000000000L)
    val rem = Math.floorMod(nanos, 1000000000L)
    val ldt = LocalDateTime.ofInstant(Instant.ofEpochSecond(secs, rem), ZoneOffset.UTC)
    // format the strftime path at explicit UTC so %z (+0000) and %s
    // (INSTANT_SECONDS) have the offset/instant a bare LocalDateTime lacks
    if (pattern.contains('%'))
      ldt.atOffset(ZoneOffset.UTC).format(strftimeFormatter(pattern))
    else if (pattern.nonEmpty) ldt.format(DateTimeFormatter.ofPattern(pattern))
    else {
      // default human layout: fractional seconds only when nonzero
      // (reference CLI prints `%FT%T` for whole seconds, README.md:84-96)
      val base = ldt.format(DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
      if (rem == 0) base else f"$base.$rem%09d"
    }
  }
}
