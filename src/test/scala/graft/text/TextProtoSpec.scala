package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Text-protocol golden roundtrips mirroring the reference fixtures
  * (FIXTURES.md §1; sonnerie `src/tests.rs` line cites inline).
  */
class TextProtoSpec extends AnyFunSuite {

  test("escape/unescape roundtrip (escape_string/src/lib.rs)") {
    val cases = Seq("plain", "two words", "tab\there", "nl\nhere",
      "back\\slash", "mix \t\n\\ all", "")
    cases.foreach { s =>
      assert(TextProto.unescape(TextProto.escape(s)) == s, s"case: $s")
    }
    assert(TextProto.escape("a b") == "a\\ b")
    assert(TextProto.splitOne("a\\ b c").contains(("a b", "c")))
    // unknown escapes pass through verbatim
    assert(TextProto.unescape("a\\qb") == "aqb")
  }

  test("%.17 float formatting (row_format.rs:291,321)") {
    assert(TextProto.formatF64(32.5) == "32.50000000000000000")
    assert(TextProto.formatF32(32.5f) == "32.50000000000000000")
    assert(TextProto.formatF64(Double.NaN) == "NaN")
    assert(TextProto.parseF64("nan").isNaN)
    assert(TextProto.parseF32("NaN").isNaN)
    assert(TextProto.parseF64("-1.5") == -1.5)
  }

  test("base64: no-pad decode, std encode (row_format.rs:353-381)") {
    assert(TextProto.base64Decode("SGVsbG8x").sameElements("Hello1".getBytes))
    assert(TextProto.base64Decode("SGVsbG8").sameElements("Hello".getBytes)) // no pad
    assert(TextProto.base64Encode("Hello".getBytes) == "SGVsbG8=")
  }

  test("timestamp layouts (main.rs:520-543)") {
    val want = 1577836800000000000L // 2020-01-01T00:00:00Z
    assert(TextProto.parseTimestamp("2020-01-01T00:00:00") == want)
    assert(TextProto.parseTimestamp("2020-01-01 00:00:00") == want)
    assert(TextProto.parseTimestamp("2020-01-01_00:00:00") == want)
    assert(TextProto.parseTimestamp("2020-01-01") == want)
    assert(TextProto.parseTimestamp(want.toString) == want)
    assert(TextProto.parseTimestamp("2020-01-01T00:00:00.000000001") == want + 1)
    assert(TextProto.formatTimestamp(want + 1) == "2020-01-01T00:00:00.000000001")
  }

  test("multicolumn roundtrip (tests.rs:285-335)") {
    val line = "a\t2010-01-01_00:00:00\t10 20"
    val r = RowCodec.parseLine("a 2010-01-01_00:00:00 10 20", "uu")
    assert(r.key == "a" && r.vals.map(_.u32.get) == Seq(10L, 20L))
    assert(RowCodec.printRecord(r, tsAsNanos = false,
      columns = None).startsWith("a\t2010-01-01T00:00:00"))
  }

  test("escaped strings roundtrip (tests.rs:407-458)") {
    val r = RowCodec.parseLine("a 0 Many\\ words Lotsa\\ stuff\\ here", "ss")
    assert(r.vals.map(_.str.get) == Seq("Many words", "Lotsa stuff here"))
    assert(RowCodec.printRecord(r) == "a\t0\tMany\\ words Lotsa\\ stuff\\ here")
  }

  test("heterogeneous formats per key (tests.rs:629-672)") {
    val rs = Seq(
      RowCodec.parseLineWithFmt("a 1 u 42"),
      RowCodec.parseLineWithFmt("a 2 f 32.5"),
      RowCodec.parseLineWithFmt("a 3 s Hello")
    )
    assert(rs.map(_.fmt) == Seq("u", "f", "s"))
    assert(RowCodec.printRecord(rs(1), showFmt = true) ==
      "a\t2\tf\t32.50000000000000000")
  }

  test("u64 range and roundtrip (records.rs: u64::MAX text)") {
    val r = RowCodec.parseLine("k 0 18446744073709551615", "U")
    assert(RowCodec.printRecord(r) == "k\t0\t18446744073709551615")
    intercept[IllegalArgumentException](RowCodec.parseCell('u', "4294967296"))
    intercept[IllegalArgumentException](RowCodec.parseCell('U', "-1"))
  }

  test("type widening same-class only (records.rs:74-114)") {
    val c = RowCodec.parseCell('u', "7")
    assert(c.asU64.contains(BigDecimal(7)))
    assert(c.asI64.isEmpty && c.asF64.isEmpty) // no cross-class
    assert(RowCodec.parseCell('i', "-3").asI64.contains(-3L))
    assert(RowCodec.parseCell('f', "1.5").asF64.contains(1.5))
  }

  test("column subset selection (tests.rs:338-388)") {
    val r = RowCodec.parseLine("a 0 10 20 30", "uuu")
    assert(RowCodec.printRecord(r, columns = Some(Seq(1, 3))) == "a\t0\t10 30")
  }

  test("format validation") {
    intercept[IllegalArgumentException](RowCodec.validate("ux"))
    intercept[IllegalArgumentException](RowCodec.validate(""))
    RowCodec.validate("iuIUfFsB")
  }

  test("strftime layouts round-trip arbitrary timestamps (property)") {
    // the layouts the reference CLI/docs use (main.rs:520-543, %.f =
    // chrono's optional dot + 1-9 fractional digits)
    val layouts = Seq("%FT%T%.f", "%Y-%m-%d %H:%M:%S%.f", "%FT%T")
    val rng = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val nanos = math.abs(rng.nextLong()) % 4102444800000000000L // < 2100
      layouts.foreach { fmt =>
        val wholeSec = fmt.endsWith("%T")
        val t = if (wholeSec) nanos - nanos % 1000000000L else nanos
        val text = TextProto.formatTimestamp(t, fmt)
        val back = TextProto.parseTimestampWith(text, fmt)
        assert(back == t, s"$fmt: $t -> '$text' -> $back")
      }
    }
    // chrono token semantics, pinned
    assert(TextProto.parseTimestampWith("2020-01-01T00:00:01", "%FT%T") ==
      1577836801000000000L)
    assert(TextProto.parseTimestampWith("2020-01-01", "%F") ==
      1577836800000000000L) // date-only -> midnight
    assert(TextProto.parseTimestampWith("2020-01-01T00:00:01.5", "%FT%T%.f") ==
      1577836801500000000L)
    assert(TextProto.formatTimestamp(1577836801000000000L, "%F %T") ==
      "2020-01-01 00:00:01")
    // unsupported tokens fail loudly, never silently mis-parse
    intercept[IllegalArgumentException](
      TextProto.parseTimestampWith("x", "%Q"))
    // chrono/POSIX %y century rule: 69-99 → 19xx, 00-68 → 20xx
    assert(TextProto.formatTimestamp(
      TextProto.parseTimestampWith("99-01-01", "%y-%m-%d"), "%F") ==
      "1999-01-01")
    assert(TextProto.formatTimestamp(
      TextProto.parseTimestampWith("68-01-01", "%y-%m-%d"), "%F") ==
      "2068-01-01")
    // %j day-of-year parses for any day, not just 001 (defaults must not
    // conflict with the derived date)
    assert(TextProto.formatTimestamp(
      TextProto.parseTimestampWith("2024-100", "%Y-%j"), "%F") ==
      "2024-04-09")
  }

  test("exotic chrono tokens: %b %B %a %A %e %z %s (formatted.rs:39-47)") {
    val t = 1577836801000000000L // 2020-01-01T00:00:01Z, a Wednesday
    // month names, abbreviated and full; parse is case-insensitive
    assert(TextProto.formatTimestamp(t, "%d %b %Y %H:%M:%S") ==
      "01 Jan 2020 00:00:01")
    assert(TextProto.parseTimestampWith("01 Jan 2020 00:00:01",
      "%d %b %Y %H:%M:%S") == t)
    assert(TextProto.parseTimestampWith("01 JAN 2020 00:00:01",
      "%d %b %Y %H:%M:%S") == t)
    assert(TextProto.formatTimestamp(t, "%B %d, %Y") == "January 01, 2020")
    assert(TextProto.parseTimestampWith("January 01, 2020", "%B %d, %Y") ==
      1577836800000000000L)
    // %h is chrono's alias of %b
    assert(TextProto.formatTimestamp(t, "%h") == "Jan")
    // weekday names format and cross-check on parse (chrono rejects an
    // impossible weekday/date pair)
    assert(TextProto.formatTimestamp(t, "%a %F") == "Wed 2020-01-01")
    assert(TextProto.formatTimestamp(t, "%A") == "Wednesday")
    assert(TextProto.parseTimestampWith("Wed 2020-01-01", "%a %F") ==
      1577836800000000000L)
    intercept[Exception]( // 2020-01-01 was not a Monday
      TextProto.parseTimestampWith("Mon 2020-01-01", "%a %F"))
    // %e: space-padded day of month
    assert(TextProto.formatTimestamp(t, "%e %b") == " 1 Jan")
    assert(TextProto.parseTimestampWith(" 1 Jan 2020", "%e %b %Y") ==
      1577836800000000000L)
    // %z: the engine's datetimes are UTC -> +0000; a parsed offset is
    // dropped (chrono NaiveDateTime::parse_from_str semantics)
    assert(TextProto.formatTimestamp(t, "%FT%T%z") ==
      "2020-01-01T00:00:01+0000")
    assert(TextProto.parseTimestampWith("2020-01-01T00:00:01+0500",
      "%FT%T%z") == t)
    // %s: unix epoch seconds, both directions, pre-1970 included
    assert(TextProto.formatTimestamp(t, "%s") == "1577836801")
    assert(TextProto.parseTimestampWith("1577836801", "%s") == t)
    assert(TextProto.formatTimestamp(-1000000000L, "%s") == "-1")
    assert(TextProto.parseTimestampWith("-1", "%s") == -1000000000L)
    // fixed-width fraction tokens (%.3f/%.6f/%.9f with dot, %3f/%6f/%9f
    // without — chrono's fixed-length forms of %.f/%f)
    val tf = 1577836801123456789L
    assert(TextProto.formatTimestamp(tf, "%T%.3f") == "00:00:01.123")
    assert(TextProto.formatTimestamp(tf, "%T%.6f") == "00:00:01.123456")
    assert(TextProto.formatTimestamp(tf, "%T%.9f") == "00:00:01.123456789")
    assert(TextProto.formatTimestamp(tf, "%T.%3f") == "00:00:01.123")
    assert(TextProto.parseTimestampWith("2020-01-01T00:00:01.123",
      "%FT%T%.3f") == 1577836801123000000L)
    assert(TextProto.parseTimestampWith("2020-01-01T00:00:01.123456789",
      "%FT%T%.9f") == tf)
    assert(TextProto.parseTimestampWith("2020-01-01T00:00:01.123456",
      "%FT%T.%6f") == 1577836801123456000L)
    // round-trip the VERDICT layout across random whole-second instants
    val rng = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      val nanos = math.abs(rng.nextLong()) % 4102444800000000000L
      val ts = nanos - nanos % 1000000000L
      Seq("%d %b %Y %H:%M:%S", "%e %B %Y %H:%M:%S %z", "%s").foreach { fmt =>
        val text = TextProto.formatTimestamp(ts, fmt)
        assert(TextProto.parseTimestampWith(text, fmt) == ts,
          s"$fmt: $ts -> '$text'")
      }
    }
  }

  test("full chrono table: composites, 12-hour, weekday/week numbers, pad modifiers") {
    val fmt = TextProto.formatTimestamp _
    val parse = TextProto.parseTimestampWith _
    val t = 1577836801000000000L // 2020-01-01T00:00:01Z, a Wednesday
    // composite date/time tokens
    assert(fmt(t, "%D") == "01/01/20" && fmt(t, "%x") == "01/01/20")
    assert(parse("01/01/20", "%D") == 1577836800000000000L)
    assert(fmt(t, "%v") == " 1-Jan-2020")
    assert(parse(" 1-Jan-2020", "%v") == 1577836800000000000L)
    assert(fmt(t, "%R") == "00:00" && fmt(t, "%X") == "00:00:01")
    assert(fmt(t, "%c") == "Wed Jan  1 00:00:01 2020") // ctime layout
    assert(parse("Wed Jan  1 00:00:01 2020", "%c") == t)
    assert(fmt(t, "%+") == "2020-01-01T00:00:01+00:00") // RFC 3339
    assert(fmt(t + 123000000L, "%+") == "2020-01-01T00:00:01.123+00:00")
    assert(parse("2020-01-01T00:00:01+09:30", "%+") == t) // offset dropped
    assert(fmt(t, "%FT%T%:z") == "2020-01-01T00:00:01+00:00")
    // 12-hour clock: %I/%l/%p/%P/%r; midnight hour prints as 12
    assert(fmt(t, "%I:%M %p") == "12:00 AM" && fmt(t, "%P") == "am")
    assert(fmt(t, "%r") == "12:00:01 AM")
    val t13 = t + 13L * 3600 * 1000000000L
    assert(fmt(t13, "%I %l %p %P") == "01  1 PM pm")
    assert(parse("2020-01-01 01:00:01 PM", "%F %I:%M:%S %p") == t13)
    assert(parse("2020-01-01 12:00:01 am", "%F %r") == t)
    // a 12-hour layout without am/pm cannot resolve the hour (chrono too)
    intercept[Exception](parse("2020-01-01 01:00:01", "%F %I:%M:%S"))
    // weekday numbers: ISO %u (Mon=1) and POSIX %w (Sun=0); Wed = 3
    assert(fmt(t, "%u %w") == "3 3")
    val sun = 1577577600000000000L // 2019-12-29, a Sunday
    assert(fmt(sun, "%u") == "7" && fmt(sun, "%w") == "0")
    // %w parse folds into the weekday/date cross-check
    assert(parse("0 2019-12-29", "%w %F") == sun)
    intercept[Exception](parse("1 2019-12-29", "%w %F"))
    // POSIX week numbers: days before the first Sunday/Monday are week 00
    assert(fmt(t, "%U %W") == "00 00") // Jan 1 2020 precedes both
    assert(fmt(t + 4L * 86400 * 1000000000L, "%U") == "01") // Jan 5, Sunday
    assert(fmt(t + 5L * 86400 * 1000000000L, "%W") == "01") // Jan 6, Monday
    // ISO week-based year: 2020-01-01 is ISO week 1 of 2020 ...
    assert(fmt(t, "%G-W%V-%u") == "2020-W01-3")
    // ... but 2021-01-01 (Friday) falls in ISO week 53 of 2020
    val y21 = 1609459200000000000L
    assert(fmt(y21, "%G-W%V") == "2020-W53" && fmt(y21, "%g") == "20")
    // %k space-padded 24h hour; literals %t %n
    assert(fmt(t, "%k|") == " 0|" && fmt(t13, "%k|") == "13|")
    assert(fmt(t, "%Y%t%m%n") == "2020\t01\n")
    // padding modifiers: %- none, %0 zero, %_ space
    assert(fmt(t, "%-d/%-m") == "1/1")
    assert(fmt(t, "%_d|%_m") == " 1| 1")
    assert(fmt(t, "%0e") == "01") // zero-pad an otherwise space-padded token
    assert(parse("1/1/2020", "%-d/%-m/%Y") == 1577836800000000000L)
    // round-trip sweep over the new composable tokens
    val rng2 = new scala.util.Random(11)
    (1 to 60).foreach { _ =>
      val nanos = math.abs(rng2.nextLong()) % 4102444800000000000L
      val ts = nanos - nanos % 1000000000L
      Seq("%+", "%c", "%F %r", "%v %T", "%-d %-m %Y %T")
        .foreach { f =>
          val text = fmt(ts, f)
          assert(parse(text, f) == ts, s"$f: $ts -> '$text'")
        }
      // two-digit-year layouts only round-trip inside the POSIX 1969-2068
      // window (chrono maps 69-99 → 19xx, 00-68 → 20xx — same loss)
      val ts2 = (ts % (3124224000000000000L - (-31536000000000000L))) +
        -31536000000000000L // clamp into [1969, 2068)
      val tsc = if (ts2 < -31536000000000000L) ts2 + 3155760000000000000L else ts2
      val text = fmt(tsc - tsc % 1000000000L, "%D %H:%M:%S")
      assert(parse(text, "%D %H:%M:%S") == tsc - tsc % 1000000000L,
        s"%D: $tsc -> '$text'")
    }
    // unsupported-by-design tokens still fail loudly
    intercept[IllegalArgumentException](fmt(t, "%C"))
    intercept[IllegalArgumentException](fmt(t, "%Z"))
  }
}
