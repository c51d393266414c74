package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}

/** Property pin for the hand-built chrono table
  * (`TextProto.buildStrftime`): `parseTimestampWith(formatTimestamp(t, f),
  * f) == t` over random timestamps × every self-sufficient layout the
  * reference could pass as `--timestamp-format` (`src/main.rs:520-543`,
  * `src/formatted.rs:39-47`). Where a single token under-determines the
  * datetime (chrono itself can't round-trip `%U` alone), the layout pairs
  * it with exactly the fields chrono needs — `%Y %U %w`, `%G-W%V-%u` —
  * so the week/weekday tokens the CliSpec goldens never touch are pinned
  * here, including their interaction with java.time's field resolver.
  */
class StrftimePropertySpec extends AnyFunSuite {

  private val seed0 = rng.Seed(20260813L)

  /** n deterministic samples of a Gen (ScalaCheck pure-seed sampling —
    * no Date.now, reruns bit-identical).
    */
  private def samples(g: Gen[Long], n: Int): Seq[Long] = {
    var seed = seed0
    (1 to n).map { _ =>
      val r = g.doPureApply(Gen.Parameters.default, seed)
      seed = r.seed
      r.retrieve.get
    }
  }

  private val secNanos = 1000000000L
  // 1900-01-01 .. 2100-01-01 at second resolution (covers negative
  // epochs, leap days, century boundaries)
  private val secondGen: Gen[Long] =
    Gen.choose(-2208988800L, 4102444800L).map(_ * secNanos)
  // the %y/%g two-digit windows only round-trip inside 1969-2068
  // (chrono/POSIX base-1969 rule — TextProto mirrors it)
  private val y2Gen: Gen[Long] =
    Gen.choose(-31536000L, 3124137600L).map(_ * secNanos)
  private val nanoGen: Gen[Long] =
    for { s <- secondGen; n <- Gen.choose(0L, secNanos - 1) } yield s + n

  /** (layout, timestamp gen): each layout fully determines the datetime
    * at second resolution, exercising every supported date path — plain,
    * ordinal (%j), POSIX Sunday/Monday weeks (%U/%W + %w/%u), ISO week
    * date (%G/%g %V %u), two-digit years, names, 12-hour clock, epoch,
    * composites, padding modifiers.
    */
  private val layouts: Seq[(String, Gen[Long])] = Seq(
    "%Y-%m-%d %H:%M:%S" -> secondGen,
    "%F %T" -> secondGen,
    "%FT%T%z" -> secondGen,
    "%FT%T%:z" -> secondGen,
    "%D %T" -> y2Gen,
    "%x %X" -> y2Gen,
    "%v %T" -> secondGen,
    "%c" -> secondGen,
    "%+" -> nanoGen,
    "%s" -> secondGen,
    "%s%.9f" -> nanoGen,
    "%Y %j %T" -> secondGen,            // ordinal date
    "%Y %U %w %T" -> secondGen,         // POSIX week (Sunday), Sunday=0
    "%Y %W %u %T" -> secondGen,         // POSIX week (Monday), ISO weekday
    "%G-W%V-%u %T" -> secondGen,        // ISO week date
    "%g %V %u %T" -> y2Gen,             // two-digit week-based year
    "%y %m %d %T" -> y2Gen,
    "%a %F %T" -> secondGen,            // weekday name cross-checked
    "%A, %B %e %Y %T" -> secondGen,
    "%b %d %Y %I:%M:%S %p" -> secondGen,
    "%h %d %Y %l:%M:%S %P" -> secondGen,
    "%e/%m/%Y %k:%M:%S" -> secondGen,
    "%Y-%m-%d %R:%S" -> secondGen,
    "%F %r" -> secondGen,
    "%-d %-m %Y %-H:%M:%S" -> secondGen,   // no-pad modifiers
    "%_d %_m %Y %_H:%M:%S" -> secondGen,   // space-pad modifiers
    "%0e %m %Y %0k:%M:%S" -> secondGen,    // zero-pad the space-padded
    "%F %T%.3f" -> secondGen.map(_ + 123000000L),
    "%F %T%.6f" -> secondGen.map(_ + 123456000L),
    "%F %T%.9f" -> nanoGen,
    "%F %T.%f" -> nanoGen,
    "%FT%T%.f" -> nanoGen
  )

  test("parse(format(t)) == t for 1000+ cases across the chrono table") {
    var cases = 0
    layouts.foreach { case (fmt, gen) =>
      samples(gen, 40).foreach { t =>
        val s = TextProto.formatTimestamp(t, fmt)
        val back = TextProto.parseTimestampWith(s, fmt)
        assert(back == t,
          s"layout '$fmt': $t → '$s' → $back (Δ ${back - t})")
        cases += 1
      }
    }
    assert(cases >= 1000, s"only $cases cases — property under-sampled")
  }

  test("week-number tokens format the POSIX/ISO values at known dates") {
    // 2021-01-01 is a Friday: week 0 for both POSIX conventions, ISO
    // week 53 of week-based-year 2020 (chrono strftime doc examples)
    val t = TextProto.parseTimestampWith("2021-01-01", "%Y-%m-%d")
    assert(TextProto.formatTimestamp(t, "%U") == "00")
    assert(TextProto.formatTimestamp(t, "%W") == "00")
    assert(TextProto.formatTimestamp(t, "%G %V %u") == "2020 53 5")
    assert(TextProto.formatTimestamp(t, "%g") == "20")
    // 2017-01-01 is a Sunday: POSIX %U week 1 immediately, %W still 0
    val t2 = TextProto.parseTimestampWith("2017-01-01", "%F")
    assert(TextProto.formatTimestamp(t2, "%U") == "01")
    assert(TextProto.formatTimestamp(t2, "%W") == "00")
    assert(TextProto.formatTimestamp(t2, "%w") == "0")
    assert(TextProto.formatTimestamp(t2, "%u") == "7")
  }

  test("unsupported tokens fail loudly (%C, %Z)") {
    intercept[IllegalArgumentException] {
      TextProto.formatTimestamp(0L, "%C%y")
    }
    intercept[IllegalArgumentException] {
      TextProto.formatTimestamp(0L, "%Z")
    }
  }
}
