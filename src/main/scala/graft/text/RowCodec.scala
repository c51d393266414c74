package graft.text

/** The reference's per-record format string and tagged-union value model
  * (sonnerie `src/row_format.rs:55-73`, SURVEY §1.2/§1.4).
  *
  * Column codes: `i` i32, `u` u32, `I` i64, `U` u64, `f` f32, `F` f64,
  * `s` UTF-8 string, `B` byte array. A key may change formats between
  * samples (`README.md:141-149`), so the format travels per record and the
  * canonical Spark schema stores values as an array of one-branch-set
  * structs ([[Cell]]) — self-describing at row granularity, no catalog.
  */
final case class Cell(
    i32: Option[Int] = None,
    i64: Option[Long] = None,
    u32: Option[Long] = None,
    u64: Option[BigDecimal] = None, // Spark has no unsigned 64-bit; Decimal(20,0)
    f32: Option[Float] = None,
    f64: Option[Double] = None,
    str: Option[String] = None,
    bytes: Option[Array[Byte]] = None
) {
  /** Type-widening read (ref `Record::get_checked`, `src/records.rs:74-114`):
    * same-class wider casts allowed (`u`→u64, `i`→i64, `f`→f64), never
    * cross-class.
    */
  def asI64: Option[Long] = i64.orElse(i32.map(_.toLong))
  def asU64: Option[BigDecimal] = u64.orElse(u32.map(BigDecimal(_)))
  def asF64: Option[Double] = f64.orElse(f32.map(_.toDouble))
}

final case class SeriesRecord(key: String, ts: Long, fmt: String, vals: Seq[Cell])

object RowCodec {
  val codes = "iuIUfFsB"

  /** Reject malformed format strings (unknown codes / empty). */
  def validate(fmt: String): Unit = {
    require(fmt.nonEmpty, "empty format string")
    val bad = fmt.filterNot(codes.contains(_))
    require(bad.isEmpty, s"unknown format codes '$bad' in '$fmt'")
  }

  private val U64_MAX = BigDecimal("18446744073709551615")
  private val U32_MAX = 4294967295L

  /** Parse one text token per the column code (ref `Element::from_str`
    * impls, `src/row_format.rs:158-381`).
    */
  def parseCell(code: Char, token: String): Cell = code match {
    case 'i' => Cell(i32 = Some(token.toInt))
    case 'I' => Cell(i64 = Some(token.toLong))
    case 'u' =>
      val v = token.toLong
      require(v >= 0 && v <= U32_MAX, s"u32 out of range: $token")
      Cell(u32 = Some(v))
    case 'U' =>
      val v = BigDecimal(token)
      require(v >= 0 && v <= U64_MAX, s"u64 out of range: $token")
      Cell(u64 = Some(v))
    case 'f' => Cell(f32 = Some(TextProto.parseF32(token)))
    case 'F' => Cell(f64 = Some(TextProto.parseF64(token)))
    case 's' => Cell(str = Some(token)) // token already unescaped by splitOne
    case 'B' => Cell(bytes = Some(TextProto.base64Decode(token)))
    case c   => throw new IllegalArgumentException(s"unknown format code '$c'")
  }

  /** Print one cell per the column code — byte-compatible with the
    * reference's output (`src/formatted.rs:149-198`): `%.17` floats,
    * std base64, escaped strings.
    */
  def printCell(code: Char, cell: Cell): String = code match {
    case 'i' => cell.i32.get.toString
    case 'I' => cell.i64.get.toString
    case 'u' => cell.u32.get.toString
    case 'U' => cell.u64.get.toBigInt.toString
    case 'f' => TextProto.formatF32(cell.f32.get)
    case 'F' => TextProto.formatF64(cell.f64.get)
    case 's' => TextProto.escape(cell.str.get)
    case 'B' => TextProto.base64Encode(cell.bytes.get)
    case c   => throw new IllegalArgumentException(s"unknown format code '$c'")
  }

  /** Parse an ingest line `key ts v1 v2 …` with a fixed format
    * (ref `formatted::add_from_stream`, `src/formatted.rs:20-60`).
    */
  def parseLine(line: String, fmt: String,
                tsPattern: Option[String] = None): SeriesRecord = {
    validate(fmt)
    val (key, r1) = TextProto.splitOne(line).getOrElse(
      throw new IllegalArgumentException(s"empty line"))
    val (tsTok, rest) = TextProto.splitOne(r1).getOrElse(
      throw new IllegalArgumentException(s"missing timestamp: $line"))
    val ts = tsPattern match {
      case Some(p) => TextProto.parseTimestampWith(tsTok, p)
      case None    => TextProto.parseTimestamp(tsTok)
    }
    SeriesRecord(key, ts, fmt, parseValues(fmt, rest, line))
  }

  /** Parse an ingest line with per-line format `key ts fmt v1 v2 …`
    * (ref `add_from_stream_with_fmt`, `src/formatted.rs:66-106`).
    */
  def parseLineWithFmt(line: String,
                       tsPattern: Option[String] = None): SeriesRecord = {
    val (key, r1) = TextProto.splitOne(line).getOrElse(
      throw new IllegalArgumentException(s"empty line"))
    val (tsTok, r2) = TextProto.splitOne(r1).getOrElse(
      throw new IllegalArgumentException(s"missing timestamp: $line"))
    val (fmt, rest) = TextProto.splitOne(r2).getOrElse(
      throw new IllegalArgumentException(s"missing format: $line"))
    validate(fmt)
    val ts = tsPattern match {
      case Some(p) => TextProto.parseTimestampWith(tsTok, p)
      case None    => TextProto.parseTimestamp(tsTok)
    }
    SeriesRecord(key, ts, fmt, parseValues(fmt, rest, line))
  }

  private def parseValues(fmt: String, rest0: String, line: String): Seq[Cell] = {
    var rest = rest0
    fmt.map { code =>
      val (tok, r) = TextProto.splitOne(rest).getOrElse {
        // an empty string/bytes value in final position prints as an empty
        // token (base64/escape of zero bytes is "") — accept it; numeric
        // columns can never be legitimately empty
        if (code == 's' || code == 'B') ("", "")
        else throw new IllegalArgumentException(s"missing value for '$code': $line")
      }
      rest = r
      parseCell(code, tok)
    }
  }

  /** Print a record as the reference CLI does (`print_record`,
    * `src/formatted.rs:149-198`): tab-separated key, timestamp, optional
    * format, then space-separated values; `columns` selects a 1-based
    * subset (`--columns`, ref `src/main.rs:135-139`).
    */
  def printRecord(
      r: SeriesRecord,
      tsAsNanos: Boolean = true,
      showFmt: Boolean = false,
      columns: Option[Seq[Int]] = None
  ): String =
    printRecordMode(r,
      if (tsAsNanos) TextIngest.TsNanos else TextIngest.TsHuman,
      showFmt, columns)

  def printRecordMode(
      r: SeriesRecord,
      tsMode: TextIngest.TsMode,
      showFmt: Boolean = false,
      columns: Option[Seq[Int]] = None
  ): String = {
    val ts = tsMode match {
      case TextIngest.TsNanos      => r.ts.toString
      case TextIngest.TsSeconds    => Math.floorDiv(r.ts, 1000000000L).toString
      case TextIngest.TsHuman      => TextProto.formatTimestamp(r.ts)
      case TextIngest.TsPattern(p) => TextProto.formatTimestamp(r.ts, p)
    }
    val picked = columns match {
      case Some(idxs) => idxs.flatMap(i => r.fmt.lift(i - 1).map(c => (c, r.vals(i - 1))))
      case None       => r.fmt.toSeq.zip(r.vals)
    }
    val vals = picked.map { case (c, cell) => printCell(c, cell) }.mkString(" ")
    val head = Seq(TextProto.escape(r.key), ts) ++
      (if (showFmt) Seq(r.fmt) else Nil)
    (head :+ vals).mkString("\t")
  }
}
