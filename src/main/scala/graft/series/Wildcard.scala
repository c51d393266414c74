package graft.series

/** SQL-LIKE `%` wildcard analysis for key predicates.
  *
  * Mirrors the *semantics* of the reference's wildcard planner
  * (sonnerie `src/wildcard.rs:4-84`): a pattern is decomposed into
  *   - a fixed literal prefix (everything before the first `%`) used to turn
  *     the pattern into a sargable key *range* `[prefix, prefixSuccessor)`;
  *   - whether it is exact (no `%` at all → point lookup);
  *   - whether a residual LIKE match is still needed (any `%` before the end).
  *
  * The range is what makes the scan efficient: Spark pushes `key >= a AND
  * key < b` to Parquet row-group min/max stats, so only row groups containing
  * the prefix are read — the Spark-native equivalent of sonnerie's segment
  * binary search (`src/segment_reader.rs:173-234`).
  *
  * Only `%` is a wildcard (the reference supports no `_`); we escape `_` and
  * `\` when building the residual LIKE pattern so they match literally.
  */
final case class Wildcard(pattern: String) {
  /** Literal prefix before the first `%` (whole pattern if exact). */
  val prefix: String = pattern.takeWhile(_ != '%')

  /** No `%` at all → exact key lookup. */
  val isExact: Boolean = !pattern.contains('%')

  /** `prefix%` shaped (single trailing `%`) → pure range scan, no regex/LIKE
    * residual needed (reference: `as_regex` returns None, `src/wildcard.rs:34-40`).
    */
  val isPrefixOnly: Boolean =
    !isExact && pattern.indexOf('%') == pattern.length - 1

  /** LIKE pattern where `_` and `\` are escaped so only `%` is magic. */
  val likePattern: String =
    pattern.flatMap {
      case '_'  => "\\_"
      case '\\' => "\\\\"
      case c    => c.toString
    }

  def matchesAll: Boolean = prefix.isEmpty && !isExact
}

object Wildcard {
  /** Smallest string strictly greater than every string with this prefix,
    * under UTF-8 byte ordering: increment the last byte that is < 0xFF,
    * dropping any trailing 0xFF bytes. Returns None when the prefix is all
    * 0xFF (or empty) → the range is unbounded above.
    */
  def prefixSuccessor(prefix: String): Option[String] = {
    val bytes = prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = bytes.length - 1
    while (i >= 0 && bytes(i) == -1) i -= 1 // -1 == 0xFF as signed byte
    if (i < 0) None
    else {
      val out = java.util.Arrays.copyOf(bytes, i + 1)
      out(i) = (out(i) + 1).toByte
      // Resulting byte string may not be valid UTF-8; ISO-8859-1 keeps the
      // bytes verbatim for use as an upper bound on a binary(key) compare.
      Some(new String(out, java.nio.charset.StandardCharsets.ISO_8859_1))
    }
  }

  /** Successor usable directly on Spark StringType comparisons for ASCII
    * prefixes (the common case — UTF-16 and UTF-8 order agree on ASCII).
    */
  def asciiSuccessor(prefix: String): Option[String] = {
    var i = prefix.length - 1
    while (i >= 0 && prefix.charAt(i) == '￿') i -= 1
    if (i < 0) None
    else Some(prefix.substring(0, i) + (prefix.charAt(i) + 1).toChar)
  }
}
