package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives.
  *
  * Everything downstream (fingerprints, MinHash, SimHash, LSH bands) is
  * built from MD5 — the one hash with identical bytes in Spark, DuckDB and
  * every other engine — reduced to integers small enough that all modular
  * arithmetic stays inside non-overflowing int64 in both engines. This is
  * what lets approximate-dedup operators have *exact* DuckDB oracles instead
  * of weaker rows-only checks.
  *
  * All expressions are Spark built-ins (codegen'd, no UDFs); the matching
  * DuckDB SQL fragments are produced by the `sql*` helpers so Scala and SQL
  * can never drift apart.
  */
object PortableHash {
  /** 2^60-space hash: first 15 hex chars of md5. Non-negative, < 2^60.
    * Spark side uses the fused native expression
    * ([[graft.functions.Md5Prefix60]] — codegen'd, no hex-string round
    * trip); [[h60Composed]] keeps the built-in composition it is
    * value-identical to (property-tested in PortableHashSpec).
    */
  def h60(c: Column): Column = graft.functions.Md5Prefix60.h60(c)

  /** Built-in-only formulation (what the DuckDB oracle mirrors). */
  def h60Composed(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def sqlH60(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  /** Prime modulus keeping (a*h + b) products within int64. */
  val P: Long = 1000000007L

  /** 30-bit hash for modular affine re-hashing (MinHash families). */
  def h30(c: Column): Column = h60(c) % P

  def sqlH30(expr: String): String = s"(${sqlH60(expr)} % ${P})"

  /** Deterministic affine family: hash_i(h) = (a_i * h + b_i) mod P with
    * a_i, b_i derived from the family index (no RNG — reproducible across
    * engines and runs).
    */
  def affine(h: Column, i: Int): Column = {
    val (a, b) = affineCoeffs(i)
    (h * a + b) % P
  }

  def sqlAffine(hExpr: String, i: Int): String = {
    val (a, b) = affineCoeffs(i)
    s"(($hExpr * ${a}::BIGINT + ${b}::BIGINT) % ${P})"
  }

  def affineCoeffs(i: Int): (Long, Long) = {
    // small odd multipliers + spread offsets, all < P
    val a = 2654435761L % P * (2 * i + 1) % P
    val b = (40503L * (i + 1) * 2654435789L) % P
    (a, b)
  }
}
