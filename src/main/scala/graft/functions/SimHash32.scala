package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native SimHash over an `array<bigint>` of token hashes — bit b of
  * the result is set iff at least half the token hashes have bit b set
  * (majority vote, ties to 1). Semantically identical to the built-in
  * composition `sum_b(CASE WHEN 2 * size(filter(hs, h -> (h >> b) & 1 = 1))
  * >= size(hs) THEN 1<<b ELSE 0 END)` but a single pass over the unboxed
  * array instead of one interpreted `filter` traversal per bit per
  * document (reference near-dup role: sonnerie has none; this is the
  * training-data pipeline's fingerprint kernel).
  *
  * `bits` ≤ 64: the token hashes carry 60 portable bits
  * ([[Md5Prefix60]]), so with 60-bit inputs any voted bit ≥ 60 is
  * structurally 0 (no token ever sets it) — a 64-bit call is a 60-bit
  * fingerprint laid out on the 8×8-bit pigeonhole chunk grid, identical
  * in both engines. 32 is the demo default; 64/8-chunk is the 100 TB
  * fingerprint setting.
  */
case class SimHash32(child: Expression, bits: Int = SimHash32.BITS)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires array<bigint> input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash32.simhash(input.asInstanceOf[ArrayData], bits)

  // Static kernel must not be named `eval` (clash with Expression.eval
  // suppresses the static forwarder → Janino compile error → silent
  // interpreter fallback; see Md5Prefix60).
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash32.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)

  override def prettyName: String = "simhash32"
}

object SimHash32 {
  val BITS = 32

  /** Static kernel shared by interpreted and generated code paths.
    * An empty token-hash array is 0L — without the special case the tie
    * rule (2·ones ≥ n) would set EVERY bit for n = 0, producing a -1
    * fingerprint that violates the "voted bit ≥ 60 is structurally 0"
    * invariant and makes all empty inputs mutual dist-0 candidates.
    * Mirrored in `Dedup.sqlSimhashTerms` (the `len > 0` guard).
    */
  def simhash(hs: ArrayData, bits: Int): Long = {
    val n = hs.numElements()
    if (n == 0) return 0L
    val ones = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < bits) {
        ones(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < bits) {
      if (2 * ones(b) >= n) r |= 1L << b
      b += 1
    }
    r
  }

  def apply(c: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(c)))

  def apply(c: Column, bits: Int): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(c), bits))
}
