package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the top 60 bits of md5(input) as a Long —
  * semantically identical to `conv(substring(md5(s), 1, 15), 16, 10)` but
  * one fused operation: no hex-string materialization, no base-16 reparse,
  * and it participates in whole-stage codegen via a static call. This is
  * the hot inner function of every dedup/fingerprint operator (one call
  * per shingle/token), where the 3-node expression chain's allocations
  * dominate ([[graft.ops.PortableHash]]).
  */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash60(input.asInstanceOf[UTF8String])

  // The static kernel must NOT be named `eval`: a companion method whose
  // name clashes with an inherited member (Expression.eval) gets no static
  // forwarder, so the generated Java fails to compile and Spark silently
  // falls back to interpreted evaluation.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix60"
}

object Md5Prefix60 {
  private val digestPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5 = top 60 bits: big-endian first 8 bytes,
    * shifted right 4 (drops the 16th hex digit). Static + JIT-friendly for
    * generated code.
    */
  def hash60(s: UTF8String): Long = {
    val md = digestPool.get()
    md.reset()
    val d = md.digest(s.getBytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  /** Column-level entry point. */
  def h60(c: Column): Column =
    ColumnBridge.column(Md5Prefix60(ColumnBridge.expression(c)))
}
