package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 32-bit SimHash over an `array<bigint>` of token hashes — bit b of
  * the result is set iff at least half the token hashes have bit b set
  * (majority vote, ties to 1). Semantically identical to the built-in
  * composition `sum_b(CASE WHEN 2 * size(filter(hs, h -> (h >> b) & 1 = 1))
  * >= size(hs) THEN 1<<b ELSE 0 END)` but a single pass over the unboxed
  * array instead of 32 interpreted `filter` traversals per document
  * (reference near-dup role: sonnerie has none; this is the training-data
  * pipeline's fingerprint kernel).
  */
case class SimHash32(child: Expression) extends UnaryExpression {

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
    SimHash32.eval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash32.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)

  override def prettyName: String = "simhash32"
}

object SimHash32 {
  val BITS = 32

  /** Static kernel shared by interpreted and generated code paths. */
  def eval(hs: ArrayData): Long = {
    val n = hs.numElements()
    val ones = new Array[Int](BITS)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < BITS) {
        ones(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < BITS) {
      if (2 * ones(b) >= n) r |= 1L << b
      b += 1
    }
    r
  }

  def apply(c: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(c)))
}
