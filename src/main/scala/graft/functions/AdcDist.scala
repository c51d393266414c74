package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native ADC distance: sums a query's per-subspace lookup-table entries
  * at a row's PQ codes — `Σ_mm lut[mm*k + codes[mm]]` over two
  * `array<bigint>` inputs (`k` = `lut.length / codes.length`), exact
  * int64.
  *
  * Semantically identical to the composed
  * `Σ_mm element_at(lutLit_mm, element_at(codes, mm+1) + 1)` chain the
  * probe paths used to build per query (PqSpec asserts the equivalence),
  * but one expression node instead of `m`: with 64 in-flight queries the
  * composed shape is ~m × 64 `element_at` nodes whose generated code
  * exceeds Janino's 64 KB method limit — the whole scoring projection
  * then silently runs interpreted (measured on AnnStress). The LUT rides
  * as a regular column (usually `element_at` of a literal query→LUT map),
  * so one kernel serves every query.
  */
case class AdcDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"requires two array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(codes: Any, lut: Any): Any =
    AdcDist.dist(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.functions.AdcDist.dist($c, $l)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDist =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "adc_dist"
}

object AdcDist {
  /** Static kernel for both interpreted and generated code paths. */
  def dist(codes: ArrayData, lut: ArrayData): Long = {
    val m = codes.numElements()
    val k = lut.numElements() / m
    var s = 0L
    var mm = 0
    while (mm < m) {
      s += lut.getLong(mm * k + codes.getLong(mm).toInt)
      mm += 1
    }
    s
  }

  def apply(codes: Column, lut: Column): Column =
    ColumnBridge.column(
      AdcDist(ColumnBridge.expression(codes), ColumnBridge.expression(lut)))
}
