package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe of a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] over a Long column —
  * the cross-query analogue of Spark's own runtime bloom-filter join
  * pruning (`BloomFilterMightContain`, which only Catalyst itself can
  * inject). The filter object rides along as a codegen reference object,
  * so the probe stays inside whole-stage codegen: one virtual call per
  * row against a broadcast-sized bit array, no UDF/serialization on the
  * hot path.
  *
  * Guarantee: no false negatives — a `false` here is definitive, so
  * using this as a PREFILTER before an exact join keeps the final result
  * exact while shrinking the join's probe input by roughly the filter's
  * true-negative rate (false positives are eliminated by the join
  * itself).
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"requires long input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the filter is a reference object: serialized once with the
    // generated-code metadata (executors receive the broadcast-sized bit
    // array exactly once per task set, like any literal)
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {
  /** Column-level entry point. */
  def probe(c: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), bloom))
}
