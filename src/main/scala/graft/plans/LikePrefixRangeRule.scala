package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.series.Wildcard

/** Catalyst rule: make general `LIKE` key patterns sargable.
  *
  * `key LIKE 'fib%x%'` alone reaches the Parquet scan as an opaque string
  * filter — row groups cannot be pruned. This rule conjoins the implied
  * prefix range, `key >= 'fib' AND key < 'fic'`, which Spark's
  * `FileSourceStrategy` pushes to Parquet row-group min/max stats — the
  * Spark-native analog of the reference's wildcard planner, which derives
  * a fixed prefix from the pattern and binary-searches the segment index
  * (sonnerie `src/wildcard.rs:19-31`, `src/segment_reader.rs:173-234`).
  *
  * Spark already specializes the single-trailing-`%` case
  * (`LikeSimplification` → `StartsWith`); this rule covers every *other*
  * pattern with a literal prefix. Only top-level conjuncts are rewritten
  * (the overwhelmingly common shape), prefixes are restricted to ASCII so
  * the byte-wise successor is also the UTF8String-comparison successor,
  * and the rewrite is idempotent (skipped when the bound is already
  * present).
  */
object LikePrefixRangeRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val additions = conjuncts.flatMap {
        case Like(attr, Literal(p: UTF8String, StringType), _) =>
          rangeFor(attr, p.toString, conjuncts)
        case _ => Nil
      }
      if (additions.isEmpty) f
      else Filter((conjuncts ++ additions).reduceLeft(And), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  private def rangeFor(attr: Expression, pattern: String,
                       existing: Seq[Expression]): Seq[Expression] = {
    val w = Wildcard(pattern)
    // trailing-% patterns are already handled by LikeSimplification;
    // exact patterns have no wildcard; empty prefixes give no bound
    if (w.isExact || w.isPrefixOnly || w.prefix.isEmpty) return Nil
    if (!w.prefix.forall(_ < 0x7f)) return Nil // ASCII-only (byte order = UTF8 order)
    val lower = GreaterThanOrEqual(attr, Literal(w.prefix))
    val upper = Wildcard.asciiSuccessor(w.prefix)
      .map(s => LessThan(attr, Literal(s)))
    val adds = (lower +: upper.toSeq)
      .filterNot(a => existing.exists(_.semanticEquals(a)))
    adds
  }
}

/** Register via `spark.sql.extensions=graft.plans.GraftExtensions`, or
  * at runtime through `spark.experimental.extraOptimizations` (what
  * [[graft.core.Graft.configure]] does, so driver-created sessions get the
  * rule too). File-source pushdown happens at physical planning, so a
  * late-batch optimizer rule still feeds the Parquet scan.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => LikePrefixRangeRule)
}
