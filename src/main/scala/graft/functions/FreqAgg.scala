package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded Misra–Gries frequency summary (Misra & Gries 1982; merge
  * rule and error analysis from Agarwal et al. 2012, "Mergeable
  * Summaries") — the frequent-items counterpart of [[KmvAgg]]: each
  * partition folds its stream into ≤ c (item → counter) entries, the
  * shuffle carries ONE such map per partition, and merging preserves
  * the summary's deterministic guarantee: for every item,
  * `true − n/(c+1) ≤ estimate ≤ true`, so every item with frequency
  * above n/(c+1) is PRESENT in the final map no matter how the stream
  * was partitioned or in what order partials merged. That containment
  * is what [[graft.ops.Sketches.heavyHitters]] builds on: the sketch
  * supplies a provably complete candidate set of bounded size, an
  * exact second pass restores true counts, and the composition is
  * EXACT — never a tolerance check — while the shuffle never carries
  * per-item state for the long tail.
  *
  * The buffer's CONTENTS below the guarantee line are order-dependent
  * (which tail items ride along depends on partitioning); only the
  * guarantee is deterministic. Consumers must therefore treat the map
  * as candidates + lower-bound counts, which is exactly how the
  * two-pass composition uses it.
  *
  * - reduce: hit → increment; miss with room → insert at 1; miss when
  *   full → decrement ALL by one, dropping zeros (each such step
  *   retires c+1 stream units, which is where the n/(c+1) bound comes
  *   from).
  * - merge: sum counters by item; if over capacity, subtract the
  *   (c+1)-th largest counter value from every entry and keep the
  *   positive ones (the top c+1 entries each absorb the full
  *   subtraction, so mass again retires (c+1)·d per merge).
  *
  * Role: the ALGEBRAIC REFERENCE of the sketch — the 1000-case
  * SketchPropertySpec merge law is pinned against this class. The hot
  * path ([[graft.ops.Sketches.heavyHitters]]) runs the same fold as a
  * mutable per-partition pass (`Sketches.mgPartials`): an Aggregator
  * buffer must be an immutable encoded Map, and re-allocating it per
  * row measured 3× slower than the groupBy it was meant to beat.
  */
final class FreqAgg(c: Int) extends Aggregator[String, Map[String, Long],
    Map[String, Long]] {
  require(c >= 1, s"capacity must be positive, got $c")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long],
                      item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(n) => buf.updated(item, n + 1)
      case None if buf.size < c => buf.updated(item, 1L)
      case None =>
        buf.flatMap { case (k, n) =>
          if (n > 1) Some(k -> (n - 1)) else None
        }
    }

  override def merge(a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (k, n)) =>
      m.updated(k, m.getOrElse(k, 0L) + n)
    }
    if (sum.size <= c) sum
    else {
      val d = sum.valuesIterator.toArray.sortBy(-_).apply(c)
      sum.flatMap { case (k, n) =>
        if (n > d) Some(k -> (n - d)) else None
      }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

