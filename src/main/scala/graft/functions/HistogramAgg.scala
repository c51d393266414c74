package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator — the engine's `Aggregator[IN, BUF, OUT]`
  * extension point standing in for the reference's client-side Rayon
  * map-reduce (sonnerie `src/rayon.rs:12-93`, `README.md:39-40`): the
  * per-record `map` is the buffer update, the cross-partition `reduce` is
  * the merge, and Spark distributes both with partial aggregation.
  *
  * Fixed-width histogram of a double column: bin `i` counts values in
  * `[i*binWidth, (i+1)*binWidth)`; the last bin absorbs overflow.
  */
final class HistogramAgg(binWidth: Double, nBins: Int)
    extends Aggregator[Double, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(nBins)(0L)

  override def reduce(buf: Array[Long], value: Double): Array[Long] = {
    val bin = math.min(math.max((value / binWidth).toLong, 0L), (nBins - 1).toLong)
    buf(bin.toInt) += 1
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nBins) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
