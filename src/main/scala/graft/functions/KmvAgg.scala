package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded k-minimum-values buffer — the typed `Aggregator` that makes
  * KMV cardinality estimation ([[graft.ops.Sketches]]) actually cheap at
  * scale: each partition folds its rows into a ≤ k sorted array of
  * distinct hash minima (O(k) per row, k=64 longs), and the shuffle
  * carries ONE such array per partition instead of every distinct hash.
  * A `distinct().orderBy.limit(k)` formulation computes the same k values
  * but pays a full distinct shuffle first — the difference between the
  * sketch replacing the exact count and merely decorating it.
  *
  * The result (ascending k smallest distinct hashes) is order-insensitive
  * — any partitioning, any merge tree, same array — which is what lets
  * the DuckDB oracle use a plain window formulation.
  */
final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.empty[Long]

  override def reduce(buf: Array[Long], h: Long): Array[Long] = insert(buf, h)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var r = a
    var i = 0
    while (i < b.length) { r = insert(r, b(i)); i += 1 }
    r
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  /** Sorted-insert keeping the k smallest distinct values. Mutates in
    * place once the buffer is full (the Aggregator contract allows
    * reusing the buffer it is handed).
    */
  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins >= k) buf // above the current k-th minimum
      else {
        var i = k - 1
        while (i > ins) { buf(i) = buf(i - 1); i -= 1 }
        buf(ins) = h
        buf
      }
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object KmvAgg {
  /** Column-world handle: `kmv(k)(hashCol)` aggregates to the ascending
    * ≤ k minima array.
    */
  def kmv(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvAgg(k), Encoders.scalaLong)
}
