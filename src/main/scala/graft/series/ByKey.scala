package graft.series

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Row}
import org.apache.spark.sql.functions._

/** Per-key ordered iteration — the reference's `feature=by-key` API
  * (sonnerie `src/bykey.rs:18-311`): an outer stream of keys, each with an
  * inner iterator of that key's records in timestamp order.
  *
  * Spark-native formulation: secondary sort. Records are hash-partitioned
  * by key and sorted `(key, ts)` *within partitions* — so each task streams
  * consecutive same-key runs without materializing any group in memory
  * (unlike `groupByKey.flatMapGroups`, which buffers a group's rows and
  * gives no ordering). Keys are never split across tasks, the reference's
  * parallel-split invariant (`src/database_reader.rs:307-388`).
  */
object ByKey {

  /** Apply `f(key, orderedRecords)` per key; `f` sees the key's rows in
    * ascending `tsCol` order and streams its output.
    */
  def mapKeys[T: Encoder](df: DataFrame, keyCol: String, tsCol: String)(
      f: (String, Iterator[Row]) => Iterator[T]): Dataset[T] = {
    val parts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val keyIdx = df.schema.fieldIndex(keyCol)
    df.repartition(parts, col(keyCol))
      .sortWithinPartitions(col(keyCol), col(tsCol))
      .mapPartitions { rows =>
        groupRuns(rows, (r: Row) => r.getString(keyIdx)).flatMap {
          case (k, it) => f(k, it)
        }
      }
  }

  /** Lazily split an iterator into consecutive runs of equal group key.
    * Each inner iterator MUST be consumed (or dropped via `drainRest`)
    * before the next run is requested — the same one-at-a-time contract as
    * the reference's `LendingCell` (`src/bykey.rs`).
    */
  def groupRuns[A, K](it: Iterator[A], keyOf: A => K): Iterator[(K, Iterator[A])] =
    new Iterator[(K, Iterator[A])] {
      private val buf = it.buffered
      private var current: Iterator[A] = Iterator.empty

      override def hasNext: Boolean = {
        while (current.hasNext) current.next() // drain unconsumed rest
        buf.hasNext
      }

      override def next(): (K, Iterator[A]) = {
        if (!hasNext) throw new NoSuchElementException
        val k = keyOf(buf.head)
        val inner = new Iterator[A] {
          override def hasNext: Boolean = buf.hasNext && keyOf(buf.head) == k
          override def next(): A = {
            if (!hasNext) throw new NoSuchElementException
            buf.next()
          }
        }
        current = inner
        (k, inner)
      }
    }
}
