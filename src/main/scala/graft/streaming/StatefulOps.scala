package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators over the canonical series shape —
  * the `mapGroupsWithState` tier of the ingest story (SURVEY §2.11
  * value-add; the reference has no streaming state at all).
  */
object StatefulOps {

  final case class SeriesEvent(key: String, ts: Long, value: Double)
  final case class KeyState(lastTs: Long, lastValue: Double, count: Long)
  final case class KeyUpdate(key: String, lastTs: Long, lastValue: Double,
                             count: Long)

  /** Running last-value-per-key over an unbounded stream: emits one update
    * per key per micro-batch, tolerating arbitrarily late data with
    * last-timestamp-wins semantics (the reference's unlimited-lateness
    * upsert model, applied to state instead of storage).
    */
  def lastValuePerKey(spark: SparkSession, events: Dataset[SeriesEvent]): Dataset[KeyUpdate] = {
    import spark.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, KeyUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, batch: Iterator[SeriesEvent], state: GroupState[KeyState]) =>
          val prev = state.getOption.getOrElse(KeyState(Long.MinValue, Double.NaN, 0L))
          var best = (prev.lastTs, prev.lastValue)
          var n = prev.count
          batch.foreach { e =>
            n += 1
            if (e.ts >= best._1) best = (e.ts, e.value)
          }
          val next = KeyState(best._1, best._2, n)
          state.update(next)
          Iterator.single(KeyUpdate(key, next.lastTs, next.lastValue, next.count))
      }
  }
}
