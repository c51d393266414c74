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

  final case class Doc(doc_id: Long, text: String, eventTime: java.sql.Timestamp)

  /** Streaming exact dedup for corpus ingest: emit each distinct content
    * exactly once across micro-batches. `dropDuplicates` on the portable
    * content hash; with a watermark the dedup state is bounded (a
    * duplicate arriving later than `lateness` can re-emit — the standard
    * trade; pass None for exact-forever dedup with unbounded state, which
    * at 100 TB belongs in the batch [[graft.ops.Dedup]] pass instead).
    */
  def dedupStream(spark: SparkSession, docs: Dataset[Doc],
                  lateness: Option[String] = Some("10 minutes")): Dataset[Doc] = {
    import spark.implicits._
    val hashed = docs
      .withColumn("content_hash", org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("text")))
    // dropDuplicatesWithinWatermark dedups on the hash alone while the
    // state store evicts hashes older than the watermark — bounded state,
    // correct subset-column semantics (dropDuplicates(hash, time) would
    // wrongly treat identical content at different times as distinct)
    val deduped = lateness match {
      case Some(l) => hashed.withWatermark("eventTime", l)
        .dropDuplicatesWithinWatermark("content_hash")
      case None => hashed.dropDuplicates("content_hash")
    }
    deduped.select("doc_id", "text", "eventTime").as[Doc]
  }

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
