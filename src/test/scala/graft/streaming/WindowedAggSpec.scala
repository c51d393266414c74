package graft.streaming

import graft.SparkSpec
import graft.core.Graft
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermark over a stream — value-add
  * beyond the reference (which has no streaming engine, SURVEY §2.11) but
  * core to the ingest story: the streaming result must equal the batch
  * computation over the same data.
  */
class WindowedAggSpec extends SparkSpec {

  test("streamed tumbling-window counts == batch counts") {
    Graft.configure(spark)
    val dir = "/root/testdata/sf0.001"
    val batchDf = Graft.events(spark, dir)
    // raw file schema (ts may be TIMESTAMP there) — normalizeTs maps the
    // stream onto the same canonical Long-nanos frame the batch side has
    val schema = spark.read.parquet(s"$dir/events.parquet").schema

    def windowed(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ets", timestamp_micros((col("ts") / 1000).cast("long")))
        .withWatermark("ets", "10 minutes")
        .groupBy(window(col("ets"), "1 hour"), col("event_type"))
        .count()

    val q = windowed(Graft.normalizeTs(
        spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir)))
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_agg").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_agg")
      .select(col("window.start").cast("long").as("w"), col("event_type"), col("count"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = windowed(batchDf)
      .select(col("window.start").cast("long").as("w"), col("event_type"), col("count"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streamed session windows (gap-based) == batch sessionization") {
    Graft.configure(spark)
    val dir = "/root/testdata/sf0.001"
    val batchDf = Graft.events(spark, dir)
    val schema = spark.read.parquet(s"$dir/events.parquet").schema

    // gap-close sessions per user on event time: the streaming-native
    // formulation of SeriesAnalytics.sessionize's 30-minute gap rule
    def sessions(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ets", timestamp_micros((col("ts") / 1000).cast("long")))
        .withWatermark("ets", "10 minutes")
        .groupBy(session_window(col("ets"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))

    val q = sessions(Graft.normalizeTs(
        spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir)))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sess_win").start()
    q.processAllAvailable()
    q.stop()

    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("session_window.start").cast("long").as("s"),
        col("session_window.end").cast("long").as("e"),
        col("user_id"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val streamed = norm(spark.table("sess_win"))
    val batch = norm(sessions(batchDf))
    assert(streamed.nonEmpty && streamed == batch)
  }
}
