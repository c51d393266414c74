package graft.streaming

import graft.SparkSpec
import graft.core.Graft
import org.apache.spark.sql.functions._

/** Stream-stream equi-join with event-time bounds — the watermark gives
  * Spark a state-retention bound (purchases keep only signups from the
  * trailing day), which is what makes the join runnable forever on an
  * unbounded stream. Result must equal the batch join over the same data.
  */
class StreamJoinSpec extends SparkSpec {

  test("stream-stream join within event-time bounds == batch join") {
    Graft.configure(spark)
    val dir = "/root/testdata/sf0.001"
    val batchDf = Graft.events(spark, dir)
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val dayUs = 86400000000L

    def purchases(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "purchase")
        .select(col("user_id"),
          timestamp_micros((col("ts") / 1000).cast("long")).as("p_ts"),
          col("event_id").as("p_id"))
        .withWatermark("p_ts", "1 hour")
    def signups(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user"),
          timestamp_micros((col("ts") / 1000).cast("long")).as("s_ts"),
          col("event_id").as("s_id"))
        .withWatermark("s_ts", "1 hour")

    def joined(p: org.apache.spark.sql.DataFrame,
               s: org.apache.spark.sql.DataFrame) =
      p.join(s,
        col("user_id") === col("s_user") &&
          col("s_ts") <= col("p_ts") &&
          col("s_ts") >= col("p_ts") - expr(s"INTERVAL $dayUs MICROSECONDS"))
        .select(col("user_id"), col("p_id"), col("s_id"))

    def stream() = Graft.normalizeTs(spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir))

    val q = joined(purchases(stream()), signups(stream()))
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()
    q.processAllAvailable()
    q.stop()

    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = norm(spark.table("ss_join"))
    val batch = norm(joined(purchases(batchDf), signups(batchDf)))
    assert(streamed.nonEmpty && streamed == batch)
  }
}
