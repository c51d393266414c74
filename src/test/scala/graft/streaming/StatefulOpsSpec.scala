package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._
  import StatefulOps._

  test("stateful last-value survives late data across micro-batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SeriesEvent]
    val q = lastValuePerKey(spark, mem.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("state_out").start()

    mem.addData(SeriesEvent("a", 10L, 1.0), SeriesEvent("a", 20L, 2.0),
      SeriesEvent("b", 5L, 9.0))
    q.processAllAvailable()
    mem.addData(SeriesEvent("a", 15L, 99.0)) // late: must NOT shadow ts=20
    q.processAllAvailable()
    mem.addData(SeriesEvent("a", 30L, 3.0))  // new maximum ts
    q.processAllAvailable()
    q.stop()

    val updates = spark.table("state_out").as[KeyUpdate].collect()
      .filter(_.key == "a").sortBy(_.count)
    assert(updates.map(u => (u.lastTs, u.lastValue, u.count)).toSeq ==
      Seq((20L, 2.0, 2L), (20L, 2.0, 3L), (30L, 3.0, 4L)))
  }

  test("streaming exact dedup emits each distinct content once across batches") {
    implicit val sc = spark.sqlContext
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    val mem = MemoryStream[Doc]
    val q = dedupStream(spark, mem.toDS(), lateness = Some("1 hour"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()

    mem.addData(Doc(1L, "alpha text", t(100)), Doc(2L, "beta text", t(101)),
      Doc(3L, "alpha text", t(102))) // in-batch dup of doc 1
    q.processAllAvailable()
    mem.addData(Doc(4L, "alpha text", t(200)), // cross-batch dup of doc 1
      Doc(5L, "gamma text", t(201)))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_out").as[Doc].collect()
    assert(out.map(_.text).sorted.toSeq ==
      Seq("alpha text", "beta text", "gamma text"),
      s"got: ${out.toSeq}")
  }
}
