package graft.streaming

import graft.SparkSpec
import graft.store.{Db, Manifest}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamIngestSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batches become transactions; last-wins across batches") {
    implicit val sc = spark.sqlContext
    val db = Db(spark, tmpDir("graft-stream"))
    val mem = MemoryStream[(String, Long, Long)]
    val stream = mem.toDF().toDF("key", "ts", "v")
    val cp = tmpDir("graft-cp")

    mem.addData(("a", 1L, 10L), ("b", 1L, 20L))
    StreamIngest.runAvailable(db, stream, cp)
    assert(db.read().count() == 2)

    mem.addData(("a", 1L, 99L), ("c", 1L, 30L)) // upsert a@1 + new key
    StreamIngest.runAvailable(db, stream, cp)
    val got = db.read().select("key", "ts", "v").as[(String, Long, Long)]
      .collect().toSeq
    assert(got == Seq(("a", 1L, 99L), ("b", 1L, 20L), ("c", 1L, 30L)))

    val m = Manifest.current(db.warehouse)
    assert(m.dataTxids.size == 2) // one tx per non-empty batch
  }

  test("replayed batch ids commit exactly once") {
    val db = Db(spark, tmpDir("graft-stream2"))
    val batch = Seq(("k", 1L, 1L)).toDF("key", "ts", "v")
    StreamIngest.commitBatch(db, batch, 0L)
    StreamIngest.commitBatch(db, batch, 0L) // crash-replay of same batch
    assert(db.read().count() == 1)
    assert(Manifest.current(db.warehouse).dataTxids.size == 1)
    StreamIngest.commitBatch(db, batch.withColumn("ts", lit(2L)), 1L)
    assert(db.read().count() == 2)
  }

  test("text-protocol file-drop stream: the sonnerie-serve PUT path") {
    // lines dropped as files → readStream.text → distributed parse →
    // one transaction per micro-batch (S14 semantics end-to-end)
    val inDir = tmpDir("graft-putin")
    val db = Db(spark, tmpDir("graft-put"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(inDir, "b1.txt"),
      "fib 2020-01-01T00:00:00 u 1\nfib 2020-01-02T00:00:00 u 1\n")
    val stream = graft.text.TextIngest.parseWithFmt(spark,
      spark.readStream.text(inDir).as[String](org.apache.spark.sql.Encoders.STRING))
    StreamIngest.runAvailable(db, stream.toDF(), tmpDir("graft-putcp"))
    assert(db.read("fib").count() == 2)
  }

  test("empty batches never materialize a transaction (create_tx.rs: empty tx)") {
    val db = Db(spark, tmpDir("graft-stream3"))
    StreamIngest.commitBatch(db, Seq.empty[(String, Long, Long)].toDF("key", "ts", "v"), 0L)
    assert(Manifest.current(db.warehouse).dataTxids.isEmpty)
  }
}
