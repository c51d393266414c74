package graft

import graft.SparkSpec
import graft.store.{Compactor, Db, Manifest, TxWriter}
import graft.streaming.StreamIngest

/** Cross-feature lifecycle: streamed batches, batch writes, deletes and
  * compaction interleaved — the combinations the reference exercises via
  * `delete_quantum_choice_eraser_compact` (sonnerie `src/tests.rs:1069-1155`).
  */
class IntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("stream + delete + compact + stream keeps exact semantics") {
    val db = Db(spark, tmpDir("graft-integ"))

    StreamIngest.commitBatch(db,
      Seq(("a", 1L, 1L), ("b", 1L, 2L), ("c", 1L, 3L)).toDF("key", "ts", "v"), 0L)
    StreamIngest.commitBatch(db,
      Seq(("a", 1L, 10L), ("d", 1L, 4L)).toDF("key", "ts", "v"), 1L)

    TxWriter.delete(db, firstKey = "a", lastKey = "c") // kills a@10, b@2
    def state() = db.read().select("key", "v").as[(String, Long)].collect().toSeq
    assert(state() == Seq(("c", 3L), ("d", 4L)))

    Compactor.minor(db)
    assert(state() == Seq(("c", 3L), ("d", 4L)))

    // re-insert after delete must survive (later txid than the marker)
    StreamIngest.commitBatch(db, Seq(("b", 1L, 22L)).toDF("key", "ts", "v"), 2L)
    assert(state() == Seq(("b", 22L), ("c", 3L), ("d", 4L)))

    Compactor.major(db)
    Compactor.vacuum(db, graceMs = 0L)
    assert(state() == Seq(("b", 22L), ("c", 3L), ("d", 4L)))
    val m = Manifest.current(db.warehouse)
    assert(m.dataTxids.size == 1 && m.deleteTxids.isEmpty)

    // stream resumes after compaction with fresh txids
    StreamIngest.commitBatch(db, Seq(("e", 1L, 5L)).toDF("key", "ts", "v"), 3L)
    assert(state() == Seq(("b", 22L), ("c", 3L), ("d", 4L), ("e", 5L)))
  }
}
