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

  test("continuous corpus ingest: docs + near-dup bands in ONE warehouse, compacted mid-stream") {
    import org.apache.spark.sql.functions._
    import graft.ops.IncrementalDedup
    val db = Db(spark, tmpDir("graft-corpus-integ"))

    // onFresh materializes surviving documents as "d/" rows in the SAME
    // warehouse that holds the "m/" band store — the steady-state corpus
    // warehouse: one snapshot serves both the dedup probe and readers
    def ingest(rows: (Long, String)*): Unit =
      IncrementalDedup.ingestNearBatch(db,
        rows.toDF("doc_id", "text"), "doc_id", "text", minAgree = 4,
        onFresh = f =>
          if (!f.isEmpty) TxWriter.write(db,
            f.select(format_string("d/%012d", col("doc_id")).as("key"),
              lit(0L).as("ts"), col("doc_id"), col("text"))))

    def corpusIds(): Seq[Long] =
      db.read("d/%").select("doc_id").as[Long].collect().toSeq.sorted

    ingest(1L -> "the quick brown fox jumps over the lazy dog today",
           2L -> "a completely different document about spark engines")
    assert(corpusIds() == Seq(1L, 2L))

    // near-copy of doc 1 plus fresh content: only the fresh doc lands
    ingest(3L -> "the quick brown fox jumps over the lazy dog tonight",
           4L -> "yet another topic entirely with new vocabulary inside")
    assert(corpusIds() == Seq(1L, 2L, 4L))

    // compaction folds doc rows AND band rows; dedup state must survive
    Compactor.major(db)
    Compactor.vacuum(db, graceMs = 0L)
    assert(corpusIds() == Seq(1L, 2L, 4L))

    ingest(5L -> "a completely different document about spark engines", // exact re-arrival
           6L -> "fresh post-compaction content never registered before")
    assert(corpusIds() == Seq(1L, 2L, 4L, 6L),
      "dedup memory and corpus must both survive major compaction")
  }
}
