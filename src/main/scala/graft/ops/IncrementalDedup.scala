package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (cross-batch) exact dedup backed by the engine's own
  * warehouse — the steady-state ingest shape at corpus scale: you never
  * re-dedup 100 TB per arriving batch; you keep a persistent fingerprint
  * store and anti-join each NEW batch against it, then register the
  * batch's own fingerprints as one transaction.
  *
  * Store layout (ordinary graft warehouse, so compaction / time travel /
  * exactly-once streaming batch-ids all apply unchanged): one row per
  * distinct content, `key = "h/" + hex(h60(text))`, `ts = 0`, plus the
  * raw 60-bit hash (`h`, for scan-speed bloom probes) and the canonical
  * `doc_id` that first carried the content.
  *
  * Probe shape (the part that must survive 100 TB): the seen-store can
  * hold billions of fingerprints while a batch is bounded, so neither
  * "broadcast the store" nor "shuffle the store" is acceptable. Instead:
  * (1) build a bloom filter of the BATCH's hashes (tiny); (2) scan the
  * store's single `h` column through a codegen'd
  * [[graft.functions.BloomMightContain]] probe — survivors are at most
  * `|batch| + fpp·|store|` rows; (3) broadcast those matched hashes and
  * anti-join the batch against them. The store is scanned (one slim
  * column), never shuffled, never broadcast.
  */
object IncrementalDedup {

  private def hashed(batch: DataFrame, idCol: String, textCol: String) =
    batch.withColumn("_h", PortableHash.h60(col(textCol)))

  private def fingerprints(batch: DataFrame, idCol: String,
                           textCol: String): DataFrame =
    hashed(batch, idCol, textCol)
      .groupBy(col("_h").as("h"))
      .agg(min(col(idCol).cast("long")).as("doc_id"))
      .select(format_string("h/%015x", col("h")).as("key"),
        lit(0L).as("ts"), col("h"), col("doc_id"))

  /** Registers a batch's content fingerprints as ONE transaction
    * (within-batch duplicates collapse to the min doc_id; re-registering
    * known content rewrites the same (key, ts=0) and last-wins merge
    * keeps the store one-row-per-content). Returns the txid.
    */
  def registerBatch(db: graft.store.Db, batch: DataFrame, idCol: String,
                    textCol: String): Long =
    graft.store.TxWriter.write(db, fingerprints(batch, idCol, textCol))

  /** The arriving batch minus documents whose content is already
    * registered in `db`. Within-batch duplicates are NOT collapsed here
    * (compose with [[Dedup.dropExactDuplicates]] for that); columns pass
    * through unchanged.
    */
  def dropSeenBefore(db: graft.store.Db, batch: DataFrame, idCol: String,
                     textCol: String, fpp: Double = 0.01): DataFrame = {
    val b = hashed(batch, idCol, textCol)
    val snap = db.snapshot()
    val seen = snap.read("h/%")
    if (snap.manifest.dataTxids.isEmpty) return b.drop("_h")
    // tiny: one long per distinct batch content
    val batchHashes = b.select(col("_h").as("h")).distinct()
    val nBatch = batchHashes.count()
    if (nBatch == 0) return b.drop("_h")
    val bloom = batchHashes.stat.bloomFilter("h", math.max(nBatch, 64L), fpp)
    // store side: slim column scan, bloom-probed at scan speed; the
    // surviving matched-hash relation is bounded by the batch size (+fpp
    // of the store) and broadcasts
    val matched = seen
      .filter(graft.functions.BloomMightContain.probe(col("h"), bloom))
      .select(col("h").as("_h")).distinct()
    b.join(broadcast(matched), Seq("_h"), "left_anti").drop("_h")
  }

  /** The full ingest step: drop already-seen content, hand the fresh
    * rows to `onFresh` (the downstream forward), THEN register them —
    * forward-first so a crash between the two replays as a re-forward
    * (at-least-once delivery), never as content marked seen but never
    * delivered. Returns the fresh rows. One store scan + one tx per
    * batch.
    */
  def ingestBatch(db: graft.store.Db, batch: DataFrame, idCol: String,
                  textCol: String,
                  onFresh: DataFrame => Unit = _ => ()): DataFrame = {
    val fresh = dropSeenBefore(db, batch, idCol, textCol)
      .localCheckpoint(true) // the register tx must not re-plan the probe
    onFresh(fresh)
    if (!fresh.isEmpty) registerBatch(db, fresh, idCol, textCol)
    fresh
  }
}
