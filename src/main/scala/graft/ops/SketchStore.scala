package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental sketches backed by the engine's own warehouse — the
  * streaming-corpus counterpart of [[Sketches]]: per-batch registration
  * keeps running cardinality/frequency state WITHOUT rescanning history,
  * because both sketches are mergeable and the warehouse's (key, ts)
  * last-wins merge is exactly the right fold:
  *
  *  - KMV: one row per sketch minimum, `key = "k/<tag>"`, `ts = h`. The
  *    union law (k smallest of A∪B ⊆ k-min(A) ∪ k-min(B)) means a batch
  *    only ever writes its OWN ≤ k minima; duplicate minima across
  *    batches collapse to the same (key, ts) record; the read-side top-k
  *    over the prefix IS the exact sketch of everything ever registered.
  *    No read-modify-write, ever.
  *  - count-min: counters add across batches, so cells are per-batch
  *    rows — `key = "c/<tag>/<row>/<bucket>"`, `ts = batchId`, summed at
  *    read time. Re-registering a batchId overwrites the same (key, ts)
  *    records: registration is idempotent under streaming retries, the
  *    same exactly-once contract as
  *    [[graft.streaming.StreamIngest]]'s batch-id guard.
  *
  * Both stores are ordinary warehouse rows: compaction, time travel and
  * transactional publish apply unchanged, and they can share a warehouse
  * with the dedup fingerprint stores (distinct key prefixes).
  */
object SketchStore {
  /** Reserved count-min batchId for [[foldCountMin]] rewrites; normal
    * registrations must use batchId ≥ 0.
    */
  val FOLD_TS: Long = -1L

  private def kmvKey(tag: String) = s"k/$tag"
  private def cmPrefix(tag: String) = s"c/$tag/"

  // ── KMV ────────────────────────────────────────────────────────────

  /** Registers a batch's ≤ k hash minima as ONE transaction. The batch
    * prices one [[Sketches.kmvSketch]] fold (bounded-buffer aggregation)
    * plus a ≤ k-row write — store size and history never enter the cost.
    */
  def registerKmv(db: graft.store.Db, batch: DataFrame, elem: Column,
                  tag: String = "t", k: Int = Sketches.KMV_K): Long = {
    val rows = Sketches.kmvSketch(batch, elem, k)
      .select(lit(kmvKey(tag)).as("key"), col("h").as("ts"), col("h"))
    graft.store.TxWriter.write(db, rows)
  }

  /** The merged sketch of every batch ever registered: the k smallest
    * distinct stored minima — a key-pruned read of ≤ k·batches slim
    * rows, then a driver-side top-k. Empty (0-row) sketch if nothing is
    * registered under `tag`.
    */
  def storedKmvSketch(db: graft.store.Db, tag: String = "t",
                      k: Int = Sketches.KMV_K): DataFrame = {
    val spark = db.spark
    val snap = db.snapshot()
    val empty = spark.range(0).select(col("id").as("h"))
    if (snap.manifest.dataTxids.isEmpty) empty
    else {
      val rows = snap.read(kmvKey(tag))
      if (!rows.columns.contains("h")) empty
      else rows.select(col("h")).orderBy("h").limit(k)
    }
  }

  /** One-row estimate from the stored sketch ([[Sketches.kmvEstimate]]
    * on [[storedKmvSketch]]) — by the union law, EXACTLY the estimate a
    * single full-history sketch would produce.
    */
  def storedKmvEstimate(db: graft.store.Db, tag: String = "t",
                        k: Int = Sketches.KMV_K): DataFrame =
    Sketches.kmvEstimate(storedKmvSketch(db, tag, k), k)

  // ── count-min ──────────────────────────────────────────────────────

  /** Registers a batch's counter grid (≤ d·w cells) as ONE transaction
    * under `batchId`. Idempotent: re-running the same batchId rewrites
    * the same (key, ts) records and last-wins keeps one copy — safe
    * under streaming retries.
    */
  def registerCountMin(db: graft.store.Db, batch: DataFrame, elem: Column,
                       batchId: Long, tag: String = "t",
                       d: Int = Sketches.CM_D,
                       w: Long = Sketches.CM_W): Long = {
    require(batchId >= 0, s"batchId must be >= 0 ($FOLD_TS is reserved)")
    val rows = Sketches.countMinSketch(batch, elem, d, w)
      .select(
        format_string(cmPrefix(tag) + "%d/%06d", col("sk_row"), col("bucket"))
          .as("key"),
        lit(batchId).as("ts"), col("sk_row"), col("bucket"), col("c"))
    graft.store.TxWriter.write(db, rows)
  }

  /** The running grid: per-cell sums over every registered batch (and
    * fold) — a key-pruned read of ≤ d·w·batches slim rows into a d·w
    * aggregation. Drop-in for [[Sketches.countMinProbe]]'s sketch side.
    */
  def storedCountMin(db: graft.store.Db, tag: String = "t"): DataFrame = {
    val spark = db.spark
    val snap = db.snapshot()
    val empty = spark.range(0).select(col("id").cast("int").as("sk_row"),
      col("id").as("bucket"), col("id").as("c"))
    if (snap.manifest.dataTxids.isEmpty) empty
    else {
      val rows = snap.read(cmPrefix(tag) + "%")
      if (!rows.columns.contains("c")) empty
      else rows.groupBy("sk_row", "bucket").agg(sum(col("c")).as("c"))
    }
  }

  /** Frequency estimates for `items` against the running grid. */
  def probeStoredCountMin(db: graft.store.Db, items: DataFrame,
                          elemCol: String, tag: String = "t",
                          d: Int = Sketches.CM_D,
                          w: Long = Sketches.CM_W): DataFrame =
    Sketches.countMinProbe(items, storedCountMin(db, tag), elemCol, d, w)

  /** Collapses the per-batch history to one folded grid: range-delete
    * the tag's cells, then rewrite the current sums at the reserved
    * `ts = FOLD_TS` (write AFTER delete, so the fold's higher txid
    * survives the marker — the [[Similarity.buildIndex]] rebuild-
    * supersede pattern). Subsequent folds re-fold the fold: the sums
    * read before the delete already include it. Bounds the store at
    * d·w + d·w·(batches since last fold) rows; compaction purges the
    * deleted history physically.
    */
  def foldCountMin(db: graft.store.Db, tag: String = "t"): Long = {
    // safe against concurrent registrations via the conditional-claim
    // fence: the range-delete claims its txid ONLY if no transaction
    // landed since the sums below were read (TxWriter.deleteIf) — a
    // registration racing into that window makes the claim fail and the
    // fold re-reads (its counts then INCLUDED in the refold); one
    // landing after the claim gets a higher txid and survives the
    // marker by construction. No registration can be erased either way.
    var attempts = 0
    while (attempts < 16) {
      val expected = graft.store.Manifest.current(db.warehouse).nextTxid
      if (storedCountMin(db, tag).isEmpty) return -1L // nothing to fold
      val folded = storedCountMin(db, tag)
        .select(
          format_string(cmPrefix(tag) + "%d/%06d", col("sk_row"), col("bucket"))
            .as("key"),
          lit(FOLD_TS).as("ts"), col("sk_row"), col("bucket"), col("c"))
        .localCheckpoint(true) // materialize the sums BEFORE the delete
      graft.store.TxWriter.deleteIf(db, expected, t0 = Long.MinValue,
          t1 = Long.MaxValue, wildcard = cmPrefix(tag) + "%") match {
        case Some(_) => return graft.store.TxWriter.write(db, folded)
        case None    => attempts += 1 // a commit raced in — refold over it
      }
    }
    throw new IllegalStateException(
      s"foldCountMin($tag): persistent registration contention")
  }
}
