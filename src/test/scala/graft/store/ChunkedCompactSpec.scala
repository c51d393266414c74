package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bounded-pass minor compaction (the reference's 1000-file cap + loop):
  * folding in chunks must preserve last-wins precedence exactly.
  */
class ChunkedCompactSpec extends SparkSpec {
  import spark.implicits._

  test("chunked minor folds the tail in passes, precedence intact") {
    val db = Db(spark, tmpDir("graft-chunk"))
    // base + 6 tail txids; key "k" is rewritten in several of them —
    // the LAST write (v=6) must survive any folding order
    (0 to 6).foreach { i =>
      TxWriter.write(db,
        Seq(("k", 1L, i.toLong), (s"only$i", 1L, 100L + i)).toDF("key", "ts", "v"))
    }
    assert(db.snapshot().manifest.dataTxids.size == 7)

    Compactor.minorChunked(db, maxTxPerPass = 3)
    val m = db.snapshot().manifest
    assert(m.dataTxids.size == 2, s"base + one folded tx, got ${m.dataTxids}")

    val byKey = db.read("%").select("key", "v").as[(String, Long)].collect().toMap
    assert(byKey("k") == 6L, s"last write must win, got ${byKey("k")}")
    (0 to 6).foreach(i => assert(byKey(s"only$i") == 100L + i))
  }

  test("persisted index store: live appends + rebuild markers + chunked compaction keep scores") {
    import graft.ops.Retrieval
    val all = (0L until 100L).map(i => i -> s"w${i % 5} w${i % 11} t$i")
    val db = Db(spark, tmpDir("graft-chunk-bm25"))
    // build → append → REBUILD (issues full-range delete markers over
    // the index keyspace) → another live append ON TOP of the active
    // markers → compact in bounded passes; probing the compacted store
    // must equal the from-scratch index of the same corpus
    Retrieval.buildBm25Index(db, all.take(60).toDF("doc_id", "text"),
      "doc_id", "text")
    Retrieval.appendBm25Batch(db, all.slice(60, 80).toDF("doc_id", "text"),
      "doc_id", "text")
    Retrieval.buildBm25Index(db, all.take(90).toDF("doc_id", "text"),
      "doc_id", "text") // rebuild: markers + full write
    Retrieval.appendBm25Batch(db, all.drop(90).toDF("doc_id", "text"),
      "doc_id", "text") // live append above the markers
    assert(db.snapshot().manifest.deleteTxids.nonEmpty,
      "rebuild must leave active delete markers for the compactor")
    Compactor.minorChunked(db, maxTxPerPass = 2)
    val fresh = Db(spark, tmpDir("graft-chunk-bm25-fresh"))
    Retrieval.buildBm25Index(fresh, all.toDF("doc_id", "text"),
      "doc_id", "text")
    val qs = Seq(0L -> "w3 w10", 1L -> "t77 w2").toDF("query_id", "qtext")
    def probe(d: Db) = Retrieval.bm25ProbeIndex(d, qs, 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(probe(db) == probe(fresh),
      "compacted lifecycle store drifted from the fresh-build index")
    // and the deleted history is physically gone after a major pass
    Compactor.major(db)
    assert(probe(db) == probe(fresh))
    // the compacted layout must still take the probe's term-set as an
    // In(key) SCAN predicate (the PlanHygieneSpec shape) — compaction
    // rewrites files, it must not cost the probe its pushdown
    val postProbe = Retrieval.bm25ProbeIndex(db, qs, 10)
    postProbe.collect()
    val plan = postProbe.queryExecution.executedPlan.toString
    assert(plan.contains("In(key,") && plan.contains("p/w"),
      s"term-key pushdown lost after compaction:\n${plan.take(2000)}")
  }

  test("chunked result equals one-pass minor result") {
    def build(): Db = {
      val db = Db(spark, tmpDir("graft-chunk-eq"))
      (0 to 5).foreach { i =>
        TxWriter.write(db,
          Seq((s"k${i % 2}", 1L, i.toLong)).toDF("key", "ts", "v"))
      }
      TxWriter.delete(db, wildcard = "k0%")
      db
    }
    val a = build(); Compactor.minor(a)
    val b = build(); Compactor.minorChunked(b, maxTxPerPass = 2)
    def dump(db: Db) = db.read("%").select("key", "ts", "v")
      .as[(String, Long, Long)].collect().toSet
    assert(dump(a) == dump(b))
    assert(dump(b) == Set(("k1", 1L, 5L))) // k0 deleted, k1 last write
  }

  test("major compaction preserves every sketch store's report " +
      "byte-for-byte: folds' markers purge, grid props carry forward") {
    import graft.ops.{Sketches, SketchStore}
    val db = Db(spark, tmpDir("graft-compact-sketch"))
    // all five stores share the one warehouse (distinct key prefixes),
    // each registered in two batches with a fold in between — so the
    // compactor must purge fold markers, keep folded generations, and
    // carry the claimed grid properties through the rewrite
    def toks(b: Int) = (1 to 150).map(i => s"t${(b * 13 + i) % 60}").toDF("t")
    def vals(b: Int) = (1 to 120).map(i => (i % (25 + 10 * b) + 1).toLong).toDF("v")
    def gvals(b: Int) =
      (1 to 100).map(i => (s"s${i % 2}", (i % (30 + b) + 1).toLong)).toDF("g", "v")
    for (b <- 0 to 1) {
      SketchStore.registerKmv(db, toks(b), col("t"))
      SketchStore.registerCountMin(db, toks(b), col("t"), batchId = b.toLong)
      SketchStore.registerMg(db, toks(b), col("t"), batchId = b.toLong)
      SketchStore.registerHist(db, vals(b), col("v"), batchId = b.toLong)
      SketchStore.registerHistBy(db, gvals(b), col("g"), col("v"),
        batchId = b.toLong)
      if (b == 0) {
        SketchStore.foldKmv(db); SketchStore.foldCountMin(db)
        SketchStore.foldMg(db); SketchStore.foldHist(db)
        SketchStore.foldHistBy(db)
      }
    }
    def reports(d: Db): Seq[Seq[Any]] = Seq(
      SketchStore.storedKmvEstimate(d).collect().toSeq,
      SketchStore.probeStoredCountMin(d,
          (1 to 10).map(i => s"t$i").toDF("t"), "t")
        .orderBy("t").collect().toSeq,
      SketchStore.storedHeavyHitters(d).collect().toSeq,
      SketchStore.storedHistQuantiles(d).collect().toSeq,
      SketchStore.storedHistQuantilesBy(d).orderBy("grp", "qm")
        .collect().toSeq)
    val before = reports(db)
    val gridsBefore = (SketchStore.storedHistGrid(db),
      SketchStore.storedHistByGrid(db))
    Compactor.major(db)
    assert(db.snapshot().manifest.deleteTxids.isEmpty,
      "major must purge the folds' markers")
    assert(reports(db) == before,
      "compaction changed a stored sketch report")
    assert((SketchStore.storedHistGrid(db),
      SketchStore.storedHistByGrid(db)) == gridsBefore,
      "compaction dropped the claimed grid properties")
    // and the stores keep accepting registrations afterwards
    SketchStore.registerHist(db, vals(2), col("v"), batchId = 2L)
    val stored = SketchStore.storedHistQuantiles(db)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val direct = Sketches.histQuantilesOf(
        (0 to 2).map(vals).reduce(_ unionAll _), col("v"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(stored == direct, "post-compact registration drifted")
  }
}
