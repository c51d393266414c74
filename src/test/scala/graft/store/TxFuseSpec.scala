package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused claim-and-publish protocol ([[TxWriter.write]]'s `fuse`):
  * ONE manifest commit per transaction for single-writer sinks, with
  * unconditional fallback to claim-first whenever the fused attempt
  * cannot proceed — and byte-identical visible state either way.
  */
class TxFuseSpec extends SparkSpec {
  import spark.implicits._

  private def db() =
    Db(spark, java.nio.file.Files.createTempDirectory("graft-fuse").toString)

  private def rows(xs: (String, Long, Long)*) = xs.toDF("key", "ts", "v")

  test("fused write: ONE manifest commit claims AND publishes; rows, " +
      "stats, cursor and props identical to claim-first") {
    val a = db(); val b = db()
    val data = rows(("k1", 1L, 10L), ("k2", 2L, 20L), ("k0", 0L, 5L))
    // claim-first: 2 commits (claim, publish); fused: 1
    val v0a = Manifest.currentVersion(a.warehouse)
    TxWriter.write(a, data, props = Map("p" -> "1"),
      streamCursor = Some(("s", 0L)))
    assert(Manifest.currentVersion(a.warehouse) - v0a == 2)
    val v0b = Manifest.currentVersion(b.warehouse)
    TxWriter.write(b, data, props = Map("p" -> "1"),
      streamCursor = Some(("s", 0L)), fuse = true)
    assert(Manifest.currentVersion(b.warehouse) - v0b == 1,
      "fused = one claim-and-publish commit")
    // visible state identical: rows, txid accounting, stats, riders
    assert(a.read().select("key", "ts", "v").as[(String, Long, Long)]
      .collect().toSeq ==
      b.read().select("key", "ts", "v").as[(String, Long, Long)]
        .collect().toSeq)
    val (ma, mb) = (Manifest.current(a.warehouse), Manifest.current(b.warehouse))
    assert(mb.dataTxids == ma.dataTxids && mb.nextTxid == ma.nextTxid)
    assert(mb.txStats == ma.txStats && mb.schemaDdl == ma.schemaDdl)
    assert(mb.props.get("p").contains("1"))
    assert(mb.streamBatchFor("s") == 0L)
    assert(mb.pending.isEmpty, "fused never leaves a pending claim")
    // and the two protocols interleave on one warehouse over time
    TxWriter.write(b, rows(("k1", 1L, 99L)))             // claim-first
    TxWriter.write(b, rows(("k3", 3L, 30L)), fuse = true) // fused again
    assert(b.read().filter(col("key") === "k1").select("v").as[Long]
      .collect().toSeq == Seq(99L), "last-wins across protocols")
    assert(b.read().count() == 4)
  }

  test("a crashed fused writer's orphan directory: the number is burned, " +
      "the fallback succeeds, vacuum cleans the orphan") {
    val w = db()
    TxWriter.write(w, rows(("a", 1L, 1L)), fuse = true)
    // simulate a crash between the fused dir write and its publish: an
    // orphan parquet dir sits at the UNCLAIMED nextTxid
    val m0 = Manifest.current(w.warehouse)
    val orphan = m0.nextTxid
    rows(("ghost", 9L, 9L)).write
      .parquet(s"${w.dataDir}/txid=$orphan")
    // the next fused write cannot take the occupied number: it burns it
    // and falls back to claim-first — loudly correct, never colliding
    TxWriter.write(w, rows(("b", 2L, 2L)), fuse = true)
    val m1 = Manifest.current(w.warehouse)
    assert(!m1.dataTxids.contains(orphan), "orphan never published")
    assert(m1.nextTxid > orphan + 1, "occupied number burned")
    assert(w.read().select("key").as[String].collect().toSet ==
      Set("a", "b"), "ghost rows invisible")
    // vacuum (grace 0 = known-quiescent) removes the orphan directory
    Compactor.vacuum(w, graceMs = 0L)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(w.dataDir, s"txid=$orphan")))
  }

  test("a pending claim-first writer makes fused fall back (protocols " +
      "never interleave mid-flight); propsClaim conflicts still refuse") {
    val w = db()
    TxWriter.write(w, rows(("a", 1L, 1L)))
    // raise the pending fence as an in-flight claim-first writer would
    Manifest.update(w.warehouse)(m => m.copy(
      pending = m.pending + (m.nextTxid -> System.currentTimeMillis()),
      nextTxid = m.nextTxid + 1))
    val vBefore = Manifest.currentVersion(w.warehouse)
    TxWriter.write(w, rows(("b", 2L, 2L)), fuse = true)
    // fallback = claim-first = 2 commits, and the foreign claim survives
    assert(Manifest.currentVersion(w.warehouse) - vBefore == 2)
    assert(Manifest.current(w.warehouse).pending.size == 1)
    assert(w.read().count() == 2)
    // clear the synthetic claim; a conflicting propsClaim through the
    // FUSED path refuses exactly like claim-first (nothing published)
    Manifest.update(w.warehouse)(m => m.copy(pending = Map.empty))
    TxWriter.write(w, rows(("c", 3L, 3L)), propsClaim = Map("geo" -> "x"),
      fuse = true)
    val n = w.read().count()
    intercept[TxWriter.PropertyConflict] {
      TxWriter.write(w, rows(("d", 4L, 4L)), propsClaim = Map("geo" -> "y"),
        fuse = true)
    }
    assert(w.read().count() == n, "conflicting claim published nothing")
    assert(Manifest.current(w.warehouse).props.get("geo").contains("x"))
    // the refused fused write must NOT strand its tentative directory at
    // the unclaimed nextTxid — a claim-first writer takes that number
    // next and must not crash on an occupied path
    TxWriter.write(w, rows(("e", 5L, 5L)))
    assert(w.read().filter(col("key") === "e").count() == 1,
      "claim-first write after a fused PropertyConflict must succeed")
  }

  test("a claim-first write racing a PAUSED fused write self-heals: " +
      "BOTH succeed — the racer steps past the occupied number, the " +
      "fused side renames forward") {
    val w = db()
    TxWriter.write(w, rows(("a", 1L, 1L)))
    val tentative = Manifest.current(w.warehouse).nextTxid
    @volatile var racerTx = -1L
    // fire exactly while the fused writer's directory sits at the
    // UNCLAIMED nextTxid: the claim-first racer claims that number,
    // finds the directory occupied, burns it and takes the next
    TxWriter.fusePauseHook = () => {
      TxWriter.fusePauseHook = () => ()
      racerTx = TxWriter.write(w, rows(("c", 3L, 3L)))
    }
    try {
      val fusedTx = TxWriter.write(w, rows(("b", 2L, 2L)), fuse = true)
      assert(racerTx >= 0, "the racing claim-first write committed")
      assert(racerTx != tentative,
        "the racer must step past the occupied tentative number")
      assert(fusedTx != tentative && fusedTx != racerTx,
        "the fused side renames forward to a fresh number")
      val m = Manifest.current(w.warehouse)
      assert(m.dataTxids.contains(racerTx) && m.dataTxids.contains(fusedTx))
      assert(!m.dataTxids.contains(tentative), "burned number never publishes")
      assert(m.pending.isEmpty, "no dead claim left behind")
      assert(w.read().select("key").as[String].collect().toSet ==
        Set("a", "b", "c"), "both writers' rows visible")
    } finally TxWriter.fusePauseHook = () => ()
  }

  test("the simultaneous-start window is CLOSED: a claim-first write " +
      "landing inside a fused write's pre-job window — both succeed, " +
      "the fused side re-targets the fresh number, no txid burned") {
    val w = db()
    TxWriter.write(w, rows(("a", 1L, 1L)))
    val n = Manifest.current(w.warehouse).nextTxid
    @volatile var racerTx = -1L
    // fire after the fused writer's start checks (it has already decided
    // nextTxid == n is free) but before its write job — under the old
    // direct-write protocol both parquet jobs would then target txid=n
    // and one side failed loudly; with tentative-dir + atomic rename the
    // racer takes n and the fused side renames onto n+1
    TxWriter.fuseWriteHook = () => {
      TxWriter.fuseWriteHook = () => ()
      racerTx = TxWriter.write(w, rows(("c", 3L, 3L)))
    }
    try {
      val vBefore = Manifest.currentVersion(w.warehouse)
      val fusedTx = TxWriter.write(w, rows(("b", 2L, 2L)), fuse = true)
      assert(racerTx == n, "the racer takes the contested number itself")
      assert(fusedTx == n + 1, "the fused side re-targets the fresh number")
      val m = Manifest.current(w.warehouse)
      assert(m.dataTxids.contains(racerTx) && m.dataTxids.contains(fusedTx))
      assert(m.nextTxid == n + 2, "no txid number burned")
      assert(m.pending.isEmpty, "no dead claim left behind")
      // the fused side still committed in ONE manifest commit (racer = 2)
      assert(Manifest.currentVersion(w.warehouse) - vBefore == 3)
      assert(w.read().select("key").as[String].collect().toSet ==
        Set("a", "b", "c"), "both writers' rows visible")
    } finally TxWriter.fuseWriteHook = () => ()
  }

  test("fused registrations race folds safely: the fold's conditional " +
      "publish and the fused CAS serialize; no count is lost") {
    import graft.ops.SketchStore
    val w = db()
    val toks = (1 to 50).map(i => s"w${i % 20}").toDF("t")
    // interleave: fused registration, fold, fused registration, fold —
    // each fold's supersede must see (and preserve) every fused batch
    SketchStore.registerMg(w, toks, col("t"), batchId = 0L, fuse = true)
    SketchStore.foldMg(w)
    SketchStore.registerMg(w, toks, col("t"), batchId = 1L, fuse = true)
    SketchStore.foldMg(w)
    val got = SketchStore.storedHeavyHitters(w)
      .select("item", "est").as[(String, Long)].collect().toMap
    // 20 items × 2-3 occurrences × 2 batches, all within MG capacity:
    // every count exact and doubled
    assert(got.values.sum == 100, s"folded mass drifted: $got")
    assert(got("w1") == 6L, s"per-item count drifted: $got")
  }
}
