package graft.store

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Warehouse semantics mirrored from the reference test suite
  * (sonnerie `src/tests.rs` — fixture names cite the originals).
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def freshDb(): Db = Db(spark, tmpDir("graft-wh"))

  private def rows(db: Db, pattern: String = "%"): Seq[(String, Long, Long)] =
    db.read(pattern)
      .select("key", "ts", "v")
      .as[(String, Long, Long)]
      .collect()
      .toSeq

  private def tx(db: Db, data: (String, Long, Long)*): Long =
    TxWriter.write(db, data.toDF("key", "ts", "v"), rangePartitions = Some(2))

  test("merge-interleave: two txs interleave in (key, ts) order (tests.rs:481-524)") {
    val db = freshDb()
    tx(db, ("a", 1L, 10L), ("a", 2L, 11L), ("c", 1L, 30L))
    tx(db, ("b", 1L, 20L), ("d", 1L, 40L), ("d", 2L, 41L))
    assert(rows(db) == Seq(("a", 1L, 10L), ("a", 2L, 11L), ("b", 1L, 20L),
      ("c", 1L, 30L), ("d", 1L, 40L), ("d", 2L, 41L)))
  }

  test("merge-shadow: later tx wins on same (key, ts) (tests.rs:544-567)") {
    val db = freshDb()
    tx(db, ("a", 0L, 1L))
    tx(db, ("a", 0L, 2L))
    assert(rows(db) == Seq(("a", 0L, 2L)))
  }

  test("nanosecond timestamps round-trip exactly (records.rs:67-70)") {
    val db = freshDb()
    val t = 1704067798778549829L // sub-microsecond tail must survive
    tx(db, ("k", t, 7L))
    assert(rows(db) == Seq(("k", t, 7L)))
  }

  test("strict mode rejects duplicate (key, ts) in one tx (write.rs:57-79)") {
    val db = freshDb()
    intercept[TxWriter.OrderingViolation] {
      TxWriter.write(db, Seq(("a", 1L, 1L), ("a", 1L, 2L)).toDF("key", "ts", "v"),
        strict = true)
    }
  }

  test("wildcard / range / time filters on read") {
    val db = freshDb()
    tx(db, ("fib/1", 5L, 1L), ("fib/2", 10L, 2L), ("fob/1", 5L, 3L), ("zz", 1L, 4L))
    assert(rows(db, "fib%").map(_._3) == Seq(1L, 2L))
    assert(rows(db, "f%b/1").map(_._3) == Seq(1L, 3L))
    assert(rows(db, "zz").map(_._3) == Seq(4L))
    val timed = db.read("%", after = Some(5L), before = Some(10L))
    assert(timed.select("v").as[Long].collect().toSeq == Seq(1L, 3L))
  }

  test("get is an exact lookup, even for keys containing literal % (database_reader.rs:168-175)") {
    val db = freshDb()
    tx(db, ("a%b", 1L, 1L), ("axb", 1L, 2L), ("a", 1L, 3L))
    assert(db.get("a%b").select("v").as[Long].collect().toSeq == Seq(1L))
    assert(db.get("a").select("v").as[Long].collect().toSeq == Seq(3L))
    // the wildcard path treats the same string's % as magic
    assert(rows(db, "a%b").map(_._3) == Seq(1L, 2L))
  }

  test("delete suppresses lower txids; re-insert after delete survives (tests.rs:1069-1155)") {
    val db = freshDb()
    tx(db, ("a", 1L, 1L), ("b", 1L, 2L), ("c", 1L, 3L))   // txid 0
    TxWriter.delete(db, firstKey = "a", lastKey = "c")     // txid 1: deletes [a, c)
    tx(db, ("b", 1L, 22L))                                 // txid 2: re-insert
    assert(rows(db) == Seq(("b", 1L, 22L), ("c", 1L, 3L)))
  }

  test("deleteAt removes exactly one instant (main.rs:173-176)") {
    val db = freshDb()
    tx(db, ("k", 10L, 1L), ("k", 11L, 2L))
    TxWriter.deleteAt(db, "k", 10L)
    assert(rows(db) == Seq(("k", 11L, 2L)))
  }

  test("delete-all wipes the database (tests.rs:1055-1066)") {
    val db = freshDb()
    tx(db, ("a", 1L, 1L), ("b", 2L, 2L))
    TxWriter.delete(db)
    assert(db.read().count() == 0)
  }

  test("bucket-explosion guard: a dense-ts write refuses loudly and publishes nothing") {
    val db = freshDb()
    // a width-1 bucketed warehouse with dense ts (the ANN-index layout)
    // being fed a ts=doc_id store: one tbucket dir per row — the
    // warehouse-sticky misuse the guard exists for
    val dense = (0L until 20L).map(i => (f"k$i%03d", i, i))
      .toDF("key", "ts", "v")
    val boom = intercept[TxWriter.BucketExplosion] {
      TxWriter.write(db, dense, timeBucketNanos = Some(1L),
        maxNewBuckets = 8)
    }
    assert(boom.getMessage.contains("minted 20 tbucket= dirs"), boom.getMessage)
    // the refused transaction is invisible: nothing published, the
    // orphan dir is vacuumable, and the warehouse layout is NOT poisoned
    val m = Manifest.current(db.warehouse)
    assert(m.dataTxids.isEmpty, "refused tx must not publish")
    assert(m.timeBucket == 0L,
      "a refused first write must not poison the sticky layout")
    Compactor.vacuum(db, graceMs = 0L) // the orphan dir is reclaimable
    // a layout under the cap (or an explicitly raised cap) still works
    TxWriter.write(db, dense, timeBucketNanos = Some(1L),
      maxNewBuckets = 20)
    assert(rows(db).size == 20)
  }

  test("minor compaction preserves read results, fewer dirs (main.rs:397-499)") {
    val db = freshDb()
    tx(db, ("a", 1L, 1L), ("b", 1L, 2L))        // txid 0 = base, untouched
    tx(db, ("a", 1L, 10L), ("c", 1L, 3L))       // txid 1
    tx(db, ("c", 1L, 30L), ("d", 1L, 4L))       // txid 2
    TxWriter.delete(db, wildcard = "d")         // txid 3
    val before = rows(db)
    val snapBefore = db.snapshot()
    Compactor.minor(db)
    assert(rows(db) == before)
    val m = Manifest.current(db.warehouse)
    assert(m.dataTxids.size == 2 && m.dataTxids.head == 0L) // base + fresh tx
    assert(m.dataTxids.last > 3L)               // 1+2 folded into a fresh txid
    assert(m.deleteTxids.nonEmpty)              // markers kept for the base
    // pre-compaction snapshot stays readable (dirs untouched until vacuum)
    assert(snapBefore.read().select("key", "ts", "v")
      .as[(String, Long, Long)].collect().toSeq == before)
  }

  test("major compaction purges deletes and folds to one tx (main.rs:412-414)") {
    val db = freshDb()
    tx(db, ("a", 1L, 1L), ("b", 1L, 2L))
    tx(db, ("a", 1L, 10L))
    TxWriter.delete(db, wildcard = "b")
    val before = rows(db)
    Compactor.major(db)
    assert(rows(db) == before)
    val m = Manifest.current(db.warehouse)
    assert(m.dataTxids.size == 1 && m.deleteTxids.isEmpty)
    Compactor.vacuum(db, graceMs = 0L)
    assert(rows(db) == before) // still readable after vacuum
  }

  test("gegnum-style transform during compaction (main.rs:429-477)") {
    val db = freshDb()
    tx(db, ("a", 1L, 1L), ("b", 1L, 2L))
    tx(db, ("c", 1L, 3L))
    Compactor.major(db, _.filter("key <> 'b'"))
    assert(rows(db) == Seq(("a", 1L, 1L), ("c", 1L, 3L)))
  }

  test("snapshot isolation: reader bound to manifest version") {
    val db = freshDb()
    tx(db, ("a", 1L, 1L))
    val snap = db.snapshot()
    tx(db, ("b", 1L, 2L))
    assert(snap.read().count() == 1)   // old snapshot: one tx
    assert(db.read().count() == 2)     // fresh read: both
  }

  test("non-ASCII keys sort in UTF-8 byte order (file_format.md:10, SURVEY §7.4.6)") {
    val db = freshDb()
    // UTF-8 byte order: 'z' (7A) < 'é' (C3 A9) < '日' (E6 97 A5) < '😀' (F0 9F 98 80)
    // (UTF-16 code-unit order would put 😀 (surrogate D83D) before 日 (65E5))
    tx(db, ("😀", 1L, 4L), ("z", 1L, 1L), ("日", 1L, 3L), ("é", 1L, 2L))
    assert(rows(db).map(_._3) == Seq(1L, 2L, 3L, 4L))
    assert(rows(db, "é").map(_._3) == Seq(2L)) // exact lookup on multibyte key
  }

  test("heterogeneous schemas across txs merge on read (README.md:141-149)") {
    val db = freshDb()
    TxWriter.write(db, Seq(("a", 1L, 1L)).toDF("key", "ts", "v"))
    TxWriter.write(db, Seq(("b", 2L, "hello")).toDF("key", "ts", "s"))
    val got = db.read().select("key", "v", "s").collect()
    assert(got.length == 2)
  }
}
