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
}
