package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Transaction-level pruning from manifest (key, ts) stats — the
  * reference's segment index at txid granularity: point/prefix/time reads
  * must skip non-overlapping transactions and still return exactly the
  * same rows.
  */
class TxPruneSpec extends SparkSpec {
  import spark.implicits._

  private def mkDb(): (Db, Long, Long, Long) = {
    val db = Db(spark, tmpDir("graft-prune"))
    val t1 = TxWriter.write(db,
      Seq(("apple", 10L, 1L), ("berry", 20L, 2L)).toDF("key", "ts", "v"))
    val t2 = TxWriter.write(db,
      Seq(("mango", 100L, 3L), ("melon", 200L, 4L)).toDF("key", "ts", "v"))
    val t3 = TxWriter.write(db,
      Seq(("zebra", 1000L, 5L)).toDF("key", "ts", "v"))
    (db, t1, t2, t3)
  }

  test("stats are recorded per transaction") {
    val (db, t1, t2, t3) = mkDb()
    val st = db.snapshot().manifest.txStats
    assert(st(t1) == TxStats("apple", "berry", 10L, 20L))
    assert(st(t2) == TxStats("mango", "melon", 100L, 200L))
    assert(st(t3) == TxStats("zebra", "zebra", 1000L, 1000L))
  }

  test("prefix, exact, and time reads prune to overlapping txids only") {
    val (db, t1, t2, t3) = mkDb()
    val s = db.snapshot()
    assert(s.prunedDataTxids("m%", None, None) == Vector(t2))
    assert(s.prunedDataTxids("apple", None, None) == Vector(t1))
    assert(s.prunedDataTxids("%", None, None) == Vector(t1, t2, t3))
    assert(s.prunedDataTxids("%", Some(150L), None) == Vector(t2, t3))
    assert(s.prunedDataTxids("%", None, Some(100L)) == Vector(t1))
    assert(s.prunedDataTxids("m%", Some(150L), Some(201L)) == Vector(t2))
    assert(s.prunedDataTxids("q%", None, None).isEmpty)
    // boundary: prefix successor excludes the next key range
    assert(s.prunedDataTxids("berry%", None, None) == Vector(t1))
  }

  test("pruned reads return identical results, empty prune included") {
    val (db, _, _, _) = mkDb()
    def got(p: String, a: Option[Long] = None, b: Option[Long] = None) =
      db.read(p, a, b).select("key", "v").as[(String, Long)].collect().toSet
    assert(got("m%") == Set(("mango", 3L), ("melon", 4L)))
    assert(got("%", a = Some(150L)) == Set(("melon", 4L), ("zebra", 5L)))
    assert(got("q%").isEmpty)
    assert(db.get("melon").select("v").as[Long].collect().toSeq == Seq(4L))
    assert(db.get("nope").count() == 0)
    // deletes still apply on the pruned path
    TxWriter.delete(db, wildcard = "mango%")
    assert(got("m%") == Set(("melon", 4L)))
  }

  test("a key with a literal percent is reachable via get, with pruning") {
    val db = Db(spark, tmpDir("graft-prune-pct"))
    TxWriter.write(db, Seq(("100% real", 1L, 7L)).toDF("key", "ts", "v"))
    TxWriter.write(db, Seq(("zz", 1L, 8L)).toDF("key", "ts", "v"))
    assert(db.get("100% real").select("v").as[Long].head() == 7L)
  }
}
