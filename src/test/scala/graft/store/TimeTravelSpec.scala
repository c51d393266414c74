package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Every manifest commit is an immutable version file, so any historical
  * state is re-readable by version — time travel, valid until vacuum
  * prunes unreferenced transaction dirs.
  */
class TimeTravelSpec extends SparkSpec {
  import spark.implicits._

  private def keys(df: org.apache.spark.sql.DataFrame) =
    df.select("key").as[String].collect().toSet

  test("snapshotAt reads historical states; vacuum invalidates them") {
    val db = Db(spark, tmpDir("graft-tt"))
    TxWriter.write(db, Seq(("a", 1L, 1L)).toDF("key", "ts", "v"))
    val v1 = db.snapshot().manifest.version
    TxWriter.write(db, Seq(("b", 1L, 2L)).toDF("key", "ts", "v"))
    TxWriter.delete(db, wildcard = "a%")
    val v2 = db.snapshot().manifest.version

    // historical reads
    assert(keys(db.snapshotAt(v1).read("%")) == Set("a"))
    assert(keys(db.snapshotAt(v2).read("%")) == Set("b"))
    assert(keys(db.read("%")) == Set("b"))
    assert(Manifest.versions(db.warehouse).size >= 4) // 2 per write + delete

    // compaction rewrites into a fresh txid; the OLD version still reads
    // the pre-compaction state from the original dirs
    Compactor.major(db)
    assert(keys(db.snapshotAt(v1).read("%")) == Set("a"),
      "pre-compaction snapshot must stay readable before vacuum")
    assert(keys(db.read("%")) == Set("b"))

    // vacuum prunes to the CURRENT live set: history contract ends
    Compactor.vacuum(db, graceMs = 0L)
    assert(keys(db.read("%")) == Set("b"), "current snapshot survives vacuum")
    val historical = scala.util.Try(db.snapshotAt(v1).read("%").count())
    assert(historical.isFailure || !keys(db.snapshotAt(v1).read("%")).contains("a"))

    // history pruning bounds the manifest listing; current always retained
    Compactor.pruneHistory(db, keep = 1)
    val remaining = Manifest.versions(db.warehouse)
    assert(remaining.size == 1 &&
      remaining.head == db.snapshot().manifest.version)
    assert(keys(db.read("%")) == Set("b"))
    assert(scala.util.Try(db.snapshotAt(v1)).isFailure,
      "pruned versions are no longer reachable")
  }
}
