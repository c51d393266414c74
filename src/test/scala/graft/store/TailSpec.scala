package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental consumption: `tail(cursor)` must deliver exactly the
  * commits after the cursor — the warehouse-native change feed.
  */
class TailSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("key", "ts", "v").as[(String, Long, Long)].collect().toSet

  test("empty warehouse: read/get/tail return zero rows, not errors") {
    // documented bootstrap: cursor = maxTxid (-1) then tail(cursor)
    // before any commit — must yield an empty feed, not throw
    val db = Db(spark, tmpDir("graft-empty"))
    val s = db.snapshot()
    assert(s.maxTxid == -1L)
    assert(s.tail(s.maxTxid).count() == 0)
    assert(db.read("%").count() == 0)
    assert(db.read("nothing%").count() == 0)
    assert(db.get("nokey").count() == 0)
  }

  test("tail sees only new commits; cursor advances; deletes apply") {
    val db = Db(spark, tmpDir("graft-tail"))
    TxWriter.write(db, Seq(("a", 1L, 10L), ("b", 1L, 20L)).toDF("key", "ts", "v"))
    val s0 = db.snapshot()
    assert(rows(s0.tail(-1L)) == Set(("a", 1L, 10L), ("b", 1L, 20L)),
      "tail(-1) is the full history")
    val c0 = s0.maxTxid

    // nothing new yet
    assert(db.tail(c0).count() == 0)

    // tx1 upserts a and adds c; tail(c0) must NOT include b
    TxWriter.write(db, Seq(("a", 1L, 11L), ("c", 1L, 30L)).toDF("key", "ts", "v"))
    assert(rows(db.tail(c0)) == Set(("a", 1L, 11L), ("c", 1L, 30L)))

    // two new txids in one batch: last-wins applies among them
    TxWriter.write(db, Seq(("d", 1L, 40L)).toDF("key", "ts", "v"))
    TxWriter.write(db, Seq(("d", 1L, 41L)).toDF("key", "ts", "v"))
    val c1 = db.snapshot().maxTxid
    TxWriter.write(db, Seq(("e", 1L, 50L)).toDF("key", "ts", "v"))
    TxWriter.delete(db, wildcard = "e%")
    val s2 = db.snapshot()
    assert(rows(s2.tail(c1)).isEmpty,
      "a delete committed after the record suppresses it in the feed")
    assert(rows(s2.tail(c0)) == Set(("a", 1L, 11L), ("c", 1L, 30L), ("d", 1L, 41L)))

    // cursor chain covers everything exactly once per batch
    assert(s2.maxTxid > c1)
    // full snapshot read agrees with replaying tail batches over lastWins
    assert(rows(db.read("%")) ==
      Set(("a", 1L, 11L), ("b", 1L, 20L), ("c", 1L, 30L), ("d", 1L, 41L)))
  }

  test("tail respects pattern and time filters") {
    val db = Db(spark, tmpDir("graft-tail2"))
    val c = db.snapshot().maxTxid
    TxWriter.write(db, Seq(("x/1", 5L, 1L), ("x/2", 50L, 2L), ("y/1", 5L, 3L))
      .toDF("key", "ts", "v"))
    val s = db.snapshot()
    assert(rows(s.tail(c, "x%")) == Set(("x/1", 5L, 1L), ("x/2", 50L, 2L)))
    assert(rows(s.tail(c, "x%", after = Some(10L))) == Set(("x/2", 50L, 2L)))
  }
}
