package graft.ops

import graft.SparkSpec
import graft.store.Db
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDb(): Db =
    Db(spark, java.nio.file.Files.createTempDirectory("graft-incdedup").toString)

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("seen content drops across batches; new content passes") {
    val db = tmpDb()
    IncrementalDedup.registerBatch(db,
      docs(1L -> "alpha beta", 2L -> "gamma delta"), "doc_id", "text")
    val out = IncrementalDedup.dropSeenBefore(db,
        docs(10L -> "alpha beta",   // re-arriving content, new id -> drop
             11L -> "epsilon zeta", // fresh -> keep
             12L -> "gamma delta"), // re-arriving -> drop
        "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(11L -> "epsilon zeta"))
  }

  test("empty store passes everything; within-batch dups pass through") {
    val db = tmpDb()
    val batch = docs(1L -> "same text", 2L -> "same text", 3L -> "other")
    val out = IncrementalDedup.dropSeenBefore(db, batch, "doc_id", "text")
      .as[(Long, String)].collect().toSet
    assert(out.size == 3, "anti-join against an empty store keeps all rows")
  }

  test("register is idempotent: one row per content, min doc_id canonical") {
    val db = tmpDb()
    IncrementalDedup.registerBatch(db,
      docs(5L -> "dup", 3L -> "dup", 7L -> "uniq"), "doc_id", "text")
    IncrementalDedup.registerBatch(db,
      docs(9L -> "dup"), "doc_id", "text") // re-register known content
    val store = db.read("h/%").select(col("key"), col("doc_id"))
      .as[(String, Long)].collect().toMap
    assert(store.size == 2, s"one fingerprint per content: $store")
    // last-wins on (key, ts=0): the re-register's canonical id supersedes
    assert(store.values.toSet.contains(7L))
  }

  test("ingestBatch: drop + register + forward in one step") {
    val db = tmpDb()
    val first = IncrementalDedup.ingestBatch(db,
      docs(1L -> "aa", 2L -> "bb"), "doc_id", "text")
    assert(first.count() == 2)
    val second = IncrementalDedup.ingestBatch(db,
      docs(3L -> "bb", 4L -> "cc"), "doc_id", "text")
    assert(second.as[(Long, String)].collect().toMap == Map(4L -> "cc"))
    // third batch repeating everything ever seen -> empty, and the
    // empty-fresh path must not write a tx
    val txBefore = db.snapshot().manifest.dataTxids.size
    val third = IncrementalDedup.ingestBatch(db,
      docs(5L -> "aa", 6L -> "cc"), "doc_id", "text")
    assert(third.isEmpty)
    assert(db.snapshot().manifest.dataTxids.size == txBefore,
      "an all-seen batch must not commit an empty transaction")
  }

  test("compacting the fingerprint store preserves dedup behavior") {
    val db = tmpDb()
    IncrementalDedup.registerBatch(db, docs(1L -> "aa", 2L -> "bb"),
      "doc_id", "text")
    IncrementalDedup.registerBatch(db, docs(3L -> "cc"), "doc_id", "text")
    graft.store.Compactor.major(db)
    assert(db.snapshot().manifest.dataTxids.size == 1, "compacted to one tx")
    val out = IncrementalDedup.dropSeenBefore(db,
        docs(10L -> "bb", 11L -> "dd", 12L -> "cc"), "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(11L -> "dd"),
      "seen-set must survive compaction unchanged")
    // and the store stays appendable after compaction
    IncrementalDedup.registerBatch(db, docs(11L -> "dd"), "doc_id", "text")
    assert(db.read("h/%").count() == 4)
  }

  test("probe plan: store side is scanned and bloom-probed, batch anti-joins broadcast") {
    val db = tmpDb()
    IncrementalDedup.registerBatch(db,
      docs((0L until 50L).map(i => i -> s"doc $i"): _*), "doc_id", "text")
    val df = IncrementalDedup.dropSeenBefore(db,
      docs(100L -> "doc 7", 101L -> "fresh"), "doc_id", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"store scan must be bloom-probed:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"matched hashes must broadcast into the anti-join:\n${plan.take(1500)}")
  }
}
