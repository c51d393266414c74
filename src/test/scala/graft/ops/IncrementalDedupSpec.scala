package graft.ops

import graft.SparkSpec
import graft.store.Db
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDb(): Db =
    Db(spark, java.nio.file.Files.createTempDirectory("graft-incdedup").toString)

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("pre-claim emptiness probe is memoized per manifest version: " +
      "repeated probes on an unclaimed store run ONE job total") {
    val db = tmpDb()
    IncrementalDedup.registerNearBatch(db,
      docs(1L -> "the quick brown fox jumps over the lazy dog"),
      "doc_id", "text")
    // make the store PRE-CLAIM (rows, no property): the stamp
    // transition window where every probe used to pay a full-family
    // filter scan per call
    graft.store.Manifest.update(db.warehouse)(m =>
      m.copy(props = m.props - "neardup.n"))
    val batch = docs(9L -> "completely unrelated words here")
    val r0 = SketchStore.EmptinessMemo.probeRuns
    intercept[IllegalStateException] {
      IncrementalDedup.dropNearSeenBefore(db, batch, "doc_id", "text")
    }
    val afterFirst = SketchStore.EmptinessMemo.probeRuns
    assert(afterFirst - r0 == 1, "the first unclaimed probe executes")
    (1 to 3).foreach { _ =>
      intercept[IllegalStateException] {
        IncrementalDedup.dropNearSeenBefore(db, batch, "doc_id", "text")
      }
    }
    assert(SketchStore.EmptinessMemo.probeRuns == afterFirst,
      "repeated probes on one manifest version are memo hits — zero jobs")
    // a commit mints a new version: the memo must NOT carry the old
    // answer forward (contents may have changed)
    graft.store.Manifest.update(db.warehouse)(m => m)
    intercept[IllegalStateException] {
      IncrementalDedup.dropNearSeenBefore(db, batch, "doc_id", "text")
    }
    assert(SketchStore.EmptinessMemo.probeRuns == afterFirst + 1,
      "a new manifest version re-probes exactly once")
    // stamping claims the store — the guard short-circuits on the
    // manifest and never consults the memo again
    IncrementalDedup.stampNearShingleSize(db, 3)
    val claimed = SketchStore.EmptinessMemo.probeRuns
    assert(IncrementalDedup.dropNearSeenBefore(db, batch, "doc_id", "text")
      .count() == 1)
    assert(SketchStore.EmptinessMemo.probeRuns == claimed,
      "claimed steady state pays no emptiness probe at all")
  }

  test("near store: ingest adapts to the claimed shingle size; a " +
      "PRE-CLAIM store refuses probe and register until stamped") {
    val db = tmpDb()
    IncrementalDedup.registerNearBatch(db,
      docs(1L -> "the quick brown fox jumps over the lazy dog"),
      "doc_id", "text", n = 4)
    // ingest on an n=4-claimed store must probe AND register at 4 — a
    // hard-coded default would refuse the registration on every batch,
    // forwarding the rows downstream while the cursor never advances
    val out = IncrementalDedup.ingestNearBatch(db,
      docs(2L -> "completely different content about database engines"),
      "doc_id", "text")
    assert(out.count() == 1, "fresh content must register, not wedge")
    // the re-arrival drops — proof the ingest registered at the
    // CLAIMED n (signatures built at a different n would never match)
    val out2 = IncrementalDedup.ingestNearBatch(db,
      docs(3L -> "completely different content about database engines"),
      "doc_id", "text")
    assert(out2.isEmpty, "re-arrival must drop against the n=4 store")
    // a PRE-CLAIM store (rows, no property): probe and register refuse
    // loudly instead of guessing a shingle size that matches nothing
    graft.store.Manifest.update(db.warehouse)(m =>
      m.copy(props = m.props - "neardup.n"))
    intercept[IllegalStateException] {
      IncrementalDedup.dropNearSeenBefore(db, docs(9L -> "x y z"),
        "doc_id", "text")
    }
    intercept[IllegalStateException] {
      IncrementalDedup.registerNearBatch(db, docs(9L -> "x y z"),
        "doc_id", "text", n = 4)
    }
    // stamping the true size restores everything; a disagreeing stamp
    // refuses (first-writer-wins like the claims)
    IncrementalDedup.stampNearShingleSize(db, 4)
    assert(IncrementalDedup.dropNearSeenBefore(db,
      docs(10L -> "completely different content about database engines"),
      "doc_id", "text").isEmpty)
    intercept[graft.store.TxWriter.PropertyConflict] {
      IncrementalDedup.stampNearShingleSize(db, 3)
    }
  }

  test("first near registration in a warehouse already holding an MG " +
      "sketch store (shared m/ key prefix) is not spuriously refused") {
    val db = tmpDb()
    graft.ops.SketchStore.registerMg(db,
      Seq("x", "y", "x").toDF("t"), col("t"), batchId = 0L)
    // the NEAR store is empty; only the MG rows share the "m/" prefix —
    // the pre-claim guard must test actual near rows (non-null bh),
    // not the raw key pattern, or coexistence (a documented layout)
    // breaks on the first near write
    IncrementalDedup.registerNearBatch(db,
      docs(1L -> "the quick brown fox jumps over the lazy dog"),
      "doc_id", "text")
    val out = IncrementalDedup.dropNearSeenBefore(db,
      docs(2L -> "the quick brown fox jumps over the lazy dog"),
      "doc_id", "text")
    assert(out.isEmpty, "exact re-arrival must drop in the mixed warehouse")
    // and the MG report is untouched by the near rows
    assert(graft.ops.SketchStore.storedHeavyHitters(db).count() == 2)
  }

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

  // ── near-dup (MinHash-LSH) store ───────────────────────────────────

  test("near store: exact and near re-arrivals drop, unrelated content passes") {
    val db = tmpDb()
    IncrementalDedup.registerNearBatch(db,
      docs(1L -> "the quick brown fox jumps over the lazy dog today",
           2L -> "completely different content about database engines"),
      "doc_id", "text")
    val out = IncrementalDedup.dropNearSeenBefore(db,
        docs(
          // exact re-arrival: identical signature, agreement = k -> drop
          10L -> "the quick brown fox jumps over the lazy dog today",
          // near-copy: one word changed -> most shingles shared -> drop
          11L -> "the quick brown fox jumps over the lazy dog tonight",
          // unrelated -> keep
          12L -> "unrelated fresh text with nothing shared at all here"),
        "doc_id", "text", minAgree = 4)
      .as[(Long, String)].collect().toMap
    assert(!out.contains(10L), "exact re-arrival must drop")
    assert(!out.contains(11L), s"near-copy must drop: $out")
    assert(out.contains(12L), "unrelated content must pass")
  }

  test("near store: empty store passes everything; minAgree gates the drop") {
    val db = tmpDb()
    val batch = docs(1L -> "some document text here")
    assert(IncrementalDedup.dropNearSeenBefore(db, batch, "doc_id", "text")
      .count() == 1, "empty store is a passthrough")
    IncrementalDedup.registerNearBatch(db,
      docs(1L -> "alpha beta gamma delta epsilon zeta"), "doc_id", "text")
    // a doc sharing SOME shingles: candidate via a band, but below a
    // strict agreement floor it must survive (bucket collision != dup)
    val partial = docs(20L -> "alpha beta gamma totally different ending")
    val strict = IncrementalDedup.dropNearSeenBefore(db, partial,
      "doc_id", "text", minAgree = Dedup.MINHASH_K)
    val loose = IncrementalDedup.dropNearSeenBefore(db, partial,
      "doc_id", "text", minAgree = 1)
    assert(strict.count() >= loose.count(),
      "raising minAgree can only keep more documents")
  }

  test("near store: survives major compaction; ingestNearBatch registers only fresh") {
    val db = tmpDb()
    val first = IncrementalDedup.ingestNearBatch(db,
      docs(1L -> "one two three four five six seven eight nine ten"),
      "doc_id", "text")
    assert(first.count() == 1)
    graft.store.Compactor.major(db)
    val second = IncrementalDedup.ingestNearBatch(db,
      docs(2L -> "one two three four five six seven eight nine ten",
           3L -> "an entirely new document with its own words in it"),
      "doc_id", "text")
    assert(second.as[(Long, String)].collect().map(_._1).toSet == Set(3L),
      "near-seen content must stay dropped after compaction")
    // only the fresh doc's bands registered (BANDS rows per doc)
    val bands = graft.ops.Dedup.MINHASH_K / graft.ops.Dedup.LSH_R
    assert(db.read("m/%").count() == 2L * bands)
  }

  test("near probe equals the direct cross-batch definition on randomized corpora") {
    // the store is an optimization, not a semantic: for any registered
    // set A and probe batch B, dropNearSeenBefore(register(A), B) must
    // equal B minus {b : exists a in A sharing a band with >= minAgree
    // signature agreement} computed directly on the DataFrames
    val rnd = new scala.util.Random(20260814L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    def doc(): String =
      Seq.fill(6 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    for (trial <- 1 to 3) {
      val a = (0L until 12L).map(i => i -> doc())
      // probe batch: a mix of exact copies, mutations, fresh docs
      val b = (100L until 112L).map { i =>
        val r = rnd.nextInt(3)
        i -> (if (r == 0) a(rnd.nextInt(a.size))._2
              else if (r == 1) a(rnd.nextInt(a.size))._2 + " " + doc()
              else doc())
      }
      val db = tmpDb()
      IncrementalDedup.registerNearBatch(db, docs(a: _*), "doc_id", "text")
      val got = IncrementalDedup.dropNearSeenBefore(db, docs(b: _*),
          "doc_id", "text", minAgree = 4)
        .select("doc_id").as[Long].collect().toSet
      // direct definition via the SAME public band/signature primitives
      def sigs(rows: Seq[(Long, String)]) = docs(rows: _*)
        .select(col("doc_id"),
          Dedup.minhashSignature(
            Dedup.shingleHashes(col("text"), 3)).as("sig"),
          posexplode(Dedup.bandKeys(
            Dedup.minhashSignature(Dedup.shingleHashes(col("text"), 3)))))
        .select(col("doc_id"), col("sig"), col("pos").as("band"),
          col("col").as("bk"))
      val agree = aggregate(
        zip_with(col("sig"), col("seen_sig"),
          (x, y) => (x === y).cast("long")),
        lit(0L), (acc, v) => acc + v)
      val dropIds = sigs(b).join(
          sigs(a).select(col("band"), col("bk"),
            col("sig").as("seen_sig")),
          Seq("band", "bk"))
        .filter(agree >= 4)
        .select("doc_id").as[Long].collect().toSet
      val want = b.map(_._1).toSet -- dropIds
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }

  test("near probe plan: store scanned + bloom-probed, never shuffled") {
    val db = tmpDb()
    IncrementalDedup.registerNearBatch(db,
      docs((0L until 40L).map(i =>
        i -> s"document number $i with some shared words"): _*),
      "doc_id", "text")
    val df = IncrementalDedup.dropNearSeenBefore(db,
      docs(100L -> "document number 7 with some shared words"),
      "doc_id", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"band scan must be bloom-probed:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"matched bands must broadcast:\n${plan.take(1500)}")
  }
}
