package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The `spark.graft.reuse.mode` knob behind [[Graft.pin]] — the
  * preemption-tolerance lever for the ingest hot paths (quartet
  * pre-aggregate, incremental-dedup probe, fold bases): `local`
  * (default, fastest, executor loss fails the batch), `cache` (lineage
  * kept — lost blocks recompute instead of failing: the spot-cluster
  * mode), `reliable` (checkpoint-dir backed).
  */
class ReuseModeSpec extends SparkSpec {
  import spark.implicits._

  private def withMode[A](mode: String)(f: => A): A = {
    spark.conf.set("spark.graft.reuse.mode", mode)
    try f finally spark.conf.unset("spark.graft.reuse.mode")
  }

  test("cache mode survives total storage loss: killing the pinned " +
      "blocks recomputes from lineage instead of failing") {
    withMode("cache") {
      val src = spark.range(0, 1000).toDF("id")
        .withColumn("v", col("id") * 3)
      val pinned = Graft.pin(src)
      assert(pinned.storageLevel.useMemory || pinned.storageLevel.useDisk,
        "cache mode must persist")
      assert(pinned.agg(sum("v")).as[Long].head() == 3L * 999 * 1000 / 2)
      // simulate losing every executor holding the blocks (the spot
      // preemption): drop ALL cached storage for the frame…
      pinned.unpersist(blocking = true)
      // …and the reuse path must recompute, not fail — same answer
      assert(pinned.agg(sum("v")).as[Long].head() == 3L * 999 * 1000 / 2,
        "lineage must recompute lost partitions")
      assert(pinned.count() == 1000)
    }
  }

  test("cache mode is bounded: a stream of pins unpersists the oldest " +
      "past MaxLivePins, so CacheManager entries cannot grow per-batch") {
    withMode("cache") {
      val pins = (0 until Graft.MaxLivePins + 3).map { i =>
        Graft.pin(spark.range(i * 100, i * 100 + 50).toDF("id"))
      }
      val live = pins.count(p =>
        p.storageLevel.useMemory || p.storageLevel.useDisk)
      assert(live <= Graft.MaxLivePins,
        s"$live pins still persisted (cap ${Graft.MaxLivePins})")
      assert(!(pins.head.storageLevel.useMemory ||
        pins.head.storageLevel.useDisk), "oldest pin must be unpersisted")
      // an evicted pin still answers (lineage kept): recompute, not fail
      assert(pins.head.count() == 50)
    }
  }

  test("pinScope releases its pins at scope end and protects in-flight " +
      "frames: two interleaved sinks, 34+ pins, zero early unpersists") {
    withMode("cache") {
      def cached(df: org.apache.spark.sql.DataFrame): Boolean =
        df.storageLevel.useMemory || df.storageLevel.useDisk
      // sink A opens its micro-batch scope and pins its two frames…
      var inFlightOk = true
      var aPins: Seq[org.apache.spark.sql.DataFrame] = Nil
      Graft.pinScope {
        aPins = Seq(
          Graft.pin(spark.range(0, 60).toDF("id")),
          Graft.pin(spark.range(60, 120).toDF("id")))
        // …while sink B (another thread, its own scopes) runs 17 batches
        // of 2 pins each — 34 pins, more than MaxLivePins. Under the
        // pre-scope FIFO this evicted A's in-flight pins; with scoped
        // release B's population never accumulates.
        @volatile var bErr: Throwable = null
        val b = new Thread(() =>
          try (0 until 17).foreach { i =>
            Graft.pinScope {
              val p1 = Graft.pin(spark.range(i * 10, i * 10 + 5).toDF("id"))
              val p2 = Graft.pin(spark.range(i * 10 + 5, i * 10 + 9).toDF("id"))
              assert(p1.count() == 5 && p2.count() == 4)
            }
          } catch { case t: Throwable => bErr = t })
        b.start(); b.join()
        assert(bErr == null, s"sink B failed: $bErr")
        inFlightOk = aPins.forall(cached)
        assert(aPins.map(_.count()).sum == 120)
      }
      assert(inFlightOk,
        "sink A's in-flight pins were evicted while its scope was open")
      // A's scope closed → its pins are released, not leaked to the FIFO
      assert(aPins.forall(p => !cached(p)),
        "scope end must release the scope's pins")
      // released ≠ broken: lineage kept, a late consumer recomputes
      assert(aPins.head.count() == 60)
    }
  }

  test("release is identity-scoped: a no-op on frames pin never cached " +
      "(local mode) and idempotent on already-released ones") {
    val local = Graft.pin(spark.range(0, 40).toDF("id"))
    Graft.release(local) // local-checkpointed: must NOT unpersist
    assert(local.count() == 40)
    withMode("cache") {
      val p = Graft.pin(spark.range(0, 30).toDF("id"))
      Graft.release(p)
      Graft.release(p) // second release: no-op, no throw
      assert(p.count() == 30)
    }
  }

  test("local (default) and cache modes agree end-to-end: the quartet " +
      "sink's reports are identical under either reuse mode") {
    import graft.ops.SketchStore
    import graft.store.Db
    val toks = (1 to 400).map(i => s"w${i % 37}").toDF("t")
    def run(): (Map[String, Long], Long) = {
      val db = Db(spark,
        java.nio.file.Files.createTempDirectory("graft-reuse").toString)
      SketchStore.registerSketches(db, toks, col("t"), batchId = 0L)
      val hh = SketchStore.storedHeavyHitters(db)
        .select("item", "est").as[(String, Long)].collect().toMap
      val cm = SketchStore.probeStoredCountMin(db,
        Seq("w1", "w2").toDF("item"), "item")
        .agg(sum("est_cm")).as[Long].head()
      (hh, cm)
    }
    val base = run()
    val cached = withMode("cache")(run())
    assert(cached == base, s"cache-mode run drifted: $cached vs $base")
  }

  test("reliable mode checkpoints into the context's checkpoint dir; " +
      "an unset mode string refuses loudly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-reliable-cp").toString
    spark.sparkContext.setCheckpointDir(dir)
    withMode("reliable") {
      val pinned = Graft.pin(spark.range(0, 100).toDF("id"))
      assert(pinned.count() == 100)
      assert(java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .count() > 0, "reliable mode must write the checkpoint dir")
    }
    withMode("bogus") {
      intercept[IllegalArgumentException] {
        Graft.pin(spark.range(0, 10).toDF("id"))
      }
    }
  }
}
