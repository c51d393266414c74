package graft.store

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.text.{Cell, RowCodec, SeriesRecord}
import org.scalacheck.Gen

class RobustnessSpec extends SparkSpec {
  import spark.implicits._

  test("heterogeneous per-tx schemas survive compaction (mergeSchema)") {
    val db = Db(spark, tmpDir("graft-hetero"))
    TxWriter.write(db, Seq(("a", 1L, 10L)).toDF("key", "ts", "v"))
    TxWriter.write(db, Seq(("b", 2L, "hello")).toDF("key", "ts", "s"))
    TxWriter.write(db, Seq(("c", 3L, 3.5)).toDF("key", "ts", "f"))
    val before = db.read().orderBy("key")
      .select("key", "v", "s", "f").collect().map(_.toSeq).toSeq
    Compactor.major(db)
    val after = db.read().orderBy("key")
      .select("key", "v", "s", "f").collect().map(_.toSeq).toSeq
    assert(after == before)
    assert(Manifest.current(db.warehouse).dataTxids.size == 1)
  }

  test("orphan directory from a crashed writer is invisible and vacuumable") {
    val db = Db(spark, tmpDir("graft-orphan"))
    TxWriter.write(db, Seq(("a", 1L, 1L)).toDF("key", "ts", "v"))
    // simulate a crash between data write and manifest publish: claimed
    // txid, directory exists, never published
    Seq(("ghost", 9L, 9L)).toDF("key", "ts", "v")
      .write.parquet(s"${db.dataDir}/txid=999")
    assert(db.read().count() == 1) // invisible to readers
    Compactor.vacuum(db, graceMs = 0L)
    assert(!Files.exists(Paths.get(s"${db.dataDir}/txid=999")))
    assert(db.read().count() == 1)
  }

  test("a crashed writer's stranded TENTATIVE directory (tmp-tx-*) is " +
      "invisible and vacuumable; a live one survives the grace window") {
    val db = Db(spark, tmpDir("graft-tentative"))
    TxWriter.write(db, Seq(("a", 1L, 1L)).toDF("key", "ts", "v"))
    // simulate a crash MID-WRITE under the r17 rename-only protocol:
    // the parquet job died before its atomic rename, leaving a
    // uniquely named tentative dir that no manifest ever references
    Seq(("ghost", 9L, 9L)).toDF("key", "ts", "v")
      .write.parquet(s"${db.dataDir}/tmp-tx-dead-beef")
    assert(db.read().count() == 1, "tentative data invisible to readers")
    // within the grace window the dir is an in-flight writer's — kept
    Compactor.vacuum(db, graceMs = 60 * 60 * 1000L)
    assert(Files.exists(Paths.get(s"${db.dataDir}/tmp-tx-dead-beef")),
      "grace window must protect a possibly-live tentative write")
    // past it (grace 0 = known-quiescent) the stranding is swept
    Compactor.vacuum(db, graceMs = 0L)
    assert(!Files.exists(Paths.get(s"${db.dataDir}/tmp-tx-dead-beef")))
    assert(db.read().count() == 1)
  }

  test("a pending claim is NEVER cleared while any tentative directory " +
      "is inside the grace window — the slow-writer fence protection") {
    val db = Db(spark, tmpDir("graft-slowclaim"))
    TxWriter.write(db, Seq(("a", 1L, 1L)).toDF("key", "ts", "v"))
    // a slow claim-first writer: claim registered LONG ago (older than
    // any grace window), and under the rename-only protocol its only
    // on-disk trace is a recently-touched tmp-tx-* dir — no txid= dir
    // exists until the rename at publish time
    val oldMs = System.currentTimeMillis() - 3 * 60 * 60 * 1000L
    var claimTx = -1L
    Manifest.update(db.warehouse) { m =>
      claimTx = m.nextTxid
      m.copy(nextTxid = m.nextTxid + 1, pending = m.pending + (m.nextTxid -> oldMs))
    }
    Seq(("ghost", 9L, 9L)).toDF("key", "ts", "v")
      .write.parquet(s"${db.dataDir}/tmp-tx-live-slow-writer")
    Compactor.vacuum(db, graceMs = 30 * 60 * 1000L)
    assert(Manifest.current(db.warehouse).pending.contains(claimTx),
      "a live tentative write must hold the whole claim-clearing back")
    assert(Files.exists(Paths.get(s"${db.dataDir}/tmp-tx-live-slow-writer")),
      "the live tentative dir itself is grace-protected")
    // once the tentative write is gone (published or crashed+aged), the
    // genuinely dead claim clears at the next vacuum
    TxWriter.deleteRecursivelyIfExists(
      Paths.get(s"${db.dataDir}/tmp-tx-live-slow-writer"))
    Compactor.vacuum(db, graceMs = 30 * 60 * 1000L)
    assert(!Manifest.current(db.warehouse).pending.contains(claimTx),
      "a dead claim with no on-disk trace must clear past the grace window")
  }

  test("a claim that RECORDS its tentative dir clears as soon as that " +
      "dir is dead — another sink's live write no longer holds it hostage") {
    val db = Db(spark, tmpDir("graft-claimdir"))
    TxWriter.write(db, Seq(("a", 1L, 1L)).toDF("key", "ts", "v"))
    val oldMs = System.currentTimeMillis() - 3 * 60 * 60 * 1000L
    // crashed writer: old claim + its recorded tmp dir GONE (the crash
    // happened before the parquet job created it, or it was swept)
    var deadTx = -1L
    Manifest.update(db.warehouse) { m =>
      deadTx = m.nextTxid
      m.copy(nextTxid = m.nextTxid + 1,
        pending = m.pending + (m.nextTxid -> oldMs),
        claimDirs = m.claimDirs + (m.nextTxid -> "tmp-tx-crashed-gone"))
    }
    // an UNRELATED live writer's tentative dir is in the grace window
    Seq(("ghost", 9L, 9L)).toDF("key", "ts", "v")
      .write.parquet(s"${db.dataDir}/tmp-tx-live-other-sink")
    Compactor.vacuum(db, graceMs = 30 * 60 * 1000L)
    val after = Manifest.current(db.warehouse)
    assert(!after.pending.contains(deadTx),
      "a dir-recording claim whose OWN dir is dead must clear despite " +
        "another sink's live tentative write")
    assert(!after.claimDirs.contains(deadTx), "claimDirs entry cleared too")
    assert(Files.exists(Paths.get(s"${db.dataDir}/tmp-tx-live-other-sink")),
      "the live dir itself stays grace-protected")
    // …while a crashed claim whose recorded dir is STILL in-grace (the
    // write may be live) is kept
    var liveTx = -1L
    Manifest.update(db.warehouse) { m =>
      liveTx = m.nextTxid
      m.copy(nextTxid = m.nextTxid + 1,
        pending = m.pending + (m.nextTxid -> oldMs),
        claimDirs = m.claimDirs + (m.nextTxid -> "tmp-tx-live-other-sink"))
    }
    Compactor.vacuum(db, graceMs = 30 * 60 * 1000L)
    assert(Manifest.current(db.warehouse).pending.contains(liveTx),
      "a claim whose recorded dir is inside the grace window must survive")
  }

  test("backend registry is path-aware: /x/wh never captures /x/wh-archive") {
    val wh = tmpDir("graft-pathmatch")
    val sibling = wh + "-archive"
    java.nio.file.Files.createDirectories(Paths.get(sibling))
    Manifest.registerBackend(wh, new InMemoryManifestBackend)
    try {
      val db = Db(spark, wh)
      val sib = Db(spark, sibling)
      TxWriter.write(db, Seq(("m", 1L, 1L)).toDF("key", "ts", "v"))
      TxWriter.write(sib, Seq(("s", 1L, 2L)).toDF("key", "ts", "v"))
      // the sibling's manifest must be on DISK (local backend), not in
      // the registered in-memory store
      assert(Files.isDirectory(Paths.get(sibling, "_manifest")),
        "sibling warehouse must use the local backend")
      assert(!Files.isDirectory(Paths.get(wh, "_manifest")),
        "registered warehouse must use the in-memory backend")
      assert(sib.read().count() == 1 && db.read().count() == 1)
    } finally Manifest.unregisterBackend(wh)
  }

  test("publish refuses LOUDLY when its pending claim vanished " +
      "(ClaimVanished) — never a silent commit past a dropped fence") {
    val db = Db(spark, tmpDir("graft-claimvanish"))
    TxWriter.write(db, Seq(("a", 1L, 1L)).toDF("key", "ts", "v"))
    val before = Manifest.current(db.warehouse)
    // simulate the hazard the vacuum protection exists for: something
    // (an erroneous vacuum, a restored manifest) cleared the writer's
    // claim between its rename and its publishing commit
    TxWriter.publishPauseHook = () =>
      Manifest.update(db.warehouse)(m => m.copy(pending = Map.empty))
    try {
      intercept[TxWriter.ClaimVanished] {
        TxWriter.write(db, Seq(("b", 2L, 2L)).toDF("key", "ts", "v"))
      }
    } finally TxWriter.publishPauseHook = () => ()
    val after = Manifest.current(db.warehouse)
    assert(after.dataTxids == before.dataTxids,
      "the refused transaction must not be published")
    assert(db.read().count() == 1)
    // the stranded directory is invisible and vacuumable, and a later
    // healthy write proceeds normally
    Compactor.vacuum(db, graceMs = 0L)
    TxWriter.write(db, Seq(("c", 3L, 3L)).toDF("key", "ts", "v"))
    assert(db.read().count() == 2)
  }

  test("warehouse-filesystem contract (SURVEY §7.4.9): the control plane " +
      "relies on exactly three POSIX-rename primitives — stated and pinned") {
    // The manifest CAS, the fused protocol's directory forwarding and
    // history pruning all assume a rename-atomic filesystem (local /
    // NFS / HDFS-mount — the class the reference's own fsync+rename
    // commit requires). This case asserts the SPECIFIC primitives so
    // the dependency is a tested contract, not an implicit assumption;
    // an object-store warehouse root would need a manifest backend
    // port, by design.
    val root = Paths.get(tmpDir("graft-fscontract"))
    // (a) atomic rename within a directory: the moved file is readable
    // under the new name with its full content, and gone from the old
    val f = root.resolve("v1.tmp")
    Files.write(f, "whole-manifest-version".getBytes("UTF-8"))
    Files.move(f, root.resolve("v1.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    assert(!Files.exists(f))
    assert(new String(Files.readAllBytes(root.resolve("v1.json")), "UTF-8")
      == "whole-manifest-version")
    // (b) rename-then-exists visibility for DIRECTORIES: the fused
    // protocol forwards its tentative txid dir with Files.move and
    // immediately relies on exists() at the new path
    val d = root.resolve("txid=5")
    Files.createDirectory(d)
    Files.write(d.resolve("part-0"), Array[Byte](1, 2, 3))
    Files.move(d, root.resolve("txid=7"))
    assert(Files.exists(root.resolve("txid=7")) && !Files.exists(d))
    assert(Files.exists(root.resolve("txid=7").resolve("part-0")))
    // (c) occupied targets fail LOUDLY: both the claim-first stepping
    // logic and the fused forwarding depend on move/create refusing an
    // existing path instead of merging into it
    Files.createDirectory(root.resolve("txid=9"))
    intercept[java.nio.file.FileAlreadyExistsException] {
      Files.createDirectory(root.resolve("txid=9"))
    }
    val d2 = root.resolve("txid=10")
    Files.createDirectory(d2)
    intercept[java.nio.file.FileAlreadyExistsException] {
      Files.move(d2, root.resolve("txid=9"))
    }
  }

  test("manifest CAS: losing writer retries and both commits land") {
    val wh = tmpDir("graft-cas")
    val m0 = Manifest.current(wh)
    val a = m0.copy(version = m0.version + 1, nextTxid = 1)
    val b = m0.copy(version = m0.version + 1, nextTxid = 2)
    assert(Manifest.commit(wh, m0, a))
    assert(!Manifest.commit(wh, m0, b)) // stale expected state loses
    val after = Manifest.update(wh)(m => m.copy(nextTxid = m.nextTxid + 1))
    assert(after.nextTxid == 2 && after.version == a.version + 1)
  }

  test("latest pointer is a hint: stale, corrupt, missing or ahead never change currentVersion") {
    val db = Db(spark, tmpDir("graft-hint"))
    TxWriter.write(db, Seq(("a", 1L, 10L)).toDF("key", "ts", "v"))
    TxWriter.write(db, Seq(("b", 2L, 20L)).toDF("key", "ts", "v"))
    val wh = db.warehouse
    val truth = Manifest.versions(wh).max // the listing is authoritative
    assert(Manifest.currentVersion(wh) == truth)
    val hint = Paths.get(wh, "_manifest", "latest")
    assert(Files.exists(hint), "commits must maintain the pointer")
    assert(Files.readString(hint).trim.toLong == truth)
    // stale-LOW hint (a lagging racer): forward-walk recovers the head
    Files.writeString(hint, "1")
    assert(Manifest.currentVersion(wh) == truth, "stale hint must be walked")
    assert(Manifest.current(wh).version == truth)
    // corrupt hint: fall back to the listing
    Files.writeString(hint, "not-a-number")
    assert(Manifest.currentVersion(wh) == truth)
    // ahead-of-disk hint (no such version file): fall back to the listing
    Files.writeString(hint, (truth + 40).toString)
    assert(Manifest.currentVersion(wh) == truth)
    // missing hint (pre-pointer warehouse): fall back to the listing
    Files.deleteIfExists(hint)
    assert(Manifest.currentVersion(wh) == truth)
    // the next commit repairs the pointer
    TxWriter.write(db, Seq(("c", 3L, 30L)).toDF("key", "ts", "v"))
    val truth2 = Manifest.versions(wh).max
    assert(Files.readString(hint).trim.toLong == truth2)
    assert(Manifest.currentVersion(wh) == truth2)
  }

  test("manifest parse cache never serves a recreated warehouse's dead state") {
    val db = Db(spark, tmpDir("graft-parsecache"))
    val wh = db.warehouse
    TxWriter.write(db, Seq(("a", 1L, 10L)).toDF("key", "ts", "v"))
    val before = Manifest.current(wh)
    assert(before.created.nonEmpty)
    // same-version reads share one parse (the cache's reason to exist):
    // immutable file, so identity equality is safe to assert
    assert(Manifest.current(wh) eq Manifest.current(wh))
    // delete + recreate at the same path: version numbers RESTART, so a
    // bare (warehouse, version) cache key would serve the dead state —
    // the file-identity + mtime key must not
    import java.util.Comparator
    java.nio.file.Files.walk(java.nio.file.Paths.get(wh))
      .sorted(Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    val db2 = Db(spark, wh)
    TxWriter.write(db2, Seq(("b", 2L, 20L)).toDF("key", "ts", "v"))
    val after = Manifest.current(wh)
    assert(after.created.nonEmpty && after.created != before.created,
      "recreation must be visible through the parse cache")
    assert(db2.read("%").select("key").as[String].collect().toSeq == Seq("b"))
  }

  test("manifest CAS under a true race: every claimant gets a unique txid") {
    // POSIX rename silently REPLACES an existing target, so a rename-based
    // "CAS" lets racing committers all win and share txids (found by the
    // concurrent-PUT serve test); the link(2)-based commit must not.
    val wh = tmpDir("graft-cas-race")
    val threads = 16
    val claimed = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    (1 to threads).foreach { _ =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          var mine = -1L
          Manifest.update(wh) { m =>
            mine = m.nextTxid
            m.copy(nextTxid = m.nextTxid + 1)
          }
          claimed.add(mine)
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS))
    assert(claimed.size == threads,
      s"txid collision under race: ${claimed.size} unique of $threads")
    assert(Manifest.current(wh).nextTxid == threads.toLong)
  }

  test("the manifest control plane runs unchanged on a conditional-put " +
      "backend (no rename, no link): the object-store port seam") {
    // mount the in-memory backend for THIS warehouse only — data
    // directories stay on the filesystem, the manifest lives in a
    // key-value store whose sole commit primitive is if-none-match
    val wh = tmpDir("graft-membackend")
    Manifest.registerBackend(wh, new InMemoryManifestBackend)
    try {
      val db = Db(spark, wh)
      // the full writer stack: plain writes, a delete marker, last-wins,
      // compaction, vacuum, history pruning — zero posix manifest files
      TxWriter.write(db, Seq(("a", 1L, 10L), ("b", 2L, 20L))
        .toDF("key", "ts", "v"))
      TxWriter.write(db, Seq(("a", 1L, 11L)).toDF("key", "ts", "v"))
      TxWriter.delete(db, wildcard = "b%")
      assert(db.read().orderBy("key").select("key", "v")
        .as[(String, Long)].collect().toSeq == Seq(("a", 11L)))
      Compactor.major(db)
      Compactor.vacuum(db, graceMs = 0L)
      Compactor.pruneHistory(db, keep = 2)
      assert(Manifest.versions(wh).size == 2)
      assert(db.read().select("v").as[Long].head() == 11L)
      // no _manifest directory was ever created on disk
      assert(!Files.isDirectory(Paths.get(wh, "_manifest")),
        "the in-memory backend must own ALL manifest IO")
      // the CAS race law holds on conditional-put exactly as on link(2):
      // every claimant gets a unique txid
      val threads = 8
      val claimed = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      (1 to threads).foreach { _ =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            var mine = -1L
            Manifest.update(wh) { m =>
              mine = m.nextTxid
              m.copy(nextTxid = m.nextTxid + 1)
            }
            claimed.add(mine)
          }
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(claimed.size == threads,
        s"txid collision on the conditional-put backend: ${claimed.size}")
      // time travel reads retained versions through the backend
      val cur = Manifest.current(wh)
      assert(Manifest.at(wh, cur.version).dataTxids == cur.dataTxids)
    } finally Manifest.unregisterBackend(wh)
  }

  test("text protocol roundtrips arbitrary records (property)") {
    val tokenGen = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '\t', '\\', 'é'))).map(_.mkString)
    val cellGen: Gen[(Char, Cell)] = Gen.oneOf(
      Gen.chooseNum(Int.MinValue, Int.MaxValue).map(v => ('i', Cell(i32 = Some(v)))),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(v => ('I', Cell(i64 = Some(v)))),
      Gen.chooseNum(0L, 4294967295L).map(v => ('u', Cell(u32 = Some(v)))),
      Gen.chooseNum(Double.MinValue, Double.MaxValue).map(v => ('F', Cell(f64 = Some(v)))),
      tokenGen.map(s => ('s', Cell(str = Some(s)))),
      // non-final empty byte arrays are ambiguous in the text protocol
      // (empty base64 token) — same as the reference; generate non-empty
      Gen.nonEmptyListOf(Gen.chooseNum(-128, 127).map(_.toByte))
        .map(bs => ('B', Cell(bytes = Some(bs.toArray))))
    )
    val recGen = for {
      key <- tokenGen
      ts <- Gen.chooseNum(0L, Long.MaxValue / 2)
      cells <- Gen.nonEmptyListOf(cellGen).map(_.take(6))
    } yield SeriesRecord(key, ts, cells.map(_._1).mkString, cells.map(_._2))

    (1 to 300).flatMap(_ => recGen.sample).foreach { rec =>
      val line = RowCodec.printRecord(rec, tsAsNanos = true, showFmt = true)
      val back = RowCodec.parseLineWithFmt(line.replace('\t', ' '))
      assert(back.key == rec.key && back.ts == rec.ts && back.fmt == rec.fmt,
        s"header roundtrip failed for: $line")
      back.vals.zip(rec.vals).zipWithIndex.foreach { case ((b, a), i) =>
        rec.fmt(i) match {
          case 'B' => assert(b.bytes.get.sameElements(a.bytes.get), s"col $i of $line")
          case 'F' =>
            // %.17 text is lossy only beyond 17 significant decimals
            assert(b.f64.get == a.f64.get ||
              math.abs(b.f64.get - a.f64.get) <=
                math.ulp(a.f64.get) * 4, s"col $i of $line")
          case _ => assert(b == a, s"col $i of $line")
        }
      }
    }
  }

  test("strict-order write rejection matches reference semantics") {
    val db = Db(spark, tmpDir("graft-strict"))
    // distinct (key, ts) pairs pass strict mode even when unsorted input
    TxWriter.write(db,
      Seq(("z", 5L, 1L), ("a", 1L, 2L), ("z", 4L, 3L)).toDF("key", "ts", "v"),
      strict = true)
    assert(db.read().count() == 3)
  }
}
