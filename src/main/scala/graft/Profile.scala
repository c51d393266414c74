package graft

import org.apache.spark.sql.functions._
import graft.core.Graft
import graft.ops.Dedup

/** Dev-only serve-layer latency probe: the repeated point-lookup path the
  * reference answers in ~15 ms from its 10s-cached reader
  * (`sonnerie-serve.rs:242-264`). Measures GET latency cold (snapshot
  * build + first plan) vs warm (TTL-cached snapshot, version-probe only)
  * on a warm JVM. Numbers land in SCALE.md. Not part of the driver
  * contract.
  */
object ServeLatency {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession(cores = 32)
    spark.sparkContext.setLogLevel("WARN")
    import graft.store.{Db, TxWriter}
    import graft.serve.Serve
    val wh = java.nio.file.Files.createTempDirectory("graft-servelat").toString
    val db = Db(spark, wh)
    import spark.implicits._
    // same row shape the PUT path commits: text-protocol lines → SeriesRecord
    val lines = (1 to 100000).map(i => f"k$i%07d $i%d u $i%d")
    TxWriter.write(db,
      graft.text.TextIngest.parseWithFmt(spark, spark.createDataset(lines)).toDF())
    var srv = new Serve(db).start()
    def get(path: String): Unit = {
      val c = new java.net.URL(s"http://localhost:${srv.boundPort}$path")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      scala.io.Source.fromInputStream(c.getInputStream, "UTF-8").mkString
      c.disconnect()
    }
    def ms(label: String, n: Int)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"SERVE $label%-40s ${(System.nanoTime() - t0) / 1e6 / n}%9.2f ms/op")
    }
    // SPARK_GRAFT_SERVE_ONLY selects one battery: "query" = the /_query
    // verbs, "mixed" = the mixed-load regime; unset runs everything.
    // Unknown values fail loudly — a typo must not silently produce an
    // empty report that reads as a harness failure.
    val only = sys.env.get("SPARK_GRAFT_SERVE_ONLY")
    only.foreach(v => require(Set("query", "mixed")(v),
      s"SPARK_GRAFT_SERVE_ONLY=$v (want query|mixed|unset)"))
    get("/k0000001") // JVM/codegen warmup for the read path itself
    srv.stop()
    srv = new Serve(db).start() // fresh cache, warm JVM
    if (only.isEmpty) {
    ms("GET exact key, cold snapshot", 1)(get("/k0000042"))
    ms("GET exact key, cached snapshot", 50)(get("/k0000042"))
    ms("GET exact key, varying keys (cached)", 50) {
      get(f"/k${(math.random() * 99999).toInt + 1}%07d")
    }
    println(s"SERVE snapshot loads: ${srv.snapshotLoads}")
    // concurrent amortization: N client threads × sequential varying-key
    // GETs against the CORE-SIZED worker pool (one worker per core, the
    // reference's serving-tier shape) — the claim under test is that the
    // Spark job-launch floor amortizes across concurrent requests (many
    // point-lookup jobs in flight share the scheduler), so per-request
    // p50 should stay flat toward the core count and amortized
    // ms/lookup should keep falling with concurrency
    for (clients <- Seq(1, 2, 4, 8, 16, 32)) {
      val perClient = 25
      val lat = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val rnd = new java.util.concurrent.atomic.AtomicLong(12345)
      val t0 = System.nanoTime()
      val threads = (1 to clients).map { _ =>
        val th = new Thread(() =>
          (1 to perClient).foreach { _ =>
            val k = (rnd.incrementAndGet() * 2654435761L % 99999).abs + 1
            val r0 = System.nanoTime()
            get(f"/k$k%07d")
            lat.add(System.nanoTime() - r0)
          })
        th.start(); th
      }
      threads.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val sorted = lat.asScala.toArray.sorted
      def pct(p: Double) = sorted((p * (sorted.length - 1)).toInt) / 1e6
      println(f"SERVE concurrent c=$clients%2d n=${sorted.length}%4d " +
        f"p50=${pct(0.50)}%7.1f ms p99=${pct(0.99)}%7.1f ms " +
        f"qps=${sorted.length / wall}%6.1f " +
        f"amortized=${wall * 1000 / sorted.length}%6.1f ms/lookup")
    }
    // ── deep history: the per-GET freshness probe must stay O(1) as
    // commits accumulate (the `latest` pointer; before it, every cached
    // GET paid a full _manifest readdir — the latency floor at 10⁴
    // commits on a long-lived warehouse)
    ms("currentVersion @ shallow history", 2000)(
      graft.store.Manifest.currentVersion(wh))
    (1 to 10000).foreach(_ => graft.store.Manifest.update(wh)(m => m))
    ms("currentVersion @ 10k versions", 2000)(
      graft.store.Manifest.currentVersion(wh))
    ms("GET exact key, cached snapshot @ 10k versions", 50)(get("/k0000042"))
    }
    srv.stop()

    // ── index-serving latency: the /_query verbs under concurrency ────
    // one warehouse PER STORE (the ANN index's width-1 bucket-per-cell
    // layout is warehouse-sticky; a co-located dense-ts BM25 store would
    // mint one tbucket dir per document — measured pathological at 100k
    // docs); requests pay probe-only cost
    if (only.forall(_ == "query")) {
      import spark.implicits._
      import graft.ops.{Retrieval, Similarity}
      val idxDb = Db(spark,
        java.nio.file.Files.createTempDirectory("graft-servix").toString)
      val annIdxDb = Db(spark,
        java.nio.file.Files.createTempDirectory("graft-servix-ann").toString)
      val nDocs = 100000L
      val emb = spark.range(nDocs).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(64)), i =>
          (pmod(hash(col("id"), i), lit(2000)) - 1000)
            .cast("float") / 1000f).as("embedding"))
      Similarity.buildIndex(annIdxDb, emb, "vec_id", "embedding")
      val docs = spark.range(nDocs).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(14)),
          i => concat(lit("w"), pmod(hash(col("id"), i), lit(997)))))
          .as("text"))
      Retrieval.buildBm25Index(idxDb, docs, "doc_id", "text")
      val qvec = (1 to 64).map(i => ((i * 37 % 2000) - 1000) / 1000.0)
        .mkString(",")
      val srv2 = new Serve(idxDb, annDb = Some(annIdxDb)).start()
      def qget(path: String): Unit = {
        val c = new java.net.URL(s"http://localhost:${srv2.boundPort}$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        scala.io.Source.fromInputStream(c.getInputStream, "UTF-8").mkString
        c.disconnect()
      }
      val terms = Seq("w3 w17 w101", "w7 w500", "w42 w43 w44", "w900 w11")
      qget(s"/_query/bm25?q=w1%20w2") // warm plans
      qget(s"/_query/ann?vec=$qvec&k=10")
      qget(s"/_query/hybrid?q=w1%20w2&vec=$qvec&k=10")
      // two regimes: miss (a nonce per request defeats the version-keyed
      // result cache — the probe-compute path) and hit (a small hot query
      // set — after the first computations, requests serve from cache)
      for (verb <- Seq("bm25", "ann", "hybrid"); regime <- Seq("miss", "hit");
           clients <- Seq(1, 8, 32)) {
        val perClient = 10
        val lat = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
        val rnd = new java.util.concurrent.atomic.AtomicLong(777)
        val t0 = System.nanoTime()
        val threads = (1 to clients).map { _ =>
          val th = new Thread(() =>
            (1 to perClient).foreach { _ =>
              val i = rnd.incrementAndGet()
              val t = terms((i % terms.length).toInt).replace(" ", "%20")
              val bust = if (regime == "miss") s"&nonce=$i" else ""
              val path = verb match {
                case "bm25"   => s"/_query/bm25?q=$t&k=10$bust"
                case "ann"    => s"/_query/ann?vec=$qvec&k=10$bust"
                case "hybrid" => s"/_query/hybrid?q=$t&vec=$qvec&k=10$bust"
              }
              val r0 = System.nanoTime()
              qget(path)
              lat.add(System.nanoTime() - r0)
            })
          th.start(); th
        }
        threads.foreach(_.join())
        val wall = (System.nanoTime() - t0) / 1e9
        import scala.jdk.CollectionConverters._
        val sorted = lat.asScala.toArray.sorted
        def pct(p: Double) = sorted((p * (sorted.length - 1)).toInt) / 1e6
        println(f"SERVE query=$verb%-6s $regime%-4s c=$clients%2d " +
          f"n=${sorted.length}%4d " +
          f"p50=${pct(0.50)}%7.1f ms p99=${pct(0.99)}%7.1f ms " +
          f"qps=${sorted.length / wall}%6.1f " +
          f"amortized=${wall * 1000 / sorted.length}%6.1f ms/query")
      }
      srv2.stop()
    }

    // ── mixed load: concurrent PUT spools + point GETs + /_query ──────
    // everything above is single-mode; a real serving tier takes ingest
    // and reads on ONE server (and one Spark scheduler) — this battery
    // measures per-verb p50/p95 while PUT transactions commit under the
    // readers, plus how often the snapshot cache rebuilds (every commit
    // moves the generation). SPARK_GRAFT_SERVE_ONLY=mixed runs only this.
    if (only.forall(_ == "mixed")) {
      import spark.implicits._
      import graft.ops.{Retrieval, SketchStore}
      val mdb = Db(spark,
        java.nio.file.Files.createTempDirectory("graft-servmix").toString)
      val lines2 = (1 to 100000).map(i => f"k$i%07d $i%d u $i%d")
      TxWriter.write(mdb, graft.text.TextIngest.parseWithFmt(spark,
        spark.createDataset(lines2)).toDF())
      // BM25 postings + sketch stores co-locate with the data (all
      // unbucketed — distinct key prefixes); the ANN store would need
      // its own warehouse, measured above, so it sits this one out
      val docs = spark.range(50000L).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(14)),
          i => concat(lit("w"), pmod(hash(col("id"), i), lit(997)))))
          .as("text"))
      Retrieval.buildBm25Index(mdb, docs, "doc_id", "text")
      val toks = spark.range(200000L)
        .select(concat(lit("w"), pmod(hash(col("id")), lit(5000)))
          .as("t"))
      SketchStore.registerKmv(mdb, toks, col("t"))
      SketchStore.registerCountMin(mdb, toks, col("t"), batchId = 0L)
      SketchStore.registerMg(mdb, toks, col("t"), batchId = 0L)
      SketchStore.registerHist(mdb,
        spark.range(200000L).select((col("id") % 500).as("v")), col("v"),
        batchId = 0L)
      val putSeq = new java.util.concurrent.atomic.AtomicLong(0)
      // two regimes: fresh (never-stale, the default) vs a 2 s
      // staleness window (the reference's reader-cache contract) — the
      // knob exists precisely for this commit-heavy regime
      for ((regime, stale) <- Seq(("fresh", 0L), ("stale2s", 2000L))) {
      val srv3 = new Serve(mdb, staleMillis = stale).start()
      def mreq(method: String, path: String, body: String = null): Unit = {
        val c = new java.net.URL(s"http://localhost:${srv3.boundPort}$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        c.setRequestMethod(method)
        if (body != null) {
          c.setDoOutput(true); c.getOutputStream.write(body.getBytes("UTF-8"))
        }
        scala.io.Source.fromInputStream(c.getInputStream, "UTF-8").mkString
        c.disconnect()
      }
      // warm every verb's plan once
      mreq("GET", "/k0000042")
      mreq("GET", "/_query/bm25?q=w1%20w2&k=10")
      mreq("GET", "/_query/stats?heavy=10")
      mreq("PUT", "/", s"warm${putSeq.incrementAndGet()} 1 u 1\n")
      for (clients <- Seq(8, 16, 32)) {
        // 1 writer per 8 clients; readers split across the three verbs.
        // Readers nonce-bust half their requests so the battery covers
        // the cache-hit AND compute paths under write churn.
        val roles = (0 until clients).map(i =>
          if (i % 8 == 7) "put"
          else Seq("point", "bm25", "stats")(i % 3))
        val lat = new java.util.concurrent.ConcurrentHashMap[
          String, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
        roles.distinct.foreach(r =>
          lat.put(r, new java.util.concurrent.ConcurrentLinkedQueue[Long]()))
        val loads0 = srv3.snapshotLoads
        val rnd = new java.util.concurrent.atomic.AtomicLong(999)
        val t0 = System.nanoTime()
        val threads = roles.map { role =>
          val th = new Thread(() => {
            val ops = if (role == "put") 5 else 15
            (1 to ops).foreach { _ =>
              val i = rnd.incrementAndGet()
              val bust = if (i % 2 == 0) s"&nonce=$i" else ""
              val r0 = System.nanoTime()
              role match {
                case "put" =>
                  val base = putSeq.addAndGet(500)
                  mreq("PUT", "/", (1 to 500).map(j =>
                    s"put${base + j} ${base + j} u $j").mkString("\n"))
                case "point" =>
                  mreq("GET", f"/k${(i * 2654435761L % 99999).abs + 1}%07d")
                case "bm25" =>
                  mreq("GET", s"/_query/bm25?q=w${i % 997}%20w${(i * 7) % 997}&k=10$bust")
                case "stats" =>
                  mreq("GET", s"/_query/stats?heavy=10$bust")
              }
              lat.get(role).add(System.nanoTime() - r0)
            }
          })
          th.start(); th
        }
        threads.foreach(_.join())
        val wall = (System.nanoTime() - t0) / 1e9
        import scala.jdk.CollectionConverters._
        val total = lat.values().asScala.map(_.size()).sum
        println(f"SERVE mixed $regime%-7s c=$clients%2d wall=$wall%6.1f s " +
          f"ops=$total%4d snapshotLoads=${srv3.snapshotLoads - loads0}%3d " +
          f"version=${graft.store.Manifest.currentVersion(mdb.warehouse)}")
        lat.asScala.toSeq.sortBy(_._1).foreach { case (role, q) =>
          val sorted = q.asScala.toArray.sorted
          def pct(p: Double) = sorted((p * (sorted.length - 1)).toInt) / 1e6
          println(f"SERVE mixed $regime%-7s c=$clients%2d verb=$role%-5s " +
            f"n=${sorted.length}%3d p50=${pct(0.50)}%8.1f ms " +
            f"p95=${pct(0.95)}%8.1f ms")
        }
      }
      srv3.stop()
      }
    }
    spark.stop()
  }
}

/** Dev-only stage profiler: times sub-stages of the slowest bench queries
  * so optimization targets measurements, not guesses. Not part of the
  * driver contract.
  */
object Profile {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROFILE $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.localSession(cores = 32)
    spark.sparkContext.setLogLevel("WARN")

    val docs = Graft.documents(spark, sfDir)
    t("docs.count")(docs.count())
    println("PROFILE docs partitions: " + docs.rdd.getNumPartitions)

    // ngram jaccard stages
    val bucket = concat(col("lang"), lit("/"),
      (col("n_chars") / 50).cast("long").cast("string"))
    val ex = Graft.rebalance(docs)
      .select(col("doc_id").as("id"), bucket.as("bucket"),
        Dedup.shingleHashes(col("text"), 3).as("sh"))
      .select(col("id"), col("bucket"), size(col("sh")).as("sz"),
        explode(col("sh")).as("h"))
    t("jac: shingle+explode rebal")(ex.count())
    t("jac: shingle+explode rebal2")(ex.count())
    val exS = docs
      .select(col("doc_id").as("id"), bucket.as("bucket"),
        Dedup.shingleHashes(col("text"), 3).as("sh"))
      .select(col("id"), col("bucket"), size(col("sh")).as("sz"),
        explode(col("sh")).as("h"))
    t("jac: shingle+explode serial")(exS.count())
    val exR = ex.repartition(col("bucket"), col("h"))
    val l = exR.alias("l"); val r = exR.alias("r")
    val joined = l.join(r,
      col("l.bucket") === col("r.bucket") && col("l.h") === col("r.h") &&
        col("l.id") < col("r.id"))
    t("jac: self-join")(joined.count())
    val grouped = joined
      .groupBy(col("l.id").as("id1"), col("r.id").as("id2"),
        col("l.sz").as("sz1"), col("r.sz").as("sz2"))
      .agg(count(lit(1)).as("inter"))
    t("jac: +group")(grouped.count())
    val full = graft.PipelineQueries.queries("dedup_ngram_jaccard")(spark, sfDir)
    t("jac: full plan-only")(full.queryExecution.executedPlan)
    t("jac: full query")(full.count())
    t("jac: full again")(full.count())
    // how much is job fixed-cost? a trivial count on the same table
    t("trivial docs.count again")(Graft.documents(spark, sfDir).count())

    // minhash stages
    val withSig = docs
      .select(col("doc_id").as("id"), Dedup.shingleHashes(col("text"), 3).as("sh"))
      .select(col("id"), Dedup.minhashSignature(col("sh")).as("sig"))
    t("mh: signatures")(withSig.count())
    val fullMh = graft.PipelineQueries.queries("dedup_minhash_lsh")(spark, sfDir)
    t("mh: full query")(fullMh.count())

    val fullSh = graft.PipelineQueries.queries("dedup_simhash")(spark, sfDir)
    t("sh: full query")(fullSh.count())

    // wh_roundtrip piecewise
    {
      import graft.store.{Db, TxWriter}
      val wh = java.nio.file.Files.createTempDirectory("graft-whp").toString
      val db = Db(spark, wh)
      val series = SparkEntry.series(spark, sfDir)
        .select(col("key"), col("ts"), col("value"), col("event_id"))
      t("wh: write even")(TxWriter.write(db, series.filter(col("event_id") % 2 === 0)))
      t("wh: write odd")(TxWriter.write(db, series.filter(col("event_id") % 2 === 1)))
      t("wh: delete")(TxWriter.delete(db, wildcard = "error%"))
      t("wh: read back")(db.read("%", after = Some(0L))
        .select("key", "ts", "value").orderBy("key", "ts").count())
    }
    val fullWh = graft.AnalyticsQueries.queries("wh_roundtrip")(spark, sfDir)
    t("wh: full query")(fullWh.count())

    spark.stop()
  }
}
