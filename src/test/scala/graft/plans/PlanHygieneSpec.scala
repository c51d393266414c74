package graft.plans

import graft.{SparkSpec, SparkEntry}

/** Fleet-wide plan hygiene: no query in the driver surface may plan a
  * CartesianProduct — at 100 TB an accidental cross product is a cluster
  * outage, not a slowdown. (BroadcastNestedLoopJoin with a tiny build side
  * is the intended shape for theta joins and is allowed.)
  */
class PlanHygieneSpec extends SparkSpec {

  test("no CartesianProduct in any driver query plan") {
    val sfDir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("grouped hist quantiles plan no single-partition stage — one-shot " +
      "AND stored forms") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the grouped form's whole point vs histQuantiles: windows are
    // PARTITIONED by the group, so a million groups spread across the
    // cluster instead of funneling into one task — pin that neither the
    // one-shot nor the warehouse-backed plan contains a SinglePartition
    // exchange (the ungrouped form's documented, sketch-sized exception)
    val df = (1 to 500).map(i => (s"s${i % 7}", (i % 90).toLong)).toDF("g", "v")
    val oneShot = graft.ops.Sketches.histQuantilesBy(df, col("g"), col("v"))
      .queryExecution.executedPlan.toString
    assert(!oneShot.contains("SinglePartition"),
      s"one-shot grouped plan funnels into one task:\n$oneShot")
    val db = graft.store.Db(spark,
      java.nio.file.Files.createTempDirectory("graft-planhist").toString)
    graft.ops.SketchStore.registerHistBy(db, df, col("g"), col("v"),
      batchId = 0L)
    val stored = graft.ops.SketchStore.storedHistQuantilesBy(db)
      .queryExecution.executedPlan.toString
    assert(!stored.contains("SinglePartition"),
      s"stored grouped plan funnels into one task:\n$stored")
    // the grouped KMV store's read has the same contract: the per-group
    // top-k window is PARTITIONED by group
    graft.ops.SketchStore.registerKmvBy(db, df, col("g"),
      col("v").cast("string"))
    val kmv = graft.ops.SketchStore.storedKmvEstimateBy(db)
      .queryExecution.executedPlan.toString
    assert(!kmv.contains("SinglePartition"),
      s"grouped KMV read funnels into one task:\n$kmv")
    // grouped MG: every rank/threshold window and the mass join are
    // partitioned by group — the report's total orderBy is the one
    // permitted range exchange, never a SinglePartition funnel
    graft.ops.SketchStore.registerMgBy(db, df, col("g"),
      col("v").cast("string"), batchId = 0L)
    val mg = graft.ops.SketchStore.storedHeavyHittersBy(db)
      .queryExecution.executedPlan.toString
    assert(!mg.contains("SinglePartition"),
      s"grouped MG read funnels into one task:\n$mg")
    // grouped count-min: the grid read is one hash aggregation and the
    // probe a (grp, cell)-keyed join — no SinglePartition anywhere, and
    // the data-sized grid relation is never broadcast
    graft.ops.SketchStore.registerCountMinBy(db, df, col("g"),
      col("v").cast("string"), batchId = 0L)
    val items = Seq(("s0", "1"), ("s1", "2"), ("s2", "3")).toDF("g", "t")
    val probe = graft.ops.SketchStore
      .probeStoredCountMinBy(db, items, "g", "t")
      .queryExecution.executedPlan.toString
    assert(!probe.contains("SinglePartition"),
      s"grouped count-min probe funnels into one task:\n$probe")
  }

  test("point lookup plans no range-sort exchange: one key pays no sampling job") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val db = graft.store.Db(spark,
      java.nio.file.Files.createTempDirectory("graft-planpt").toString)
    graft.store.TxWriter.write(db,
      (1 to 500).map(i => (f"k$i%04d", i.toLong, i.toLong))
        .toDF("key", "ts", "v"))
    graft.store.TxWriter.delete(db, wildcard = "nomatch%")
    val df = db.snapshot().get("k0042")
    assert(df.select("v").as[Long].collect().toSeq == Seq(42L))
    val plan = df.queryExecution.executedPlan.toString
    // the r10 optimization under guard: a global orderBy here would
    // re-introduce a range-sampling job + shuffle as pure per-lookup
    // fixed cost (serial GET p50 regressed ~20% with it)
    assert(!plan.contains("rangepartitioning"),
      s"point lookup re-grew a range sort:\n${plan.take(2000)}")
    // the one remaining wide op is the last-wins aggregate
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(exchanges <= 1, s"unexpected exchanges ($exchanges):\n${plan.take(2000)}")
  }

  test("tp_dup_spans reuses the window-hash exchange in the no-broadcast regime") {
    // at 100 TB neither side of the dup-window join broadcasts; the two
    // branches over the exploded window relation must collapse into one
    // shuffle (ReusedExchange), not recompute the explode+hash pipeline
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("tp_dup_spans")(spark, "/root/testdata/sf0.001")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"),
        s"window relation recomputed:\n${plan.take(2000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("DSIR corpus join broadcasts the bounded model table; top-k is a TakeOrdered") {
    val sfDir = "/root/testdata/sf0.001"
    // the ≤BUCKETS-row log-ratio model must broadcast onto the corpus scan
    // (a shuffled join here would shuffle the whole corpus at 100 TB)
    val w = SparkEntry.queries("sel_dsir_weights")(spark, sfDir)
    w.collect()
    val wPlan = w.queryExecution.executedPlan.toString
    assert(wPlan.contains("BroadcastHashJoin"),
      s"model join not broadcast:\n${wPlan.take(2000)}")
    // the k-row sample must be a distributed TakeOrdered, not a global sort
    val t = SparkEntry.queries("sel_dsir_topk")(spark, sfDir)
    t.collect()
    val tPlan = t.queryExecution.executedPlan.toString
    assert(tPlan.contains("TakeOrderedAndProject"),
      s"top-k planned as a full sort:\n${tPlan.take(2000)}")
  }

  test("dedup self-joins broadcast or reuse one exchange, never recompute") {
    val sfDir = "/root/testdata/sf0.001"
    // AQE finalizes the plan only after execution; run THIS df, then inspect
    Seq("dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
        "tp_gram_df", "tp_dup_spans").foreach {
      name =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        // acceptable shapes: AQE broadcasts one tiny side (recompute is
        // cheaper than a shuffle at toy scale), or — the at-scale shape —
        // a shuffled join whose identical branches collapse into one
        // ReusedExchange. A shuffled join with two independent pipeline
        // computations would double the signature CPU at 100 TB.
        val shuffledJoin = plan.contains("SortMergeJoin") ||
          plan.contains("ShuffledHashJoin")
        assert(!shuffledJoin || plan.contains("ReusedExchange"),
          s"$name shuffled self-join without exchange reuse:\n${plan.take(2000)}")
    }
  }

  test("dedup_lines: drop-list anti-join broadcasts; corpus never shuffles for removal") {
    val df = SparkEntry.queries("dedup_lines")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"boilerplate drop list must broadcast:\n${plan.take(2000)}")
    // the only corpus-keyed exchange is the per-doc rebuild (doc_id) plus
    // the slim line-hash count agg — a seg-keyed join shuffle would mean
    // the drop list stopped broadcasting
    assert(!plan.contains("SortMergeJoin"),
      s"removal join degraded to a corpus shuffle:\n${plan.take(2000)}")
  }

  test("tp_decontaminate_bloom: the bloom probe sits in the plan before the join") {
    val df = SparkEntry.queries("tp_decontaminate_bloom")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"bloom prefilter missing from executed plan:\n${plan.take(2000)}")
    val filterIdx = plan.indexOf("bloom_might_contain")
    val joinIdx = plan.indexOf("HashJoin")
    assert(joinIdx >= 0 && joinIdx < filterIdx,
      "bloom filter must feed the join (appear below it in the plan tree)")
  }

  test("tp_pii_scrub plans as a pure projection: no exchange except the result sort") {
    val df = SparkEntry.queries("tp_pii_scrub")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // AQE's toString prints Final AND Initial plans, so count kinds, not
    // occurrences: the orderBy's rangepartitioning is the only exchange
    // allowed — any hashpartitioning means the op grew a shuffle
    assert(!plan.contains("Exchange hashpartitioning"),
      s"pii scrub should be map-only (+1 result sort):\n${plan.take(2000)}")
  }

  test("sk_kmv_distinct: the sketch is a partial-folding ObjectHashAggregate") {
    val df = SparkEntry.queries("sk_kmv_distinct")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the typed KmvAgg buffer plans as ObjectHashAggregate with a
    // partial stage — the shape that shuffles k longs per partition.
    // (countDistinct rides along for the visible-error column; the
    // sketch itself must never depend on it)
    assert(plan.contains("ObjectHashAggregate"),
      s"KMV buffer not object-agg'd (no map-side fold?):\n${plan.take(2000)}")
  }

  test("sk_countmin: grid agg map-side-combines; probe broadcasts the grid") {
    val df = SparkEntry.queries("sk_countmin")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the counter grid (≤ 4×1024 keys) must reach the probe through a
    // broadcast join — a shuffled join here would shuffle the probe side
    // by grid cell for no reason
    assert(plan.contains("BroadcastHashJoin"),
      s"count-min probe not broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"count-min probe degraded to a shuffled join:\n${plan.take(2000)}")
  }

  test("emb_gram / emb_dim_stats: one aggregation, no join, no extra exchange") {
    for (name <- Seq("emb_gram", "emb_dim_stats")) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("HashAggregate"), s"$name lost its agg")
      assert(!plan.contains("Join"),
        s"$name grew a join — the moments are one scan:\n${plan.take(2000)}")
      // exactly one hash exchange kind: generator → partial agg →
      // exchange(d² cells) → final agg (+ the result range sort)
      assert(plan.contains("Exchange hashpartitioning"),
        s"$name lost partial aggregation:\n${plan.take(2000)}")
    }
  }

  test("mine_hard_negatives broadcasts the query side into the label theta join") {
    val df = SparkEntry.queries("mine_hard_negatives")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the ≠-label condition makes this a theta join; with the bounded
    // query set broadcast it is one corpus scan (BroadcastNestedLoop),
    // never a shuffle of the corpus
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"hard-negative join must broadcast the queries:\n${plan.take(2000)}")
  }

  test("tp_scrub_spans reuses the window-hash exchange like tp_dup_spans") {
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("tp_scrub_spans")(
        spark, "/root/testdata/sf0.001")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"),
        s"window relation recomputed in the no-broadcast regime:\n${plan.take(2000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("ret_bm25_probe_only: term set reaches the postings scan as a pushed filter") {
    val df = SparkEntry.queries("ret_bm25_probe_only")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // one postings subtree with the query terms as an In(key) SCAN
    // filter — the probe must filter on key (the last-wins window's
    // partition key, so the predicate pushes through the merge), never
    // on term (stuck above the window), and never |terms| separate scans
    assert(plan.contains("In(key,") && plan.contains("p/batch"),
      s"term-key set not pushed into the postings scan:\n${plan.take(2500)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"probe joins must broadcast the bounded sides:\n${plan.take(2000)}")
  }

  test("PCA projection is map-only: no exchange in the projected plan") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Graft.embeddings(spark, "/root/testdata/sf0.001")
    val model = graft.ops.Pca.fit(emb, "embedding", 8)
    val proj = graft.ops.Pca.project(emb, "embedding", model)
      .select(col("vec_id"), col("pca"))
    proj.collect()
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"projection must be scan-speed (basis rides as literals):\n${plan.take(2000)}")
  }
}
