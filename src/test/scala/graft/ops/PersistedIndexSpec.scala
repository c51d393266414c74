package graft.ops

import graft.SparkSpec
import graft.store.Db
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted IVF+PQ index lifecycle: build → partition-pruned probe →
  * rebuild-supersede. Small dim=8 / m=2 / k=4 / nCells=2 geometry with two
  * obvious clusters so cell assignments are hand-checkable.
  *
  * Covers the two claims only the driver row exercised before:
  *  - the probe plan's PartitionFilters pin `tbucket` to EXACTLY the
  *    probed cells (one scan subtree total — not one per cell);
  *  - re-running buildIndex on the same warehouse supersedes the previous
  *    build even when a vector's cell assignment changes (the stale-row
  *    hazard of (key, ts=cell) keying under plain last-writer-wins).
  */
class PersistedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  // vec 0 and 1 are the coarse centroids (first-nCells-by-id); 2 and 4
  // sit in cluster 0, 3 in cluster 1
  private def corpusA: DataFrame = Seq(
    (0L, vec(1, 0, 0, 0, 0, 0, 0, 1)),
    (1L, vec(0, 1, 0, 0, 0, 0, 1, 0)),
    (2L, vec(0.9, 0.1, 0, 0, 0, 0, 0.1, 0.9)),
    (3L, vec(0.1, 0.9, 0, 0, 0, 0, 0.9, 0.1)),
    (4L, vec(0.8, 0, 0.1, 0, 0, 0.1, 0, 0.8))
  ).toDF("vec_id", "embedding")

  // same corpus but vec 2 moved into cluster 1 — its cell flips between
  // builds, the exact case where stale index rows would survive without
  // the rebuild delete-marker
  private def corpusB: DataFrame = Seq(
    (0L, vec(1, 0, 0, 0, 0, 0, 0, 1)),
    (1L, vec(0, 1, 0, 0, 0, 0, 1, 0)),
    (2L, vec(0, 0.95, 0.05, 0, 0, 0.05, 0.95, 0)),
    (3L, vec(0.1, 0.9, 0, 0, 0, 0, 0.9, 0.1)),
    (4L, vec(0.8, 0, 0.1, 0, 0, 0.1, 0, 0.8))
  ).toDF("vec_id", "embedding")

  private def build(db: Db, corpus: DataFrame): Long =
    Similarity.buildIndex(db, corpus, "vec_id", "embedding",
      nCells = 2, m = 2, k = 4, dim = dim)

  private def probe(db: Db, corpus: DataFrame, queryId: Long): DataFrame =
    Similarity.ivfPqProbePersisted(db,
      corpus.filter(col("vec_id") === queryId), "vec_id", "embedding",
      topK = 3, m = 2, dim = dim)

  private def expected(corpus: DataFrame, queryId: Long): DataFrame =
    Similarity.ivfPqKnnWith(corpus,
      corpus.filter(col("vec_id") === queryId), "vec_id", "embedding",
      topK = 3,
      Similarity.pqTrainedCodebook(corpus, "vec_id", "embedding",
        m = 2, k = 4, dim = dim),
      nCells = 2, m = 2, dim = dim)

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Int)] =
    df.select(col("query_id"), col("nn_id"), col("adist"),
        col("rank").cast("int"))
      .as[(Long, Long, Long, Int)].collect().toSeq.sorted

  test("indexCellStats: occupancy sums to the corpus, tracks appends, " +
      "and never counts meta rows") {
    val db = Db(spark, tmpDir("graft-pidx-stats"))
    build(db, corpusA)
    val n0 = corpusA.count()
    def stats() = Similarity.indexCellStats(db)
      .as[(Long, Long)].collect().toMap
    val s0 = stats()
    assert(s0.values.sum == n0, s"occupancy must sum to the corpus: $s0")
    assert(s0.keySet.subsetOf(Set(0L, 1L)), s"cells are the IVF ids: $s0")
    // an append of FRESH ids shifts the histogram by exactly the batch
    // size (re-appending an existing id at the same cell is a last-wins
    // overwrite, not a duplicate — the store stays one-row-per-vector)
    val fresh = Seq(
      (10L, vec(1, 0, 0, 0, 0, 0, 0, 1)),
      (11L, vec(0, 1, 0, 0, 0, 0, 1, 0)),
      (12L, vec(0.7, 0.2, 0, 0, 0, 0, 0.2, 0.7))
    ).toDF("vec_id", "embedding")
    Similarity.appendToIndex(db, fresh, "vec_id", "embedding",
      m = 2, dim = dim)
    val s1 = stats()
    assert(s1.values.sum == n0 + 3, s"append not counted: $s1")
    // re-appending an existing id at its unchanged cell must NOT grow
    // the count (key+ts identical → last-wins overwrite)
    Similarity.appendToIndex(db,
      Seq((0L, vec(1, 0, 0, 0, 0, 0, 0, 1))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", m = 2, dim = dim)
    assert(stats().values.sum == n0 + 3,
      "re-append of an unchanged vector must overwrite, not duplicate")
  }

  test("cellAdvice: balanced occupancy says refine; crowding (skew) or " +
      "dead cells past the thresholds say retrain") {
    // balanced (the uniform-drift regime the annyear battery measured):
    // p95/p50 ≈ 1, no dead cells → refine, the measured default
    val balanced = Similarity.cellAdvice(Seq.fill(64)(100L))
    assert(balanced == ((0L, Some(1.0), "refine")), balanced)
    // clustered drift: appends crowd few cells — max/p50 blows past the
    // threshold → retrain (re-partitioning the crowded region is the
    // lever refine cannot pull)
    val crowded = Similarity.cellAdvice(
      Seq.fill(60)(10L) ++ Seq.fill(4)(1000L))
    assert(crowded._3 == "retrain" &&
      crowded._2.exists(_ > Similarity.AdviceSkewRetrain), crowded)
    // ONE crowded cell — the measured new-topic shape (anncluster: 73k
    // vectors in one cell of 64). Any sub-max percentile is blind to it
    // (p95/p50 here is 1.0); the skew measure must be max/p50
    val oneHot = Similarity.cellAdvice(Seq.fill(63)(300L) :+ 73000L)
    assert(oneHot._3 == "retrain" && oneHot._2.exists(_ > 200.0), oneHot)
    // dead cells dominate: even with mild skew, ≥ 25% empty cells waste
    // the probe budget and only a re-cell reclaims them
    val dead = Similarity.cellAdvice(Seq.fill(16)(0L) ++ Seq.fill(48)(90L))
    assert(dead._1 == 16L && dead._3 == "retrain", dead)
    // p50 = 0 → skew undefined (None), never a division blowup
    val mostlyDead = Similarity.cellAdvice(Seq.fill(40)(0L) ++ Seq.fill(24)(5L))
    assert(mostlyDead._2.isEmpty && mostlyDead._3 == "retrain", mostlyDead)
    // empty index: no cells, no skew, nothing to retrain
    assert(Similarity.cellAdvice(Nil) == ((0L, None, "refine")))
  }

  test("probe equals the in-memory IVF+PQ over the same trained codebook") {
    val db = Db(spark, tmpDir("graft-pidx"))
    build(db, corpusA)
    val got = rows(probe(db, corpusA, queryId = 2L))
    assert(got.nonEmpty)
    assert(got == rows(expected(corpusA, queryId = 2L)))
  }

  test("probe plan: one scan, PartitionFilters pinned to exactly the probed cell") {
    val db = Db(spark, tmpDir("graft-pidx"))
    build(db, corpusA)
    // query 2 lives in cluster 0 → probed cells = {0}, cell 1 untouched
    val plan = probe(db, corpusA, queryId = 2L)
      .queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).filter(_.contains("tbucket"))
      .toVector
    assert(pf.nonEmpty, s"no tbucket PartitionFilters in probe plan:\n$plan")
    // O(1) plan: the codes read is ONE pruned scan, not a union-per-cell
    assert(pf.size == 1, s"expected one pruned codes scan, got:\n$pf")
    // drop attribute ids (tbucket#123L) before extracting the cell values
    val cells = "-?\\d+".r
      .findAllIn(pf.head.replaceAll("#\\d+L?", "")).map(_.toLong).toSet
    assert(cells == Set(0L), s"PartitionFilters not pinned to cell 0: $pf")
  }

  test("caller-asserted geometry that disagrees with the stored index fails loudly") {
    val db = Db(spark, tmpDir("graft-pidx-geom"))
    build(db, corpusA) // stored geometry: m=2, dim=8
    // the build records geometry as manifest table properties — the
    // zero-job fast path for serving-tier validation
    val props = graft.store.Manifest.current(db.warehouse).props
    assert(props.get(Similarity.GeomMProp).contains("2") &&
      props.get(Similarity.GeomDimProp).contains("8") &&
      props.get(Similarity.ResidualProp).contains("0"), props.toString)
    assert(Similarity.indexGeometry(db).contains((2, dim)))
    // a pre-props index (properties stripped) falls back to deriving
    // geometry from the reserved meta rows
    graft.store.Manifest.update(db.warehouse)(s => s.copy(props =
      s.props -- Seq(Similarity.GeomMProp, Similarity.GeomDimProp,
        Similarity.ResidualProp)))
    assert(Similarity.indexGeometry(db).contains((2, dim)),
      "meta-row fallback must still derive the stored geometry")
    // m SMALLER than stored used to score with half the codebook —
    // silent garbage; m larger threw a bare NoSuchElementException
    for (badM <- Seq(1, 4)) {
      val e = intercept[IllegalArgumentException] {
        Similarity.ivfPqProbePersisted(db,
          corpusA.filter(col("vec_id") === 2L), "vec_id", "embedding",
          topK = 3, m = badM, dim = dim).collect()
      }
      assert(e.getMessage.contains("stored m=2"), e.getMessage)
    }
    // wrong dim used to zip-truncate the query against the centroids
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfPqProbePersisted(db,
        corpusA.filter(col("vec_id") === 2L), "vec_id", "embedding",
        topK = 3, m = 2, dim = 16).collect()
    }
    assert(e2.getMessage.contains("stored dim=8"), e2.getMessage)
    // agreeing geometry still probes fine after the failed attempts
    assert(rows(probe(db, corpusA, queryId = 2L)).nonEmpty)
  }

  test("rebuild supersedes the old index even when cells change") {
    val db = Db(spark, tmpDir("graft-pidx"))
    build(db, corpusA)
    build(db, corpusB) // vec 2 flips cluster 0 → 1 between builds
    // exactly one visible row per vector: the corpusA row for vec 2
    // (cell 0) must NOT survive alongside its corpusB row (cell 1)
    val visible = db.read("v/%")
      .select(col("key"), col("ts")).as[(String, Long)].collect().toSeq
    assert(visible.size == 5, s"stale index rows visible: $visible")
    assert(visible.map(_._1).distinct.size == 5)
    assert(visible.toMap.apply("v/000000000002") == 1L,
      "vec 2 must sit in cell 1 after the rebuild")
    // and probing the new index matches corpusB's in-memory answer
    val got = rows(probe(db, corpusB, queryId = 2L))
    assert(got.nonEmpty)
    assert(got == rows(expected(corpusB, queryId = 2L)))
  }

  test("appendToIndex encodes with the persisted quantizer, one tx per batch") {
    val db = Db(spark, tmpDir("graft-pidx"))
    // build on vectors 0-3 (trains centroids + codebook), append 4 later
    build(db, corpusA.filter(col("vec_id") < 4))
    Similarity.appendToIndex(db, corpusA.filter(col("vec_id") === 4L),
      "vec_id", "embedding", m = 2, dim = dim)
    assert(db.snapshot().manifest.dataTxids.size == 2,
      "append must be one additional tx, not a rebuild")
    // probe sees the appended vector through the SAME quantizer: equal to
    // the in-memory index over the full corpus with the codebook trained
    // on the build subset only
    val got = rows(probe(db, corpusA, queryId = 2L))
    val want = rows(Similarity.ivfPqKnnWith(corpusA,
      corpusA.filter(col("vec_id") === 2L), "vec_id", "embedding",
      topK = 3,
      Similarity.pqTrainedCodebook(corpusA.filter(col("vec_id") < 4),
        "vec_id", "embedding", m = 2, k = 4, dim = dim),
      nCells = 2, m = 2, dim = dim))
    assert(got.nonEmpty && got == want)
    // vec 4 (cluster 0, same as query 2) must be a visible neighbor
    assert(got.exists(_._2 == 4L), s"appended vector not searchable: $got")
  }

  test("multi-probe: nProbe=nCells equals the exhaustive trained-ADC scan") {
    val db = Db(spark, tmpDir("graft-pidx"))
    build(db, corpusA)
    // probing EVERY cell removes the IVF approximation entirely: the
    // result must equal a plain PQ/ADC scan over the same trained codebook
    val got = rows(Similarity.ivfPqProbePersisted(db,
      corpusA.filter(col("vec_id") === 2L), "vec_id", "embedding",
      topK = 3, m = 2, dim = dim, nProbe = 2))
    val want = rows(Similarity.pqAdcKnnWith(corpusA,
      corpusA.filter(col("vec_id") === 2L), "vec_id", "embedding",
      topK = 3,
      Similarity.pqTrainedCodebook(corpusA, "vec_id", "embedding",
        m = 2, k = 4, dim = dim),
      m = 2, dim = dim))
    assert(got.nonEmpty && got == want)
    // and the exhaustive probe sees the OTHER cluster's vectors too
    assert(got.exists(_._2 == 3L) || got.exists(_._2 == 1L),
      s"nProbe=2 never reached cell 1: $got")
  }

  test("multi-probe plan: PartitionFilters widen to exactly the probed cells") {
    val db = Db(spark, tmpDir("graft-pidx"))
    build(db, corpusA)
    val plan = Similarity.ivfPqProbePersisted(db,
        corpusA.filter(col("vec_id") === 2L), "vec_id", "embedding",
        topK = 3, m = 2, dim = dim, nProbe = 2)
      .queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).filter(_.contains("tbucket"))
      .toVector
    // still ONE scan — the plan is O(1) in nProbe, only the IN-set widens
    assert(pf.size == 1, s"expected one pruned codes scan, got:\n$pf")
    val cells = "-?\\d+".r
      .findAllIn(pf.head.replaceAll("#\\d+L?", "")).map(_.toLong).toSet
    assert(cells == Set(0L, 1L), s"PartitionFilters not {0,1}: $pf")
  }

  test("relational probe equals the literal probe (nProbe 1 and 2)") {
    val db = Db(spark, tmpDir("graft-pidx"))
    build(db, corpusA)
    for (nProbe <- Seq(1, 2)) {
      val lit = rows(Similarity.ivfPqProbePersisted(db, corpusA,
        "vec_id", "embedding", topK = 3, m = 2, dim = dim, nProbe = nProbe))
      val rel = rows(Similarity.ivfPqProbePersistedRelational(db, corpusA,
        "vec_id", "embedding", topK = 3, m = 2, dim = dim, nProbe = nProbe))
      assert(lit.nonEmpty && rel == lit, s"paths disagree at nProbe=$nProbe")
    }
  }

  test("buildIndex with Lloyd-trained coarse centroids round-trips") {
    val db = Db(spark, tmpDir("graft-pidx"))
    // trained coarse quantizer (kmeansCodebook) instead of first-nCells —
    // the offline-k-means path; probes read whatever the warehouse stores
    val trained = Similarity.kmeansCodebook(corpusA, "vec_id", "embedding",
        k = 2, iters = 2)
      .orderBy("centroid_id").select("v")
      .as[Seq[Long]].collect().map(_.toArray)
    Similarity.buildIndex(db, corpusA, "vec_id", "embedding",
      nCells = 2, m = 2, k = 4, dim = dim, coarse = Some(trained))
    // stored centroids are exactly the trained ones, in cell order
    val stored = db.snapshot()
      .readInstants(Seq(Similarity.CELL_CENTROIDS), ordered = false)
      .select("nn_id", "codes").as[(Long, Seq[Long])].collect()
      .sortBy(_._1).map(_._2.toArray)
    assert(stored.length == 2 &&
      stored.zip(trained).forall { case (a, b) => a.sameElements(b) })
    // probing every cell is quantizer-independent: equals exhaustive ADC
    val got = rows(Similarity.ivfPqProbePersisted(db,
      corpusA.filter(col("vec_id") === 2L), "vec_id", "embedding",
      topK = 3, m = 2, dim = dim, nProbe = 2))
    val want = rows(Similarity.pqAdcKnnWith(corpusA,
      corpusA.filter(col("vec_id") === 2L), "vec_id", "embedding",
      topK = 3,
      Similarity.pqTrainedCodebook(corpusA, "vec_id", "embedding",
        m = 2, k = 4, dim = dim),
      m = 2, dim = dim))
    assert(got.nonEmpty && got == want)
  }

  test("major compaction collapses rebuild history; probe unchanged") {
    val db = Db(spark, tmpDir("graft-pidx"))
    build(db, corpusA)
    build(db, corpusB)
    val want = rows(probe(db, corpusB, queryId = 2L))
    // two builds = 2 delete markers + 2 data txs of history; compaction
    // purges the superseded corpusA rows and the markers into one tx
    graft.store.Compactor.major(db)
    val m = db.snapshot().manifest
    assert(m.dataTxids.size == 1, s"history not collapsed: ${m.dataTxids}")
    assert(rows(probe(db, corpusB, queryId = 2L)) == want,
      "probe answer changed across compaction")
    // pruning still works on the compacted layout: one scan, cell-pinned
    val plan = probe(db, corpusB, queryId = 2L)
      .queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).filter(_.contains("tbucket"))
      .toVector
    assert(pf.size == 1, s"expected one pruned codes scan, got:\n$pf")
  }
}
