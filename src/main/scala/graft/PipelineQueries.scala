package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Graft
import graft.ops.{Decontaminate, Dedup, IncrementalDedup, Pca, Pipeline, PortableHash, Sampling, Selection, Retrieval, Sequencing, Similarity, SketchStore, Sketches, TextAnalysis}

/** Training-data pipeline operators as driver-contract queries with exact
  * DuckDB oracles (dedup family, similarity search, text analysis).
  *
  * The oracle SQL is *generated* from the same constants/fragments as the
  * Spark plans ([[PortableHash]]/[[Dedup]]/[[Similarity]] `sql*` builders),
  * so the two sides cannot drift.
  */
object PipelineQueries {
  private val P = PortableHash.P

  /** Literal query set for the BM25 row — one list feeding both the
    * Spark plan and the generated oracle.
    */
  private val bm25Queries: Seq[(Long, String)] = Seq(
    0L -> "spark merge join", 1L -> "window batch stream",
    2L -> "customer order table scan", 3L -> "data quality filter",
    4L -> "the slow query")

  /** Temp warehouses registered for recursive delete at JVM exit — Bench's
    * interleaved passes and every correctness run must not leak
    * `graft-annix` dirs (the rows are read lazily after the query builder
    * returns, so cleanup can't happen any earlier than exit). ONE shutdown
    * hook drains the list: the lifecycle rows create a fresh warehouse per
    * invocation, so a 3-attempt × 3-pass bench would otherwise register
    * dozens of hooks.
    */
  private val tempDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      tempDirs.forEach { dir =>
        if (Files.exists(dir))
          Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
            .forEach(p => Files.deleteIfExists(p))
      }
    }))

  private def tempWarehouse(): String = {
    cleanupHook
    val dir = java.nio.file.Files.createTempDirectory("graft-annix")
    tempDirs.add(dir)
    dir.toString
  }

  /** One fingerprint store per (session, sf dir, kind): the corpus first
    * half registers once; every `dedup_incremental[_near]_probe`
    * invocation then pays only the recurring probe — registration is
    * deterministic, so sharing cannot change any value.
    */
  private val incStoreCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Boolean), String]()

  private def incStoreFor(s: org.apache.spark.sql.SparkSession, d: String,
                          near: Boolean): graft.store.Db = {
    val wh = incStoreCache.computeIfAbsent((d, near), _ => {
      val w = tempWarehouse()
      val db = graft.store.Db(s, w)
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      val firstHalf = docs.filter(col("doc_id") < mid)
      if (near)
        IncrementalDedup.registerNearBatch(db, firstHalf, "doc_id", "text")
      else IncrementalDedup.registerBatch(db, firstHalf, "doc_id", "text")
      w
    })
    graft.store.Db(s, wh)
  }

  /** One persisted ANN index per (session, sf dir): built on first use,
    * probed by every later `ann_ivf_pq_probe_only` invocation — the
    * build-once/probe-many steady state the index design exists for
    * (`ann_ivf_pq_persisted` keeps measuring the full lifecycle).
    */
  private val annIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Session-cached persisted BM25 postings index per sf dir — the
    * register-once/probe-many steady state, mirroring [[annIndexFor]]:
    * `ret_bm25_probe_only` measures ONLY the per-query-set probe.
    */
  private val bm25IndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def bm25IndexFor(s: SparkSession, d: String): graft.store.Db = {
    val wh = bm25IndexCache.computeIfAbsent(d, _ => {
      val w = tempWarehouse()
      Retrieval.buildBm25Index(graft.store.Db(s, w), Graft.documents(s, d),
        "doc_id", "text")
      w
    })
    graft.store.Db(s, wh)
  }

  /** Half-built BM25 index cached per sf dir: `ret_bm25_append_only`
    * re-appends the second half each invocation — idempotent (same
    * (key, ts=doc_id) rows, last-wins), so the index state is stable
    * across passes while the timed work is EXACTLY the steady-state
    * ingest cost: one batch aggregation + two tx commits + the probe.
    */
  private val bm25HalfIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def bm25HalfIndexFor(s: SparkSession, d: String): graft.store.Db = {
    val wh = bm25HalfIndexCache.computeIfAbsent(d, _ => {
      val w = tempWarehouse()
      val docs = Graft.documents(s, d)
      val cut = bm25AppendCut(docs)
      Retrieval.buildBm25Index(graft.store.Db(s, w),
        docs.filter(col("doc_id") < cut), "doc_id", "text")
      w
    })
    graft.store.Db(s, wh)
  }

  /** The steady-state append batch boundary: the last ~5% of doc ids —
    * a BATCH-sized arrival, not a second half-build.
    */
  private def bm25AppendCut(docs: DataFrame): Long =
    docs.agg(floor(max(col("doc_id")) * 0.95).cast("long"))
      .head().getLong(0)

  private def annIndexFor(s: SparkSession, d: String): graft.store.Db = {
    val wh = annIndexCache.computeIfAbsent(d, _ => {
      val w = tempWarehouse()
      Similarity.buildIndex(graft.store.Db(s, w), Graft.embeddings(s, d),
        "vec_id", "embedding")
      w
    })
    graft.store.Db(s, wh)
  }

  /** The append-side steady-state twin of [[annIndexFor]]: an index
    * trained+built on the even half with the odd half already appended
    * (both outside any query's timing, after the first invocation), so
    * `ann_ivf_pq_append_only` measures ONLY what a steady-state ingest
    * pays — encode one arriving batch with the persisted quantizer, one
    * tx commit, probe.
    */
  private val annAppendIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Steady-state cached warehouses must stay steady: every
    * `*_append_only` invocation commits fresh (idempotent-by-value)
    * transactions to its session-cached warehouse, so pass N would
    * otherwise probe a store with ~N more transactions than pass 1 —
    * bounded drift the last-wins merge absorbs, but the "steady state"
    * slowly stops being steady. Once the tx count passes the bound, the
    * history is major-compacted back to one transaction — amortized
    * maintenance, exactly what a real steady-state ingest schedules
    * (compaction correctness over index stores: PersistedIndexSpec,
    * ChunkedCompactSpec).
    */
  private[graft] val DriftBound = 16

  private[graft] def boundDrift(db: graft.store.Db): graft.store.Db = {
    if (db.snapshot().manifest.dataTxids.size > DriftBound)
      graft.store.Compactor.major(db)
    db
  }

  private def annAppendIndexFor(s: SparkSession, d: String): graft.store.Db = {
    val wh = annAppendIndexCache.computeIfAbsent(d, _ => {
      val w = tempWarehouse()
      val db = graft.store.Db(s, w)
      val emb = Graft.embeddings(s, d)
      Similarity.buildIndex(db, emb.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding")
      Similarity.appendToIndex(db, emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding")
      w
    })
    graft.store.Db(s, wh)
  }

  /** Session cache for the shared deterministic train artifacts (16-cell
    * Lloyd coarse centroids, raw and residual PQ codebooks, all iters=2
    * over the full embeddings table). Five driver rows train the
    * IDENTICAL artifacts — deterministic, so sharing cannot change any
    * value (the 28258d3 rule, lifted from per-invocation to per-(session,
    * sf dir)); each row's plan/probe work stays its own.
    */
  private val trainArtifactCache = new java.util.concurrent.ConcurrentHashMap[
    String,
    (Array[Array[Long]], Array[Array[(Array[Long], Long)]],
      Array[Array[(Array[Long], Long)]])]()

  private def trainedArtifacts(s: SparkSession, d: String)
      : (Array[Array[Long]], Array[Array[(Array[Long], Long)]],
        Array[Array[(Array[Long], Long)]]) =
    trainArtifactCache.computeIfAbsent(d, _ => {
      val emb = Graft.embeddings(s, d)
      val cents = Similarity.collectKmeansCentroids(emb, "vec_id",
        "embedding", 16, 2)
      val cb = Similarity.pqTrainedCodebook(emb, "vec_id", "embedding",
        iters = 2)
      val resCb = Similarity.residualCodebook(emb, "vec_id", "embedding",
        cents)
      (cents, cb, resCb)
    })

  // int-ish outputs are cast to long on the Spark side: DuckDB counts are
  // BIGINT and the driver's hash compare is dtype-sensitive.
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── text analysis ─────────────────────────────────────────────────
    "text_profile" -> { (s, d) =>
      TextAnalysis.profile(Graft.documents(s, d))
        .select(col("doc_id"), col("lang"),
          col("n_tokens").cast("long"), col("n_subwords").cast("long"),
          col("avg_token_len"), col("stopword_ratio"), col("quality"),
          col("lang_pred"), col("fingerprint"))
        .orderBy("doc_id")
    },
    "text_rolling_hash" -> { (s, d) =>
      Graft.documents(s, d)
        .select(col("doc_id"), TextAnalysis.rollingHash(col("text")).as("rhash"))
        .orderBy("doc_id")
    },
    // end-to-end corpus cleaning: quality gate + language filter + exact
    // dedup keep-set — the canonical pretraining-data preparation job,
    // composed from the individual operators (all scan-bound + one agg)
    "tp_clean_corpus" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val scored = docs.select(col("doc_id"), col("lang"), col("text"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.langPredict(col("text")).as("lang_pred"))
      val kept = scored
        .filter(col("quality") >= 0.5 && col("lang_pred") === col("lang"))
      val canonical = kept
        .groupBy(md5(col("text")).as("_h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      kept.join(canonical, "doc_id")
        .select(col("doc_id"), col("lang"), col("quality"))
        .orderBy("doc_id")
    },
    // multimodal frame sampling: one media row explodes to n frame rows;
    // the stub's byte-slice arithmetic is the oracle (plumbing verified
    // end-to-end, decoder swaps in without touching it)
    "mm_frames" -> { (s, d) =>
      import s.implicits._
      val media = graft.ops.Multimodal
        .mediaFromDocuments(Graft.documents(s, d))
        .as[graft.ops.Multimodal.MediaRecord]
      graft.ops.Multimodal.sampleFrames(media, 4)
        .select(col("media_id"), col("kind"), col("frame").cast("long"),
          col("offset_ms"), col("frame_bytes"))
        .orderBy("media_id", "frame")
    },
    // benchmark decontamination: flag corpus docs sharing >= 3 distinct
    // trigrams with the (stand-in) eval set — inverted-index join, the
    // match count IS the overlap
    "tp_decontaminate" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val bench = docs.filter(col("doc_id") % 25 === 0)
      Decontaminate.overlaps(docs, bench, "doc_id", "text", "doc_id", "text",
          n = 3, minOverlap = 3)
        .filter(col("doc_id") =!= col("bench_id"))
        .orderBy("doc_id", "bench_id")
    },
    // decontamination with the bloom prefilter: identical exact output
    // (same oracle), but non-matching corpus shingles die at scan speed
    // in a codegen'd bit-array probe before the join ever sees them
    "tp_decontaminate_bloom" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val bench = docs.filter(col("doc_id") % 25 === 0)
      Decontaminate.overlapsBloom(docs, bench, "doc_id", "text", "doc_id",
          "text", n = 3, minOverlap = 3)
        .filter(col("doc_id") =!= col("bench_id"))
        .orderBy("doc_id", "bench_id")
    },
    // PII redaction: emails/IPs/phones/SSN shapes -> typed placeholders.
    // The synthetic corpus carries no PII, so both engines plant the same
    // deterministic contact line in half the docs first — the compare
    // then checks real matches, not a no-op
    "tp_pii_scrub" -> { (s, d) =>
      val planted = Graft.documents(s, d).withColumn("t",
        when(col("doc_id") % 2 === 0,
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"),
            lit("@example.com or 555-123-4567 or 10.0.0."),
            (col("doc_id") % 256).cast("string")))
          .otherwise(col("text")))
      planted.select(col("doc_id"),
          TextAnalysis.piiCount(col("t")).cast("long").as("n_pii"),
          md5(TextAnalysis.piiScrub(col("t"))).as("scrub_hash"))
        .orderBy("doc_id")
    },
    // Gopher-style repetition quality signals, scan-speed projection
    "tp_repetition" -> { (s, d) =>
      TextAnalysis.repetition(Graft.documents(s, d)).orderBy("doc_id")
    },
    // corpus-statistics quality score: avg n-gram document frequency
    // (model-based-filter stand-in; boilerplate scores high)
    "tp_gram_df" -> { (s, d) =>
      TextAnalysis.gramDocFreqScore(Graft.documents(s, d)).orderBy("doc_id")
    },
    // corpus frequency table (tokenizer-training seed): top-k tokens
    // with occurrence + document frequency, deterministic tie-break
    // (k=20 < |vocab| at every SF so the cut and its tie-break BIND)
    "tp_vocab_topk" -> { (s, d) =>
      TextAnalysis.vocabTopK(Graft.documents(s, d), "doc_id", "text", 20)
    },
    // the BPE-merge counting kernel: top-k adjacent token pairs (each
    // tokenizer-training round = count pairs, merge the argmax, recount;
    // the count is the distributed 99% of the loop)
    "tp_bpe_pairs" -> { (s, d) =>
      TextAnalysis.pairTopK(Graft.documents(s, d), "doc_id", "text", 20)
    },
    // BM25 lexical retrieval: top-10 docs per query, scores micro-
    // quantized per term contribution so ln() drift can't break the
    // hash compare (the Selection device)
    "ret_bm25" -> { (s, d) =>
      import s.implicits._
      Retrieval.bm25TopK(Graft.documents(s, d), "doc_id", "text",
        bm25Queries.toDF("query_id", "qtext"), 10)
    },
    // hybrid retrieval: RRF fusion of the BM25 lexical list and the
    // dense cosine-kNN list (embeddings as the documents' vectors) —
    // fusion is a pure rank-list join, no corpus access
    "ret_hybrid_rrf" -> { (s, d) =>
      import s.implicits._
      val lex = Retrieval.bm25TopK(Graft.documents(s, d), "doc_id", "text",
        bm25Queries.toDF("query_id", "qtext"), 20)
      val emb = Graft.embeddings(s, d)
      val dense = Similarity.bruteForceKnn(emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 20)
        .select(col("query_id"), col("nn_id").as("doc_id"), col("rank"))
      Retrieval.rrfFuse(lex, dense, 10)
    },
    // steady-state BM25: probe the session-cached persisted postings
    // index (built once, outside timing) — per-term key-pruned reads,
    // identical scores to the direct path (same oracle)
    "ret_bm25_probe_only" -> { (s, d) =>
      import s.implicits._
      Retrieval.bm25ProbeIndex(bm25IndexFor(s, d),
        bm25Queries.toDF("query_id", "qtext"), 10)
    },
    // incremental index maintenance: build on the first half, APPEND
    // the second — every probe statistic is a sum over per-document
    // rows, so the incremental index must equal the full-corpus oracle
    // exactly
    "ret_bm25_incremental" -> { (s, d) =>
      import s.implicits._
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      val db = graft.store.Db(s, tempWarehouse())
      Retrieval.buildBm25Index(db, docs.filter(col("doc_id") < mid),
        "doc_id", "text")
      Retrieval.appendBm25Batch(db, docs.filter(col("doc_id") >= mid),
        "doc_id", "text")
      Retrieval.bm25ProbeIndex(db, bm25Queries.toDF("query_id", "qtext"), 10)
    },
    // the append-side steady state (mirrors ann_ivf_pq_append_only):
    // the half-built index is session-cached; the timed work is one
    // idempotent re-append of the second half + the probe — what a
    // steady-state ingest actually pays, build outside timing
    "ret_bm25_append_only" -> { (s, d) =>
      import s.implicits._
      val docs = Graft.documents(s, d)
      val cut = bm25AppendCut(docs)
      val db = boundDrift(bm25HalfIndexFor(s, d))
      Retrieval.appendBm25Batch(db, docs.filter(col("doc_id") >= cut),
        "doc_id", "text")
      Retrieval.bm25ProbeIndex(db, bm25Queries.toDF("query_id", "qtext"), 10)
    },
    // the full maintenance lifecycle against ONE store: build on a 60%
    // prefix, append the next 30%, REBUILD on the full corpus (the
    // rebuild issues full-range delete markers that supersede every
    // earlier generation), then MAJOR-COMPACT the deleted history away
    // physically. The probe over the compacted store must equal the
    // fresh-build oracle exactly — delete markers, last-wins precedence
    // and compaction all invisible to scores. This is the row that
    // proves index stores are ordinary warehouse citizens under the
    // full storage lifecycle, not just append-only ones.
    "ret_bm25_lifecycle" -> { (s, d) =>
      import s.implicits._
      val docs = Graft.documents(s, d)
      val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
      val db = graft.store.Db(s, tempWarehouse())
      Retrieval.buildBm25Index(db,
        docs.filter(col("doc_id") < mx * 6 / 10), "doc_id", "text")
      Retrieval.appendBm25Batch(db,
        docs.filter(col("doc_id") >= mx * 6 / 10 &&
          col("doc_id") < mx * 9 / 10), "doc_id", "text")
      Retrieval.buildBm25Index(db, docs, "doc_id", "text") // rebuild
      graft.store.Compactor.major(db)
      Retrieval.bm25ProbeIndex(db, bm25Queries.toDF("query_id", "qtext"), 10)
    },
    // the BATCH probe: a DISTRIBUTED query set (here: documents querying
    // with their own text) against the same session-cached index via the
    // relational twin — no driver term collect, no isin literal, bounded
    // plan size at any query count; scores must equal the direct oracle
    "ret_bm25_batch" -> { (s, d) =>
      val q = Graft.documents(s, d).filter(col("doc_id") < 16)
        .select(col("doc_id").as("query_id"), col("text").as("qtext"))
      Retrieval.bm25ProbeRelational(bm25IndexFor(s, d), q, 10)
    },
    // the UPGRADE path: a genuine legacy (v1, pre-denormalization)
    // store — postings without dl, no stat partials, no layout flag —
    // migrated in place (one index-sized tx, never re-reading the
    // corpus), then appended to through the now-v2 writer. The probe
    // over the migrated+appended store must equal the fresh-build
    // oracle exactly: layout generations are a physical detail scores
    // can never see.
    "ret_bm25_migrated" -> { (s, d) =>
      import s.implicits._
      val docs = Graft.documents(s, d)
      val cut = bm25AppendCut(docs)
      val db = graft.store.Db(s, tempWarehouse())
      Retrieval.buildBm25IndexLegacyV1(db,
        docs.filter(col("doc_id") < cut), "doc_id", "text")
      Retrieval.migrateBm25Layout(db)
      Retrieval.appendBm25Batch(db,
        docs.filter(col("doc_id") >= cut), "doc_id", "text")
      Retrieval.bm25ProbeIndex(db, bm25Queries.toDF("query_id", "qtext"), 10)
    },
    // the full hybrid steady state: BOTH persisted indexes probed (BM25
    // postings + IVF-PQ ANN, each session-cached and built outside
    // timing) and RRF-fused — the serving-path composition
    "ret_hybrid_probe_only" -> { (s, d) =>
      import s.implicits._
      val lex = Retrieval.bm25ProbeIndex(bm25IndexFor(s, d),
        bm25Queries.toDF("query_id", "qtext"), 20)
      val emb = Graft.embeddings(s, d)
      val dense = Similarity.ivfPqProbePersisted(annIndexFor(s, d),
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", topK = 20)
        .select(col("query_id"), col("nn_id").as("doc_id"), col("rank"))
      Retrieval.rrfFuse(lex, dense, 10)
    },
    // fusion has to EARN its keep: recall of the hybrid list and of each
    // retriever alone against the best answer the query mix can express
    // (RRF of the FULL rankings, top-10) — hybrid must clear an absolute
    // floor AND beat both singles, each pinned as a 0/1 hash-gated column
    "ret_hybrid_recall" -> { (s, d) =>
      import s.implicits._
      val lexFull = Retrieval.bm25TopK(Graft.documents(s, d), "doc_id",
        "text", bm25Queries.toDF("query_id", "qtext"), Int.MaxValue)
      val emb = Graft.embeddings(s, d)
      val denseFull = Similarity.bruteForceKnn(emb,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", Int.MaxValue)
        .select(col("query_id"), col("nn_id").as("doc_id"), col("rank"))
      Retrieval.hybridRecallRows(lexFull, denseFull, k = 10, cutK = 100)
    },
    // the full BPE merge-learning loop: 6 rounds of count->argmax->
    // re-segment on the word-frequency table (corpus scanned once;
    // rounds are vocab-sized jobs)
    "tp_bpe_learn" -> { (s, d) =>
      TextAnalysis.bpeLearn(Graft.documents(s, d), "text", 6, s)
    },
    // the encode half of the tokenizer loop: re-segment every document
    // under the 6 learned merges (word->spelling dictionary broadcast
    // onto one corpus explode) and count words vs subwords
    "tp_bpe_encode" -> { (s, d) =>
      TextAnalysis.bpeEncode(Graft.documents(s, d), "doc_id", "text", 6)
    },
    // deterministic sketches: per-source KMV vocabulary-size estimate
    // (exact count alongside so the error is visible) and count-min
    // frequency estimates for the exact top-20 tokens (est_cm >=
    // n_exact always; the grid is 4x1024 counters whatever the corpus)
    "sk_kmv_distinct" -> { (s, d) =>
      val docs = graft.core.Graft.rebalance(Graft.documents(s, d))
        .select(col("source"), explode(split(col("text"), " ")).as("token"))
      Sketches.kmvDistinctBy(docs, "source", col("token"))
    },
    "sk_countmin" -> { (s, d) =>
      val toks = graft.core.Graft.rebalance(Graft.documents(s, d))
        .select(explode(split(col("text"), " ")).as("token"))
      Sketches.countMinTopK(toks, col("token"), 20)
    },
    // EXACT heavy hitters via Misra–Gries candidates + exact second
    // pass, over a head+tail stream (shared vocabulary every third
    // document, per-document variants otherwise — vocabulary ~60× the
    // sketch capacity, so the candidate map is under real eviction
    // pressure). The oracle states the definition (counts above
    // n/(c+1)); the MG guarantee is what makes the sketch path compute
    // it exactly without shuffling the tail vocabulary.
    "sk_heavy_hitters" -> { (s, d) =>
      val toks = graft.core.Graft.rebalance(Graft.documents(s, d))
        .select(col("doc_id"),
          explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .select(when(col("doc_id") % 3 === 0, col("term"))
          .otherwise(concat(col("term"), lit("_"), col("doc_id")))
          .as("item"))
      Sketches.heavyHitters(toks, col("item"))
    },
    // warehouse-backed incremental sketches, registered in two half-
    // corpus batches: by mergeability the stored estimates must equal
    // the single full-corpus sketch EXACTLY — which is what the oracle
    // states (KMV union law; count-min cell sums add). The count-min
    // row also folds between batches, proving folds preserve the sums.
    "sk_kmv_incremental" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      def toks(f: DataFrame) =
        f.select(explode(split(col("text"), " ")).as("token"))
      val db = graft.store.Db(s, tempWarehouse())
      SketchStore.registerKmv(db, toks(docs.filter(col("doc_id") < mid)),
        col("token"))
      // fold between batches: keep the k smallest, drop superseded
      // minima — lossless by the union law, so the oracle is the SAME
      // single full-corpus sketch SQL verbatim
      SketchStore.foldKmv(db)
      SketchStore.registerKmv(db, toks(docs.filter(col("doc_id") >= mid)),
        col("token"))
      SketchStore.storedKmvEstimate(db)
    },
    // warehouse-backed frequent items: two half-corpus batches of the
    // head+tail stream registered as DETERMINISTIC MG partials (exact
    // per-batch counts + one truncation — a valid MG summary that is
    // also a pure function of the batch multiset, so the stored rows
    // hash-match the oracle), then the merged report: candidates with
    // lower-bound counts and the 0/1 `certain` column (est·(c+1) > n ⇒
    // guaranteed frequent without ever re-reading the stream)
    "sk_mg_incremental" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      def items(f: DataFrame) = f
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .select(when(col("doc_id") % 3 === 0, col("term"))
          .otherwise(concat(col("term"), lit("_"), col("doc_id")))
          .as("item"))
      val db = graft.store.Db(s, tempWarehouse())
      SketchStore.registerMg(db, items(docs.filter(col("doc_id") < mid)),
        col("item"), batchId = 0L)
      // fold between batches: a single batch's partial re-truncates as
      // the identity (≤ c rows ⇒ zero decrement), so the folded store's
      // final report equals the unfolded one — the SAME oracle SQL
      // verbatim is the losslessness proof
      SketchStore.foldMg(db)
      SketchStore.registerMg(db, items(docs.filter(col("doc_id") >= mid)),
        col("item"), batchId = 1L)
      SketchStore.storedHeavyHitters(db)
    },
    // fixed-grid histogram quantiles over per-document token counts —
    // the sequence-length distribution a packing/chunking stage keys
    // off. 1024 bins of width 8, pure integer arithmetic end to end:
    // the report says "the true qm-quantile lies in [lo, hi)" with rank
    // error 0, and the oracle replicates the identical algebra, so the
    // row hash-matches exactly like the rest of the sketch family.
    "sk_hist_quantiles" -> { (s, d) =>
      val docs = graft.core.Graft.rebalance(Graft.documents(s, d))
      Sketches.histQuantilesOf(docs,
        graft.ops.TextAnalysis.tokenCount(col("text")).cast("long"))
    },
    // per-source quantile envelopes — the fully distributed grouped
    // form (windows partitioned by group, no single-partition stage):
    // what a source-mix planner reads before setting packing lengths
    "sk_hist_by_source" -> { (s, d) =>
      val docs = graft.core.Graft.rebalance(Graft.documents(s, d))
      Sketches.histQuantilesBy(docs, col("source"),
          graft.ops.TextAnalysis.tokenCount(col("text")).cast("long"))
        .orderBy("grp", "qm")
    },
    // warehouse-backed running quantiles: two half-corpus batches
    // registered as ≤ b-row histogram partials with a fenced fold
    // between them; histogram merge is exact counter addition, so the
    // stored report must equal the one-shot sketch of the full stream —
    // the same oracle SQL verbatim.
    "sk_hist_incremental" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      def tc(f: DataFrame) = f.select(
        graft.ops.TextAnalysis.tokenCount(col("text")).cast("long").as("v"))
      val db = graft.store.Db(s, tempWarehouse())
      SketchStore.registerHist(db, tc(docs.filter(col("doc_id") < mid)),
        col("v"), batchId = 0L)
      SketchStore.foldHist(db)
      SketchStore.registerHist(db, tc(docs.filter(col("doc_id") >= mid)),
        col("v"), batchId = 1L)
      SketchStore.storedHistQuantiles(db)
    },
    // warehouse-backed GROUPED quantiles: per-source token-count
    // envelopes registered as two half-corpus batches of the grouped
    // hist store with a fold between them — merge is exact per
    // (grp, bin), so the stored report equals the one-shot grouped
    // sketch and shares sk_hist_by_source's oracle verbatim. This is
    // what `/_query/stats?by` serves.
    "sk_hist_grouped_store" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      def tc(f: DataFrame) = f.select(col("source"),
        graft.ops.TextAnalysis.tokenCount(col("text")).cast("long").as("v"))
      val db = graft.store.Db(s, tempWarehouse())
      SketchStore.registerHistBy(db, tc(docs.filter(col("doc_id") < mid)),
        col("source"), col("v"), batchId = 0L)
      SketchStore.foldHistBy(db)
      SketchStore.registerHistBy(db, tc(docs.filter(col("doc_id") >= mid)),
        col("source"), col("v"), batchId = 1L)
      SketchStore.storedHistQuantilesBy(db).orderBy("grp", "qm")
    },
    // warehouse-backed GROUPED distinct counts: per-source token
    // vocabulary registered as two half-corpus batches of the grouped
    // KMV store with a fold between them — by the union law each
    // group's merged sketch equals the one-shot sketch, so the report
    // is the one-shot grouped oracle (minus the exact column the store
    // never kept)
    "sk_kmv_grouped_store" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      def toks(f: DataFrame) = f.select(col("source"),
        explode(split(col("text"), " ")).as("token"))
      val db = graft.store.Db(s, tempWarehouse())
      SketchStore.registerKmvBy(db, toks(docs.filter(col("doc_id") < mid)),
        col("source"), col("token"))
      SketchStore.foldKmvBy(db)
      SketchStore.registerKmvBy(db, toks(docs.filter(col("doc_id") >= mid)),
        col("source"), col("token"))
      SketchStore.storedKmvEstimateBy(db)
    },
    // histogram grid evolution: batch 0 registers at the default w=8,
    // the store migrates in place to w=16 (exact re-bin — every old bin
    // maps whole into one new bin), batch 1 registers at the NEW grid —
    // and the report must equal the one-shot w=16 sketch of everything:
    // the BM25 v1→v2 migration device applied to the sketch family.
    "sk_hist_migrated" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      def tc(f: DataFrame) = f.select(
        graft.ops.TextAnalysis.tokenCount(col("text")).cast("long").as("v"))
      val db = graft.store.Db(s, tempWarehouse())
      SketchStore.registerHist(db, tc(docs.filter(col("doc_id") < mid)),
        col("v"), batchId = 0L)
      SketchStore.migrateHistGrid(db, newW = 16L)
      SketchStore.registerHist(db, tc(docs.filter(col("doc_id") >= mid)),
        col("v"), batchId = 1L, w = 16L)
      SketchStore.storedHistQuantiles(db)
    },
    // warehouse-backed GROUPED frequent items: per-source head+tail
    // token streams registered as two half-corpus batches of
    // deterministic per-group MG partials with an atomic fold between
    // them — each group's merged report carries its own mass and
    // certification, the exact relational algebra of the grouped twin
    // oracle. This closes the grouped family's fourth quadrant.
    "sk_mg_grouped_store" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      def items(f: DataFrame) = f
        .select(col("source"), col("doc_id"),
          explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .select(col("source"),
          when(col("doc_id") % 3 === 0, col("term"))
            .otherwise(concat(col("term"), lit("_"), col("doc_id")))
            .as("item"))
      val db = graft.store.Db(s, tempWarehouse())
      SketchStore.registerMgBy(db, items(docs.filter(col("doc_id") < mid)),
        col("source"), col("item"), batchId = 0L)
      SketchStore.foldMgBy(db)
      SketchStore.registerMgBy(db, items(docs.filter(col("doc_id") >= mid)),
        col("source"), col("item"), batchId = 1L)
      SketchStore.storedHeavyHittersBy(db)
    },
    // the GROUPED trio: per-source KMV minima + MG partials + grouped
    // histogram bins (the valueCol rider — token lengths) registered as
    // ONE transaction per batch under one grid claim (the sketchByWriter
    // micro-batch shape) with the one-supersede grouped fold between
    // batches — the per-group MG report must equal the standalone
    // grouped store's, so it shares the grouped twin oracle verbatim
    // (the hist family's trio==standalone identity is spec-pinned)
    "sk_trio_grouped" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      def items(f: DataFrame) = f
        .select(col("source"), col("doc_id"),
          explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .select(col("source"),
          when(col("doc_id") % 3 === 0, col("term"))
            .otherwise(concat(col("term"), lit("_"), col("doc_id")))
            .as("item"))
      val db = graft.store.Db(s, tempWarehouse())
      SketchStore.registerSketchesBy(db,
        items(docs.filter(col("doc_id") < mid)), col("source"),
        col("item"), batchId = 0L,
        valueCol = Some(length(col("item")).cast("long")))
      SketchStore.foldSketchesBy(db)
      SketchStore.registerSketchesBy(db,
        items(docs.filter(col("doc_id") >= mid)), col("source"),
        col("item"), batchId = 1L,
        valueCol = Some(length(col("item")).cast("long")))
      SketchStore.storedHeavyHittersBy(db)
    },
    // GROUPED grid evolution: the per-source store migrates in place
    // from w=8 to w=16 between two batches (per-group exact re-bin +
    // atomic histg.w flip), and the report must equal the one-shot
    // grouped w=16 sketch of everything — sk_hist_migrated's device
    // applied to the grouped store.
    "sk_histby_migrated" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      def tc(f: DataFrame) = f.select(col("source"),
        graft.ops.TextAnalysis.tokenCount(col("text")).cast("long").as("v"))
      val db = graft.store.Db(s, tempWarehouse())
      SketchStore.registerHistBy(db, tc(docs.filter(col("doc_id") < mid)),
        col("source"), col("v"), batchId = 0L)
      SketchStore.migrateHistGridBy(db, newW = 16L)
      SketchStore.registerHistBy(db, tc(docs.filter(col("doc_id") >= mid)),
        col("source"), col("v"), batchId = 1L, w = 16L)
      SketchStore.storedHistQuantilesBy(db).orderBy("grp", "qm")
    },
    // the single-tx trio registration (KMV + count-min + MG rows
    // unioned into ONE transaction — the streaming sketchWriter's
    // micro-batch shape) with the atomic all-family fold between
    // batches: the MG report must equal the standalone incremental
    // store's, i.e. the two-batch oracle verbatim — proof at the
    // driver gate that neither the union write nor the one-supersede
    // fold perturbs any family's rows
    "sk_trio_store" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      def items(f: DataFrame) = f
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .select(when(col("doc_id") % 3 === 0, col("term"))
          .otherwise(concat(col("term"), lit("_"), col("doc_id")))
          .as("item"))
      val db = graft.store.Db(s, tempWarehouse())
      // valueCol rider: token-length histogram bins ride the same
      // transaction + grid claim (the report below is MG's, unchanged —
      // hist trio==standalone identity is spec-pinned)
      SketchStore.registerSketches(db,
        items(docs.filter(col("doc_id") < mid)), col("item"), batchId = 0L,
        valueCol = Some(length(col("item")).cast("long")))
      SketchStore.foldSketches(db)
      // batch 1 commits through the FUSED claim-and-publish protocol
      // (one manifest commit) — the report must be byte-identical to the
      // claim-first batch 0's oracle, pinning the protocols' equivalence
      // at the driver gate
      SketchStore.registerSketches(db,
        items(docs.filter(col("doc_id") >= mid)), col("item"), batchId = 1L,
        valueCol = Some(length(col("item")).cast("long")), fuse = true)
      SketchStore.storedHeavyHitters(db)
    },
    "sk_countmin_incremental" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      def toks(f: DataFrame) =
        f.select(explode(split(col("text"), " ")).as("token"))
      val db = graft.store.Db(s, tempWarehouse())
      SketchStore.registerCountMin(db,
        toks(docs.filter(col("doc_id") < mid)), col("token"), batchId = 0L)
      SketchStore.foldCountMin(db)
      SketchStore.registerCountMin(db,
        toks(docs.filter(col("doc_id") >= mid)), col("token"), batchId = 1L)
      val top = toks(docs).groupBy("token")
        .agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("token")).limit(20)
      SketchStore.probeStoredCountMin(db, top, "token")
        .select(col("token"), col("n_exact"), col("est_cm"))
        .orderBy(col("n_exact").desc, col("token"))
    },
    // the geometry CLAIM under the oracle gate: a store registered at a
    // NON-default (d, w) is probed with no geometry arguments at all —
    // the probe reads (d=3, w=512) back off the manifest properties the
    // first registration claimed. A probe guessing the defaults would
    // hash into the wrong cells and hash-mismatch the (3, 512) oracle,
    // so this row pins read-back, not just the loud mismatch refusal
    // (SketchStoreSpec pins that).
    "sk_cm_geometry" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      def toks(f: DataFrame) =
        f.select(explode(split(col("text"), " ")).as("token"))
      val db = graft.store.Db(s, tempWarehouse())
      SketchStore.registerCountMin(db,
        toks(docs.filter(col("doc_id") < mid)), col("token"), batchId = 0L,
        d = 3, w = 512L)
      SketchStore.foldCountMin(db)
      SketchStore.registerCountMin(db,
        toks(docs.filter(col("doc_id") >= mid)), col("token"), batchId = 1L,
        d = 3, w = 512L)
      val top = toks(docs).groupBy("token")
        .agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("token")).limit(20)
      SketchStore.probeStoredCountMin(db, top, "token")
        .select(col("token"), col("n_exact"), col("est_cm"))
        .orderBy(col("n_exact").desc, col("token"))
    },
    // warehouse-backed GROUPED count-min: per-source counter grids
    // registered as two half-corpus batches with a fenced per-group fold
    // between them — counter addition is exact, so the stored grids
    // equal the one-shot per-group sketch of the whole corpus, probed by
    // each source's top-3 exact tokens. This closes the grouped family's
    // point-frequency quadrant (MG certifies heavy items; the grid
    // answers ANY item at the group's own error bound).
    "sk_cm_grouped_store" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      def toks(f: DataFrame) = f.select(col("source").as("grp"),
        explode(split(col("text"), " ")).as("token"))
      val db = graft.store.Db(s, tempWarehouse())
      SketchStore.registerCountMinBy(db, toks(docs.filter(col("doc_id") < mid)),
        col("grp"), col("token"), batchId = 0L)
      SketchStore.foldCountMinBy(db)
      SketchStore.registerCountMinBy(db,
        toks(docs.filter(col("doc_id") >= mid)), col("grp"), col("token"),
        batchId = 1L)
      val top = toks(docs).groupBy("grp", "token")
        .agg(count(lit(1)).as("n_exact"))
        .withColumn("rk", row_number().over(Window.partitionBy("grp")
          .orderBy(col("n_exact").desc, col("token"))))
        .filter(col("rk") <= 3).drop("rk")
      SketchStore.probeStoredCountMinBy(db, top, "grp", "token")
        .select(col("grp"), col("token"), col("n_exact"), col("est_cm"))
        .orderBy(col("grp"), col("n_exact").desc, col("token"))
    },
    // the GROUPED geometry claim under the oracle gate — the grouped
    // twin of sk_cm_geometry: per-source grids registered at a
    // NON-default (3, 512) cmg.* claim, then probed with no geometry
    // arguments at all. The probe reads (d, w) back off the manifest;
    // a defaults-guessing probe would hash every group's tokens into
    // the wrong cells and hash-mismatch the (3, 512) oracle.
    "sk_cmby_geometry" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      def toks(f: DataFrame) = f.select(col("source").as("grp"),
        explode(split(col("text"), " ")).as("token"))
      val db = graft.store.Db(s, tempWarehouse())
      SketchStore.registerCountMinBy(db, toks(docs.filter(col("doc_id") < mid)),
        col("grp"), col("token"), batchId = 0L, d = 3, w = 512L)
      SketchStore.foldCountMinBy(db)
      SketchStore.registerCountMinBy(db,
        toks(docs.filter(col("doc_id") >= mid)), col("grp"), col("token"),
        batchId = 1L, d = 3, w = 512L)
      val top = toks(docs).groupBy("grp", "token")
        .agg(count(lit(1)).as("n_exact"))
        .withColumn("rk", row_number().over(Window.partitionBy("grp")
          .orderBy(col("n_exact").desc, col("token"))))
        .filter(col("rk") <= 3).drop("rk")
      SketchStore.probeStoredCountMinBy(db, top, "grp", "token")
        .select(col("grp"), col("token"), col("n_exact"), col("est_cm"))
        .orderBy(col("grp"), col("n_exact").desc, col("token"))
    },
    // the grouped KMV geometry claim under the oracle gate — the
    // kmvg.k twin of sk_cmby_geometry: both batches register at a
    // NON-default k=32 (default 64), the report takes NO k argument and
    // reads the claim back off the manifest. A defaults-guessing report
    // would keep 64 minima per group and hash-mismatch the k=32 oracle
    // (the estimator is k / h_(k), so the kept-minima count IS the
    // answer's identity).
    "sk_kmvby_geometry" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      def toks(f: DataFrame) = f.select(col("source"),
        explode(split(col("text"), " ")).as("token"))
      val db = graft.store.Db(s, tempWarehouse())
      SketchStore.registerKmvBy(db, toks(docs.filter(col("doc_id") < mid)),
        col("source"), col("token"), k = 32)
      SketchStore.foldKmvBy(db)
      SketchStore.registerKmvBy(db, toks(docs.filter(col("doc_id") >= mid)),
        col("source"), col("token"), k = 32)
      SketchStore.storedKmvEstimateBy(db)
    },
    // the grouped MG geometry claim under the oracle gate — the mgg.c
    // twin: both batches truncate at a NON-default c=64 (default 128),
    // the report takes NO c argument and reads the claim back for its
    // per-group re-truncation and n/(c+1) certification threshold. A
    // defaults-guessing report would certify at the wrong threshold
    // and keep the wrong candidate tail — hash-mismatching the c=64
    // oracle.
    "sk_mgby_geometry" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      def items(f: DataFrame) = f
        .select(col("source"), col("doc_id"),
          explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .select(col("source"),
          when(col("doc_id") % 3 === 0, col("term"))
            .otherwise(concat(col("term"), lit("_"), col("doc_id")))
            .as("item"))
      val db = graft.store.Db(s, tempWarehouse())
      SketchStore.registerMgBy(db, items(docs.filter(col("doc_id") < mid)),
        col("source"), col("item"), batchId = 0L, c = 64)
      SketchStore.foldMgBy(db)
      SketchStore.registerMgBy(db, items(docs.filter(col("doc_id") >= mid)),
        col("source"), col("item"), batchId = 1L, c = 64)
      SketchStore.storedHeavyHittersBy(db)
    },
    // ── dedup family ──────────────────────────────────────────────────
    "dedup_exact" -> { (s, d) =>
      Dedup.exactGroups(Graft.documents(s, d), "doc_id", "text")
        .orderBy("content_hash")
    },
    // incremental dedup: first half of the corpus registers its content
    // fingerprints in a warehouse, then the second half drops whatever
    // content the store has seen — the steady-state ingest shape (store
    // scanned through a bloom probe of the batch, never shuffled)
    "dedup_incremental" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      val db = graft.store.Db(s, tempWarehouse())
      IncrementalDedup.registerBatch(db,
        docs.filter(col("doc_id") < mid), "doc_id", "text")
      // probe the WHOLE corpus: every first-half doc is registered
      // content and must drop — a silently no-op probe cannot pass
      IncrementalDedup.dropSeenBefore(db, docs, "doc_id", "text")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    },
    // incremental NEAR-dup: first half registers MinHash bands +
    // signatures in the warehouse's "m/" store, then the whole corpus
    // probes — a doc drops when it shares an LSH band with registered
    // content and ≥ minAgree of 8 signature positions agree (first-half
    // docs match themselves exactly; second-half docs drop only when
    // near-duplicate to the past). Store is bloom-scanned, never shuffled.
    "dedup_incremental_near" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val mid = docs.agg(floor(max(col("doc_id")) / 2).cast("long"))
        .head().getLong(0)
      val db = graft.store.Db(s, tempWarehouse())
      IncrementalDedup.registerNearBatch(db,
        docs.filter(col("doc_id") < mid), "doc_id", "text")
      IncrementalDedup.dropNearSeenBefore(db, docs, "doc_id", "text",
          minAgree = 4)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    },
    // the steady-state probe the incremental design exists for: the
    // fingerprint store (first half registered) is session-cached OUTSIDE
    // this query's timing — each invocation pays only the recurring
    // per-batch cost: bloom build + one store scan + broadcast anti-join
    // (dedup_incremental keeps measuring the full register+probe
    // lifecycle; same split as ann_ivf_pq_persisted vs probe_only)
    "dedup_incremental_probe" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val db = incStoreFor(s, d, near = false)
      IncrementalDedup.dropSeenBefore(db, docs, "doc_id", "text")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    },
    "dedup_incremental_near_probe" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val db = incStoreFor(s, d, near = true)
      IncrementalDedup.dropNearSeenBefore(db, docs, "doc_id", "text",
          minAgree = 4)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    },
    // CCNet/C4-style boilerplate removal: global line counts, then every
    // document rewritten with its corpus-repeated lines dropped — the
    // drop list broadcasts, the corpus never shuffles for the removal
    "dedup_lines" -> { (s, d) =>
      Dedup.lineDedup(Graft.documents(s, d), "doc_id", "text",
          width = 10, maxDup = 1)
        .orderBy("doc_id")
    },
    // the keep-set after exact dedup — the operator users actually run
    "dedup_keepset" -> { (s, d) =>
      Dedup.dropExactDuplicates(Graft.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    },
    "dedup_minhash_lsh" -> { (s, d) =>
      Dedup.minhashCandidates(Graft.documents(s, d), "doc_id", "text")
        .orderBy("id1", "id2")
    },
    "dedup_simhash" -> { (s, d) =>
      Dedup.simhashPairs(Graft.documents(s, d), "doc_id", "text")
        .select(col("id1"), col("id2"), col("dist").cast("long"))
        .orderBy("id1", "id2")
    },
    // the 100 TB fingerprint width: 60 portable bits, 4×15-bit chunks
    "dedup_simhash60" -> { (s, d) =>
      Dedup.simhashPairs(Graft.documents(s, d), "doc_id", "text", 3, 60)
        .select(col("id1"), col("id2"), col("dist").cast("long"))
        .orderBy("id1", "id2")
    },
    "dedup_ngram_jaccard" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val bucket = concat(col("lang"), lit("/"),
        (col("n_chars") / 50).cast("long").cast("string"))
      Dedup.jaccardPairs(docs, "doc_id", "text", bucket, 0.2)
        .orderBy("id1", "id2")
    },
    // ── similarity search ─────────────────────────────────────────────
    "knn_cosine" -> { (s, d) =>
      val emb = Graft.embeddings(s, d)
      Similarity.bruteForceKnn(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .select(col("query_id"), col("nn_id"), col("cos"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    "ann_lsh_bucket" -> { (s, d) =>
      val emb = Graft.embeddings(s, d)
      Similarity.lshBucketKnn(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .select(col("query_id"), col("nn_id"), col("cos"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    // PCA sufficient statistics (the cluster side of Pca.fit): exact
    // int64 Gram upper triangle + per-dim first moments on the veci
    // grid — one scan each, shuffles bounded by d(d+1)/2 and d cells
    "emb_gram" -> { (s, d) =>
      Pca.gramMatrix(Graft.embeddings(s, d), "embedding")
    },
    "emb_dim_stats" -> { (s, d) =>
      Pca.dimStats(Graft.embeddings(s, d), "embedding")
    },
    // contrastive-training data prep: per query, the most-similar
    // vectors of a DIFFERENT label (close-but-wrong = hard negative)
    "mine_hard_negatives" -> { (s, d) =>
      val emb = Graft.embeddings(s, d)
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", "label", 10)
        .select(col("query_id"), col("q_label"), col("nn_id"),
          col("nn_label"), col("cos"), col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    "ann_ivf" -> { (s, d) =>
      val emb = Graft.embeddings(s, d)
      Similarity.ivfKnn(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10, 16)
        .select(col("query_id"), col("nn_id"), col("cos"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    "dedup_embedding" -> { (s, d) =>
      Similarity.nearDupPairs(Graft.embeddings(s, d), "vec_id", "embedding",
          col("label"), 0.35)
        .orderBy("id1", "id2")
    },
    // SemDeDup (Abbas et al. 2023): cluster the embedding space, near-dup
    // pairs only within a cluster, keep the member farthest from its
    // centroid per duplicate group — the semantic twin of
    // dedup_cluster_keepset (map-only assign, cell-bounded pairs,
    // connected components, one anti-join)
    "dedup_semantic" -> { (s, d) =>
      Similarity.semDedupKeepset(Graft.embeddings(s, d), "vec_id",
          "embedding", 16, 0.35)
        .orderBy("vec_id")
    },
    // IVF probe over a Lloyd-trained codebook; the fixed-iteration
    // deterministic training unrolls into the SQL oracle (sqlIvfTrained)
    "ann_ivf_trained" -> { (s, d) =>
      val emb = Graft.embeddings(s, d)
      Similarity.ivfKnnTrained(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10, 16, 2)
        .select(col("query_id"), col("nn_id"), col("cos"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    // PQ/ADC: the corpus is searched through its product-quantization
    // codes only (raw vectors never touched at query time) — the
    // memory-bounded ANN shape for corpora whose vectors don't fit
    "ann_pq_adc" -> { (s, d) =>
      val emb = Graft.embeddings(s, d)
      Similarity.pqAdcKnn(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .select(col("query_id"), col("nn_id"), col("adist"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    // IVF + PQ composed (the FAISS IVFADC shape): coarse cell assignment
    // and PQ codes both as literal projections, probe own cell only
    "ann_ivf_pq" -> { (s, d) =>
      val emb = Graft.embeddings(s, d)
      Similarity.ivfPqKnn(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .select(col("query_id"), col("nn_id"), col("adist"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    // multi-probe IVF: the recall knob (nProbe=2) over the same inverted
    // file — query side fans out to its 2 best cells, corpus side unchanged
    "ann_ivf_probe" -> { (s, d) =>
      val emb = Graft.embeddings(s, d)
      Similarity.ivfKnnProbe(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10, 16, 2)
        .select(col("query_id"), col("nn_id"), col("cos"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    // SQ8 scalar quantization: corpus searched through its 8-bit codes
    // (asymmetric — queries exact), the 4×-compression/high-fidelity point
    "ann_sq8" -> { (s, d) =>
      val emb = Graft.embeddings(s, d)
      Similarity.sq8Knn(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .select(col("query_id"), col("nn_id"), col("adist"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    // ADC over a per-subspace-Lloyd-trained PQ codebook (vs ann_pq_adc's
    // first-k quantizer) — the deterministic training unrolls in SQL
    "ann_pq_trained" -> { (s, d) =>
      val emb = Graft.embeddings(s, d)
      Similarity.pqAdcKnnWith(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10, trainedArtifacts(s, d)._2)
        .select(col("query_id"), col("nn_id"), col("adist"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    // the persisted-index lifecycle: build the IVF+PQ index ONCE into a
    // real warehouse (cell-partitioned codes + reserved-cell train
    // artifacts), then answer the query purely from partition-pruned
    // index reads — value-identical to ann_ivf_pq's in-query build
    "ann_ivf_pq_persisted" -> { (s, d) =>
      import graft.store.Db
      val db = Db(s, tempWarehouse())
      val emb = Graft.embeddings(s, d)
      Similarity.buildIndex(db, emb, "vec_id", "embedding")
      Similarity.ivfPqProbePersisted(db, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .select(col("query_id"), col("nn_id"), col("adist"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    // index OBSERVABILITY: per-cell occupancy of the persisted codes —
    // the histogram behind the re-cell/retrain decision (the annyear
    // battery's finding: recall decay tracks cell occupancy, so skew
    // must be a readable number, not a guess). One key-pruned slim
    // scan, a ≤nCells-row aggregate.
    "ann_index_stats" -> { (s, d) =>
      import graft.store.Db
      val db = Db(s, tempWarehouse())
      Similarity.buildIndex(db, Graft.embeddings(s, d), "vec_id",
        "embedding")
      Similarity.indexCellStats(db).orderBy("cell")
    },
    // the steady-state number the persisted design exists for: the index
    // is built ONCE per session (outside this query's timing, after the
    // first invocation) and every invocation only probes it — partition-
    // pruned reads of the probed cells, zero corpus access, zero training
    "ann_ivf_pq_probe_only" -> { (s, d) =>
      val emb = Graft.embeddings(s, d)
      Similarity.ivfPqProbePersisted(annIndexFor(s, d),
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
        .select(col("query_id"), col("nn_id"), col("adist"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    // FAISS IndexRefineFlat over the persisted index: probe the
    // session-cached index for a 5× shortlist, then ONE broadcast join
    // back to the raw vectors re-ranks by exact cosine — recall@10 rises
    // to the shortlist's recall@50 for |Q|×50 exact distances, no second
    // corpus shuffle
    "ann_ivf_pq_refined" -> { (s, d) =>
      val emb = Graft.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 5)
      val cand = Similarity.ivfPqProbePersisted(annIndexFor(s, d), q,
        "vec_id", "embedding", REFINE_SHORTK)
      Similarity.refineTopK(emb, q, cand, "vec_id", "embedding", 10)
        .select(col("query_id"), col("nn_id"), col("cos"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    // the DISTRIBUTED batch-probe path: query set stays a DataFrame (no
    // literals, no collect) — cell join + relational ADC. Same oracle as
    // the literal probe because the two paths are value-identical
    "ann_ivf_pq_batch" -> { (s, d) =>
      val emb = Graft.embeddings(s, d)
      Similarity.ivfPqProbePersistedRelational(annIndexFor(s, d),
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
        .select(col("query_id"), col("nn_id"), col("adist"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    // FAISS's nprobe knob on the persisted index: each query scores its 2
    // best cells' candidates — 2/nCells of the codes instead of 1/nCells,
    // for the recall headroom (still one partition-pruned scan)
    "ann_ivf_pq_multiprobe" -> { (s, d) =>
      val emb = Graft.embeddings(s, d)
      Similarity.ivfPqProbePersisted(annIndexFor(s, d),
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", 10,
          nProbe = 2)
        .select(col("query_id"), col("nn_id"), col("adist"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    // incremental index maintenance (FAISS `add`): train + build on the
    // even half, then append the odd half encoded with the PERSISTED
    // quantizer — one map-only tx per batch, no retrain, no corpus
    // re-scan. The probe answers over all vectors; the oracle trains its
    // Lloyd chain on the even half only (trainPred)
    "ann_ivf_pq_append" -> { (s, d) =>
      import graft.store.Db
      val db = Db(s, tempWarehouse())
      val emb = Graft.embeddings(s, d)
      Similarity.buildIndex(db, emb.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding")
      Similarity.appendToIndex(db, emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding")
      Similarity.ivfPqProbePersisted(db, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .select(col("query_id"), col("nn_id"), col("adist"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    // the steady-state APPEND number the incremental design exists for:
    // the index (trained on the even half, odd half already appended) is
    // session-cached outside this query's timing — each invocation pays
    // only one small-batch encode-and-commit with the PERSISTED quantizer
    // (idempotent by last-wins: an unchanged vector re-encodes to the
    // same cell) plus the probe that proves the batch is searchable
    "ann_ivf_pq_append_only" -> { (s, d) =>
      val emb = Graft.embeddings(s, d)
      val db = boundDrift(annAppendIndexFor(s, d))
      Similarity.appendToIndex(db,
        emb.filter(col("vec_id") % 2 === 1 && col("vec_id") % 17 === 0),
        "vec_id", "embedding")
      Similarity.ivfPqProbePersisted(db, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .select(col("query_id"), col("nn_id"), col("adist"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    // the offline-k-means persisted index (SCALE.md's real-scale default):
    // buildIndex persists Lloyd-trained COARSE centroids — the probe is
    // quantizer-agnostic, so the only change vs ann_ivf_pq_persisted is
    // what cell structure the warehouse carries
    "ann_ivf_trained_persisted" -> { (s, d) =>
      import graft.store.Db
      val db = Db(s, tempWarehouse())
      val emb = Graft.embeddings(s, d)
      val (cents, cb, _) = trainedArtifacts(s, d)
      Similarity.buildIndex(db, emb, "vec_id", "embedding",
        codebook = Some(cb), coarse = Some(cents))
      Similarity.ivfPqProbePersisted(db, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .select(col("query_id"), col("nn_id"), col("adist"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    // the full FAISS IVFADC: PQ codes quantize the RESIDUAL from the
    // (Lloyd-trained) coarse centroid instead of the raw vector — same
    // index bytes, measurably higher recall (the codebook's resolution is
    // spent on what the coarse quantizer didn't explain). Same plan shape
    // as ann_ivf_pq: literal projections + one rank-limit window
    "ann_ivf_pq_residual" -> { (s, d) =>
      val emb = Graft.embeddings(s, d)
      val (cents, _, resCb) = trainedArtifacts(s, d)
      Similarity.ivfPqKnnResidual(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10, 16, coarse = Some(cents),
          codebook = Some(resCb))
        .select(col("query_id"), col("nn_id"), col("adist"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    // the persisted twin of ann_ivf_pq_residual (FAISS's on-disk default:
    // IndexIVFPQ persists by_residual): buildIndex stores the flag row, so
    // append and every probe encode/score residually without the caller
    // restating it — ResidualPersistedSpec pins probe == in-memory path
    "ann_ivf_pq_residual_persisted" -> { (s, d) =>
      import graft.store.Db
      val db = Db(s, tempWarehouse())
      val emb = Graft.embeddings(s, d)
      val (cents, _, resCb) = trainedArtifacts(s, d)
      Similarity.buildIndex(db, emb, "vec_id", "embedding",
        codebook = Some(resCb), coarse = Some(cents), byResidual = true)
      Similarity.ivfPqProbePersisted(db, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", 10)
        .select(col("query_id"), col("nn_id"), col("adist"),
          col("rank").cast("long"))
        .orderBy("query_id", "rank")
    },
    // SemDeDup over TRAINED clusters (the paper's setting — balanced
    // k-means cells, ~100k of them at corpus scale, keep the within-cell
    // quadratic pair space bounded): same plan as dedup_semantic, only
    // the centroids the broadcast quantizer carries change
    "dedup_semantic_trained" -> { (s, d) =>
      val emb = Graft.embeddings(s, d)
      Similarity.semDedupKeepset(emb, "vec_id", "embedding", 16, 0.35,
          Some(trainedArtifacts(s, d)._1))
        .orderBy("vec_id")
    },
    // recall@10 of every ANN variant against the exact kNN, with a 0/1
    // per-variant floor — the quality gate that keeps "approximate" honest
    "ann_recall" -> { (s, d) =>
      val emb = Graft.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 5)
      val exact = Similarity.bruteForceKnn(emb, q, "vec_id", "embedding", 10)
      val annRows = recallVariantFrames(emb, q, trainedArtifacts(s, d))
        .map { case (name, thr, df) =>
          Similarity.recallRow(name, df, exact, thr)
        }
      // pair-recall of LSH-bucketed near-dup detection: its exact set is
      // the full all-pairs sweep (lit(1) bucket = one global bucket —
      // oracle-gate only, never the scale path), not the kNN
      val lshPairs = Similarity
        .nearDupPairsAuto(emb, "vec_id", "embedding", 0.35)
        .select(col("id1").as("query_id"), col("id2").as("nn_id"))
      // parallel exact sweep (same rows as the lit(1)-bucket form, which
      // ran the whole quadratic pair space in one task — see
      // Similarity.nearDupPairsExact)
      val exactPairs = Similarity
        .nearDupPairsExact(emb, "vec_id", "embedding", 0.35)
        .select(col("id1").as("query_id"), col("id2").as("nn_id"))
      val pairRow = Similarity.recallRow("embedding_lsh", lshPairs,
        exactPairs, EMB_LSH_RECALL_FLOOR)
      (annRows :+ pairRow).reduce(_ unionByName _).orderBy("variant")
    },
    // ── sequence preparation (chunk / pack / mix) ─────────────────────
    // sliding-window token chunking: scan-speed explode, zero shuffle
    "tp_chunks" -> { (s, d) =>
      Sequencing.chunk(Graft.documents(s, d), "doc_id", "text", 32, 8)
        .orderBy("doc_id", "chunk_id")
    },
    // deterministic context-window packing: per-shard running sum cuts
    // hash-sharded docs into 256-token bins; parallelism = shards
    "tp_pack_bins" -> { (s, d) =>
      val docs = Graft.documents(s, d)
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
      Sequencing.packBins(docs, "doc_id", "n_tok", 256L, 8)
        .orderBy("shard", "bin")
    },
    // Lee et al. span REMOVAL (not just the tp_dup_spans measurement):
    // duplicated k-token windows keep their first occurrence, every
    // other document loses those positions; only affected docs rebuild
    "tp_scrub_spans" -> { (s, d) =>
      Dedup.scrubDupSpans(Graft.documents(s, d), "doc_id", "text", k = 8)
    },
    // intra-bin token offsets: the block-diagonal-attention metadata of
    // the packed layout — one extra window on the binned relation
    "tp_pack_offsets" -> { (s, d) =>
      val docs = Graft.documents(s, d)
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
      Sequencing.packOffsets(docs, "doc_id", "n_tok", 256L, 8)
    },
    // source-mixture reweighting: per-source totals + flatten-to-uniform
    // sampling weight, one tiny aggregation
    "tp_source_mix" -> { (s, d) =>
      Sequencing.sourceMix(Graft.documents(s, d), "source", "n_chars")
        .orderBy("source")
    },
    // temperature-scaled sampling probabilities (α=0.7 exponentiated
    // smoothing — upsamples small sources, the multilingual standard)
    "tp_source_mix_temp" -> { (s, d) =>
      Sequencing.sourceMixTemperature(Graft.documents(s, d), "source",
          "n_chars", 0.7)
        .orderBy("source")
    },
    // ── data selection: DSIR importance resampling + LM scoring ───────
    // importance weights against the doc_id % 7 target slice (hashed
    // 1+2-gram models, micro-quantized log-ratios — exact int sums)
    "sel_dsir_weights" -> { (s, d) =>
      Selection.importanceWeights(Graft.documents(s, d),
        Graft.documents(s, d).filter(col("doc_id") % 7 === 0),
        "doc_id", "text").orderBy("doc_id")
    },
    // Gumbel top-k resampling over those weights (deterministic hashed
    // noise — the engine-portable "sample ∝ weight" step)
    "sel_dsir_topk" -> { (s, d) =>
      Selection.dsirTopK(Graft.documents(s, d),
        Graft.documents(s, d).filter(col("doc_id") % 7 === 0),
        "doc_id", "text", 100)
        .orderBy(col("skey").desc, col("doc_id"))
    },
    // CCNet-style LM quality scoring: stupid-backoff bigram LM trained
    // on the doc_id % 7 = 3 slice scores every document's mean NLL
    "sel_lm_score" -> { (s, d) =>
      Selection.lmScore(Graft.documents(s, d),
        Graft.documents(s, d).filter(col("doc_id") % 7 === 3),
        "doc_id", "text").orderBy("doc_id")
    },
    // model-based quality filter: closed-form Naive Bayes over hashed
    // n-gram features, trained on curated-vs-raw seed slices, scores and
    // labels every document (the GPT-3/fastText filter shape)
    "sel_nb_score" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      Selection.nbScore(docs,
        docs.filter(col("doc_id") % 10 === 0),
        docs.filter(col("doc_id") % 10 === 5),
        "doc_id", "text").orderBy("doc_id")
    },
    // CCNet's head/middle/tail corpus split by LM perplexity rank
    "sel_lm_buckets" -> { (s, d) =>
      Selection.lmBuckets(Graft.documents(s, d),
        Graft.documents(s, d).filter(col("doc_id") % 7 === 3),
        "doc_id", "text").orderBy("doc_id")
    },
    // the map-only 100 TB bucketing default: fixed nll thresholds
    // instead of a global ntile sort — one projection, no
    // single-partition window ([[Selection.lmBucketsByThresholds]])
    "sel_lm_buckets_thresh" -> { (s, d) =>
      Selection.lmBucketsByThresholds(Graft.documents(s, d),
        Graft.documents(s, d).filter(col("doc_id") % 7 === 3),
        "doc_id", "text", Seq(3.45, 3.58)).orderBy("doc_id")
    },
    // the sketch→selection composition: tercile thresholds read off the
    // histogram sketch of the score distribution (mergeable, so at
    // 100 TB they come from the incremental store with no rescan),
    // bucketing stays one map-only projection
    "sel_lm_buckets_hist" -> { (s, d) =>
      Selection.lmBucketsByHist(Graft.documents(s, d),
        Graft.documents(s, d).filter(col("doc_id") % 7 === 3),
        "doc_id", "text").orderBy("doc_id")
    },
    // ── the capstone composition: corpus → training shards in ONE plan ─
    // [[graft.ops.Pipeline.corpusToShards]] — stages and scale notes
    // there; benchmark set = the held-out doc_id % 25 slice
    "tp_e2e_pipeline" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      Pipeline.corpusToShards(docs, docs.filter(col("doc_id") % 25 === 0))
        .orderBy("shard", "bin")
    },
    // the capstone WITH the data-selection stage: after cleaning, DSIR-
    // resample toward the src0 domain (30 docs — under the cleaned-corpus
    // size, so the stage genuinely cuts) before budgeting — the
    // full "clean → dedup → decontaminate → select → budget → pack" shape
    // of a production training-data pipeline, still one Catalyst plan
    "tp_e2e_selected" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      Pipeline.corpusToShards(docs, docs.filter(col("doc_id") % 25 === 0),
          dsirTargetPred = Some(col("source") === "src0"), dsirK = 30)
        .orderBy("shard", "bin")
    },
    // exact-substring duplicate spans (Lee et al. 2022): per-document
    // fraction of tokens inside a k-token window shared with another doc
    "tp_dup_spans" -> { (s, d) =>
      Dedup.dupSpanCoverage(Graft.documents(s, d), "doc_id", "text", k = 8)
        .orderBy("doc_id")
    },
    "dedup_embedding_lsh" -> { (s, d) =>
      Similarity.nearDupPairsAuto(Graft.embeddings(s, d), "vec_id",
          "embedding", 0.35)
        .orderBy("id1", "id2")
    },
    // the production composition: LSH candidates → exact-jaccard verify
    "dedup_verified" -> { (s, d) =>
      Dedup.verifiedNearDups(Graft.documents(s, d), "doc_id", "text", 0.4)
        .orderBy("id1", "id2")
    },
    // ── duplicate clusters (pairs → keep/drop decision) ───────────────
    "dedup_clusters" -> { (s, d) =>
      val cand = Dedup.minhashCandidates(Graft.documents(s, d), "doc_id", "text")
        .filter(col("est_jaccard") >= 0.5)
      Dedup.connectedComponents(cand).orderBy("id")
    },
    // the composition users actually run: cluster the near-dup evidence
    // and keep ONE document (min id) per cluster — candidates → connected
    // components → anti-join
    "dedup_cluster_keepset" -> { (s, d) =>
      val docs = Graft.documents(s, d)
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
        .filter(col("est_jaccard") >= 0.5)
      Dedup.dropNearDuplicates(docs, "doc_id", cand)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    },
    // the 100 TB wide-fingerprint setting: 64-bit simhash, 8 pigeonhole
    // chunks (hamming ≤ 7 ⟹ some chunk of 8 equal)
    "dedup_simhash64" -> { (s, d) =>
      Dedup.simhashPairs(Graft.documents(s, d), "doc_id", "text", 7, 64)
        .select(col("id1"), col("id2"), col("dist").cast("long"))
        .orderBy("id1", "id2")
    },
    // ── deterministic sampling / splits ───────────────────────────────
    "sa1_hash_sample" -> { (s, d) =>
      Sampling.hashSample(Graft.documents(s, d), "doc_id", 0.1)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    },
    "sa2_stratified" -> { (s, d) =>
      Sampling.stratifiedSample(Graft.documents(s, d), "lang", "doc_id", 20)
        .select(col("lang"), col("doc_id"), col("source"))
        .orderBy("lang", "doc_id")
    },
    "sa3_split_stats" -> { (s, d) =>
      Sampling.assignSplit(Graft.documents(s, d), "doc_id", 0.8, 0.1)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
        .orderBy("split")
    },
    // corpus mixing: a 5000-char budget of each language, hash-ordered —
    // the deterministic data-mixing step of corpus assembly
    "sa4_token_budget" -> { (s, d) =>
      Sampling.tokenBudget(Graft.documents(s, d), "lang", "doc_id",
          "n_chars", 5000L)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    },
    // deterministic pre-training shuffle: shard + within-shard position
    // as a pure function of the ids — reproducible on any engine/cluster
    "sa5_shuffle_shards" -> { (s, d) =>
      Sampling.shuffleShards(Graft.documents(s, d), "doc_id", 8)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("doc_id")
    },
    // weighted sampling without replacement (Efraimidis-Spirakis keys
    // on deterministic hash-uniforms): 50 docs weight-proportional to
    // n_chars — the quality-weighted subsampler uniform sa1 can't be
    "sa6_weighted_sample" -> { (s, d) =>
      Sampling.weightedSample(Graft.documents(s, d), "doc_id", "n_chars", 50)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    }
  )

  /** Recall@10 floor for the trained-coarse IVF+PQ variant (measured
    * 0.56 at sf0.01; pinned just under, above the first-N `ivf_probe`
    * 0.5 floor — see [[recallVariants]]).
    *
    * These floor constants MUST be declared before [[recallVariants]]:
    * that is a plain `val`, and a forward reference from its initializer
    * would silently read 0.0 (the Spark-side `pass` would then use a dead
    * floor while the DuckDB oracle, built by a `def` after object init,
    * used the real one).
    */
  private val IVF_PQ_COARSE_FLOOR = 0.55

  /** Recall@10 floor for the residual-encoded IVF+PQ (measured 0.54 at
    * sf0.01, pinned just under — see the [[recallVariants]] note on what
    * this floor does and does not guard).
    */
  private val RESIDUAL_FLOOR = 0.5

  /** Shortlist size the refine stage re-ranks (FAISS's `k_factor × k`:
    * 5× here). Bounded: the re-rank scores |Q|×REFINE_SHORTK exact pairs.
    */
  private val REFINE_SHORTK = 50

  /** Recall@10 floor for the exact-re-ranked IVF+PQ shortlist (measured
    * 0.74 at sf0.01; pinned just under, well above the unrefined
    * shortlist's 0.55 floor — see [[recallVariants]]).
    */
  private val REFINE_FLOOR = 0.7

  /** The ANN recall gates: (variant, recall@10 floor). Floors are pinned
    * just under the measured sf0.01 recall of each variant so a quality
    * regression flips `pass` on the Spark side only if it flips in DuckDB
    * too — i.e. a REAL recall change, not noise (the values are
    * deterministic, so any drift is a plan change). Plans are built by
    * [[recallVariantFrames]].
    */
  private val recallVariants: Seq[(String, Double)] = Seq(
    "ivf_probe" -> 0.5,
    // measured 0.02 at sf0.01 (single-bucket LSH trades recall for never
    // forming a pair space); the old 0.1 floor sat permanently at pass=0,
    // a gate that can't flip on a regression
    "lsh_bucket" -> 0.01,
    "pq_adc" -> 0.4,
    "pq_trained" -> 0.5,
    // measured 1.0 at sf0.01 — 8-bit scalar quantization barely perturbs
    // the ordering; anything under 0.9 is a real quality break
    "sq8" -> 0.9,
    // IVF+PQ with a Lloyd-trained COARSE quantizer (what
    // ann_ivf_trained_persisted stores) — the floor sits ABOVE ivf_probe's
    // first-N 0.5: balanced cells are the point of training the coarse
    // quantizer, and losing that edge is a real regression
    "ivf_pq_coarse_trained" -> IVF_PQ_COARSE_FLOOR,
    // residual-encoded IVF+PQ (FAISS by_residual): measured 0.54 at
    // sf0.01 — statistically the same as the raw-encoding 0.56 because
    // this corpus's recall is cell-coverage/metric-mismatch bound, NOT
    // quantization bound (ResidualPqSpec pins the 1.67× quantization-
    // error edge where it is measurable); the floor guards the path
    // against a broken residual join, not a quantization regression
    "ivf_pq_residual" -> RESIDUAL_FLOOR,
    // exact re-rank of the IVF+PQ shortlist (FAISS IndexRefineFlat):
    // measured 0.74 at sf0.01 vs the unrefined shortlist's 0.56 —
    // refinement recovers the ADC error inside the shortlist (the
    // residual gap is cell coverage, not quantization), and losing that
    // +0.18 edge is a broken re-rank join, not noise
    "ivf_pq_refined" -> REFINE_FLOOR
  )

  /** One plan per recall variant over the session-cached Lloyd artifacts
    * ([[trainedArtifacts]] — `pq_trained`, `ivf_pq_coarse_trained` and
    * the residual variant all train the IDENTICAL arrays, so sharing
    * cannot change any value).
    */
  private def recallVariantFrames(c: DataFrame, q: DataFrame,
                                  arts: (Array[Array[Long]],
                                    Array[Array[(Array[Long], Long)]],
                                    Array[Array[(Array[Long], Long)]]))
      : Seq[(String, Double, DataFrame)] = {
    val (coarse, cb, resCb) = arts
    def frame(name: String): DataFrame = name match {
      case "ivf_probe" =>
        Similarity.ivfKnnProbe(c, q, "vec_id", "embedding", 10, 16, 2)
      case "lsh_bucket" =>
        Similarity.lshBucketKnn(c, q, "vec_id", "embedding", 10)
      case "pq_adc" => Similarity.pqAdcKnn(c, q, "vec_id", "embedding", 10)
      case "pq_trained" =>
        Similarity.pqAdcKnnWith(c, q, "vec_id", "embedding", 10, cb)
      case "sq8" => Similarity.sq8Knn(c, q, "vec_id", "embedding", 10)
      case "ivf_pq_coarse_trained" =>
        Similarity.ivfPqKnnWith(c, q, "vec_id", "embedding", 10, cb,
          coarse = Some(coarse))
      case "ivf_pq_refined" =>
        Similarity.refineTopK(c, q,
          Similarity.ivfPqKnnWith(c, q, "vec_id", "embedding",
            REFINE_SHORTK, cb, coarse = Some(coarse)),
          "vec_id", "embedding", 10)
      case "ivf_pq_residual" =>
        Similarity.ivfPqKnnResidual(c, q, "vec_id", "embedding", 10, 16,
          coarse = Some(coarse), codebook = Some(resCb))
    }
    recallVariants.map { case (name, thr) => (name, thr, frame(name)) }
  }

  /** Pair-recall floor for LSH-bucketed embedding near-dup vs the exact
    * all-pairs sweep (measured 0.026 at sf0.01 — same-bucket-only pairing
    * over 16 hyperplane cells; pinned just under, like the
    * [[recallVariants]] floors).
    */
  private val EMB_LSH_RECALL_FLOOR = 0.02

  // ── generated DuckDB oracle SQL ─────────────────────────────────────

  private def sqlTokens = "string_split(text, ' ')"
  private def sqlNTokens = s"len($sqlTokens)"

  private def sqlWordRatio(words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"(CAST(len(list_filter($sqlTokens, t -> list_contains($arr, t))) AS DOUBLE) / $sqlNTokens)"
  }

  private def sqlAvgTokLen =
    s"(CAST(length(text) - $sqlNTokens + 1 AS DOUBLE) / $sqlNTokens)"

  private def sqlQuality: String = {
    val lenScore = s"least(CAST($sqlNTokens AS DOUBLE) / 64.0, 1.0)"
    val stopScore = s"least(${sqlWordRatio(TextAnalysis.englishStopwords)} * 5.0, 1.0)"
    val penalty = s"(CASE WHEN $sqlAvgTokLen > 12.0 THEN 0.5 ELSE 1.0 END)"
    s"round(($lenScore * 0.5 + $stopScore * 0.5) * $penalty, 6)"
  }

  private def sqlLangScore(lang: String) =
    s"round(${sqlWordRatio(TextAnalysis.langMarkers(lang))}, 6)"

  private def sqlLangPred: String = {
    // same left-fold argmax as TextAnalysis.langPredict (ties keep first)
    val langs = TextAnalysis.langMarkers.keys.toSeq.sorted
    langs.tail.foldLeft(s"'${langs.head}'" -> sqlLangScore(langs.head)) {
      case ((predSoFar, scoreSoFar), l) =>
        val s = sqlLangScore(l)
        (s"(CASE WHEN $s > $scoreSoFar THEN '$l' ELSE $predSoFar END)",
          s"greatest($s, $scoreSoFar)")
    }._1
  }

  private def sqlKnnExact: String =
    s"""WITH v AS (
       |  SELECT vec_id, ${Similarity.sqlVeci("embedding")} AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 5),
       |scored AS (
       |  SELECT query_id, c.vec_id AS nn_id,
       |         round(${Similarity.sqlCosine("qv", "c.v")}, 9) AS cos
       |  FROM q CROSS JOIN v c WHERE c.vec_id <> query_id)
       |SELECT query_id, nn_id, cos, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |            ORDER BY cos DESC, nn_id) AS rank
       |  FROM scored)
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  private def sqlAnnLsh: String =
    s"""WITH v AS (
       |  SELECT vec_id, ${Similarity.sqlVeci("embedding")} AS v FROM embeddings),
       |b AS (SELECT vec_id, v, ${Similarity.sqlLshBucket("v")} AS bucket FROM v),
       |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 5),
       |scored AS (
       |  SELECT query_id, c.vec_id AS nn_id,
       |         round(${Similarity.sqlCosine("qv", "c.v")}, 9) AS cos
       |  FROM q JOIN b c USING (bucket) WHERE c.vec_id <> query_id)
       |SELECT query_id, nn_id, cos, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |            ORDER BY cos DESC, nn_id) AS rank
       |  FROM scored)
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Oracle SQL per recall variant — the SAME builders the standalone
    * `ann_*` oracles use, so the recall gate inherits their exactness.
    */
  private def sqlRecallVariant(name: String): String = name match {
    case "ivf_probe" => Similarity.sqlIvfProbe(nCentroids = 16, nProbe = 2,
      k = 10, queryPred = "vec_id < 5")
    case "lsh_bucket" => sqlAnnLsh
    case "pq_adc" => Similarity.sqlPqAdc(10, "vec_id < 5")
    case "pq_trained" => Similarity.sqlPqAdcTrained(10, "vec_id < 5", iters = 2)
    case "sq8" => Similarity.sqlSq8(10, "vec_id < 5")
    case "ivf_pq_coarse_trained" =>
      Similarity.sqlIvfPqTrained(10, "vec_id < 5", coarseIters = 2)
    case "ivf_pq_refined" =>
      Similarity.sqlRefine(
        Similarity.sqlIvfPqTrained(REFINE_SHORTK, "vec_id < 5",
          coarseIters = 2), 10, "vec_id < 5")
    case "ivf_pq_residual" =>
      Similarity.sqlIvfPqResidual(10, "vec_id < 5", coarseIters = 2)
  }

  /** (query_id, nn_id) projections of the LSH-bucketed vs exact all-pairs
    * embedding near-dup sets — the `embedding_lsh` pair-recall gate.
    */
  private def sqlEmbLshPairs: String =
    s"""WITH v AS (
       |  SELECT vec_id AS id, ${Similarity.sqlVeci("embedding")} AS v
       |  FROM embeddings),
       |pre AS (SELECT id, v, ${Similarity.sqlLshBucket("v")} AS bucket FROM v)
       |SELECT l.id AS query_id, r.id AS nn_id
       |FROM pre l JOIN pre r ON l.bucket = r.bucket AND l.id < r.id
       |WHERE round(${Similarity.sqlCosine("l.v", "r.v")}, 9) >= 0.35""".stripMargin

  private def sqlEmbExactPairs: String =
    s"""WITH v AS (
       |  SELECT vec_id AS id, ${Similarity.sqlVeci("embedding")} AS v
       |  FROM embeddings)
       |SELECT l.id AS query_id, r.id AS nn_id
       |FROM v l JOIN v r ON l.id < r.id
       |WHERE round(${Similarity.sqlCosine("l.v", "r.v")}, 9) >= 0.35""".stripMargin

  private val minhashSigSql =
    Dedup.sqlMinhashSignature("sh")

  /** Shared CTE chain ending in `mpairs(id1, id2, sig1, sig2)` — the LSH
    * candidate pairs (used by both the pair query and the cluster query).
    * `src` parameterizes the corpus relation so compositions (the e2e
    * pipeline) can form pairs over a FILTERED corpus — pairing against
    * gate-rejected documents would drop the kept copy of a pair whose
    * canonical never ships.
    */
  private def minhashCtes: String = minhashCtesFrom("documents")

  /** Oracle for the incremental-dedup rows (lifecycle AND probe-only —
    * both produce the same result set; only what the timing covers
    * differs).
    */
  private def sqlIncrementalDedup: String =
    s"""WITH m AS (
       |  SELECT CAST(floor(max(doc_id) / 2.0) AS BIGINT) AS mid
       |  FROM documents)
       |SELECT d.doc_id, d.lang, d.n_chars
       |FROM documents d, m
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM documents e
       |  WHERE e.doc_id < m.mid
       |    AND ${PortableHash.sqlH60("e.text")} =
       |        ${PortableHash.sqlH60("d.text")})
       |ORDER BY doc_id""".stripMargin

  private def sqlIncrementalNearDedup: String =
    s"""WITH m AS (
       |  SELECT CAST(floor(max(doc_id) / 2.0) AS BIGINT) AS mid
       |  FROM documents),
       |shing AS (
       |  SELECT doc_id, ${Dedup.sqlShingleHashes("text")} AS sh
       |  FROM documents),
       |sigs AS (SELECT doc_id, $minhashSigSql AS sig FROM shing),
       |bands AS (${bandsUnion("sigs")}),
       |seenb AS (SELECT b.* FROM bands b, m WHERE b.doc_id < m.mid),
       |drops AS (
       |  SELECT DISTINCT l.doc_id AS did
       |  FROM bands l JOIN seenb r
       |    ON l.band = r.band AND l.band_key = r.band_key
       |  WHERE len(list_filter(range(${Dedup.MINHASH_K}),
       |          i -> l.sig[i+1] = r.sig[i+1])) >= 4)
       |SELECT d.doc_id, d.lang, d.n_chars
       |FROM documents d
       |WHERE NOT EXISTS (SELECT 1 FROM drops WHERE did = d.doc_id)
       |ORDER BY doc_id""".stripMargin

  private def minhashCtesFrom(src: String): String =
    s"""shing AS (
       |  SELECT doc_id, ${Dedup.sqlShingleHashes("text")} AS sh FROM $src),
       |sigs AS (SELECT doc_id, $minhashSigSql AS sig FROM shing),
       |bands AS (${bandsUnion("sigs")}),
       |mpairs AS (
       |  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2,
       |         l.sig AS sig1, r.sig AS sig2
       |  FROM bands l JOIN bands r
       |    ON l.band = r.band AND l.band_key = r.band_key
       |   AND l.doc_id < r.doc_id)""".stripMargin

  private def minhashEstSql: String =
    s"""(CAST(len(list_filter(range(${Dedup.MINHASH_K}),
       |     i -> sig1[i+1] = sig2[i+1])) AS DOUBLE) / ${Dedup.MINHASH_K})""".stripMargin

  private def bandsUnion(src: String): String =
    (0 until Dedup.MINHASH_K / Dedup.LSH_R).map { b =>
      val i = b * Dedup.LSH_R
      s"SELECT doc_id, sig, $b AS band, sig[${i + 1}] * $P + sig[${i + 2}] AS band_key FROM $src"
    }.mkString("\nUNION ALL ")

  private def simhashChunksUnion(src: String, width: Int = 8,
                                 chunks: Int = 4): String = {
    val mask = (1L << width) - 1
    (0 until chunks).map { c =>
      s"SELECT doc_id, sh, $c AS chunk, (sh >> ${c * width}) & $mask AS chunk_val FROM $src"
    }.mkString("\nUNION ALL ")
  }

  def oracleSql: Map[String, String] = Map(
    "text_profile" ->
      s"""SELECT doc_id, lang,
         |  $sqlNTokens AS n_tokens,
         |  len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9 ]')) AS n_subwords,
         |  round($sqlAvgTokLen, 6) AS avg_token_len,
         |  round(${sqlWordRatio(TextAnalysis.englishStopwords)}, 6) AS stopword_ratio,
         |  $sqlQuality AS quality,
         |  $sqlLangPred AS lang_pred,
         |  ${PortableHash.sqlH60("text")} AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_rolling_hash" ->
      s"""SELECT doc_id,
         |  list_reduce(
         |    list_prepend(0::BIGINT,
         |      list_transform(string_split(text, ''), c -> unicode(c)::BIGINT)),
         |    (h, c) -> (h * 31 + c) % $P) AS rhash
         |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frames" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |         octet_length(encode(text)) AS len,
        |         (doc_id % 30 + 1) * 1000 AS duration_ms
        |  FROM documents),
        |f AS (SELECT media_id, kind, unnest(range(4)) AS frame, len,
        |             duration_ms FROM m),
        |g AS (SELECT media_id, kind, frame,
        |             greatest(1, len // 4) AS slice_len,
        |             least(frame * greatest(1, len // 4),
        |                   greatest(0, len - 1)) AS start,
        |             len, duration_ms FROM f)
        |SELECT media_id, kind, CAST(frame AS BIGINT) AS frame,
        |       CAST(frame * greatest(1, duration_ms // 4) AS BIGINT) AS offset_ms,
        |       CAST(least(start + slice_len, len) - start AS BIGINT) AS frame_bytes
        |FROM g ORDER BY media_id, frame""".stripMargin,
    "ann_pq_adc" -> Similarity.sqlPqAdc(10, "vec_id < 5"),
    "ann_ivf_probe" -> Similarity.sqlIvfProbe(nCentroids = 16, nProbe = 2,
      k = 10, queryPred = "vec_id < 5"),
    "ann_sq8" -> Similarity.sqlSq8(10, "vec_id < 5"),
    "tp_chunks" ->
      s"""SELECT doc_id, chunk_id, start_tok, chunk_tokens
         |FROM ${Sequencing.sqlChunkFrom("documents", "doc_id", "text", 32, 8)} c
         |ORDER BY doc_id, chunk_id""".stripMargin,
    "tp_pack_bins" ->
      s"""SELECT shard, bin, n_docs, tokens, fill
         |FROM ${Sequencing.sqlPackBinsFrom("documents", "doc_id",
                  sqlNTokens, 256L, 8)} t
         |ORDER BY shard, bin""".stripMargin,
    "tp_pack_offsets" -> Sequencing.sqlPackOffsetsFrom("documents",
      "doc_id", sqlNTokens, 256L, 8),
    // the capstone pipeline: each CTE is the oracle of the corresponding
    // standalone row (clean/verified-dedup/decontaminate/budget/pack),
    // chained on the kept ids
    "tp_e2e_pipeline" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang, text, $sqlQuality AS quality,
         |         $sqlLangPred AS lang_pred
         |  FROM documents),
         |kept AS (
         |  SELECT * FROM scored WHERE quality >= 0.5 AND lang_pred = lang),
         |${minhashCtesFrom("kept")},
         |inter AS (
         |  SELECT id1, id2,
         |         len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS i,
         |         len(a.sh) AS sz1, len(b.sh) AS sz2
         |  FROM (SELECT id1, id2 FROM mpairs) c
         |  JOIN shing a ON a.doc_id = c.id1
         |  JOIN shing b ON b.doc_id = c.id2),
         |neardrop AS (
         |  SELECT DISTINCT id2 AS doc_id FROM inter
         |  WHERE round(CAST(i AS DOUBLE) / (sz1 + sz2 - i), 6) >= 0.4),
         |canon AS (
         |  SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
         |cg AS (
         |  SELECT doc_id, unnest(${Dedup.sqlShingleHashes("text", 3)}) AS g
         |  FROM kept),
         |bg AS (
         |  SELECT doc_id AS bench_id,
         |         unnest(${Dedup.sqlShingleHashes("text", 3)}) AS g
         |  FROM documents WHERE doc_id % 25 = 0),
         |contam AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT c.doc_id FROM cg c JOIN bg b USING (g)
         |    WHERE c.doc_id <> b.bench_id
         |    GROUP BY c.doc_id, b.bench_id HAVING count(*) >= 3)),
         |clean AS (
         |  SELECT k.doc_id, k.lang,
         |         CAST(len(string_split(k.text, ' ')) AS BIGINT) AS n_tok
         |  FROM kept k JOIN canon c ON k.doc_id = c.doc_id
         |  WHERE k.doc_id NOT IN (SELECT doc_id FROM neardrop)
         |    AND k.doc_id NOT IN (SELECT doc_id FROM contam)),
         |bud AS (
         |  SELECT doc_id, lang, n_tok
         |  FROM ${Sampling.sqlTokenBudgetFrom("clean", "lang", "doc_id",
                    "n_tok", 5000L)} t)
         |SELECT shard, bin, n_docs, tokens, fill
         |FROM ${Sequencing.sqlPackBinsFrom("bud", "doc_id", "n_tok",
                  256L, 8)} p
         |ORDER BY shard, bin""".stripMargin,
    // tp_e2e_pipeline + the DSIR selection CTE: cleantext keeps source +
    // text so the importance model can target `source = 'src0'`; sel is
    // the Gumbel-top-k keep set, applied before budgeting
    "tp_e2e_selected" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang, source, text, $sqlQuality AS quality,
         |         $sqlLangPred AS lang_pred
         |  FROM documents),
         |kept AS (
         |  SELECT * FROM scored WHERE quality >= 0.5 AND lang_pred = lang),
         |${minhashCtesFrom("kept")},
         |inter AS (
         |  SELECT id1, id2,
         |         len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS i,
         |         len(a.sh) AS sz1, len(b.sh) AS sz2
         |  FROM (SELECT id1, id2 FROM mpairs) c
         |  JOIN shing a ON a.doc_id = c.id1
         |  JOIN shing b ON b.doc_id = c.id2),
         |neardrop AS (
         |  SELECT DISTINCT id2 AS doc_id FROM inter
         |  WHERE round(CAST(i AS DOUBLE) / (sz1 + sz2 - i), 6) >= 0.4),
         |canon AS (
         |  SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
         |cg AS (
         |  SELECT doc_id, unnest(${Dedup.sqlShingleHashes("text", 3)}) AS g
         |  FROM kept),
         |bg AS (
         |  SELECT doc_id AS bench_id,
         |         unnest(${Dedup.sqlShingleHashes("text", 3)}) AS g
         |  FROM documents WHERE doc_id % 25 = 0),
         |contam AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT c.doc_id FROM cg c JOIN bg b USING (g)
         |    WHERE c.doc_id <> b.bench_id
         |    GROUP BY c.doc_id, b.bench_id HAVING count(*) >= 3)),
         |cleantext AS (
         |  SELECT k.doc_id, k.lang, k.source, k.text
         |  FROM kept k JOIN canon c ON k.doc_id = c.doc_id
         |  WHERE k.doc_id NOT IN (SELECT doc_id FROM neardrop)
         |    AND k.doc_id NOT IN (SELECT doc_id FROM contam)),
         |sel AS (
         |  SELECT doc_id FROM ${Selection.sqlDsirTopKFrom("cleantext",
                    "doc_id", "text", "source = 'src0'", 30)} q),
         |clean AS (
         |  SELECT c.doc_id, c.lang,
         |         CAST(len(string_split(c.text, ' ')) AS BIGINT) AS n_tok
         |  FROM cleantext c JOIN sel s ON c.doc_id = s.doc_id),
         |bud AS (
         |  SELECT doc_id, lang, n_tok
         |  FROM ${Sampling.sqlTokenBudgetFrom("clean", "lang", "doc_id",
                    "n_tok", 5000L)} t)
         |SELECT shard, bin, n_docs, tokens, fill
         |FROM ${Sequencing.sqlPackBinsFrom("bud", "doc_id", "n_tok",
                  256L, 8)} p
         |ORDER BY shard, bin""".stripMargin,
    "tp_source_mix" ->
      s"""SELECT source, n_docs, tokens, weight
         |FROM ${Sequencing.sqlSourceMixFrom("documents", "source", "n_chars")} s
         |ORDER BY source""".stripMargin,
    "tp_source_mix_temp" ->
      s"""SELECT source, n_docs, tokens, p_raw, p_temp
         |FROM ${Sequencing.sqlSourceMixTemperatureFrom("documents", "source",
                  "n_chars", 0.7)} s
         |ORDER BY source""".stripMargin,
    "sel_dsir_weights" ->
      s"""SELECT doc_id, n_feats, weight
         |FROM ${Selection.sqlImportanceWeightsFrom("documents", "doc_id",
                  "text", "doc_id % 7 = 0")} w
         |ORDER BY doc_id""".stripMargin,
    "sel_dsir_topk" ->
      s"""SELECT doc_id, weight, skey
         |FROM ${Selection.sqlDsirTopKFrom("documents", "doc_id", "text",
                  "doc_id % 7 = 0", 100)} t
         |ORDER BY skey DESC, doc_id""".stripMargin,
    "sel_lm_score" ->
      s"""SELECT doc_id, n_trans, nll
         |FROM ${Selection.sqlLmScoreFrom("documents", "doc_id", "text",
                  "doc_id % 7 = 3")} l
         |ORDER BY doc_id""".stripMargin,
    "sel_nb_score" ->
      s"""SELECT doc_id, n_feats, nb_score, nb_label
         |FROM ${Selection.sqlNbScoreFrom("documents", "doc_id", "text",
                  "doc_id % 10 = 0", "doc_id % 10 = 5")} nb
         |ORDER BY doc_id""".stripMargin,
    "sel_lm_buckets" ->
      s"""SELECT doc_id, n_trans, nll, bucket
         |FROM ${Selection.sqlLmBucketsFrom("documents", "doc_id", "text",
                  "doc_id % 7 = 3")} b
         |ORDER BY doc_id""".stripMargin,
    "sel_lm_buckets_thresh" ->
      s"""SELECT doc_id, n_trans, nll,
         |       CAST(1 + len(list_filter([3.45, 3.58], t -> nll > t))
         |         AS BIGINT) AS bucket
         |FROM ${Selection.sqlLmScoreFrom("documents", "doc_id", "text",
                  "doc_id % 7 = 3")} l
         |WHERE n_trans > 0
         |ORDER BY doc_id""".stripMargin,
    "sel_lm_buckets_hist" ->
      s"""SELECT doc_id, n_trans, nll, bucket
         |FROM ${Selection.sqlLmBucketsByHistFrom("documents", "doc_id",
                  "text", "doc_id % 7 = 3")} h
         |ORDER BY doc_id""".stripMargin,
    "ann_ivf_pq" -> Similarity.sqlIvfPq(10, "vec_id < 5"),
    // the persisted probe is value-identical to an in-query IVF+PQ over
    // the TRAINED codebook (buildIndex persists pqTrainedCodebook)
    "ann_ivf_pq_persisted" -> Similarity.sqlIvfPqTrained(10, "vec_id < 5"),
    "ann_index_stats" -> Similarity.sqlIndexCellStats(),
    "ann_ivf_pq_probe_only" -> Similarity.sqlIvfPqTrained(10, "vec_id < 5"),
    "ann_ivf_pq_multiprobe" -> Similarity.sqlIvfPqTrained(10, "vec_id < 5",
      nProbe = 2),
    // the refined row probes the same session-cached index (trained
    // codebook, first-N coarse) at REFINE_SHORTK, then re-ranks exactly
    "ann_ivf_pq_refined" -> Similarity.sqlRefine(
      Similarity.sqlIvfPqTrained(REFINE_SHORTK, "vec_id < 5"), 10,
      "vec_id < 5"),
    "ann_ivf_pq_batch" -> Similarity.sqlIvfPqTrained(10, "vec_id < 5"),
    "ann_ivf_pq_append" -> Similarity.sqlIvfPqTrained(10, "vec_id < 5",
      trainPred = "vec_id % 2 = 0"),
    // same value as the full lifecycle row: the cached index holds the
    // identical train artifacts, and the per-invocation batch re-append
    // is idempotent under last-wins
    "ann_ivf_pq_append_only" -> Similarity.sqlIvfPqTrained(10, "vec_id < 5",
      trainPred = "vec_id % 2 = 0"),
    "ann_ivf_trained_persisted" -> Similarity.sqlIvfPqTrained(10,
      "vec_id < 5", coarseIters = 2),
    "ann_ivf_pq_residual" -> Similarity.sqlIvfPqResidual(10, "vec_id < 5",
      coarseIters = 2),
    // value-identical to the in-memory residual row (same train
    // artifacts persisted; ResidualPersistedSpec pins the equality)
    "ann_ivf_pq_residual_persisted" -> Similarity.sqlIvfPqResidual(10,
      "vec_id < 5", coarseIters = 2),
    "dedup_semantic_trained" -> Similarity.sqlSemDedup(16, 0.35,
      coarseIters = 2),
    "ann_pq_trained" -> Similarity.sqlPqAdcTrained(10, "vec_id < 5", iters = 2),
    "ann_recall" ->
      ((recallVariants.map { case (name, thr) =>
        Similarity.sqlRecallRow(name, sqlRecallVariant(name), sqlKnnExact, thr)
      } :+ Similarity.sqlRecallRow("embedding_lsh", sqlEmbLshPairs,
        sqlEmbExactPairs, EMB_LSH_RECALL_FLOOR))
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY variant")),
    "tp_dup_spans" -> Dedup.sqlDupSpanCoverage(8),
    "tp_scrub_spans" -> Dedup.sqlScrubDupSpans(8),
    "tp_decontaminate" ->
      Decontaminate.sqlOverlaps("doc_id % 25 = 0", n = 3, minOverlap = 3),
    // the bloom variant is exact by construction — same oracle
    "tp_decontaminate_bloom" ->
      Decontaminate.sqlOverlaps("doc_id % 25 = 0", n = 3, minOverlap = 3),
    "tp_pii_scrub" ->
      s"""WITH planted AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 2 = 0
         |           THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
         |                || '@example.com or 555-123-4567 or 10.0.0.'
         |                || CAST(doc_id % 256 AS VARCHAR)
         |           ELSE text END AS t
         |  FROM documents)
         |SELECT doc_id,
         |       CAST(${TextAnalysis.sqlPiiCount("t")} AS BIGINT) AS n_pii,
         |       md5(${TextAnalysis.sqlPiiScrub("t")}) AS scrub_hash
         |FROM planted ORDER BY doc_id""".stripMargin,
    "tp_repetition" -> TextAnalysis.sqlRepetition,
    "tp_gram_df" -> TextAnalysis.sqlGramDocFreqScore(),
    "tp_vocab_topk" -> TextAnalysis.sqlVocabTopK(20),
    "tp_bpe_pairs" -> TextAnalysis.sqlPairTopK(20),
    "ret_bm25" -> Retrieval.sqlBm25(bm25Queries, 10),
    "ret_bm25_probe_only" -> Retrieval.sqlBm25(bm25Queries, 10),
    "ret_bm25_incremental" -> Retrieval.sqlBm25(bm25Queries, 10),
    "ret_bm25_append_only" -> Retrieval.sqlBm25(bm25Queries, 10),
    "ret_bm25_lifecycle" -> Retrieval.sqlBm25(bm25Queries, 10),
    "ret_bm25_migrated" -> Retrieval.sqlBm25(bm25Queries, 10),
    "ret_bm25_batch" -> Retrieval.sqlBm25From(
      "SELECT doc_id AS query_id, text AS qtext FROM documents " +
        "WHERE doc_id < 16", 10),
    "ret_hybrid_recall" -> Retrieval.sqlHybridRecall(
      s"""SELECT query_id, doc_id, rank
         |FROM (${Retrieval.sqlBm25(bm25Queries, 2000000000)}) lx"""
        .stripMargin,
      s"""SELECT query_id, nn_id AS doc_id, rank FROM (
         |WITH v AS (
         |  SELECT vec_id, ${Similarity.sqlVeci("embedding")} AS v
         |  FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 5),
         |scored AS (
         |  SELECT query_id, c.vec_id AS nn_id,
         |         round(${Similarity.sqlCosine("qv", "c.v")}, 9) AS cos
         |  FROM q CROSS JOIN v c WHERE c.vec_id <> query_id)
         |SELECT query_id, nn_id, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |            ORDER BY cos DESC, nn_id) AS rank
         |  FROM scored)) dn""".stripMargin,
      k = 10, cutK = 100),
    "ret_hybrid_probe_only" -> Retrieval.sqlRrfFuse(
      Retrieval.sqlBm25(bm25Queries, 20),
      s"""SELECT query_id, nn_id AS doc_id, rank
         |FROM (${Similarity.sqlIvfPqTrained(20, "vec_id < 5")}) t"""
        .stripMargin,
      10),
    "ret_hybrid_rrf" -> Retrieval.sqlRrfFuse(
      Retrieval.sqlBm25(bm25Queries, 20),
      s"""WITH v AS (
         |  SELECT vec_id, ${Similarity.sqlVeci("embedding")} AS v
         |  FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 5),
         |scored AS (
         |  SELECT query_id, c.vec_id AS doc_id,
         |         round(${Similarity.sqlCosine("qv", "c.v")}, 9) AS cos
         |  FROM q CROSS JOIN v c WHERE c.vec_id <> query_id)
         |SELECT query_id, doc_id, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |            ORDER BY cos DESC, doc_id) AS rank
         |  FROM scored)
         |WHERE rank <= 20""".stripMargin,
      10),
    "tp_bpe_learn" -> TextAnalysis.sqlBpeLearn(6),
    "tp_bpe_encode" -> TextAnalysis.sqlBpeEncode(6),
    "sk_kmv_distinct" -> Sketches.sqlKmvTokensBySource(),
    "sk_countmin" -> Sketches.sqlCountMinTokens(20),
    "sk_heavy_hitters" -> Sketches.sqlHeavyHittersTokens(),
    "sk_mg_incremental" -> SketchStore.sqlMgIncrementalTokens(),
    // the trio store's MG report is the SAME two-batch algebra — the
    // union write and one-supersede fold must be invisible to it
    "sk_trio_store" -> SketchStore.sqlMgIncrementalTokens(),
    "sk_mg_grouped_store" -> SketchStore.sqlMgGroupedTokens(),
    // the grouped trio's MG report is the same grouped two-batch
    // algebra — the union write and one-supersede fold are invisible
    "sk_trio_grouped" -> SketchStore.sqlMgGroupedTokens(),
    "sk_hist_quantiles" -> Sketches.sqlHistTokenCounts(),
    "sk_hist_by_source" -> Sketches.sqlHistTokenCountsBySource(),
    // the grouped STORE must equal the one-shot grouped sketch — exact
    // per-(grp, bin) counter merge — so it shares the oracle verbatim
    "sk_hist_grouped_store" -> Sketches.sqlHistTokenCountsBySource(),
    "sk_hist_incremental" -> Sketches.sqlHistTokenCounts(),
    // the migrated store must equal the one-shot sketch AT THE NEW GRID
    "sk_hist_migrated" -> Sketches.sqlHistTokenCounts(w = 16L),
    "sk_histby_migrated" -> Sketches.sqlHistTokenCountsBySource(w = 16L),
    "sk_kmv_incremental" -> Sketches.sqlKmvTokensGlobal(),
    "sk_kmv_grouped_store" -> SketchStore.sqlKmvBySourceStore(),
    "sk_countmin_incremental" -> Sketches.sqlCountMinTokens(20),
    // the same estimator stated at the row's NON-default claimed
    // geometry — the oracle twin is parameterized by the exact (d, w)
    // the store claims and the probe must read back
    "sk_cm_geometry" -> Sketches.sqlCountMinTokens(20, d = 3, w = 512L),
    // the grouped grid store must equal the one-shot per-group sketch
    // (counter addition is exact through registration AND fold)
    "sk_cm_grouped_store" -> SketchStore.sqlCountMinGroupedTokens(3),
    "sk_cmby_geometry" ->
      SketchStore.sqlCountMinGroupedTokens(3, d = 3, w = 512L),
    // the grouped KMV/MG stores at their rows' NON-default claimed
    // geometry — each oracle twin is parameterized by the exact k/c the
    // store claims and the report must read back
    "sk_kmvby_geometry" -> SketchStore.sqlKmvBySourceStore(k = 32),
    "sk_mgby_geometry" -> SketchStore.sqlMgGroupedTokens(c = 64),
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id,
        |       count(*) AS n_dups
        |FROM documents GROUP BY content_hash ORDER BY content_hash""".stripMargin,
    "dedup_lines" -> Dedup.sqlLineDedup(width = 10, maxDup = 1),
    "dedup_incremental" -> sqlIncrementalDedup,
    // the probe-only rows are value-identical to the lifecycle rows (the
    // session-cached store registers the same first half) — same oracle
    "dedup_incremental_probe" -> sqlIncrementalDedup,
    "dedup_incremental_near" -> sqlIncrementalNearDedup,
    "dedup_incremental_near_probe" -> sqlIncrementalNearDedup,
    "dedup_minhash_lsh" ->
      s"""WITH $minhashCtes
         |SELECT id1, id2, $minhashEstSql AS est_jaccard
         |FROM mpairs ORDER BY id1, id2""".stripMargin,
    "dedup_verified" ->
      s"""WITH $minhashCtes,
         |inter AS (
         |  SELECT id1, id2,
         |         len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS i,
         |         len(a.sh) AS sz1, len(b.sh) AS sz2
         |  FROM (SELECT id1, id2 FROM mpairs) c
         |  JOIN shing a ON a.doc_id = c.id1
         |  JOIN shing b ON b.doc_id = c.id2)
         |SELECT id1, id2,
         |       round(CAST(i AS DOUBLE) / (sz1 + sz2 - i), 6) AS jaccard
         |FROM inter
         |WHERE round(CAST(i AS DOUBLE) / (sz1 + sz2 - i), 6) >= 0.4
         |ORDER BY id1, id2""".stripMargin,
    "dedup_clusters" ->
      s"""WITH RECURSIVE $minhashCtes,
         |cand AS (SELECT id1, id2 FROM mpairs WHERE $minhashEstSql >= 0.5),
         |edges AS (SELECT id1 AS a, id2 AS b FROM cand
         |          UNION ALL SELECT id2, id1 FROM cand),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT rr.id, e.b FROM reach rr JOIN edges e ON e.a = rr.r)
         |SELECT id, CAST(min(r) AS BIGINT) AS comp
         |FROM reach GROUP BY id ORDER BY id""".stripMargin,
    "dedup_cluster_keepset" ->
      s"""WITH RECURSIVE $minhashCtes,
         |cand AS (SELECT id1, id2 FROM mpairs WHERE $minhashEstSql >= 0.5),
         |edges AS (SELECT id1 AS a, id2 AS b FROM cand
         |          UNION ALL SELECT id2, id1 FROM cand),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT rr.id, e.b FROM reach rr JOIN edges e ON e.a = rr.r),
         |comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id)
         |SELECT doc_id, lang, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> comp)
         |ORDER BY doc_id""".stripMargin,
    "dedup_simhash64" ->
      s"""WITH hs AS (
         |  SELECT doc_id, ${Dedup.sqlTokenHashes("text")} AS _hs FROM documents),
         |sh AS (
         |  SELECT doc_id, ${Dedup.sqlSimhashTerms("_hs", 64)} AS sh FROM hs),
         |chunked AS (${simhashChunksUnion("sh", 8, 8)}),
         |pairs AS (
         |  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2,
         |         bit_count(xor(l.sh, r.sh)) AS dist
         |  FROM chunked l JOIN chunked r
         |    ON l.chunk = r.chunk AND l.chunk_val = r.chunk_val
         |   AND l.doc_id < r.doc_id)
         |SELECT id1, id2, CAST(dist AS BIGINT) AS dist FROM pairs
         |WHERE dist <= 7 ORDER BY id1, id2""".stripMargin,
    "sa1_hash_sample" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE ${Sampling.sqlHashSamplePred("doc_id", 0.1)}
         |ORDER BY doc_id""".stripMargin,
    "sa2_stratified" ->
      s"""SELECT lang, doc_id, source FROM (
         |  SELECT lang, doc_id, source,
         |         row_number() OVER (PARTITION BY lang
         |           ORDER BY ${Sampling.sqlHashBucket("doc_id")}, doc_id) AS rk
         |  FROM documents)
         |WHERE rk <= 20 ORDER BY lang, doc_id""".stripMargin,
    "sa3_split_stats" ->
      s"""SELECT ${Sampling.sqlAssignSplit("doc_id", 0.8, 0.1)} AS split,
         |       count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
         |FROM documents GROUP BY split ORDER BY split""".stripMargin,
    "sa4_token_budget" ->
      s"""SELECT doc_id, lang, n_chars
         |FROM ${Sampling.sqlTokenBudgetFrom("documents", "lang", "doc_id",
                 "n_chars", 5000L)} t
         |ORDER BY doc_id""".stripMargin,
    "sa5_shuffle_shards" ->
      s"""SELECT doc_id, shard, pos
         |FROM ${Sampling.sqlShuffleShardsFrom("documents", "doc_id", 8)} t
         |ORDER BY doc_id""".stripMargin,
    "sa6_weighted_sample" ->
      s"""SELECT doc_id, lang, n_chars
         |FROM ${Sampling.sqlWeightedSampleFrom("documents", "doc_id",
                  "n_chars", 50)} t
         |ORDER BY doc_id""".stripMargin,
    "dedup_simhash" ->
      s"""WITH hs AS (
         |  SELECT doc_id, ${Dedup.sqlTokenHashes("text")} AS _hs FROM documents),
         |sh AS (
         |  SELECT doc_id, ${Dedup.sqlSimhashTerms("_hs")} AS sh FROM hs),
         |chunked AS (${simhashChunksUnion("sh")}),
         |pairs AS (
         |  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2,
         |         bit_count(xor(l.sh, r.sh)) AS dist
         |  FROM chunked l JOIN chunked r
         |    ON l.chunk = r.chunk AND l.chunk_val = r.chunk_val
         |   AND l.doc_id < r.doc_id)
         |SELECT id1, id2, CAST(dist AS BIGINT) AS dist FROM pairs
         |WHERE dist <= 3 ORDER BY id1, id2""".stripMargin,
    "tp_clean_corpus" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang, text, $sqlQuality AS quality,
         |         $sqlLangPred AS lang_pred
         |  FROM documents),
         |kept AS (
         |  SELECT * FROM scored WHERE quality >= 0.5 AND lang_pred = lang),
         |canon AS (
         |  SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text))
         |SELECT k.doc_id, k.lang, k.quality
         |FROM kept k JOIN canon c ON k.doc_id = c.doc_id
         |ORDER BY k.doc_id""".stripMargin,
    "dedup_keepset" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id IN (
        |  SELECT min(doc_id) FROM documents GROUP BY md5(text))
        |ORDER BY doc_id""".stripMargin,
    "dedup_simhash60" ->
      s"""WITH hs AS (
         |  SELECT doc_id, ${Dedup.sqlTokenHashes("text")} AS _hs FROM documents),
         |sh AS (
         |  SELECT doc_id, ${Dedup.sqlSimhashTerms("_hs", 60)} AS sh FROM hs),
         |chunked AS (${simhashChunksUnion("sh", 15)}),
         |pairs AS (
         |  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2,
         |         bit_count(xor(l.sh, r.sh)) AS dist
         |  FROM chunked l JOIN chunked r
         |    ON l.chunk = r.chunk AND l.chunk_val = r.chunk_val
         |   AND l.doc_id < r.doc_id)
         |SELECT id1, id2, CAST(dist AS BIGINT) AS dist FROM pairs
         |WHERE dist <= 3 ORDER BY id1, id2""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH pre AS (
         |  SELECT doc_id AS id,
         |         lang || '/' || CAST(n_chars // 50 AS VARCHAR) AS bucket,
         |         ${Dedup.sqlShingleHashes("text")} AS sh
         |  FROM documents)
         |SELECT id1, id2, jaccard FROM (
         |  SELECT l.id AS id1, r.id AS id2,
         |    round(CAST(len(list_filter(l.sh, x -> list_contains(r.sh, x))) AS DOUBLE)
         |          / (len(l.sh) + len(r.sh)
         |             - len(list_filter(l.sh, x -> list_contains(r.sh, x)))), 6)
         |      AS jaccard
         |  FROM pre l JOIN pre r ON l.bucket = r.bucket AND l.id < r.id)
         |WHERE jaccard >= 0.2 ORDER BY id1, id2""".stripMargin,
    "knn_cosine" -> sqlKnnExact,
    "emb_gram" -> Pca.sqlGramMatrix(),
    "emb_dim_stats" -> Pca.sqlDimStats(),
    "mine_hard_negatives" ->
      s"""WITH v AS (
         |  SELECT vec_id, CAST(label AS BIGINT) AS label,
         |         ${Similarity.sqlVeci("embedding")} AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, label AS q_label, v AS qv
         |      FROM v WHERE vec_id < 5),
         |scored AS (
         |  SELECT query_id, q_label, c.vec_id AS nn_id,
         |         c.label AS nn_label,
         |         round(${Similarity.sqlCosine("qv", "c.v")}, 9) AS cos
         |  FROM q CROSS JOIN v c
         |  WHERE c.vec_id <> query_id AND c.label <> q_label)
         |SELECT query_id, q_label, nn_id, nn_label, cos, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |            ORDER BY cos DESC, nn_id) AS rank
         |  FROM scored)
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "ann_lsh_bucket" -> sqlAnnLsh,
    "ann_ivf" -> {
      val cosAssign = Similarity.sqlCosineGuardedParts(
        Similarity.sqlDotInt("vn.v", "c.cv"), "vn.n2", "c.cn")
      val cosScore = Similarity.sqlCosineGuardedParts(
        Similarity.sqlDotInt("qv", "a.v"), "qn", "a.n2")
      s"""WITH v AS (
         |  SELECT vec_id, ${Similarity.sqlVeci("embedding")} AS v FROM embeddings),
         |vn AS (SELECT vec_id, v,
         |       ${Similarity.sqlDotInt("v", "v")} AS n2 FROM v),
         |c AS (SELECT vec_id AS centroid_id, v AS cv, n2 AS cn FROM vn
         |      WHERE vec_id < 16),
         |assign AS (
         |  SELECT vec_id, v, n2, centroid_id FROM (
         |    SELECT vn.vec_id, vn.v, vn.n2, c.centroid_id,
         |           row_number() OVER (PARTITION BY vn.vec_id
         |             ORDER BY round($cosAssign, 9) DESC, c.centroid_id) AS rn
         |    FROM vn CROSS JOIN c)
         |  WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, v AS qv, n2 AS qn, centroid_id
         |      FROM assign WHERE vec_id < 5),
         |scored AS (
         |  SELECT query_id, a.vec_id AS nn_id, round($cosScore, 9) AS cos
         |  FROM q JOIN assign a USING (centroid_id)
         |  WHERE a.vec_id <> query_id)
         |SELECT query_id, nn_id, cos, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |            ORDER BY cos DESC, nn_id) AS rank
         |  FROM scored)
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    },
    // the Lloyd loop is deterministic with fixed iters → unrolled in SQL
    "ann_ivf_trained" ->
      Similarity.sqlIvfTrained(nCentroids = 16, iters = 2, k = 10,
        queryPred = "vec_id < 5"),
    "dedup_embedding" ->
      s"""WITH pre AS (
         |  SELECT vec_id AS id, label AS bucket,
         |         ${Similarity.sqlVeci("embedding")} AS v
         |  FROM embeddings)
         |SELECT id1, id2, cos FROM (
         |  SELECT l.id AS id1, r.id AS id2,
         |         round(${Similarity.sqlCosine("l.v", "r.v")}, 9) AS cos
         |  FROM pre l JOIN pre r ON l.bucket = r.bucket AND l.id < r.id)
         |WHERE cos >= 0.35 ORDER BY id1, id2""".stripMargin,
    "dedup_semantic" -> Similarity.sqlSemDedup(16, 0.35),
    "dedup_embedding_lsh" ->
      s"""WITH v AS (
         |  SELECT vec_id AS id, ${Similarity.sqlVeci("embedding")} AS v
         |  FROM embeddings),
         |pre AS (SELECT id, v, ${Similarity.sqlLshBucket("v")} AS bucket FROM v)
         |SELECT id1, id2, cos FROM (
         |  SELECT l.id AS id1, r.id AS id2,
         |         round(${Similarity.sqlCosine("l.v", "r.v")}, 9) AS cos
         |  FROM pre l JOIN pre r ON l.bucket = r.bucket AND l.id < r.id)
         |WHERE cos >= 0.35 ORDER BY id1, id2""".stripMargin
  )
}
