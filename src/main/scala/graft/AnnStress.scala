package graft

import org.apache.spark.sql.functions._
import graft.core.Graft
import graft.ops.{Sampling, Similarity}

/** Persisted-ANN-index lifecycle at synthetic scale — the numbers behind
  * SCALE.md's index entry (the driver's embeddings table is 500 rows at
  * sf0.01; this generates hundreds of thousands of clustered vectors to
  * show build-once/probe-many holds as the corpus grows).
  *
  * Corpus: 64-dim vectors in `id % 1024` clusters — each component is a
  * deterministic hash of (cluster, dim) plus a smaller per-id
  * perturbation, so cells are meaningful and every run is reproducible.
  * The quantizer trains on a 5% hash-sample (how FAISS trains on real
  * corpora — training cost must not scale with the corpus), then:
  * build = full-corpus encode + one tx; append = 1% batch encode + one
  * tx; probes at nProbe 1/2/4 over 64 queries.
  */
object AnnStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    // arg 2: cell count — 256 default; 4096 is the realistic-at-100TB
    // setting (probe must stay partition-pruned with no planning cliff)
    val nCells = args.lift(1).map(_.toInt).getOrElse(256)
    val spark = Graft.localSession(
      Runtime.getRuntime.availableProcessors().min(32), 32)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.store.Db

    def gen(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        ((pmod(hash(pmod(col("id"), lit(1024L)), i), lit(2001)) - 1000)
          .cast("double") / 1000.0 +
         (pmod(hash(col("id"), i), lit(201)) - 100).cast("double") / 1000.0)
          .cast("float")).as("embedding"))

    val corpus = gen(spark.range(n).toDF("id")).localCheckpoint(true)
    val appendBatch = gen(spark.range(n, n + n / 100).toDF("id"))
      .localCheckpoint(true)
    val queries = gen(spark.range(0, 64 * 997, 997).toDF("id"))
      .localCheckpoint(true)

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val out = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"ANNSTRESS $name%-28s ${secs}%8.2f s")
      out
    }

    val wh = java.nio.file.Files.createTempDirectory("graft-annstress")
    val db = Db(spark, wh.toString)

    val cb = timed(s"train PQ codebook (5% sample)") {
      Similarity.pqTrainedCodebook(
        Sampling.hashSample(corpus, "vec_id", 0.05), "vec_id", "embedding")
    }
    timed(s"buildIndex ($n vecs, $nCells cells)") {
      Similarity.buildIndex(db, corpus, "vec_id", "embedding",
        nCells = nCells, codebook = Some(cb))
    }
    timed(s"appendToIndex (${n / 100} vecs)") {
      Similarity.appendToIndex(db, appendBatch, "vec_id", "embedding")
    }
    for (nProbe <- Seq(1, 2, 4)) {
      timed(f"probe 64 queries, nProbe=$nProbe") {
        Similarity.ivfPqProbePersisted(db, queries, "vec_id", "embedding",
          topK = 10, nProbe = nProbe).count()
      }
    }
    timed("brute-force kNN (64 queries)") {
      Similarity.bruteForceKnn(corpus, queries, "vec_id", "embedding", 10)
        .count()
    }

    // raw vs residual encoding at the same index bytes: recall@10 against
    // exact kNN, identical coarse quantizer (sample-trained k-means) and
    // codebook budget — the FAISS by_residual A/B at corpus scale
    {
      val sample = Sampling.hashSample(corpus, "vec_id", 0.05)
      val cents = timed("train coarse k-means (5% sample)") {
        Similarity.collectKmeansCentroids(sample, "vec_id", "embedding",
          nCells.min(64), 2)
      }
      val resCb = timed("train residual codebook (5% sample)") {
        Similarity.residualCodebook(sample, "vec_id", "embedding", cents)
      }
      val exact = Similarity
        .bruteForceKnn(corpus, queries, "vec_id", "embedding", 10)
        .select("query_id", "nn_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(df: org.apache.spark.sql.DataFrame): Double = {
        val got = df.select("query_id", "nn_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (got & exact).size.toDouble / exact.size
      }
      for (nProbe <- Seq(1, 2)) {
        val raw = timed(f"raw IVF+PQ probe, nProbe=$nProbe") {
          recall(Similarity.ivfPqKnnWith(corpus, queries, "vec_id",
            "embedding", 10, cb, nCells.min(64), nProbe = nProbe,
            coarse = Some(cents)))
        }
        val res = timed(f"residual IVF+PQ probe, nProbe=$nProbe") {
          recall(Similarity.ivfPqKnnResidual(corpus, queries, "vec_id",
            "embedding", 10, nCells.min(64), nProbe = nProbe,
            coarse = Some(cents), codebook = Some(resCb)))
        }
        println(f"ANNSTRESS recall@10 nProbe=$nProbe raw=$raw%.3f residual=$res%.3f")
      }
      // the production composition: ADC shortlist (5× k) + exact re-rank.
      // Dense same-cluster candidates make top-10 ADC ordering tie-bound;
      // what refine inherits is SHORTLIST quality, where the residual
      // codes' lower quantization error is the measurable edge
      for (nProbe <- Seq(1, 2)) {
        val rawR = timed(f"raw shortlist(50)+refine, nProbe=$nProbe") {
          recall(Similarity.refineTopK(corpus, queries,
            Similarity.ivfPqKnnWith(corpus, queries, "vec_id", "embedding",
              50, cb, nCells.min(64), nProbe = nProbe, coarse = Some(cents)),
            "vec_id", "embedding", 10))
        }
        val resR = timed(f"residual shortlist(50)+refine, nProbe=$nProbe") {
          recall(Similarity.refineTopK(corpus, queries,
            Similarity.ivfPqKnnResidual(corpus, queries, "vec_id",
              "embedding", 50, nCells.min(64), nProbe = nProbe,
              coarse = Some(cents), codebook = Some(resCb)),
            "vec_id", "embedding", 10))
        }
        println(f"ANNSTRESS refined recall@10 nProbe=$nProbe raw=$rawR%.3f residual=$resR%.3f")
      }
      // OPQ-lite: product-quantize the PCA-ROTATED coordinates (pure
      // rotation, norms preserved → the true neighbor set is identical)
      // so the m-way subspace split aligns with variance directions —
      // same coarse/codebook budget as the raw arm above
      val rotModel = timed("PCA full-rank fit (5% sample)") {
        graft.ops.Pca.fit(sample, "embedding", 64)
      }
      val rotC = graft.ops.Pca.rotate(corpus, "embedding", rotModel)
        .select(col("vec_id"), col("pca").as("embedding"))
        .localCheckpoint(true)
      val rotQ = graft.ops.Pca.rotate(queries, "embedding", rotModel)
        .select(col("vec_id"), col("pca").as("embedding"))
        .localCheckpoint(true)
      val rotSample = Sampling.hashSample(rotC, "vec_id", 0.05)
      val rotCents = Similarity.collectKmeansCentroids(rotSample, "vec_id",
        "embedding", nCells.min(64), 2)
      val rotCb = Similarity.pqTrainedCodebook(rotSample, "vec_id",
        "embedding")
      for (nProbe <- Seq(1, 2)) {
        val opq = timed(f"OPQ-rotated IVF+PQ probe, nProbe=$nProbe") {
          recall(Similarity.ivfPqKnnWith(rotC, rotQ, "vec_id", "embedding",
            10, rotCb, nCells.min(64), nProbe = nProbe,
            coarse = Some(rotCents)))
        }
        println(f"ANNSTRESS OPQ recall@10 nProbe=$nProbe rotated=$opq%.3f")
      }
    }
    // PCA-16 pre-reduction: fit on the 5% sample (one moments scan +
    // 64×64 driver solve), project corpus+queries map-only, search in
    // the reduced space — recall against full-space exact shows what
    // 4× fewer dims costs, and the projected brute force shows the
    // speedup it buys
    {
      val model = timed("PCA fit r=16 (5% sample)") {
        graft.ops.Pca.fit(Sampling.hashSample(corpus, "vec_id", 0.05),
          "embedding", 16)
      }
      val projC = timed("PCA project corpus (map-only)") {
        val p = graft.ops.Pca.project(corpus, "embedding", model)
          .select(col("vec_id"), col("pca").as("embedding"))
          .localCheckpoint(true)
        p.count(); p
      }
      val projQ = graft.ops.Pca.project(queries, "embedding", model)
        .select(col("vec_id"), col("pca").as("embedding"))
        .localCheckpoint(true)
      val exact = Similarity
        .bruteForceKnn(corpus, queries, "vec_id", "embedding", 10)
        .select("query_id", "nn_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = timed("brute kNN in PCA-16 space") {
        Similarity.bruteForceKnn(projC, projQ, "vec_id", "embedding", 10)
          .select("query_id", "nn_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      println(f"ANNSTRESS PCA-16 recall@10 ${(got & exact).size.toDouble / exact.size}%.3f  (isotropic corpus: variance spread over all 64 dims — PCA's worst case, kept as the honest floor)")
    }
    // the regime PCA is FOR: rank-8 data (x = U·z + noise) — the top-16
    // components capture ~everything, so reduced-space search matches
    // full-space results at a quarter of the dimensions
    {
      val rnd = new scala.util.Random(7)
      val uFlat = Seq.fill(64 * 8)(rnd.nextGaussian() * 0.1)
      def genLowRank(ids: org.apache.spark.sql.DataFrame) = ids.select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), i => {
          val z = transform(sequence(lit(0), lit(7)), r =>
            (pmod(hash(col("id"), r), lit(2001)) - 1000).cast("double")
              / 1000.0)
          (aggregate(
            zip_with(z, slice(typedLit(uFlat), i * 8 + 1, lit(8)),
              (zr, ur) => zr * ur),
            lit(0.0d), (acc, x) => acc + x)
            + (pmod(hash(col("id"), i, lit(99)), lit(201)) - 100)
              .cast("double") / 20000.0).cast("float")
        }).as("embedding"))
      val lrCorpus = genLowRank(spark.range(n).toDF("id")).localCheckpoint(true)
      val lrQueries = genLowRank(spark.range(0, 64 * 997, 997).toDF("id"))
        .localCheckpoint(true)
      val lrModel = timed("PCA fit r=16 (low-rank corpus)") {
        graft.ops.Pca.fit(Sampling.hashSample(lrCorpus, "vec_id", 0.05),
          "embedding", 16)
      }
      val projC = graft.ops.Pca.project(lrCorpus, "embedding", lrModel)
        .select(col("vec_id"), col("pca").as("embedding")).localCheckpoint(true)
      val projQ = graft.ops.Pca.project(lrQueries, "embedding", lrModel)
        .select(col("vec_id"), col("pca").as("embedding")).localCheckpoint(true)
      val exact = Similarity
        .bruteForceKnn(lrCorpus, lrQueries, "vec_id", "embedding", 10)
        .select("query_id", "nn_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = timed("brute kNN in PCA-16 (low-rank)") {
        Similarity.bruteForceKnn(projC, projQ, "vec_id", "embedding", 10)
          .select("query_id", "nn_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      println(f"ANNSTRESS PCA-16 low-rank recall@10 ${(got & exact).size.toDouble / exact.size}%.3f")
    }
    // hard-negative mining at corpus scale: label = the generating
    // cluster, so negatives are near-cluster vectors of another cluster
    // — same broadcast+scan shape as brute kNN plus the label filter
    timed("hard negatives (64 queries)") {
      val labeled = corpus.withColumn("label", pmod(col("vec_id"), lit(1024L)))
      Similarity.hardNegatives(labeled,
        labeled.filter(col("vec_id") % 997 === 0 && col("vec_id") < 64 * 997),
        "vec_id", "embedding", "label", 10).count()
    }
    // the batch path: 10k queries as a DataFrame — 10× past the literal
    // path's cap, no literals, no collect
    val batch = gen(spark.range(0, 10000).toDF("id")).localCheckpoint(true)
    timed("relational probe (10k queries)") {
      Similarity.ivfPqProbePersistedRelational(db, batch, "vec_id",
        "embedding", topK = 10).count()
    }

    // index footprint vs raw corpus: the ~20× compression claim
    def dirBytes(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum
      finally s.close()
    }
    println(f"ANNSTRESS index bytes/vec ${dirBytes(wh).toDouble / n}%8.1f")

    import java.util.Comparator
    java.nio.file.Files.walk(wh).sorted(Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    spark.stop()
  }
}
