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
