package graft

import org.apache.spark.sql.functions._
import graft.core.Graft
import graft.ops.{Decontaminate, Dedup, Sampling, TextAnalysis}

/** Pipeline-operator throughput at synthetic scale — the dedup-family
  * numbers behind SCALE.md (the driver's documents table is 5k rows at
  * sf0.1; this generates hundreds of thousands with a controlled
  * duplicate rate to show the designs hold as data grows).
  *
  * Corpus: 40-word documents — 39 Murmur3-mixed words from a `base` seed
  * plus one doc-unique tail word. Every 50th document reuses its
  * predecessor's base (39/40 words shared → a near-duplicate), every
  * 971st reuses base 0 (one growing boilerplate-style near-dup cluster,
  * the degenerate-bucket case the LSH cap guards).
  */
object PipelineStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = Graft.localSession(
      Runtime.getRuntime.availableProcessors().min(32), 32)
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      when(col("id") % 971 === 0, lit(0L))
        .when(col("id") % 50 === 0, col("id") - 1)
        .otherwise(col("id")).as("base"))
      .select(col("doc_id"), concat_ws(" ",
        concat(
          transform(sequence(lit(0), lit(38)),
            i => concat(lit("w"), pmod(hash(col("base"), i), lit(997)))),
          array(concat(lit("t"), pmod(hash(col("doc_id")), lit(9973)))))
      ).as("text"))
      .localCheckpoint(true) // materialize: time operators, not generation

    def timed[A](name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PSTRESS $name%-26s ${secs}%8.2f s  ${n / secs / 1e6}%6.2f M docs/s  (out=$out)")
    }

    timed("exact groups")(
      Dedup.exactGroups(docs, "doc_id", "text").count())
    timed("minhash candidates")(
      Dedup.minhashCandidates(docs, "doc_id", "text").count())
    timed("minhash capped(1000)")(
      Dedup.minhashCandidates(docs, "doc_id", "text",
        maxBucket = Some(1000)).count())
    timed("simhash pairs")(
      Dedup.simhashPairs(docs, "doc_id", "text").count())
    timed("clusters (capped cands)") {
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text",
        maxBucket = Some(1000)).filter(col("est_jaccard") >= 0.5)
      Dedup.connectedComponents(cand).count()
    }
    timed("hash sample 10%")(
      Sampling.hashSample(docs, "doc_id", 0.1).count())
    timed("split assign")(
      Sampling.assignSplit(docs, "doc_id", 0.8, 0.1)
        .groupBy("split").count().count())
    timed("repetition ratios")(
      TextAnalysis.repetition(docs)
        .agg(count(lit(1))).as[Long](spark.implicits.newLongEncoder).head())
    timed("decontaminate (1k bench)") {
      // broadcast inverted index: bench = 1000 docs drawn from the corpus
      Decontaminate.overlaps(docs,
        docs.filter(col("doc_id") % math.max(1L, n / 1000) === 0),
          "doc_id", "text", "doc_id", "text", minOverlap = 3)
        .filter(col("doc_id") =!= col("bench_id")).count()
    }
    timed("token budget mix")(
      Sampling.tokenBudget(
        docs.withColumn("w", length(col("text"))).withColumn("stratum",
          pmod(col("doc_id"), lit(8))),
        "stratum", "doc_id", "w", (n / 8) * 30).count())
    timed("dup spans k=8")(
      Dedup.dupSpanCoverage(docs, "doc_id", "text", k = 8)
        .agg(sum("dup_windows")).as[Long](spark.implicits.newLongEncoder)
        .head())

    // synthetic embeddings (64-dim from hash mixing, values in [-0.5, 0.5))
    // for the PQ family: codes + full-ADC ranking for 5 probe vectors
    val embs = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        (pmod(hash(col("id"), i), lit(1000)).cast("float") / 1000f) - 0.5f)
        .as("embedding"))
      .localCheckpoint(true)
    timed("pq adc top10 (5 probes)")(
      graft.ops.Similarity.pqAdcKnn(embs,
        embs.filter(col("vec_id") < 5), "vec_id", "embedding", 10).count())
    timed("ivf-pq top10 (5 probes)")(
      graft.ops.Similarity.ivfPqKnn(embs,
        embs.filter(col("vec_id") < 5), "vec_id", "embedding", 10).count())

    spark.stop()
  }
}
