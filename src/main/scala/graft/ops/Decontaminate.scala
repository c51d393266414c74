package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — a training-data pipeline staple the
  * reference has no analog for: before training, drop (or flag) corpus
  * documents that share enough word n-grams with an evaluation/benchmark
  * set, so test data can't leak into the training corpus.
  *
  * Formulation: inverted-index equi-join on distinct shingle hashes
  * ([[Dedup.shingleHashes]] — already `array_distinct` per document), so
  * the per-(doc, bench) match count IS the distinct n-gram overlap.
  * Never a doc × bench product: the join fans out only where an n-gram
  * actually co-occurs. Same sub-quadratic shape as the n-gram Jaccard
  * dedup, which survives 100 TB corpora; the benchmark side is typically
  * tiny but nothing here requires it to be.
  */
object Decontaminate {

  /** (doc_id, bench_id, overlap) for every corpus document sharing at
    * least `minOverlap` distinct `n`-gram shingles with a benchmark item.
    *
    * The benchmark side is broadcast EXPLICITLY: an eval set is megabytes
    * against a corpus of terabytes, and broadcasting its exploded
    * shingles means the corpus side — the expensive explode of every
    * document's n-grams — is never shuffled for the join. Only the
    * matched (doc_id, bench_id) pairs move for the final count.
    */
  def overlaps(corpus: DataFrame, bench: DataFrame,
               idCol: String, textCol: String,
               benchIdCol: String, benchTextCol: String,
               n: Int = 3, minOverlap: Int = 3,
               hintBroadcast: Boolean = true): DataFrame = {
    val c = graft.core.Graft.rebalance(corpus)
      .select(col(idCol).as("doc_id"),
        explode(Dedup.shingleHashes(col(textCol), n)).as("g"))
    val b = bench
      .select(col(benchIdCol).as("bench_id"),
        explode(Dedup.shingleHashes(col(benchTextCol), n)).as("g"))
    c.join(if (hintBroadcast) broadcast(b) else b, "g")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  /** [[overlaps]] with a bloom-filter prefilter on the corpus side — same
    * exact result (the bloom has no false negatives and the exact join
    * removes its false positives), different 100 TB cost profile.
    *
    * The broadcast-hash-join in [[overlaps]] already avoids shuffling the
    * corpus, but every exploded corpus shingle still PROBES the hash
    * relation and carries its row through the join operator. Here a
    * [[graft.functions.BloomMightContain]] probe — a codegen'd bit-array
    * test, orders of magnitude cheaper than a hash-relation probe with
    * row copy — drops ~all non-matching shingles at scan speed first: with
    * sparse contamination (the normal case: an eval set leaks into a tiny
    * fraction of a corpus) the join sees `matches + fpp × |corpus grams|`
    * rows instead of all of them. This is also the shape that survives a
    * bench side too big to broadcast (a 10^8-item bloom is ~100 MB at 1%
    * fpp where the exploded relation is many GB): the join can degrade to
    * sort-merge while the prefilter still kills the corpus-side volume.
    *
    * `expectedItems` sizes the filter; when absent, one count job on the
    * (small) bench side measures it exactly.
    */
  def overlapsBloom(corpus: DataFrame, bench: DataFrame,
                    idCol: String, textCol: String,
                    benchIdCol: String, benchTextCol: String,
                    n: Int = 3, minOverlap: Int = 3,
                    fpp: Double = 0.01,
                    expectedItems: Option[Long] = None,
                    hintBroadcast: Boolean = true): DataFrame = {
    // pinned: the shingled bench side feeds three consumers (count job,
    // bloom build, the overlap join) — unpinned it re-shingled per
    // consumer (guide §5). Query-shaped pin, backstop-released.
    val b = graft.core.Graft.pin(bench
      .select(col(benchIdCol).as("bench_id"),
        explode(Dedup.shingleHashes(col(benchTextCol), n)).as("g")))
    val nItems = expectedItems.getOrElse(b.count())
    val bloom = b.stat.bloomFilter("g", math.max(nItems, 64L), fpp)
    val c = graft.core.Graft.rebalance(corpus)
      .select(col(idCol).as("doc_id"),
        explode(Dedup.shingleHashes(col(textCol), n)).as("g"))
      .filter(graft.functions.BloomMightContain.probe(col("g"), bloom))
    c.join(if (hintBroadcast) broadcast(b) else b, "g")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  /** The keep-set: corpus with contaminated documents removed — the
    * production decontamination step (broadcast-friendly: the distinct
    * contaminated-id relation is far smaller than the corpus).
    */
  def clean(corpus: DataFrame, bench: DataFrame,
            idCol: String, textCol: String,
            benchIdCol: String, benchTextCol: String,
            n: Int = 3, minOverlap: Int = 3): DataFrame = {
    val bad = overlaps(corpus, bench, idCol, textCol, benchIdCol,
        benchTextCol, n, minOverlap)
      .select(col("doc_id")).distinct()
    corpus.join(bad, corpus(idCol) === bad("doc_id"), "left_anti")
  }

  /** DuckDB twin of [[overlaps]] (kept adjacent so they cannot drift). */
  def sqlOverlaps(benchPred: String, n: Int = 3, minOverlap: Int = 3,
                  excludeSelf: Boolean = true): String = {
    val self = if (excludeSelf) "AND c.doc_id <> b.bench_id" else ""
    s"""WITH cg AS (
       |  SELECT doc_id, unnest(${Dedup.sqlShingleHashes("text", n)}) AS g
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id AS bench_id,
       |         unnest(${Dedup.sqlShingleHashes("text", n)}) AS g
       |  FROM documents WHERE $benchPred)
       |SELECT c.doc_id, b.bench_id, count(*) AS overlap
       |FROM cg c JOIN bg b USING (g)
       |WHERE true $self
       |GROUP BY c.doc_id, b.bench_id
       |HAVING count(*) >= $minOverlap
       |ORDER BY doc_id, bench_id""".stripMargin
  }
}
