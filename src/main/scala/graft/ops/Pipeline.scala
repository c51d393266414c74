package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The capstone corpus-to-training-shards composition: every stage is an
  * operator from this package; chained they stay ONE Catalyst plan (the
  * role of the reference's client-side map-reduce chain, sonnerie
  * `README.md:23-25`, recast as corpus preparation).
  *
  * quality/lang-id gate → exact-dedup canon → verified near-dup drop →
  * decontaminate vs a benchmark set → per-lang token budget →
  * deterministic bin packing.
  *
  * Scale shape: the gates are map-side filters over the documents scan,
  * the drop sets are slim DISTINCT-id relations applied as broadcast
  * anti-joins, and the only wide stages are the ones the component
  * operators already own (dedup's bucketed self-join, the per-stratum
  * budget window, the per-shard packing window) — no stage adds a shuffle
  * the standalone operator lacks. Measured at synthetic scale by
  * [[graft.PipelineStress]] (SCALE.md).
  */
object Pipeline {

  /** `docs` needs (doc_id, lang, text); `bench` needs (doc_id, text).
    * Output = [[Sequencing.packBins]] rows (shard, bin, n_docs, tokens,
    * fill) over the cleaned, budgeted corpus.
    */
  def corpusToShards(docs: DataFrame, bench: DataFrame,
                     minQuality: Double = 0.5,
                     nearDupJaccard: Double = 0.4,
                     budgetPerLang: Long = 5000L,
                     window: Long = 256L,
                     shards: Int = 8): DataFrame = {
    val scored = docs.select(col("doc_id"), col("lang"), col("text"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.langPredict(col("text")).as("lang_pred"))
    val kept = scored
      .filter(col("quality") >= minQuality && col("lang_pred") === col("lang"))
    val canon = kept.groupBy(md5(col("text")).as("_h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val nearDrop = Dedup.verifiedNearDups(docs, "doc_id", "text",
        nearDupJaccard)
      .select(col("id2").as("doc_id")).distinct()
    val contamDrop = Decontaminate.overlaps(docs, bench, "doc_id",
        "text", "doc_id", "text", n = 3, minOverlap = 3)
      .filter(col("doc_id") =!= col("bench_id"))
      .select("doc_id").distinct()
    val clean = kept.join(canon, "doc_id")
      .join(nearDrop, Seq("doc_id"), "left_anti")
      .join(contamDrop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
    val bud = Sampling.tokenBudget(clean, "lang", "doc_id", "n_tok",
      budgetPerLang)
    Sequencing.packBins(bud, "doc_id", "n_tok", window, shards)
  }
}
