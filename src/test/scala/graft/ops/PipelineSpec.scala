package graft.ops

import graft.SparkSpec
import graft.core.Graft
import org.apache.spark.sql.functions._

/** Behavior of the corpus-to-shards capstone ([[Pipeline.corpusToShards]]),
  * focused on the optional DSIR selection stage: value-exactness against
  * DuckDB is the driver rows' job (`tp_e2e_pipeline`, `tp_e2e_selected`);
  * here we pin the stage's structural contract — it cuts to exactly
  * `dsirK` documents when it binds, is a no-op when disabled, and the
  * selected corpus is a subset of the unselected one.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = Graft.documents(spark, dir)
  private def bench = docs.filter(col("doc_id") % 25 === 0)

  test("selection stage cuts the shard contents to exactly dsirK docs") {
    val base = Pipeline.corpusToShards(docs, bench)
    val sel = Pipeline.corpusToShards(docs, bench,
      dsirTargetPred = Some(col("source") === "src0"), dsirK = 30)
    val nBase = base.agg(sum("n_docs")).as[Long].head()
    val nSel = sel.agg(sum("n_docs")).as[Long].head()
    assert(nBase > 30, s"cleaned corpus must exceed k for the test to bind ($nBase)")
    // the 5000-token/lang budget doesn't bind at this scale, so the bins
    // hold exactly the k selected docs
    assert(nSel == 30L, s"expected dsirK docs in bins, got $nSel")
    val tokSel = sel.agg(sum("tokens")).as[Long].head()
    val tokBase = base.agg(sum("tokens")).as[Long].head()
    assert(tokSel < tokBase)
  }

  test("dsirK = 0 and unset predicate are both no-ops") {
    val base = Pipeline.corpusToShards(docs, bench).collect().toSet
    val k0 = Pipeline.corpusToShards(docs, bench,
      dsirTargetPred = Some(col("source") === "src0"), dsirK = 0)
      .collect().toSet
    val noPred = Pipeline.corpusToShards(docs, bench, dsirK = 30)
      .collect().toSet
    assert(k0 == base && noPred == base)
  }

  test("selection is deterministic across invocations") {
    def run() = Pipeline.corpusToShards(docs, bench,
      dsirTargetPred = Some(col("source") === "src0"), dsirK = 30)
      .orderBy("shard", "bin").collect().toSeq
    assert(run() == run())
  }

  test("scrub stage re-prices tokens downward, never adds docs") {
    val base = Pipeline.corpusToShards(docs, bench)
    val scrubbed = Pipeline.corpusToShards(docs, bench, scrubSpansK = 8)
    val tokBase = base.agg(sum("tokens")).as[Long].head()
    val tokScrub = scrubbed.agg(sum("tokens")).as[Long].head()
    assert(tokScrub <= tokBase,
      s"scrubbing cannot create tokens: $tokScrub > $tokBase")
    // documents survive scrubbing (spans are removed, docs are not) up
    // to budget-boundary effects: lighter docs can let MORE docs fit
    val nBase = base.agg(sum("n_docs")).as[Long].head()
    val nScrub = scrubbed.agg(sum("n_docs")).as[Long].head()
    assert(nScrub >= nBase,
      s"cheaper docs must not reduce the budget-kept count: $nScrub < $nBase")
    // disabled stage is a no-op
    val off = Pipeline.corpusToShards(docs, bench, scrubSpansK = 0)
    assert(off.collect().toSet == base.collect().toSet)
  }

  test("NB gate shrinks the corpus; disabled gate is a no-op") {
    val base = Pipeline.corpusToShards(docs, bench)
    val gated = Pipeline.corpusToShards(docs, bench,
      nbSeeds = Some((col("source") === "src0", col("source") === "src1")))
    val nBase = base.agg(sum("n_docs")).as[Long].head()
    val nGated = gated.agg(sum("n_docs")).as[Long].head()
    assert(nGated < nBase, s"NB gate must drop something: $nGated vs $nBase")
    assert(nGated > 0L, "NB gate must not drop everything")
    assert(Pipeline.corpusToShards(docs, bench, nbSeeds = None)
      .collect().toSet == base.collect().toSet)
  }
}
