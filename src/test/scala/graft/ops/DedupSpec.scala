package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // two real near-dup docs plus a boilerplate template shared verbatim by
  // many docs (every pair of those collides in every band)
  private lazy val docs = {
    val template = "all rights reserved contact us terms of service apply here"
    val boiler = (100L until 160L).map(i => (i, template))
    val nearDup = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today ok"),
      (2L, "the quick brown fox jumps over the lazy dog today now"))
    (nearDup ++ boiler).toDF("doc_id", "text")
  }

  test("minhash bucket cap drops degenerate-bucket pairs, keeps real ones") {
    val uncapped = Dedup.minhashCandidates(docs, "doc_id", "text")
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // boilerplate explodes quadratically: 60 docs -> 1770 pairs
    assert(uncapped.count(p => p._1 >= 100L) == 60 * 59 / 2)
    assert(uncapped.contains((1L, 2L)), "real near-dup found uncapped")

    val capped = Dedup.minhashCandidates(docs, "doc_id", "text",
        maxBucket = Some(10))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(capped.contains((1L, 2L)), "real near-dup survives the cap")
    assert(!capped.exists(p => p._1 >= 100L),
      "degenerate boilerplate buckets are dropped")
  }

  test("shingleHashes: short docs fall back to one whole-text shingle") {
    val r = Seq((1L, "one two"), (2L, "a b c d")).toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.shingleHashes(col("text"), 3).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(r(1L).length == 1) // 2 words < n=3
    assert(r(2L).length == 2) // 4 words -> 2 trigrams
  }
}
