package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "pack my box with five dozen liquor jugs")
  ).toDF("bench_id", "btext")

  private val corpus = Seq(
    // verbatim leak of bench 100
    (1L, "prefix words the quick brown fox jumps over the lazy dog suffix"),
    // partial overlap with bench 100: shares exactly the two trigrams
    // spanning "jumps over the lazy dog"
    (2L, "he jumps over the lazy dog daily"),
    // clean
    (3L, "completely unrelated content about spark engines and parquet"),
    // leak of bench 101
    (4L, "pack my box with five dozen liquor jugs thanks")
  ).toDF("doc_id", "text")

  test("overlap counts are exact distinct-trigram intersections") {
    val got = Decontaminate.overlaps(corpus, bench, "doc_id", "text",
        "bench_id", "btext", n = 3, minOverlap = 1)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // bench 100 has 7 trigrams; doc 1 contains all 7
    assert(got((1L, 100L)) == 7L)
    // doc 2: "jumps over the", "over the lazy", "the lazy dog" = 3
    assert(got((2L, 100L)) == 3L)
    assert(got((4L, 101L)) == 6L)
    assert(!got.contains((3L, 100L)) && !got.contains((3L, 101L)))
  }

  test("benchmark side broadcasts: corpus shingles never shuffle for the join") {
    val phys = Decontaminate.overlaps(corpus, bench, "doc_id", "text",
        "bench_id", "btext").queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), s"no broadcast join:\n$phys")
  }

  test("clean drops exactly the contaminated docs at the threshold") {
    val kept = Decontaminate.clean(corpus, bench, "doc_id", "text",
        "bench_id", "btext", n = 3, minOverlap = 4)
      .select("doc_id").as[Long].collect().toSet
    // threshold 4: docs 1 (7) and 4 (6) dropped, doc 2 (3) survives
    assert(kept == Set(2L, 3L))
  }

  test("gramDocFreqScore: shared boilerplate scores high, unique text low") {
    val df = Seq(
      (1L, "common template text here"),
      (2L, "common template text here"),
      (3L, "common template text here"),
      (4L, "totally unique words nowhere else")
    ).toDF("doc_id", "text")
    val scores = TextAnalysis.gramDocFreqScore(df)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // docs 1-3 share every bigram (df = 3 each); doc 4's are unique
    assert(scores(1L) == 3.0 && scores(2L) == 3.0 && scores(3L) == 3.0)
    assert(scores(4L) == 1.0)
  }

  test("repetition ratios: boilerplate scores high, varied text low") {
    val df = Seq(
      (1L, "spam spam spam spam spam"),
      (2L, "all words here are completely different"),
      (3L, "one")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(df).as[(Long, Long, Long, Double, Double)]
      .collect().map(x => x._1 -> x).toMap
    assert(r(1L)._2 == 5 && r(1L)._3 == 1) // 5 tokens, 1 distinct
    assert(r(1L)._4 == 0.8 && r(1L)._5 == 0.75) // 4/5 dup words, 3/4 dup bigrams
    assert(r(2L)._4 == 0.0 && r(2L)._5 == 0.0)
    assert(r(3L)._4 == 0.0 && r(3L)._5 == 0.0) // single token: guarded
  }
}
