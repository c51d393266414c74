package graft.ops

import graft.SparkSpec

/** The BPE merge-learning loop ([[TextAnalysis.bpeLearn]]): hand-computed
  * merge sequences on the classic low/lower corpus, tie-breaks, and the
  * documented same-symbol-run deviation from textbook greedy.
  */
class BpeLearnSpec extends SparkSpec {
  import spark.implicits._

  test("learns the classic low/lower merge sequence with lexicographic ties") {
    // low×3, lower×2, newest×1:
    //  r1: (l,o)=5 ties (o,w)=5 → lexicographic 'l o' wins
    //  r2: (lo,w)=5
    //  r3: (low,e)=2 ties (e,r)=2 → 'e r' wins
    //  r4: (low,er)=2
    val docs = Seq("low low low", "lower lower", "newest").toDF("text")
    val got = TextAnalysis.bpeLearn(docs, "text", 4, spark)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "l", "o", 5L),
      (2L, "lo", "w", 5L),
      (3L, "e", "r", 2L),
      (4L, "low", "er", 2L)), s"merge sequence: $got")
  }

  test("same-symbol runs: deterministic two-pass grouping (documented deviation)") {
    // 'aaaaa' → r1 merges (a,a), n_occ counts all 4 adjacent pairs
    // pre-merge. The two-pass replace re-segments to [aa, a, aa]
    // (textbook greedy gives [aa, aa, a]) — so r2's argmax is (a, aa),
    // not (aa, a). Both engines scan-replace identically; the oracle
    // pins the same sequence.
    val docs = Seq("aaaaa").toDF("text")
    val got = TextAnalysis.bpeLearn(docs, "text", 2, spark)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", "a", 4L), (2L, "a", "aa", 1L)),
      s"run handling drifted: $got")
  }

  test("encode re-segments under the learned merges: words vs subwords") {
    // low/lower corpus after 4 merges: low → [low] (1), lower → [lower]
    // (1), newest → n e w e s t (6)
    val docs = Seq(
      (0L, "low low low"), (1L, "lower lower"), (2L, "newest low"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncode(docs, "doc_id", "text", 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 3L), (1L, 2L, 2L), (2L, 2L, 7L)),
      s"encode counts: $got")
  }

  test("stops cleanly when the vocabulary runs out of pairs") {
    val docs = Seq("ab ab", "cd").toDF("text")
    // r1 (a,b)=2, r2 (c,d)=1, r3+: every word is one symbol — no pairs
    val got = TextAnalysis.bpeLearn(docs, "text", 5, spark)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", "b", 2L), (2L, "c", "d", 1L)),
      s"exhausted-vocab rounds must emit nothing: $got")
  }
}
