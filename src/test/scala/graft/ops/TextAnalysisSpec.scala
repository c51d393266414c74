package graft.ops

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("pairTopK counts adjacent pairs with multiplicity; short docs contribute none") {
    val df = Seq(
      (1L, "a b a b c"), // pairs: "a b" x2, "b a", "b c"
      (2L, "a b"),       // "a b"
      (3L, "solo"),      // no pairs
      (4L, "")           // no pairs
    ).toDF("doc_id", "text")
    val got = TextAnalysis.pairTopK(df, "doc_id", "text", 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.head == (("a b", 3L, 2L)), s"top pair: ${got.head}")
    assert(got.map(_._1).toSet == Set("a b", "b a", "b c"),
      "single-token and empty docs contribute no pairs")
    // deterministic tie-break: equal counts order by pair text
    val ties = got.filter(_._2 == 1L).map(_._1)
    assert(ties == ties.sorted, s"ties alphabetic: $ties")
  }
}
