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

  test("dupSpanCoverage: planted cross-doc span, exact coverage accounting") {
    // A and B share exactly one 8-token span; C is unique; D repeats an
    // 8-gram within itself only; E is shorter than the window.
    val docs = Seq(
      (1L, "a1 a2 S1 S2 S3 S4 S5 S6 S7 S8"),
      (2L, "S1 S2 S3 S4 S5 S6 S7 S8 b1 b2"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
      (4L, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8"),
      (5L, "s1 s2 s3 s4 s5 s6 s7")
    ).toDF("doc_id", "text")
    val r = Dedup.dupSpanCoverage(docs, "doc_id", "text", k = 8)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> t).toMap

    assert(!r.contains(5L), "doc shorter than k is excluded")
    // A: 10 tokens -> 3 windows; only the S1..S8 window (pos 2) is shared
    assert(r(1L) == ((1L, 10L, 3L, 1L, 8L, 0.8)))
    // B: shared window at pos 0
    assert(r(2L) == ((2L, 10L, 3L, 1L, 8L, 0.8)))
    // C: no duplication
    assert(r(3L) == ((3L, 10L, 3L, 0L, 0L, 0.0)))
    // D: the repeated 8-gram never leaves the document -> not cross-doc
    assert(r(4L)._4 == 0L && r(4L)._6 == 0.0)
  }

  test("dupSpanCoverage: overlapping spans union their token coverage") {
    // A and B share 9 consecutive tokens -> two overlapping 8-windows in
    // each; covered tokens must be the 9-token union, not 16
    val docs = Seq(
      (1L, "S1 S2 S3 S4 S5 S6 S7 S8 S9 x1"),
      (2L, "y1 S1 S2 S3 S4 S5 S6 S7 S8 S9")
    ).toDF("doc_id", "text")
    val r = Dedup.dupSpanCoverage(docs, "doc_id", "text", k = 8)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(r(1L)._4 == 2L, "two duplicated windows")
    assert(r(1L)._5 == 9L, "union coverage, overlap counted once")
    assert(r(1L)._6 == 0.9)
    assert(r(2L)._5 == 9L)
  }

  test("scrubDupSpans: first occurrence keeps, later docs lose the span, rest intact") {
    val docs = Seq(
      (1L, "a1 a2 S1 S2 S3 S4 S5 S6 S7 S8"),       // canonical holder
      (2L, "S1 S2 S3 S4 S5 S6 S7 S8 b1 b2"),       // loses S1..S8
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),      // untouched
      (5L, "s1 s2")                                 // below the window
    ).toDF("doc_id", "text")
    val r = Dedup.scrubDupSpans(docs, "doc_id", "text", k = 8)
      .as[(Long, Long, Long, String)].collect().map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 10L, 0L, "a1 a2 S1 S2 S3 S4 S5 S6 S7 S8")),
      s"canonical doc must keep its copy: ${r(1L)}")
    assert(r(2L) == ((2L, 10L, 8L, "b1 b2")), s"span not scrubbed: ${r(2L)}")
    assert(r(3L) == ((3L, 10L, 0L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")))
    assert(r(5L) == ((5L, 2L, 0L, "s1 s2")), "short docs pass through")
  }

  test("scrubDupSpans: a fully-duplicated doc comes back EMPTY, not restored") {
    // doc 2 is an exact k-token duplicate of doc 1: every one of its
    // token positions sits under a duplicated window, so the rebuild has
    // no surviving tokens to group — the regression was coalescing back
    // to the ORIGINAL text with n_removed = 0
    val docs = Seq(
      (1L, "S1 S2 S3 S4 S5 S6 S7 S8"),               // canonical holder
      (2L, "S1 S2 S3 S4 S5 S6 S7 S8"),               // exact duplicate
      (3L, "S1 S2 S3 S4 S5 S6 S7 S8 tail1 tail2"),   // superstring: loses span
      (4L, "x1 x2 x3 x4 x5 x6 x7 x8")                // untouched
    ).toDF("doc_id", "text")
    val r = Dedup.scrubDupSpans(docs, "doc_id", "text", k = 8)
      .as[(Long, Long, Long, String)].collect().map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 8L, 0L, "S1 S2 S3 S4 S5 S6 S7 S8")),
      s"canonical doc keeps its copy: ${r(1L)}")
    assert(r(2L) == ((2L, 8L, 8L, "")),
      s"fully-duplicated doc must be fully scrubbed: ${r(2L)}")
    assert(r(3L) == ((3L, 10L, 8L, "tail1 tail2")), s"superstring: ${r(3L)}")
    assert(r(4L) == ((4L, 8L, 0L, "x1 x2 x3 x4 x5 x6 x7 x8")))
  }

  test("lineSegments: non-overlapping width-word windows, short tail kept") {
    val r = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7"), // 7 words, width 3 -> 3 segments
      (2L, "a b c"),                // exactly one full segment
      (3L, "solo"))                 // sub-width doc = one segment
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.lineSegments(col("text"), 3).as("segs"))
      .as[(Long, Seq[String])].collect().toMap
    assert(r(1L) == Seq("w1 w2 w3", "w4 w5 w6", "w7"))
    assert(r(2L) == Seq("a b c"))
    assert(r(3L) == Seq("solo"))
  }

  test("lineDedup: corpus-repeated lines removed, order preserved") {
    val boiler = "all rights reserved"
    val docs = Seq(
      (1L, s"u1 u2 u3 $boiler u4 u5 u6"),   // boilerplate mid-doc
      (2L, s"$boiler v1 v2 v3"),            // boilerplate leading
      (3L, boiler),                         // nothing but boilerplate
      (4L, "w1 w2 w3")                      // untouched
    ).toDF("doc_id", "text")
    val r = Dedup.lineDedup(docs, "doc_id", "text", width = 3, maxDup = 1)
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> t).toMap
    // segment grid (width 3): doc 1 = [u1 u2 u3][all rights reserved]
    // [u4 u5 u6]; the boilerplate line occurs 3x corpus-wide -> dropped
    // everywhere, remaining segments rejoin in original order
    assert(r(1L) == ((1L, 3L, 2L, "u1 u2 u3 u4 u5 u6")))
    assert(r(2L) == ((2L, 2L, 1L, "v1 v2 v3")))
    assert(r(3L) == ((3L, 1L, 0L, "")), "all-boilerplate doc -> empty")
    assert(r(4L) == ((4L, 1L, 1L, "w1 w2 w3")))
  }

  test("lineDedup: maxDup threshold spares lines at or under it") {
    val docs = Seq(
      (1L, "x y z"), (2L, "x y z"),           // 2 occurrences
      (3L, "p q r"), (4L, "p q r"), (5L, "p q r")) // 3 occurrences
      .toDF("doc_id", "text")
    val r = Dedup.lineDedup(docs, "doc_id", "text", width = 3, maxDup = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> t._3).toMap
    assert(r(1L) == 1L && r(2L) == 1L, "2 <= maxDup survives")
    assert(r(3L) == 0L && r(4L) == 0L && r(5L) == 0L, "3 > maxDup dropped")
  }
}
