package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, rng}

/** Property pin for [[TextAnalysis.bpeLearn]]: the distributed loop must
  * equal an independent single-threaded reimplementation of the
  * documented semantics (frequency-weighted pair counts, argmax with
  * (−count, pair) tie-break, two-pass left-to-right scan-replace) on
  * arbitrary corpora over a small alphabet. Pure-seed sampling keeps
  * reruns bit-identical.
  */
class BpePropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    var seed = rng.Seed(20260816L)
    (1 to n).map { _ =>
      val r = g.doPureApply(Gen.Parameters.default, seed)
      seed = r.seed
      r.retrieve.get
    }
  }

  /** Left-to-right non-overlapping scan of the INPUT (Java/DuckDB
    * `replace` semantics).
    */
  private def scanReplace(s: String, pat: String, rep: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.startsWith(pat, i)) { sb.append(rep); i += pat.length }
      else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private def refBpe(texts: Seq[String],
                     nMerges: Int): Seq[(Long, String, String, Long)] = {
    val words = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
    var vocab: Seq[(String, Long)] = words.groupBy(identity).toSeq
      .map { case (w, o) => (w.map(_.toString).mkString(" "), o.size.toLong) }
    val out = Seq.newBuilder[(Long, String, String, Long)]
    for (rank <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      vocab.foreach { case (seq, cnt) =>
        val syms = seq.split(" ")
        for (i <- 0 until syms.length - 1)
          counts(s"${syms(i)} ${syms(i + 1)}") += cnt
      }
      if (counts.nonEmpty) {
        val (pair, n) = counts.toSeq.sortBy { case (p, c) => (-c, p) }.head
        val Array(l, r) = pair.split(" ", 2)
        out += ((rank.toLong, l, r, n))
        val (pat, rep) = (s" $pair ", s" $l$r ")
        vocab = vocab.map { case (seq, cnt) =>
          (scanReplace(scanReplace(s" $seq ", pat, rep), pat, rep).trim, cnt)
        }
      }
    }
    out.result()
  }

  test("bpeLearn == independent reference on arbitrary corpora") {
    val word = Gen.choose(1, 7)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val text = Gen.choose(1, 25)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, text))
    samples(corpus, 12).foreach { texts =>
      val got = TextAnalysis.bpeLearn(texts.toDF("text"), "text", 4, spark)
        .as[(Long, String, String, Long)].collect().toSeq
      assert(got == refBpe(texts, 4), s"corpus: $texts")
    }
  }
}
