package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior tests for the data-selection stages ([[Selection]]): DSIR
  * importance weights must rank target-like documents above dissimilar
  * ones, Gumbel top-k must be a deterministic weight-proportional sample,
  * and the stupid-backoff LM must score in-domain text as more likely
  * (lower NLL) than out-of-domain text. The cross-engine exactness of the
  * micro-quantized sums is covered by the driver oracle rows
  * (`sel_dsir_weights`, `sel_dsir_topk`, `sel_lm_score`).
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // a corpus with two sublanguages: "aa"-documents and "zz"-documents
  private lazy val corpus = ((0L until 40L).map(i => (i, "aa bb cc dd ee aa bb")) ++
    (40L until 80L).map(i => (i, "zz yy xx ww vv zz yy"))).toDF("doc_id", "text")
  // target distribution = the aa-sublanguage
  private lazy val target = corpus.filter(col("doc_id") < 40)

  test("importanceWeights ranks target-like docs above dissimilar docs") {
    val w = Selection.importanceWeights(corpus, target, "doc_id", "text")
      .select("doc_id", "weight").as[(Long, Double)].collect().toMap
    assert(w.size == 80)
    val aa = w.filter(_._1 < 40).values
    val zz = w.filter(_._1 >= 40).values
    assert(aa.min > zz.max,
      s"every aa-doc must outweigh every zz-doc: ${aa.min} vs ${zz.max}")
    // docs with identical text get identical weights (pure function of text)
    assert(aa.toSet.size == 1 && zz.toSet.size == 1)
  }

  test("importanceWeights n_feats counts unigrams + bigrams with multiplicity") {
    val w = Selection.importanceWeights(corpus, target, "doc_id", "text")
      .filter(col("doc_id") === 0).select("n_feats").as[Long].head()
    // 7 tokens -> 7 unigrams + 6 bigrams
    assert(w == 13L)
  }

  test("dsirTopK is deterministic and weight-biased toward the target") {
    val k = 30
    val t1 = Selection.dsirTopK(corpus, target, "doc_id", "text", k)
    val ids1 = t1.select("doc_id").as[Long].collect()
    val ids2 = Selection.dsirTopK(corpus, target, "doc_id", "text", k)
      .select("doc_id").as[Long].collect()
    assert(ids1.sameElements(ids2), "same sample on re-run")
    assert(ids1.length == k)
    // keys are sorted descending in the output
    val keys = t1.select("skey").as[Double].collect()
    assert(keys.sameElements(keys.sortBy(-_)))
    // weight bias: aa-docs carry exp(weight-gap) more mass, so the sample
    // must select more aa than zz (gap is large here -> near-total)
    val nAa = ids1.count(_ < 40)
    assert(nAa > k / 2, s"expected aa-majority, got $nAa of $k")
  }

  test("lmScore ranks in-domain text as more likely than out-of-domain") {
    val train = corpus.filter(col("doc_id") < 40) // the aa-sublanguage
    val s = Selection.lmScore(corpus, train, "doc_id", "text")
      .select("doc_id", "n_trans", "nll")
      .as[(Long, Long, Option[Double])].collect()
    assert(s.length == 80)
    val aa = s.filter(_._1 < 40).flatMap(_._3)
    val zz = s.filter(_._1 >= 40).flatMap(_._3)
    // every transition in an aa-doc was seen in training; zz-docs are all
    // backoff-to-OOV -> strictly higher mean NLL
    assert(aa.max < zz.min, s"in-domain must score lower NLL: ${aa.max} vs ${zz.min}")
    assert(s.forall(_._2 == 6L), "7 tokens -> 6 transitions")
  }

  test("lmScore keeps short documents with n_trans=0 and NULL nll") {
    val c = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    val s = Selection.lmScore(c, c, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_trans", "nll")
      .as[(Long, Long, Option[Double])].collect()
    assert(s(0) == ((1L, 0L, None)), "single-token doc: no transitions")
    assert(s(1)._2 == 1L && s(1)._3.isDefined)
  }

  test("lmBuckets puts in-domain docs in the head and balances terciles") {
    val train = corpus.filter(col("doc_id") < 40)
    val b = Selection.lmBuckets(corpus, train, "doc_id", "text")
      .select("doc_id", "bucket").as[(Long, Long)].collect()
    assert(b.length == 80)
    val sizes = b.groupBy(_._2).view.mapValues(_.length).toMap
    // ntile(3) over 80 rows: 27/27/26
    assert(sizes == Map(1L -> 27, 2L -> 27, 3L -> 26))
    // every aa-doc (in-domain, lower nll) ranks before every zz-doc, so
    // bucket 3 (tail) is all zz
    assert(b.filter(_._2 == 3L).forall(_._1 >= 40))
    assert(b.filter(_._1 < 40).forall(_._2 <= 2L))
  }

  test("lmBucketsByThresholds assigns by nll range (the map-only scale path)") {
    val train = corpus.filter(col("doc_id") < 40)
    val nlls = Selection.lmScore(corpus, train, "doc_id", "text")
      .filter(col("n_trans") > 0)
      .select("doc_id", "nll").as[(Long, Double)].collect().toMap
    val distinct = nlls.values.toSeq.distinct.sorted
    assert(distinct.size >= 2, "need two nll levels to threshold between")
    val t = (distinct(0) + distinct(1)) / 2
    val b = Selection.lmBucketsByThresholds(corpus, train, "doc_id", "text",
        Seq(t))
      .select("doc_id", "bucket").as[(Long, Long)].collect()
    assert(b.length == nlls.size)
    b.foreach { case (id, bucket) =>
      val expect = if (nlls(id) > t) 2L else 1L
      assert(bucket == expect, s"doc $id nll=${nlls(id)} t=$t")
    }
  }

  test("nllThresholds: offline quantile estimate feeds the map-only bucketing") {
    val train = corpus.filter(col("doc_id") < 40)
    val ts = Selection.nllThresholds(corpus, train, "doc_id", "text",
      nBuckets = 3)
    assert(ts.size == 2 && ts == ts.sorted, s"two ascending cuts: $ts")
    // the estimated cuts must sit inside the observed nll range...
    val nlls = Selection.lmScore(corpus, train, "doc_id", "text")
      .filter(col("n_trans") > 0)
      .select("doc_id", "nll").as[(Long, Double)].collect()
    val (lo, hi) = (nlls.map(_._2).min, nlls.map(_._2).max)
    ts.foreach(t => assert(t >= lo && t <= hi, s"cut $t outside [$lo, $hi]"))
    // ...and bucketing by them preserves the domain order: every aa-doc
    // (in-domain, lower nll) lands in a bucket <= every zz-doc's. (This
    // corpus has only TWO nll levels, so 3 buckets legitimately collapse
    // to 2 under `>` cuts — exact tercile sizes are the ntile variant's
    // contract, not the threshold variant's.)
    val b = Selection.lmBucketsByThresholds(corpus, train, "doc_id", "text",
        ts)
      .select("doc_id", "bucket").as[(Long, Long)].collect()
    assert(b.length == nlls.length)
    val aaMax = b.filter(_._1 < 40).map(_._2).max
    val zzMin = b.filter(_._1 >= 40).map(_._2).min
    assert(aaMax <= zzMin, s"in-domain bucket must not exceed tail: $aaMax vs $zzMin")
  }

  test("gumbelMicro is deterministic, finite, and id-sensitive") {
    val ids = (0L until 500L).toDF("id")
    val g = ids.select(Selection.gumbelMicro(col("id")).as("g"))
      .as[Long].collect()
    assert(g.length == 500 && g.distinct.length > 490, "near-unique noise")
    // standard Gumbel: mean ~ Euler-Mascheroni (0.577), in micro-units
    val mean = g.sum.toDouble / g.length / Selection.MICRO
    assert(mean > 0.3 && mean < 0.9, s"implausible Gumbel mean $mean")
  }

  test("nbScore generalizes: held-out docs classify with their sublanguage") {
    // train on half of each sublanguage, score everything: the held-out
    // halves must side with their own class, not just the seeds
    val pos = corpus.filter(col("doc_id") < 20)              // aa-seeds
    val neg = corpus.filter(col("doc_id") >= 40 && col("doc_id") < 60)
    val r = Selection.nbScore(corpus, pos, neg, "doc_id", "text")
      .select("doc_id", "nb_score", "nb_label")
      .as[(Long, Double, Long)].collect().toSeq
    val (aa, zz) = r.partition(_._1 < 40)
    assert(aa.forall(_._3 == 1L), "every aa-doc (incl. held-out) labels positive")
    assert(zz.forall(_._3 == 0L), "every zz-doc (incl. held-out) labels negative")
    assert(aa.map(_._2).min > zz.map(_._2).max,
      "scores separate the classes with a margin")
  }

  test("nbScore: mixed-vocabulary doc lands between the classes") {
    val pos = corpus.filter(col("doc_id") < 40)
    val neg = corpus.filter(col("doc_id") >= 40)
    val probe = Seq((100L, "aa bb zz yy")).toDF("doc_id", "text")
    val s = Selection.nbScore(probe, pos, neg, "doc_id", "text")
      .select("nb_score").as[Double].head()
    val sAa = Selection.nbScore(Seq((101L, "aa bb cc")).toDF("doc_id", "text"),
      pos, neg, "doc_id", "text").select("nb_score").as[Double].head()
    val sZz = Selection.nbScore(Seq((102L, "zz yy xx")).toDF("doc_id", "text"),
      pos, neg, "doc_id", "text").select("nb_score").as[Double].head()
    assert(sZz < s && s < sAa, s"expected $sZz < $s < $sAa")
  }
}
