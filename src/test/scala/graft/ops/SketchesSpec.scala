package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic sketches ([[Sketches]]): KMV distinct-count and
  * count-min frequency — estimator guarantees (exact-below-k, always
  * over-estimate, bounded grid) and mergeability.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("KMV is exact below k and within the error band above it") {
    val small = (1 to 40).map(i => s"tok$i").toDF("t")
    val est = Sketches.kmvEstimate(Sketches.kmvSketch(small, col("t"), k = 64))
      .select("n_sketch", "est_distinct").as[(Long, Long)].head()
    assert(est == ((40L, 40L)), s"below k the sketch is the exact set: $est")

    val big = (1 to 5000).map(i => s"tok$i").toDF("t")
    val bigEst = Sketches.kmvEstimate(Sketches.kmvSketch(big, col("t"), k = 64))
      .select("est_distinct").as[Long].head()
    // stddev ~ N/sqrt(k-2) ~ 13%; 4 sigma leaves huge headroom while
    // still catching an off-by-2^x bug instantly
    assert(bigEst > 2500 && bigEst < 10000,
      s"5000 distinct estimated as $bigEst")
  }

  test("KMV merges: sketch(A union B) == top-k of sketch(A) ++ sketch(B)") {
    val a = (1 to 300).map(i => s"a$i").toDF("t")
    val b = (200 to 500).map(i => s"a$i").toDF("t") // overlaps a
    val direct = Sketches.kmvSketch(a.union(b), col("t"), 32)
      .as[Long].collect().toSeq
    val merged = Sketches.kmvSketch(a, col("t"), 32)
      .union(Sketches.kmvSketch(b, col("t"), 32))
      .distinct().orderBy("h").limit(32).as[Long].collect().toSeq
    assert(direct == merged, "KMV union law")
  }

  test("grouped KMV carries the exact count and stays exact below k") {
    val df = ((1 to 10).map(i => ("s1", s"t$i")) ++
      (1 to 200).map(i => ("s2", s"t$i"))).toDF("source", "t")
    val rows = Sketches.kmvDistinctBy(df, "source", col("t"), k = 64)
      .as[(String, Long, Long, Long, Long)].collect()
    val s1 = rows.find(_._1 == "s1").get
    assert(s1._2 == 10 && s1._5 == 10, s"s1 exact below k: $s1")
    val s2 = rows.find(_._1 == "s2").get
    assert(s2._2 == 200 && s2._3 == 64 && s2._5 > 100 && s2._5 < 400,
      s"s2 estimated from the 64-sketch: $s2")
  }

  test("count-min never under-estimates; unseen probes read zero") {
    val corpus = (Seq.fill(50)("the") ++ Seq.fill(7)("rare") ++
      (1 to 500).map(i => s"noise$i")).toDF("t")
    val sk = Sketches.countMinSketch(corpus, col("t"))
    assert(sk.count() <= Sketches.CM_D * Sketches.CM_W,
      "grid is bounded by d*w whatever the corpus")
    val probed = Sketches.countMinProbe(
      Seq("the", "rare", "never-seen").toDF("t"), sk, "t")
      .as[(String, Long)].collect().toMap
    assert(probed("the") >= 50 && probed("rare") >= 7,
      s"over-estimate only: $probed")
    assert(probed("never-seen") >= 0 && probed("never-seen") < 50,
      s"unseen token reads only collision mass: $probed")
    val top = Sketches.countMinTopK(corpus, col("t"), 2)
      .as[(String, Long, Long)].collect()
    assert(top.map(_._1).toSeq == Seq("the", "rare"))
    assert(top.forall(r => r._3 >= r._2), s"est_cm >= n_exact: ${top.toSeq}")
  }

  test("heavyHitters == exact threshold filter, any partitioning; " +
      "candidate broadcast stays <= c") {
    // head+tail stream: 3 heavy items over a 500-item uniform tail,
    // vocabulary far above the capacity so MG eviction actually runs
    val head = Seq.fill(90)("alpha") ++ Seq.fill(70)("beta") ++
      Seq.fill(50)("gamma")
    val tail = (0 until 500).flatMap(i => Seq(s"t$i", s"t$i")) // f=2 each
    val xs = head ++ tail // n = 1210
    val c = 16 // threshold n/17 ~ 71.2 -> alpha & beta qualify, gamma not
    val exact = xs.groupBy(identity).map { case (k, o) => k -> o.size.toLong }
    val n = xs.size.toLong
    val want = exact.filter { case (_, f) => f * (c + 1) > n }.toSeq
      .map { case (k, f) => (k, f, n) }
      .sortBy { case (k, f, _) => (-f, k) }
    for (parts <- Seq(1, 7, 32)) {
      val got = Sketches.heavyHitters(
          xs.toDF("item").repartition(parts), col("item"), c)
        .as[(String, Long, Long)].collect().toSeq
      assert(got == want, s"parts=$parts: $got != $want")
      // the candidate set must be CAPACITY-bounded, not merely correct:
      // a fold whose eviction never engages still answers right (it is
      // exact counting) while silently growing O(vocabulary) state —
      // the single-partition case is the regression trap, since there
      // the merge-side truncation can't mask an unbounded fold
      val parted = xs.toDF("item").repartition(parts)
      val partials = Sketches.mgPartials(parted, c)
      val perPart = partials.filter(col("item").isNotNull)
        .groupBy(spark_partition_id()).count()
        .agg(max("count")).as[Long].head()
      assert(perPart <= c, s"a partition emitted $perPart candidates > $c")
      val nCand = Sketches.mgCandidates(partials, c).count()
      assert(nCand <= c, s"merged candidates must stay <= $c, got $nCand")
      // the mass rows carry the full stream count through the fold pass
      assert(partials.agg(sum("nrows")).as[Long].head() == n)
    }
    // empty stream: no rows, not a crash
    assert(Sketches.heavyHitters(
      spark.range(0).select(col("id").cast("string").as("item")),
      col("item"), c).count() == 0)
    // capacity 1 (the degenerate majority-candidate sketch): still a
    // correct, possibly-empty result — here no item exceeds n/2
    assert(Sketches.heavyHitters(xs.toDF("item"), col("item"), 1)
      .count() == 0)
  }

  test("histogram quantiles: rank-exact envelope, any partitioning") {
    // a skewed integer stream (short docs dominate, a long tail of big
    // ones) hashed across bins of width 8
    val vals = (0 until 2000).map(i => ((i * 2654435761L) % 97 + 1).toLong) ++
      (0 until 60).map(i => 700L + 13 * i)
    val sorted = vals.sorted
    val n = vals.size.toLong
    for (parts <- Seq(1, 7, 32)) {
      val got = Sketches.histQuantilesOf(
          vals.toDF("v").repartition(parts), col("v"))
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      assert(got.map(_._1) == Sketches.HIST_QMS.map(_.toLong),
        s"one row per target: $got")
      got.foreach { case (qm, gn, r, _, lo, hi) =>
        assert(gn == n && r == (qm * n + 999) / 1000)
        val truth = sorted((r - 1).toInt) // the rank-r order statistic
        assert(truth >= lo && truth < hi,
          s"qm=$qm: true quantile $truth outside [$lo, $hi)")
        assert(hi - lo == Sketches.HIST_W, "envelope is one bin wide")
      }
    }
  }

  test("grouped histogram quantiles == the ungrouped sketch per group") {
    val df = (Seq.tabulate(500)(i => ("a", (i % 83 + 1).toLong)) ++
      Seq.tabulate(300)(i => ("b", (i % 9 + 400).toLong)))
      .toDF("g", "v")
    val grouped = Sketches.histQuantilesBy(df, col("g"), col("v"))
      .orderBy("grp", "qm")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val perGroup = Seq("a", "b").flatMap { g =>
      Sketches.histQuantilesOf(df.filter(col("g") === g), col("v"))
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
        .map { case (qm, n, r, bin, lo, hi) => (g, qm, n, r, bin, lo, hi) }
    }
    assert(grouped == perGroup, s"$grouped != $perGroup")
  }

  test("histogram origin shifts the domain: signed score distributions") {
    // micro-quantized ln-based scores are large negatives — the origin
    // moves the grid under them; envelopes must come back in the
    // ORIGINAL domain and stay rank-exact
    val vals = (0 until 1000).map(i => -8000L + ((i * 2654435761L) % 7993))
    val sorted = vals.sorted
    val got = Sketches.histQuantilesOf(vals.toDF("v"), col("v"),
        origin = -8192L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    got.foreach { case (qm, n, r, _, lo, hi) =>
      assert(n == 1000 && r == (qm * n + 999) / 1000)
      val truth = sorted((r - 1).toInt)
      assert(truth >= lo && truth < hi,
        s"qm=$qm: true quantile $truth outside [$lo, $hi)")
      assert(lo < 0, s"envelope must live in the signed domain: $lo")
    }
  }

  test("histogram clamps out-of-range values into the edge bins") {
    val vals = Seq(-5L, 0L, 3L, 1000000L, Long.MaxValue / 4)
    val bins = Sketches.histSketch(vals.toDF("v"), col("v"))
      .as[(Long, Long)].collect().toMap
    assert(bins(0L) == 3L, s"negatives and small values share bin 0: $bins")
    assert(bins(Sketches.HIST_B - 1L) == 2L,
      s"everything above the domain lands in the clamp bin: $bins")
  }
}
