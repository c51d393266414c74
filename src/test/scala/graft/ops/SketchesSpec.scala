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
}
