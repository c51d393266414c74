package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, rng}

/** Property pins for the sketch kernels: the bounded [[graft.functions
  * .KmvAgg]] buffer must equal the brute-force k-smallest-distinct
  * reference for ANY input multiset and ANY partitioning, and count-min
  * must never under-estimate. Pure-seed ScalaCheck sampling (the
  * StrftimePropertySpec harness) keeps reruns bit-identical.
  */
class SketchPropertySpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seedN: Long): Seq[A] = {
    var seed = rng.Seed(seedN)
    (1 to n).map { _ =>
      val r = g.doPureApply(Gen.Parameters.default, seed)
      seed = r.seed
      r.retrieve.get
    }
  }

  test("KmvAgg == brute-force k smallest distinct, any data, any partitioning") {
    val gen = for {
      n <- Gen.choose(0, 300)
      xs <- Gen.listOfN(n, Gen.choose(0L, 80L)) // heavy duplication
      k <- Gen.oneOf(1, 3, 16)
      parts <- Gen.choose(1, 7)
    } yield (xs, k, parts)
    samples(gen, 25, 20260814L).foreach { case (xs, k, parts) =>
      val df = if (xs.isEmpty) spark.range(0).select(col("id").as("h"))
        else xs.toDF("h").repartition(parts)
      val got = df.agg(graft.functions.KmvAgg.kmv(k)(col("h")))
        .as[Seq[Long]].head()
      val want = xs.distinct.sorted.take(k)
      assert(got == want, s"k=$k parts=$parts xs=$xs")
    }
  }

  test("count-min estimate >= exact count for every element present") {
    val gen = for {
      n <- Gen.choose(1, 200)
      xs <- Gen.listOfN(n, Gen.choose(0, 30).map(i => s"e$i"))
    } yield xs
    samples(gen, 10, 20260815L).foreach { xs =>
      val df = xs.toDF("t")
      val exact = xs.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
      val sk = Sketches.countMinSketch(df, col("t"))
      val est = Sketches.countMinProbe(exact.keys.toSeq.toDF("t"), sk, "t")
        .as[(String, Long)].collect().toMap
      exact.foreach { case (t, n) =>
        assert(est(t) >= n, s"under-estimate for $t: ${est(t)} < $n")
      }
    }
  }
}
