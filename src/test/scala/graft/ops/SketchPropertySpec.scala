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

  test("KMV union law: batch-wise minima == single-pass minima, 1000 adversarial splits") {
    // the law the warehouse store stands on ([[SketchStore.registerKmv]]):
    // the store keeps the distinct union of every batch's own <= k minima
    // (last-wins on ts = h) and the read takes the k smallest — which
    // must equal the k smallest distinct of the WHOLE corpus for ANY
    // batch split, any overlap (same element in many batches), any k.
    // Hash values are modeled by the elements themselves: the law is
    // about sets of ordered values, whatever injection produced them.
    val gen = for {
      nBatch <- Gen.choose(1, 10)
      batches <- Gen.listOfN(nBatch,
        Gen.listOf(Gen.choose(0L, 120L))) // heavy cross-batch overlap
      k <- Gen.choose(1, 32)
    } yield (batches, k)
    samples(gen, 1000, 20260816L).foreach { case (batches, k) =>
      val stored = batches.flatMap(_.distinct.sorted.take(k))
        .distinct.sorted.take(k)
      val single = batches.flatten.distinct.sorted.take(k)
      assert(stored == single, s"k=$k batches=$batches")
    }
  }

  test("stored KMV == single-pass sketch across random overlapping batch splits") {
    val gen = for {
      nBatch <- Gen.choose(1, 5)
      batches <- Gen.listOfN(nBatch, Gen.nonEmptyListOf(
        Gen.choose(0, 150).map(i => s"w$i")))
      k <- Gen.oneOf(4, 16, 32)
    } yield (batches, k)
    samples(gen, 12, 20260817L).foreach { case (batches, k) =>
      val db = graft.store.Db(spark,
        java.nio.file.Files.createTempDirectory("graft-skprop").toString)
      batches.foreach(b =>
        SketchStore.registerKmv(db, b.toDF("t"), col("t"), k = k))
      val stored = SketchStore.storedKmvSketch(db)
        .as[Long].collect().toSeq
      val single = Sketches.kmvSketch(batches.flatten.toDF("t"), col("t"), k)
        .as[Long].collect().toSeq
      assert(stored == single, s"k=$k split=${batches.map(_.size)}")
    }
  }

  test("stored count-min == single-pass grid across random splits with interleaved folds") {
    val gen = for {
      nBatch <- Gen.choose(1, 4)
      batches <- Gen.listOfN(nBatch, Gen.nonEmptyListOf(
        Gen.choose(0, 25).map(i => s"e$i")))
      foldAfter <- Gen.choose(0, 3) // fold mid-stream: sums must not move
    } yield (batches, foldAfter)
    samples(gen, 8, 20260818L).foreach { case (batches, foldAfter) =>
      val db = graft.store.Db(spark,
        java.nio.file.Files.createTempDirectory("graft-cmprop").toString)
      batches.zipWithIndex.foreach { case (b, i) =>
        SketchStore.registerCountMin(db, b.toDF("t"), col("t"),
          batchId = i.toLong)
        if (i == foldAfter) SketchStore.foldCountMin(db)
      }
      val all = batches.flatten
      val items = all.distinct.toDF("t")
      val stored = SketchStore.probeStoredCountMin(db, items, "t")
        .as[(String, Long)].collect().toMap
      val single = Sketches.countMinProbe(items,
          Sketches.countMinSketch(all.toDF("t"), col("t")), "t")
        .as[(String, Long)].collect().toMap
      assert(stored == single,
        s"split=${batches.map(_.size)} foldAfter=$foldAfter")
    }
  }

  test("Misra–Gries law: 1000 cases of bounded size, one-sided error, " +
      "heavy-item containment under any partitioning and merge order") {
    // the whole heavyHitters composition rests on three properties of
    // the FreqAgg summary, each of which must survive ARBITRARY stream
    // partitioning and merge trees (the Aggregator contract): the
    // buffer never exceeds c entries; estimates never exceed the true
    // count and undershoot by at most n/(c+1); and every item with
    // true count STRICTLY above n/(c+1) is present in the final map.
    // Streams mix a heavy head (few items, geometric weights) with a
    // long uniform tail so eviction pressure is real.
    val gen = for {
      c <- Gen.choose(1, 24)
      nHead <- Gen.choose(0, 120)
      head <- Gen.listOfN(nHead,
        Gen.frequency(8 -> Gen.const("h0"), 4 -> Gen.const("h1"),
          2 -> Gen.const("h2"), 1 -> Gen.const("h3")))
      nTail <- Gen.choose(0, 200)
      tail <- Gen.listOfN(nTail, Gen.choose(0, 999).map(i => s"t$i"))
      xs <- Gen.const(head ++ tail)
      shuffled <- Gen.listOfN(xs.size, Gen.choose(0, 1 << 30))
        .map(ks => ks.zip(xs).sortBy(_._1).map(_._2))
      parts <- Gen.choose(1, 8)
      mergeShuffle <- Gen.listOfN(parts, Gen.choose(0, 1 << 30))
    } yield (c, shuffled, parts, mergeShuffle)
    samples(gen, 1000, 20260816L).foreach {
      case (c, xs, parts, mergeShuffle) =>
        val agg = new graft.functions.FreqAgg(c)
        val chunks = xs.zipWithIndex
          .groupBy(_._2 % parts).values.map(_.map(_._1)).toSeq
        val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
        val merged = mergeShuffle.zipAll(partials, 0, agg.zero)
          .sortBy(_._1).map(_._2)
          .foldLeft(agg.zero)(agg.merge)
        val n = xs.size.toLong
        val exact = xs.groupBy(identity).map { case (k, o) =>
          k -> o.size.toLong
        }
        assert(merged.size <= c, s"buffer exceeded c=$c: ${merged.size}")
        exact.foreach { case (k, t) =>
          val est = merged.getOrElse(k, 0L)
          assert(est <= t, s"over-estimate for $k: $est > $t (c=$c)")
          // est >= t - n/(c+1), kept in integers: (t - est)·(c+1) <= n
          assert((t - est) * (c + 1) <= n,
            s"undershoot beyond n/(c+1) for $k: est=$est true=$t n=$n c=$c")
          if (t * (c + 1) > n)
            assert(merged.contains(k),
              s"heavy item $k (true=$t > n/(c+1), n=$n, c=$c) evicted")
        }
    }
  }

  test("grouped MG truncation == the ungrouped rule applied inside " +
      "every group, random streams") {
    // mgTruncateBy is the load-bearing algebra of the grouped store:
    // each group's (c+1)-th-largest threshold, strictly-positive
    // remainder and est arithmetic must equal the ungrouped
    // deterministic rule applied to that group's substream alone —
    // pinned against a from-first-principles Scala model (not the
    // production code) over random heavy-head + uniform-tail streams.
    import spark.implicits._
    val gen = for {
      c <- Gen.choose(2, 10)
      nGrp <- Gen.choose(1, 6)
      n <- Gen.choose(0, 300)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, nGrp - 1)
        it <- Gen.frequency(6 -> Gen.const("h0"), 3 -> Gen.const("h1"),
          4 -> Gen.choose(0, 400).map(i => s"t$i"))
      } yield (s"g$g", it))
    } yield (c, rows)
    samples(gen, 20, 20260815L).foreach { case (c, rows) =>
      val got = Sketches.mgSummaryBy(rows.toDF("g", "t"), col("g"),
          col("t"), c)
        .as[(String, String, Long)].collect().toSet
      val expect = rows.groupBy(_._1).flatMap { case (g, rs) =>
        val counts = rs.groupBy(_._2).map { case (it, o) =>
          (it, o.size.toLong) }.toSeq
        val sorted = counts.sortBy { case (it, f) => (-f, it) }
        val d = if (sorted.size <= c) 0L else sorted(c)._2
        sorted.filter(_._2 > d).map { case (it, f) => (g, it, f - d) }
      }.toSet
      assert(got == expect,
        s"grouped truncation drifted (c=$c): got=$got expect=$expect")
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
