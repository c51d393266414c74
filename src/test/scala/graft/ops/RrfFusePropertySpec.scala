package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, rng}

/** Property pin `rrfFuseLocal == rrfFuse`: the serving tier fuses the
  * hybrid verb's two bounded rank lists DRIVER-SIDE
  * ([[Retrieval.rrfFuseLocal]]) while every relational consumer goes
  * through [[Retrieval.rrfFuse]] — the two implementations must be
  * value-identical or `/_query/hybrid` silently drifts from
  * `ret_hybrid_rrf`'s oracle. 1000 pure-seed adversarial cases
  * (StrftimePropertySpec's device — reruns bit-identical): random
  * overlap and fully disjoint doc sets, queries missing from one side,
  * empty sides, score ties broken by doc_id, and k at the edges (1,
  * interior, beyond every list). All cases fuse in ONE relational call
  * per k — query ids are namespaced per case — so the pin costs three
  * Spark jobs, not 3000.
  */
class RrfFusePropertySpec extends SparkSpec {
  import spark.implicits._

  private val seed0 = rng.Seed(20260814L)

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    var seed = seed0
    (1 to n).map { _ =>
      val r = g.doPureApply(Gen.Parameters.default, seed)
      seed = r.seed
      r.retrieve.get
    }
  }

  /** One case: per query, each side draws 0..8 distinct docs from a
    * 12-doc universe (overlap, disjointness, one-sided and empty lists
    * all arise naturally) in a seed-determined order that becomes the
    * side's ranking 1..n.
    */
  private val caseGen: Gen[Seq[(Seq[Int], Seq[Int])]] =
    for {
      nq <- Gen.choose(1, 3)
      qs <- Gen.listOfN(nq, for {
        na <- Gen.choose(0, 8)
        nb <- Gen.choose(0, 8)
        da <- Gen.pick(na, 0 until 12)
        db <- Gen.pick(nb, 0 until 12)
      } yield (da.toSeq, db.toSeq))
    } yield qs

  test("1000 adversarial rank-list pairs fuse identically (k = 1, 3, 100)") {
    val cases = samples(caseGen, 1000)
    def side(pick: ((Seq[Int], Seq[Int])) => Seq[Int]) =
      cases.zipWithIndex.flatMap { case (qs, ci) =>
        qs.zipWithIndex.flatMap { case (q, qi) =>
          val qid = ci.toLong * 10 + qi
          pick(q).zipWithIndex.map { case (d, i) =>
            (qid, d.toLong, (i + 1).toLong)
          }
        }
      }
    val a = side(_._1)
    val b = side(_._2)
    val aDf = a.toDF("query_id", "doc_id", "rank")
    val bDf = b.toDF("query_id", "doc_id", "rank")
    for (k <- Seq(1, 3, 100)) {
      val relational = Retrieval.rrfFuse(aDf, bDf, k)
        .as[(Long, Long, Double, Long)].collect().toSeq
        .sortBy(t => (t._1, t._4))
      val local = Retrieval.rrfFuseLocal(a, b, k)
        .sortBy(t => (t._1, t._4))
      assert(local == relational,
        s"k=$k drift: ${local.diff(relational).take(5)} vs " +
          s"${relational.diff(local).take(5)}")
    }
  }
}
