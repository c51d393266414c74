package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hard-negative mining for contrastive training
  * ([[Similarity.hardNegatives]]): most-similar vectors of a DIFFERENT
  * label, never the query's own class.
  */
class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  // label 0: the query's class, including a near-exact copy (id 1) that
  // must NOT be mined; label 1: ids 2 (very close — the hard negative)
  // and 3 (orthogonal — the easy negative)
  private lazy val emb = Seq(
    (0L, 0, vec(1, 0, 0, 0)),
    (1L, 0, vec(2, 0, 0, 0)),   // same label, cos 1 — excluded
    (2L, 1, vec(10, 1, 0, 0)),  // different label, cos ~0.995 — hardest
    (3L, 1, vec(0, 1, 0, 0)),   // different label, cos 0 — easiest
    (4L, 2, vec(1, 1, 0, 0))    // third class, cos ~0.71
  ).toDF("vec_id", "label", "embedding")

  test("mines closest other-label vectors, ranked hardest first, own class excluded") {
    val got = Similarity.hardNegatives(emb,
        emb.filter(col("vec_id") === 0L),
        "vec_id", "embedding", "label", k = 2)
      .select("query_id", "nn_id", "nn_label", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(got.map(_._2).toSeq == Seq(2L, 4L),
      s"hardest other-label first, own-class copy excluded: ${got.toSeq}")
    assert(got.forall(_._3 != 0L), "no negative may share the query label")
  }

  test("k bounds the per-query output; empty other-label corpus yields none") {
    val oneClass = emb.withColumn("label", lit(7))
    assert(Similarity.hardNegatives(oneClass,
      oneClass.filter(col("vec_id") === 0L),
      "vec_id", "embedding", "label", 3).isEmpty)
    val all = Similarity.hardNegatives(emb, emb, "vec_id", "embedding",
      "label", 1)
    val perQuery = all.groupBy("query_id").count()
      .select("count").as[Long].collect()
    assert(perQuery.forall(_ == 1L), "k=1 caps every query's negatives")
  }
}
