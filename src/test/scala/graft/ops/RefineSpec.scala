package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact re-rank (refine) of an ANN shortlist — the FAISS
  * IndexRefineFlat pattern ([[Similarity.refineTopK]]).
  */
class RefineSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  // 0 is the query axis; 1, 2, 3 are progressively rotated away from it;
  // 10 is an exact copy of 0 (cos = 1); 11 is the opposite direction
  private lazy val emb = Seq(
    (0L, vec(1, 0, 0, 0)),
    (1L, vec(1, 1, 0, 0)),
    (2L, vec(1, 2, 0, 0)),
    (3L, vec(0, 1, 0, 0)),
    (10L, vec(2, 0, 0, 0)),
    (11L, vec(-1, 0, 0, 0))
  ).toDF("vec_id", "embedding")

  private lazy val q = emb.filter(col("vec_id") === 0L)

  test("refining the full corpus as shortlist equals bruteForceKnn") {
    val cand = emb.filter(col("vec_id") =!= 0L)
      .select(lit(0L).as("query_id"), col("vec_id").as("nn_id"))
    val refined = Similarity
      .refineTopK(emb, q, cand, "vec_id", "embedding", 3)
      .select("query_id", "nn_id", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    val exact = Similarity
      .bruteForceKnn(emb, q, "vec_id", "embedding", 3)
      .select("query_id", "nn_id", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(refined.toSeq == exact.toSeq)
    // and the exact order is the geometric one: the copy first, then by
    // increasing rotation
    assert(refined.map(_._2).toSeq == Seq(10L, 1L, 2L))
  }

  test("re-rank corrects a wrongly-ordered shortlist but cannot add ids") {
    // shortlist deliberately mis-ordered and missing the best id (10):
    // refine must re-rank 1 above 2 above 11 by exact cosine and must
    // NOT resurrect 10 — refinement only corrects WITHIN the shortlist
    val cand = Seq((0L, 11L), (0L, 2L), (0L, 1L))
      .toDF("query_id", "nn_id")
    val refined = Similarity
      .refineTopK(emb, q, cand, "vec_id", "embedding", 2)
      .select("nn_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(refined.toSeq == Seq((1L, 1), (2L, 2)))
  }

  test("shortlist smaller than topK returns the whole shortlist ranked") {
    val cand = Seq((0L, 3L)).toDF("query_id", "nn_id")
    val refined = Similarity
      .refineTopK(emb, q, cand, "vec_id", "embedding", 10)
      .select("nn_id", "cos", "rank").as[(Long, Double, Int)].collect()
    assert(refined.toSeq == Seq((3L, 0.0, 1)))
  }
}
