package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup keep rule on a hand-checkable corpus: dim=4, nCells=2, two
  * obvious clusters. Vectors 0 and 1 are the coarse centroids
  * (first-nCells-by-id); 0/2/3 form one near-dup group in cell 0 at
  * tau=0.97 (pairwise cosines 0.994/0.9986/0.998); 4 sits in cell 1 but
  * only at cosine 0.914 to anything — a singleton.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  private def corpus: DataFrame = Seq(
    (0L, vec(1, 0, 0, 0)),
    (1L, vec(0, 1, 0, 0)),
    (2L, vec(0.9, 0.1, 0, 0)),
    (3L, vec(0.95, 0.05, 0, 0)),
    (4L, vec(0, 0.9, 0.4, 0))
  ).toDF("vec_id", "embedding")

  test("keeps the member FARTHEST from its centroid, not the min id") {
    val kept = Similarity.semDedupKeepset(corpus, "vec_id", "embedding",
        nCells = 2, tau = 0.97)
      .select(col("vec_id"), col("cell"))
      .as[(Long, Long)].collect().toMap
    // group {0,2,3} in cell 0: c2c(0)=1.0, c2c(3)≈0.9986, c2c(2)≈0.994 →
    // vec 2 survives (lowest centroid-cosine), NOT vec 0 (the min id)
    assert(kept.keySet == Set(1L, 2L, 4L), s"wrong keep-set: $kept")
    assert(kept(2L) == 0L && kept(1L) == 1L && kept(4L) == 1L)
  }

  test("no pairs above tau → everything survives") {
    val kept = Similarity.semDedupKeepset(corpus, "vec_id", "embedding",
        nCells = 2, tau = 1.1)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("explicit coarse: zero-iteration k-means equals the first-N default") {
    // kmeansCodebook with iters=0 IS the first-nCells-by-id init, so the
    // coarse parameter with it must reproduce the default path exactly
    val cents = Similarity.collectKmeansCentroids(corpus, "vec_id",
      "embedding", 2, 0)
    def rows(coarse: Option[Array[Array[Long]]]) =
      Similarity.semDedupKeepset(corpus, "vec_id", "embedding", 2, 0.97,
          coarse)
        .orderBy("vec_id").as[(Long, Long, Double)].collect().toSeq
    assert(rows(Some(cents)) == rows(None))
  }

  test("trained coarse centroids: dedup still collapses the cluster") {
    // 2 Lloyd rounds move the centroids to the cluster means; the {0,2,3}
    // near-dup group still shares a cell, so exactly one member survives,
    // and the two singletons (1, 4) always survive
    val cents = Similarity.collectKmeansCentroids(corpus, "vec_id",
      "embedding", 2, 2)
    val kept = Similarity.semDedupKeepset(corpus, "vec_id", "embedding", 2,
        0.97, Some(cents))
      .select("vec_id").as[Long].collect().toSet
    assert(kept.intersect(Set(0L, 2L, 3L)).size == 1, s"keep-set: $kept")
    assert(kept.contains(1L) && kept.contains(4L), s"keep-set: $kept")
  }
}
