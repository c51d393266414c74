package graft.ops

import graft.SparkSpec
import graft.core.Graft
import org.apache.spark.sql.functions._

class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("kmeansCodebook is deterministic and covers the corpus") {
    val emb = Graft.embeddings(spark, sfDir)
    val cb1 = Similarity.kmeansCodebook(emb, "vec_id", "embedding", 8, 2)
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    val cb2 = Similarity.kmeansCodebook(emb, "vec_id", "embedding", 8, 2)
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    assert(cb1.length == 8)
    assert(cb1.map(_._2).zip(cb2.map(_._2)).forall { case (a, b) => a == b },
      "codebook must be identical across runs")
    // every corpus vector lands in exactly one cell
    val vecs = emb.select(col("vec_id"), Similarity.veci(col("embedding")).as("v"))
    val cents = Similarity.kmeansCodebook(emb, "vec_id", "embedding", 8, 2)
      .withColumnRenamed("centroid_id", "vec_id")
    val assigned = Similarity.ivfAssign(vecs, cents, "vec_id", "v")
    assert(assigned.count() == emb.count())
    assert(assigned.select("centroid_id").distinct().count() > 1,
      "training should produce multiple non-empty cells")
  }

  test("trained IVF recall is reasonable vs brute force") {
    val emb = Graft.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val exact = hits(Similarity.bruteForceKnn(emb, queries, "vec_id", "embedding", 10))
    val trained = hits(Similarity.ivfKnnTrained(emb, queries, "vec_id", "embedding", 10, 8, 2))
    // nProbe=1 IVF over 8 cells: at least a third of the true neighbors
    // should share the query's cell on this corpus (exact value is
    // data-dependent; the floor guards against a broken quantizer)
    val recall = trained.count(exact.contains).toDouble / exact.size
    assert(recall > 0.3, s"recall@10 too low: $recall")
  }
}
