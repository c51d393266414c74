package graft.ops

import graft.SparkSpec
import graft.store.Db
import org.apache.spark.sql.functions._

/** The persisted residual IVF+PQ index (`buildIndex(byResidual = true)`):
  * the CELL_FLAGS row makes residual-vs-raw a property of the INDEX, so
  * append and both probe paths encode/score the way the build did without
  * the caller restating it.
  */
class ResidualPersistedSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private val m = 8
  private val k = 16
  private val nCells = 8

  private lazy val emb = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(nCells, dim)(rnd.nextDouble() * 2 - 1)
    (0 until 160).map { i =>
      val c = centers(i % nCells)
      (i.toLong, c.map(x => (x + (rnd.nextDouble() * 2 - 1) * 0.25).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private lazy val cents =
    Similarity.collectKmeansCentroids(emb, "vec_id", "embedding", nCells, 2)

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "nn_id", "adist", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4)).toSeq

  test("persisted residual probe equals the in-memory residual path") {
    val db = Db(spark, tmpDir("resid-ix"))
    Similarity.buildIndex(db, emb, "vec_id", "embedding", nCells, m, k, dim,
      coarse = Some(cents), byResidual = true)
    val q = emb.filter(col("vec_id") < 4)
    val persisted = Similarity.ivfPqProbePersisted(db, q, "vec_id",
      "embedding", 5, m, dim)
    val inMemory = Similarity.ivfPqKnnResidual(emb, q, "vec_id",
      "embedding", 5, nCells, m, k, dim, 2, 1, Some(cents))
    assert(collect(persisted) == collect(inMemory))
  }

  test("relational batch probe equals the literal probe on a residual " +
    "index (multi-probe)") {
    val db = Db(spark, tmpDir("resid-rel"))
    Similarity.buildIndex(db, emb, "vec_id", "embedding", nCells, m, k, dim,
      coarse = Some(cents), byResidual = true)
    val q = emb.filter(col("vec_id") < 6)
    val lit = Similarity.ivfPqProbePersisted(db, q, "vec_id", "embedding",
      5, m, dim, nProbe = 2)
    val rel = Similarity.ivfPqProbePersistedRelational(db, q, "vec_id",
      "embedding", 5, m, dim, nProbe = 2)
    assert(collect(lit) == collect(rel))
  }

  test("append to a residual index encodes residually: an appended exact " +
    "duplicate ranks first") {
    val db = Db(spark, tmpDir("resid-app"))
    Similarity.buildIndex(db, emb.filter(col("vec_id") < 150), "vec_id",
      "embedding", nCells, m, k, dim, coarse = Some(cents),
      byResidual = true)
    // append vector 150..159 plus an exact duplicate of vector 3
    val dup = emb.filter(col("vec_id") === 3L)
      .select(lit(9003L).as("vec_id"), col("embedding"))
    Similarity.appendToIndex(db,
      emb.filter(col("vec_id") >= 150).unionByName(dup),
      "vec_id", "embedding", m, dim)
    val r = Similarity.ivfPqProbePersisted(db,
        emb.filter(col("vec_id") === 3L), "vec_id", "embedding", 3, m, dim)
      .select("nn_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(r.head._1 == 9003L,
      s"appended duplicate should rank 1: got ${r.toSeq}")
  }

  test("rebuilding raw over a residual index clears the flag") {
    val db = Db(spark, tmpDir("resid-flag"))
    Similarity.buildIndex(db, emb, "vec_id", "embedding", nCells, m, k, dim,
      coarse = Some(cents), byResidual = true)
    val cb = Similarity.pqTrainedCodebook(emb, "vec_id", "embedding",
      m, k, dim, 2)
    Similarity.buildIndex(db, emb, "vec_id", "embedding", nCells, m, k, dim,
      codebook = Some(cb), coarse = Some(cents))
    val q = emb.filter(col("vec_id") < 4)
    val persisted = Similarity.ivfPqProbePersisted(db, q, "vec_id",
      "embedding", 5, m, dim)
    val raw = Similarity.ivfPqKnnWith(emb, q, "vec_id", "embedding", 5, cb,
      nCells, m, dim, coarse = Some(cents))
    assert(collect(persisted) == collect(raw),
      "after a raw rebuild the probe must score raw, not residual")
  }
}
