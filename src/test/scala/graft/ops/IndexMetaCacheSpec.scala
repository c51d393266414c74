package graft.ops

import graft.SparkSpec
import graft.store.Db
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The probe-side train-artifact cache and the rebuild delete scope:
  *  - [[Similarity.readIndexMeta]] keeps only the LATEST manifest version
  *    per (warehouse, m) — a streaming ingest appends once per
  *    micro-batch, each advancing the manifest, so without eviction the
  *    driver would accumulate one dead centroids+codebook entry per batch;
  *  - [[Similarity.buildIndex]]'s rebuild delete markers are scoped to the
  *    index keyspace (`v/ c/ b/`), so a warehouse holding other rows
  *    alongside the index keeps them across a rebuild.
  */
class IndexMetaCacheSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  private def corpus: DataFrame = Seq(
    (0L, vec(1, 0, 0, 0, 0, 0, 0, 1)),
    (1L, vec(0, 1, 0, 0, 0, 0, 1, 0)),
    (2L, vec(0.9, 0.1, 0, 0, 0, 0, 0.1, 0.9)),
    (3L, vec(0.1, 0.9, 0, 0, 0, 0, 0.9, 0.1))
  ).toDF("vec_id", "embedding")

  private def build(db: Db): Long =
    Similarity.buildIndex(db, corpus, "vec_id", "embedding",
      nCells = 2, m = 2, k = 4, dim = dim)

  private def probe(db: Db): Long =
    Similarity.ivfPqProbePersisted(db, corpus.filter(col("vec_id") === 2L),
      "vec_id", "embedding", topK = 3, m = 2, dim = dim).count()

  test("meta cache keeps only the latest manifest version per warehouse") {
    val db = Db(spark, tmpDir("graft-metacache"))
    build(db)
    probe(db)
    val v1 = Similarity.cachedIndexMetaVersions(db.warehouse)
    assert(v1.size == 1)
    // three appends = three manifest advances (a micro-batch stream in
    // miniature); each probe must leave exactly one live entry behind
    for (i <- 0 until 3) {
      Similarity.appendToIndex(db,
        Seq((10L + i, vec(0.8, 0, 0.1, 0, 0, 0.1, 0, 0.8)))
          .toDF("vec_id", "embedding"),
        "vec_id", "embedding", m = 2, dim = dim)
      probe(db)
    }
    val vN = Similarity.cachedIndexMetaVersions(db.warehouse)
    assert(vN.size == 1, s"stale cache entries survived: $vN")
    assert(vN.head > v1.head)
  }

  test("rebuild deletes only the index keyspace, not co-resident rows") {
    val db = Db(spark, tmpDir("graft-metacache"))
    build(db)
    // co-resident non-index rows (key prefix outside v/ c/ b/), same
    // columns as the codes table so the snapshot schema stays uniform
    val other = Seq(("z/sensor", 7L, 99L, -1L, Seq(1L, 2L)))
      .toDF("key", "ts", "nn_id", "sub", "codes")
    graft.store.TxWriter.write(db, other)
    build(db) // rebuild — markers must not cover z/
    val survived = db.snapshot().read("z/%")
    assert(survived.count() == 1)
    // and the rebuild still superseded the old index rows: exactly one
    // codes row per vector
    val codes = db.snapshot().read("v/%").groupBy(col("key"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
    assert(codes.count() == 0)
  }
}
