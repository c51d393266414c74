package graft

import org.apache.spark.sql.functions._

/** [[PipelineQueries.boundDrift]]: the session-cached `*_append_only`
  * warehouses accumulate one transaction per bench invocation — the
  * bound compacts the history so pass N measures the same store state
  * as pass 1, and stays out of the way below the bound.
  */
class DriftBoundSpec extends SparkSpec {
  import spark.implicits._

  test("beyond the bound the history compacts to one tx; values survive") {
    val db = graft.store.Db(spark,
      java.nio.file.Files.createTempDirectory("graft-drift").toString)
    // K idempotent "appends": same (key, ts) rows every pass — the
    // append_only device — plus one unique row per pass
    for (i <- 0 to PipelineQueries.DriftBound) {
      graft.store.TxWriter.write(db,
        (Seq(("stable", 1L, 42L)) :+ ((s"pass$i", 2L, i.toLong)))
          .toDF("key", "ts", "v"))
    }
    assert(db.snapshot().manifest.dataTxids.size ==
      PipelineQueries.DriftBound + 1)
    PipelineQueries.boundDrift(db)
    val m = db.snapshot().manifest
    assert(m.dataTxids.size == 1,
      s"history must collapse past the bound: ${m.dataTxids}")
    val vals = db.read("%").select("key", "v")
      .as[(String, Long)].collect().toMap
    assert(vals("stable") == 42L)
    for (i <- 0 to PipelineQueries.DriftBound)
      assert(vals(s"pass$i") == i.toLong, s"pass$i lost in compaction")
    // below the bound: a no-op (steady-state passes pay nothing)
    graft.store.TxWriter.write(db, Seq(("x", 3L, 1L)).toDF("key", "ts", "v"))
    val before = db.snapshot().manifest.dataTxids
    PipelineQueries.boundDrift(db)
    assert(db.snapshot().manifest.dataTxids == before,
      "below the bound, boundDrift must not touch the warehouse")
  }
}
