package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The manifest tracks the merged data schema so read planning is O(1)
  * (no per-file footer fetch); evolution unions fields, conflicts fall
  * back to parquet mergeSchema.
  */
class SchemaTrackSpec extends SparkSpec {
  import spark.implicits._

  test("schema evolves across transactions and is manifest-tracked") {
    val db = Db(spark, tmpDir("graft-schema"))
    TxWriter.write(db, Seq(("a", 1L, 10L)).toDF("key", "ts", "v"))
    TxWriter.write(db, Seq(("b", 1L, 3.5, "x")).toDF("key", "ts", "w", "s"))
    val m = db.snapshot().manifest
    assert(m.schemaDdl.nonEmpty, "schema tracked after writes")
    val tracked = org.apache.spark.sql.types.StructType.fromDDL(m.schemaDdl)
    assert(tracked.fieldNames.toSet == Set("key", "ts", "v", "w", "s"))
    // reads resolve evolved columns without mergeSchema
    val out = db.read("%").orderBy("key")
      .select("key", "v", "w", "s").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 10L && out(0).isNullAt(2))
    assert(out(1).isNullAt(1) && out(1).getDouble(2) == 3.5)
  }

  test("type conflict surrenders tracking; per-transaction reads survive") {
    val db = Db(spark, tmpDir("graft-schema2"))
    TxWriter.write(db, Seq(("a", 1L, 10L)).toDF("key", "ts", "v"))
    val c0 = db.snapshot().maxTxid
    val v0 = db.snapshot().manifest.version
    // v changes type long -> string: tracking surrenders (ddl empty);
    // no schema (ours or parquet's mergeSchema) can union long/string —
    // cross-class payload conflicts are the caller's modeling error
    // (reference: FromRecord class checks, records.rs:460-539)
    TxWriter.write(db, Seq(("b", 2L, "ten")).toDF("key", "ts", "v"))
    assert(db.snapshot().manifest.schemaDdl.isEmpty)
    // each transaction remains individually readable: time travel to the
    // pre-conflict version, and tail the post-conflict commits alone
    assert(db.snapshotAt(v0).read("%").select("v").as[Long].head() == 10L)
    assert(db.tail(c0).select("v").as[String].collect().toSeq == Seq("ten"))
  }

  test("major compaction replaces the schema (dropped columns disappear)") {
    val db = Db(spark, tmpDir("graft-schema3"))
    TxWriter.write(db, Seq(("a", 1L, 10L, "junk")).toDF("key", "ts", "v", "extra"))
    Compactor.major(db, df => df.drop("extra"))
    val ddl = db.snapshot().manifest.schemaDdl
    assert(ddl.nonEmpty &&
      !org.apache.spark.sql.types.StructType.fromDDL(ddl)
        .fieldNames.contains("extra"))
    assert(db.read("%").columns.toSet == Set("key", "ts", "v"))
  }

  test("concurrent commit during major compaction keeps its schema") {
    val db = Db(spark, tmpDir("graft-schema4"))
    TxWriter.write(db, Seq(("a", 1L, 10L)).toDF("key", "ts", "v"))
    // The transform hook runs before the cutover manifest CAS — a commit
    // made inside it models a writer racing the compaction. Its new
    // column must survive in the manifest schema: resetting the ddl to
    // only the compacted output would read `w` as silently-null.
    Compactor.major(db, { df =>
      TxWriter.write(db,
        Seq(("b", 2L, 20L, 3.5)).toDF("key", "ts", "v", "w"))
      df
    })
    val tracked = org.apache.spark.sql.types.StructType
      .fromDDL(db.snapshot().manifest.schemaDdl)
    assert(tracked.fieldNames.toSet == Set("key", "ts", "v", "w"),
      s"schema lost the concurrent tx's column: ${tracked.fieldNames.toSeq}")
    val out = db.read("%").orderBy("key").select("key", "v", "w").collect()
    assert(out.length == 2)
    assert(out(1).getString(0) == "b" && out(1).getDouble(2) == 3.5)
  }
}
