package graft

import graft.core.Graft
import graft.store._

/** CLI walkthrough of the warehouse lifecycle — the engine's equivalent of
  * the reference README quick-start (`README.md:64-96`): ingest, upsert,
  * wildcard read, range delete, compaction. Run:
  * `sbt "runMain graft.Demo [warehouseDir]"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession(4, 4)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val wh = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val db = Db(spark, wh)

    val d0 = 1577836800000000000L // 2020-01-01T00:00:00 in epoch nanos
    val day = 86400000000000L
    println(s"warehouse: $wh")

    TxWriter.write(db, Seq(
      ("fibonacci", d0, 1L), ("fibonacci", d0 + day, 1L),
      ("fibonacci", d0 + 2 * day, 2L), ("fibonacci", d0 + 3 * day, 3L),
      ("other", d0, 9L)).toDF("key", "ts", "v"))
    TxWriter.write(db, Seq(("fibonacci", d0 + 3 * day, 5L)).toDF("key", "ts", "v"))
    println("read 'fib%' (last-writer-wins upsert visible at day 3):")
    db.read("fib%").show(false)

    TxWriter.deleteAt(db, "fibonacci", d0)
    println("after deleteAt(day 0):")
    db.read("fib%").show(false)

    Compactor.major(db)
    Compactor.vacuum(db, graceMs = 0L)
    println("after major compaction + vacuum:")
    db.read("%").show(false)
    println("manifest: " + Manifest.current(wh).json)

    // Text protocol roundtrip (reference `add` / `read` CLI, README.md:64-96)
    val tdb = Db(spark, java.nio.file.Files.createTempDirectory("graft-demo-text").toString)
    val lines = Seq(
      "city/sf 2020-01-01T00:00:00 ff 37.77 -122.41",
      "city/sf 2020-01-02T00:00:00 ff 37.78 -122.42",
      "greeting 2020-01-01T00:00:00 s Hello\\ world"
    ).toDS()
    TxWriter.write(tdb, graft.text.TextIngest.parseWithFmt(spark, lines).toDF())
    println("text-protocol dump (human timestamps, with formats):")
    graft.text.TextIngest
      .print(spark, graft.text.TextIngest.asRecords(tdb.read()),
        tsAsNanos = false, showFmt = true)
      .collect()
      .foreach(println)
    spark.stop()
  }
}
