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
    Compactor.vacuum(db)
    println("after major compaction + vacuum:")
    db.read("%").show(false)
    println("manifest: " + Manifest.current(wh).json)
    spark.stop()
  }
}
