package graft

import org.apache.spark.sql.functions._

import graft.core.Graft
import graft.store.{Db, TxWriter}

/** The reference's `parallel_very_slow` scale-parity test
  * (`src/tests.rs:788-793`: a ~499 M-record database read serially and in
  * parallel must agree exactly), re-expressed at the 100 M+ scale the
  * sandbox fits comfortably: deterministic LCG-seeded per-key counts,
  * data GENERATED DISTRIBUTED (per-key `sequence` explode — never a
  * driver-side collection), written under two different range
  * partitionings, then compared by exact total, per-key counts against
  * the generator, and a full content hash.
  *
  * `sbt "runMain graft.ScaleParity [nKeys] [avgPerKey]"` (default
  * 20000 × ~5000 ≈ 100 M records).
  */
object ScaleParity {

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)

  def main(args: Array[String]): Unit = {
    val nKeys = args.headOption.map(_.toInt).getOrElse(20000)
    val avg = args.lift(1).map(_.toInt).getOrElse(5000)
    val spark = Graft.localSession(
      Runtime.getRuntime.availableProcessors().min(32), 64)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val counts = lcg(2001L).map(v => math.floorMod(v, 2L * avg))
      .take(nKeys).toVector
    val total = counts.sum
    println(s"SCALEPARITY keys=$nKeys totalRecords=$total")

    // nKeys driver rows is all that crosses the driver; the records
    // themselves materialize executor-side via sequence+explode
    val keysDf = (0 until nKeys)
      .map(i => (f"key-$i%08d", counts(i))).toDF("key", "cnt")
      .repartition(256).filter(col("cnt") > 0)
    val df = keysDf
      .select(col("key"),
        explode(sequence(lit(0L), col("cnt") - 1)).as("ts"))
      .withColumn("v", col("ts") * 31 + length(col("key")))

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALEPARITY $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val whA = java.nio.file.Files.createTempDirectory("graft-parityA").toString
    val whB = java.nio.file.Files.createTempDirectory("graft-parityB").toString
    val a = Db(spark, whA)
    val b = Db(spark, whB)
    timed("ingest A (8 ranges)")(
      TxWriter.write(a, df, rangePartitions = Some(8)))
    timed("ingest B (64 ranges)")(
      TxWriter.write(b, df, rangePartitions = Some(64)))

    val cntA = timed("count A")(a.read().count())
    val cntB = timed("count B")(b.read().count())
    assert(cntA == total, s"A: $cntA != $total")
    assert(cntB == total, s"B: $cntB != $total")

    // every per-key count must match the LCG generator exactly
    val gotA = timed("per-key counts A")(
      a.read().groupBy("key").count().as[(String, Long)].collect().toMap)
    (0 until nKeys).foreach { i =>
      val k = f"key-$i%08d"
      assert(gotA.getOrElse(k, 0L) == counts(i),
        s"key $k: ${gotA.getOrElse(k, 0L)} != ${counts(i)}")
    }

    def contentHash(db: Db): Long = db.read().select(
      sum(hash(col("key"), col("ts"), col("v")).cast("long"))).as[Long].head()
    val hA = timed("content hash A")(contentHash(a))
    val hB = timed("content hash B")(contentHash(b))
    assert(hA == hB, s"content hash mismatch: $hA != $hB")
    println(s"SCALEPARITY OK total=$total hash=$hA")
    spark.stop()
  }
}
