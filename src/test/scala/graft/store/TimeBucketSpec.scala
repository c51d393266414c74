package graft.store

import graft.SparkSpec

/** Time-bucket partitioning: time-range reads prune whole `tbucket=`
  * directories via partition pruning — strictly beyond the reference,
  * which never pushes time filters at all (SURVEY §4 "Time filter").
  */
class TimeBucketSpec extends SparkSpec {
  import spark.implicits._

  private val DAY = 86400000000000L

  private def mkDb(bucketed: Boolean): Db = {
    val db = Db(spark, tmpDir("graft-tbucket"))
    val data = (for {
      day <- 0L until 10L
      k <- Seq("a", "b", "c")
    } yield (k, day * DAY + k.length, day * 10 + k.length)).toDF("key", "ts", "v")
    TxWriter.write(db, data, rangePartitions = Some(2),
      timeBucketNanos = if (bucketed) Some(DAY) else None)
    db
  }

  test("bucketed and unbucketed reads agree exactly") {
    val flat = mkDb(bucketed = false)
    val buck = mkDb(bucketed = true)
    def dump(db: Db, a: Option[Long], b: Option[Long]) =
      db.read("%", a, b).select("key", "ts", "v")
        .as[(String, Long, Long)].collect().toSeq
    assert(dump(buck, None, None) == dump(flat, None, None))
    assert(dump(buck, Some(2 * DAY), Some(5 * DAY)) ==
      dump(flat, Some(2 * DAY), Some(5 * DAY)))
    assert(dump(buck, Some(2 * DAY + 1), None) == dump(flat, Some(2 * DAY + 1), None))
  }

  test("time range produces partition filters on tbucket") {
    val db = mkDb(bucketed = true)
    val plan = db.read("%", Some(2 * DAY), Some(5 * DAY))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tbucket"),
      s"no tbucket partition filters:\n$plan")
    // unbucketed time filters must NOT reference a tbucket column
    // (match the attribute form "tbucket#N" — the tmp *path* contains the
    // word tbucket)
    val flatPlan = mkDb(bucketed = false).read("%", Some(2 * DAY), None)
      .queryExecution.executedPlan.toString
    assert(!flatPlan.contains("tbucket#"))
  }

  test("bucket width is sticky; later writes and compaction preserve it") {
    val db = mkDb(bucketed = true)
    TxWriter.write(db, Seq(("d", 3 * DAY, 99L)).toDF("key", "ts", "v"),
      rangePartitions = Some(1)) // no option passed — inherits width
    assert(Manifest.current(db.warehouse).timeBucket == DAY)
    val before = db.read().count()
    Compactor.major(db)
    assert(Manifest.current(db.warehouse).timeBucket == DAY)
    assert(db.read().count() == before)
    val plan = db.read("%", Some(3 * DAY), Some(4 * DAY))
      .queryExecution.executedPlan.toString
    assert(plan.contains("tbucket")) // pruning still active post-compaction
  }

  test("bucket-major layout is sticky; appends and compaction inherit it") {
    val db = Db(spark, tmpDir("graft-bmajor"))
    val data = (for {
      day <- 0L until 4L; k <- Seq("a", "b", "c")
    } yield (k, day * DAY + k.length, day * 10)).toDF("key", "ts", "v")
    TxWriter.write(db, data, rangePartitions = Some(2),
      timeBucketNanos = Some(DAY), bucketMajor = true)
    assert(Manifest.current(db.warehouse).bucketMajor)
    // later write WITHOUT the flag inherits the layout
    TxWriter.write(db, Seq(("d", 2 * DAY, 99L)).toDF("key", "ts", "v"),
      rangePartitions = Some(1))
    assert(Manifest.current(db.warehouse).bucketMajor)
    val before = db.read().select("key", "ts", "v")
      .as[(String, Long, Long)].collect().sorted
    Compactor.major(db)
    assert(Manifest.current(db.warehouse).bucketMajor,
      "compaction must not drop the layout flag")
    assert(db.read().select("key", "ts", "v")
      .as[(String, Long, Long)].collect().sorted.sameElements(before))
    // key-major warehouses never flip: the flag needs a bucket width
    val flat = Db(spark, tmpDir("graft-bmajor"))
    TxWriter.write(flat, data, bucketMajor = true) // no width → ignored
    assert(!Manifest.current(flat.warehouse).bucketMajor)
  }

  test("major compaction REWRITES in the bucket-major layout: a task " +
      "writes few buckets, not one file per task x cell") {
    // the ANN-index shape: 4 cells (buckets) x 200 keys each. A key-major
    // rewrite would hand every range task all 4 buckets of its key range
    // (task x cell files — the explosion the layout exists to avoid); the
    // bucket-major rewrite keeps each task inside at most ~2 buckets, so
    // the compacted tx holds about one file per task, not per task-cell.
    val db = Db(spark, tmpDir("graft-bmajorfiles"))
    val data = (for {
      day <- 0L until 4L; k <- 0 until 200
    } yield (f"k$k%03d", day * DAY + k, day)).toDF("key", "ts", "v")
    TxWriter.write(db, data, timeBucketNanos = Some(DAY), bucketMajor = true)
    TxWriter.write(db, data.withColumn("v",
      org.apache.spark.sql.functions.col("v") + 1))
    Compactor.major(db)
    val m = Manifest.current(db.warehouse)
    assert(m.bucketMajor && m.dataTxids.size == 1)
    val dir = java.nio.file.Paths.get(db.dataDir, s"txid=${m.dataTxids.head}")
    val files = java.nio.file.Files.walk(dir)
    val nParquet = try {
      import scala.jdk.CollectionConverters._
      files.iterator().asScala.count(_.toString.endsWith(".parquet"))
    } finally files.close()
    // 32 range partitions, each contiguous in (bucket, key): ≤ 1 file per
    // partition + ≤ 1 straddle per bucket boundary. Key-major would be
    // ~4x the partition count.
    assert(nParquet <= 48, s"bucket-major compaction wrote $nParquet files")
    assert(db.read().count() == 800)
  }
}
