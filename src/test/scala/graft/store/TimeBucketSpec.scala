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
}
