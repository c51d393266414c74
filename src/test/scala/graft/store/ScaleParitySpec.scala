package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded deterministic scale tests — the Spark re-expression of the
  * reference's `make_keynames`/`make_big_database` harness
  * (sonnerie `src/tests.rs:19-84`, `parallel_split1/2/3` `:705-785`):
  * systematic key enumeration, LCG-seeded record counts, and the invariant
  * that serial and parallel (different partitioning) reads see exactly the
  * same database.
  */
class ScaleParitySpec extends SparkSpec {
  import spark.implicits._

  /** `a, b, …, z, aa, ab, …` — lexicographic by construction at equal
    * length; we sort globally, as key order comes from the engine.
    */
  private def keyNames(n: Int): Seq[String] = {
    def name(i: Int): String = {
      var x = i + 1
      val sb = new StringBuilder
      while (x > 0) { x -= 1; sb.append(('a' + x % 26).toChar); x /= 26 }
      sb.reverse.toString
    }
    (0 until n).map(name)
  }

  /** Deterministic LCG (numerical recipes constants), seed 2001 like the
    * reference's SmallRng seed — our oracle is self-computed counts.
    */
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)

  private val nKeys = 500
  private val keys = keyNames(nKeys)
  private val counts = lcg(2001L).map(v => math.floorMod(v, 100L)).take(nKeys).toVector
  private val totalRecords = counts.sum

  private def records = keys.zip(counts).flatMap { case (k, n) =>
    (0L until n).map(t => (k, t, t * 31 + k.length))
  }

  test("serial == parallel: counts and content survive any partitioning") {
    val df = records.toDF("key", "ts", "v")
    val serial = Db(spark, tmpDir("graft-serial"))
    TxWriter.write(serial, df.coalesce(1), rangePartitions = Some(1))
    val parallel = Db(spark, tmpDir("graft-parallel"))
    TxWriter.write(parallel, df.repartition(16), rangePartitions = Some(16))

    assert(serial.read().count() == totalRecords)
    assert(parallel.read().count() == totalRecords)

    // content hash over the full ordered stream must match exactly
    def contentHash(db: Db): Long =
      db.read().select(
        sum(hash(col("key"), col("ts"), col("v")).cast("long"))).as[Long].head()
    assert(contentHash(serial) == contentHash(parallel))
  }

  test("range scans split at arbitrary keys partition the whole database") {
    val db = Db(spark, tmpDir("graft-range"))
    TxWriter.write(db, records.toDF("key", "ts", "v"), rangePartitions = Some(8))
    val snap = db.snapshot()
    val splits: Seq[Option[String]] = Seq(None, Some("f"), Some("m"), Some("t"), None)
    val pieces = splits.sliding(2).map {
      case Seq(from, until) =>
        graft.series.SeriesOps.keyRange(snap.read(), from, until).count()
    }.toSeq
    assert(pieces.sum == totalRecords, s"pieces $pieces")
  }

  test("per-key record counts match the generator") {
    val db = Db(spark, tmpDir("graft-counts"))
    TxWriter.write(db, records.toDF("key", "ts", "v"), rangePartitions = Some(8))
    val got = db.read().groupBy("key").count()
      .as[(String, Long)].collect().toMap
    keys.zip(counts).foreach { case (k, n) =>
      assert(got.getOrElse(k, 0L) == n, s"key $k")
    }
  }
}
