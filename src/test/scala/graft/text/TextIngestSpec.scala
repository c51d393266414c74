package graft.text

import graft.SparkSpec
import graft.store.{Db, TxWriter}

/** Distributed ingest → warehouse → dump roundtrip (the reference README
  * quick-start acceptance path, `README.md:64-96`).
  */
class TextIngestSpec extends SparkSpec {
  import spark.implicits._

  test("fibonacci quick-start: ingest text, store, read back identically") {
    val input = Seq(
      "fibonacci 2020-01-01T00:00:00 1",
      "fibonacci 2020-01-02T00:00:00 1",
      "fibonacci 2020-01-03T00:00:00 2",
      "fibonacci 2020-01-04T00:00:00 3",
      "fibonacci 2020-01-05T00:00:00 5",
      "fibonacci 2020-01-06T00:00:00 8"
    )
    val recs = TextIngest.parse(spark, input.toDS(), "u")
    val db = Db(spark, tmpDir("graft-text"))
    TxWriter.write(db, recs.toDF(), rangePartitions = Some(2))

    val out = TextIngest.print(spark,
      TextIngest.asRecords(db.read("fib%")), tsAsNanos = false)
      .collect().toSeq
    assert(out == Seq(
      "fibonacci\t2020-01-01T00:00:00\t1",
      "fibonacci\t2020-01-02T00:00:00\t1",
      "fibonacci\t2020-01-03T00:00:00\t2",
      "fibonacci\t2020-01-04T00:00:00\t3",
      "fibonacci\t2020-01-05T00:00:00\t5",
      "fibonacci\t2020-01-06T00:00:00\t8"))
  }

  test("per-line formats and mixed types survive the warehouse") {
    val input = Seq(
      "a 1 u 42",
      "a 2 f 32.5",
      "a 3 s Hello\\ world",
      "b 1 B SGVsbG8x",
      "b 2 U 18446744073709551615"
    )
    val recs = TextIngest.parseWithFmt(spark, input.toDS())
    val db = Db(spark, tmpDir("graft-text2"))
    TxWriter.write(db, recs.toDF(), rangePartitions = Some(2))

    val out = TextIngest.print(spark,
      TextIngest.asRecords(db.read()), showFmt = true).collect().toSeq
    assert(out == Seq(
      "a\t1\tu\t42",
      "a\t2\tf\t32.50000000000000000",
      "a\t3\ts\tHello\\ world",
      "b\t1\tB\tSGVsbG8x",
      "b\t2\tU\t18446744073709551615"))
  }
}
