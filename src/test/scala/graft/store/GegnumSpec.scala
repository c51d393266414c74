package graft.store

import graft.SparkSpec
import graft.text.TextIngest

/** `--gegnum` transform-compaction parity (sonnerie `src/main.rs:429-477`):
  * the database round-trips through an external command as text-protocol
  * lines and the re-ingested stdout becomes the compacted database.
  */
class GegnumSpec extends SparkSpec {
  import spark.implicits._

  test("pipe the whole db through a shell filter and re-ingest") {
    val db = Db(spark, tmpDir("graft-gegnum"))
    val lines = Seq(
      "apple 1 u 10",
      "banana 2 u 20",
      "cherry 3 u 30",
      "berry 4 s Hi\\ there"
    ).toDS()
    TxWriter.write(db, TextIngest.parseWithFmt(spark, lines).toDF(),
      rangePartitions = Some(2))

    Compactor.gegnum(db, "grep -v ^b") // drop keys starting with 'b'

    val out = TextIngest.print(spark, TextIngest.asRecords(db.read()),
      tsAsNanos = true, showFmt = true).collect().toSeq
    assert(out == Seq("apple\t1\tu\t10", "cherry\t3\tu\t30"))
  }

  test("gegnum --timestamp-format: subprocess sees strftime timestamps") {
    val db = Db(spark, tmpDir("graft-gegnum2"))
    val lines = Seq(
      "a 1577836800000000000 u 1", // 2020-01-01T00:00:00
      "b 1577923200000000000 u 2"  // 2020-01-02T00:00:00
    ).toDS()
    TxWriter.write(db, TextIngest.parseWithFmt(spark, lines).toDF())

    // the filter matches the FORMATTED timestamp — proof the subprocess
    // saw strftime output; re-ingest parses the same layout back to nanos
    Compactor.gegnum(db, "grep 2020-01-02", Some("%FT%T"))

    val out = TextIngest.print(spark, TextIngest.asRecords(db.read()),
      tsAsNanos = true, showFmt = true).collect().toSeq
    assert(out == Seq("b\t1577923200000000000\tu\t2"))
  }
}
