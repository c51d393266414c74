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
}
