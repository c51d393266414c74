package graft.text

import graft.SparkSpec
import graft.store.{Db, TxWriter}

/** Typed view parity with the reference's `FromRecord` class checks
  * (`src/records.rs:456-588`, `high_level_reader` `src/tests.rs:796-827`).
  */
class TypedViewSpec extends SparkSpec {
  import spark.implicits._

  private def warehouse(lines: String*): Db = {
    val db = Db(spark, tmpDir("graft-typed"))
    TxWriter.write(db,
      TextIngest.parseWithFmt(spark, lines.toDS()).toDF(),
      rangePartitions = Some(2))
    db
  }

  test("fixed-format series reads as typed columns") {
    val db = warehouse("a 1 uu 10 20", "a 2 uu 30 40", "b 1 uu 50 60")
    val got = TypedView.flat(db.read(), "uu")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 1L, 10L, 20L), ("a", 2L, 30L, 40L), ("b", 1L, 50L, 60L)))
  }

  test("same-class widening: u read as U, f as F, i as I") {
    val db = warehouse("a 1 ufi 7 1.5 -3")
    val row = TypedView.flat(db.read(), "UFI").head()
    assert(row.getDecimal(2).longValueExact() == 7L)
    assert(row.getDouble(3) == 1.5)
    assert(row.getLong(4) == -3L)
  }

  test("cross-class and narrowing reads fail loudly (records.rs:74-114)") {
    val db = warehouse("a 1 u 7", "a 2 f 1.5") // mixed-class key
    intercept[TypedView.IncompatibleFormat](TypedView.flat(db.read(), "u"))
    intercept[TypedView.IncompatibleFormat](TypedView.flat(db.read(), "F"))
    val wide = warehouse("a 1 I 9")
    intercept[TypedView.IncompatibleFormat](TypedView.flat(wide.read(), "i")) // narrowing
    intercept[TypedView.IncompatibleFormat](TypedView.flat(wide.read(), "II")) // arity
  }

  test("u64 max survives the typed view (DecimalType(20,0))") {
    val db = warehouse("k 1 U 18446744073709551615")
    val d = TypedView.flat(db.read(), "U").head().getDecimal(2)
    assert(d.toBigInteger.toString == "18446744073709551615")
  }
}
