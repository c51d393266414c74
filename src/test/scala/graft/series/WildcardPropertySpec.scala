package graft.series

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property: [[SeriesOps.keyPredicate]] (exact/range/range+LIKE rewrite)
  * selects exactly the same rows as a plain `LIKE` for every pattern shape —
  * the rewrite is an access-path optimization, never a semantics change.
  * Mirrors the reference's wildcard test surface (`src/wildcard.rs`,
  * 80-case matrix shapes).
  */
class WildcardPropertySpec extends SparkSpec {
  import spark.implicits._

  private val alphabet = Seq("a", "b", "c", "fi", "fib", "z", "é", "%", "_")
  private val keyGen = Gen.listOfN(3, Gen.oneOf(alphabet)).map(_.mkString)
  private val patGen = Gen.listOfN(3,
    Gen.oneOf(alphabet :+ "%" :+ "%" :+ "")).map(_.mkString) // %-heavy

  test("keyPredicate == plain LIKE for arbitrary patterns") {
    val keys = ((1 to 400).flatMap(_ => keyGen.sample) ++
      Seq("", "fib", "fibonacci", "fic", "%", "a%b")).distinct
    val df = keys.toDF("key").cache()
    df.count()

    val patterns = ((1 to 120).flatMap(_ => patGen.sample) ++
      Seq("%", "fib%", "%fib", "f%b", "", "fib", "a%b%c", "%%")).distinct

    patterns.foreach { pat =>
      // plain-LIKE truth: only % is magic, so escape _ and \ the same way
      val w = Wildcard(pat)
      val expect = df.filter(col("key").like(w.likePattern))
        .as[String].collect().toSet
      val got = df.filter(SeriesOps.keyPredicate(col("key"), pat))
        .as[String].collect().toSet
      assert(got == expect, s"pattern '$pat': got ${got.diff(expect)} extra, " +
        s"missing ${expect.diff(got)}")
    }
    df.unpersist()
  }

  test("all-% pattern keeps null keys (lit(true), not LIKE '%')") {
    // LIKE '%' optimizes to IsNotNull(key); the full-scan pattern must
    // not silently drop a null-key row that records/compaction retain
    val df = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row("a"), org.apache.spark.sql.Row(null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.StringType, nullable = true))))
    assert(df.filter(SeriesOps.keyPredicate(col("key"), "%")).count() == 2)
  }

  test("keyPredicate is sound for non-ASCII prefixes (surrogate boundary)") {
    // U+D7FF's char-successor is an unpaired surrogate: its UTF-8 bytes
    // would mis-bound the range, so the rewrite must keep a LIKE residual
    // instead of trusting the successor. Include non-BMP (surrogate-pair)
    // keys, whose UTF-8 bytes sort above U+D7FF and must still match.
    val d7ff = "퟿"
    val nonBmp = new String(Character.toChars(0x10348)) // 𐍈
    val keys = Seq(s"k$d7ff", s"k$d7ff/a", s"k$d7ff/b", s"k$nonBmp",
      s"k$nonBmp/x", "k", "kz", s"ké/a", "é/x", "é", "z")
    val df = keys.toDF("key")
    val pats = Seq(s"k$d7ff%", s"k$d7ff/%", s"k$nonBmp%", "é%",
      s"k$d7ff%a", s"é%x")
    pats.foreach { pat =>
      val w = Wildcard(pat)
      val expect = df.filter(col("key").like(w.likePattern))
        .as[String].collect().toSet
      val got = df.filter(SeriesOps.keyPredicate(col("key"), pat))
        .as[String].collect().toSet
      assert(got == expect, s"pattern '$pat': got ${got.diff(expect)} extra, " +
        s"missing ${expect.diff(got)}")
    }
  }
}
