package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** The whole oracle strategy rests on three implementations of h60 being
  * value-identical: the native expression (Spark hot path), the built-in
  * composition (what the DuckDB SQL mirrors), and the driver-side JVM
  * function. Property-test all three against each other.
  */
class PortableHashSpec extends SparkSpec {
  import spark.implicits._

  test("native Md5Prefix60 == conv(substring(md5)) == JVM twin") {
    val strings = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf('a', 'b', ' ', 'é', '日')).map(_.mkString)
    )
    val samples = (1 to 200).flatMap(_ => strings.sample) :+ "" :+ "fib%" :+
      "plane:3:17" :+ ("x" * 10000)
    val df = samples.toDF("s")
      .withColumn("native", PortableHash.h60(col("s")))
      .withColumn("composed", PortableHash.h60Composed(col("s")))
      .collect()
      .foreach { r =>
        val s = r.getString(0)
        assert(r.getLong(1) == r.getLong(2), s"native != composed for '$s'")
        assert(r.getLong(1) == graft.ops.Multimodal.h60jvm(s), s"jvm twin for '$s'")
      }
  }

  test("affine family stays within int64 bounds") {
    (0 until 64).foreach { i =>
      val (a, b) = PortableHash.affineCoeffs(i)
      assert(a >= 0 && a < PortableHash.P && b >= 0 && b < PortableHash.P)
      // worst case product must not overflow
      assert(a <= (Long.MaxValue - PortableHash.P) / PortableHash.P)
    }
  }

  test("native LongVecDot == higher-order composition") {
    val vecs = (1 to 50).map { i =>
      ((1 to 64).map(j => (i * j * 2654435761L) % 4000001L - 2000000L),
        (1 to 64).map(j => (i + j * 40503L) % 4000001L - 2000000L))
    }
    vecs.toDF("a", "b")
      .select(
        Similarity.dotInt(col("a"), col("b")).as("native"),
        Similarity.dotIntComposed(col("a"), col("b")).as("composed"))
      .collect()
      .foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("native SimHash32 == 32-filter composition") {
    val hss = (0 to 60).map { i =>
      (0 until (i % 7) * 9 + 1).map(j =>
        graft.ops.Multimodal.h60jvm(s"tok:$i:$j") % PortableHash.P)
    } :+ Seq(0L) :+ Seq(Long.MaxValue >>> 4)
    Seq(32, 60, 1).foreach { bits =>
      hss.toDF("hs")
        .select(
          Dedup.simhashOf(col("hs"), bits).as("native"),
          Dedup.simhashOfComposed(col("hs"), bits).as("composed"))
        .collect()
        .foreach(r => assert(r.getLong(0) == r.getLong(1), s"bits=$bits"))
    }
  }

  test("native expressions callable from SQL after configure") {
    graft.core.Graft.configure(spark)
    val r = spark.sql(
      "SELECT md5_prefix60('hello world') AS h, " +
        "long_vec_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").head()
    assert(r.getLong(1) == 32L)
    assert(r.getLong(0) == graft.ops.Multimodal.h60jvm("hello world"))
  }

  test("codegen and interpreted paths agree") {
    // force interpreted evaluation via a non-codegen context: eval directly
    val e = graft.functions.Md5Prefix60(
      org.apache.spark.sql.catalyst.expressions.Literal("hello world"))
    val interpreted = e.eval(null).asInstanceOf[Long]
    val viaDf = Seq("hello world").toDF("s")
      .select(PortableHash.h60(col("s"))).as[Long].head()
    assert(interpreted == viaDf)
  }
}
