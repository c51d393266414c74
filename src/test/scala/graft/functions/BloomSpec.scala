package graft.functions

import graft.SparkSpec
import graft.ops.Decontaminate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def filterOf(items: Seq[Long], fpp: Double = 0.01): BloomFilter = {
    val bf = BloomFilter.create(math.max(items.size.toLong, 64L), fpp)
    items.foreach(bf.putLong)
    bf
  }

  test("no false negatives; false positives stay near fpp") {
    val inserted = (0L until 1000L).map(_ * 7919L)
    val bf = filterOf(inserted)
    assert(inserted.forall(bf.mightContainLong),
      "bloom false negative — breaks the exactness argument")
    val absent = (0L until 10000L).map(_ * 7919L + 1L)
    val fpRate = absent.count(bf.mightContainLong).toDouble / absent.size
    assert(fpRate < 0.05, s"false-positive rate $fpRate way over sizing")
  }

  test("BloomMightContain: codegen compiles and agrees with interpreted") {
    val bf = filterOf(Seq(42L, 99L))
    val exprs: Seq[Expression] = Seq(
      BloomMightContain(Literal(42L), bf),
      BloomMightContain(Literal(43L), bf),
      BloomMightContain(Literal(99L), bf))
    // GenerateUnsafeProjection has no interpreted fallback: a Janino error
    // in doGenCode throws here instead of WARN-and-degrade
    val proj = GenerateUnsafeProjection.generate(exprs)
    val row = proj(InternalRow.empty)
    exprs.zipWithIndex.foreach { case (e, i) =>
      assert(row.getBoolean(i) == e.eval(InternalRow.empty),
        s"codegen/interpreted disagree at $i")
    }
    assert(row.getBoolean(0) && row.getBoolean(2), "inserted keys must hit")
  }

  test("BloomMightContain prunes a DataFrame filter distributedly") {
    val bf = filterOf(Seq(5L, 15L, 25L))
    val kept = spark.range(0, 1000)
      .filter(BloomMightContain.probe(col("id"), bf))
      .as[Long].collect().toSet
    assert(Set(5L, 15L, 25L).subsetOf(kept), "no false negatives in plan")
    assert(kept.size < 100, s"filter barely pruned: ${kept.size} of 1000")
  }

  test("overlapsBloom == overlaps: the prefilter never changes the result") {
    val docs = (0L until 60L).map { i =>
      val words = (0 until 20).map(j => s"w${(i * 31 + j * 7) % 97}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" % 10 === 0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.filter($"doc_id" =!= $"bench_id")
        .as[(Long, Long, Long)].collect().toSet
    val exact = canon(Decontaminate.overlaps(
      docs, bench, "doc_id", "text", "doc_id", "text", 3, 2))
    val bloomed = canon(Decontaminate.overlapsBloom(
      docs, bench, "doc_id", "text", "doc_id", "text", 3, 2))
    assert(exact == bloomed)
    assert(exact.nonEmpty, "fixture produced no overlaps — test is vacuous")
  }
}
