package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native [[graft.functions.IvfCell]] kernel must be value-identical
  * to the composed `array_position(coss, array_max(coss)) - 1` formulation
  * ([[Similarity.ivfCellComposed]]) — same guarded cosine, same round-to-9,
  * same first-max (lowest cell id) tie-break — across hash-generated
  * vectors, a zero vector (the guard path), and duplicated centroids
  * (forced ties). This is the pqCodesLit/pqCodesComposed rule applied to
  * cell assignment.
  */
class IvfCellSpec extends SparkSpec {
  import spark.implicits._

  test("native IvfCell equals the composed argmax at several nCells") {
    val vecs = spark.range(500).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)), i =>
        (pmod(hash(pmod(col("id"), lit(7)), i), lit(2001)) - 1000)
          .cast("double").cast("float") / 1000.0f).as("embedding"))
    val iv = vecs.select(col("vec_id"),
      Similarity.veci(col("embedding")).as("v"))
    for (nCells <- Seq(2, 16, 100, 130)) {
      val cents = iv.orderBy("vec_id").limit(nCells)
        .select("v").as[Seq[Long]].collect().map(_.toArray)
      val native = iv.select(col("vec_id"),
          Similarity.ivfCellLit(col("v"), cents).as("c"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      val composed = iv.select(col("vec_id"),
          Similarity.ivfCellComposed(col("v"), cents).as("c"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(native == composed, s"kernel drift at nCells=$nCells")
    }
  }

  test("zero vector takes the guard path; duplicated centroid ties go low") {
    val rows = Seq(
      (0L, Seq(0L, 0L, 0L, 0L)),   // zero vector: all cos = -1.0 → cell 0
      (1L, Seq(2L, 4L, 6L, 8L))    // parallel to BOTH duplicate centroids
    ).toDF("vec_id", "v")
    val cents = Array(Array(1L, 2L, 3L, 4L), Array(1L, 2L, 3L, 4L))
    val got = rows.select(col("vec_id"),
        Similarity.ivfCellLit(col("v"), cents).as("c"))
      .as[(Long, Long)].collect().toMap
    val composed = rows.select(col("vec_id"),
        Similarity.ivfCellComposed(col("v"), cents).as("c"))
      .as[(Long, Long)].collect().toMap
    assert(got == composed)
    assert(got == Map(0L -> 0L, 1L -> 0L), s"tie/guard broke: $got")
  }
}
