package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product-quantization codebook, encoding and ADC search.
  * Small dim=8 / m=2 / k=4 geometry so expected codes are hand-checkable.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  // vectors 0..3 are the codebook (first-k-by-id quantizer); 100 is an
  // exact copy of 0; 101 differs from 0 only in the second subspace,
  // where it matches 2; 102 is far from everything
  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)
  private lazy val emb = Seq(
    (0L, vec(1, 0, 0, 0, 0, 0, 0, 1)),
    (1L, vec(0, 1, 0, 0, 0, 0, 1, 0)),
    (2L, vec(0, 0, 1, 0, 0, 1, 0, 0)),
    (3L, vec(0, 0, 0, 1, 1, 0, 0, 0)),
    (100L, vec(1, 0, 0, 0, 0, 0, 0, 1)),
    (101L, vec(1, 0, 0, 0, 0, 1, 0, 0)),
    (102L, vec(-1, -1, -1, -1, -1, -1, -1, -1))
  ).toDF("vec_id", "embedding")

  test("pqCodebook: m*k entries, subvectors of subDim") {
    val cb = Similarity.pqCodebook(emb, "vec_id", "embedding",
      m = 2, k = 4, dim = dim)
    val rows = cb.as[(Long, Int, Seq[Long], Long)].collect()
    assert(rows.length == 2 * 4)
    assert(rows.forall(_._3.length == dim / 2))
    // entry c of subspace m is the m-th slice of vector with the c-th
    // smallest id: c=2, m=1 -> second half of vec 2 = (0, 1, 0, 0) * 1e6
    val e = rows.find(r => r._1 == 2L && r._2 == 1).get
    assert(e._3 == Seq(0L, 1000000L, 0L, 0L))
  }

  test("pqEncode: codebook members encode to themselves; ties go low") {
    val cb = Similarity.pqCodebook(emb, "vec_id", "embedding",
      m = 2, k = 4, dim = dim)
    val vecs = emb.select(col("vec_id"),
      Similarity.veci(col("embedding")).as("v"))
    val codes = Similarity.pqEncode(vecs, cb, "vec_id", "v", m = 2, dim = dim)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(_._3).toSeq
      }
    assert(codes(0L) == Seq(0L, 0L))
    assert(codes(1L) == Seq(1L, 1L))
    assert(codes(100L) == Seq(0L, 0L), "exact copy gets the same codes")
    assert(codes(101L) == Seq(0L, 2L), "second subspace matches entry 2")
  }

  test("pqAdcKnn: an exact duplicate is the rank-1 neighbor at distance 0") {
    val r = Similarity.pqAdcKnn(emb, emb.filter(col("vec_id") === 0L),
        "vec_id", "embedding", topK = 3, m = 2, k = 4, dim = dim)
      .select("query_id", "nn_id", "adist", "rank")
      .as[(Long, Long, Long, Int)].collect()
      .sortBy(_._4)
    assert(r.head == ((0L, 100L, 0L, 1)),
      "identical vector at ADC distance 0")
    assert(r.forall(_._3 >= 0L))
  }

  test("native PqEncode kernel equals the composed column formulation") {
    val cb = Similarity.collectCodebook(emb, "vec_id", "embedding",
      m = 2, k = 4, dim = dim)
    val vecs = emb.select(col("vec_id"),
      Similarity.veci(col("embedding")).as("v")).orderBy("vec_id")
    def run(c: org.apache.spark.sql.Column) =
      vecs.select(c.as("codes")).as[Seq[Long]].collect().toSeq
    assert(run(Similarity.pqCodesLit(col("v"), cb, dim / 2)) ==
      run(Similarity.pqCodesComposed(col("v"), cb, dim / 2)))
  }

  test("literal-LUT plan equals the relational formulation") {
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "nn_id", "adist", "rank")
        .as[(Long, Long, Long, Int)].collect().sortBy(t => (t._1, t._4)).toSeq
    val proj = collect(Similarity.pqAdcKnn(emb, emb.filter(col("vec_id") < 2),
      "vec_id", "embedding", topK = 5, m = 2, k = 4, dim = dim))
    val rel = collect(Similarity.pqAdcKnnRelational(emb,
      emb.filter(col("vec_id") < 2),
      "vec_id", "embedding", topK = 5, m = 2, k = 4, dim = dim))
    assert(proj == rel)
    assert(proj.nonEmpty)
  }

  test("ivfPqKnn: exact duplicate lands in the same cell, ADC distance 0") {
    val r = Similarity.ivfPqKnn(emb, emb.filter(col("vec_id") === 0L),
        "vec_id", "embedding", topK = 3, nCells = 2, m = 2, k = 4, dim = dim)
      .select("query_id", "nn_id", "adist", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(r.head == ((0L, 100L, 0L, 1)))
  }

  test("ivfPqKnn results are the cell-filtered subset of full ADC scoring") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "nn_id", "adist")
        .as[(Long, Long, Long)].collect().toSet
    val adc = pairs(Similarity.pqAdcKnn(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", topK = 100, m = 2, k = 4, dim = dim))
    val ivf = pairs(Similarity.ivfPqKnn(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", topK = 100, nCells = 2, m = 2, k = 4, dim = dim))
    assert(ivf.nonEmpty)
    assert(ivf.subsetOf(adc),
      "in-cell ADC scores must agree with the unfiltered ADC scan")
  }

  test("pqAdcKnn with an empty query set returns an empty, well-typed frame") {
    val r = Similarity.pqAdcKnn(emb, emb.filter(col("vec_id") < 0),
      "vec_id", "embedding", topK = 3, m = 2, k = 4, dim = dim)
    assert(r.columns.toSeq == Seq("query_id", "nn_id", "adist", "rank"))
    assert(r.count() == 0)
  }

  test("pqAdcKnn is deterministic") {
    def run() = Similarity.pqAdcKnn(emb, emb.filter(col("vec_id") < 2),
        "vec_id", "embedding", topK = 5, m = 2, k = 4, dim = dim)
      .select("query_id", "nn_id", "adist", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(t => (t._1, t._4)).toSeq
    assert(run() == run())
  }

  test("PqEncode: structurally identical expressions are semanticEquals") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val cb = Similarity.collectCodebook(emb, "vec_id", "embedding",
      m = 2, k = 4, dim = dim)
    val v = Similarity.veci(col("embedding"))
    // two independent builds share no Array instances, so case-class
    // reference equality would return false — value equality must hold
    // for Catalyst CSE / exchange reuse to see them as the same encoder
    val a = ColumnBridge.expression(Similarity.pqCodesLit(v, cb, dim / 2))
    val b = ColumnBridge.expression(Similarity.pqCodesLit(v,
      Similarity.collectCodebook(emb, "vec_id", "embedding",
        m = 2, k = 4, dim = dim), dim / 2))
    assert(a == b && a.hashCode == b.hashCode && a.semanticEquals(b))
    val other = ColumnBridge.expression(
      Similarity.pqCodesLit(v, cb, dim / 2 - 1))
    assert(a != other)
  }

  test("zero-norm vectors get sentinel cosine -1, never NaN (cell argmax)") {
    val withZero = emb.union(Seq((200L, vec(0, 0, 0, 0, 0, 0, 0, 0)))
      .toDF("vec_id", "embedding"))
    // ivfAssign: the zero vector must still be assigned (to the lowest
    // centroid id, since all guarded cosines tie at -1), not dropped or
    // NaN-ordered
    val vecs = withZero.select(col("vec_id"),
      Similarity.veci(col("embedding")).as("v"))
    val assigned = Similarity.ivfAssign(vecs,
        vecs.filter(col("vec_id") < 2), "vec_id", "v")
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    assert(assigned(200L) == 0L)
    // ivfPqKnn cellOf: same guard on the literal-projection path — the
    // query must run and place the zero vector in cell 0
    val r = Similarity.ivfPqKnn(withZero,
        withZero.filter(col("vec_id") === 200L),
        "vec_id", "embedding", topK = 3, nCells = 2, m = 2, k = 4, dim = dim)
      .select("query_id", "nn_id", "adist", "rank")
      .as[(Long, Long, Long, Int)].collect()
    assert(r.nonEmpty && r.forall(_._1 == 200L))
  }

  test("literal-LUT query cap rejects oversized query sets with guidance") {
    val err = intercept[IllegalArgumentException] {
      val many = spark.range(Similarity.MAX_LITERAL_QUERIES + 1)
        .select(col("id").as("vec_id"),
          typedLit(vec(1, 0, 0, 0, 0, 0, 0, 1)).as("embedding"))
      Similarity.pqAdcKnn(emb, many, "vec_id", "embedding",
        topK = 3, m = 2, k = 4, dim = dim)
    }
    assert(err.getMessage.contains("pqAdcKnnRelational"))
  }
}
