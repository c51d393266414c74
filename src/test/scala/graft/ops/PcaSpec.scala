package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed PCA ([[Pca]]): the driver-side eigensolver's contracts
  * (orthonormality, eigen relation, ordering, determinism) and the
  * downstream value — IVF recall in the projected space on low-rank
  * data.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val D = 64
  private val RANK = 8

  /** Deterministic low-rank corpus: x = U·z + small noise, so the top
    * RANK components carry almost all variance.
    */
  private lazy val corpus = {
    val rnd = new scala.util.Random(42)
    val u = Array.fill(RANK, D)(rnd.nextGaussian() * 0.1)
    (0 until 400).map { id =>
      val z = Array.fill(RANK)(rnd.nextGaussian())
      val x = Array.tabulate(D) { i =>
        ((0 until RANK).map(r => u(r)(i) * z(r)).sum
          + rnd.nextGaussian() * 0.003).toFloat
      }
      (id.toLong, x.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private lazy val model = Pca.fit(corpus, "embedding", r = 16)

  test("basis rows are orthonormal and eigenvalues descend") {
    for (a <- 0 until model.r; b <- a until model.r) {
      val dot = model.basis(a).zip(model.basis(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<b$a, b$b> = $dot")
    }
    assert(model.eigvals.sameElements(model.eigvals.sortBy(-_)),
      "eigenvalue-descending order")
    assert(model.eigvals.forall(_ > -1e-6), "covariance eigenvalues >= 0")
  }

  test("low-rank data: top-RANK components carry ~all variance") {
    val top = model.eigvals.take(RANK).sum
    val rest = model.eigvals.drop(RANK).sum
    assert(rest < 0.01 * top, s"noise share ${rest / top}")
  }

  test("eigen relation holds on the Gram-derived covariance") {
    // rebuild the covariance exactly as fit does, then check C·v = λ·v
    val gram = Pca.gramMatrix(corpus, "embedding").collect()
    val stats = Pca.dimStats(corpus, "embedding").collect()
    val n = stats.head.getLong(2).toDouble
    val mean = Array.ofDim[Double](D)
    stats.foreach(r => mean(r.getInt(0)) = r.getLong(1) / n)
    val cov = Array.ofDim[Double](D, D)
    gram.foreach { r =>
      val c = r.getLong(2) / n - mean(r.getInt(0)) * mean(r.getInt(1))
      cov(r.getInt(0))(r.getInt(1)) = c; cov(r.getInt(1))(r.getInt(0)) = c
    }
    val scale = model.eigvals.head
    for (c <- 0 until 4) {
      val v = model.basis(c)
      val av = Array.tabulate(D)(i => (0 until D).map(j => cov(i)(j) * v(j)).sum)
      val resid = av.zip(v).map { case (a, x) =>
        val d = a - model.eigvals(c) * x; d * d
      }.sum
      assert(math.sqrt(resid) < 1e-9 * scale, s"||Cv - lv|| for c=$c: $resid")
    }
  }

  test("exactness envelope is enforced: over-bound corpora fail loudly") {
    // at the real 2^23 bound the guard is the same expression — the
    // lowered maxRows exercises it without materializing 8.4M rows
    val e = intercept[Exception] {
      Pca.gramMatrix(corpus, "embedding", maxRows = 100).collect()
    }
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null && c != c.getCause) c = c.getCause
      Option(c.getMessage).getOrElse("") + Option(t.getMessage).getOrElse("")
    }
    assert(rootMsg(e).contains("exactness envelope"),
      s"wrong failure: ${rootMsg(e)}")
    // within the bound the guard is invisible: same cells as unguarded
    assert(Pca.gramMatrix(corpus, "embedding", maxRows = 400).count() ==
      D.toLong * (D + 1) / 2)
    // fit checks the row count against the documented bound as well
    assert(Pca.MAX_EXACT_ROWS == (1L << 23))
  }

  test("fit is deterministic across invocations and repartitionings") {
    val again = Pca.fit(corpus.repartition(7), "embedding", r = 16)
    assert(model.basis.flatMap(_.toSeq).sameElements(again.basis.flatMap(_.toSeq)),
      "bit-identical basis (exact integer moments -> same driver solve)")
    assert(model.eigvals.sameElements(again.eigvals))
  }

  test("projected variance of component 0 matches its eigenvalue") {
    val s = Similarity.SCALE.toDouble
    val proj = Pca.project(corpus, "embedding", model)
      .select(element_at(col("pca"), 1).cast("double")).as[Double].collect()
    val m = proj.sum / proj.length
    val varP = proj.map(x => (x - m) * (x - m)).sum / proj.length
    val want = model.eigvals.head / (s * s) // eigvals live on the veci grid
    assert(math.abs(varP - want) < 0.02 * want, s"var $varP vs eigval $want")
  }

  test("IVF in PCA-16 space keeps recall@10 vs exact full-space kNN") {
    val projected = Pca.project(corpus, "embedding", model)
      .select(col("vec_id"), col("pca").as("embedding"))
    val queries = projected.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceKnn(corpus,
        corpus.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
      .select(col("query_id"), col("nn_id"))
    val approx = Similarity.ivfKnn(projected, queries, "vec_id", "embedding", 10)
      .select(col("query_id"), col("nn_id"))
    val hits = exact.intersect(approx).count().toDouble
    val recall = hits / exact.count()
    assert(recall >= 0.6, s"PCA-16 IVF recall@10 = $recall")
  }
}
