package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the standard pre-ANN
  * dimensionality reduction (and the rotation inside OPQ, Ge et al.
  * 2013): project d=64 vectors onto the top-r principal components,
  * then run the existing IVF machinery in the smaller space.
  *
  * The split of labor is the one that scales: the cluster computes ONLY
  * the d×d second-moment (Gram) matrix and the d first moments — one
  * corpus scan, map-side combine down to d(d+1)/2 + d cells, O(n·d²)
  * work that no PCA formulation avoids — while the driver eigensolves
  * the resulting 64×64 covariance (microseconds, no data dependence).
  * Exactly the codebook pattern used by [[Similarity.kmeansCodebook]]:
  * bounded collect, broadcast-literal result.
  *
  * Everything the cluster computes is exact int64 arithmetic on the
  * [[Similarity.veci]] grid, so the moment tables have exact DuckDB
  * oracles; the eigensolver (cyclic Jacobi, fixed sweep count,
  * deterministic tie-breaks and sign canonicalization) is pure driver
  * code pinned by PcaSpec instead.
  */
object Pca {
  /** Number of Jacobi sweeps: 64×64 covariance matrices converge to
    * machine precision in ≤ 10 cyclic sweeps; 12 adds margin while
    * staying deterministic (fixed count, no convergence-test branches
    * on float noise).
    */
  val SWEEPS = 12

  // ── distributed moment accumulation (exact, oracle-backed) ─────────

  /** Int64 exactness envelope of [[gramMatrix]]: |veci| < 2^20 ⇒
    * |v_i·v_j| < 2^40, so a cell sum stays exact to 2^23 ≈ 8.4M rows.
    * [[fit]] is meant for SAMPLES; the envelope is ENFORCED (not just
    * documented) so a full-corpus call past the bound fails loudly
    * instead of silently wrapping.
    */
  val MAX_EXACT_ROWS: Long = 1L << 23

  /** Upper-triangle Gram matrix of the veci-grid embeddings:
    * (dim_i, dim_j, s) with s = Σ_rows v_i·v_j for i ≤ j, 0-based.
    * One generator of d(d+1)/2 slim cells per row into one hash
    * aggregation — partial aggregation shrinks the shuffle to the
    * d(d+1)/2 key space regardless of corpus size. Products stay well
    * inside int64 up to [[MAX_EXACT_ROWS]]; the bound rides INSIDE the
    * plan for free (every row feeds every cell, so any cell's row count
    * IS the corpus row count — an `assert_true` filter over the d²
    * output cells, no extra job or shuffle). Past that scale swap the
    * sum to decimal(38,0) (DuckDB's HUGEINT accumulator already is)
    * and raise `maxRows` accordingly.
    */
  def gramMatrix(df: DataFrame, embCol: String, dim: Int = 64,
                 maxRows: Long = MAX_EXACT_ROWS): DataFrame = {
    // bind the veci array ONCE per row (single-element lambda scope —
    // the device of Dedup.shingleHashes, rationale there)
    val perRow = transform(array(Similarity.veci(col(embCol))), v =>
      flatten(transform(sequence(lit(1), lit(dim)), i =>
        transform(sequence(i, lit(dim)), j =>
          struct((i - 1).as("dim_i"), (j - 1).as("dim_j"),
            (element_at(v, i) * element_at(v, j)).as("p"))))))
    graft.core.Graft.rebalance(df)
      .select(explode(element_at(perRow, 1)).as("cell"))
      .groupBy(col("cell.dim_i").as("dim_i"), col("cell.dim_j").as("dim_j"))
      .agg(sum(col("cell.p")).as("s"), count(lit(1)).as("_n"))
      // envelope guard: assert_true throws at runtime when the corpus
      // exceeds the exact-int64 bound; as a filter predicate (null on
      // pass = keep) it cannot be pruned away, and it costs one compare
      // per OUTPUT cell, not per input row
      .filter(assert_true(col("_n") <= maxRows,
        lit(s"gramMatrix int64 exactness envelope exceeded (> $maxRows " +
          "rows) — fit on a sample, or switch the sums to decimal(38,0)"))
        .isNull)
      .drop("_n")
      .orderBy("dim_i", "dim_j")
  }

  /** DuckDB twin of [[gramMatrix]] over `embeddings` (adjacent so they
    * cannot drift).
    */
  def sqlGramMatrix(dim: Int = 64): String =
    s"""WITH v AS (SELECT ${Similarity.sqlVeci("embedding")} AS v
       |           FROM embeddings)
       |SELECT i - 1 AS dim_i, j - 1 AS dim_j,
       |       CAST(sum(v[i] * v[j]) AS BIGINT) AS s
       |FROM v, range(1, ${dim + 1}) r1(i), range(1, ${dim + 1}) r2(j)
       |WHERE i <= j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Per-dimension first moments beside the row count:
    * (dim_i, s1, n_rows) — with [[gramMatrix]] exactly the sufficient
    * statistics of the covariance. Same generator→hash-agg shape, d
    * cells per row.
    */
  def dimStats(df: DataFrame, embCol: String, dim: Int = 64): DataFrame =
    graft.core.Graft.rebalance(df)
      .select(posexplode(Similarity.veci(col(embCol))).as(Seq("dim_i", "vi")))
      .groupBy("dim_i")
      .agg(sum(col("vi")).as("s1"), count(lit(1)).as("n_rows"))
      .orderBy("dim_i")

  /** DuckDB twin of [[dimStats]] (adjacent so they cannot drift). */
  def sqlDimStats(dim: Int = 64): String =
    s"""WITH v AS (SELECT ${Similarity.sqlVeci("embedding")} AS v
       |           FROM embeddings)
       |SELECT i - 1 AS dim_i, CAST(sum(v[i]) AS BIGINT) AS s1,
       |       count(*) AS n_rows
       |FROM v, range(1, ${dim + 1}) r1(i)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ── driver-side eigensolver (deterministic cyclic Jacobi) ──────────

  /** The fitted rotation: `basis(c)(i)` = component c's loading on input
    * dimension i (rows orthonormal, eigenvalue-descending), `eigvals` in
    * veci-grid units² , `mean` in veci-grid units.
    */
  final case class PcaModel(basis: Array[Array[Double]],
                            eigvals: Array[Double],
                            mean: Array[Double]) {
    def r: Int = basis.length
    def d: Int = mean.length
  }

  /** Fit the top-`r` components: one pass of [[gramMatrix]] +
    * [[dimStats]] (bounded d² collect), covariance on the driver, then
    * cyclic Jacobi with [[SWEEPS]] fixed sweeps. Determinism contract:
    * fixed sweep order (p<q row-major), eigenpairs sorted by
    * (−eigenvalue, original column), each vector sign-canonicalized so
    * its largest-|loading| entry (lowest index on ties) is positive —
    * the same fit on the same data is bit-identical across runs and
    * partitionings, because its inputs are exact integers.
    */
  def fit(df: DataFrame, embCol: String, r: Int, dim: Int = 64): PcaModel = {
    val gram = gramMatrix(df, embCol, dim).collect()
    val stats = dimStats(df, embCol, dim).collect()
    require(stats.nonEmpty, "PCA fit over an empty corpus")
    require(stats.head.getLong(2) <= MAX_EXACT_ROWS,
      s"PCA fit over ${stats.head.getLong(2)} rows exceeds the int64 " +
        s"exactness envelope ($MAX_EXACT_ROWS) — fit on a sample")
    val n = stats.head.getLong(2).toDouble
    val mean = Array.ofDim[Double](dim)
    stats.foreach(row => mean(row.getInt(0)) = row.getLong(1) / n)
    val cov = Array.ofDim[Double](dim, dim)
    gram.foreach { row =>
      val (i, j, s) = (row.getInt(0), row.getInt(1), row.getLong(2))
      val c = s / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (eigvals, eigvecs) = jacobiEigen(cov, SWEEPS)
    val order = eigvals.indices.sortBy(i => (-eigvals(i), i)).take(r)
    val basis = order.map { c =>
      val v = Array.tabulate(dim)(i => eigvecs(i)(c))
      // sign canonicalization: largest-|loading| entry positive
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(pivot) < 0) v.map(-_) else v
    }.toArray
    PcaModel(basis, order.map(eigvals).toArray, mean)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector columns). Fixed `sweeps` full (p,q)
    * passes — no data-dependent iteration counts.
    */
  def jacobiEigen(m: Array[Array[Double]],
                  sweeps: Int): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until sweeps; p <- 0 until n - 1; q <- p + 1 until n) {
      val apq = a(p)(q)
      if (math.abs(apq) > 1e-300) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val t =
          if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        var k = 0
        while (k < n) { // A ← JᵀAJ, columns then rows
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
          k += 1
        }
        k = 0
        while (k < n) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
          k += 1
        }
        k = 0
        while (k < n) {
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
          k += 1
        }
      }
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  // ── projection (broadcast-literal, codegen'd) ──────────────────────

  /** Projection column for one fitted component: Σ_i (x_i − μ_i)·b_i in
    * ORIGINAL float units (the veci grid scale cancels), as a chain of
    * zip_with/aggregate built-ins — whole-stage codegen, no UDF. The
    * model rides into the plan as array literals, the projection is a
    * pure map — scan-speed at any corpus size.
    */
  def projectCol(emb: Column, model: PcaModel, c: Int): Column = {
    val centered = zip_with(Similarity.veci(emb).cast("array<double>"),
      typedLit(model.mean.toSeq), (x, mu) => x - mu)
    val prods = zip_with(centered, typedLit(model.basis(c).toSeq),
      (x, b) => x * b)
    aggregate(prods, lit(0.0d), (acc, x) => acc + x) / Similarity.SCALE.toDouble
  }

  /** Append an `outCol` array<float> column of the r projected
    * coordinates — drop-in input for every downstream ANN operator
    * ([[Similarity.ivfKnn]], PQ, the persisted index), which re-grids it
    * with [[Similarity.veci]].
    */
  def project(df: DataFrame, embCol: String, model: PcaModel,
              outCol: String = "pca"): DataFrame =
    df.withColumn(outCol,
      array((0 until model.r).map(c => projectCol(col(embCol), model, c)): _*)
        .cast("array<float>"))

  /** Pure rotation onto the eigenbasis — NO mean subtraction, so dot
    * products and norms are preserved exactly and the cosine-neighbor
    * structure is untouched; only the coordinate system changes. This
    * is the OPQ-lite preprocessing (Ge et al. 2013's R, taken from PCA
    * instead of the iterated Procrustes solve): product-quantize the
    * rotated coordinates so the subspace split aligns with the
    * variance directions, then search as usual. Requires a full-rank
    * model (`r == d`) — a truncated basis would silently drop norm.
    */
  def rotate(df: DataFrame, embCol: String, model: PcaModel,
             outCol: String = "pca"): DataFrame = {
    require(model.r == model.d,
      s"rotation needs the full basis (r=${model.r}, d=${model.d})")
    val cols = (0 until model.r).map { c =>
      val prods = zip_with(Similarity.veci(col(embCol)).cast("array<double>"),
        typedLit(model.basis(c).toSeq), (x, b) => x * b)
      aggregate(prods, lit(0.0d), (acc, x) => acc + x) /
        Similarity.SCALE.toDouble
    }
    df.withColumn(outCol, array(cols: _*).cast("array<float>"))
  }
}
