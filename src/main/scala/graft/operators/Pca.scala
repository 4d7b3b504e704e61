package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Distributed PCA + whitening over the embedding corpus, gated by
  * in-plan spectral invariants.
  *
  * The embedding half of a training-data pipeline routinely needs a
  * decorrelated, variance-normalized view of its vectors (whitening
  * before product quantization / IVF training measurably improves both;
  * cf. Jégou et al., "Aggregating local descriptors", CVPR'10). The
  * decomposition here is the classic two-stage scalable shape:
  *
  *   1. ONE distributed pass builds the d-vector mean, then ONE more
  *      builds the d×d scatter through the mergeable CENTERED
  *      outer-product aggregate [[org.apache.spark.sql.graft.CoMomentAgg]]
  *      — an O(d²) buffer per partition, merged pairwise, so the
  *      shuffle carries one packed upper-triangle per partition and the
  *      plan has NO join in the scatter stage. Centering inside the
  *      accumulator matters numerically: the textbook uncentered route
  *      (s − n·μ_iμ_j) subtracts two large near-equal numbers whenever
  *      the mean dominates the variance — real, non-zero-mean corpora —
  *      and the cancellation can spuriously trip the 1e-6 gates below.
  *   2. The d×d covariance (driver-adjacent: d(d+1)/2 packed cells) is
  *      eigen-decomposed with breeze's `eigSym` on the driver — the
  *      standard small-Gram trick (the corpus is huge, the covariance
  *      is tiny). Works to d ≈ a few thousand; beyond that you'd move
  *      to randomized SVD, same distributed passes.
  *
  * Projection then goes back INTO the plan as literal component arrays
  * via the native float-double dot expression ([[Vectors.dotFD]], no
  * UDF): y_j = x·pc_j − μ·pc_j (centering by linearity — the μ·pc_j
  * offsets are driver scalars).
  *
  * Eigenvectors are not reproducible by an external SQL engine, so the
  * driver gate asserts what IS engine-independent — the spectral
  * identities any correct PCA must satisfy, each computed in-plan over
  * the full corpus (the [[Sketches]] invariant-gate pattern):
  *
  *   - `energy_ok`:  ‖y‖² ≤ ‖x−μ‖² for EVERY row (Parseval bound for
  *     an orthonormal projection; violated by any non-orthonormal PC)
  *   - `recon_ok`:   Σ‖x−μ‖² = (n−1)·Σλ_all and Σ‖y‖² = (n−1)·Σλ_top
  *     (trace identity + Eckart–Young optimal-truncation balance)
  *   - `white_ok`:   per-component variance of y_j/√λ_j is 1 ±1e-3
  *     (the definition of whitening, checked per component; components
  *     whose λ_j is below the rank floor carry no variance to whiten
  *     and are excluded rather than divided by ≈0)
  *   - `var_floor_ok`: top-k captured variance ratio ≥ the floor
  *
  * Degenerate inputs return a well-defined row instead of nulls/NaNs:
  * an empty corpus (or n=1, where sample variance is undefined) yields
  * n with every gate vacuously 1 — the oracle's `FROM`-empty row also
  * reports 1s, and "no rows violated the invariant" is the honest
  * reading of an invariant over nothing.
  */
object Pca {

  /** Packed upper-triangle index for the co-moment array (row-major,
    * i ≤ j) — must match CoMomentAgg's packing. */
  private def pack(i: Int, j: Int, d: Int): Int = i * d - i * (i - 1) / 2 + (j - i)

  /** Legacy scatter via the cells self-join (n·d² intermediate rows) —
    * kept ONLY as the differential oracle for the aggregate path; the
    * production path is [[org.apache.spark.sql.graft.CoMomentAgg]].
    * Returns the UNcentered Σ x_i·x_j upper triangle as (i, j, s). */
  private[graft] def scatterViaJoin(emb: DataFrame): DataFrame = {
    val cells = emb.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("i", "xi")))
    cells.as("a")
      .join(cells.as("b"), col("a.vec_id") === col("b.vec_id"))
      .filter(col("a.i") <= col("b.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.xi").cast("double") * col("b.xi")).as("s"))
  }

  /** Centered scatter through the mergeable co-moment aggregate: one
    * packed upper-triangle row, no join. Exposed for the differential
    * spec and plan gate. */
  private[graft] def scatterViaAgg(emb: DataFrame, mu: Array[Double]): DataFrame =
    emb.agg(org.apache.spark.sql.graft.CoMomentColumns
      .coMoment(col("embedding"), mu).as("scatter"))

  /** One-row spectral-invariant summary of a k-component PCA+whitening
    * of `emb` (`vec_id`, `embedding: array<float>`). */
  def pcaGates(emb: DataFrame, k: Int, varFloor: Double = 0.2): DataFrame = {
    val spark = emb.sparkSession
    val x = emb.select(col("vec_id"), col("embedding"))

    // ---- pass 1 (distributed): the d-vector mean
    val cells = x.select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "xi")))
    val mean = cells.groupBy(col("i"))
      .agg(avg(col("xi")).as("mu"), count(lit(1)).as("n"))
      .collect().sortBy(_.getInt(0))
    val d = mean.length
    if (d == 0 || mean.head.getLong(2) < 2) {
      // empty corpus or a single vector: sample covariance is undefined;
      // report the row with vacuously-true gates (see scaladoc)
      val n = if (d == 0) 0L else mean.head.getLong(2)
      import spark.implicits._
      return Seq((n, k, 1L, 1L, 1L, 1L)).toDF(
        "n", "k", "energy_ok", "recon_ok", "white_ok", "var_floor_ok")
    }
    val n = mean.head.getLong(2)
    val mu = mean.map(_.getDouble(1))

    // ---- pass 2 (distributed): centered scatter, one mergeable buffer
    val packed = scatterViaAgg(x, mu).head().getSeq[Double](0)

    // ---- driver: d×d covariance → eigSym (ascending), take top k
    val cov = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val c = packed(pack(i, j, d)) / (n - 1)
      cov(i, j) = c; cov(j, i) = c
    }
    val es = breeze.linalg.eigSym(cov)
    val order = (0 until d).sortBy(i => -es.eigenvalues(i))
    val top = order.take(k)
    val lambdaAll = es.eigenvalues.toArray.sum
    val lambdaTop = top.map(es.eigenvalues(_)).sum
    // rank floor: eigenvalues at numerical zero (relative to the
    // largest) mark rank deficiency — dividing the whitening check by
    // them would turn summation noise into a huge/NaN ratio
    val lambdaMax = math.max(es.eigenvalues(order.head), 0.0)
    val rankFloor = 1e-12 * math.max(lambdaMax, java.lang.Double.MIN_NORMAL)
    val pcs: Seq[Array[Double]] =
      top.map(c => Array.tabulate(d)(r => es.eigenvectors(r, c)))
    val offs = pcs.map(p => p.indices.map(i => p(i) * mu(i)).sum)

    // ---- pass 3 (distributed, codegen'd): project + verify in-plan
    val muLit = typedLit(mu.toSeq)
    val yCols = pcs.zip(offs).map { case (p, o) =>
      Vectors.dotFD(col("embedding"), typedLit(p.toSeq)) - lit(o) }
    val y2 = yCols.map(y => y * y)
    // ‖x−μ‖² via the centered-difference distance expression, NOT the
    // x·x − 2x·μ + ‖μ‖² expansion — on a mean-dominated corpus that
    // expansion cancels catastrophically (each term ~‖μ‖², their
    // difference ~corpus variance) and trips the 1e-6 recon gate even
    // though the PCA is exact. Same fix as centering the scatter.
    val cNorm2 = Vectors.dist2FD(col("embedding"), muLit)
    val projected = x.select(
      cNorm2.as("xn2"),
      y2.reduce(_ + _).as("yn2"),
      array(y2.map(c => c.cast("double")): _*).as("y2s"))
    val relTol = 1e-6
    val aggExprs = Seq(
      count(lit(1)).as("n"),
      min((col("yn2") <= col("xn2") * (1 + relTol) + relTol).cast("bigint"))
        .as("energy_ok"),
      sum(col("xn2")).as("sxn2"), sum(col("yn2")).as("syn2")) ++
      (0 until k).map(j => sum(element_at(col("y2s"), j + 1)).as(s"sy2_$j"))
    // absolute-term guard: an all-constant corpus has λ ≡ 0; the trace
    // identities then compare two exact zeros, so give each tolerance a
    // tiny absolute floor instead of multiplying relTol by 0
    def tol(target: Double) = lit(relTol * math.max(math.abs(target), 1e-9))
    projected.agg(aggExprs.head, aggExprs.tail: _*)
      .select(
        col("n"), lit(k).as("k"), coalesce(col("energy_ok"), lit(1L)).as("energy_ok"),
        ((abs(col("sxn2") - lit((n - 1) * lambdaAll)) <= tol((n - 1) * lambdaAll)) &&
         (abs(col("syn2") - lit((n - 1) * lambdaTop)) <= tol((n - 1) * lambdaTop)))
          .cast("bigint").as("recon_ok"),
        (0 until k).map { j =>
          val lam = es.eigenvalues(top(j))
          if (lam <= rankFloor) lit(true) // no variance to whiten (rank floor)
          else
            // whitened variance: Σ(y_j/√λ)² /(n−1) ∈ [1−1e-3, 1+1e-3]
            abs(col(s"sy2_$j") / lit(lam) / lit((n - 1).toDouble) - 1.0) <= 1e-3
        }.reduce(_ && _).cast("bigint").as("white_ok"),
        lit(if (lambdaAll <= 0.0 || lambdaTop / lambdaAll >= varFloor) 1L else 0L)
          .as("var_floor_ok"))
  }

  // --------------------------------------------------------- driver queries
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_pca_whiten" -> ((s, dir) =>
      pcaGates(Tables.load(s, dir, "embeddings"), k = 16))
  )

  /** The oracle fixes the row count and asserts every spectral flag —
    * the same invariant-gate contract as the sketch queries. */
  def oracleSql: Map[String, String] = Map(
    "sim_pca_whiten" ->
      """SELECT count(*) AS n, CAST(16 AS INT) AS k,
        |  CAST(1 AS BIGINT) AS energy_ok, CAST(1 AS BIGINT) AS recon_ok,
        |  CAST(1 AS BIGINT) AS white_ok, CAST(1 AS BIGINT) AS var_floor_ok
        |FROM embeddings""".stripMargin
  )
}
