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
  *   1. ONE distributed pass builds the d×d scatter — a posexplode
  *      self-join keyed vec_id, i ≤ j, so the shuffle carries
  *      d(d+1)/2 = 2080 cells, never the corpus — plus the d-vector
  *      mean. d² rows per doc is the documented cost (64² here); at
  *      large d you'd switch to a mergeable outer-product aggregate,
  *      same single pass.
  *   2. The 64×64 covariance (driver-adjacent: 2080 cells) is
  *      eigen-decomposed with breeze's `eigSym` on the driver — the
  *      standard small-Gram trick (the corpus is huge, the covariance
  *      is tiny).
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
  *     (the definition of whitening, checked per component)
  *   - `var_floor_ok`: top-k captured variance ratio ≥ the floor
  */
object Pca {

  /** One-row spectral-invariant summary of a k-component PCA+whitening
    * of `emb` (`vec_id`, `embedding: array<float>`). */
  def pcaGates(emb: DataFrame, k: Int, varFloor: Double = 0.2): DataFrame = {
    val spark = emb.sparkSession
    val x = emb.select(col("vec_id"), col("embedding"))

    // ---- pass 1 (distributed): mean vector + upper-triangular scatter
    val cells = x.select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "xi")))
    val mean = cells.groupBy(col("i"))
      .agg(avg(col("xi")).as("mu"), count(lit(1)).as("n"))
      .collect().sortBy(_.getInt(0))
    val d = mean.length
    val n = mean.head.getLong(2)
    val mu = mean.map(_.getDouble(1))
    val scatter = cells.as("a")
      .join(cells.as("b"), col("a.vec_id") === col("b.vec_id"))
      .filter(col("a.i") <= col("b.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.xi").cast("double") * col("b.xi")).as("s"))
      .collect()

    // ---- driver: 64×64 covariance → eigSym (ascending), take top k
    val cov = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    scatter.foreach { r =>
      val (i, j, s) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      val c = (s - n * mu(i) * mu(j)) / (n - 1)
      cov(i, j) = c; cov(j, i) = c
    }
    val es = breeze.linalg.eigSym(cov)
    val order = (0 until d).sortBy(i => -es.eigenvalues(i))
    val top = order.take(k)
    val lambdaAll = es.eigenvalues.toArray.sum
    val lambdaTop = top.map(es.eigenvalues(_)).sum
    val pcs: Seq[Array[Double]] =
      top.map(c => Array.tabulate(d)(r => es.eigenvectors(r, c)))
    val offs = pcs.map(p => p.indices.map(i => p(i) * mu(i)).sum)
    val muNorm2 = mu.map(m => m * m).sum

    // ---- pass 2 (distributed, codegen'd): project + verify in-plan
    val muLit = typedLit(mu)
    val yCols = pcs.zip(offs).map { case (p, o) =>
      Vectors.dotFD(col("embedding"), typedLit(p)) - lit(o) }
    val y2 = yCols.map(y => y * y)
    val cNorm2 = Vectors.dotFast(col("embedding"), col("embedding")) -
      lit(2.0) * Vectors.dotFD(col("embedding"), muLit) + lit(muNorm2)
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
    projected.agg(aggExprs.head, aggExprs.tail: _*)
      .select(
        col("n"), lit(k).as("k"), col("energy_ok"),
        ((abs(col("sxn2") - lit((n - 1) * lambdaAll)) <=
            lit(relTol) * lit((n - 1) * lambdaAll)) &&
         (abs(col("syn2") - lit((n - 1) * lambdaTop)) <=
            lit(relTol) * lit((n - 1) * lambdaTop))).cast("bigint")
          .as("recon_ok"),
        (0 until k).map { j =>
          // whitened variance: Σ(y_j/√λ)² /(n−1) ∈ [1−1e-3, 1+1e-3]
          abs(col(s"sy2_$j") / lit(top.map(es.eigenvalues(_)).apply(j)) /
            lit((n - 1).toDouble) - 1.0) <= 1e-3
        }.reduce(_ && _).cast("bigint").as("white_ok"),
        lit(if (lambdaTop / lambdaAll >= varFloor) 1L else 0L)
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
