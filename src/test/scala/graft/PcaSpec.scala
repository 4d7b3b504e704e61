package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pca

/** PCA scatter paths + degenerate-input guards.
  *
  * The production scatter is the mergeable centered co-moment aggregate
  * (no join, one packed buffer per partition); the legacy cells
  * self-join is retained purely as its differential oracle here.
  */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("co-moment aggregate matches the self-join scatter on the corpus") {
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cells = emb.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("i", "xi")))
    val mean = cells.groupBy(col("i"))
      .agg(avg(col("xi")).as("mu"), count(lit(1)).as("n"))
      .collect().sortBy(_.getInt(0))
    val d = mean.length
    val n = mean.head.getLong(2)
    val mu = mean.map(_.getDouble(1))

    val packed = Pca.scatterViaAgg(emb, mu).head().getSeq[Double](0)
    val joined = Pca.scatterViaJoin(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap

    assert(packed.length == d * (d + 1) / 2)
    var idx = 0
    for (i <- 0 until d; j <- i until d) {
      // centered co-moment vs uncentered join sum: s_c = s_u − n·μ_iμ_j
      val expected = joined((i, j)) - n * mu(i) * mu(j)
      val got = packed(idx)
      val tol = 1e-9 * math.max(math.abs(expected), 1.0)
      assert(math.abs(got - expected) <= tol,
        s"cell ($i,$j): agg=$got join-derived=$expected")
      idx += 1
    }
  }

  test("scatter stage plan has no join") {
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
    val p = Pca.scatterViaAgg(emb, Array.fill(64)(0.0))
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Join"), "co-moment scatter must be join-free")
    assert(p.contains("co_moment"), "co-moment aggregate missing from plan")
  }

  test("empty corpus yields a vacuous gate row, not nulls") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val r = Pca.pcaGates(empty, k = 4).head()
    assert(r.getLong(0) == 0L)
    assert((2 to 5).forall(i => r.getLong(i) == 1L))
  }

  test("single vector yields a vacuous gate row (variance undefined)") {
    val one = Seq((1L, Array.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val r = Pca.pcaGates(one, k = 2).head()
    assert(r.getLong(0) == 1L)
    assert((2 to 5).forall(i => r.getLong(i) == 1L))
  }

  test("rank-deficient data passes gates without dividing by zero eigenvalues") {
    // 2-dim signal embedded in 8 dims: 6 eigenvalues are numerically
    // zero. k=4 reaches past the rank — the whitening check must skip
    // the λ≈0 components (rank floor) instead of producing NaN/huge.
    val rnd = new scala.util.Random(7)
    val rows = (1L to 200L).map { id =>
      val a = rnd.nextGaussian(); val b = rnd.nextGaussian()
      (id, Array.tabulate(8)(i => (if (i % 2 == 0) a else b).toFloat))
    }
    val r = Pca.pcaGates(rows.toDF("vec_id", "embedding"), k = 4).head()
    assert(r.getLong(0) == 200L)
    assert(r.getLong(2) == 1L, "energy_ok")
    assert(r.getLong(3) == 1L, "recon_ok")
    assert(r.getLong(4) == 1L, "white_ok must skip rank-deficient components")
  }

  test("constant corpus (all-zero variance) stays finite and passes") {
    val rows = (1L to 50L).map(id => (id, Array.fill(8)(3.25f)))
    val r = Pca.pcaGates(rows.toDF("vec_id", "embedding"), k = 2).head()
    assert(r.getLong(0) == 50L)
    assert((2 to 5).forall(i => r.getLong(i) == 1L),
      "zero-spectrum corpus must not divide by zero anywhere")
  }

  test("non-zero-mean corpus: centered accumulation keeps gates green") {
    // large mean, small variance — the catastrophic-cancellation regime
    // for the uncentered route; the centered co-moment must stay exact
    // enough for the 1e-6 gates
    val rnd = new scala.util.Random(11)
    val rows = (1L to 500L).map { id =>
      (id, Array.tabulate(16)(i => (1000.0 + i * 100.0 + rnd.nextGaussian() * 0.01).toFloat))
    }
    val r = Pca.pcaGates(rows.toDF("vec_id", "embedding"), k = 4).head()
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L,
      "cancellation broke the spectral gates on a mean-dominated corpus")
  }
}
