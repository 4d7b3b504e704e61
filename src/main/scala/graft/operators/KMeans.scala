package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Distributed Lloyd k-means over the embedding corpus.
  *
  * This is the canonical "tiny model state, huge data" Spark iteration
  * shape (the same structure as MLlib's KMeans): per round, ONE pass over
  * the corpus assigns every vector to its nearest centroid (the k
  * centroids ride into the executors as plan-time literal arrays — no
  * join, no shuffle on the assignment side), then ONE k×dim-sized
  * aggregate computes the new centroids. The only driver-side state is
  * the k×dim centroid table (k=8, dim=64 → 512 longs), collected once per
  * iteration — bounded by the model size, never by the corpus, so the
  * loop is identical on 500 rows or 100 TB.
  *
  * Everything is integer arithmetic so the result is bit-reproducible by
  * an external engine (the DuckDB oracle unrolls the same iterations):
  * - input vectors are quantized once at a FIXED power-of-two scale,
  *   `q = floor(x·2^15 + 0.5)` — multiplying a float by 2^15 is exact in
  *   IEEE double, so quantization has zero engine-dependent rounding
  *   (unlike a per-vector 127/max scale, whose division rounds);
  * - squared L2 distances are integer sums (|q| ≤ a few·2^15, dim 64 →
  *   distances < 2^45, far inside int64);
  * - centroid update is exact integer floor-division
  *   `(s - ((s mod n) + n) mod n) / n` (floor, not truncation, so
  *   negative coordinate sums round the same way everywhere);
  * - ties in the argmin break to the lowest centroid id.
  *
  * Deterministic init: the k lowest vec_ids. Clusters that lose every
  * member simply disappear (the next assignment runs over the surviving
  * centroids) — the natural GROUP BY semantics in both engines, kept
  * deliberately instead of a re-seeding heuristic that an oracle could
  * not reproduce.
  */
object KMeans {

  private val Scale = 32768.0 // 2^15: exact float→int quantization

  /** quantize embedding floats to longs at the fixed 2^15 scale */
  private def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * Scale + 0.5).cast("long"))

  /** integer squared L2 distance between a quantized vector column and
    * a literal centroid, via the algebraic identity
    * `|q-c|² = q·q − 2·q·c + c·c`: EXACT in integers (so values match
    * the oracle's unrolled sum((x-y)²) bit for bit), and every dot runs
    * through the codegen'd [[org.apache.spark.sql.graft.IntDotLong]] —
    * the old zip_with+aggregate fold was CodegenFallback (interpreted)
    * and paid O(k·dim) interpreted work per row per iteration. `q·q`
    * (`qq`) is computed ONCE per row, not once per centroid. */
  private def dist2(qq: Column, q: Column, cv: Array[Long]): Column = {
    val intDot = org.apache.spark.sql.graft.NativeVectorColumns.intDot _
    qq - lit(2L) * intDot(q, typedLit(cv)) + lit(cv.map(v => v * v).sum)
  }

  /** nearest-centroid assignment: adds `d` (min integer distance) and
    * `cid` columns. `array_position` finds the FIRST index holding the
    * minimum and `cents` is sorted by cid, so equal distances break to
    * the lowest centroid id — the oracle's ORDER BY d, cid. */
  private def assign(df: DataFrame,
      cents: Seq[(Long, Array[Long])]): DataFrame = {
    val intDot = org.apache.spark.sql.graft.NativeVectorColumns.intDot _
    val dists = array(cents.map { case (_, cv) =>
      dist2(col("_qq"), col("q"), cv) }: _*)
    val ids = typedLit(cents.map(_._1).toArray)
    df.withColumn("_qq", intDot(col("q"), col("q")))
      .withColumn("_dists", dists)
      .withColumn("d", array_min(col("_dists")))
      .withColumn("cid", element_at(ids,
        array_position(col("_dists"), col("d")).cast("int")))
      .drop("_dists", "_qq")
  }

  /** Run `iters` Lloyd iterations at `k` clusters; returns the per-cluster
    * summary: member count, member-id checksum, integer inertia (sum of
    * member distances to the final centroid), and the centroid coordinate
    * sum. One corpus pass + one k×dim aggregate per iteration. */
  def fit(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._

    // persisted across the seed collect and the re-center passes, then
    // released before the summary plan is returned (no leak per call)
    val q = emb.select(col("vec_id").cast("long").as("vec_id"),
      quantize(col("embedding")).as("q")).persist()

    // deterministic seed: the k lowest vec_ids, cid = rank order
    var cents: Seq[(Long, Array[Long])] =
      q.orderBy(col("vec_id")).limit(k).collect().zipWithIndex.map {
        case (row, i) => (i.toLong, row.getSeq[Long](1).toArray)
      }.toSeq

    // iters assignments bracket iters-1 re-centerings: the final summary
    // reads assignment i=iters against centroids c_{iters-1}, exactly as
    // the oracle unrolls it. Each re-center is assign (corpus pass, no
    // shuffle) + posexplode + groupBy — the ONLY shuffle, k·dim rows out.
    for (_ <- 1 until iters) {
      val perDim = assign(q, cents)
        .select(col("cid"), posexplode(col("q")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      cents = perDim.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map {
        case (cid, rows) =>
          val cv = new Array[Long](rows.length)
          rows.foreach { r =>
            cv(r.getInt(1)) = Math.floorDiv(r.getLong(2), r.getLong(3))
          }
          (cid, cv)
      }
    }

    val centSums = cents.map { case (cid, cv) => (cid, cv.sum) }
      .toDF("cid", "cent_sum")
    // the cache has served its purpose (seed collect + every re-center);
    // release it so repeated fit() calls in a long-lived session don't
    // accumulate pinned corpora — the final assignment below re-derives
    // q with one extra narrow scan, which is cheaper than a leak
    q.unpersist(blocking = false)
    assign(q, cents).groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("vec_id")).as("id_sum"),
        sum(col("d")).as("inertia"))
      .join(broadcast(centSums), Seq("cid"))
      .select(col("cid").as("cluster_id"), col("n_members"),
        col("id_sum"), col("inertia"), col("cent_sum"))
      .orderBy(col("cluster_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "km_embed" -> ((s, dir) =>
      fit(Tables.load(s, dir, "embeddings"), k = 8, iters = 3))
  )

  def oracleSql: Map[String, String] = Map(
    "km_embed" -> kmeansOracleSql(k = 8, iters = 3, dim = 64)
  )

  /** DuckDB mirror of [[fit]]: the same fixed-scale quantization, then
    * the Lloyd iterations UNROLLED as CTE pairs (a_i = assignment against
    * c_{i-1}; c_i = per-dim integer floor-div means). Every cross-row
    * aggregate is integer, so the match is exact, not approximate. */
  private def kmeansOracleSql(k: Int, iters: Int, dim: Int): String = {
    val d2 = "list_sum(list_transform(list_zip(t.q, c.cv), " +
      "s -> (s[1] - s[2]) * (s[1] - s[2])))"
    // a_i for every assignment; c_i only while another assignment will
    // read it (the summary pairs a$iters with c${iters-1} — emitting an
    // unused c$iters would obscure that bracketing)
    val iterCtes = (1 to iters).map { i =>
      val aCte =
        s"""a$i AS (
           |  SELECT vec_id, q, cid, d FROM (
           |    SELECT vec_id, q, cid, d,
           |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
           |    FROM (
           |      SELECT t.vec_id, t.q, c.cid, $d2 AS d
           |      FROM q t CROSS JOIN c${i - 1} c))
           |  WHERE rn = 1)""".stripMargin
      if (i == iters) aCte else
        aCte + ",\n" +
        s"""c$i AS (
           |  SELECT cid, list(fd ORDER BY i) AS cv FROM (
           |    SELECT a.cid, r.i,
           |      CAST((sum(a.q[r.i + 1])
           |            - ((sum(a.q[r.i + 1]) % count(*)) + count(*)) % count(*))
           |           / count(*) AS BIGINT) AS fd
           |    FROM a$i a, (SELECT unnest(range($dim)) AS i) r
           |    GROUP BY a.cid, r.i)
           |  GROUP BY cid)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (
       |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
       |    [CAST(floor(CAST(x AS DOUBLE) * 32768.0 + 0.5) AS BIGINT)
       |      for x in embedding] AS q
       |  FROM embeddings),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
       |      AS cid, q AS cv
       |  FROM q ORDER BY vec_id LIMIT $k),
       |$iterCtes,
       |fin AS (
       |  SELECT cid, count(*) AS n_members,
       |    CAST(sum(vec_id) AS BIGINT) AS id_sum,
       |    CAST(sum(d) AS BIGINT) AS inertia
       |  FROM a$iters GROUP BY cid)
       |SELECT f.cid AS cluster_id, f.n_members, f.id_sum, f.inertia,
       |  CAST(list_sum(c.cv) AS BIGINT) AS cent_sum
       |FROM fin f JOIN c${iters - 1} c USING (cid)
       |ORDER BY cluster_id""".stripMargin
  }
}
