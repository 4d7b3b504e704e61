package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — correct, O(n·q), fine when the
  * query set is small or the corpus fits a broadcast. Scale path:
  * sign-random-projection (SRP) LSH buckets — candidates only within a
  * bucket, so the pair space shrinks by ~2^planes; recall is tunable via
  * multi-probe (compare buckets differing in one bit).
  * All vector math is codegen'd `functions._` (see [[Vectors]]).
  */
object Similarity {

  /** Brute-force top-k neighbours for each query row: cross join pruned
    * by broadcasting the (small) query side; at cluster scale the corpus
    * side streams partition-local with no shuffle. */
  def knnBrute(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // norms once per vector, not per pair
    val c = corpus.select(col("vec_id").as("nn_id"), col("embedding").as("nn_emb"),
      Vectors.norm2Fast(col("embedding")).as("nn_nrm"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      Vectors.norm2Fast(col("embedding")).as("q_nrm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    c.crossJoin(broadcast(q))
      .filter(col("nn_id") =!= col("q_id"))
      .select(col("q_id"), col("nn_id"),
        (Vectors.dotFast(col("q_emb"), col("nn_emb")) / (col("q_nrm") * col("nn_nrm"))).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** ANN via SRP-LSH: pair only within a bucket. Lower recall than brute
    * force, bounded cost at any corpus size. */
  def knnLsh(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 6): DataFrame =
    knnLshImpl(corpus, queries, k, Vectors.srpBucket(_, planes))

  /** [[knnLsh]] with the portable md5-parity hyperplanes
    * ([[Vectors.srpBucketPortable]]) — bucket assignment reproducible in
    * an external engine, so the full ranked result is hash-checkable. */
  def knnLshPortable(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 6): DataFrame =
    knnLshImpl(corpus, queries, k, Vectors.srpBucketPortable(_, planes))

  /** Multi-probe SRP-LSH (Lv et al., VLDB'07 idea specialized to sign
    * projections): each query probes its own bucket AND every bucket at
    * hamming distance 1 (one plane's sign flipped) — the buckets a
    * near-boundary neighbour most likely fell into. Recall rises toward
    * brute force at the cost of `planes + 1` probe keys per query,
    * WITHOUT retraining or extra tables — the knob a pipeline turns when
    * single-probe recall is short. Probe buckets are distinct, so no
    * candidate dedup is needed; cost stays (probes × bucket occupancy).
    * Portable hyperplanes — the whole ranked result is oracle-checkable. */
  def knnLshMultiProbe(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 6): DataFrame = {
    val bucketOf = Vectors.srpBucketPortable(_: Column, planes)
    val c = corpus.select(col("vec_id").as("nn_id"), col("embedding").as("nn_emb"),
      Vectors.norm2Fast(col("embedding")).as("nn_nrm"),
      bucketOf(col("embedding")).as("bucket"))
    val probes = col("q_bucket") +:
      (0 until planes).map(p => col("q_bucket").bitwiseXOR(lit(1L << p)))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        Vectors.norm2Fast(col("embedding")).as("q_nrm"),
        bucketOf(col("embedding")).as("q_bucket"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        explode(array(probes: _*)).as("probe"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    c.join(broadcast(q), col("bucket") === col("probe"))
      .filter(col("nn_id") =!= col("q_id"))
      .select(col("q_id"), col("nn_id"),
        (Vectors.dotFast(col("q_emb"), col("nn_emb")) / (col("q_nrm") * col("nn_nrm"))).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  private def knnLshImpl(corpus: DataFrame, queries: DataFrame, k: Int,
      bucketOf: Column => Column): DataFrame = {
    val c = corpus.select(col("vec_id").as("nn_id"), col("embedding").as("nn_emb"),
      Vectors.norm2Fast(col("embedding")).as("nn_nrm"),
      bucketOf(col("embedding")).as("bucket"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      Vectors.norm2Fast(col("embedding")).as("q_nrm"),
      bucketOf(col("embedding")).as("q_bucket"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    c.join(broadcast(q), col("bucket") === col("q_bucket"))
      .filter(col("nn_id") =!= col("q_id"))
      .select(col("q_id"), col("nn_id"),
        (Vectors.dotFast(col("q_emb"), col("nn_emb")) / (col("q_nrm") * col("nn_nrm"))).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** ANN via IVF (inverted file): KMeans partitions the corpus into
    * `nCells` cells; each query probes only its `nProbe` nearest cells.
    * Cost per query ≈ nProbe/nCells of the corpus, and the corpus can be
    * stored partitioned by cell so a probe is a partition-pruned read.
    * Uses Spark MLlib KMeans (distributed training, seeded). */
  def knnIvf(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._

    // cache the vectorized corpus: KMeans is multi-pass (each iteration is
    // a full scan) and the assignment pass reads it once more. Random init
    // + few iterations: cell quality barely moves ANN recall (probing
    // nProbe cells absorbs boundary error) but k-means|| init alone costs
    // ~5 extra passes.
    val withVec = corpus.withColumn("__vec",
      array_to_vector(col("embedding").cast("array<double>")))
      .persist()
    val model = new KMeans().setK(nCells).setSeed(42)
      .setInitMode("random").setMaxIter(5)
      .setFeaturesCol("__vec").setPredictionCol("__cell")
      .fit(withVec)
    val assigned = model.transform(withVec)
      .select(col("vec_id").as("nn_id"), col("embedding").as("nn_emb"),
        Vectors.norm2Fast(col("embedding")).as("nn_nrm"), col("__cell"))

    // tiny centroid table broadcasts; queries pick nProbe nearest cells
    val centersDf = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray) }.toDF("__cell", "__centroid")
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("__dist"), col("__cell"))
    val qCells = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        Vectors.norm2Fast(col("embedding")).as("q_nrm"))
      .crossJoin(broadcast(centersDf))
      .withColumn("__dist", Vectors.dist2FD(col("q_emb"), col("__centroid")))
      .withColumn("__prk", row_number().over(wProbe))
      .filter(col("__prk") <= nProbe)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("__cell"))

    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("nn_id"))
    assigned.join(broadcast(qCells), "__cell")
      .filter(col("nn_id") =!= col("q_id"))
      .select(col("q_id"), col("nn_id"),
        (Vectors.dotFast(col("q_emb"), col("nn_emb")) / (col("q_nrm") * col("nn_nrm"))).as("cos"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
  }

  /** ANN via product quantization (Jégou/Douze/Schmid, TPAMI'11): the
    * vector is split into `m` subspaces, each quantized to one of
    * `codebookSize` centroids learned by per-subspace KMeans, so a
    * corpus item compresses to `m` small codes (here 8×4 bits = 4 bytes
    * against 256 bytes of floats — the memory ratio that lets a 100 TB
    * embedding corpus's index live in cluster RAM). Queries score
    * candidates by ADC (asymmetric distance): exact subvector → centroid
    * distances, summed across subspaces via m BROADCAST hash joins
    * against the per-query distance tables (m × codebookSize rows) —
    * the corpus streams through codegen'd joins, no shuffle until the
    * top-`refine` window. The top `refine` candidates are re-ranked by
    * exact cosine (the standard PQ re-rank step), which restores most of
    * the recall the 4-byte codes give up.
    *
    * KMeans cells are engine-specific → gated by a recall floor vs
    * in-plan brute force, like [[knnIvf]]. */
  def knnPq(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      m: Int = 8, codebookSize: Int = 16, refine: Int = 50): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m

    // one pass materializes all m subvector columns; each KMeans then
    // trains on its slice of the SAME cached table (m multi-pass fits —
    // at real scale these train on a sample, codes assign full-corpus)
    val withSubs = (0 until m).foldLeft(corpus)((df, i) =>
      df.withColumn(s"__sv$i",
        array_to_vector(slice(col("embedding"), i * sub + 1, sub)
          .cast("array<double>"))))
      .persist()
    withSubs.count()
    val models = (0 until m).map { i =>
      new KMeans().setK(codebookSize).setSeed(42 + i)
        .setInitMode("random").setMaxIter(5)
        .setFeaturesCol(s"__sv$i").setPredictionCol(s"__c$i")
        .fit(withSubs)
    }
    // corpus → m code columns (model UDFs chain into one projection pass)
    val coded = models.zipWithIndex.foldLeft(withSubs) {
      case (df, (mod, i)) => mod.transform(df)
    }.select(Seq(col("vec_id").as("nn_id"), col("embedding").as("nn_emb"),
      Vectors.norm2Fast(col("embedding")).as("nn_nrm")) ++
      (0 until m).map(i => col(s"__c$i")): _*)

    // per-query ADC tables: distance from the query's subvector to every
    // centroid of every subspace — m × codebookSize rows per query
    val centroidRows = for {
      i <- 0 until m; (c, code) <- models(i).clusterCenters.zipWithIndex
    } yield (i, code, c.toArray)
    val centroids = centroidRows.toDF("__sub", "__code", "__centroid")
    val qBase = queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"),
      Vectors.norm2Fast(col("embedding")).as("q_nrm"))
    val qDist = qBase.crossJoin(broadcast(centroids))
      .select(col("q_id"),
        col("__sub"), col("__code"),
        Vectors.dist2FD(slice(col("q_emb"), col("__sub") * sub + 1, lit(sub)),
          col("__centroid")).as("__d"))

    // ADC scoring: corpus × queries via m broadcast joins on (q, code_i)
    val qAll = broadcast(qBase.select(col("q_id")))
    val scored0 = coded.crossJoin(qAll).filter(col("nn_id") =!= col("q_id"))
    val scored = (0 until m).foldLeft(scored0) { (df, i) =>
      df.join(broadcast(qDist.filter(col("__sub") === i)
          .select(col("q_id"), col("__code").as(s"__c$i"), col("__d").as(s"__d$i"))),
        Seq("q_id", s"__c$i"))
    }.withColumn("__adc", (0 until m).map(i => col(s"__d$i")).reduce(_ + _))

    // refine: exact cosine over the top-`refine` ADC candidates only
    val wAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("__adc"), col("nn_id"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    scored.withColumn("__ark", row_number().over(wAdc))
      .filter(col("__ark") <= refine)
      .join(broadcast(qBase), "q_id")
      .select(col("q_id"), col("nn_id"),
        (Vectors.dotFast(col("q_emb"), col("nn_emb")) / (col("q_nrm") * col("nn_nrm"))).as("cos"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
  }

  // --------------------------------------------------------- driver queries
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // brute-force top-10 for 5 fixed query vectors — DuckDB oracle
    "sim_knn_brute" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      knnBrute(e, e.filter(col("vec_id") < 5), k = 10)
        .select(col("q_id"), col("nn_id"), round(col("cos"), 6).as("cos"), col("rk"))
        .orderBy(col("q_id"), col("rk"))
    }),
    // SRP-LSH ANN for the same queries, PORTABLE hyperplanes — the
    // oracle reproduces bucket assignment, candidate join, cosine, and
    // ranking end to end, so the full ranked result is hash-checked
    "sim_knn_lsh" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      knnLshPortable(e, e.filter(col("vec_id") < 5), k = 10, planes = 6)
        .select(col("q_id"), col("nn_id"), round(col("cos"), 6).as("cos"),
          col("rk"))
        .orderBy(col("q_id"), col("rk"))
    }),
    // multi-probe SRP-LSH (own bucket + every hamming-1 bucket), same
    // portable planes — full ranked result hash-checked like sim_knn_lsh
    "sim_knn_mp" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      knnLshMultiProbe(e, e.filter(col("vec_id") < 5), k = 10, planes = 6)
        .select(col("q_id"), col("nn_id"), round(col("cos"), 6).as("cos"),
          col("rk"))
        .orderBy(col("q_id"), col("rk"))
    }),
    // IVF ANN: kmeans cells are inherently engine-specific, so the gate
    // is a recall FLOOR against the in-plan brute-force top-10 (whose
    // side of the join DuckDB reproduces exactly): n_queries and n_brute
    // are oracle-computed, and recall_ok asserts IVF found >= 60% of the
    // true neighbours — a real invariant, not a rows-only count.
    // (measured recall at nCells=16/nProbe=8: 0.82-0.84 at sf0.001 and
    // sf0.01 — the floor leaves margin for kmeans partitioning jitter)
    "sim_knn_ivf" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 5)
      val brute = knnBrute(e, q, k = 10).select(col("q_id"), col("nn_id"))
      val ivf = knnIvf(e, q, k = 10, nCells = 16, nProbe = 8)
        .select(col("q_id").as("iq"), col("nn_id").as("inn"), lit(1).as("__hit"))
      brute.join(ivf,
          col("q_id") === col("iq") && col("nn_id") === col("inn"), "left")
        .agg(
          countDistinct(col("q_id")).as("n_queries"),
          count(lit(1)).as("n_brute"),
          sum(coalesce(col("__hit"), lit(0))).as("__hits"))
        .select(col("n_queries"), col("n_brute"),
          (col("__hits") >= lit(0.6) * col("n_brute")).cast("bigint")
            .as("recall_ok"))
    }),
    // PQ ANN: 8 subspaces × 16 centroids (4-byte codes), ADC + exact
    // re-rank of the top-50. Codebooks are engine-specific → recall
    // floor vs in-plan brute force, same gate pattern as sim_knn_ivf.
    "sim_knn_pq" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 5)
      val brute = knnBrute(e, q, k = 10).select(col("q_id"), col("nn_id"))
      val pq = knnPq(e, q, k = 10, dim = 64)
        .select(col("q_id").as("pq"), col("nn_id").as("pnn"), lit(1).as("__hit"))
      brute.join(pq,
          col("q_id") === col("pq") && col("nn_id") === col("pnn"), "left")
        .agg(
          countDistinct(col("q_id")).as("n_queries"),
          count(lit(1)).as("n_brute"),
          sum(coalesce(col("__hit"), lit(0))).as("__hits"))
        .select(col("n_queries"), col("n_brute"),
          (col("__hits") >= lit(0.6) * col("n_brute")).cast("bigint")
            .as("recall_ok"))
    }),
    // centroid similarity per label: per-dim sum vector (cosine is
    // scale-invariant, so the un-normalized sum is the centroid
    // direction) then cosine of each member to it. All cross-row sums go
    // through exact DECIMAL so the result is independent of partition
    // order — which is what makes this oracle-checkable rather than
    // rows-only (float += is not associative; decimal is).
    "sim_label_centroid" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val dim = 64
      val sums = (0 until dim).map(i =>
        sum(element_at(col("embedding"), i + 1).cast(DecimalType(28, 10)))
          .cast("double").as(s"s$i"))
      val centroids = e.groupBy(col("label"))
        .agg(sums.head, sums.tail: _*)
        .select(col("label").as("c_label"),
          array((0 until dim).map(i => col(s"s$i")): _*).as("centroid"))
      e.join(broadcast(centroids), col("label") === col("c_label"))
        .select(col("label"), col("vec_id"),
          round(Vectors.cosine(col("embedding"), col("centroid")), 4).as("cos_c"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          // decimal SUM then double divide — the oracle's exact shape
          round(sum(col("cos_c").cast(DecimalType(18, 12)))
            .cast("double") / count(lit(1)), 4).as("avg_cos"))
        .orderBy(col("label"))
    })
  )

  /** Shared oracle CTE `v(vec_id, embedding, nrm, bucket)`: norm plus the
    * portable SRP bucket (md5('p|j')-parity plane signs, left-to-right
    * double sums) — the DuckDB mirror of [[Vectors.srpBucketPortable]]. */
  private def srpVSql(planes: Int): String = {
    val planeTerms = (0 until planes).map { p =>
      s"""    (CASE WHEN list_sum([CAST(embedding[j + 1] AS DOUBLE) *
         |      (CASE WHEN (CAST(('0x' || substr(md5('$p' || '|' ||
         |          CAST(j AS VARCHAR)), 1, 15)) AS BIGINT) % 2) = 0
         |        THEN 1.0 ELSE -1.0 END)
         |      for j in range(len(embedding))]) >= 0
         |      THEN ${1L << p} ELSE 0 END)""".stripMargin
    }.mkString(" +\n")
    s"""v AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum([CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)
      |         for s in list_zip(embedding, embedding)])) AS nrm,
      |$planeTerms AS bucket
      |  FROM embeddings)""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    // double-precision cosine mirroring the Spark expression exactly
    "sim_knn_brute" ->
      """WITH v AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum([CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)
        |         for s in list_zip(embedding, embedding)])) AS nrm
        |  FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS nn_id,
        |    list_sum([CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)
        |      for s in list_zip(q.embedding, c.embedding)]) / (q.nrm * c.nrm) AS cos0
        |  FROM v q JOIN v c ON c.vec_id != q.vec_id
        |  WHERE q.vec_id < 5),
        |ranked AS (
        |  SELECT q_id, nn_id, cos0,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos0 DESC, nn_id) AS rk
        |  FROM pairs)
        |SELECT q_id, nn_id, round(cos0, 6) AS cos, rk
        |FROM ranked WHERE rk <= 10 ORDER BY q_id, rk""".stripMargin,
    // portable SRP-LSH: per-plane signs from md5('p|j') parity, summed
    // left-to-right in double exactly like the Spark aggregate()
    "sim_knn_lsh" ->
      s"""WITH ${srpVSql(6)},
        |pairs AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS nn_id,
        |    list_sum([CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)
        |      for s in list_zip(q.embedding, c.embedding)]) / (q.nrm * c.nrm) AS cos0
        |  FROM v q JOIN v c ON c.bucket = q.bucket AND c.vec_id != q.vec_id
        |  WHERE q.vec_id < 5),
        |ranked AS (
        |  SELECT q_id, nn_id, cos0,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos0 DESC, nn_id) AS rk
        |  FROM pairs)
        |SELECT q_id, nn_id, round(cos0, 6) AS cos, rk
        |FROM ranked WHERE rk <= 10 ORDER BY q_id, rk""".stripMargin,
    // multi-probe: query side expands to its bucket + the 6 hamming-1
    // buckets (xor one plane bit); probe buckets are distinct so the
    // candidate set needs no dedup — mirrored exactly from the engine
    "sim_knn_mp" ->
      s"""WITH ${srpVSql(6)},
        |probes AS (
        |  SELECT vec_id, embedding, nrm,
        |    CASE WHEN j.j = 0 THEN bucket
        |         ELSE xor(bucket, CAST(1 AS BIGINT) << (j.j - 1)) END AS probe
        |  FROM v, (SELECT unnest(range(7)) AS j) j
        |  WHERE vec_id < 5),
        |pairs AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS nn_id,
        |    list_sum([CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)
        |      for s in list_zip(q.embedding, c.embedding)]) / (q.nrm * c.nrm) AS cos0
        |  FROM probes q JOIN v c ON c.bucket = q.probe AND c.vec_id != q.vec_id),
        |ranked AS (
        |  SELECT q_id, nn_id, cos0,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos0 DESC, nn_id) AS rk
        |  FROM pairs)
        |SELECT q_id, nn_id, round(cos0, 6) AS cos, rk
        |FROM ranked WHERE rk <= 10 ORDER BY q_id, rk""".stripMargin,
    // IVF: cells are engine-specific; the oracle fixes the brute-force
    // side (n_queries, n_brute) and the recall-floor invariant
    "sim_knn_ivf" ->
      """WITH v AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum([CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)
        |         for s in list_zip(embedding, embedding)])) AS nrm
        |  FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS nn_id,
        |    list_sum([CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)
        |      for s in list_zip(q.embedding, c.embedding)]) / (q.nrm * c.nrm) AS cos0
        |  FROM v q JOIN v c ON c.vec_id != q.vec_id
        |  WHERE q.vec_id < 5),
        |ranked AS (
        |  SELECT q_id, nn_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos0 DESC, nn_id) AS rk
        |  FROM pairs)
        |SELECT CAST(count(DISTINCT q_id) AS BIGINT) AS n_queries,
        |  CAST(count(*) AS BIGINT) AS n_brute,
        |  CAST(1 AS BIGINT) AS recall_ok
        |FROM ranked WHERE rk <= 10""".stripMargin,
    // PQ: like IVF, codebooks can't be reproduced in SQL; the oracle
    // fixes the brute-force side and asserts the recall-floor flag
    "sim_knn_pq" ->
      """WITH v AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum([CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)
        |         for s in list_zip(embedding, embedding)])) AS nrm
        |  FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS nn_id,
        |    list_sum([CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)
        |      for s in list_zip(q.embedding, c.embedding)]) / (q.nrm * c.nrm) AS cos0
        |  FROM v q JOIN v c ON c.vec_id != q.vec_id
        |  WHERE q.vec_id < 5),
        |ranked AS (
        |  SELECT q_id, nn_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos0 DESC, nn_id) AS rk
        |  FROM pairs)
        |SELECT CAST(count(DISTINCT q_id) AS BIGINT) AS n_queries,
        |  CAST(count(*) AS BIGINT) AS n_brute,
        |  CAST(1 AS BIGINT) AS recall_ok
        |FROM ranked WHERE rk <= 10""".stripMargin,
    "sim_label_centroid" ->
      """WITH dims AS (
        |  SELECT label, r.i,
        |    CAST(SUM(CAST(embedding[r.i + 1] AS DECIMAL(28,10))) AS DOUBLE) AS s
        |  FROM embeddings, (SELECT unnest(range(64)) AS i) r
        |  GROUP BY label, r.i),
        |cents AS (
        |  SELECT label AS c_label, list(s ORDER BY i) AS centroid
        |  FROM dims GROUP BY label),
        |scored AS (
        |  SELECT e.label, e.vec_id,
        |    round(list_sum([CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)
        |            for p in list_zip(e.embedding, c.centroid)])
        |      / (sqrt(list_sum([CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)
        |            for p in list_zip(e.embedding, e.embedding)]))
        |       * sqrt(list_sum([CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)
        |            for p in list_zip(c.centroid, c.centroid)]))), 4) AS cos_c
        |  FROM embeddings e JOIN cents c ON e.label = c.c_label)
        |SELECT label, count(*) AS n,
        |  round(CAST(SUM(CAST(cos_c AS DECIMAL(18,12))) AS DOUBLE)
        |        / count(*), 4) AS avg_cos
        |FROM scored GROUP BY label ORDER BY label""".stripMargin
  )
}
