package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deterministic sampling for training-data pipelines.
  *
  * At 100 TB, `rand()`-based sampling is an anti-pattern: a retried task
  * re-rolls the dice (non-deterministic sources break Spark's task-retry
  * contract), and a re-run of the pipeline selects a different subset, so
  * nothing downstream is reproducible or auditable. Hash-based Bernoulli
  * sampling fixes both: membership is a pure function of the row key, so
  * every executor, retry, and re-run agrees. It is also portable — an
  * md5-derived uniform can be recomputed by any engine, which is exactly
  * how the DuckDB oracle checks these operators.
  *
  * Everything here is a narrow map over the scan (codegen'd built-in
  * expressions, no UDFs, no shuffle): the filter pushes to the parquet
  * scan boundary and the sampled fraction is all that ever leaves it.
  */
object Sampling {

  /** Uniform in [0, 1) derived from the top 60 bits of md5(key) —
    * portable across engines (DuckDB:
    * `CAST(('0x' || substr(md5(k), 1, 15)) AS BIGINT) / 2.0^60`). */
  def uniformHash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("double") / lit(1152921504606846976.0) // 2^60

  /** Deterministic Bernoulli sample: keep rows where hash-uniform <
    * fraction. Same key set selected on every run and every retry. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(uniformHash(key) < fraction)

  /** Stratified deterministic sample: per-stratum fractions, defaulting
    * to `default` for unlisted strata. One pass, no shuffle — the
    * fraction lookup is a literal CASE chain. */
  def stratified(df: DataFrame, strata: Column, key: Column,
      fractions: Map[String, Double], default: Double): DataFrame = {
    val frac = fractions.foldLeft(lit(default)) { case (acc, (s, f)) =>
      when(strata === s, f).otherwise(acc)
    }
    df.filter(uniformHash(key) < frac)
  }

  /** Token-budget sharding: assign documents to shards of ~`budget`
    * tokens each. The scale-correct shape is HASH SPREAD, not a global
    * cumulative sum — a `Window.orderBy` cumsum funnels the corpus
    * through one task, while `floor(hash_uniform × nShards)` is a
    * narrow map whose per-shard totals concentrate around the budget by
    * the law of large numbers (shard skew ~ 1/√(docs per shard)). One
    * reduced aggregate computes the total; everything else is a
    * projection. Returns (doc_id, shard) plus the shard count. */
  def tokenShards(docs: DataFrame, tokensOf: Column, budget: Long): DataFrame = {
    val total = docs.agg(
      sum(tokensOf.cast("long")).as("__total"))
    docs.crossJoin(broadcast(total))
      .withColumn("__n_shards",
        greatest(lit(1L), ceil(col("__total").cast("double") / budget)))
      .withColumn("shard",
        floor(uniformHash(col("doc_id")) * col("__n_shards")).cast("long"))
      .drop("__total", "__n_shards")
  }

  /** Domain-mixture sampling: per-source keep fractions that hit a
    * target token-share distribution under a global token budget —
    * `fraction(s) = min(1, budget × weight(s) / tokens(s))` — then the
    * deterministic hash sample at that fraction. The fraction table is
    * a tiny per-source aggregate (broadcast); selection stays a pure
    * function of the row key, so the mixture is reproducible and
    * auditable — the property that matters when a training run must be
    * re-derived months later. Sources without a target weight get 0. */
  def mixtureSample(docs: DataFrame, sourceCol: Column, key: Column,
      tokensOf: Column, weights: Map[String, Double],
      budget: Long): DataFrame = {
    val perSource = docs.groupBy(sourceCol.as("__src"))
      .agg(sum(tokensOf.cast("long")).as("__src_tokens"))
    val targetTokens = weights.foldLeft(lit(0.0)) { case (acc, (s, w)) =>
      when(col("__src") === s, lit(budget * w)).otherwise(acc)
    }
    val fracs = perSource.withColumn("__frac",
      least(lit(1.0), targetTokens / col("__src_tokens")))
    docs.join(broadcast(fracs), sourceCol === col("__src"))
      .filter(uniformHash(key) < col("__frac"))
      .drop("__src", "__src_tokens", "__frac")
  }

  /** Deterministic corpus shuffle: global reordering by a SEEDED
    * portable hash — the "shuffle the training data" stage with no RNG
    * state anywhere, so every run, retry, and resumption produces the
    * identical order (and changing the seed produces an independent
    * order). At scale this is a range-partitioned sort on a 60-bit key:
    * Spark samples key ranges, each partition sorts locally, output is
    * globally ordered without any single-node bottleneck. Ties (hash
    * collisions) break on the key column for a total order. */
  def deterministicShuffle(df: DataFrame, key: Column, seed: Long): DataFrame =
    df.withColumn("shuffle_key", TextAnalysis.md5Prefix60(
        concat(lit(seed.toString), lit(":"), key.cast("string"))))
      .orderBy(col("shuffle_key"), key)

  /** DSIR-style importance weighting for data selection (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): score every raw document by a hashed-bigram bag
    * likelihood ratio between a TARGET subcorpus and the RAW corpus.
    * This variant replaces the paper's float log-probability ratio with
    * an integer rational weight per hash bucket,
    *   `w_b = ((n_target_b + 1) * 1e6) div (n_raw_b + 1)`
    * (Laplace smoothing, floor division — monotone in the smoothed
    * ratio), and scores `score(x) = Σ_{bigram ∈ x} w_bucket(bigram)`:
    * every step is an exact int64 operation, so scores and ranks are
    * bit-identical across engines (the rational-BM25 trick from
    * [[TextAnalysis.tfidfTopK]] applied to data selection). Bound:
    * target ⊆ raw ⇒ n_target_b ≤ n_raw_b ⇒ w_b ≤ 1e6, so
    * score ≤ 1e6 × doc_bigrams — int64-safe for any real document.
    *
    * Scale shape: ONE posexplode + doc-keyed lead() window builds the
    * bigram rows ([[Dedup.shingleRows]] — native ops, no lambda
    * fallback); bucket counts are two reduced aggregates over ≤nBuckets
    * keys (map-side partial → tiny results); the weight table is
    * broadcast and scoring is a per-doc sum — no corpus-sized shuffle
    * beyond the doc-keyed ones. Docs shorter than 2 tokens yield no
    * rows (callers left-join and default score to 0).
    *
    * Returns (doc_id, score). */
  def dsirScores(docs: DataFrame, isTarget: Column,
      nBuckets: Int = 512): DataFrame = {
    val rows = Dedup.shingleRows(
      docs.select(col("doc_id"), col("text"), isTarget.as("__tgt")),
      k = 2,
      g => pmod(TextAnalysis.md5Prefix60(g), lit(nBuckets.toLong)),
      carry = Seq("__tgt")).persist()
    val raw = rows.groupBy(col("s")).agg(count(lit(1)).as("__nr"))
    val tgt = rows.filter(col("__tgt")).groupBy(col("s"))
      .agg(count(lit(1)).as("__nt"))
    // `div` (not `/`): exact integral division — a float divide would
    // lose exactness past 2^53 at real corpus scale
    val weights = raw.join(tgt, Seq("s"), "left")
      .select(col("s"),
        expr("(coalesce(__nt, 0L) + 1L) * 1000000L div (__nr + 1L)").as("w"))
    rows.join(broadcast(weights), "s")
      .groupBy(col("doc_id")).agg(sum(col("w")).as("score"))
  }

  // --------------------------------------------------------- driver queries
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DSIR importance weighting with target = lang:'en': per-source doc
    // counts, exact integer score sums/max, and the count of docs
    // scoring above the corpus mean (rational comparison score·N > ΣS —
    // no float division anywhere), all bit-reproduced by the oracle
    "ta_importance" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val scores = dsirScores(docs, col("lang") === "en", nBuckets = 512)
      // corpus-sum arithmetic in exact DECIMAL: per-doc scores are
      // int64-safe (w ≤ 1e6), but Σscore and score·N exceed 2^63 at the
      // 100 TB design point — Spark's long arithmetic would WRAP silently
      // while DuckDB's HUGEINT stays exact, a silent divergence no small
      // SF exercises. Decimal sums/products match HUGEINT exactly. The
      // long cast on the OUTPUT column is guarded in-plan: under Spark's
      // non-ANSI semantics an overflowing decimal→long cast yields NULL
      // (it never reaches Verify's decimal-only int64 guard), so a sum
      // past 2^63 raises here instead of shipping a silent NULL.
      import org.apache.spark.sql.types.DecimalType
      val sc = docs.select(col("doc_id"), col("source"))
        .join(scores, Seq("doc_id"), "left")
        .select(col("source"), coalesce(col("score"), lit(0L)).as("score"))
      val tot = sc.agg(count(lit(1)).as("__n"),
        sum(col("score").cast(DecimalType(38, 0))).as("__s"))
      val decSum = sum(col("score").cast(DecimalType(38, 0)))
      sc.crossJoin(broadcast(tot))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          when(decSum > lit(Long.MaxValue).cast(DecimalType(38, 0)),
            raise_error(concat(lit("ta_importance: score_sum exceeds int64: "),
              decSum.cast("string"))))
            .otherwise(decSum).cast("long")
            .as("score_sum"),
          max(col("score")).as("max_score"),
          sum(when(col("score").cast(DecimalType(38, 0)) * col("__n")
            > col("__s"), 1L).otherwise(0L)).as("n_above_mean"))
        .orderBy(col("source"))
    }),
    // per-source stratified sample audit: the whole point is that the
    // sampled row SET (not just its size) is deterministic, so the
    // oracle can hash-match per-stratum counts and content aggregates
    "ta_sample_stratified" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      stratified(docs, col("source"), col("doc_id"),
        Map("src0" -> 0.5, "src1" -> 0.5), default = 0.1)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("n_chars")).as("chars_sampled"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("source"))
    }),
    // token-budget shards: hash-spread assignment (no global sort), the
    // full per-shard layout hash-checked — the portable hash makes even
    // the shard CONTENTS reproducible in the oracle
    "ta_shards" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).as("n_toks"))
      tokenShards(docs, col("n_toks"), budget = 20000L)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("tokens"))
        .orderBy(col("shard"))
    }),
    // deterministic training-order shuffle: the head of the seeded
    // global order, fully value-pinned (the top-k fuses to
    // TakeOrderedAndProject — no global single-partition sort)
    "ta_shuffle" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
      deterministicShuffle(docs, col("doc_id"), seed = 42L).limit(10)
    }),
    // per-domain document cap (RefinedWeb-style): at most 20 docs per
    // source, selected by deterministic hash order — not arrival order,
    // so every engine, partitioning, and retry selects the SAME set.
    // One keyed shuffle (the per-source rank window); a skewed source's
    // partition is bounded by its row count pre-cap, and the cap itself
    // bounds everything downstream — the standard guard against one
    // domain dominating a 100 TB crawl mix.
    "ta_domain_cap" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
      val h = TextAnalysis.md5Prefix60(col("doc_id").cast("string"))
      val w = Window.partitionBy(col("source")).orderBy(h, col("doc_id"))
      docs.select(col("doc_id"), col("source"),
          row_number().over(w).as("rk"))
        .filter(col("rk") <= 20)
        .orderBy(col("source"), col("doc_id"))
    }),
    // domain mixture under a 40k-token budget: src0 half, src1/src2 a
    // quarter each (exact binary weights — the budget×weight literals
    // must byte-match the oracle's), everything else weight 0
    "ta_mixture" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).as("n_toks"))
      mixtureSample(docs, col("source"), col("doc_id"), col("n_toks"),
        Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25), budget = 40000L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("tokens"))
        .orderBy(col("source"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "ta_domain_cap" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY
        |      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |        AS BIGINT),
        |      doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 20 ORDER BY source, doc_id""".stripMargin,
    // DuckDB sum(BIGINT) is HUGEINT (exact); comparisons against it are
    // fine, and the output sums are cast back inside int64 range
    // (w ≤ 1e6 since target ⊆ raw; see dsirScores bound)
    "ta_importance" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(array_to_string(toks[i+1:i+2], ' ')), 1, 15))
        |      AS BIGINT) % 512 AS s
        |  FROM (SELECT doc_id, lang, unnest(range(len(toks))) AS i, toks FROM d)
        |  WHERE i + 2 <= len(toks)),
        |raw AS (SELECT s, count(*) AS nr FROM bg GROUP BY s),
        |tgt AS (SELECT s, count(*) AS nt FROM bg WHERE lang = 'en' GROUP BY s),
        |w AS (
        |  SELECT raw.s, ((coalesce(nt, 0) + 1) * 1000000) // (nr + 1) AS w
        |  FROM raw LEFT JOIN tgt ON raw.s = tgt.s),
        |sc0 AS (
        |  SELECT doc_id, sum(w.w) AS score FROM bg JOIN w USING (s)
        |  GROUP BY doc_id),
        |sc AS (
        |  SELECT dd.doc_id, dd.source, coalesce(score, 0) AS score
        |  FROM (SELECT doc_id, source FROM documents) dd
        |  LEFT JOIN sc0 USING (doc_id)),
        |tot AS (SELECT count(*) AS n, sum(score) AS stot FROM sc)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(score) AS BIGINT) AS score_sum,
        |  CAST(max(score) AS BIGINT) AS max_score,
        |  CAST(sum(CASE WHEN score * n > stot THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_above_mean
        |FROM sc, tot GROUP BY source ORDER BY source""".stripMargin,
    "ta_sample_stratified" ->
      """SELECT source, count(*) AS n_sampled,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_sampled, min(doc_id) AS first_doc
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |        AS BIGINT) / 1152921504606846976.0
        |  < (CASE WHEN source IN ('src0', 'src1') THEN 0.5 ELSE 0.1 END)
        |GROUP BY source ORDER BY source""".stripMargin,
    "ta_shuffle" ->
      """SELECT doc_id,
        |  CAST(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))
        |    AS BIGINT) AS shuffle_key
        |FROM documents ORDER BY shuffle_key, doc_id LIMIT 10""".stripMargin,
    "ta_shards" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(string_split_regex(lower(trim(text)), '\s+')) AS n_toks
        |  FROM documents),
        |tot AS (
        |  SELECT greatest(1, CAST(ceil(CAST(sum(n_toks) AS DOUBLE) / 20000)
        |    AS BIGINT)) AS n_shards FROM t),
        |sh AS (
        |  SELECT doc_id, n_toks,
        |    CAST(floor(
        |      (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |         AS BIGINT) / 1152921504606846976.0)
        |      * CAST(n_shards AS DOUBLE)) AS BIGINT) AS shard
        |  FROM t, tot)
        |SELECT shard, count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS tokens
        |FROM sh GROUP BY shard ORDER BY shard""".stripMargin,
    "ta_mixture" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    len(string_split_regex(lower(trim(text)), '\s+')) AS n_toks
        |  FROM documents),
        |per AS (SELECT source, sum(n_toks) AS src_tokens FROM t GROUP BY source),
        |fr AS (
        |  SELECT source, least(1.0, (CASE source
        |      WHEN 'src0' THEN 20000.0 WHEN 'src1' THEN 10000.0
        |      WHEN 'src2' THEN 10000.0 ELSE 0.0 END)
        |    / CAST(src_tokens AS DOUBLE)) AS frac
        |  FROM per),
        |kept AS (
        |  SELECT t.source, t.n_toks FROM t JOIN fr ON t.source = fr.source
        |  WHERE CAST(('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 15))
        |          AS BIGINT) / 1152921504606846976.0 < fr.frac)
        |SELECT source, count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS tokens
        |FROM kept GROUP BY source ORDER BY source""".stripMargin
  )
}
