package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deduplication operators for training-data pipelines.
  *
  * Scale design (the part that matters at 100 TB):
  * - exact dedup is one hash-partitioned shuffle on the content digest —
  *   never on the content itself (bytes stay columnar in the scan);
  * - MinHash/LSH turns the O(n²) pair problem into `bands` small
  *   shuffles keyed by band hash: only documents sharing a band bucket
  *   are ever paired, and bucket sizes are bounded by construction;
  * - SimHash near-dup uses the pigeonhole band trick (hamming ≤ k ⇒ at
  *   least one of k+1 chunks equal), again shuffle-by-band-key only;
  * - embedding near-dup buckets by sign-random-projection before any
  *   pairing. Brute-force pairing exists only as the verification step
  *   *inside* a bucket.
  * All signature computation is `functions._` expressions (codegen'd,
  * no UDFs) — a narrow map over the scan.
  */
object Dedup {

  import TextAnalysis.{normText, tokens}

  /** word k-shingles of the normalized text, distinct */
  def shingles(c: Column, k: Int = 3): Column = {
    val toks = tokens(c)
    array_distinct(
      transform(sequence(lit(0), greatest(size(toks) - k, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** MinHash signature: `numHashes` seeded xxhash64 minima over shingles */
  def minhashSignature(sh: Column, numHashes: Int): Column = {
    val sigs = (0 until numHashes).map { seed =>
      array_min(transform(sh, s => xxhash64(lit(seed), s)))
    }
    array(sigs: _*)
  }

  /** LSH band keys: signature split into bands of `rowsPerBand`, each
    * band hashed to one bucket key */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, rowsPerBand)).as("bucket"))
    }: _*)

  /** exact 64-bit SimHash over tokens: bit b = sign of Σ ±1 votes */
  def simhash(c: Column): Column = {
    val hashes = transform(tokens(c), t => xxhash64(t))
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, b) => a + when(call_function("shiftright", h, b)
          .bitwiseAND(1) === 1, 1L).otherwise(-1L)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, b) => when(v > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** hamming distance between two 64-bit signatures */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** jaccard similarity of two (distinct-element) arrays */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  // ------------------------------------------------------------- pipelines

  /** Exact dedup: one row per distinct content digest, keeping min doc_id.
    * One shuffle, keyed by digest. */
  def exact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash+LSH near-dup candidate pairs, verified by exact shingle
    * jaccard ≥ `threshold`. Returns (doc_a, doc_b, jac) with doc_a <
    * doc_b. Shuffles: one by band bucket (candidate generation), one for
    * the verify join — never an all-pairs product. */
  def minhashDupPairs(docs: DataFrame, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, shingleK: Int = 3): DataFrame = {
    val withSig = docs
      .select(col("doc_id"), shingles(col("text"), shingleK).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = withSig
      .select(col("doc_id"), col("sh"),
        explode(lshBands(col("sig"), bands, numHashes / bands)).as("bk"))
    val l = banded.select(col("bk").as("bka"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val r = banded.select(col("bk").as("bkb"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    l.join(r, col("bka") === col("bkb") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= threshold)
      .distinct() // same pair can collide in several bands
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxDist. Pigeonhole
    * banding: with 4 16-bit chunks, any pair at distance ≤ 3 shares at
    * least one exact chunk — so pairing happens only inside chunk
    * buckets. */
  def simhashDupPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val chunks = 4
    val withSig = docs.select(col("doc_id"), simhash(col("text")).as("sig"))
    val banded = withSig.select(col("doc_id"), col("sig"),
      explode(array((0 until chunks).map { i =>
        struct(lit(i).as("chunk"),
          shiftright(col("sig"), i * 16).bitwiseAND(0xFFFF).as("bucket"))
      }: _*)).as("bk"))
    val l = banded.select(col("bk").as("bka"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val r = banded.select(col("bk").as("bkb"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    l.join(r, col("bka") === col("bkb") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        hamming64(col("sig_a"), col("sig_b")).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }

  /** Embedding cosine near-dup pairs ≥ threshold, bucketed by
    * sign-random-projection so only same-bucket vectors pair. */
  def embeddingDupPairs(emb: DataFrame, threshold: Double = 0.95,
      planes: Int = 8): DataFrame = {
    val withB = emb.select(col("vec_id"), col("embedding"),
      Vectors.srpBucket(col("embedding"), planes).as("bucket"))
    val l = withB.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val r = withB.select(col("bucket").as("bucket_b"), col("vec_id").as("id_b"), col("embedding").as("e_b"))
    l.join(r, col("bucket") === col("bucket_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Vectors.cosine(col("e_a"), col("e_b")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  // --------------------------------------------------------- driver queries
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup summary — oracle-checkable
    "dd_exact" -> ((s, dir) => {
      exact(Tables.load(s, dir, "documents"))
        .agg(count(lit(1)).as("n_unique"),
          sum(col("n_copies")).as("n_docs"),
          sum(when(col("n_copies") > 1, 1).otherwise(0)).as("n_dup_groups"))
    }),
    // n-gram jaccard near-dup pairs, exhaustive within source partitions —
    // oracle-checkable in DuckDB with identical list semantics
    "dd_ngram_jaccard" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), shingles(col("text"), 3).as("sh"))
      val l = d.select(col("source"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val r = d.select(col("source").as("source_b"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      l.join(r, col("source") === col("source_b") && col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), round(jaccard(col("sh_a"), col("sh_b")), 6).as("jac"))
        .filter(col("jac") >= 0.2)
        .orderBy(col("doc_a"), col("doc_b"))
    }),
    // MinHash LSH + verify (signature scheme is engine-specific → rows-only
    // gate; semantics proven in DedupSpec against exhaustive jaccard)
    "dd_minhash_lsh" -> ((s, dir) => {
      minhashDupPairs(Tables.load(s, dir, "documents"),
        numHashes = 16, bands = 4, threshold = 0.3)
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(round(avg(col("jac")), 6), lit(0.0)).as("avg_jac"))
    }),
    // SimHash near-dup (rows-only gate; DedupSpec checks hamming math)
    "dd_simhash" -> ((s, dir) => {
      simhashDupPairs(Tables.load(s, dir, "documents"), maxDist = 6)
        .agg(count(lit(1)).as("n_pairs"))
    }),
    // embedding cosine near-dup, brute-force within label groups —
    // oracle-checkable (DuckDB mirrors the double-precision expression)
    "dd_embedding_cos" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val l = e.select(col("label"), col("vec_id").as("id_a"), col("embedding").as("e_a"))
      val r = e.select(col("label").as("label_b"), col("vec_id").as("id_b"), col("embedding").as("e_b"))
      l.join(r, col("label") === col("label_b") && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          Vectors.cosine(col("e_a"), col("e_b")).as("cos0"))
        .filter(col("cos0") >= 0.4)
        .select(col("id_a"), col("id_b"), round(col("cos0"), 6).as("cos"))
        .orderBy(col("id_a"), col("id_b"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "dd_exact" ->
      """WITH g AS (
        |  SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS keep_id,
        |         count(*) AS n_copies
        |  FROM documents GROUP BY 1)
        |SELECT count(*) AS n_unique, sum(n_copies) AS n_docs,
        |       sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS n_dup_groups
        |FROM g""".stripMargin,
    "dd_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, source,
        |    list_distinct([array_to_string(toks[i:i+2], ' ')
        |      for i in range(1, greatest(len(toks) - 2, 1) + 1)]) AS s
        |  FROM (SELECT doc_id, source,
        |          string_split_regex(lower(trim(text)), '\s+') AS toks
        |        FROM documents))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.s, b.s))), 6) AS jac
        |FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.s, b.s))) >= 0.2
        |ORDER BY doc_a, doc_b""".stripMargin,
    // double-precision cosine mirroring the Spark expression exactly
    // (list_cosine_similarity is float32 → last-ulp mismatches)
    "dd_embedding_cos" ->
      """WITH v AS (
        |  SELECT label, vec_id, embedding,
        |    sqrt(list_sum([CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)
        |         for s in list_zip(embedding, embedding)])) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_sum([CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)
        |      for s in list_zip(a.embedding, b.embedding)]) / (a.nrm * b.nrm) AS cos0
        |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(cos0, 6) AS cos
        |FROM p WHERE cos0 >= 0.4 ORDER BY id_a, id_b""".stripMargin
  )
}
