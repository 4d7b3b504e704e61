package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Checkpoints
import graft.sources.Tables
import graft.operators.TextAnalysis.tokens

/** Sparse lexical retrieval: BM25 scoring and reciprocal-rank fusion.
  *
  * The retrieval half of a training-data pipeline — mining a 100 TB
  * corpus for documents relevant to a benchmark query set (targeted
  * decontamination, eval-set curation, RAG index bootstrap) — is an
  * inverted-index scan, and that index is exactly one keyed shuffle
  * away from the corpus: `explode(tokens)` → groupBy (doc, term). The
  * query set is small by construction, so every query-side join here
  * rides a broadcast; nothing iterates on the driver.
  *
  * Determinism contract (same as [[TextAnalysis.tfidfTopK]]'s rational
  * idf note): BM25's log-idf is only within-ulp reproducible across
  * engines, so every rank boundary is taken over `round(score, 9)` —
  * quantization far above accumulated ulp noise, far below real score
  * gaps — with doc_id as the total-order tie-break. The reported score
  * is rounded to 6 dp, the driver's float-compare precision.
  */
object Retrieval {

  /** Fixed benchmark query set (qid, term) — three 3-term queries over
    * the synthetic vocabulary, mixed common/rare df. */
  val benchmarkTerms: Seq[(Long, String)] = Seq(
    (1L, "spark"), (1L, "merge"), (1L, "join"),
    (2L, "vector"), (2L, "scan"), (2L, "batch"),
    (3L, "customer"), (3L, "stream"), (3L, "window"))

  /** Postings list: one row per (doc_id, term) with term frequency and
    * the document length it was drawn from. The single wide shuffle of
    * the module — map-side combine collapses the token stream before it
    * ships. `dl` is recovered as Σtf per doc AFTER the aggregation (the
    * identical value — token count including duplicates): computing it
    * inline as `size(tokens(text))` next to the explode tokenized every
    * document twice and carried the length through the generator, a
    * measured 2× on the corpus scan. */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("dl",
        sum(col("tf")).over(Window.partitionBy(col("doc_id"))))

  /** Okapi BM25 (Robertson & Zaragoza, FnTIR'09) scores for every
    * (query, doc) pair sharing at least one term:
    *
    *   idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))      [the +1 form —
    *            never negative, the Lucene default]
    *   s(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
    *
    * Plan shape: postings ⋈ broadcast(query terms) prunes the corpus to
    * matching rows FIRST — including for the df computation, which
    * aggregates only the pruned rows (df per term is identical either
    * way since postings are doc-distinct per term, but aggregating the
    * full vocabulary for a ~|q|-row answer is a full term-keyed shuffle
    * at corpus scale); N and avgdl are one broadcast scalar row. The
    * scoring aggregation is keyed (qid, doc_id) — partial sums combine
    * map-side, so the shuffle carries one row per scored pair, not one
    * per matched term. */
  def bm25(docs: DataFrame, queryTerms: DataFrame, k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    bm25FromPostings(Checkpoints.materialize(postings(docs)), queryTerms, k1, b)

  /** BM25 over a pre-built (materialized) postings table — the index-
    * reuse path: df, N/avgdl and the match join all read the SAME
    * postings instead of re-tokenizing the corpus per consumer (every
    * doc contributes ≥ 1 posting row — even an empty text yields the
    * one empty-string token — so N and avgdl derived here equal the
    * corpus-side values exactly). */
  def bm25FromPostings(post: DataFrame, queryTerms: DataFrame,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val stats = post.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    // Prune to query terms BEFORE the df aggregation: the broadcast
    // semi-join drops non-matching postings map-side, so the term-keyed
    // shuffle feeding df carries only matching rows — not the whole
    // vocabulary for a ~|q|-row answer. df values are unchanged
    // (postings are doc-distinct per term).
    val matched = post.join(
      broadcast(queryTerms.select("term").distinct()), Seq("term"), "left_semi")
    val dfreq = matched.groupBy(col("term")).agg(count(lit(1)).as("df"))
    matched.join(broadcast(queryTerms), "term")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("__tfn",
        col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("__idf") * col("__tfn")).as("score"))
  }

  /** Rational query–doc TF-IDF relevance (Σ tf · (N-df+0.5)/(df+0.5)) —
    * the same log-free idf as [[TextAnalysis.tfidfTopK]], bit-identical
    * across engines; the second ranker RRF fuses against. */
  def tfidfRelevance(docs: DataFrame, queryTerms: DataFrame): DataFrame =
    tfidfFromPostings(Checkpoints.materialize(postings(docs)), queryTerms)

  /** TF-IDF relevance over a pre-built postings table (see
    * [[bm25FromPostings]] for why N can be derived from it and why df
    * aggregates only the term-pruned postings). */
  def tfidfFromPostings(post: DataFrame, queryTerms: DataFrame): DataFrame = {
    val nDocs = post.select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n_docs"))
    val matched = post.join(
      broadcast(queryTerms.select("term").distinct()), Seq("term"), "left_semi")
    val dfreq = matched.groupBy(col("term")).agg(count(lit(1)).as("df"))
    matched.join(broadcast(queryTerms), "term")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(nDocs))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("tf") * (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
        .as("score"))
  }

  private def rankWindow: org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(col("qid"))
      .orderBy(round(col("score"), 9).desc, col("doc_id"))

  /** Per-query top-k by quantized score; `rk` is the dense 1..k rank. */
  def topK(scores: DataFrame, k: Int): DataFrame =
    scores.withColumn("rk", row_number().over(rankWindow))
      .filter(col("rk") <= k)
      .select(col("qid"), col("doc_id"), col("rk"),
        round(col("score"), 6).as("score"))

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09):
    * rrf(d) = Σ_r 1/(kr + rank_r(d)) over the input rankings. Ranks are
    * computed over each FULL candidate list — both lexical rankers here
    * share the exact same candidate support (docs containing ≥1 query
    * term), so the join is inner and no missing-rank convention is
    * needed. RRF values are sums of two small-denominator rationals —
    * exactly reproducible; ties (symmetric rank swaps) break on doc_id.
    *
    * The fusion is ranker-agnostic — `aRank`/`bRank` name the output
    * rank columns for whatever pair of score tables is fused (the
    * benchmark call site passes r_bm25/r_tfidf). */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, kr: Int = 60,
      aRank: String = "r_a", bRank: String = "r_b"): DataFrame = {
    val ra = a.withColumn(aRank, row_number().over(rankWindow))
      .select(col("qid"), col("doc_id"), col(aRank))
    val rb = b.withColumn(bRank, row_number().over(rankWindow))
      .select(col("qid"), col("doc_id"), col(bRank))
    val fusedW = Window.partitionBy(col("qid"))
      .orderBy(round(col("rrf"), 9).desc, col("doc_id"))
    ra.join(rb, Seq("qid", "doc_id"))
      .withColumn("rrf",
        lit(1.0) / (lit(kr) + col(aRank)) + lit(1.0) / (lit(kr) + col(bRank)))
      .withColumn("rk", row_number().over(fusedW))
      .filter(col("rk") <= k)
      .select(col("qid"), col("doc_id"), col(aRank), col(bRank),
        col("rk"), round(col("rrf"), 6).as("rrf"))
  }

  private def queryTermsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    benchmarkTerms.toDF("qid", "term")
  }

  // --------------------------------------------------------- driver queries
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ret_bm25" -> ((s, dir) =>
      topK(bm25(Tables.load(s, dir, "documents"), queryTermsDf(s)), k = 10)
        .orderBy(col("qid"), col("rk"))),
    // HYBRID more-like-this: the query docs (id < 3) rank the corpus
    // lexically (BM25 over their own distinct tokens) AND semantically
    // (exact cosine over the aligned embeddings — brute is the
    // baseline; the IVF/LSH paths are the documented scale route), then
    // reciprocal-rank fusion merges the two orderings. Both legs
    // exclude the query doc itself; the lexical leg naturally restricts
    // to docs sharing >= 1 term, and the fusion's inner join keeps docs
    // both rankers saw (the standard RRF contract here).
    "ret_hybrid" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val qterms = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"),
          explode(TextAnalysis.tokens(col("text"))).as("term"))
        .distinct()
      val lex = bm25FromPostings(
        Checkpoints.materialize(postings(docs)), qterms)
        .filter(col("doc_id") =!= col("qid"))
      val qv = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          Vectors.norm2Fast(col("embedding")).as("qn"))
      val dense = emb
        .select(col("vec_id").as("doc_id"), col("embedding").as("ce"),
          Vectors.norm2Fast(col("embedding")).as("cn"))
        .crossJoin(broadcast(qv))
        .filter(col("doc_id") =!= col("qid"))
        .select(col("qid"), col("doc_id"),
          (Vectors.dotFast(col("qe"), col("ce")) /
            (col("qn") * col("cn"))).as("score"))
      rrfFuse(lex, dense, k = 10, aRank = "r_lex", bRank = "r_dense")
        .orderBy(col("qid"), col("rk"))
    }),
    "ret_rrf_fusion" -> ((s, dir) => {
      // ONE postings build shared by both rankers (the inverted index is
      // built once and consulted twice — set graft.checkpoint.dir to
      // land it on fault-tolerant storage at cluster scale)
      val post = Checkpoints.materialize(
        postings(Tables.load(s, dir, "documents")))
      val qt = queryTermsDf(s)
      rrfFuse(bm25FromPostings(post, qt), tfidfFromPostings(post, qt),
          k = 10, aRank = "r_bm25", bRank = "r_tfidf")
        .orderBy(col("qid"), col("rk"))
    })
  )

  private val qtermsSql =
    "qterms(qid, term) AS (VALUES " + benchmarkTerms
      .map { case (q, t) => s"($q, '$t')" }.mkString(", ") + ")"

  private def bm25CoreSqlWith(qterms: String) =
    s"""$qterms,
       |toks AS (
       |  SELECT doc_id,
       |    len(string_split_regex(lower(trim(text)), '\\s+')) AS dl,
       |    unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
       |  FROM documents),
       |post AS (SELECT doc_id, term, dl, count(*) AS tf
       |         FROM toks GROUP BY 1, 2, 3),
       |stats AS (SELECT count(*) AS n_docs,
       |    avg(len(string_split_regex(lower(trim(text)), '\\s+'))) AS avgdl
       |  FROM documents),
       |dfreq AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
       |bm AS (
       |  SELECT q.qid, p.doc_id,
       |    sum(ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
       |      * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avgdl)))
       |      AS score
       |  FROM post p
       |  JOIN qterms q ON q.term = p.term
       |  JOIN dfreq f ON f.term = p.term
       |  CROSS JOIN stats s
       |  GROUP BY 1, 2)""".stripMargin

  private val bm25CoreSql = bm25CoreSqlWith(qtermsSql)

  def oracleSql: Map[String, String] = Map(
    "ret_hybrid" ->
      s"""WITH ${bm25CoreSqlWith(
            """qterms AS (
              |  SELECT DISTINCT qid, term FROM (
              |    SELECT doc_id AS qid,
              |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
              |    FROM documents WHERE doc_id < 3))""".stripMargin)},
         |v AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_sum([CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)
         |         for x in list_zip(embedding, embedding)])) AS nrm
         |  FROM embeddings),
         |dense AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS doc_id,
         |    list_sum([CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)
         |      for x in list_zip(q.embedding, c.embedding)]) / (q.nrm * c.nrm)
         |      AS score
         |  FROM v q JOIN v c ON c.vec_id != q.vec_id
         |  WHERE q.vec_id < 3),
         |ra AS (SELECT qid, doc_id, row_number() OVER (
         |    PARTITION BY qid ORDER BY round(score, 9) DESC, doc_id) AS r_lex
         |  FROM bm WHERE doc_id <> qid),
         |rb AS (SELECT qid, doc_id, row_number() OVER (
         |    PARTITION BY qid ORDER BY round(score, 9) DESC, doc_id) AS r_dense
         |  FROM dense),
         |fused AS (
         |  SELECT ra.qid, ra.doc_id, ra.r_lex, rb.r_dense,
         |    1.0 / (60 + ra.r_lex) + 1.0 / (60 + rb.r_dense) AS rrf
         |  FROM ra JOIN rb ON ra.qid = rb.qid AND ra.doc_id = rb.doc_id),
         |final AS (
         |  SELECT qid, doc_id, r_lex, r_dense, rrf, row_number() OVER (
         |    PARTITION BY qid ORDER BY round(rrf, 9) DESC, doc_id) AS rk
         |  FROM fused)
         |SELECT qid, doc_id, r_lex, r_dense, rk, round(rrf, 6) AS rrf
         |FROM final WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "ret_bm25" ->
      s"""WITH $bm25CoreSql,
         |ranked AS (
         |  SELECT qid, doc_id, score, row_number() OVER (
         |    PARTITION BY qid ORDER BY round(score, 9) DESC, doc_id) AS rk
         |  FROM bm)
         |SELECT qid, doc_id, rk, round(score, 6) AS score
         |FROM ranked WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "ret_rrf_fusion" ->
      s"""WITH $bm25CoreSql,
         |ti AS (
         |  SELECT q.qid, p.doc_id,
         |    sum(p.tf * (s.n_docs - f.df + 0.5) / (f.df + 0.5)) AS score
         |  FROM post p
         |  JOIN qterms q ON q.term = p.term
         |  JOIN dfreq f ON f.term = p.term
         |  CROSS JOIN stats s
         |  GROUP BY 1, 2),
         |ra AS (SELECT qid, doc_id, row_number() OVER (
         |    PARTITION BY qid ORDER BY round(score, 9) DESC, doc_id) AS r_bm25
         |  FROM bm),
         |rb AS (SELECT qid, doc_id, row_number() OVER (
         |    PARTITION BY qid ORDER BY round(score, 9) DESC, doc_id) AS r_tfidf
         |  FROM ti),
         |fused AS (
         |  SELECT ra.qid, ra.doc_id, ra.r_bm25, rb.r_tfidf,
         |    1.0 / (60 + ra.r_bm25) + 1.0 / (60 + rb.r_tfidf) AS rrf
         |  FROM ra JOIN rb ON ra.qid = rb.qid AND ra.doc_id = rb.doc_id),
         |final AS (
         |  SELECT qid, doc_id, r_bm25, r_tfidf, rrf, row_number() OVER (
         |    PARTITION BY qid ORDER BY round(rrf, 9) DESC, doc_id) AS rk
         |  FROM fused)
         |SELECT qid, doc_id, r_bm25, r_tfidf, rk, round(rrf, 6) AS rrf
         |FROM final WHERE rk <= 10 ORDER BY qid, rk""".stripMargin
  )
}
