package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** C4-style corpus cleanup (Raffel et al., "Exploring the Limits of
  * Transfer Learning with a Unified Text-to-Text Transformer", JMLR
  * 2020, §2.2 — the other canonical pretraining filter besides the
  * Gopher rules in [[TextAnalysis.gopherQualityFlags]]):
  *
  *   - keep only lines that end in terminal punctuation (`.` `!` `?`
  *     `"`), contain at least 5 words, and do not contain the word
  *     "javascript" (boilerplate marker);
  *   - drop pages containing "lorem ipsum" or a `{` (code), or with
  *     fewer than 3 sentences after line cleaning;
  *   - deduplicate THREE-SENTENCE SPANS across the whole corpus,
  *     keeping only the first occurrence of each span.
  *
  * Scale shape: line cleaning and page flags are pure codegen'd
  * expressions over one narrow map — parquet-scan speed, zero shuffle.
  * Span dedup is the only wide path: explode to (doc, fragment) rows,
  * one shuffle keyed by doc_id for the sliding-span window, one keyed
  * by span hash for the first-occurrence window — the [[Dedup.exact]]
  * shape, linear in corpus size, no all-pairs anywhere. Sentence
  * fragments use a punctuation split (no
  * lookbehind — Java and RE2 regex engines agree), and the span hash is
  * the portable 60-bit md5 lane so DuckDB reproduces every value.
  */
object C4 {

  /** Lines surviving the C4 line rules, rejoined with newlines. The
    * terminal-punctuation anchor is `\z` (strict end-of-text, identical
    * in Java and RE2) — Java's `$` also matches before a trailing `\r`,
    * RE2's does not, so `$` would diverge on CRLF corpora. */
  def lineClean(c: Column): Column = {
    val kept = filter(split(c, "\n"), l =>
      trim(l).rlike("[.!?\"]\\z") &&
        size(split(trim(l), "\\s+")) >= 5 &&
        !lower(l).contains("javascript"))
    concat_ws("\n", kept)
  }

  /** Number of sentence terminators in the text — the portable "at
    * least N sentences" measure (split-count, stays inside codegen). */
  def sentenceCount(c: Column): Column =
    size(split(c, "[.!?]", -1)) - 1

  /** Page-level flags: the content markers ("lorem ipsum", `{`) test the
    * RAW page — the paper drops pages whose content contains them, even
    * when the offending line would already fall to line cleaning — while
    * the sentence floor applies to what line cleaning RETAINED. */
  def pageFlags(raw: Column, cleaned: Column): Column = struct(
    (!lower(raw).contains("lorem ipsum")).as("ok_lorem"),
    (!raw.contains("{")).as("ok_brace"),
    (sentenceCount(cleaned) >= 3).as("ok_sentences"))

  /** (doc_id, span_id, h, first) rows: every 3-sentence-fragment span of
    * each document with its portable hash and a corpus-global
    * first-occurrence flag (ties broken by doc_id then span position —
    * total order, so the kept occurrence is deterministic). */
  def spanDedup(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frags = docs.select(col("doc_id"),
        posexplode(filter(
          transform(split(col("text"), "[.!?]"), f => trim(f)),
          f => f =!= "")).as(Seq("pos", "frag")))
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = frags.select(col("doc_id"), col("pos"),
        concat_ws(" ", col("frag"), lead(col("frag"), 1).over(byPos),
          lead(col("frag"), 2).over(byPos)).as("span"),
        lead(col("frag"), 2).over(byPos).isNotNull.as("__full"))
      .filter(col("__full"))
      .select(col("doc_id"), col("pos").as("span_id"),
        TextAnalysis.md5Prefix60(col("span")).as("h"))
    val firstWin = Window.partitionBy(col("h"))
      .orderBy(col("doc_id"), col("span_id"))
    spans.withColumn("first",
      (row_number().over(firstWin) === 1).cast("bigint"))
  }

  /** Deterministic sentence/boilerplate planting for the driver gates:
    * the synthetic corpus is punctuation-free word soup, on which every
    * C4 rule is vacuous, so (the ta_scrub pattern) each document gets a
    * deterministic multi-line tail — a soup-terminating sentence, a kept
    * sentence, a too-short line, a javascript line, and per-doc_id
    * conditional `{` / "lorem ipsum" lines — making every rule fire
    * differentially while the oracle reproduces the construction. */
  def plantForC4(docs: DataFrame): DataFrame =
    docs.select(col("source"), col("doc_id"), concat(
      col("text"), lit(". End of the soup here.\n"),
      lit("This is a proper sentence with punctuation.\n"),
      lit("Short line.\n"),
      lit("This line mentions javascript libraries at length today.\n"),
      lit("Another good sentence appears right here today!"),
      when(col("doc_id") % 4 === 0,
        lit("\nSee the code sample { here.")).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        lit("\nWe love Lorem Ipsum filler text.")).otherwise(lit("")))
      .as("text"))

  // --------------------------------------------------------- driver queries
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // line + page rules: per-source survivor counts, total kept lines
    // and sentences, and the full cleaned-content checksum
    "ta_c4" -> ((s, dir) => {
      val docs = plantForC4(Tables.load(s, dir, "documents"))
      val flags = Seq("ok_lorem", "ok_brace", "ok_sentences")
      val cleaned = docs
        .select(col("source"), col("text"), lineClean(col("text")).as("ctext"))
        .withColumn("q", pageFlags(col("text"), col("ctext")))
      cleaned.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          flags.map(f => sum(col(s"q.$f").cast("long")).as(s"n_$f")) ++ Seq(
            sum(flags.map(f => col(s"q.$f")).reduce(_ && _).cast("long"))
              .as("n_pass"),
            sum(when(col("ctext") === "", 0L)
              .otherwise(size(split(col("ctext"), "\n")))).as("lines_kept"),
            sum(sentenceCount(col("ctext"))).as("sentences"),
            TextAnalysis.checksum60(
              TextAnalysis.md5Prefix60(col("ctext"))).as("clean_checksum")): _*)
        .orderBy(col("source"))
    }),
    // cross-corpus three-sentence-span dedup: census + duplicate mass +
    // order-independent checksum of the KEPT (first-occurrence) spans.
    // The planted constant sentences create genuine cross-document
    // duplicate spans (every span made only of planted fragments repeats
    // corpus-wide), so n_dup_removed is large and the first-occurrence
    // tie-break is exercised for real.
    // Shuffle shape (r19): the published aggregate only needs the span-
    // hash MULTISET — per-h counts give every output exactly:
    //   n_spans       = Σ c(h)                 (= count over span rows)
    //   n_unique      = |{h}|                  (= count_distinct(h))
    //   n_dup_removed = Σ (c(h) − 1) = n_spans − n_unique
    //                                          (= Σ (1 − first): each h
    //                                           has exactly ONE first row)
    //   kept_checksum = Σ_{distinct h} h mod 2^60
    //                                          (= checksum over first
    //                                           rows: one per distinct h)
    // so neither [[spanDedup]] window survives into this plan: spans are
    // assembled from the fragment ARRAY carried through posexplode
    // (element_at is codegen'd — no lead() window, no per-doc sort) and
    // the only exchange is the groupBy(h) with map-side combine. The old
    // plan paid 3 wide exchanges (doc_id window, h window, final agg) and
    // shuffled every span row; this one shuffles distinct-h partials.
    // Span values are bit-identical: same filtered-fragment array, same
    // pos-indexed 3-fragment concat_ws, same md5 lane.
    "ta_c4_spans" -> ((s, dir) => {
      val withFrags = plantForC4(Tables.load(s, dir, "documents"))
        .select(filter(
          transform(split(col("text"), "[.!?]"), f => trim(f)),
          f => f =!= "").as("frags"))
      val spans = withFrags
        .select(col("frags"), posexplode(col("frags")).as(Seq("pos", "frag")))
        .filter(col("pos") <= size(col("frags")) - 3)
        .select(TextAnalysis.md5Prefix60(concat_ws(" ", col("frag"),
          element_at(col("frags"), col("pos") + 2),
          element_at(col("frags"), col("pos") + 3))).as("h"))
      spans.groupBy(col("h")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_spans"),
          count(lit(1)).as("n_unique"),
          (sum(col("c")) - count(lit(1))).as("n_dup_removed"),
          TextAnalysis.checksum60(col("h")).as("kept_checksum"))
    })
  )

  /** the [[plantForC4]] construction, DuckDB side */
  private val plantedCte: String =
    """p AS (
      |  SELECT source, doc_id,
      |    text || '. End of the soup here.' || chr(10)
      |      || 'This is a proper sentence with punctuation.' || chr(10)
      |      || 'Short line.' || chr(10)
      |      || 'This line mentions javascript libraries at length today.'
      |      || chr(10)
      |      || 'Another good sentence appears right here today!'
      |      || CASE WHEN doc_id % 4 = 0
      |           THEN chr(10) || 'See the code sample { here.' ELSE '' END
      |      || CASE WHEN doc_id % 5 = 0
      |           THEN chr(10) || 'We love Lorem Ipsum filler text.'
      |           ELSE '' END AS text
      |  FROM documents)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "ta_c4" ->
      ("WITH " + plantedCte + """,
        |c AS (
        |  SELECT source, text,
        |    COALESCE(array_to_string(list_filter(string_split(text, chr(10)),
        |      l -> regexp_matches(trim(l), '[.!?"]\z')
        |        AND len(string_split_regex(trim(l), '\s+')) >= 5
        |        AND position('javascript' IN lower(l)) = 0), chr(10)), '')
        |      AS ctext
        |  FROM p),
        |f AS (
        |  SELECT source, ctext,
        |    position('lorem ipsum' IN lower(text)) = 0 AS ok_lorem,
        |    position('{' IN text) = 0 AS ok_brace,
        |    len(string_split_regex(ctext, '[.!?]')) - 1 >= 3 AS ok_sentences
        |  FROM c)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN ok_lorem THEN 1 ELSE 0 END) AS BIGINT) AS n_ok_lorem,
        |  CAST(sum(CASE WHEN ok_brace THEN 1 ELSE 0 END) AS BIGINT) AS n_ok_brace,
        |  CAST(sum(CASE WHEN ok_sentences THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_ok_sentences,
        |  CAST(sum(CASE WHEN ok_lorem AND ok_brace AND ok_sentences
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
        |  CAST(sum(CASE WHEN ctext = '' THEN 0
        |    ELSE len(string_split(ctext, chr(10))) END) AS BIGINT) AS lines_kept,
        |  CAST(sum(len(string_split_regex(ctext, '[.!?]')) - 1) AS BIGINT)
        |    AS sentences,
        |  CAST(sum(CAST(('0x' || substr(md5(ctext), 1, 15)) AS BIGINT))
        |    % 1152921504606846976 AS BIGINT) AS clean_checksum
        |FROM f GROUP BY source ORDER BY source""".stripMargin),
    "ta_c4_spans" ->
      ("WITH " + plantedCte + """,
        |s AS (
        |  SELECT doc_id,
        |    list_filter(list_transform(string_split_regex(text, '[.!?]'),
        |      f -> trim(f)), f -> f <> '') AS frags
        |  FROM p),
        |sp AS (
        |  SELECT doc_id,
        |    unnest(range(len(frags) - 2)) AS span_id, frags
        |  FROM s WHERE len(frags) >= 3),
        |h AS (
        |  SELECT doc_id, span_id,
        |    CAST(('0x' || substr(md5(
        |      frags[span_id+1] || ' ' || frags[span_id+2] || ' '
        |        || frags[span_id+3]), 1, 15)) AS BIGINT) AS h
        |  FROM sp),
        |r AS (
        |  SELECT h,
        |    row_number() OVER (PARTITION BY h ORDER BY doc_id, span_id) AS rn
        |  FROM h)
        |SELECT CAST(count(*) AS BIGINT) AS n_spans,
        |  CAST(count(DISTINCT h) AS BIGINT) AS n_unique,
        |  CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_dup_removed,
        |  CAST(sum(CASE WHEN rn = 1 THEN h ELSE 0 END)
        |    % 1152921504606846976 AS BIGINT) AS kept_checksum
        |FROM r""".stripMargin)
  )
}
