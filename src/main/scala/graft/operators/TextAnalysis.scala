package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting.
  *
  * All pure `functions._` / regex expressions — no UDFs — so every
  * operator is a narrow map over the scan: at 100 TB these run at
  * parquet-read speed with zero shuffles.
  */
object TextAnalysis {

  /** normalized text: lower + trimmed */
  def normText(c: Column): Column = lower(trim(c))

  /** whitespace tokens of normalized text */
  def tokens(c: Column): Column = split(normText(c), "\\s+")

  private val stopwords =
    Seq("the", "a", "of", "and", "is", "in", "to", "it", "on", "for")

  def stopwordRatio(c: Column): Column = {
    val toks = tokens(c)
    val stops = filter(toks, t => t.isInCollection(stopwords))
    size(stops).cast("double") / size(toks)
  }

  def punctRatio(c: Column): Column =
    length(regexp_replace(c, "[a-zA-Z0-9\\s]", "")).cast("double") / length(c)

  /** tiny per-language marker-word profiles; scores are marker-token hits */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  /** marker-word heuristic language-ID: argmax of profile hits with
    * earlier-profile preference on ties; 'und' when nothing matches. */
  def langId(c: Column): Column = {
    val toks = tokens(c)
    val Seq(sEn, sDe, sFr) = langProfiles.map { case (_, words) =>
      size(filter(toks, t => t.isInCollection(words)))
    }
    when(greatest(sEn, sDe, sFr) === 0, lit("und"))
      .when(sFr > sDe && sFr > sEn, lit("fr"))
      .when(sDe > sEn, lit("de"))
      .otherwise(lit("en"))
  }

  /** content fingerprint over normalized text (md5 — stable across
    * engines; use xxhash64 for cheaper non-portable runs) */
  def fingerprint(c: Column): Column = md5(normText(c))

  // --------------------------------------------------------- driver queries
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_token_count" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).as("n_tokens"),
          size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("n_words"))
        .orderBy(col("doc_id"))
    }),
    "ta_quality" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).as("len"),
          round(stopwordRatio(col("text")), 6).as("stop_ratio"),
          round(punctRatio(col("text")), 6).as("punct_ratio"),
          round(length(regexp_replace(normText(col("text")), "[^a-z]", ""))
            .cast("double") / size(tokens(col("text"))), 6).as("avg_word_len"))
        .orderBy(col("doc_id"))
    }),
    "ta_langid" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), langId(col("text")).as("pred_lang"))
        .orderBy(col("doc_id"))
    }),
    "ta_fingerprint" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    })
  )

  private val stopList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  def oracleSql: Map[String, String] = Map(
    "ta_token_count" ->
      """SELECT doc_id,
        |  len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ta_quality" ->
      s"""SELECT doc_id, length(text) AS len,
        |  round(CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
        |        t -> list_contains($stopList, t))) AS DOUBLE)
        |    / len(string_split_regex(lower(trim(text)), '\\s+')), 6) AS stop_ratio,
        |  round(CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
        |    / length(text), 6) AS punct_ratio,
        |  round(CAST(length(regexp_replace(lower(trim(text)), '[^a-z]', '', 'g')) AS DOUBLE)
        |    / len(string_split_regex(lower(trim(text)), '\\s+')), 6) AS avg_word_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ta_langid" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |        t -> list_contains(['the','a','of','and','is'], t))) AS s_en,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |        t -> list_contains(['der','die','das','und','ist'], t))) AS s_de,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |        t -> list_contains(['le','la','les','et','est'], t))) AS s_fr
        |  FROM documents)
        |SELECT doc_id, CASE
        |  WHEN greatest(s_en, s_de, s_fr) = 0 THEN 'und'
        |  WHEN s_fr > s_de AND s_fr > s_en THEN 'fr'
        |  WHEN s_de > s_en THEN 'de'
        |  ELSE 'en' END AS pred_lang
        |FROM scored ORDER BY doc_id""".stripMargin,
    "ta_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
