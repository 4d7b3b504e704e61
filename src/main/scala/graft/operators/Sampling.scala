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

  // --------------------------------------------------------- driver queries
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    })
  )

  def oracleSql: Map[String, String] = Map(
    "ta_sample_stratified" ->
      """SELECT source, count(*) AS n_sampled,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_sampled, min(doc_id) AS first_doc
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |        AS BIGINT) / 1152921504606846976.0
        |  < (CASE WHEN source IN ('src0', 'src1') THEN 0.5 ELSE 0.1 END)
        |GROUP BY source ORDER BY source""".stripMargin
  )
}
