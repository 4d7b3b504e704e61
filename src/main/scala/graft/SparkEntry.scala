package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every entry has (where SQL
  * can express it) a DuckDB oracle in [[oracleSql]] with identical output
  * column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data pipeline operators (dedup/similarity/text/multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
    graft.queries.EngineSql.queries ++
    graft.operators.TextAnalysis.queries ++
    graft.operators.C4.queries ++
    graft.operators.Dedup.queries ++
    graft.operators.Similarity.queries ++
    graft.operators.KMeans.queries ++
    graft.operators.Graph.queries ++
    graft.operators.Retrieval.queries ++
    graft.operators.Pca.queries ++
    graft.operators.Multimodal.queries ++
    graft.operators.AsofJoin.queries ++
    graft.operators.RangeJoin.queries ++
    graft.operators.Sketches.queries ++
    graft.operators.Sampling.queries ++
    graft.sources.Skipping.queries ++
    graft.streaming.Streams.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
    graft.queries.EngineSql.oracleSql ++
    graft.operators.TextAnalysis.oracleSql ++
    graft.operators.C4.oracleSql ++
    graft.operators.Dedup.oracleSql ++
    graft.operators.Similarity.oracleSql ++
    graft.operators.KMeans.oracleSql ++
    graft.operators.Graph.oracleSql ++
    graft.operators.Retrieval.oracleSql ++
    graft.operators.Pca.oracleSql ++
    graft.operators.Multimodal.oracleSql ++
    graft.operators.AsofJoin.oracleSql ++
    graft.operators.RangeJoin.oracleSql ++
    graft.operators.Sketches.oracleSql ++
    graft.operators.Sampling.oracleSql ++
    graft.sources.Skipping.oracleSql ++
    graft.streaming.Streams.oracleSql
}
