package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the harness-provided parquet star schema (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet`, so Catalyst pushes filters
  * and prunes columns down to the scan — at 100 TB the scan cost is the
  * dominant term and these two properties are what keep it linear in the
  * columns/rows actually needed, not in table size.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as a
    // raw Long (spark.sql.legacy.parquet.nanosAsLong). Surface it as a
    // microsecond timestamp `ts` plus the exact nanos in `ts_nanos`.
    // `div` (integer division) — a double roundtrip would lose precision
    // at 1e18-nanosecond magnitudes.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumnRenamed("ts", "ts_nanos")
        .withColumn("ts", expr("timestamp_micros(ts_nanos div 1000)"))
    else df
  }

  /** Load every table of the star schema as a scope Map (framequery's
    * name→DataFrame dict, reference src/framequery/executor/_executor.py:37-96). */
  def scope(spark: SparkSession, dir: String): Map[String, DataFrame] =
    all.map(n => n -> load(spark, dir, n)).toMap

  /** Register all tables as temp views for spark.sql use. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
