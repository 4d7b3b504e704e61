package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Write-side helpers: the storage layout decisions that make 100 TB
  * reads cheap.
  *
  * - `writePartitioned`: hive-style directory partitioning — readers
  *   touching a partition-pruned slice (e.g. one day) read only that
  *   directory. Use low-cardinality columns (date, source, label).
  * - `writeBucketed`: pre-shuffled, sorted buckets on a join/agg key —
  *   joins and aggregations on the bucket key skip the shuffle entirely
  *   (bucketed table metadata requires `saveAsTable`).
  * - `writeSortedParquet`: per-partition sort so min/max row-group stats
  *   make range predicates skippable at the footer level.
  */
object Sinks {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def writeSortedParquet(df: DataFrame, path: String, sortCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.sortWithinPartitions(sortCols.head, sortCols.tail: _*)
      .write.mode(mode).parquet(path)
}
