package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run named SparkEntry queries on SPARK_GRAFT_SF_DIR and print
  * the first rows — for eyeballing in-plan gate columns (recall_ok etc.)
  * without the full Verify/DuckDB loop. */
object ShowOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-showone")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      println(s"=== $name ===")
      graft.SparkEntry.queries(name)(spark, sfDir).show(20, truncate = false)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
