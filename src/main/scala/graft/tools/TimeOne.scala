package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time named SparkEntry queries on SPARK_GRAFT_SF_DIR.
  * `runMain graft.tools.TimeOne q1_pricing_summary dd_cluster` —
  * same session config and noop-sink materialization as graft.Bench. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-timeone")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    graft.SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[timeone] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
