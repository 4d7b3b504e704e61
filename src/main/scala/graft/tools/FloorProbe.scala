package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixed-cost floor diagnosis for trivial queries (VERDICT r11 #6:
  * dd_exact runs 0.42 s isolated vs a 0.12 s DuckDB baseline at sf0.1
  * on a minimal plan). Times the components separately so the floor
  * can be attributed: bare job scheduling, parquet listing+footer,
  * scan+count, the two-exchange dedup aggregate, and the same with
  * AQE off — each as median-of-5 warm runs in one session. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-floorprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time(name: String, n: Int = 5)(body: => Unit): Unit = {
      body // warm-up
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-34s ${med(ts)}%6.3f s  (${ts.map(t => f"$t%.3f").mkString("/")})")
    }

    time("bare-job (range(1).count)") { spark.range(1).count() }
    time("bare-shuffle (range groupBy)") {
      spark.range(1000).groupBy(col("id") % 7).count()
        .write.mode("overwrite").format("noop").save()
    }
    time("listing+footer (read.schema)") {
      spark.read.parquet(s"$sfDir/documents.parquet").schema
    }
    time("scan+count") {
      spark.read.parquet(s"$sfDir/documents.parquet").count()
    }
    def exactAgg(): Unit =
      graft.SparkEntry.queries("dd_exact")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    time("dd_exact (AQE on)")(exactAgg())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("dd_exact (AQE off)")(exactAgg())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    time("dd_exact (AQE on, 4 parts)")(exactAgg())
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    // plan-construction cost alone: analyze+optimize without an action
    time("plan-only (no action)") {
      graft.SparkEntry.queries("dd_exact")(spark, sfDir)
        .queryExecution.executedPlan
    }
    // AQE parallelism-first: the default keeps ≥ defaultParallelism
    // post-shuffle partitions even for KB-sized shuffles, so trivial
    // aggregates pay 32 reduce tasks of pure scheduling. Probe the
    // recommended production setting (false → coalesce to the advisory
    // size) across the floor query AND shuffle-heavy shapes that might
    // lose parallelism.
    val probes = Seq("dd_exact", "dd_ngram_jaccard", "dd_minhash_lsh",
      "q1_pricing_summary", "gr_triangles", "ta_tfidf")
    for (pf <- Seq("true", "false")) {
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", pf)
      for (q <- probes)
        time(s"$q pf=$pf", 3) {
          graft.SparkEntry.queries(q)(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
          spark.catalog.clearCache()
        }
    }
    spark.stop()
  }
}
