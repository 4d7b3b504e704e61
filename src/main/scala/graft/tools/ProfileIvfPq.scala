package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Phase timer for the IVF-PQ lifecycle queries (sim_knn_ivfpq_inc /
  * _idx / st_ivfpq_ingest): times build / append / compact / probe
  * separately under the exact Bench session config, so optimization
  * effort lands on the phase that actually costs (guide §1.1).
  *
  * Usage: `runMain graft.tools.ProfileIvfPq [runs]`
  */
object ProfileIvfPq {
  def main(args: Array[String]): Unit = {
    val runs = if (args.length > 0) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile-ivfpq")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        "org.apache.spark.sql.graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    (1 to runs).foreach { i =>
      System.err.println(s"[profile] ---- run $i ----")
      val e = graft.sources.Tables.load(spark, sfDir, "embeddings")
      val a = e.filter(col("vec_id") % 3 =!= 0)
      val b = e.filter(col("vec_id") % 3 === 0)
      val q = e.filter(col("vec_id") < 5)
      val tmp = java.nio.file.Files.createTempDirectory("graft_prof").toString
      val incDir = s"$tmp/inc"
      val refDir = s"$tmp/ref"
      t("build(a)") { Similarity.buildIvfPqIndex(a, incDir, dim = 64,
        nCells = 16, m = 16, codebookSize = 16) }
      t("append(b)") { Similarity.appendToIvfPqIndex(b, incDir) }
      t("compact") { Similarity.compactIvfPqIndex(spark, incDir) }
      t("build(e,trainOn=a)") { Similarity.buildIvfPqIndex(e, refDir, dim = 64,
        nCells = 16, m = 16, codebookSize = 16, trainOn = Some(a)) }
      val inc = t("probe inc (plan)") { Similarity.knnIvfPqIndexed(spark,
        incDir, q, k = 10, nProbe = 4, refine = 150) }
      val ref = t("probe ref (plan)") { Similarity.knnIvfPqIndexed(spark,
        refDir, q, k = 10, nProbe = 4, refine = 150) }
      t("final agg+excepts") {
        inc.agg(countDistinct(col("q_id")).as("n_queries"),
            count(lit(1)).as("n_results"))
          .crossJoin(inc.exceptAll(ref).agg(count(lit(1)).as("__d1")))
          .crossJoin(ref.exceptAll(inc).agg(count(lit(1)).as("__d2")))
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
