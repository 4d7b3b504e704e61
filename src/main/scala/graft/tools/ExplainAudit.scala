package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: dump formatted plans for selected queries and grep-able
  * plan-quality signals (PushedFilters / ReadSchema / join strategies). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_pricing_summary", "q3_segment_revenue", "q5_nation_revenue",
      "q_filter_project", "fq_join_agg", "fq_like", "dd_minhash_lsh",
      "sim_knn_brute")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"===== $n =====")
      // signal lines only; full plan with AUDIT_FULL=1
      if (sys.env.contains("AUDIT_FULL")) println(plan)
      else plan.linesIterator.foreach { l =>
        val t = l.trim
        if (t.startsWith("PushedFilters") || t.startsWith("ReadSchema") ||
            t.contains("Join") || t.contains("WholeStageCodegen") ||
            t.startsWith("(")) ()
        if (t.startsWith("PushedFilters") || t.startsWith("ReadSchema"))
          println("  " + t.take(160))
        else if (t.matches("\\(\\d+\\) .*"))
          println("  " + t.take(100))
      }
    }
    spark.stop()
  }
}
