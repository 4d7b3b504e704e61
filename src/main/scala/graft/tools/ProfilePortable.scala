package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Dev tool: stage timing of the PORTABLE minhash path at sf0.1. */
object ProfilePortable {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = Tables.load(spark, dir, "documents")
      .filter(col("source").isin("src0", "src1"))
      .select(col("doc_id"), col("text"))
    time("warmup")(base.count())
    val variants = base.select((col("doc_id") + 10000000L).as("doc_id"),
      expr("substring(text, 1, (4 * length(text)) div 5)").as("text"))
    val corpus = base.unionAll(variants)
    val shRows = Dedup.shingleRows(corpus, 3, TextAnalysis.md5Prefix60)
    time("shingle rows (md5 per shingle)")(
      shRows.write.mode("overwrite").format("noop").save())
    val sh = shRows.groupBy(col("doc_id")).agg(collect_set(col("s")).as("sh"))
    val tok = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val withLanes = tok.select(col("doc_id") +:
      (0 until 16).map(i => TextAnalysis.md5Slice60(
        concat_ws("|", lit((i / 2).toString), col("s").cast("string")),
        1 + 15 * (i % 2)).as(s"l$i")): _*)
    time("16 sliced lanes (8 md5)")(
      withLanes.write.mode("overwrite").format("noop").save())
    val withLanes16 = tok.select(col("doc_id") +:
      (0 until 16).map(i => TextAnalysis.md5Prefix60(
        concat_ws("|", lit(i.toString), col("s").cast("string"))).as(s"l$i")): _*)
    time("16 full lanes (16 md5)")(
      withLanes16.write.mode("overwrite").format("noop").save())
    val pairs = Dedup.minhashDupPairsPortable(corpus, threshold = 0.5)
    time("full portable pipeline")(println("pairs=" + pairs.count()))
    spark.stop()
  }
}
