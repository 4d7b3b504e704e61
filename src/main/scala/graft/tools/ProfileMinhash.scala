package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Dev tool: stage-by-stage timing of the MinHash LSH pipeline. */
object ProfileMinhash {
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
    val docs = Tables.load(spark, dir, "documents")
    time("warmup count")(docs.count())
    val sh = docs.select(col("doc_id"), Dedup.shinglesXx(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingles only")(sh.write.mode("overwrite").format("noop").save())
    val sig = Dedup.minhashSignatureAgg(sh, 16)
    time("signatures")(sig.write.mode("overwrite").format("noop").save())
    val pairs = Dedup.minhashDupPairs(docs, 16, 4, 0.3)
    time("full pipeline")(println("pairs=" + pairs.count()))
    spark.stop()
  }
}
