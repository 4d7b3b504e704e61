package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, KMeans, TextAnalysis}
import graft.sources.Tables

/** Empirical scale-exponent probe: replicates the sf0.1 `documents`
  * corpus 1×/2×/4×/8× (doc_id offset + per-replica text tag, so
  * near-dup structure stays per-replica realistic instead of every
  * document gaining 7 exact copies), times the heavyweight corpus
  * operators at each factor, and fits the log-log slope.
  *
  * The point: "would this plan survive a 100× scale-up" is an empirical
  * question, not a vibe. An operator whose fitted exponent is ≈ 1.0
  * scales linearly in corpus size on fixed parallelism — the shape that
  * survives 1000 executors × 100 TB; an exponent ≳ 1.5 means some pair
  * or rescan cost is compounding and the operator needs a design fix
  * before scale-up (this is exactly how the r5 ta_chunks quadratic
  * would have been caught by measurement: its exponent was ≈ 2 in
  * document length).
  *
  * Usage: `runMain graft.tools.ScaleProbe [runsPerPoint]` with
  * SPARK_GRAFT_SF_DIR (default sf0.1). Reports the MIN over runs at
  * each point (least noise-sensitive for slope fitting on a shared VM)
  * and prints one JSON line per operator plus a summary line.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val runs = if (args.nonEmpty) args(0).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factors = Seq(1, 2, 4, 8)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scaleprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    def corpus(f: Int): DataFrame =
      (0 until f).map { i =>
        base.select((col("doc_id") + i.toLong * 100000000L).as("doc_id"),
          col("source"), concat(lit(s"r$i "), col("text")).as("text"))
      }.reduce(_ unionAll _)

    // embeddings replica for the vector-side ops (identical vectors per
    // replica is fine: assignment cost is linear in rows regardless)
    val embBase = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    def embCorpus(f: Int): DataFrame =
      (0 until f).map { i =>
        embBase.select((col("vec_id") + i.toLong * 100000000L).as("vec_id"),
          col("embedding"), col("label"))
      }.reduce(_ unionAll _)

    val ops: Seq[(String, Int => DataFrame)] = Seq(
      "exact_dedup" -> (f => Dedup.exact(corpus(f))),
      "minhash_portable_pairs" ->
        (f => Dedup.minhashDupPairsPortable(corpus(f), threshold = 0.5)),
      "chunk_docs_64" -> (f =>
        TextAnalysis.chunkDocs(corpus(f), "text", 64, keep = Seq("doc_id"))
          .groupBy().agg(count(lit(1)).as("n_chunks"),
            sum(col("n_toks")).as("toks"))),
      "gopher_ngrams" -> (f =>
        TextAnalysis.gopherNgramStats(corpus(f))
          .groupBy(col("n"))
          .agg(sum(col("num_chars")).as("rep"), sum(col("pass")).as("p"))),
      "winnow_fingerprints" -> (f =>
        TextAnalysis.winnowFingerprints(corpus(f))
          .groupBy().agg(count(lit(1)).as("n"))),
      "tfidf_topk" -> (f => TextAnalysis.tfidfTopK(corpus(f))),
      // k-means: the timed region includes the 2 in-loop re-center
      // actions (fit collects the k×dim model per iteration), which is
      // the honest cost of the operator
      "kmeans_8x3" -> (f => KMeans.fit(embCorpus(f), k = 8, iters = 3)))

    // JIT/codegen warm-up outside the measured region
    ops.foreach { case (_, op) =>
      op(1).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
    }

    val results = ops.map { case (name, op) =>
      val times = factors.map { f =>
        val ts = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          op(f).write.mode("overwrite").format("noop").save()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          dt
        }
        val best = ts.min
        System.err.println(f"[scaleprobe] $name%-24s ${f}x: $best%7.2f s" +
          f"  (${ts.map(t => f"$t%.2f").mkString("/")})")
        best
      }
      // least-squares slope of ln(t) on ln(f): the scale exponent
      val xs = factors.map(f => math.log(f.toDouble))
      val ys = times.map(math.log)
      val xm = xs.sum / xs.size
      val ym = ys.sum / ys.size
      val slope = xs.zip(ys).map { case (x, y) => (x - xm) * (y - ym) }.sum /
        xs.map(x => (x - xm) * (x - xm)).sum
      println(f"""{"op":"$name","exponent":$slope%.2f,"times":[${
        times.map(t => f"$t%.3f").mkString(",")}],"factors":[${
        factors.mkString(",")}]}""")
      (name, slope)
    }
    val worst = results.maxBy(_._2)
    println(f"""{"metric":"scale_exponent_worst","op":"${worst._1}","value":${worst._2}%.2f}""")
    spark.stop()
  }
}
