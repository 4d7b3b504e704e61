package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract benchmark: runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Each query materializes through the `noop` sink — a count() would let
  * Catalyst prune the whole projection; noop forces every output column
  * to be computed, which is what a real consumer pays for.
  *
  * Output discipline: the driver captures only the LAST ~2000 characters
  * of stdout, and sbt appends a "[success] Total time…" line after main
  * returns. A single JSON line carrying all ~90 per-query timings is
  * ~2.4 KB and gets its head clipped out of the capture window (this is
  * exactly what produced `parsed: null` in BENCH_r01/r02). So the line
  * printed here is kept under ~1750 chars: `value` is always the total
  * over ALL queries, and `queries` carries as many per-query entries as
  * fit (prioritized by family). The complete per-query map is written to
  * BENCH_full.json in the working directory for offline reading.
  *
  * All reported per-query numbers are MEDIANS over SPARK_GRAFT_BENCH_RUNS
  * executions (default 3) and `value` is the sum of those medians —
  * single-shot timings on this VM swing 2-4x with outside load.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warm-up outside the timed region
    SparkEntry.queries.get("q1_pricing_summary")
      .foreach(fn => fn(spark, sfDir).write.mode("overwrite").format("noop").save())

    // Per-query MEDIAN of `runs` timed executions (default 3): this VM's
    // timings swing 2-4x with outside load (NOTES.md), and single-shot
    // numbers drowned a real regression in r3. The cache is cleared
    // between runs so each one re-executes the full plan.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (0 until runs).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // operators persist() shared subplans; drop them between runs so
        // cached partitions don't accumulate (or mask re-execution cost)
        spark.catalog.clearCache()
        dt
      }
      // true median: average the two middles on even run counts (the
      // lower-middle alone would bias every reported time low)
      val sortedT = times.sorted
      val p50 =
        if (sortedT.size % 2 == 1) sortedT(sortedT.size / 2)
        else (sortedT(sortedT.size / 2 - 1) + sortedT(sortedT.size / 2)) / 2
      System.err.println(f"[bench] $name%-28s $p50%7.2f s  (${times.map(t => f"$t%.2f").mkString("/")})")
      (name, p50, times)
    }

    val total = results.map(_._2).sum
    val sfLabel = {
      val base = new java.io.File(sfDir).getName // e.g. "sf0.1"
      val suffix = base.drop(2)
      // only emit an unquoted token when it is a valid JSON number —
      // "sf_test" must become "_test" (quoted), not bare garbage
      if (base.startsWith("sf") &&
          scala.util.Try(suffix.toDouble).isSuccess) suffix
      else "\"" + base + "\""
    }

    // Full per-query dump (offline artifact, not size-constrained):
    // `queries` carries the medians (p50), `runs` every raw timing.
    val fullQs = results.map { case (k, v, _) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val fullRuns = results.map { case (k, _, ts) =>
      "\"" + k + "\":[" + ts.map(t => f"$t%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val fullJson =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","stat":"p50","n_runs":$runs,"queries":$fullQs,"runs":$fullRuns,"sf":$sfLabel}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_full.json"),
      (fullJson + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] full dump failed: $e") }

    // Compact driver line: per-query entries in family-priority order until
    // the budget is reached. value/total always covers every query.
    val priority = (n: String) => n.split("_", 2)(0) match {
      case "dd"  => 0 // dedup pipeline
      case "sim" => 1 // similarity/ANN
      case "km"  => 1 // k-means clustering (same family tier as ANN)
      case "ta"  => 2 // text analysis
      case "mm"  => 3 // multimodal
      case "st"  => 4 // streaming
      case "aj"  => 5 // as-of join
      case s if s.startsWith("q") => 6 // relational headline queries
      case _ => 7 // fq_* dialect-conformance suite
    }
    val header = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":{"""
    val footer = s"""},"sf":$sfLabel}"""
    val budget = 1750 - header.length - footer.length
    val ordered = results.sortBy { case (n, _, _) => (priority(n), n) }
    val sb = new StringBuilder
    var used = 0
    ordered.foreach { case (k, v, _) =>
      val entry = "\"" + k + f"""\":$v%.2f"""
      val cost = entry.length + (if (used == 0) 0 else 1)
      if (used + cost <= budget) {
        if (used > 0) sb.append(',')
        sb.append(entry)
        used += cost
      }
    }
    // stop() BEFORE the println: any shutdown warning it logs must not land
    // between the JSON line and the end of the captured output window
    spark.stop()
    println(header + sb.toString + footer)
  }
}
