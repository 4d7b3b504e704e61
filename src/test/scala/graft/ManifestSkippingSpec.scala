package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Skipping
import graft.sources.Skipping.scannedFiles

/** Automatic manifest pruning injected via GraftExtensions
  * (ManifestSkippingRule + SkippingFileIndex): plain reads over
  * manifest-carrying parquet get file skipping with NO API call, every
  * surface included (DataFrame, dialect SQL); untranslatable or
  * stale shapes degrade to full reads, never wrong results. The
  * TestSpark session carries the production `spark.sql.extensions`
  * wiring, so this exercises exactly what a deployed session runs. */
class ManifestSkippingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  /** clustered table: a 0..49 range-sorted over 10 files, b derived. */
  private def writeClustered(n: Int): (String, DataFrame) = {
    val df = spark.range(n.toLong).select(
      col("id"), (col("id") % 50).as("a"),
      (col("id") % 7).cast("double").as("b"))
    val dir = tmp("autoskip")
    df.repartitionByRange(10, col("a")).sortWithinPartitions("a")
      .write.parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("a", "b"))
    (dir, df)
  }

  private def sets(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  /** Row equality with double tolerance: metadata sums fold per-FILE
    * partials where a scan folds per-PARTITION partials — same
    * accumulation class, but float addition is order-sensitive in the
    * last ulps. NaN compares equal to NaN (SQL aggregate semantics). */
  private def close(a: Any, b: Any): Boolean = (a, b) match {
    case (x: java.lang.Double, y: java.lang.Double) =>
      (x.isNaN && y.isNaN) || x == y ||
        math.abs(x - y) <= 1e-9 * math.max(math.abs(x), math.abs(y))
    case _ => a == b
  }
  private def rowsClose(a: org.apache.spark.sql.Row,
      b: org.apache.spark.sql.Row): Boolean =
    a.length == b.length &&
      (0 until a.length).forall(i => close(a.get(i), b.get(i)))

  test("plain read + filter prunes files automatically, results exact") {
    val (dir, src) = writeClustered(1000)
    val q = spark.read.parquet(dir).filter(col("a").between(10, 14))
    assert(sets(q) == sets(src.filter(col("a").between(10, 14))))
    val nf = scannedFiles(spark.read.parquet(dir)
      .filter(col("a").between(10, 14)))
    assert(nf * 2 <= 10, s"scanned $nf of 10")
    // IN-list (and its InSet optimizer form, >10 values) prunes too
    val vals = (10L to 21L)
    val nfIn = scannedFiles(spark.read.parquet(dir)
      .filter(col("a").isin(vals: _*)))
    assert(nfIn < 10, s"IN scanned $nfIn of 10")
    assert(spark.read.parquet(dir).filter(col("a").isin(vals: _*)).count()
      == src.filter(col("a").isin(vals: _*)).count())
  }

  test("untranslatable predicates scan everything — and stay correct") {
    val (dir, src) = writeClustered(500)
    val q = spark.read.parquet(dir).filter((col("a") * 2) === 20)
    assert(sets(q) == sets(src.filter((col("a") * 2) === 20)))
    assert(scannedFiles(spark.read.parquet(dir)
      .filter((col("a") * 2) === 20)) == 10)
    // OR with a branch every file might hold (b spans its full range
    // in every file) — translated, but proves nothing: full scan
    val orq = spark.read.parquet(dir)
      .filter(col("a") === 1 || col("b") === 3.0)
    assert(sets(orq) == sets(src.filter(col("a") === 1 || col("b") === 3.0)))
    assert(scannedFiles(spark.read.parquet(dir)
      .filter(col("a") === 1 || col("b") === 3.0)) == 10)
  }

  test("OR predicates prune: a file drops only when EVERY branch is disproved") {
    val (dir, src) = writeClustered(1000)
    // two narrow ranges on the clustered column: only the files
    // holding either range survive
    val cond = col("a").between(5, 6) || col("a").between(40, 41)
    assert(sets(spark.read.parquet(dir).filter(cond)) ==
      sets(src.filter(cond)))
    val nf = scannedFiles(spark.read.parquet(dir).filter(cond))
    assert(nf < 10 && nf >= 1, s"OR scanned $nf of 10")
    // a branch that does NOT translate poisons the whole OR (it could
    // hold anywhere): full scan, still correct
    val bad = col("a").between(5, 6) || (col("a") * 2) === 80
    assert(sets(spark.read.parquet(dir).filter(bad)) ==
      sets(src.filter(bad)))
    assert(scannedFiles(spark.read.parquet(dir).filter(bad)) == 10)
    // mixed-column disjuncts with conjunctive branches: (a range AND
    // b point) OR (a point) — branch conjunctions relax soundly
    val mixed = (col("a").between(5, 6) && col("b") === 1.0) ||
      col("a") === 45
    assert(sets(spark.read.parquet(dir).filter(mixed)) ==
      sets(src.filter(mixed)))
    assert(scannedFiles(spark.read.parquet(dir).filter(mixed)) < 10)
  }

  test("files appended after the manifest are still read (stale-safe)") {
    val (dir, _) = writeClustered(500)
    spark.range(100).select(col("id") + 10000, lit(999L).as("a"),
      lit(0.0).as("b")).toDF("id", "a", "b")
      .coalesce(1).write.mode("append").parquet(dir)
    // pred matches ONLY the appended (manifest-unknown) file
    val q = spark.read.parquet(dir).filter(col("a") === 999)
    assert(q.count() == 100)
    // known files still prune around the unknown one
    val nf = scannedFiles(spark.read.parquet(dir).filter(col("a") === 999))
    assert(nf < 11, s"scanned $nf")
  }

  test("tables without a manifest are not wrapped") {
    val dir = tmp("nowrap")
    spark.range(100).select(col("id"), (col("id") % 10).as("a"))
      .repartition(4).write.parquet(dir)
    val q = spark.read.parquet(dir).filter(col("a") === 3)
    assert(q.count() == 10)
    val wrapped = q.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.isInstanceOf[org.apache.spark.sql.graft.SkippingFileIndex]
          case _ => false
        }
    }
    assert(wrapped == Seq(false))
  }

  test("dialect SQL through the engine prunes via the same rule") {
    val exec = new graft.exec.Executor(spark,
      Map("src" -> spark.range(2000).select(
        col("id"), (col("id") % 100).as("a"),
        (col("id") % 13).cast("double").as("b"))))
    val base = java.nio.file.Files.createTempDirectory("autoskip_sql").toString
    exec.setBasepath(base)
    exec.execute("CREATE TABLE t WITH (persist 'parquet') AS select * from src")
    exec.execute("OPTIMIZE t ZORDER BY (a, b) WITH (files '16')")
    val q = exec.query("select count(1) as n from t where a between 10 and 19")
    assert(q.head().getLong(0) == 200L)
    val nf = scannedFiles(
      exec.query("select count(1) as n from t where a between 10 and 19"))
    assert(nf * 2 <= 16, s"dialect scanned $nf of 16")
  }

  test("automatic path bloom-prunes InSet (>10 IN values) point lookups") {
    val dir = tmp("autoskip_bloom")
    val df = spark.range(3000).select(col("id"), (col("id") % 7).as("b"))
    df.repartition(12).write.parquet(dir) // unclustered: intervals useless
    Skipping.writeManifest(spark, dir, Seq("id"), bloomCols = Seq("id"))
    // >10 literals forces Catalyst's InSet form; all present values
    val vals = (100L to 111L)
    val q = spark.read.parquet(dir).filter(col("id").isin(vals: _*))
    assert(q.count() == 12)
    val nf = scannedFiles(spark.read.parquet(dir)
      .filter(col("id").isin(vals: _*)))
    assert(nf < 12, s"InSet bloom scanned $nf of 12")
  }

  test("a manifest written after a negative probe prunes immediately") {
    // the existence probe is TTL-cached (the optimizer re-runs the rule
    // per fixed-point iteration); a manifest write in this JVM must
    // clear the cache, not wait out the TTL
    val dir = tmp("probe_inv")
    val df = spark.range(500).select(
      col("id"), (col("id") % 50).as("a"))
    df.repartitionByRange(10, col("a")).sortWithinPartitions("a")
      .write.parquet(dir)
    // populates the negative probe cache entry for this root
    assert(scannedFiles(spark.read.parquet(dir)
      .filter(col("a").between(10, 14))) == 10)
    Skipping.writeManifest(spark, dir, Seq("a"))
    val nf = scannedFiles(spark.read.parquet(dir)
      .filter(col("a").between(10, 14)))
    assert(nf * 2 <= 10, s"scanned $nf of 10 right after manifest write")
  }

  test("null-literal and null-safe comparisons translate soundly") {
    val dir = tmp("autoskip_null")
    val df = spark.range(300).select(col("id"),
      when(col("id") % 3 === 0, lit(null)).otherwise(col("id") % 20).as("a"))
    df.repartitionByRange(6, col("a")).write.parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("a"))
    val full = spark.read.parquet(dir)
    assert(full.filter(col("a") <=> lit(null)).count() == 100)
    assert(full.filter(col("a").isNull).count() == 100)
    assert(full.filter(col("a") <=> 5L).count()
      == df.filter(col("a") <=> 5L).count())
    // a = NULL matches nothing; pruning must not break the empty result
    assert(full.filter(col("a") === lit(null).cast("long")).count() == 0)
  }

  test("metadata-only global aggregates answer from the manifest, zero files opened") {
    val dir = tmp("meta_agg")
    val df = spark.range(1000).select(col("id"),
      when(col("id") % 5 === 0, lit(null)).otherwise(col("id") % 50).as("a"),
      concat(lit("s"), lpad(col("id").cast("string"), 4, "0")).as("s"))
    df.repartition(8).write.parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("a", "s"))
    def q = spark.read.parquet(dir)
      .agg(count(lit(1)).as("n"), count(col("a")).as("na"),
        min(col("a")).as("mn"), max(col("a")).as("mx"),
        min(col("s")).as("smn"), max(col("s")).as("smx"))
    // values equal the real compute (from the in-memory frame, which
    // the rule cannot touch) — null-skipping count included
    val expect = df.agg(count(lit(1)), count(col("a")), min(col("a")),
      max(col("a")), min(col("s")), max(col("s"))).head()
    assert(q.head() == expect)
    assert(scannedFiles(q) == 0, "metadata aggregate opened data files")
    // a filter declines the rewrite (scan runs, possibly pruned)
    val qf = spark.read.parquet(dir).filter(col("a") > 5)
      .agg(count(lit(1)).as("n"))
    assert(scannedFiles(qf) > 0)
    assert(qf.head().getLong(0) == df.filter(col("a") > 5).count())
    // an unindexed column declines the WHOLE rewrite
    val qu = spark.read.parquet(dir).agg(min(col("id")).as("m"))
    assert(scannedFiles(qu) == 8)
    assert(qu.head().getLong(0) == 0L)
    // DISTINCT aggregates decline
    val qd = spark.read.parquet(dir)
      .agg(countDistinct(col("a")).as("d"))
    assert(qd.head().getLong(0) == df.select("a").na.drop()
      .distinct().count())
    // a file appended WITHOUT a manifest refresh disables the rewrite
    // (identity gate: unknown file) — and the answer includes its rows
    spark.range(5000, 5025).select(col("id"), lit(7L).as("a"),
        lit("zz").as("s"))
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(dir)
    val q2 = spark.read.parquet(dir).agg(count(lit(1)).as("n"))
    assert(q2.head().getLong(0) == 1025L)
    assert(scannedFiles(spark.read.parquet(dir)
      .agg(count(lit(1)).as("n"))) > 0, "stale manifest must not answer")
    // ...and after a refresh the metadata path resumes
    Skipping.refreshManifest(spark, dir, Seq("a", "s"))
    val q4 = spark.read.parquet(dir).agg(count(lit(1)).as("n"))
    assert(q4.head().getLong(0) == 1025L)
    assert(scannedFiles(spark.read.parquet(dir)
      .agg(count(lit(1)).as("n"))) == 0)
    // the DIALECT surface rides the same session rule: an engine-side
    // global count over an attached manifest table answers metadata-only
    val exec = new graft.exec.Executor(spark, Map.empty)
    exec.setBasepath(new java.io.File(dir).getParent)
    exec.execute(s"COPY mt FROM '${new java.io.File(dir).getName}' " +
      "WITH format 'parquet'")
    val dq = exec.query("select count(1) as n, max(a) as mx from mt")
    assert(dq.head() == org.apache.spark.sql.Row(1025L, 49L))
    assert(scannedFiles(
      exec.query("select count(1) as n, max(a) as mx from mt")) == 0,
      "dialect global aggregate did not take the metadata path")
    // sum/avg through the dialect ride the same rule (r15)
    val ds = exec.query("select sum(a) as s, avg(a) as av from mt")
    val realSum = spark.read.option("graft.noskip", "true").parquet(dir)
      .agg(sum(col("a")).as("s"), avg(col("a")).as("av")).head()
    assert(ds.head() == realSum)
    assert(scannedFiles(
      exec.query("select sum(a) as s, avg(a) as av from mt")) == 0,
      "dialect sum/avg did not take the metadata path")
  }

  test("randomized differential: metadata aggregates == opted-out real scans") {
    // the metadata rewrite SUBSTITUTES ANSWERS, so it gets the same
    // treatment as the pruning layer: seeded trials over varied types —
    // nulls, NaN, negative longs, strings, dates, timestamps, decimals,
    // zero-row files — comparing against the graft.noskip scan
    val rnd = new scala.util.Random(20260815)
    for (trial <- 1 to 6) {
      val n = 200 + rnd.nextInt(400)
      val dir = tmp(s"meta_diff$trial")
      val seed = rnd.nextInt(1000)
      val nullEvery = 2 + rnd.nextInt(6)
      val df = spark.range(n.toLong).select(
        col("id"),
        when(col("id") % nullEvery === 0, lit(null))
          .otherwise((xxhash64(col("id") + seed) % 100000L) -
            lit(50000L)).as("l"),
        when(col("id") % 17 === 0, lit(Double.NaN))
          .otherwise((xxhash64(col("id") * 3 + seed) % 1000L)
            .cast("double") / 7.0).as("d"),
        when(col("id") % 13 === 0, lit(null))
          .otherwise(concat(lit("k"),
            (xxhash64(col("id") + seed) % 1000L).cast("string"))).as("s"),
        date_add(lit(java.sql.Date.valueOf("2020-01-01")),
          (col("id") % 500).cast("int")).as("dt"),
        timestamp_seconds(lit(1600000000L) + col("id") * 37L).as("ts"),
        ((xxhash64(col("id") - seed) % 100000L).cast("long")
          .cast("decimal(12,3)") / 1000L).cast("decimal(12,3)").as("dec"),
        // NaN-free double: the d column's NaN rows poison its sum/avg
        // to NaN on both sides, which tests NaN propagation but not the
        // summation itself
        ((xxhash64(col("id") * 7 + seed) % 10000L).cast("double") / 100.0)
          .as("f"),
        (col("id") % 120).cast("int").as("i"),
        (col("id") % 7).cast("float").as("fl"))
      df.repartition(1 + rnd.nextInt(5)).write.parquet(dir)
      if (trial % 2 == 0) // an empty epoch's schema-only file
        df.limit(0).coalesce(1)
          .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(dir)
      val cols = Seq("id", "l", "d", "s", "dt", "ts", "dec", "f", "i", "fl")
      Skipping.writeManifest(spark, dir, cols)
      // every numeric type rides a sum; avg over the non-decimal ones
      // (decimal averages decline by design — scale/rounding parity)
      val sumCols = Seq("id", "l", "d", "dec", "f", "i", "fl")
      val avgCols = Seq("id", "l", "d", "f", "i", "fl")
      val aggs = count(lit(1)).as("n") +: (cols.flatMap(c =>
        Seq(count(col(c)).as(s"n_$c"), min(col(c)).as(s"mn_$c"),
          max(col(c)).as(s"mx_$c"))) ++
        sumCols.map(c => sum(col(c)).as(s"sm_$c")) ++
        avgCols.map(c => avg(col(c)).as(s"av_$c")))
      val meta = spark.read.parquet(dir).agg(aggs.head, aggs.tail: _*)
      val real = spark.read.option("graft.noskip", "true").parquet(dir)
        .agg(aggs.head, aggs.tail: _*)
      assert(scannedFiles(spark.read.parquet(dir)
        .agg(aggs.head, aggs.tail: _*)) == 0,
        s"trial $trial did not take the metadata path")
      assert(rowsClose(meta.head(), real.head()), s"trial $trial diverged:" +
        s"\n  meta ${meta.head()}\n  real ${real.head()}")
      // FILTERED leg: random inclusive ranges / equalities / null tests —
      // some provably decidable per file, most partial (decline to a
      // scan); either path must equal the opted-out real scan
      for (sub <- 1 to 4) {
        val pred = rnd.nextInt(4) match {
          case 0 =>
            val lo = rnd.nextInt(n).toLong
            col("id") >= lo && col("id") <= lo + rnd.nextInt(n).toLong
          case 1 => col("l") >= lit(-25000L)
          case 2 => col("s").isNotNull
          case 3 => col("l").isNull
        }
        val fAggs = Seq(count(lit(1)).as("n"), count(col("l")).as("nl"),
          min(col("id")).as("mn"), max(col("dec")).as("mxd"),
          sum(col("l")).as("sl"), sum(col("dec")).as("sdec"),
          avg(col("f")).as("af"))
        val fMeta = spark.read.parquet(dir).filter(pred)
          .agg(fAggs.head, fAggs.tail: _*).head()
        val fReal = spark.read.option("graft.noskip", "true").parquet(dir)
          .filter(pred).agg(fAggs.head, fAggs.tail: _*).head()
        assert(rowsClose(fMeta, fReal),
          s"trial $trial/$sub filtered diverged:\n  meta $fMeta\n  real $fReal")
      }
    }
  }

  test("filtered metadata aggregates: all-in/all-out proofs, partials decline") {
    val dir = tmp("meta_filt")
    val df = spark.range(900).select(col("id"),
      (col("id") % 3).cast("int").as("pt"),
      when(col("id") % 7 === 0, lit(null)).otherwise(col("id") % 100).as("v"))
    df.write.partitionBy("pt").parquet(dir) // pt constant per file
    Skipping.writeManifest(spark, dir, Seq("pt", "v", "id"))
    // fully decidable filter (per-file constant column): zero files
    // opened, values equal the opted-out real scan
    def aggs = Seq(count(lit(1)).as("n"), count(col("v")).as("nv"),
      min(col("id")).as("mn"), max(col("id")).as("mx"))
    def q = spark.read.parquet(dir).filter(col("pt") === 1)
      .agg(aggs.head, aggs.tail: _*)
    val real = spark.read.option("graft.noskip", "true").parquet(dir)
      .filter(col("pt") === 1).agg(aggs.head, aggs.tail: _*)
    assert(q.head() == real.head())
    assert(scannedFiles(q) == 0, "decidable filter did not go metadata-only")
    // provably-empty result: every file all-out — count 0, min null
    def q0 = spark.read.parquet(dir).filter(col("pt") === 99)
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"))
    assert(q0.head() == org.apache.spark.sql.Row(0L, null))
    assert(scannedFiles(q0) == 0)
    // a PARTIAL file (range crossing one block's id span) declines the
    // rewrite — the scan runs and stays exact
    def qp = spark.read.parquet(dir).filter(col("id") <= 123)
      .agg(count(lit(1)).as("n"))
    assert(qp.head().getLong(0) == 124L)
    assert(scannedFiles(qp) > 0, "partial file must decline the rewrite")
    // STRICT bounds never translate exactly — declines even when the
    // row sets would coincide with the inclusive form
    def qs = spark.read.parquet(dir).filter(col("pt") < 1)
      .agg(count(lit(1)).as("n"))
    assert(qs.head().getLong(0) == 300L)
    assert(scannedFiles(qs) > 0, "strict bound must decline the rewrite")
  }

  test("metadata rewrite declines on foreign files and schema-type mismatch") {
    val dir = tmp("meta_decline")
    val df = spark.range(300).select(col("id"),
      (col("id") % 10).cast("int").as("a"))
    df.repartition(4).write.parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("a"))
    assert(scannedFiles(spark.read.parquet(dir)
      .agg(count(lit(1)).as("n"))) == 0)
    // a VISIBLE parquet data file without the .parquet suffix: Spark's
    // scan reads it, the manifest can never cover it — the completeness
    // proof must fail and the (duplicating) scan answer must stand
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(dir, "datafile0"))
    val q = spark.read.parquet(dir).agg(count(lit(1)).as("n"))
    val real = spark.read.option("graft.noskip", "true").parquet(dir)
      .agg(count(lit(1)).as("n"))
    assert(q.head() == real.head(), "foreign file broke scan equality")
    assert(q.head().getLong(0) > 300L, "the foreign file holds real rows")
    assert(scannedFiles(spark.read.parquet(dir)
      .agg(count(lit(1)).as("n"))) > 0,
      "unsuffixed data file must decline the metadata rewrite")
    // type gate at the stats API: a requested type differing from the
    // stat's stored type answers None (read-schema upcast shape) —
    // decline, never a converter crash
    val dir2 = tmp("meta_types")
    df.repartition(2).write.parquet(dir2)
    Skipping.writeManifest(spark, dir2, Seq("a"))
    import org.apache.spark.sql.types.{IntegerType, LongType}
    assert(Skipping.metadataAggStats(spark, dir2, Seq("a"),
      expectedTypes = Map("a" -> IntegerType)).isDefined)
    assert(Skipping.metadataAggStats(spark, dir2, Seq("a"),
      expectedTypes = Map("a" -> LongType)).isEmpty,
      "stat/attribute type mismatch must decline")
  }

  test("metadata GROUP BY over file-constant keys: per-group fold, zero files") {
    val dir = tmp("meta_group")
    def mk(k: Option[Long], n: Int, off: Int): DataFrame =
      spark.range(off.toLong, (off + n).toLong).select(
        k.map(v => lit(v)).getOrElse(lit(null)).cast("long").as("k"),
        col("id").as("v"))
    // one file per append, each CONSTANT in k — incl. a second file of
    // group 1 (groups span files) and an ALL-NULL file (the SQL null
    // group)
    mk(Some(1L), 100, 0).coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(dir)
    mk(Some(1L), 50, 100).coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(dir)
    mk(Some(2L), 80, 200).coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(dir)
    mk(None, 30, 300).coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("k", "v"))
    def aggs = Seq(count(lit(1)).as("n"), count(col("k")).as("nk"),
      sum(col("v")).as("sv"), min(col("v")).as("mn"),
      max(col("v")).as("mx"), avg(col("v")).as("av"))
    def q = spark.read.parquet(dir).groupBy(col("k"))
      .agg(aggs.head, aggs.tail: _*)
    val real = spark.read.option("graft.noskip", "true").parquet(dir)
      .groupBy(col("k")).agg(aggs.head, aggs.tail: _*)
    assert(sets(q) == sets(real))
    assert(q.count() == 3) // groups 1, 2, null
    assert(scannedFiles(q) == 0, "grouped metadata rewrite did not fire")
    // filtered grouped: IS NOT NULL is all-in/all-out per file here —
    // the null group drops, still zero files opened
    def qf = spark.read.parquet(dir).filter(col("k").isNotNull)
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    val realF = spark.read.option("graft.noskip", "true").parquet(dir)
      .filter(col("k").isNotNull).groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
    assert(sets(qf) == sets(realF))
    assert(scannedFiles(qf) == 0)
    // a NON-CONSTANT grouping key declines (scan runs, stays exact) —
    // and the decline is memoized, so it must also answer consistently
    // on a second run
    for (_ <- 1 to 2) {
      def qd = spark.read.parquet(dir).groupBy(col("v"))
        .agg(count(lit(1)).as("n"))
      assert(qd.count() == 260)
      assert(scannedFiles(qd) > 0,
        "multi-valued grouping key must decline the rewrite")
    }
    // a PARTIAL file under the filter declines the grouped rewrite too
    def qp = spark.read.parquet(dir).filter(col("v") <= 120)
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    assert(sets(qp) == sets(spark.read.option("graft.noskip", "true")
      .parquet(dir).filter(col("v") <= 120).groupBy(col("k"))
      .agg(count(lit(1)).as("n"))))
    assert(scannedFiles(qp) > 0)
    // SQL surface: GROUP BY without the key in the output also folds
    spark.read.parquet(dir).createOrReplaceTempView("meta_group_t")
    def qs = spark.sql(
      "SELECT count(1) AS n FROM meta_group_t GROUP BY k")
    assert(qs.collect().map(_.getLong(0)).sorted.toSeq == Seq(30L, 80L, 150L))
    assert(scannedFiles(qs) == 0)
    // SELECT DISTINCT over a file-constant key IS a grouped aggregate —
    // the key listing answers from metadata too
    def qdk = spark.read.parquet(dir).select("k").distinct()
    assert(qdk.collect().map(r =>
      if (r.isNullAt(0)) -1L else r.getLong(0)).sorted.toSeq
      == Seq(-1L, 1L, 2L))
    assert(scannedFiles(qdk) == 0, "DISTINCT key did not fold from metadata")
  }

  test("metadata count(DISTINCT) over file-constant keys, zero files") {
    val dir = tmp("meta_distinct")
    // two file-constant columns (k, t) spread over 6 one-file appends:
    // k in {1,1,2,2,null}, t in {a,b} — plus a second file repeating
    // (k=1, t=a) so distinct-counting must dedup across files
    def mk(k: Option[Long], t: String, n: Int, off: Int): DataFrame =
      spark.range(off.toLong, (off + n).toLong).select(
        k.map(v => lit(v)).getOrElse(lit(null)).cast("long").as("k"),
        lit(t).as("t"), col("id").as("v"))
    Seq((Some(1L), "a", 40, 0), (Some(1L), "a", 20, 40),
        (Some(1L), "b", 30, 100), (Some(2L), "a", 25, 200),
        (Some(2L), "b", 15, 300), (None, "a", 10, 400))
      .foreach { case (k, t, n, off) =>
        mk(k, t, n, off).coalesce(1)
          .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(dir)
      }
    Skipping.writeManifest(spark, dir, Seq("k", "t", "v"))
    val full = spark.read.option("graft.noskip", "true").parquet(dir)
    // GLOBAL count(DISTINCT k): null doesn't count; composes with the
    // other metadata aggregates in one rewrite
    def qg = spark.read.parquet(dir).agg(
      countDistinct(col("k")).as("dk"), count(lit(1)).as("n"),
      max(col("v")).as("mx"))
    assert(sets(qg) == sets(full.agg(countDistinct(col("k")).as("dk"),
      count(lit(1)).as("n"), max(col("v")).as("mx"))))
    assert(qg.head().getLong(0) == 2L)
    assert(scannedFiles(qg) == 0, "global count(DISTINCT) did not fold")
    // GROUPED: distinct t per k (the dashboard shape), with the SQL
    // null group carrying its own count
    def qk = spark.read.parquet(dir).groupBy(col("k"))
      .agg(countDistinct(col("t")).as("dt"), count(lit(1)).as("n"))
    assert(sets(qk) == sets(full.groupBy(col("k"))
      .agg(countDistinct(col("t")).as("dt"), count(lit(1)).as("n"))))
    assert(scannedFiles(qk) == 0, "grouped count(DISTINCT) did not fold")
    // MULTI-ARG count(DISTINCT k, t): tuples with ANY null arg don't
    // count — 4 non-null (k, t) pairs
    def qm = spark.read.parquet(dir)
      .agg(countDistinct(col("k"), col("t")).as("dkt"))
    assert(qm.head().getLong(0) == 4L)
    assert(sets(qm) == sets(
      full.agg(countDistinct(col("k"), col("t")).as("dkt"))))
    assert(scannedFiles(qm) == 0)
    // filtered: the pred is all-in/all-out per file here
    def qf = spark.read.parquet(dir).filter(col("t") === "a")
      .agg(countDistinct(col("k")).as("dk"))
    assert(sets(qf) == sets(full.filter(col("t") === "a")
      .agg(countDistinct(col("k")).as("dk"))))
    assert(scannedFiles(qf) == 0)
    // count(DISTINCT v) over a NON-constant column declines (scan runs,
    // exact) — twice, so the memoized decline answers consistently
    for (_ <- 1 to 2) {
      def qd = spark.read.parquet(dir)
        .agg(countDistinct(col("v")).as("dv"))
      assert(qd.head().getLong(0) == 140L)
      assert(scannedFiles(qd) > 0,
        "multi-valued distinct column must decline")
    }
    // SQL surface
    spark.read.parquet(dir).createOrReplaceTempView("meta_distinct_t")
    def qs = spark.sql(
      "SELECT k, count(DISTINCT t) AS dt FROM meta_distinct_t GROUP BY k")
    assert(sets(qs) == sets(full.groupBy(col("k"))
      .agg(countDistinct(col("t")).as("dt"))))
    assert(scannedFiles(qs) == 0)
  }

  test("ndv chain count(DISTINCT): exact over clustered files, survives delta+fold, overlap declines") {
    // clustered layout: per-file a-ranges are disjoint (range
    // partitioner: one value -> one partition), so per-file exact
    // distinct counts ADD along the chain — global count(DISTINCT a)
    // answers with zero files opened
    val df = spark.range(1000L).select(
      col("id"), (col("id") % 50).as("a"),
      (col("id") % 7).cast("double").as("b"))
    val dir = tmp("ndv_chain")
    df.repartitionByRange(10, col("a")).sortWithinPartitions("a")
      .write.parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("a"), ndvCols = Seq("a"))
    def q = spark.read.parquet(dir)
      .agg(countDistinct(col("a")).as("nd"), count(lit(1)).as("n"))
    assert(q.head().getLong(0) == 50L && q.head().getLong(1) == 1000L)
    assert(scannedFiles(q) == 0, "chain count(DISTINCT) must be scan-free")
    // composes with an exactly-translatable filter (value exact; the
    // scan count depends on whether the sampled range boundaries made
    // every file provably all-in/all-out, so only exactness is pinned)
    def qf = spark.read.parquet(dir).filter(col("a") <= 24L)
      .agg(countDistinct(col("a")).as("nd"))
    assert(qf.head().getLong(0) == 25L)
    // delta append: refreshManifest restats ONLY the new files and the
    // appended segment keeps carrying `__ndv` (schema-derived)
    df.filter(col("id") < 120).select((col("id") + 1000).as("id"),
        (col("a") + 50).as("a"), col("b"))
      .repartitionByRange(2, col("a")).write.mode("append").parquet(dir)
    val (statted, _) = Skipping.refreshManifest(spark, dir, Seq("a"))
    assert(statted == 2L, s"expected only the delta statted, got $statted")
    def q2 = spark.read.parquet(dir)
      .agg(countDistinct(col("a")).as("nd"))
    assert(q2.head().getLong(0) == 100L)
    assert(scannedFiles(q2) == 0,
      "ndv must ride the delta append (segment-schema derived)")
    // fold preserves the stat
    Skipping.foldManifest(spark, dir)
    assert(q2.head().getLong(0) == 100L)
    assert(scannedFiles(q2) == 0, "fold must preserve __ndv")
    // OVERLAPPING file ranges: per-file counts don't add — the chain
    // declines and the scan answers (exact either way)
    val dir2 = tmp("ndv_overlap")
    df.repartition(8).write.parquet(dir2) // unclustered: ranges overlap
    Skipping.writeManifest(spark, dir2, Seq("a"), ndvCols = Seq("a"))
    def q3 = spark.read.parquet(dir2)
      .agg(countDistinct(col("a")).as("nd"))
    assert(q3.head().getLong(0) == 50L)
    assert(scannedFiles(q3) > 0, "overlapping ranges must decline to a scan")
    // boundary-sharing: two files touching at one attained value
    // subtract exactly one — forge the layout with explicit ranges
    val dir3 = tmp("ndv_boundary")
    spark.range(0L, 11L).select(col("id").as("a"))
      .coalesce(1).write.parquet(dir3) // [0..10]
    spark.range(10L, 21L).select(col("id").as("a"))
      .coalesce(1).write.mode("append").parquet(dir3) // [10..20]
    Skipping.writeManifest(spark, dir3, Seq("a"), ndvCols = Seq("a"))
    def q4 = spark.read.parquet(dir3)
      .agg(countDistinct(col("a")).as("nd"))
    assert(q4.head().getLong(0) == 21L,
      "shared boundary value 10 must count once")
    assert(scannedFiles(q4) == 0)
    // a FLOAT/DOUBLE distinct column declines (driver-side boundary
    // comparison distinguishes -0.0/0.0 where Spark's equality doesn't)
    Skipping.writeManifest(spark, dir, Seq("a", "b"),
      ndvCols = Seq("a", "b"))
    def qd = spark.read.parquet(dir)
      .agg(countDistinct(col("b")).as("nd"))
    assert(qd.head().getLong(0) == 7L)
    assert(scannedFiles(qd) > 0, "double distinct column must decline")
  }

  test("randomized differential: chain count(DISTINCT) == noskip across layouts") {
    val rnd = new scala.util.Random(20260816L)
    var metadataHits = 0
    for (trial <- 1 to 10) {
      // random domain width (forces boundary sharing at narrow widths),
      // random layout (clustered = chain-eligible, hashed = overlap
      // decline), random nulls, random exact filter
      val domain = 1 + rnd.nextInt(200)
      val clustered = trial <= 5 || rnd.nextBoolean()
      val nullEvery = if (rnd.nextBoolean()) 0 else 13
      val filtered = rnd.nextBoolean()
      // grouped trials: a hive (file-constant) key with the distinct
      // column clustered WITHIN each group — the per-group chain
      val grouped = rnd.nextBoolean()
      val base = spark.range(800).select(
        (if (nullEvery == 0) col("id") % domain
         else when(col("id") % nullEvery === 0, lit(null))
           .otherwise(col("id") % domain)).cast("long").as("a"),
        concat(lit("g"), col("id") % 3).as("g"), col("id"))
      val dir = tmp(s"ndv_rnd$trial")
      val laid =
        if (clustered)
          base.repartitionByRange(6, col("g"), col("a"))
            .sortWithinPartitions("a")
        else base.repartition(6)
      (if (grouped) laid.write.partitionBy("g") else laid.write)
        .parquet(dir)
      Skipping.writeManifest(spark, dir,
        if (grouped) Seq("g", "a") else Seq("a"), ndvCols = Seq("a"))
      def q(d: DataFrame) = {
        val f = if (filtered) d.filter(col("a") >= lit(domain / 3L)) else d
        if (grouped)
          f.groupBy(col("g")).agg(countDistinct(col("a")).as("nd"),
            count(col("a")).as("n"))
        else f.agg(countDistinct(col("a")).as("nd"),
          count(col("a")).as("n"))
      }
      val got = sets(q(spark.read.parquet(dir)))
      val want = sets(q(
        spark.read.option("graft.noskip", "true").parquet(dir)))
      assert(got == want,
        s"trial $trial: domain=$domain clustered=$clustered grouped=" +
          s"$grouped nulls=${nullEvery != 0} filtered=$filtered " +
          s"got=$got want=$want")
      if (scannedFiles(q(spark.read.parquet(dir))) == 0) metadataHits += 1
    }
    // the differential must actually exercise the metadata path, not
    // just watch every trial decline
    assert(metadataHits >= 3, s"only $metadataHits metadata-only trials")
  }

  test("metadata sum exactness gates: legacy manifests, count(null), multi-root") {
    // a manifest WITHOUT __sum stats (the legacy shape) must decline
    // sum/avg while still answering count/min/max — stats built through
    // the public API always carry sums now, so strip them to simulate
    val dir = tmp("meta_sum_legacy")
    val df = spark.range(500).select(col("id"), (col("id") % 9).as("a"))
    df.repartition(3).write.parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("a"))
    val mdir = s"$dir/_graft_manifest"
    val legacy = spark.read.parquet(mdir).drop("a__sum").cache()
    legacy.count()
    val fsys = new org.apache.hadoop.fs.Path(mdir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(mdir), true)
    legacy.coalesce(1).write.parquet(mdir)
    legacy.unpersist()
    def qm = spark.read.parquet(dir).agg(max(col("a")).as("mx"))
    assert(qm.head().getLong(0) == 8L)
    assert(scannedFiles(qm) == 0, "legacy manifest must still answer min/max")
    def qsum = spark.read.parquet(dir).agg(sum(col("a")).as("s"))
    assert(qsum.head().getLong(0) == df.agg(sum(col("a"))).head().getLong(0))
    assert(scannedFiles(qsum) > 0,
      "sum over a legacy manifest (no __sum) must decline to a scan")
    // count(NULL) is 0, never totalRows — the guard must hold locally,
    // not via NullPropagation's position in the fixed point (r14 #2)
    val dir2 = tmp("meta_count_null")
    df.repartition(2).write.parquet(dir2)
    Skipping.writeManifest(spark, dir2, Seq("a"))
    val cn = spark.read.parquet(dir2)
      .agg(count(lit(null)).as("n")).head().getLong(0)
    assert(cn == 0L, s"count(NULL) answered $cn")
    // a MULTI-ROOT read never takes the metadata path (rootPaths gate)
    val dir3 = tmp("meta_multiroot")
    df.repartition(2).write.parquet(dir3)
    Skipping.writeManifest(spark, dir3, Seq("a"))
    def qmr = spark.read.parquet(dir2, dir3).agg(count(lit(1)).as("n"))
    assert(qmr.head().getLong(0) == 1000L)
    assert(scannedFiles(qmr) > 0, "multi-root must decline the rewrite")
  }

  test("top-k pruning: ORDER BY ... LIMIT derives a sound bound and prunes files") {
    val dir = tmp("topk")
    val df = spark.range(2000).select(col("id"),
      (col("id") % 7).cast("double").as("v"),
      concat(lit("s"), lpad(col("id").cast("string"), 5, "0")).as("s"))
    df.repartitionByRange(10, col("id")).sortWithinPartitions("id")
      .write.parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("id", "s"))
    // DESC over the clustered unique key: top 25 of 2000 lives in one
    // file — the derived bound prunes the rest
    def qd = spark.read.parquet(dir).orderBy(col("id").desc).limit(25)
    assert(qd.collect().map(_.getLong(0)).toSeq == (1999L to 1975L by -1L))
    assert(scannedFiles(qd) <= 2, s"DESC top-k scanned ${scannedFiles(qd)} of 10")
    // ASC (default NULLS FIRST, but the column has no nulls) prunes too
    def qa = spark.read.parquet(dir).orderBy(col("id")).limit(10)
    assert(qa.collect().map(_.getLong(0)).toSeq == (0L to 9L))
    assert(scannedFiles(qa) <= 2)
    // STRING sort key: exact min/max stats make the bound sound
    def qs = spark.read.parquet(dir).orderBy(col("s").desc).limit(5)
    assert(qs.collect().map(_.getString(2)).toSeq ==
      (1999L to 1995L by -1L).map(i => f"s$i%05d"))
    assert(scannedFiles(qs) <= 2)
    // secondary sort keys ride along: the bound on the FIRST key keeps
    // every candidate row, whatever the tie-breakers do
    def qm = spark.read.parquet(dir)
      .orderBy(col("id").desc, col("v").asc).limit(5)
    assert(qm.collect().map(_.getLong(0)).toSeq == (1999L to 1995L by -1L))
    assert(scannedFiles(qm) <= 2)
    // a filter that does NOT translate exactly (strict bound on an
    // unindexed double) declines — stays exact, full scan
    def qf = spark.read.parquet(dir).filter(col("v") > 3.0)
      .orderBy(col("id").desc).limit(5)
    assert(qf.collect().map(_.getLong(0)).toSeq ==
      df.filter(col("v") > 3.0).orderBy(col("id").desc).limit(5)
        .collect().map(_.getLong(0)).toSeq)
    assert(scannedFiles(qf) == 10, "an untranslatable filter must decline")
    // an EXACTLY-translatable filter COMPOSES: only files the predicate
    // provably fully includes count toward the >= k proof, and the scan
    // prunes on predicate AND bound together
    val dirF = tmp("topk_filtered")
    spark.range(1600).select(col("id"),
        (col("id") >= 800L).cast("int").as("half"))
      .repartitionByRange(8, col("id")).sortWithinPartitions("id")
      .write.parquet(dirF)
    Skipping.writeManifest(spark, dirF, Seq("id", "half"))
    def qfl = spark.read.parquet(dirF).filter(col("half") === 1)
      .orderBy(col("id").asc).limit(5)
    assert(qfl.collect().map(_.getLong(0)).toSeq == (800L to 804L).toSeq)
    assert(scannedFiles(qfl) <= 3,
      s"filtered top-k scanned ${scannedFiles(qfl)} of 8")
    // a filter on the SORT column itself declines (the idempotence
    // fence) but the filter alone still prunes — and stays exact.
    // The decline is pinned OBSERVABLY: an ASC rewrite would inject a
    // LessThanOrEqual upper bound on id, so the optimized plan must
    // carry none (CombineFilters would merge stacked bounds into one
    // Filter node, so node-counting alone could not see a regression)
    def qsc = spark.read.parquet(dirF).filter(col("id") >= 1400L)
      .orderBy(col("id").asc).limit(5)
    assert(qsc.collect().map(_.getLong(0)).toSeq == (1400L to 1404L).toSeq)
    val conds = qsc.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition
    }
    assert(!conds.exists(_.exists {
      case _: org.apache.spark.sql.catalyst.expressions.LessThanOrEqual =>
        true
      case _ => false
    }), "idempotence fence regressed: a derived bound filter appeared")
    // k >= total rows declines (cannot prove k survivors short of all)
    def qb = spark.read.parquet(dir).orderBy(col("id").desc).limit(5000)
    assert(qb.count() == 2000)
    assert(scannedFiles(qb) == 10)
    // double sort keys decline (NaN ordering edge) — correct, unpruned
    def qv = spark.read.parquet(dir).orderBy(col("v").desc).limit(3)
    assert(qv.collect().map(_.getDouble(1)).forall(_ == 6.0))
    assert(scannedFiles(qv) == 10)
    // NULLS FIRST with nulls present: the null rows ARE the top —
    // declines, output keeps them
    val dirN = tmp("topk_nulls")
    spark.range(500).select(
      when(col("id") % 5 === 0, lit(null)).otherwise(col("id")).as("k"))
      .repartitionByRange(5, col("k")).write.parquet(dirN)
    Skipping.writeManifest(spark, dirN, Seq("k"))
    def qn = spark.read.parquet(dirN).orderBy(col("k").asc).limit(10)
    assert(qn.collect().forall(_.isNullAt(0)),
      "ASC NULLS FIRST must surface the null rows")
    assert(scannedFiles(qn) == 5)
    // ...and DESC (nulls last) on the same data still prunes
    def qnd = spark.read.parquet(dirN).orderBy(col("k").desc).limit(10)
    assert(qnd.collect().map(_.getLong(0)).toSeq ==
      (499L to 480L by -1L).filterNot(_ % 5 == 0).take(10))
    assert(scannedFiles(qnd) < 5)
    // out-of-band append (identity gate): declines, rows included
    spark.range(90000, 90010).select(col("id").as("k"))
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(dirN)
    def qo = spark.read.parquet(dirN).orderBy(col("k").desc).limit(3)
    assert(qo.collect().map(_.getLong(0)).toSeq ==
      Seq(90009L, 90008L, 90007L))
    // the DIALECT surface rides the same session rule
    val exec = new graft.exec.Executor(spark, Map.empty)
    exec.setBasepath(new java.io.File(dir).getParent)
    exec.execute(s"COPY tkt FROM '${new java.io.File(dir).getName}' " +
      "WITH format 'parquet'")
    val dq = exec.query("select id from tkt order by id desc limit 7")
    assert(dq.collect().map(_.getLong(0)).toSeq == (1999L to 1993L by -1L))
    assert(scannedFiles(
      exec.query("select id from tkt order by id desc limit 7")) <= 2,
      "dialect top-k did not prune")
    // LIMIT + OFFSET shapes stay exact whatever logical form Spark
    // gives them: an Offset between the limits declines, a combined
    // k+m limit matches with a bound that keeps >= k+m rows — both
    // sound, and this pins it against plan-shape drift
    def qoff = spark.read.parquet(dir).orderBy(col("id").desc)
      .offset(3).limit(5)
    assert(qoff.collect().map(_.getLong(0)).toSeq == (1996L to 1992L by -1L))
    val dqo = exec.query(
      "select id from tkt order by id desc limit 5 offset 3")
    assert(dqo.collect().map(_.getLong(0)).toSeq == (1996L to 1992L by -1L))
  }

  test("graft.noskip reader option opts a single read out of both rules") {
    val (dir, src) = writeClustered(500)
    // pruning rule bypassed: the filtered read opens every file
    val q = spark.read.option("graft.noskip", "true").parquet(dir)
      .filter(col("a").between(10, 14))
    assert(scannedFiles(spark.read.option("graft.noskip", "true")
      .parquet(dir).filter(col("a").between(10, 14))) == 10)
    assert(sets(q) == sets(src.filter(col("a").between(10, 14))))
    // metadata rule bypassed: the global count runs as a real scan
    assert(scannedFiles(spark.read.option("graft.noskip", "true")
      .parquet(dir).agg(count(lit(1)).as("n"))) == 10)
    // ...while the plain read still answers metadata-only
    assert(scannedFiles(spark.read.parquet(dir)
      .agg(count(lit(1)).as("n"))) == 0)
  }

  test("streaming reads over a manifest-carrying table prune per micro-batch") {
    // r13 boundary closed: a FileStreamSource micro-batch plans its
    // relation over the batch's individual FILES (rootPaths = N parquet
    // files, not the table dir); the rule resolves their shared parent
    // to the manifest root and prunes the same way the batch path does.
    // The stream's input log is untouched — pruning only skips opening
    // files whose rows the row-level filter drops anyway.
    val (dir, src) = writeClustered(1000)
    val outDir = tmp("stream_skip_out")
    val ckpt = tmp("stream_skip_ck")
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
      .filter(col("a").between(10, 14))
    val q = stream.writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt).start()
    val nf = try { q.processAllAvailable()
      org.apache.spark.sql.graft.ManifestSkipping.lastBatchScannedFiles(q)
    } finally q.stop()
    // exact rows AND a pruned scan
    assert(sets(spark.read.parquet(outDir)) ==
      sets(src.filter(col("a").between(10, 14))))
    assert(nf > 0 && nf * 2 <= 10, s"streaming scan opened $nf of 10")
    // unpruned control: without a manifest the same stream opens all 10
    val dir2 = tmp("stream_noskip")
    src.repartitionByRange(10, col("a")).sortWithinPartitions("a")
      .write.parquet(dir2)
    val q2 = spark.readStream
      .schema(spark.read.parquet(dir2).schema).parquet(dir2)
      .filter(col("a").between(10, 14))
      .writeStream.outputMode("append").format("parquet")
      .option("path", tmp("stream_noskip_out"))
      .option("checkpointLocation", tmp("stream_noskip_ck")).start()
    val nf2 = try { q2.processAllAvailable()
      org.apache.spark.sql.graft.ManifestSkipping.lastBatchScannedFiles(q2)
    } finally q2.stop()
    assert(nf2 == 10, s"control scanned $nf2 of 10")
  }

  test("streaming reads over HIVE-PARTITIONED manifest tables prune too") {
    // r14 boundary closed (VERDICT r15 #4): a partitioned source's
    // micro-batch roots live under per-partition `k=v` parents;
    // fileListRoot walks the partition levels up to the
    // manifest-carrying table root, and data-column pruning composes
    // with the partitioning exactly as in the batch path.
    val src = spark.range(1200).select(
      col("id"), (col("id") % 3).as("p"), (col("id") % 50).as("a"))
    val dir = tmp("stream_skip_hive")
    // range-cluster on `a` INSIDE each partition: 10 range tasks x 3
    // partition dirs = 30 files, each narrow in `a`
    src.repartitionByRange(10, col("a")).sortWithinPartitions("a")
      .write.partitionBy("p").parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("a"))
    val total = Skipping.dataFiles(spark, dir).size
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
      .filter(col("a").between(10, 14))
    val outDir = tmp("stream_skip_hive_out")
    val q = stream.writeStream.outputMode("append").format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", tmp("stream_skip_hive_ck")).start()
    val nf = try { q.processAllAvailable()
      org.apache.spark.sql.graft.ManifestSkipping.lastBatchScannedFiles(q)
    } finally q.stop()
    // column order differs (partition col rides last through the sink)
    assert(sets(spark.read.parquet(outDir).select("id", "p", "a")) ==
      sets(src.filter(col("a").between(10, 14)).select("id", "p", "a")))
    assert(nf > 0 && nf * 2 <= total,
      s"partitioned streaming scan opened $nf of $total")
  }
}
