package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Skipping, Sinks}
import graft.sources.Skipping._

/** File-level min/max data skipping: soundness (pruning never changes
  * results, stale manifests degrade to extra IO), incrementality
  * (refresh stats only the delta), effectiveness (clustered layouts
  * actually prune), and the OPTIMIZE dialect verb end to end. */
class SkippingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  /** 3 typed columns incl. nulls: a (long, clustered), b (double),
    * s (string) — nulls in b and s. */
  private def sample(n: Int): DataFrame =
    spark.range(n.toLong).select(
      col("id"),
      (col("id") / 10).cast("long").as("a"),
      when(col("id") % 7 === 0, lit(null))
        .otherwise((col("id") % 100).cast("double") / 2).as("b"),
      when(col("id") % 11 === 0, lit(null))
        .otherwise(concat(lit("k"), lpad((col("id") % 50).cast("string"), 3, "0")))
        .as("s"))

  private def collectSet(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("randomized differential: skipping read == full filter, all pred kinds") {
    val dir = tmp("skip_diff")
    val df = sample(500)
    df.repartitionByRange(8, col("a")).sortWithinPartitions("a")
      .write.parquet(dir)
    writeManifest(spark, dir, Seq("a", "b", "s"))
    val full = spark.read.parquet(dir)
    val rnd = new scala.util.Random(42)
    def randPred(): Pred = rnd.nextInt(6) match {
      case 0 =>
        val lo = rnd.nextInt(50).toLong
        RangePred("a", Some(lo), Some(lo + rnd.nextInt(10).toLong))
      case 1 => RangePred("b", Some(rnd.nextInt(40).toDouble),
        Some((rnd.nextInt(10) + 40).toDouble))
      case 2 => EqPred("s", f"k${rnd.nextInt(50)}%03d")
      case 3 => InPred("a", Seq.fill(3)(rnd.nextInt(50).toLong))
      case 4 => if (rnd.nextBoolean()) NullPred("b") else NullPred("s")
      case 5 => if (rnd.nextBoolean()) NotNullPred("b") else NotNullPred("s")
    }
    for (_ <- 1 to 30) {
      val preds = Seq.fill(1 + rnd.nextInt(2))(randPred())
      val expect = collectSet(full.filter(predColumn(preds)))
      val got = collectSet(readSkipping(spark, dir, preds))
      assert(got == expect, s"mismatch for $preds")
    }
  }

  test("stale manifest: files unknown to the manifest are always read") {
    val dir = tmp("skip_stale")
    sample(100).write.parquet(dir)
    writeManifest(spark, dir, Seq("a"))
    // new data lands WITHOUT a manifest refresh
    sample(100).withColumn("a", col("a") + 1000)
      .write.mode(SaveMode.Append).parquet(dir)
    val preds = Seq(RangePred("a", Some(1000L), None))
    val got = readSkipping(spark, dir, preds)
    assert(got.count() == 100) // every appended row found
    val (kept, total) = prunedFiles(spark, dir, preds)
    assert(kept.size < total) // ...while known disjoint files still prune
  }

  test("missing manifest degrades to a full scan") {
    val dir = tmp("skip_nomanifest")
    sample(50).write.parquet(dir)
    val (kept, total) = prunedFiles(spark, dir,
      Seq(RangePred("a", Some(0L), Some(0L))))
    assert(kept.size == total)
    assert(collectSet(readSkipping(spark, dir, Seq(RangePred("a", Some(1L), Some(2L)))))
      == collectSet(spark.read.parquet(dir).filter(col("a").between(1, 2))))
  }

  test("refreshManifest stats only the delta and drops dead entries") {
    val dir = tmp("skip_refresh")
    sample(100).repartition(4).write.parquet(dir)
    writeManifest(spark, dir, Seq("a", "b"))
    val before = readManifest(spark, dir).get.collect()
      .map(r => r.getString(r.fieldIndex("file")) -> r.toString).toMap
    // no change → no-op
    assert(refreshManifest(spark, dir, Seq("a", "b")) == ((0L, 0L)))
    // append 2 more files
    sample(40).withColumn("a", col("a") + 500).repartition(2)
      .write.mode(SaveMode.Append).parquet(dir)
    val (added, removed) = refreshManifest(spark, dir, Seq("a", "b"))
    assert(added == 2L && removed == 0L)
    val after = readManifest(spark, dir).get.collect()
      .map(r => r.getString(r.fieldIndex("file")) -> r.toString).toMap
    // pre-existing entries byte-identical (not re-statted)
    before.foreach { case (f, row) => assert(after(f) == row) }
    assert(after.size == before.size + 2)
    // delete one data file behind the manifest's back
    val f = new org.apache.hadoop.fs.Path(dir + "/" + before.keys.head)
    f.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(f, false)
    val (a2, r2) = refreshManifest(spark, dir, Seq("a", "b"))
    assert(a2 == 0L && r2 == 1L)
    // column-set mismatch falls back to a full rebuild
    val (a3, _) = refreshManifest(spark, dir, Seq("a"))
    assert(a3 == dataFiles(spark, dir).size.toLong)
  }

  test("per-file HLL sketches: metadata approx distinct on an " +
      "unclustered layout, within 5% of exact, rides delta and fold") {
    System.setProperty("graft.skipping.manifestFoldSegments", "3")
    try {
      val dir = tmp("skip_hll")
      // UNCLUSTERED in k: every file spans the whole domain, so the
      // exact ndv chain can never answer — only the union of per-file
      // sketches can
      spark.range(5000).select(col("id"),
          pmod(col("id") * 2654435761L, lit(997L)).as("k"))
        .repartition(8).write.parquet(dir)
      writeManifest(spark, dir, Seq("k"), hllCols = Seq("k"))
      def exact(): Long = spark.read.parquet(dir)
        .agg(countDistinct(col("k"))).head().getLong(0)
      def est(): Option[Long] =
        Skipping.metadataApproxDistinct(spark, dir, "k")
      val (x1, e1) = (exact(), est())
      assert(e1.isDefined, "sketch path must answer")
      assert(math.abs(e1.get - x1) <= 0.05 * x1,
        s"estimate ${e1.get} vs exact $x1")
      // the sketch bytes are NOT driver-resident: the cached stat rows
      // carry no __hll column
      assert(Skipping.cachedTables.contains(dir))
      // delta refreshes ride the same O(delta) append path AND push
      // past the fold threshold — the estimate must track the growing
      // domain through every segmented state
      for (i <- 1 to 4) {
        spark.range(1000).select((col("id") + 100000L * i).as("id"),
            (lit(1000L * i) + pmod(col("id"), lit(200L))).as("k"))
          .coalesce(1).write.mode(SaveMode.Append).parquet(dir)
        val (a, r) = refreshManifest(spark, dir, Seq("k"),
          hllCols = Seq("k"))
        assert(a == 1L && r == 0L)
        val (x, e) = (exact(), est())
        assert(e.isDefined && math.abs(e.get - x) <= 0.05 * x,
          s"after delta $i: estimate $e vs exact $x")
      }
      assert(Skipping.metadataApproxDistinct(spark, dir, "id").isEmpty,
        "a column without sketches must decline")
      // an out-of-band append (no refresh) breaks the completeness
      // proof: the estimate must decline rather than undercount
      spark.range(10).select(col("id"), lit(99999L).as("k"))
        .coalesce(1).write.mode(SaveMode.Append).parquet(dir)
      assert(est().isEmpty, "out-of-band file must decline the sketch path")
      val (af, _) = refreshManifest(spark, dir, Seq("k"),
        hllCols = Seq("k"))
      assert(af == 1L)
      val (x2, e2) = (exact(), est())
      assert(e2.isDefined && math.abs(e2.get - x2) <= 0.05 * x2)
    } finally System.clearProperty("graft.skipping.manifestFoldSegments")
  }

  test("randomized differential: HLL estimate within 5% of the exact " +
      "scan across layouts, cardinalities, and filtered legs") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 6) {
      val dir = tmp(s"skip_hllrnd$trial")
      val card = Seq(7L, 97L, 1009L, 4999L)(rnd.nextInt(4))
      val n = 2000 + rnd.nextInt(3000)
      val parts = 2 + rnd.nextInt(8)
      val base = spark.range(n.toLong).select(col("id"),
        pmod(col("id") * 2654435761L, lit(card)).as("k"),
        (col("id") % 4).cast("string").as("g"))
      // random layout: clustered, hash-spread, or hive by g
      rnd.nextInt(3) match {
        case 0 => base.repartitionByRange(parts, col("k"))
          .write.parquet(dir)
        case 1 => base.repartition(parts).write.parquet(dir)
        case 2 => base.repartition(parts, col("id"))
          .write.partitionBy("g").parquet(dir)
      }
      writeManifest(spark, dir, Seq("g", "k"), hllCols = Seq("k"))
      val exact = spark.read.parquet(dir)
        .agg(countDistinct(col("k"))).head().getLong(0)
      val est = Skipping.metadataApproxDistinct(spark, dir, "k")
      assert(est.isDefined, s"trial $trial must answer")
      assert(math.abs(est.get - exact) <= math.max(1.0, 0.05 * exact),
        s"trial $trial (card=$card, n=$n): est ${est.get} vs $exact")
      // filtered leg over the file-constant hive key where it exists
      val gv = rnd.nextInt(4).toString
      val preds = Seq(EqPred("g", gv))
      val estF = Skipping.metadataApproxDistinct(spark, dir, "k", preds,
        Map("g" -> org.apache.spark.sql.types.StringType))
      val exactF = spark.read.parquet(dir)
        .filter(col("g") === gv)
        .agg(countDistinct(col("k"))).head().getLong(0)
      // non-hive layouts have partial files under the pred -> the
      // completeness proof declines; hive layouts must answer
      estF match {
        case Some(e) =>
          assert(math.abs(e - exactF) <= math.max(1.0, 0.05 * exactF),
            s"trial $trial filtered: est $e vs $exactF")
        case None => // declined: sound (partial files under the pred)
      }
    }
  }

  test("HLL sketches: requesting them on a sketch-less compatible " +
      "manifest triggers the rebuild, like ndv") {
    val dir = tmp("skip_hll_rebuild")
    sample(200).repartition(4).write.parquet(dir)
    writeManifest(spark, dir, Seq("a"))
    val n = dataFiles(spark, dir).size.toLong
    val (a1, _) = refreshManifest(spark, dir, Seq("a"),
      hllCols = Seq("a"))
    assert(a1 == n, "hll request on a sketch-less manifest must rebuild")
    assert(Skipping.metadataApproxDistinct(spark, dir, "a").isDefined)
  }

  test("oversized manifest: pruning runs distributed, no stat row is " +
      "collected, metadata rewrites ANSWER via the distributed " +
      "completeness walk and match the driver path") {
    // r18 VERDICT lead item: past graft.skipping.statsDriverMaxBytes
    // the planning cache must NOT collect O(files) stat rows — pruning
    // runs as a job returning only dropped triples, and (new in r19)
    // the metadata agg / top-k / DFP-qualification rewrites evaluate
    // the SAME completeness proof distributed instead of declining.
    val dir = tmp("skip_cap")
    spark.range(3000).select(col("id").as("a"),
        (col("id") % 7).cast("double").as("v"))
      .repartitionByRange(10, col("a")).sortWithinPartitions("a")
      .write.parquet(dir)
    writeManifest(spark, dir, Seq("a"))
    import org.apache.spark.sql.types._
    val types = Map[String, DataType]("a" -> LongType)
    // driver-path reference results (cap lifted)
    val aggRef = Skipping.metadataAggStats(spark, dir, Seq("a"),
      expectedTypes = types)
    val topkRef = Skipping.topKFilterBound(spark, dir, "a", 5L,
      desc = true, nullsFirst = false, types)
    val aggFilteredRef = Skipping.metadataAggStats(spark, dir,
      Seq("a"), Seq(RangePred("a", Some(0L), None)), types)
    assert(aggRef.exists(_._1 == 3000L) && topkRef.isDefined &&
      aggFilteredRef.isDefined)
    sys.props("graft.skipping.statsDriverMaxBytes") = "1"
    try {
      Skipping.evictTable(dir)
      def q(df: DataFrame) = df.filter(col("a") >= 100 && col("a") < 400)
      assert(collectSet(q(spark.read.parquet(dir))) ==
        collectSet(q(spark.read.option("graft.noskip", "true")
          .parquet(dir))))
      val nf = Skipping.scannedFiles(q(spark.read.parquet(dir)))
      assert(nf * 2 <= 10, s"distributed pruning scanned $nf of 10")
      assert(!Skipping.cachedTables.contains(dir),
        "stat rows were collected past the driver cap")
      assert(Skipping.metadataAggStats(spark, dir, Seq("a"),
        expectedTypes = types) == aggRef,
        "oversized metadata aggregate must equal the driver path")
      assert(Skipping.metadataAggStats(spark, dir, Seq("a"),
        Seq(RangePred("a", Some(0L), None)), types) == aggFilteredRef,
        "oversized FILTERED (all-in) aggregate must equal the driver " +
          "path")
      // a genuinely partial pred declines on both paths
      assert(Skipping.metadataAggStats(spark, dir, Seq("a"),
        Seq(RangePred("a", Some(100L), Some(400L))), types).isEmpty)
      assert(Skipping.topKFilterBound(spark, dir, "a", 5L, desc = true,
        nullsFirst = false, types) == topkRef,
        "oversized top-k bound must equal the driver walk's")
      assert(Skipping.statIndexedColumns(spark, dir) == Set("a"),
        "DFP qualification must answer from the footer past the cap")
      assert(!Skipping.cachedTables.contains(dir),
        "a rewrite leaked stat rows into the driver cache")
    } finally {
      sys.props.remove("graft.skipping.statsDriverMaxBytes")
      Skipping.evictTable(dir)
    }
    // cap lifted: the driver path resumes and the cache repopulates
    assert(droppedFiles(spark, dir,
      Seq(RangePred("a", Some(100L), Some(399L)))).exists(_.nonEmpty))
    assert(Skipping.cachedTables.contains(dir))
  }

  test("oversized manifest: GROUP BY / ndv-chain / HLL rewrites " +
      "answer distributed and match the driver path exactly") {
    import org.apache.spark.sql.types._
    // hive-partitioned by g (file-constant key), k carries sketches
    val dir = tmp("skip_cap_grp")
    spark.range(4000).select(col("id"),
        (col("id") % 4).cast("int").as("g"),
        pmod(col("id") * 2654435761L, lit(997L)).as("k"),
        (col("id") % 9).cast("double").as("v"))
      .repartition(8).write.partitionBy("g").parquet(dir)
    writeManifest(spark, dir, Seq("g", "k", "v"), hllCols = Seq("k"))
    // hive partition inference reads g back as INTEGER
    val types = Map[String, DataType]("g" -> IntegerType,
      "k" -> LongType, "v" -> DoubleType)
    val grpRef = Skipping.metadataGroupStats(spark, dir, Seq("g"),
      Seq("v"), expectedTypes = types)
    val hllRef = Skipping.metadataApproxDistinct(spark, dir, "k")
    assert(grpRef.exists(_.size == 4) && hllRef.isDefined)
    // clustered layout with exact ndv stats: the chain count
    val dir2 = tmp("skip_cap_ndv")
    spark.range(3000).select(pmod(col("id"), lit(173L)).as("k"))
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
      .write.parquet(dir2)
    writeManifest(spark, dir2, Seq("k"), ndvCols = Seq("k"))
    val ndvRef = Skipping.metadataGroupStats(spark, dir2, Nil, Nil,
      distinctCols = Seq(Seq("k")),
      expectedTypes = Map("k" -> LongType))
    assert(ndvRef.exists(_.head._4(Seq("k")) == 173L))
    sys.props("graft.skipping.statsDriverMaxBytes") = "1"
    try {
      Seq(dir, dir2).foreach(Skipping.evictTable)
      assert(Skipping.metadataGroupStats(spark, dir, Seq("g"),
        Seq("v"), expectedTypes = types).map(_.toSet) ==
        grpRef.map(_.toSet),
        "oversized metadata GROUP BY must equal the driver path")
      assert(Skipping.metadataApproxDistinct(spark, dir, "k") == hllRef,
        "oversized HLL estimate must equal the driver path")
      // filtered HLL leg over the file-constant hive key
      val estClick = Skipping.metadataApproxDistinct(spark, dir, "k",
        Seq(EqPred("g", 2)), types)
      val exactClick = spark.read.parquet(dir)
        .filter(col("g") === 2)
        .agg(countDistinct(col("k"))).head().getLong(0)
      assert(estClick.exists(e =>
        math.abs(e - exactClick) <= math.max(1.0, 0.05 * exactClick)))
      assert(Skipping.metadataGroupStats(spark, dir2, Nil, Nil,
        distinctCols = Seq(Seq("k")),
        expectedTypes = Map("k" -> LongType)).map(_.toSet) ==
        ndvRef.map(_.toSet),
        "oversized ndv chain must equal the driver walk")
      assert(!Skipping.cachedTables.contains(dir) &&
        !Skipping.cachedTables.contains(dir2),
        "a distributed rewrite leaked stat rows into the driver cache")
    } finally {
      sys.props.remove("graft.skipping.statsDriverMaxBytes")
      Seq(dir, dir2).foreach(Skipping.evictTable)
    }
  }

  test("oversized memo: repeated rewrites over an unchanged table " +
      "re-list but run ZERO further jobs; an out-of-band append " +
      "invalidates by digest") {
    import org.apache.spark.sql.types._
    val dir = tmp("skip_cap_memo")
    spark.range(2000).select(col("id").as("a"))
      .repartitionByRange(6, col("a")).sortWithinPartitions("a")
      .write.parquet(dir)
    writeManifest(spark, dir, Seq("a"))
    val types = Map[String, DataType]("a" -> LongType)
    sys.props("graft.skipping.statsDriverMaxBytes") = "1"
    sys.props("graft.skipping.probeTtlMs") = "60000"
    try {
      Skipping.evictTable(dir)
      val first = Skipping.metadataAggStats(spark, dir, Seq("a"),
        expectedTypes = types)
      assert(first.exists(_._1 == 2000L))
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        assert(Skipping.metadataAggStats(spark, dir, Seq("a"),
          expectedTypes = types) == first)
        // flush the async listener bus with a sentinel RDD job
        spark.sparkContext.parallelize(Seq(1), 1).count()
        val deadline = System.currentTimeMillis() + 10000
        while (jobs.get() < 1 && System.currentTimeMillis() < deadline)
          Thread.sleep(20)
        assert(jobs.get() == 1,
          s"memoized oversized rewrite ran ${jobs.get() - 1} jobs")
      } finally spark.sparkContext.removeSparkListener(listener)
      // out-of-band append: the digest changes, the memo CANNOT be
      // served, and the completeness proof declines (unknown file)
      spark.range(5).select((col("id") + 5000L).as("a"))
        .coalesce(1).write.mode(SaveMode.Append).parquet(dir)
      assert(Skipping.metadataAggStats(spark, dir, Seq("a"),
        expectedTypes = types).isEmpty,
        "out-of-band file must fail the distributed completeness walk")
    } finally {
      sys.props.remove("graft.skipping.statsDriverMaxBytes")
      sys.props.remove("graft.skipping.probeTtlMs")
      Skipping.evictTable(dir)
    }
  }

  test("randomized differential: every oversized rewrite equals the " +
      "driver path across layouts, preds, nulls, and group shapes") {
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(20260817L)
    for (trial <- 1 to 6) {
      val dir = tmp(s"skip_ovdiff$trial")
      val n = 1000 + rnd.nextInt(2000)
      val base = spark.range(n.toLong).select(
        col("id").as("a"),
        (col("id") % (3 + rnd.nextInt(3))).cast("int").as("g"),
        when(col("id") % 13 === 0, lit(null))
          .otherwise((col("id") % 90).cast("double")).as("v"),
        pmod(col("id"), lit(97L)).as("k"))
      val parts = 3 + rnd.nextInt(6)
      rnd.nextInt(3) match {
        case 0 => base.repartitionByRange(parts, col("a"))
          .sortWithinPartitions("a").write.parquet(dir)
        case 1 => base.repartition(parts).write.parquet(dir)
        case 2 => base.repartition(parts, col("a"))
          .write.partitionBy("g").parquet(dir)
      }
      writeManifest(spark, dir, Seq("a", "g", "v", "k"),
        ndvCols = Seq("a"), hllCols = Seq("k"))
      val types = Map[String, DataType]("a" -> LongType,
        "g" -> IntegerType, "v" -> DoubleType, "k" -> LongType)
      def preds(): Seq[Pred] = rnd.nextInt(4) match {
        case 0 => Nil
        case 1 => Seq(RangePred("a", Some(0L), None)) // all-in
        case 2 =>
          val lo = rnd.nextInt(n).toLong
          Seq(RangePred("a", Some(lo), Some(lo + 200L))) // maybe partial
        case 3 => Seq(NotNullPred("v"))
      }
      val p1 = preds(); val p2 = preds()
      val topkK = 1L + rnd.nextInt(50).toLong
      val topkDesc = rnd.nextBoolean()
      def runAll() = (
        Skipping.metadataAggStats(spark, dir, Seq("a", "v"), p1, types),
        Skipping.metadataGroupStats(spark, dir, Seq("g"), Seq("v"), p2,
          types).map(_.toSet),
        Skipping.metadataGroupStats(spark, dir, Nil, Nil,
          distinctCols = Seq(Seq("a")),
          expectedTypes = types).map(_.toSet),
        Skipping.metadataApproxDistinct(spark, dir, "k"),
        Skipping.topKFilterBound(spark, dir, "a", topkK,
          desc = topkDesc, nullsFirst = false, types))
      Skipping.evictTable(dir)
      val driver = runAll()
      sys.props("graft.skipping.statsDriverMaxBytes") = "1"
      try {
        Skipping.evictTable(dir)
        val oversized = runAll()
        assert(oversized == driver,
          s"trial $trial: oversized $oversized != driver $driver " +
            s"(p1=$p1 p2=$p2)")
        assert(!Skipping.cachedTables.contains(dir))
      } finally {
        sys.props.remove("graft.skipping.statsDriverMaxBytes")
        Skipping.evictTable(dir)
      }
    }
  }

  test("distributedDrops memo holds multiple pred sets per path: " +
      "alternating predicates hit the memo instead of re-running " +
      "the keep/drop job") {
    // r18 VERDICT #3: the old single-entry-per-path memo re-paid the
    // distributed job on every alternation between two pred sets
    val dir = tmp("skip_cap_alt")
    sample(600).repartitionByRange(6, col("a")).write.parquet(dir)
    writeManifest(spark, dir, Seq("a"))
    val pA = Seq(RangePred("a", Some(0L), Some(9L)))
    val pB = Seq(RangePred("a", Some(50L), Some(59L)))
    sys.props("graft.skipping.statsDriverMaxBytes") = "1"
    sys.props("graft.skipping.probeTtlMs") = "60000"
    try {
      Skipping.evictTable(dir)
      // warm both pred sets (each pays its one distributed job)
      assert(droppedFiles(spark, dir, pA).exists(_.nonEmpty))
      assert(droppedFiles(spark, dir, pB).exists(_.nonEmpty))
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        for (_ <- 1 to 3) {
          assert(droppedFiles(spark, dir, pA).exists(_.nonEmpty))
          assert(droppedFiles(spark, dir, pB).exists(_.nonEmpty))
        }
        spark.sparkContext.parallelize(Seq(1), 1).count()
        val deadline = System.currentTimeMillis() + 10000
        while (jobs.get() < 1 && System.currentTimeMillis() < deadline)
          Thread.sleep(20)
        assert(jobs.get() == 1,
          s"alternating pred sets re-ran ${jobs.get() - 1} keep/drop " +
            "jobs despite the memo")
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally {
      sys.props.remove("graft.skipping.statsDriverMaxBytes")
      sys.props.remove("graft.skipping.probeTtlMs")
      Skipping.evictTable(dir)
    }
  }

  test("HLL estimate memo is keyed by live identity: an out-of-band " +
      "append re-evaluates the DFP density verdict instead of " +
      "serving the stale estimate") {
    // r18 VERDICT #2: the per-signature memo could serve an estimate
    // from BEFORE an out-of-band file appeared to keysLikelyCoverNdv
    // (the one digest-exempt consumer). The manifest signature does
    // NOT change on a data append, so this is exactly the stale case.
    val dir = tmp("skip_hll_digest")
    spark.range(3000).select(pmod(col("id"), lit(100L)).as("k"))
      .repartition(4).write.parquet(dir)
    writeManifest(spark, dir, Seq("k"), hllCols = Seq("k"))
    // warm the memo, then confirm the density verdict at ~100 ndv
    assert(Skipping.metadataApproxDistinct(spark, dir, "k").isDefined)
    assert(Skipping.keysLikelyCoverNdv(spark, dir, "k", 120L),
      "120 keys must read as covering a ~100-ndv column")
    // out-of-band append with 5000 NEW values — a stale served
    // estimate would keep answering true
    spark.range(5000).select((col("id") + 1000L).as("k"))
      .coalesce(1).write.mode(SaveMode.Append).parquet(dir)
    assert(!Skipping.keysLikelyCoverNdv(spark, dir, "k", 120L),
      "the stale memoized estimate was served across an out-of-band " +
        "append")
  }

  test("oversized manifest: bloom point-lookup pruning still drops " +
      "files through the distributed probe") {
    val dir = tmp("skip_cap_bloom")
    // high-cardinality unclustered id: interval stats can't prune, only
    // the bloom can
    spark.range(4000).select(col("id"),
        pmod(col("id") * 2654435761L, lit(4000L)).as("k"))
      .repartition(8).write.parquet(dir)
    writeManifest(spark, dir, Seq("k"), bloomCols = Seq("k"))
    sys.props("graft.skipping.statsDriverMaxBytes") = "1"
    try {
      Skipping.evictTable(dir)
      def q(df: DataFrame) = df.filter(col("k") === 17L)
      assert(collectSet(q(spark.read.parquet(dir))) ==
        collectSet(q(spark.read.option("graft.noskip", "true")
          .parquet(dir))))
      val nf = Skipping.scannedFiles(q(spark.read.parquet(dir)))
      assert(nf < 8, s"bloom-distributed pruning scanned $nf of 8")
      assert(!Skipping.cachedTables.contains(dir),
        "stat rows were collected past the driver cap")
    } finally {
      sys.props.remove("graft.skipping.statsDriverMaxBytes")
      Skipping.evictTable(dir)
    }
  }

  test("stats cache LRU: the byte budget evicts the least recently " +
      "used table, not the hot one") {
    val d1 = tmp("skip_lru1"); val d2 = tmp("skip_lru2")
    Seq(d1, d2).foreach { d =>
      sample(300).repartitionByRange(4, col("a"))
        .write.parquet(d)
      writeManifest(spark, d, Seq("a"))
    }
    val p = Seq(RangePred("a", Some(0L), Some(5L)))
    sys.props("graft.skipping.statsCacheMaxBytes") = "1"
    try {
      Skipping.evictTable(d1); Skipping.evictTable(d2)
      assert(droppedFiles(spark, d1, p).isDefined)
      assert(Skipping.cachedTables.contains(d1))
      // loading d2 must evict d1 (budget fits ~one entry), keep d2
      assert(droppedFiles(spark, d2, p).isDefined)
      assert(Skipping.cachedTables.contains(d2),
        "the incoming entry must be resident")
      assert(!Skipping.cachedTables.contains(d1),
        "the LRU entry must be evicted past the byte budget")
    } finally {
      sys.props.remove("graft.skipping.statsCacheMaxBytes")
      Skipping.evictTable(d1); Skipping.evictTable(d2)
    }
  }

  test("refreshManifest: a requested ndv column absent from the " +
      "manifest triggers the full rebuild") {
    // r17 ADVICE: the old path silently kept a compatible-but-ndv-less
    // manifest, so opting a table into ndv stats via refresh never took
    // effect and gave no signal
    val dir = tmp("skip_refresh_ndv")
    sample(100).repartition(4).write.parquet(dir)
    writeManifest(spark, dir, Seq("a", "b"))
    val nFiles = dataFiles(spark, dir).size.toLong
    assert(!readManifest(spark, dir).get.columns.contains("a__ndv"))
    // same cols + a new ndv request: must rebuild (all files restatted)
    val (a1, _) = refreshManifest(spark, dir, Seq("a", "b"),
      ndvCols = Seq("a"))
    assert(a1 == nFiles, s"expected full rebuild of $nFiles, got $a1")
    assert(readManifest(spark, dir).get.columns.contains("a__ndv"))
    // already-carried ndv stays the incremental no-op path
    assert(refreshManifest(spark, dir, Seq("a", "b"),
      ndvCols = Seq("a")) == ((0L, 0L)))
    // and a delta append preserves the ndv column for the new files
    sample(40).withColumn("a", col("a") + 500).repartition(2)
      .write.mode(SaveMode.Append).parquet(dir)
    val (a2, r2) = refreshManifest(spark, dir, Seq("a", "b"),
      ndvCols = Seq("a"))
    assert(a2 == 2L && r2 == 0L)
    val m = readManifest(spark, dir).get
    assert(m.filter(col("a__ndv").isNull).count() == 0L,
      "delta rows must carry the ndv stat")
  }

  test("clustered layout prunes hard; null-count prunes IS [NOT] NULL") {
    val dir = tmp("skip_eff")
    // a in [0,49] range-clustered over 10 files; nulls only in a's 0-file
    sample(500).repartitionByRange(10, col("a")).sortWithinPartitions("a")
      .write.parquet(dir)
    writeManifest(spark, dir, Seq("a", "b"))
    val (kept, total) = prunedFiles(spark, dir,
      Seq(RangePred("a", Some(10L), Some(14L))))
    assert(total == 10 && kept.size * 4 <= total,
      s"kept ${kept.size} of $total")
    // IS NULL: only files holding nulls of b survive
    val (keptN, _) = prunedFiles(spark, dir, Seq(NullPred("b")))
    val withNulls = spark.read.parquet(dir).filter(col("b").isNull)
      .select(input_file_name()).distinct().count()
    assert(keptN.size.toLong == withNulls)
    // NOT NULL against an all-null column: every file prunes
    val dir2 = tmp("skip_allnull")
    spark.range(100).select(col("id"), lit(null).cast("double").as("x"))
      .repartition(4).write.parquet(dir2)
    writeManifest(spark, dir2, Seq("x"))
    val (keptA, totalA) = prunedFiles(spark, dir2, Seq(NotNullPred("x")))
    assert(keptA.isEmpty && totalA == 4)
    assert(readSkipping(spark, dir2, Seq(NotNullPred("x"))).count() == 0)
    // ...and IS NULL keeps them (sound both ways on degenerate stats)
    assert(readSkipping(spark, dir2, Seq(NullPred("x"))).count() == 100)
  }

  test("zorderCode interleaves round-robin from the high column") {
    // k=3, bits=2: a=0b10, b=0b01, c=0b11 →
    // i=0: a0=0@pos2, b0=1@pos1, c0=1@pos0; i=1: a1=1@pos5, b1=0@pos4,
    // c1=1@pos3 → 0b101011 = 43
    val got = spark.range(1).select(
      zorderCode(Seq(lit(2L), lit(1L), lit(3L)), 2).as("z"))
      .head().getLong(0)
    assert(got == 43L)
    // 2-col case agrees with the legacy pairwise mortonCode
    val df = spark.range(64).select((col("id") % 8).as("x"),
      (col("id") / 8).cast("long").as("y"))
    val pair = df.select(Sinks.mortonCode(col("x"), col("y"), 3).as("m"),
      zorderCode(Seq(col("x"), col("y")), 3).as("z"))
    assert(pair.filter(col("m") =!= col("z")).count() == 0)
  }

  test("rankBucket is monotone, bounded, and sends nulls to bucket 0") {
    val df = spark.range(1000).select(
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id")).as("v"))
    val b = df.select(col("v"), rankBucket(df, "v", 4).as("bk"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1)))
    assert(b.forall { case (_, bk) => bk >= 0 && bk < 16 })
    assert(b.filter(_._1 == -1L).forall(_._2 == 0L))
    val nonNull = b.filter(_._1 >= 0).sortBy(_._1)
    assert(nonNull.sliding(2).forall {
      case Array((_, b1), (_, b2)) => b1 <= b2; case _ => true })
    // quantile buckets spread a uniform domain across most of the range
    assert(nonNull.map(_._2).distinct.length >= 12)
  }

  test("Z-order: ONE layout prunes box predicates on EITHER dimension") {
    val n = 64
    val grid = spark.range((n * n).toLong).select(
      (col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))
    val dir = tmp("skip_z")
    writeZOrdered(grid, dir, Seq("x", "y"), nFiles = 16, bits = 6)
    writeManifest(spark, dir, Seq("x", "y"))
    val box = Seq(RangePred("x", Some(8L), Some(15L)),
      RangePred("y", Some(8L), Some(15L)))
    val (kJoint, total) = prunedFiles(spark, dir, box)
    val (kX, _) = prunedFiles(spark, dir, box.take(1))
    val (kY, _) = prunedFiles(spark, dir, box.drop(1))
    assert(total == 16)
    // a 1/8-per-dim box: single-dim preds each prune, the joint box
    // prunes hardest — the property a 1-D sort cannot give both of
    assert(kX.size < total && kY.size < total, s"x=${kX.size} y=${kY.size}")
    assert(kJoint.size <= math.min(kX.size, kY.size))
    assert(kJoint.size * 3 <= total, s"joint kept ${kJoint.size}")
    // and the read is still exact
    assert(readSkipping(spark, dir, box).count() == 64)
  }

  test("OPTIMIZE ZORDER BY: content-preserving, manifest-building, owned-only") {
    val exec = new graft.exec.Executor(spark,
      Map("ev" -> sample(300).withColumnRenamed("id", "event_id")))
    val base = java.nio.file.Files.createTempDirectory("graft_optspec").toString
    exec.setBasepath(base)
    exec.execute("CREATE TABLE pev WITH (persist 'parquet') AS " +
      "select event_id, a, b from ev")
    val before = collectSet(exec.query(
      "select * from pev where a between 5 and 9"))
    exec.execute("OPTIMIZE pev ZORDER BY (a, b) WITH (files '6')")
    assert(exec.lastCommandTag.exists(_.startsWith("OPTIMIZE")))
    assert(collectSet(exec.query(
      "select * from pev where a between 5 and 9")) == before)
    // the rewrite built a skipping manifest over the zorder columns
    val p = s"$base/pev.parquet"
    val m = readManifest(spark, p).get
    assert(Seq("a__min", "a__max", "b__nulls").forall(m.columns.contains))
    assert(dataFiles(spark, p).size <= 6)
    // ndv/hll dialect options build those stat sets (r18)
    exec.execute("OPTIMIZE pev WITH (files '4', ndv 'a', hll 'a')")
    val mN = readManifest(spark, p).get
    assert(Seq("a__ndv", "a__hll").forall(mN.columns.contains),
      s"ndv/hll options ignored: ${mN.columns.mkString(",")}")
    assert(Skipping.metadataApproxDistinct(spark, p, "a").isDefined)
    // plain OPTIMIZE (bin-pack) keeps the manifest's column set alive —
    // INCLUDING the ndv/hll stat sets (r18: previously dropped by the
    // post-swap rebuild)
    exec.execute("OPTIMIZE pev WITH (files '1')")
    val m2 = readManifest(spark, p).get
    assert(Seq("a__min", "b__min", "a__ndv", "a__hll")
      .forall(m2.columns.contains),
      s"rewrite lost stat sets: ${m2.columns.mkString(",")}")
    assert(dataFiles(spark, p).size == 1)
    assert(collectSet(exec.query(
      "select * from pev where a between 5 and 9")) == before)
    assert(Skipping.metadataApproxDistinct(spark, p, "a").isDefined,
      "approx-distinct must still answer after the rewrite")
    // not path-backed → refuse
    val e1 = intercept[graft.compiler.CompileException](
      exec.execute("OPTIMIZE ev"))
    assert(e1.getMessage.contains("not path-backed"))
    // attached (not written) storage → refuse: COPY FROM the files the
    // CTAS persisted, into a NEW session that never wrote them
    val exec2 = new graft.exec.Executor(spark, Map.empty)
    exec2.setBasepath(base)
    exec2.execute("COPY att FROM 'pev.parquet' WITH format 'parquet'")
    val e2 = intercept[graft.compiler.CompileException](
      exec2.execute("OPTIMIZE att"))
    assert(e2.getMessage.contains("refusing to rewrite"))
  }

  test("in-place rewrite under a stable name is read, not pruned") {
    // the appendEpoch replay-repair shape: a crashed batch's replay may
    // redistribute rows across the SAME deterministic file names — the
    // manifest entry's (bytes, mtime) identity gate must keep skipping
    // sound without any refresh having run
    val dir = tmp("skip_rewrite")
    sample(500).repartitionByRange(8, col("a")).sortWithinPartitions("a")
      .write.parquet(dir)
    writeManifest(spark, dir, Seq("a"))
    // victim: the file whose stats say a starts at 0
    val victim = readManifest(spark, dir).get
      .filter(col("a__min") === 0L).select("file").head().getString(0)
    // overwrite it in place with rows the old stats would prune (a=45)
    val stage = java.nio.file.Files.createTempDirectory("skip_repl")
    spark.range(20).select((col("id") + 100000L).as("id"), lit(45L).as("a"),
        lit(1.0).as("b"), lit("zz").as("s"))
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(stage.toString)
    val part = new java.io.File(stage.toString).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(dir, victim),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop the local FS's checksum sidecar for the replaced bytes (a
    // real replay writes through the Hadoop FS, which re-creates it)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, s".$victim.crc"))
    // sample(500): a = id/10, so a=45 has 10 original rows + 20 planted
    val preds = Seq(EqPred("a", 45L))
    val (kept, _) = prunedFiles(spark, dir, preds)
    assert(kept.contains(victim), "identity-drifted file must be kept")
    assert(readSkipping(spark, dir, preds).count() == 30)
    // the automatic optimizer-rule path honors the same identity gate
    assert(spark.read.parquet(dir).filter(col("a") === 45L).count() == 30)
    // refresh restats exactly the drifted file (out once, in once)...
    assert(refreshManifest(spark, dir, Seq("a")) == ((1L, 1L)))
    // ...after which pruning bites again: victim holds only a=45 now,
    // so a=0 (previously victim's range) prunes it and finds nothing
    val (kept0, total0) = prunedFiles(spark, dir, Seq(EqPred("a", 0L)))
    assert(!kept0.contains(victim) && kept0.size < total0)
    assert(readSkipping(spark, dir, Seq(EqPred("a", 0L))).count() == 0)
  }

  test("Z-order rejects non-rankable column types loudly") {
    val df = sample(50)
    val e = intercept[IllegalArgumentException](
      writeZOrdered(df, tmp("zfail"), Seq("s"), nFiles = 2))
    assert(e.getMessage.contains("numeric/date/timestamp"))
    val e2 = intercept[IllegalArgumentException](rankBucket(df, "s", 4))
    assert(e2.getMessage.contains("'s'"))
  }

  test("OPTIMIZE validates options and column types before any rename") {
    val exec = new graft.exec.Executor(spark,
      Map("src" -> sample(100).withColumnRenamed("id", "event_id")))
    val base = java.nio.file.Files.createTempDirectory("graft_optval").toString
    exec.setBasepath(base)
    exec.execute("CREATE TABLE pev WITH (persist 'parquet') AS " +
      "select event_id, a, b, s from src")
    val p = s"$base/pev.parquet"
    val filesBefore = dataFiles(spark, p).toSet
    def rejects(stmt: String, needle: String): Unit = {
      val e = intercept[graft.compiler.CompileException](exec.execute(stmt))
      assert(e.getMessage.contains(needle), s"$stmt → ${e.getMessage}")
    }
    rejects("OPTIMIZE pev ZORDER BY (s)", "numeric/date/timestamp")
    rejects("OPTIMIZE pev WITH (files 'lots')", "positive integer")
    rejects("OPTIMIZE pev WITH (files '0')", "positive")
    rejects("OPTIMIZE pev ZORDER BY (a, b) WITH (bits '40')", "1..16")
    // nothing was rewritten by any refused statement
    assert(dataFiles(spark, p).toSet == filesBefore)
    assert(exec.query("select count(1) as n from pev").head().getLong(0) == 100L)
  }

  test("OPTIMIZE re-opens derived views and preserves declared keys") {
    val exec = new graft.exec.Executor(spark,
      Map("src" -> sample(200).withColumnRenamed("id", "event_id")))
    val base = java.nio.file.Files.createTempDirectory("graft_optview").toString
    exec.setBasepath(base)
    exec.execute("CREATE TABLE pev WITH (persist 'parquet') AS " +
      "select event_id, a, b from src")
    // a LAZY view over the persisted table: its lineage pins the
    // pre-swap file list — OPTIMIZE must re-open it, not strand it
    exec.execute("CREATE TABLE v AS " +
      "select a, count(1) as n from pev group by a")
    exec.execute("CREATE TABLE child WITH (persist 'parquet') AS " +
      "select event_id as ref_id, a from pev")
    exec.execute("ALTER TABLE pev ADD PRIMARY KEY (event_id)")
    exec.execute(
      "ALTER TABLE child ADD FOREIGN KEY (ref_id) REFERENCES pev (event_id)")
    val vBefore = collectSet(exec.query("select * from v"))
    val keysBefore = collectSet(exec.query(
      "select conname, contype from pg_constraint"))
    assert(keysBefore.size == 2)
    exec.execute("OPTIMIZE pev ZORDER BY (a, b) WITH (files '4')")
    // the view still reads — against the swapped files (pre-fix this
    // threw FileNotFoundException from the dead pre-swap listing)
    assert(collectSet(exec.query("select * from v")) == vBefore)
    // content is unchanged by contract, so the declarations still hold
    assert(collectSet(exec.query(
      "select conname, contype from pg_constraint")) == keysBefore)
  }

  test("OPTIMIZE ZORDER on a subset keeps previously indexed columns") {
    val exec = new graft.exec.Executor(spark,
      Map("src" -> sample(200).withColumnRenamed("id", "event_id")))
    val base = java.nio.file.Files.createTempDirectory("graft_optsub").toString
    exec.setBasepath(base)
    exec.execute("CREATE TABLE pev WITH (persist 'parquet') AS " +
      "select event_id, a, b from src")
    exec.execute("OPTIMIZE pev ZORDER BY (a, b) WITH (files '4')")
    val p = s"$base/pev.parquet"
    assert(Seq("a__min", "b__min").forall(
      readManifest(spark, p).get.columns.contains))
    // re-clustering on a alone must not silently stop pruning on b
    exec.execute("OPTIMIZE pev ZORDER BY (a) WITH (files '4')")
    assert(Seq("a__min", "b__min").forall(
      readManifest(spark, p).get.columns.contains))
  }

  test("bloom sidecar prunes point lookups interval stats cannot") {
    val dir = tmp("skip_bloom")
    // deliberately UNCLUSTERED: every file spans ~the full id range,
    // so min/max pruning is useless on the high-cardinality column
    val df = sample(2000)
    df.repartition(16).write.parquet(dir)
    writeManifest(spark, dir, Seq("id"), bloomCols = Seq("id"))
    val eq = Seq(EqPred("id", 1234L))
    val (kept, total) = prunedFiles(spark, dir, eq)
    assert(total == 16 && kept.size * 2 <= total,
      s"bloom kept ${kept.size} of $total")
    assert(readSkipping(spark, dir, eq).count() == 1)
    // absent value: possibly some false-positive keeps, result exact
    assert(readSkipping(spark, dir, Seq(EqPred("id", 999999L))).count() == 0)
    // randomized IN-list differential (present + absent values mixed)
    val rnd = new scala.util.Random(7)
    val full = spark.read.parquet(dir)
    for (_ <- 1 to 10) {
      val vs = Seq.fill(3)(rnd.nextLong(2500))
      val p = Seq(InPred("id", vs))
      assert(collectSet(readSkipping(spark, dir, p))
        == collectSet(full.filter(predColumn(p))))
    }
    // the automatic optimizer-rule path prunes via the same sidecar
    val nf = scannedFiles(spark.read.parquet(dir)
      .filter(col("id") === 1234L))
    assert(nf * 2 <= total, s"auto path scanned $nf of $total")
    // DISTRIBUTED probe path (tables too large for driver-held
    // filters): force the threshold to 1 and re-check both the
    // pruning decision and the result — identical either way
    System.setProperty("graft.skipping.bloomDriverMaxFiles", "1")
    try {
      val (keptD, totalD) = prunedFiles(spark, dir, eq)
      assert(totalD == 16 && keptD.size * 2 <= totalD,
        s"distributed bloom kept ${keptD.size} of $totalD")
      assert(keptD.toSet == kept.toSet,
        "driver and distributed probes must agree")
      assert(readSkipping(spark, dir, eq).count() == 1)
    } finally System.clearProperty("graft.skipping.bloomDriverMaxFiles")
  }

  test("bloom on strings prunes; unsound literal coercion keeps all") {
    val dir = tmp("skip_bloom_str")
    val df = spark.range(2000).select(col("id"),
      concat(lit("u"), col("id").cast("string")).as("u"))
    df.repartition(16).write.parquet(dir)
    writeManifest(spark, dir, Seq("u"), bloomCols = Seq("u"))
    val eq = Seq(EqPred("u", "u1234"))
    val (kept, total) = prunedFiles(spark, dir, eq)
    assert(kept.size * 2 <= total, s"string bloom kept ${kept.size}")
    assert(readSkipping(spark, dir, eq).count() == 1)
    // a DOUBLE literal on a LONG column coerces the COLUMN side for the
    // row comparison — a hash probe of cast(v as long) cannot mirror
    // that, so the bloom must stand down (prune nothing by hash) while
    // the result stays exact
    val dir2 = tmp("skip_bloom_coerce")
    spark.range(2000).select(col("id"), lit(1.0).as("w"))
      .repartition(16).write.parquet(dir2)
    writeManifest(spark, dir2, Seq("id"), bloomCols = Seq("id"))
    val unsound = Seq(EqPred("id", 1234.0d))
    val (keptU, totalU) = prunedFiles(spark, dir2, unsound)
    // interval stats may not prune (files span the full range) and the
    // bloom must not either — 1234.0 hashes differently than 1234L
    assert(keptU.size == totalU, "unsound coercion must not bloom-prune")
    assert(collectSet(readSkipping(spark, dir2, unsound)) ==
      collectSet(spark.read.parquet(dir2).filter(predColumn(unsound))))
    assert(readSkipping(spark, dir2, unsound).count() == 1)
  }

  test("refreshManifest builds blooms for the delta files too") {
    val dir = tmp("skip_bloom_ref")
    sample(1000).repartition(8).write.parquet(dir)
    writeManifest(spark, dir, Seq("id"), bloomCols = Seq("id"))
    // append a file with ids far outside the original domain
    spark.range(50).select((col("id") + 50000L).as("id"),
        lit(0L).as("a"), lit(0.0).as("b"), lit("x").as("s"))
      .coalesce(1).write.mode(SaveMode.Append).parquet(dir)
    val (added, removed) =
      refreshManifest(spark, dir, Seq("id"), bloomCols = Seq("id"))
    assert(added == 1L && removed == 0L)
    // the appended file's bloom answers point lookups on its ids
    val p = Seq(EqPred("id", 50007L))
    val (kept, total) = prunedFiles(spark, dir, p)
    assert(kept.size * 2 <= total, s"kept ${kept.size} of $total")
    assert(readSkipping(spark, dir, p).count() == 1)
  }

  test("OPTIMIZE WITH (index, bloom): manifests from SQL, unknown keys refused") {
    val exec = new graft.exec.Executor(spark,
      Map("src" -> spark.range(2000).select(col("id").as("event_id"),
        (col("id") % 10).as("a"), (col("id") % 7).cast("double").as("b"))))
    val base = java.nio.file.Files.createTempDirectory("graft_optbloom").toString
    exec.setBasepath(base)
    exec.execute("CREATE TABLE pev WITH (persist 'parquet') AS " +
      "select event_id, a, b from src")
    exec.execute(
      "OPTIMIZE pev WITH (files '16', index 'a', bloom 'event_id')")
    val p = s"$base/pev.parquet"
    val m = readManifest(spark, p).get
    assert(Seq("a__min", "event_id__min").forall(m.columns.contains),
      m.columns.mkString(","))
    // bloom bytes live in the per-column sidecar, not the stats manifest
    assert(bloomColumns(spark, p) == Seq("event_id"))
    // point lookup through the dialect prunes via the bloom (bin-packed
    // layout has no event_id clustering; min/max alone cannot do this)
    // (bare OPTIMIZE bin-packs via coalesce, which cannot RAISE the
    // partition count — total is min(files, source partitions))
    val (kept, total) = prunedFiles(spark, p,
      Seq(EqPred("event_id", 1234L)))
    assert(total > 1 && kept.size * 2 <= total,
      s"dialect bloom kept ${kept.size} of $total")
    assert(exec.query(
      "select count(1) as n from pev where event_id = 1234")
      .head().getLong(0) == 1L)
    // a later ZORDER rewrite carries the bloom sidecar forward
    exec.execute("OPTIMIZE pev ZORDER BY (a, b) WITH (files '8')")
    assert(bloomColumns(spark, p) == Seq("event_id"))
    val e = intercept[graft.compiler.CompileException](
      exec.execute("OPTIMIZE pev WITH (shiny 'yes')"))
    assert(e.getMessage.contains("unknown option 'shiny'"))
  }

  test("zero-row files get manifest rows; refresh converges") {
    val dir = tmp("skip_zero")
    sample(100).repartition(4).write.parquet(dir)
    // an empty epoch's write shape: a schema-only parquet file
    sample(100).limit(0).coalesce(1)
      .write.mode(SaveMode.Append).parquet(dir)
    writeManifest(spark, dir, Seq("a"), bloomCols = Seq("a"))
    val files = dataFiles(spark, dir)
    assert(readManifest(spark, dir).get.count() == files.size,
      "every live file, including the zero-row one, gets a row")
    // convergence: nothing changed → nothing restatted (pre-fix, the
    // zero-row file was re-'added' and the manifest rewritten forever)
    assert(refreshManifest(spark, dir, Seq("a"), Seq("a")) == ((0L, 0L)))
    // pruning remains sound with the null-stat row present
    val p = Seq(EqPred("a", 5L))
    assert(collectSet(readSkipping(spark, dir, p)) ==
      collectSet(spark.read.parquet(dir).filter(predColumn(p))))
  }

  test("bits outside 1..16 are rejected before any work") {
    val df = sample(100)
    val e = intercept[IllegalArgumentException](rankBucket(df, "a", 31))
    assert(e.getMessage.contains("1..16"))
    intercept[IllegalArgumentException](
      writeZOrdered(df, tmp("zbits"), Seq("a"), nFiles = 2, bits = 17))
    val exec = new graft.exec.Executor(spark, Map("src" -> sample(100)))
    val base = java.nio.file.Files.createTempDirectory("graft_optbits").toString
    exec.setBasepath(base)
    exec.execute("CREATE TABLE pev WITH (persist 'parquet') AS " +
      "select id, a from src")
    val ce = intercept[graft.compiler.CompileException](
      exec.execute("OPTIMIZE pev ZORDER BY (a) WITH (bits '31')"))
    assert(ce.getMessage.contains("1..16"))
    // the 60-bit interleave budget now binds only at >= 4 columns
    val exec2 = new graft.exec.Executor(spark, Map("s4" ->
      sample(100).select(col("id"), col("a"), col("b"),
        (col("id") % 3).as("c"))))
    exec2.setBasepath(
      java.nio.file.Files.createTempDirectory("graft_opt60").toString)
    exec2.execute("CREATE TABLE p4 WITH (persist 'parquet') AS " +
      "select id, a, b, c from s4")
    val ce2 = intercept[graft.compiler.CompileException](
      exec2.execute("OPTIMIZE p4 ZORDER BY (id, a, b, c) WITH (bits '16')"))
    assert(ce2.getMessage.contains("60-bit"))
  }

  test("OPTIMIZE re-opens subquery-only references and re-persists stats") {
    val exec = new graft.exec.Executor(spark,
      Map("src" -> sample(300).withColumnRenamed("id", "event_id"),
        "other" -> sample(50).withColumnRenamed("id", "event_id")))
    val base = java.nio.file.Files.createTempDirectory("graft_optsubq").toString
    exec.setBasepath(base)
    exec.execute("CREATE TABLE pev WITH (persist 'parquet') AS " +
      "select event_id, a, b from src")
    // pev appears ONLY inside a scalar subquery of this lazy view —
    // a plain plan transform never descends there
    exec.execute("CREATE TABLE v AS select count(1) as n from other " +
      "where a <= (select max(a) from pev)")
    exec.execute("ANALYZE pev")
    val before = exec.query("select * from v").head().getLong(0)
    exec.execute("OPTIMIZE pev ZORDER BY (a, b) WITH (files '4')")
    assert(exec.query("select * from v").head().getLong(0) == before)
    // the swap deleted the ANALYZE sidecar — OPTIMIZE must re-persist
    // it so a fresh session re-attaching keeps the measured stats
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      s"$base/pev.parquet/_graft_stats.json")),
      "stats sidecar must survive OPTIMIZE")
  }

  test("cache lifecycle: deleted tables evict; bloom bound accounts bytes x columns") {
    val dir = tmp("skip_evict")
    sample(200).repartition(4).write.parquet(dir)
    writeManifest(spark, dir, Seq("a"), bloomCols = Seq("a"))
    // populate the planning cache (stats + lazily-loaded blooms)
    val p = Seq(EqPred("a", 5L))
    assert(droppedFiles(spark, dir, p).isDefined)
    assert(Skipping.cachedTables.contains(dir))
    // table deleted behind the JVM's back → once the probe TTL lapses
    // (zeroed here; default 10 s) the next probe answers None AND
    // self-evicts the dead entry instead of holding it forever
    val hp = new org.apache.hadoop.fs.Path(dir)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    sys.props("graft.skipping.probeTtlMs") = "0"
    try {
      assert(droppedFiles(spark, dir, p).isEmpty)
      assert(!Skipping.cachedTables.contains(dir),
        "dead table's cache entry survived the probe")
    } finally sys.props.remove("graft.skipping.probeTtlMs")
    // explicit eviction hook (DROP TABLE) — exercised via the dialect
    val exec = new graft.exec.Executor(spark, Map("src" -> sample(100)))
    val base = java.nio.file.Files.createTempDirectory("graft_evictsql").toString
    exec.setBasepath(base)
    exec.execute("CREATE TABLE pev WITH (persist 'parquet') AS " +
      "select id, a from src")
    val pth = s"$base/pev.parquet"
    writeManifest(spark, pth, Seq("a"))
    assert(droppedFiles(spark, pth, p).isDefined)
    assert(Skipping.cachedTables.contains(pth))
    exec.execute("DROP TABLE pev")
    assert(!Skipping.cachedTables.contains(pth),
      "DROP TABLE left the skipping cache entry resident")
    // the driver-filter budget is bytes-accounted: ~1 GiB / ~117 KB ≈
    // 8-9k files at one bloom column, HALVED at two columns
    val one = Skipping.bloomDriverLimitFiles(1)
    val two = Skipping.bloomDriverLimitFiles(2)
    assert(one >= 7000 && one <= 10000, s"1-col limit $one")
    assert(math.abs(two * 2 - one) <= 1, s"2-col limit $two vs $one")
    assert(Skipping.bloomFilterBytes > 100000 &&
      Skipping.bloomFilterBytes < 140000)
  }

  test("bloom staging debris and orphan sidecars never wedge maintenance") {
    val dir = tmp("skip_phantom")
    sample(100).repartition(2).write.parquet(dir)
    writeManifest(spark, dir, Seq("id"), bloomCols = Seq("id"))
    // staging debris — both the in-root legacy shape and the current
    // outside-the-root location — must never surface as a column name:
    // a phantom column would poison every downstream statsFor call
    new java.io.File(s"$dir/${Skipping.BloomDir}/id__staged").mkdirs()
    new java.io.File(s"$dir/${Skipping.BloomDir}__staged_id").mkdirs()
    assert(bloomColumns(spark, dir) == Seq("id"))
    assert(refreshManifest(spark, dir, Seq("id"), Seq("id")) == ((0L, 0L)))
    // orphan sidecar with NO manifest (writeManifest crashed between
    // the sidecar write and the stats write): the ingest-discovery
    // shape — blooms from the sidecar unioned into the stat set — must
    // rebuild cleanly instead of wedging on the subset require
    val dir2 = tmp("skip_orphan")
    sample(100).repartition(2).write.parquet(dir2)
    writeManifest(spark, dir2, Seq("id"), bloomCols = Seq("id"))
    val mp = new org.apache.hadoop.fs.Path(s"$dir2/${Skipping.ManifestDir}")
    mp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(mp, true)
    val blooms = bloomColumns(spark, dir2)
    assert(blooms == Seq("id"))
    val (a, r) =
      refreshManifest(spark, dir2, (Seq("a") ++ blooms).distinct, blooms)
    assert(a == 2L && r == 0L)
    assert(readSkipping(spark, dir2, Seq(EqPred("id", 7L))).count() == 1)
  }

  test("OPTIMIZE SQL surface: lease/epoch refusals as CompileExceptions, force folds") {
    val exec = new graft.exec.Executor(spark,
      Map("src" -> sample(200).withColumnRenamed("id", "event_id")))
    val base = java.nio.file.Files.createTempDirectory("graft_optlease").toString
    exec.setBasepath(base)
    exec.execute("CREATE TABLE pev WITH (persist 'parquet') AS " +
      "select event_id, a from src")
    val p = s"$base/pev.parquet"
    // a live writer's lease on the table → refuse before any rename
    Sinks.renewIngestLease(spark, p, "some-stream")
    val e1 = intercept[graft.compiler.CompileException](
      exec.execute("OPTIMIZE pev WITH (files '2')"))
    assert(e1.getMessage.contains("live lease"), e1.getMessage)
    // dead writer (expired lease) + epoch-tagged files → refuse with
    // force guidance; WITH (force 'true') proceeds and folds the tags
    System.setProperty("graft.ingest.leaseTtlMs", "1")
    try {
      Sinks.appendEpoch(sample(20).withColumnRenamed("id", "event_id")
        .select(col("event_id"), col("a")), p, 7L)
      val e2 = intercept[graft.compiler.CompileException](
        exec.execute("OPTIMIZE pev WITH (files '2')"))
      assert(e2.getMessage.contains("force"), e2.getMessage)
      // the scope frame's lineage pins the pre-append file list; the
      // path read sees the epoch rows too (220) — OPTIMIZE folds them
      // and rebinds, so afterwards BOTH surfaces agree at 220
      val before = spark.read.parquet(p).count()
      exec.execute("OPTIMIZE pev WITH (files '2', force 'true')")
      assert(exec.query("select count(1) as n from pev")
        .head().getLong(0) == before)
      assert(!Sinks.hasRecoverableEpochFiles(spark, p))
    } finally System.clearProperty("graft.ingest.leaseTtlMs")
  }

  private def visibleParquets(dir: String): Map[String, (Long, Long)] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Map.empty
    else d.listFiles().filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
  }

  test("segmented manifest: refresh appends a delta segment, never a rewrite") {
    val dir = tmp("skip_seg")
    sample(200).repartition(4).write.parquet(dir)
    writeManifest(spark, dir, Seq("a", "id"), bloomCols = Seq("id"))
    val manifestDir = s"$dir/${Skipping.ManifestDir}"
    val bloomDir = s"$dir/${Skipping.BloomDir}/id"
    val base = visibleParquets(manifestDir)
    val bloomBase = visibleParquets(bloomDir)
    assert(base.nonEmpty && bloomBase.nonEmpty)
    // delta append + refresh: base segment files BYTE-UNTOUCHED, one
    // new stats segment, one new bloom segment — the write is O(delta)
    sample(60).withColumn("a", col("a") + 900).repartition(2)
      .write.mode(SaveMode.Append).parquet(dir)
    assert(refreshManifest(spark, dir, Seq("a", "id"), Seq("id")) == ((2L, 0L)))
    val after = visibleParquets(manifestDir)
    val bloomAfter = visibleParquets(bloomDir)
    base.foreach { case (n, id) => assert(after.get(n).contains(id),
      s"stats segment $n was rewritten by a delta refresh") }
    bloomBase.foreach { case (n, id) => assert(bloomAfter.get(n).contains(id),
      s"bloom sidecar $n was rewritten by a delta refresh") }
    assert(after.size == base.size + 1 && bloomAfter.size == bloomBase.size + 1)
    // removal-only refresh: a tombstone segment appends; the bloom
    // sidecar is NOT touched at all (stat-only refreshes never rewrite
    // filter bytes — the r13 scale residual)
    val victim = dataFiles(spark, dir).head
    val vp = new org.apache.hadoop.fs.Path(s"$dir/$victim")
    vp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(vp, false)
    assert(refreshManifest(spark, dir, Seq("a", "id"), Seq("id")) == ((0L, 1L)))
    assert(visibleParquets(bloomDir) == bloomAfter,
      "a removal-only refresh touched the bloom sidecar")
    // the folded live view converged: one row per live file, gone file out
    val m = readManifest(spark, dir).get
    assert(m.count() == dataFiles(spark, dir).size)
    assert(m.filter(col("file") === victim).count() == 0)
  }

  test("segmented manifest: pruning equal across states; fold compacts and preserves") {
    System.setProperty("graft.skipping.manifestFoldSegments", "4")
    try {
      val dir = tmp("skip_fold")
      sample(300).repartitionByRange(6, col("a")).sortWithinPartitions("a")
        .write.parquet(dir)
      writeManifest(spark, dir, Seq("a", "id"), bloomCols = Seq("id"))
      val preds = Seq(RangePred("a", Some(5L), Some(14L)))
      val point = Seq(EqPred("id", 123L))
      val expectRange = collectSet(spark.read.parquet(dir)
        .filter(predColumn(preds)))
      // several delta refreshes push past the fold threshold mid-loop
      for (i <- 1 to 6) {
        sample(30).withColumn("a", col("a") + lit(1000L * i))
          .coalesce(1).write.mode(SaveMode.Append).parquet(dir)
        val (a, r) = refreshManifest(spark, dir, Seq("a", "id"), Seq("id"))
        assert(a == 1L && r == 0L)
        // pruning answers stay exact in EVERY segmented state
        assert(collectSet(readSkipping(spark, dir, preds)) == expectRange)
        assert(readSkipping(spark, dir, point).count() == 1)
      }
      // the fold fired: segments collapsed below the threshold
      val manifestDir = s"$dir/${Skipping.ManifestDir}"
      assert(visibleParquets(manifestDir).size <= 4,
        s"fold never fired: ${visibleParquets(manifestDir).keys}")
      // ...and still prunes effectively (clustered head files drop)
      val (kept, total) = prunedFiles(spark, dir, preds)
      assert(kept.size < total, s"kept ${kept.size} of $total after fold")
      assert(readManifest(spark, dir).get.count() ==
        dataFiles(spark, dir).size)
    } finally System.clearProperty("graft.skipping.manifestFoldSegments")
  }

  test("segmented manifest: crash debris around the fold is survivable") {
    val dir = tmp("skip_foldcrash")
    sample(150).repartition(3).write.parquet(dir)
    writeManifest(spark, dir, Seq("a"))
    // crash AFTER a fold's staged write, BEFORE the swap: staged dir
    // sits fully populated with different content — the next fold must
    // overwrite it, and reads meanwhile see the live manifest
    val staged = s"$dir/${Skipping.ManifestDir}__staged"
    Seq((1L, "junk")).toDF("a", "b").write.parquet(staged)
    sample(30).withColumn("a", col("a") + 500).coalesce(1)
      .write.mode(SaveMode.Append).parquet(dir)
    assert(refreshManifest(spark, dir, Seq("a")) == ((1L, 0L)))
    foldManifest(spark, dir)
    assert(!new java.io.File(staged).exists(), "staged debris not consumed")
    val preds = Seq(RangePred("a", Some(500L), None))
    assert(collectSet(readSkipping(spark, dir, preds)) ==
      collectSet(spark.read.parquet(dir).filter(predColumn(preds))))
    // crash BETWEEN delete(live) and rename: manifest gone entirely —
    // refresh must degrade to a full rebuild, not wedge
    val mp = new org.apache.hadoop.fs.Path(s"$dir/${Skipping.ManifestDir}")
    mp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(mp, true)
    val (a, r) = refreshManifest(spark, dir, Seq("a"))
    assert(a == dataFiles(spark, dir).size.toLong && r == 0L)
    assert(collectSet(readSkipping(spark, dir, preds)) ==
      collectSet(spark.read.parquet(dir).filter(predColumn(preds))))
  }

  test("bloom sidecar GC keeps only live identities; shadowed rows never prune") {
    System.setProperty("graft.skipping.manifestFoldSegments", "3")
    try {
      val dir = tmp("skip_bloomgc")
      val mk = (lo: Long) => spark.range(lo, lo + 100)
        .select(col("id"), (col("id") % 10).as("a"),
          lit(0.0).as("b"), lit("x").as("s"))
      mk(0).repartition(2).write.parquet(dir)
      writeManifest(spark, dir, Seq("id"), bloomCols = Seq("id"))
      for (i <- 1 to 5) {
        mk(i * 1000L).coalesce(1).write.mode(SaveMode.Append).parquet(dir)
        refreshManifest(spark, dir, Seq("id"), Seq("id"))
      }
      val bloomDir = s"$dir/${Skipping.BloomDir}/id"
      // the bloom GC ran on fold cadence: sidecar segments bounded
      assert(visibleParquets(bloomDir).size <= 3,
        s"bloom GC never fired: ${visibleParquets(bloomDir).keys}")
      // point lookups still prune and stay exact after GC
      val p = Seq(EqPred("id", 3007L))
      val (kept, total) = prunedFiles(spark, dir, p)
      assert(kept.size * 2 <= total, s"kept ${kept.size} of $total")
      assert(readSkipping(spark, dir, p).count() == 1)
      assert(readSkipping(spark, dir, Seq(EqPred("id", 999999L))).count() == 0)
    } finally System.clearProperty("graft.skipping.manifestFoldSegments")
  }

  test("skipping under hive partitioning keeps partition columns intact") {
    val dir = tmp("skip_hive")
    sample(200).withColumn("pt", (col("a") % 3).cast("int"))
      .write.partitionBy("pt").parquet(dir)
    writeManifest(spark, dir, Seq("a", "pt"))
    val preds = Seq(RangePred("pt", Some(1), Some(1)),
      RangePred("a", Some(0L), Some(9L)))
    val full = spark.read.parquet(dir).filter(predColumn(preds))
    val got = readSkipping(spark, dir, preds)
    assert(got.columns.contains("pt"))
    assert(collectSet(got) == collectSet(full))
    val (kept, total) = prunedFiles(spark, dir, preds)
    assert(kept.size < total) // partition-column stats prune too
  }
}
