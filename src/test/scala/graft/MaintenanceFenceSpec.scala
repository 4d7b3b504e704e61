package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Sinks, Skipping}

/** The batch-maintenance writer fence (VERDICT r15 queue #1): OPTIMIZE,
  * batch refreshManifest, foldManifest, writeManifest and
  * compactParquet mutate the table/manifest and must hold the SAME
  * lease the streaming ingest holds — two concurrent maintainers from
  * different JVMs would interleave compactParquet's staged swap
  * (shared `__compact`/`__old` staging names) and can destroy data
  * files, and two concurrent refreshes can append colliding `__seq`
  * segments. Plus the collision BACKSTOP: the fold detects duplicate
  * (file, seq) rows — only possible from colliding writers — and
  * degrades to a full rebuild from the listing. Plus the r15 VERDICT
  * nit #2: a successful top-k bound derivation runs entirely
  * driver-side, zero Spark jobs. */
class MaintenanceFenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def rows(n: Int): DataFrame =
    spark.range(n).select(col("id").as("k"), (col("id") % 50).as("a"))

  private def table(prefix: String, files: Int = 4,
      n: Int = 400): String = {
    val dir = tmp(prefix)
    rows(n).repartition(files).write.parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("k", "a"))
    dir
  }

  // ---------------------------------------------------- lease fencing

  test("a foreign live lease refuses every batch maintenance entry point") {
    val dir = table("fence_refuse")
    // plant what another JVM's writer lease looks like on disk (renew,
    // not acquire — acquire would register it as OURS)
    Sinks.renewIngestLease(spark, dir, "other-jvm", "nonce-1")
    val ops: Seq[(String, () => Any)] = Seq(
      ("optimize", () => Skipping.optimize(spark, dir, Seq("k"), 2)),
      ("refreshManifest",
        () => Skipping.refreshManifest(spark, dir, Seq("k", "a"))),
      ("foldManifest", () => Skipping.foldManifest(spark, dir)),
      ("writeManifest",
        () => Skipping.writeManifest(spark, dir, Seq("k"))),
      ("compactParquet", () => Sinks.compactParquet(spark, dir)))
    ops.foreach { case (name, op) =>
      val e = intercept[IllegalStateException](op())
      assert(e.getMessage.contains("other-jvm"),
        s"$name should refuse naming the holder, got: ${e.getMessage}")
    }
    // the foreign lease survives every refusal (nothing released it)
    assert(Sinks.liveIngestLease(spark, dir).exists(_._1 == "other-jvm"))
    // holder goes away -> maintenance proceeds
    Sinks.releaseIngestLease(spark, dir, "other-jvm", "nonce-1")
    val (statted, _) = Skipping.refreshManifest(spark, dir, Seq("k", "a"))
    assert(statted == 0L) // nothing changed, but it RAN
  }

  test("maintenance holds a live lease for its duration and releases on exit") {
    val dir = table("fence_hold")
    assert(Sinks.liveIngestLease(spark, dir).isEmpty)
    val seen = Sinks.withTableMaintenance(spark, dir, "spec") {
      val inner = Sinks.liveIngestLease(spark, dir)
      // reentrancy: a nested frame runs inline instead of deadlocking
      // or refusing against our own lease
      val nested = Sinks.withTableMaintenance(spark, dir, "nested") {
        Sinks.liveIngestLease(spark, dir)
      }
      (inner, nested)
    }
    assert(seen._1.exists(_._1.startsWith("maintenance:spec")))
    assert(seen._2.exists(_._1.startsWith("maintenance:spec")),
      "the nested frame must run under the OUTER lease, not its own")
    assert(Sinks.liveIngestLease(spark, dir).isEmpty,
      "the lease must release on exit, not wait out the TTL")
  }

  test("maintenance releases its lease when the body throws") {
    val dir = table("fence_throw")
    intercept[RuntimeException] {
      Sinks.withTableMaintenance(spark, dir, "spec") {
        sys.error("boom")
      }
    }
    assert(Sinks.liveIngestLease(spark, dir).isEmpty)
  }

  test("a lease-holding writer's own cadence maintenance passes the fence") {
    val dir = table("fence_owner")
    // what tableIngest does at stream start
    Sinks.acquireIngestLease(spark, dir, "ckpt-lineage", "run-1")
    try {
      // the stream's own per-cadence reconcile: must NOT refuse against
      // the stream's own lease...
      val (statted, _) =
        Skipping.refreshManifest(spark, dir, Seq("k", "a"))
      assert(statted == 0L)
      Skipping.foldManifest(spark, dir)
      // ...and must NOT release it either (it is the STREAM's lease)
      assert(Sinks.liveIngestLease(spark, dir)
        .exists(_._1 == "ckpt-lineage"),
        "owner fast-path must leave the stream's lease in place")
    } finally Sinks.releaseIngestLease(spark, dir, "ckpt-lineage", "run-1")
    assert(Sinks.liveIngestLease(spark, dir).isEmpty)
  }

  test("optimize refuses a same-JVM stream lease (owner fast-path must not wave it through)") {
    val dir = table("fence_samejvm")
    Sinks.acquireIngestLease(spark, dir, "ckpt-lineage", "run-1")
    try {
      val e = intercept[IllegalStateException](
        Skipping.optimize(spark, dir, Seq("k"), 2))
      assert(e.getMessage.contains("ckpt-lineage"))
    } finally Sinks.releaseIngestLease(spark, dir, "ckpt-lineage", "run-1")
  }

  test("same-JVM maintainers serialize: two interleaved optimize calls never overlap") {
    val dir = table("fence_serial", files = 2, n = 200)
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxActive = new java.util.concurrent.atomic.AtomicInteger(0)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        try Sinks.withTableMaintenance(spark, dir, "spec") {
          val a = active.incrementAndGet()
          maxActive.updateAndGet(m => math.max(m, a))
          Thread.sleep(100)
          active.decrementAndGet()
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    assert(errs.isEmpty, s"serialized maintainers should both run: $errs")
    assert(maxActive.get() == 1,
      "two same-JVM maintenance frames overlapped")
    assert(Sinks.liveIngestLease(spark, dir).isEmpty)
  }

  // ------------------------------------------- seq-collision backstop

  test("fold detects duplicate (file, seq) rows from colliding writers and rebuilds") {
    val dir = table("fence_collide")
    val mdir = s"$dir/${Skipping.ManifestDir}"
    // forge what a collided writer leaves behind: a second row for an
    // existing (file, seq) pair with CONFLICTING stats — latest-wins
    // folding is ambiguous for that file from here on
    val raw = spark.read.parquet(mdir)
    val forged = raw.limit(1)
      .withColumn("mtime", col("mtime") + 999L)
      .withColumn("k__min", col("k__min") - 1000L)
    forged.write.mode("append").parquet(mdir)
    Skipping.evictTable(dir)
    val dupes = spark.read.parquet(mdir)
      .groupBy(col("file"), col(Skipping.SeqCol)).count()
      .filter(col("count") > 1).count()
    assert(dupes == 1L, "the forgery should be in place")
    Skipping.foldManifest(spark, dir)
    val after = spark.read.parquet(mdir)
    assert(after.groupBy(col("file"), col(Skipping.SeqCol)).count()
      .filter(col("count") > 1).count() == 0L,
      "fold must repair the collision")
    assert(after.agg(max(col(Skipping.SeqCol))).head().getLong(0) == 0L,
      "repair is a full REBUILD from the listing (base segment), " +
        "not a fold of the ambiguity")
    // the rebuilt stats are ground truth again: metadata agg answers
    // the real min (the forged k__min - 1000 is gone)
    val stats = Skipping.metadataAggStats(spark, dir, Seq("k"))
    assert(stats.exists { case (total, cs) =>
      total == 400L && cs("k").min == 0L && cs("k").max == 399L })
  }

  test("a clean fold (no collision) still compacts instead of rebuilding") {
    val dir = table("fence_cleanfold", files = 2, n = 200)
    // append a real segment so the fold has something to do
    rows(40).coalesce(1).write.mode("append").parquet(dir)
    Skipping.refreshManifest(spark, dir, Seq("k", "a"))
    Skipping.foldManifest(spark, dir)
    val after = spark.read.parquet(s"$dir/${Skipping.ManifestDir}")
    assert(after.groupBy("file").count().filter(col("count") > 1)
      .count() == 0L)
    // seq values PRESERVED by a clean fold (future appends still win)
    assert(after.agg(max(col(Skipping.SeqCol))).head().getLong(0) == 1L)
  }

  // --------------------------------------------- top-k without a job

  test("a successful top-k bound derivation launches zero Spark jobs") {
    import org.apache.spark.sql.types.LongType
    val dir = tmp("topk_nojob")
    // clustered on k so the bound is derivable
    rows(4000).repartitionByRange(8, col("k"))
      .sortWithinPartitions("k").write.parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("k"))
    val types = Map[String, org.apache.spark.sql.types.DataType](
      "k" -> LongType)
    // warm: first call loads the manifest cache (a bounded collect —
    // that one is allowed a job)
    assert(Skipping.topKFilterBound(spark, dir, "k", 10L, desc = true,
      nullsFirst = false, types).isDefined)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val bound = Skipping.topKFilterBound(spark, dir, "k", 10L,
        desc = true, nullsFirst = false, types)
      assert(bound.isDefined && bound.get.asInstanceOf[Long] >= 3000L,
        s"expected a tight high bound, got $bound")
      // flush the (async) listener bus with a sentinel job: events
      // deliver in order, so once the sentinel's start is counted any
      // derivation job would have been too. RDD API: exactly ONE job
      // (a SQL count would materialize 2 under AQE)
      spark.sparkContext.parallelize(Seq(1), 1).count()
      val deadline = System.currentTimeMillis() + 10000
      while (jobs.get() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(jobs.get() == 1,
        s"top-k derivation must be driver-side: saw ${jobs.get() - 1} " +
          "jobs beyond the sentinel")
    } finally spark.sparkContext.removeSparkListener(listener)
    // and the ascending direction agrees with a fresh derivation
    val lo = Skipping.topKFilterBound(spark, dir, "k", 10L,
      desc = false, nullsFirst = false, types)
    assert(lo.isDefined && lo.get.asInstanceOf[Long] <= 999L)
  }

  // -------------------------------- sum overflow-to-null (non-ANSI)

  test("non-ANSI decimal overflow in sum-of-sums declines instead of answering NULL") {
    val dir = table("fence_overflow", files = 2, n = 200)
    val mdir = s"$dir/${Skipping.ManifestDir}"
    // forge per-file sums near the decimal(38,0) ceiling so the TOTAL
    // overflows: under ANSI that throws (caught -> decline); under
    // non-ANSI it answers SQL NULL, which without the poison guard
    // reads as 'zero non-null rows'
    val big = new java.math.BigDecimal("9" + "0" * 37) // 9e37; 2x > 1e38
    val rowsRaw = spark.read.parquet(mdir).collect().toSeq
    val schema = rowsRaw.head.schema
    val i = schema.fieldIndex("k__sum")
    val forged = rowsRaw.map { r =>
      val vs = r.toSeq.toArray
      vs(i) = big
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        vs, schema): org.apache.spark.sql.Row
    }
    val f = new org.apache.hadoop.fs.Path(mdir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(mdir), true)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(forged.asJava, schema)
      .coalesce(1).write.parquet(mdir)
    Skipping.evictTable(dir)
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val stats = Skipping.metadataAggStats(spark, dir, Seq("k"))
      assert(stats.isDefined, "min/max/count still answer")
      val cs = stats.get._2("k")
      assert(cs.sum.isEmpty,
        s"overflow-to-null must DECLINE the sum, got ${cs.sum}")
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiWas)
  }

  // ------------------------------------------ rename-fenced release

  test("release is rename-fenced: a successor's lease survives a stale " +
      "release with nonce intact and no claim debris") {
    val dir = tmp("fence_release")
    new java.io.File(dir).mkdirs()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaseFiles(): Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith(Sinks.IngestLeaseFile)).toSeq.sorted
    }
    // old run holds, successor renews over it (same token = same
    // checkpoint lineage, fresh nonce)
    Sinks.renewIngestLease(spark, dir, "ck", "run-old")
    Sinks.renewIngestLease(spark, dir, "ck", "run-new")
    // the old run's dying heartbeat releases: the claim-inspect-restore
    // path must put the successor's lease BACK (not just skip the
    // delete — every release claims the file aside first, so this
    // exercises the restore branch deterministically)
    Sinks.releaseIngestLease(spark, dir, "ck", "run-old")
    assert(Sinks.liveIngestLease(spark, dir).exists(_._1 == "ck"),
      "successor's lease must survive a stale release")
    // restored byte-for-byte: the nonce is still the successor's, so
    // the successor's OWN release still works
    assert(leaseFiles() == Seq(Sinks.IngestLeaseFile),
      s"no .releasing claim debris may remain, got ${leaseFiles()}")
    Sinks.releaseIngestLease(spark, dir, "ck", "run-new")
    assert(Sinks.liveIngestLease(spark, dir).isEmpty,
      "the successor's nonce must still gate its own release")
    assert(leaseFiles().isEmpty, s"release left ${leaseFiles()}")
  }

  test("release recovers a crashed prior claim: the lease is restored " +
      "before re-inspection, not blindly deleted") {
    val dir = tmp("fence_claimcrash")
    new java.io.File(dir).mkdirs()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaseFiles(): Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith(Sinks.IngestLeaseFile)).toSeq.sorted
    }
    // a SUCCESSOR's live lease, claimed aside under the OLD run's claim
    // name — the state a crash between the old run's claim and restore
    // leaves behind (r17 ADVICE: the old sweep DELETED this claim, which
    // here is the only live copy of the successor's lease)
    Sinks.renewIngestLease(spark, dir, "ck", "run-new")
    val lp = new org.apache.hadoop.fs.Path(dir,
      Sinks.IngestLeaseFile)
    val claim = new org.apache.hadoop.fs.Path(dir,
      s"${Sinks.IngestLeaseFile}.releasing-${Integer.toHexString(
        ("ck" + " " + "run-old").hashCode)}")
    assert(fs.rename(lp, claim), "test setup: claim the lease aside")
    // the old run's release retries: restores the claim, re-inspects,
    // sees the successor's nonce, and leaves the lease LIVE
    Sinks.releaseIngestLease(spark, dir, "ck", "run-old")
    assert(Sinks.liveIngestLease(spark, dir).exists(_._1 == "ck"),
      "successor's lease must be restored from the crashed claim")
    assert(leaseFiles() == Seq(Sinks.IngestLeaseFile),
      s"claim debris after recovery: ${leaseFiles()}")
    // and when the crashed claim was the releaser's OWN lease, the
    // restored copy passes inspection and the release completes
    Sinks.renewIngestLease(spark, dir, "ck", "run-new")
    val claim2 = new org.apache.hadoop.fs.Path(dir,
      s"${Sinks.IngestLeaseFile}.releasing-${Integer.toHexString(
        ("ck" + " " + "run-new").hashCode)}")
    assert(fs.rename(lp, claim2), "test setup: claim the lease aside")
    Sinks.releaseIngestLease(spark, dir, "ck", "run-new")
    assert(Sinks.liveIngestLease(spark, dir).isEmpty,
      "own crashed claim must still release after restore")
    assert(leaseFiles().isEmpty, s"release left ${leaseFiles()}")
  }
}
