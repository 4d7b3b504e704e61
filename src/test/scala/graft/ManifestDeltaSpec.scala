package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Sinks, Skipping}
import graft.tools.CountingLocalFs

/** The O(delta) ingest-maintenance contract (VERDICT r15 queue #1):
  * per-trigger manifest upkeep on the OWNER path — appendEpoch's
  * reported delta fed to refreshManifestDelta — must cost a number of
  * filesystem metadata RPCs (listStatus = object-store LIST,
  * getFileStatus = HEAD) that is FLAT in the table's total file count
  * at fixed delta. Measured through [[graft.tools.CountingLocalFs]],
  * not inferred from wall-clock (a local FS lists ~for free, which is
  * exactly how the r14 O(total)-listing residual hid from ScaleProbe's
  * time-based exponent).
  */
class ManifestDeltaSpec extends AnyFunSuite {
  private lazy val spark = { // counting scheme installed once
    val s = TestSpark.session
    CountingLocalFs.install(s)
    s
  }

  private def tmp(prefix: String): String =
    "cfs:" + java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def rows(n: Int, off: Long): DataFrame =
    spark.range(off, off + n).select(
      col("id").as("k"), (col("id") % 50).as("a"),
      (col("id") % 7).cast("double").as("v"))

  /** Build a table of `files` base files with a manifest, then run
    * `triggers` owner-path epochs (appendEpoch → refreshManifestDelta,
    * exactly tableIngest's per-trigger sequence) and return the total
    * (lists, stats) RPC count over the triggers. */
  private def deltaRpcs(files: Int, triggers: Int): (Long, Long, Long) = {
    val dir = tmp(s"delta_rpc_$files")
    rows(files * 100, 0).repartition(files).write.parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("a", "k"))
    var epoch = 0L
    val out = collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    for (_ <- 1 to triggers) {
      val batch = rows(200, 1000000L + epoch * 10000L).coalesce(2)
        .localCheckpoint(true)
      CountingLocalFs.reset()
      val (added, removed) = Sinks.appendEpoch(batch, dir, epoch)
      assert(added.size == 2 && removed.isEmpty)
      assert(Skipping.refreshManifestDelta(spark, dir, Seq("a", "k"),
        Nil, added, removed), "owner state should be seeded")
      val (l, s) = CountingLocalFs.counts
      out += ((l, s, CountingLocalFs.listedEntries.get()))
      epoch += 1
    }
    (out.map(_._1).sum, out.map(_._2).sum, out.map(_._3).sum)
  }

  test("owner-path refresh RPCs are flat in total file count at fixed delta") {
    val (l1, s1, e1) = deltaRpcs(files = 8, triggers = 3)
    val (l2, s2, e2) = deltaRpcs(files = 64, triggers = 3)
    // the counts include the epoch write + rename + the 2-file stat job
    // + the appended manifest segment — all O(delta + manifest
    // segments). An O(total) listing anywhere would show 64-file counts
    // ~8x the 8-file counts. All THREE meters must stay flat: list
    // calls, HEAD-equivalents, and listed ENTRIES (the paging volume a
    // single huge-directory LIST hides from the call count).
    assert(l2 <= l1 * 2 && s2 <= s1 * 2 && e2 <= e1 * 2,
      s"delta refresh RPCs grew with table size: " +
        s"lists $l1 -> $l2, stats $s1 -> $s2, entries $e1 -> $e2")
    // ...and the counts are sane, not zero (the instrument is live)
    assert(l1 > 0 && s1 > 0 && e1 > 0)
  }

  test("full refreshManifest (the reconcile) DOES pay the listing — contrast") {
    val dir = tmp("reconcile_rpc")
    rows(6400, 0).repartition(64).write.parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("a"))
    CountingLocalFs.reset()
    Skipping.refreshManifest(spark, dir, Seq("a"))
    val entries = CountingLocalFs.listedEntries.get()
    // a recursive listing of the 64-file table: the reconcile's paging
    // volume scales with total files — the cadence cost the owner path
    // avoids per trigger (and the meter that proves the instrument sees
    // O(total) work when it happens)
    assert(entries >= 64, s"reconcile unexpectedly cheap: $entries entries")
  }

  test("oversized pruning: metadata RPCs flat in file count, nothing " +
      "cached on the driver") {
    // r17 VERDICT lead item, the RPC leg: past the stats driver cap the
    // keep/drop evaluation must not walk the table per file — its LIST
    // calls and paging volume stay O(manifest segments), flat while the
    // data file count grows 8x (the wall-clock leg is ScaleProbe's
    // skip_stats_cap; the no-collect contract is SkippingSpec's)
    def probe(files: Int): (Long, Long, Long) = {
      val dir = tmp(s"cap_rpc_$files")
      rows(files * 100, 0)
        .repartitionByRange(files, col("k")).sortWithinPartitions("k")
        .write.parquet(dir)
      Skipping.writeManifest(spark, dir, Seq("k"))
      sys.props("graft.skipping.statsDriverMaxBytes") = "1"
      try {
        Skipping.evictTable(dir)
        CountingLocalFs.reset()
        val drops = Skipping.droppedFiles(spark, dir,
          Seq(Skipping.RangePred("k", Some(0L), Some(49L))))
        assert(drops.exists(_.nonEmpty), "the cap path must still prune")
        assert(!Skipping.cachedTables.contains(dir))
        val (l, s) = CountingLocalFs.counts
        (l, s, CountingLocalFs.listedEntries.get())
      } finally {
        sys.props.remove("graft.skipping.statsDriverMaxBytes")
        Skipping.evictTable(dir)
      }
    }
    val (l1, s1, e1) = probe(8)
    val (l2, s2, e2) = probe(64)
    assert(l2 <= l1 * 2 && s2 <= s1 * 2 && e2 <= e1 * 2,
      s"oversized pruning RPCs grew with data file count: " +
        s"lists $l1 -> $l2, stats $s1 -> $s2, entries $e1 -> $e2")
    assert(l1 > 0 && e1 > 0)
  }

  test("out-of-band files are picked up at the cadence reconcile") {
    val dir = tmp("oob_reconcile")
    rows(400, 0).repartition(4).write.parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("a", "k"))
    // owner-path trigger
    val (added, removed) =
      Sinks.appendEpoch(rows(100, 5000).coalesce(1)
        .localCheckpoint(true), dir, 0L)
    assert(Skipping.refreshManifestDelta(spark, dir, Seq("a", "k"), Nil,
      added, removed))
    // an out-of-band writer drops a file the owner never saw: the delta
    // path cannot know it — it stays UNINDEXED (read, never pruned, and
    // the metadata rewrite declines on it), awaiting the reconcile
    rows(50, 9000).withColumn("k", col("k") + 0L).coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(dir)
    val preCount = Skipping.readManifest(spark, dir).get.count()
    def metaCount = spark.read.parquet(dir).agg(count(lit(1)).as("n"))
    assert(metaCount.head().getLong(0) == 550L,
      "out-of-band rows must be READ regardless of manifest state")
    assert(Skipping.scannedFiles(metaCount) > 0,
      "metadata rewrite must decline while a live file is unindexed")
    // the cadence reconcile (what tableIngest runs every reconcileEvery
    // epochs) lists for real and indexes the stranger
    val (a2, _) = Skipping.refreshManifest(spark, dir, Seq("a", "k"))
    assert(a2 == 1L, s"reconcile should stat exactly the stranger, got $a2")
    assert(Skipping.readManifest(spark, dir).get.count() == preCount + 1)
    assert(Skipping.scannedFiles(metaCount) == 0,
      "metadata path should resume once the reconcile indexed the file")
    assert(metaCount.head().getLong(0) == 550L)
  }

  test("delta refresh declines without owner state; reconcile seeds it") {
    val dir = tmp("owner_seed")
    rows(300, 0).repartition(3).write.parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("a"))
    Skipping.evictTable(dir) // a restart: no owner state in this JVM
    val (added, removed) =
      Sinks.appendEpoch(rows(100, 7000).coalesce(1)
        .localCheckpoint(true), dir, 0L)
    assert(!Skipping.refreshManifestDelta(spark, dir, Seq("a"), Nil,
      added, removed), "no owner state -> caller must reconcile")
    Skipping.refreshManifest(spark, dir, Seq("a")) // the reconcile
    val (a2, r2) = (Sinks.appendEpoch(rows(100, 8000).coalesce(1)
      .localCheckpoint(true), dir, 1L))
    assert(Skipping.refreshManifestDelta(spark, dir, Seq("a"), Nil, a2, r2),
      "reconcile should have re-seeded the owner state")
    assert(Skipping.readManifest(spark, dir).get.count() == 5)
  }

  test("distributed diff (forced-low threshold) matches the driver diff") {
    val dir = tmp("dist_diff")
    rows(500, 0).repartition(5).write.parquet(dir)
    Skipping.writeManifest(spark, dir, Seq("a", "k"))
    // change the table shape: add two files, remove one
    rows(100, 20000).coalesce(2)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(dir)
    val f = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // the victim must be a manifest-KNOWN file (a deleted never-indexed
    // file is not a manifest removal)
    val known = Skipping.readManifest(spark, dir).get
      .select("file").collect().map(_.getString(0)).toSet
    val victim = f.listStatus(new org.apache.hadoop.fs.Path(dir))
      .find(st => known(st.getPath.getName)).get.getPath
    f.delete(victim, false)
    val prev = sys.props.put("graft.skipping.manifestDiffDriverMaxBytes", "1")
    try {
      val (a, r) = Skipping.refreshManifest(spark, dir, Seq("a", "k"))
      assert(a == 2L && r == 1L, s"distributed diff found ($a, $r)")
    } finally prev match {
      case Some(v) =>
        sys.props.put("graft.skipping.manifestDiffDriverMaxBytes", v)
      case None =>
        sys.props.remove("graft.skipping.manifestDiffDriverMaxBytes")
    }
    // manifest converged to the live file set; pruned reads stay exact
    val files = Skipping.dataFiles(spark, dir).toSet
    val inManifest = Skipping.readManifest(spark, dir).get
      .select("file").collect().map(_.getString(0)).toSet
    assert(inManifest == files)
    val q = Skipping.readSkipping(spark, dir,
      Seq(Skipping.RangePred("a", Some(10L), Some(14L))))
    val real = spark.read.option("graft.noskip", "true").parquet(dir)
      .filter(col("a").between(10, 14))
    assert(q.count() == real.count())
  }
}
