package graft.tools

import java.net.URI
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** Local filesystem under a `cfs://` scheme that COUNTS metadata RPCs —
  * the instrument behind the O(delta) ingest-maintenance proof: on an
  * object store every `listStatus` is a LIST request and every
  * `getFileStatus` a HEAD, so "per-trigger maintenance is O(delta)"
  * is falsifiable as "list+stat calls per trigger stay flat while the
  * table's total file count grows". Register with
  * `spark.sparkContext.hadoopConfiguration.set("fs.cfs.impl",
  * classOf[CountingLocalFs].getName)` and address tables as
  * `cfs:/...`; counters are JVM-global (local-mode executors share
  * them), reset between measured windows with [[CountingLocalFs.reset]].
  *
  * Built on RawLocalFileSystem (not the checksumming LocalFileSystem)
  * so the call counts are the filesystem's own, without `.crc` shadow
  * traffic.
  */
class CountingLocalFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("cfs:///")

  override def listStatus(f: Path): Array[FileStatus] = {
    CountingLocalFs.lists.incrementAndGet()
    // RawLocalFileSystem materializes each listed entry via an internal
    // getFileStatus — an artifact of the local implementation, not of
    // the RPC model (an object-store LIST returns the statuses in the
    // same response). Suppress the nested counts so `stats` measures
    // HEAD-equivalents only.
    CountingLocalFs.inList.set(java.lang.Boolean.TRUE)
    try {
      val r = super.listStatus(f)
      CountingLocalFs.listedEntries.addAndGet(r.length.toLong)
      r
    } finally CountingLocalFs.inList.set(java.lang.Boolean.FALSE)
  }

  override def getFileStatus(f: Path): FileStatus = {
    if (!CountingLocalFs.inList.get().booleanValue())
      CountingLocalFs.stats.incrementAndGet()
    super.getFileStatus(f)
  }
}

object CountingLocalFs {
  val lists = new java.util.concurrent.atomic.AtomicLong()
  val stats = new java.util.concurrent.atomic.AtomicLong()
  /** Total entries returned across listStatus calls — the paging cost
    * a real object store bills (~1000 keys per LIST page): a probe that
    * keeps `lists` flat by listing one enormous directory still shows
    * up here. */
  val listedEntries = new java.util.concurrent.atomic.AtomicLong()
  private[tools] val inList = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  def reset(): Unit = { lists.set(0L); stats.set(0L); listedEntries.set(0L) }

  /** (listStatus calls, getFileStatus calls) since the last reset. */
  def counts: (Long, Long) = (lists.get(), stats.get())

  /** Wire the scheme into a session's Hadoop conf (idempotent). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.cfs.impl", classOf[CountingLocalFs].getName)
  }
}
