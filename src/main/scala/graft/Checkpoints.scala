package graft

import org.apache.spark.sql.DataFrame

/** Plan-truncation helper for iterative / shared-plan operators.
  *
  * `localCheckpoint` stores partitions on executor block managers —
  * fast, but an executor loss on a real cluster loses the data and
  * fails the job (there is no lineage left to recompute from). The
  * reliable alternative, `checkpoint`, writes to a fault-tolerant
  * directory (HDFS/object store) at the cost of one write+read.
  *
  * Operators call [[Checkpoints.materialize]] instead of choosing one:
  * set `graft.checkpoint.dir` on the session (runtime conf, e.g.
  * `spark.conf.set("graft.checkpoint.dir", "hdfs://…/ckpt")`) and every
  * iterative operator (connected components, PageRank, triangle
  * counting, LSH band sharing, retrieval postings) switches to reliable
  * checkpoints; unset, they keep the fast local path — the right
  * default for local-mode and short interactive jobs.
  */
object Checkpoints {
  /** Runtime-conf key: a fault-tolerant directory enables reliable mode. */
  val DirConf = "graft.checkpoint.dir"

  /** Materialize `df`, truncating lineage: reliable `checkpoint` when
    * `graft.checkpoint.dir` is set, `localCheckpoint` otherwise. */
  def materialize(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        // setCheckpointDir nests a fresh UUID subdir under `dir`, so the
        // context's resolved path never string-equals the conf value —
        // re-point only when unset or pointed somewhere else entirely.
        if (!spark.sparkContext.getCheckpointDir.exists(_.startsWith(dir)))
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
  }
}
