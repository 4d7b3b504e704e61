package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The reliable-checkpoint switch: with `graft.checkpoint.dir` set,
  * every iterative operator that truncates lineage via
  * [[Checkpoints.materialize]] must (a) write real checkpoint files
  * under the directory — executor loss then costs a re-read, not the
  * job — and (b) produce results identical to the default
  * localCheckpoint path. */
class CheckpointsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  private val dir = "/root/testdata/sf0.001"

  private def withCkptDir[A](f: String => A): A = {
    val tmp = Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(Checkpoints.DirConf, tmp)
    try f(tmp)
    finally spark.conf.unset(Checkpoints.DirConf)
  }

  private def rddFiles(root: String): Long = {
    import scala.jdk.CollectionConverters._
    Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
      .count(p => Files.isRegularFile(p) && p.getFileName.toString.startsWith("part-"))
  }

  test("gr_pagerank is identical under reliable checkpoints, files on disk") {
    val local = SparkEntry.queries("gr_pagerank")(spark, dir).collect().toSeq
    withCkptDir { tmp =>
      val reliable = SparkEntry.queries("gr_pagerank")(spark, dir).collect().toSeq
      assert(reliable == local)
      assert(rddFiles(tmp) > 0, "no checkpoint partition files written")
    }
  }

  test("dd_cluster is identical under reliable checkpoints, files on disk") {
    val local = SparkEntry.queries("dd_cluster")(spark, dir).collect().toSeq
    withCkptDir { tmp =>
      val reliable = SparkEntry.queries("dd_cluster")(spark, dir).collect().toSeq
      assert(reliable == local)
      assert(rddFiles(tmp) > 0, "no checkpoint partition files written")
    }
  }

  test("ret_bm25 is identical under reliable checkpoints") {
    val local = SparkEntry.queries("ret_bm25")(spark, dir).collect().toSeq
    withCkptDir { tmp =>
      val reliable = SparkEntry.queries("ret_bm25")(spark, dir).collect().toSeq
      assert(reliable == local)
      assert(rddFiles(tmp) > 0, "no checkpoint partition files written")
    }
  }
}
